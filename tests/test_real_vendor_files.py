"""Loader tests on REAL vendor data files (Gamry .DTA, BioLogic .mpr/.txt,
RelaxIS export) shipped with the reference's tutorials.

These complement the synthetic-format tests (tests/test_dataload_reader_files.py)
with ground-truth cross-validation: the BioLogic .mpr binaries are compared
field-by-field against EC-Lab's own ASCII exports of the SAME measurements,
which pins the from-scratch binary parser (hybdrt_tpu/dataload/sources/
eclab_mpr.py — the reference wraps the galvani package instead) to the
vendor's canonical decoding. Skipped when the reference data directory is
not present."""
import os

import numpy as np
import pytest

DATA_DIR = "/root/reference/tutorials/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA_DIR),
    reason="reference tutorial data not available")


def _txt_rows(name, skip=None):
    path = os.path.join(DATA_DIR, name)
    if skip is None:
        with open(path, encoding="latin1") as f:
            lines = f.readlines()
        skip = int(lines[1].split(":")[1])
    return np.genfromtxt(path, skip_header=skip, encoding="latin1")


def test_mpr_peis_matches_eclab_ascii_export():
    from hybdrt_tpu.dataload.sources.eclab_mpr import read_mpr
    m = read_mpr(os.path.join(DATA_DIR, "PEIS_LPSCl_IonBlocking_-25C.mpr"))
    txt = _txt_rows("PEIS_LPSCl_IonBlocking_-25C.txt")
    assert m.n_points == len(txt) == 79
    cols = ["freq/Hz", "Re(Z)/Ohm", "-Im(Z)/Ohm", "|Z|/Ohm", "Phase(Z)/deg",
            "time/s", "<Ewe>/V", "<I>/mA", "cycle number", "Ns"]
    for j, col in enumerate(cols):
        v = m.data[col].astype(float)
        rel = np.max(np.abs(v - txt[:, j])
                     / np.maximum(np.abs(txt[:, j]), 1e-12))
        # ASCII export prints float32 fields with 8 significant digits
        assert rel < 2e-6, (col, rel)
    # Acquisition timestamp comes from the LOG module's OLE date
    assert m.timestamp is not None and m.timestamp.year == 2025


def test_mpr_chrono_matches_eclab_ascii_export():
    from hybdrt_tpu.dataload.sources.eclab_mpr import read_mpr
    m = read_mpr(os.path.join(DATA_DIR, "CP_SSB.mpr"))
    txt = _txt_rows("CP_SSB.txt")
    assert m.n_points == len(txt) == 30208
    for j, col in enumerate(["time/s", "Ewe/V", "I/mA"]):
        v = m.data[col].astype(float)
        rel = np.max(np.abs(v - txt[:, j])
                     / np.maximum(np.abs(txt[:, j]), 1e-9))
        assert rel < 2e-6, (col, rel)
    assert np.all(m.data["I Range"] == txt[:, 3].astype(int))


def test_read_eis_real_gamry_dta():
    from hybdrt_tpu.dataload.reader import read_eis
    z = read_eis(os.path.join(DATA_DIR, "EISGALV_EISTest3.DTA"))
    assert len(z.freq) == 71
    assert np.all(np.isfinite(z.z))
    # Frequency sweep runs high to low, ~1 MHz down to ~0.1 Hz
    assert z.freq[0] > 9e5 and z.freq[-1] < 1.0
    assert np.all(np.diff(z.freq) < 0)


def test_read_eis_real_mpr_and_txt_agree():
    """The full standardized EIS path must give the same spectrum whether it
    reads the vendor binary or the vendor ASCII export."""
    from hybdrt_tpu.dataload.reader import read_eis
    zb = read_eis(os.path.join(DATA_DIR, "PEIS_LPSCl_IonBlocking_-25C.mpr"))
    zt = read_eis(os.path.join(DATA_DIR, "PEIS_LPSCl_IonBlocking_-25C.txt"))
    assert len(zb.freq) == len(zt.freq)
    np.testing.assert_allclose(zb.freq, zt.freq, rtol=2e-6)
    np.testing.assert_allclose(zb.z, zt.z, rtol=2e-6, atol=1e-9)


def test_read_eis_real_relaxis_export():
    from hybdrt_tpu.dataload.reader import read_eis
    z = read_eis(os.path.join(DATA_DIR,
                              "PEIS_LPSCl_IonBlocking_-25C_RelaxIS.txt"))
    assert len(z.freq) > 10
    assert np.all(np.isfinite(z.z)) and np.all(z.freq > 0)


def test_read_chrono_real_mpr():
    from hybdrt_tpu.dataload.reader import read_chrono
    ch = read_chrono(os.path.join(DATA_DIR, "CP_SSB.mpr"))
    t, i, v = ch.tiv
    assert len(t) == 30208
    assert np.all(np.diff(t) > 0)
    assert np.all(np.isfinite(i)) and np.all(np.isfinite(v))


def test_legacy_fileload_api_real_files():
    """The legacy fileload API (what the reference's tutorials use) must
    also read the real vendor files."""
    from hybdrt_tpu import fileload as fl
    df = fl.read_eis(os.path.join(DATA_DIR, "EISGALV_EISTest3.DTA"))
    freq, z = fl.get_eis_tuple(df)
    assert len(freq) == 71 and np.all(np.isfinite(z))
    c = fl.read_chrono(os.path.join(DATA_DIR, "CP_SSB.mpr"))
    t, i, v = fl.get_chrono_tuple(c)
    assert len(t) == len(i) == len(v) == 30208


def test_read_eis_real_modulo_batt_csv():
    """The reference's webinar loads this csv manually with pandas because
    its readers can't; ours reads it through the standard path."""
    import pandas as pd
    from hybdrt_tpu.dataload.reader import read_eis
    path = "/root/reference/webinar/data/SSB/Sample2_PEIS_AtRest.csv"
    if not os.path.isfile(path):
        pytest.skip("webinar data not available")
    z = read_eis(path)
    df = pd.read_csv(path)
    zc = (df["|Z|/Ohm"].to_numpy()
          * np.exp(1j * np.deg2rad(df["Phase(Z)/deg"].to_numpy())))
    np.testing.assert_allclose(z.freq, df["freq/Hz"].to_numpy())
    np.testing.assert_allclose(z.z, zc)


def test_webinar_workflow_real_ssb_spectrum():
    """The reference webinar's demo workflow on its own data: KK-test the
    raw spectrum, fit the cleaned window, derive a discrete RQ circuit from
    the DRT peaks (reference-signature from_drt/fit_eis kwargs), and DOP-fit
    the ion-blocking cell."""
    from hybdrt_tpu.dataload.reader import read_eis
    from hybdrt_tpu import DRT
    from hybdrt_tpu.models.elements import DiscreteElementModel

    path = "/root/reference/webinar/data/SSB/Sample1_PEIS_EndOfDischarge.mpr"
    if not os.path.isfile(path):
        pytest.skip("webinar data not available")
    z1 = read_eis(path)
    drt = DRT()
    outlier_index, f_lim, fz_clean = drt.kk_test(z1.freq, z1.z, n_sigma=5)
    assert f_lim[0] < 10 and f_lim[1] > 1e5  # wide valid window
    assert 10 < len(fz_clean[0]) < len(z1.freq)

    drt.fit_eis(*fz_clean)
    assert 40 < drt.fit_parameters["R_inf"] < 60
    assert 400 < drt.predict_r_p() < 900

    peak_tau, tau_eval, peak_indices, _ = drt.find_peaks(return_info=True)
    dem = DiscreteElementModel.from_drt(drt, tau=tau_eval,
                                        peak_indices=peak_indices,
                                        drt_element="RQ")
    dem.fit_eis(*fz_clean, from_drt=True, prior=False)
    rel = (np.median(np.abs(dem.predict_z(fz_clean[0]) - fz_clean[1]))
           / np.median(np.abs(fz_clean[1])))
    assert rel < 0.01
    assert dem.model_string.startswith("R0-L0-RQ1")

    zl = read_eis(os.path.join(
        "/root/reference/webinar/data/LPSCl",
        "PEIS_LPSCl_IonBlocking_-25C.mpr")).trim_freq(f_min=1e3)
    dop = DRT(fit_dop=True)
    dop.fit_eis(zl.freq, zl.z)
    rel = (np.median(np.abs(dop.predict_z(zl.freq) - zl.z))
           / np.median(np.abs(zl.z)))
    assert rel < 0.01


def test_fit_real_gamry_spectrum_end_to_end():
    """The reference's Quickstart tutorial fits exactly this file; a user
    switching frameworks must get a sane self-tuned fit from the same raw
    vendor file (real measurement: ~24 mOhm ohmic, ~42 mOhm polarization,
    strong high-frequency inductance)."""
    from hybdrt_tpu.dataload.reader import read_eis
    from hybdrt_tpu import DRT

    d = read_eis(os.path.join(DATA_DIR, "EISGALV_EISTest3.DTA"))
    drt = DRT()
    drt.fit_eis(d.freq, d.z)
    assert 0.01 < drt.fit_parameters["R_inf"] < 0.05
    assert 0.02 < drt.predict_r_p() < 0.08
    resid = np.abs(drt.predict_z(d.freq) - d.z)
    assert np.median(resid) / np.median(np.abs(d.z)) < 0.05
    assert len(drt.find_peaks()) >= 1


def test_get_custom_file_time_gamry_dta():
    """Epoch time from pygamry-style tab-separated DATE/TIME header lines,
    fractional seconds preserved (reference fileload.py:103-128), checked
    against the real Gamry file's header (DATE 10/25/2024, TIME
    21:09:58.727375)."""
    import calendar
    import time as _time
    from hybdrt_tpu import fileload
    ts = fileload.get_custom_file_time(
        os.path.join(DATA_DIR, "EISGALV_EISTest3.DTA"))
    expect = calendar.timegm(_time.strptime(
        "10/25/2024 21:09:58", "%m/%d/%Y %H:%M:%S")) + 0.727375
    assert abs(ts - expect) < 1e-9

def test_get_custom_file_time_missing_header_raises(tmp_path):
    """A file without the DATE/TIME header lines (or with a truncated one)
    must fail with a clear ValueError, not an opaque IndexError."""
    import pytest
    from hybdrt_tpu import fileload
    p = tmp_path / "no_header.txt"
    p.write_text("just some text\nwith no headers\n")
    with pytest.raises(ValueError, match="no TIME header"):
        fileload.get_custom_file_time(str(p))
    # Header present but too few tab-separated fields (final unterminated line)
    p2 = tmp_path / "trunc.txt"
    p2.write_text("DATE\t10/25/2024\nTIME")
    with pytest.raises(ValueError, match="malformed TIME header"):
        fileload.get_custom_file_time(str(p2))
