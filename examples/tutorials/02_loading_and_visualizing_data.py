"""Tutorial 2 — Loading and visualizing data.

Mirrors the reference's "Loading and visualizing data"
(reference tutorials/Loading_and_visualizing_data.ipynb). To stay
self-contained, the script first WRITES small instrument files in two vendor
formats (a Gamry ``.dta`` EIS file and an EC-Lab ASCII chrono export), then
loads them back through ``hybdrt_tpu.dataload``.

Covers:
  1. Reading EIS files: ``read_eis`` with automatic vendor detection
  2. The ``ZData`` container: complex z, cartesian/polar views, trimming
  3. Reading chrono (time-domain) files: ``read_chrono`` -> ``ChronoData``
  4. Plotting: Nyquist, Bode, and chrono views (``hybdrt_tpu.plotting``)
  5. Feeding loaded data into a DRT fit
"""
import os
import tempfile

import numpy as np
import matplotlib.pyplot as plt

from tutorial_utils import QUICK, add_noise, savefig, use_cpu_f64, zarc

use_cpu_f64()

from hybdrt_tpu import dataload, plotting as hplt  # noqa: E402
from hybdrt_tpu.dataload import detect_file_source  # noqa: E402

workdir = tempfile.mkdtemp(prefix="hybdrt_tpu_tutorial02_")

# ----------------------------------------------------------------------
# 1. Write a Gamry-style .dta EIS file (in practice this comes from the
#    potentiostat). The loader keys on the ZCURVE table structure.
# ----------------------------------------------------------------------
n_freq = 31 if QUICK else 61
freq = np.logspace(5, -1, n_freq)
z = add_noise(0.4 + zarc(freq, 1.2, 1e-2, 0.9), 2e-3, seed=2)

rows = "\n".join(
    f"\t{k}\t{k * 0.5:.2f}\t{f:.6g}\t{zi.real:.6g}\t{zi.imag:.6g}\t1"
    f"\t{abs(zi):.6g}\t{np.degrees(np.angle(zi)):.4f}\t0.0\t0.0\t12"
    for k, (f, zi) in enumerate(zip(freq, z)))
dta_content = f"""EXPLAIN
TAG\tGALVEIS
TITLE\tLABEL\tGalvanostatic EIS\tTest Identifier
DATE\tLABEL\t03/14/2025\tDate
TIME\tLABEL\t16:50:03\tTime

ZCURVE\tTABLE
\tPt\tTime\tFreq\tZreal\tZimag\tZsig\tZmod\tZphz\tIdc\tVdc\tIERange
\t#\ts\tHz\tohm\tohm\tV\tohm\t°\tA\tV\t#
{rows}
"""
eis_path = os.path.join(workdir, "cell_A_eis.dta")
with open(eis_path, "w") as f:
    f.write(dta_content)

# ----------------------------------------------------------------------
# 2. Load it back. Source detection is automatic (extension + content
#    sniffing); you can also pass source= explicitly.
# ----------------------------------------------------------------------
print(f"detected source: {detect_file_source(eis_path)}")
zdata = dataload.read_eis(eis_path)
print(f"ZData: {len(zdata.freq)} frequencies, "
      f"{zdata.freq.max():.3g}..{zdata.freq.min():.3g} Hz")

# The container exposes the representations you need
z_complex = zdata.z            # complex ndarray
mod, phase = zdata.polar       # |Z|, phase
trimmed = zdata.trim_freq(f_min=1.0)
print(f"trimmed to f >= 1 Hz: {len(trimmed.freq)} points")

# ----------------------------------------------------------------------
# 3. Visualize: Nyquist + Bode in one call, or individually.
# ----------------------------------------------------------------------
fig, axes = plt.subplots(1, 3, figsize=(11, 3))
hplt.plot_eis((zdata.freq, zdata.z), axes=axes)
savefig(fig, "t02_eis_views.png")

fig, ax = plt.subplots(figsize=(4, 3.2))
hplt.plot_nyquist((zdata.freq, zdata.z), ax=ax, label="cell A")
ax.legend()
savefig(fig, "t02_nyquist.png")

# ----------------------------------------------------------------------
# 4. Chrono data: write a simple EC-Lab ASCII export and read it back.
# ----------------------------------------------------------------------
n_t = 50 if QUICK else 200
times = np.linspace(0, 1.0, n_t)
i_sig = np.where(times >= 0.1, 1e-3, 0.0)
v_sig = 0.4 * i_sig + 1.2e-3 * (1 - np.exp(-np.maximum(times - 0.1, 0) / 1e-2)) \
    * (times >= 0.1)
chrono_rows = "\n".join(
    f"{t:.6f}\t{v:.8f}\t{i * 1e3:.8f}\t41\t0\t0\t0\t0.0\t0.0\t0\t0"
    for t, v, i in zip(times, v_sig, i_sig))
chrono_content = f"""EC-Lab ASCII FILE
Nb header lines : 6

Chronopotentiometry

time/s\tEwe/V\tI/mA\tI Range\t\t\t\tcycle number\tstep time/s\t\t
{chrono_rows}
"""
chrono_path = os.path.join(workdir, "cell_A_step.txt")
with open(chrono_path, "w") as f:
    f.write(chrono_content)

chrono = dataload.read_chrono(chrono_path)
print(f"ChronoData: {len(chrono.time)} samples; I converted from mA to A "
      f"(max {chrono.i.max():.4g} A)")

fig, ax = plt.subplots(figsize=(5, 3))
hplt.plot_chrono(chrono.as_tuple(), ax=ax)
savefig(fig, "t02_chrono.png")

# ----------------------------------------------------------------------
# 5. Straight into a fit: the containers unpack into the fit APIs.
# ----------------------------------------------------------------------
from hybdrt_tpu import DRT  # noqa: E402

drt = DRT()
drt.fit_eis(zdata.freq, zdata.z)
print(f"R_p from loaded file = {drt.predict_r_p():.4f} (true 1.200)")
assert abs(drt.predict_r_p() - 1.2) < 0.05
print("Tutorial 2 complete.")
