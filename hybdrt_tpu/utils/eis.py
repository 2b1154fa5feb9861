"""Complex impedance vector helpers (reference: hybdrt/utils/eis.py)."""
import numpy as np


def complex_vector_to_concat(z, axis=-1):
    """[Re(z); Im(z)] concatenation."""
    z = np.asarray(z)
    return np.concatenate([z.real, z.imag], axis=axis)


def concat_vector_to_complex(v):
    v = np.asarray(v)
    if len(v) % 2 == 1:
        raise ValueError("v must be of even length")
    n = len(v) // 2
    return v[:n] + 1j * v[n:]


def polar_from_complex(z):
    z = np.asarray(z)
    zmod = np.abs(z)
    zphz = (180 / np.pi) * np.arctan2(z.imag, z.real)
    return zmod, zphz


def complex_from_polar(zmod, zphz_deg):
    zmod = np.asarray(zmod)
    phz = np.asarray(zphz_deg) * np.pi / 180
    return zmod * np.cos(phz) + 1j * zmod * np.sin(phz)


def construct_eis_df(frequencies, z):
    """Standard-column EIS DataFrame (reference utils/eis.py)."""
    import pandas as pd
    z = np.asarray(z)
    return pd.DataFrame({
        "Freq": np.asarray(frequencies), "Zreal": z.real, "Zimag": z.imag,
        "Zmod": np.abs(z), "Zphz": np.angle(z, deg=True),
    })
