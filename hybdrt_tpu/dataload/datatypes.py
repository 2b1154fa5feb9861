"""Measurement containers for impedance/admittance spectra and chrono records.

Redesigned from the reference's enum-driven class tree (reference
hybdrt/dataload/datatypes.py): containers here are plain dataclasses around a
complex-valued core array, and the standard column names live in small
class-level schema tuples. Derived quantities (modulus, phase, cartesian
parts) are computed from the complex array on demand instead of being stored
as parallel fields.
"""
from dataclasses import dataclass, replace
from datetime import datetime
from typing import ClassVar, Optional, Tuple

import numpy as np
import pandas as pd


def _column(df: pd.DataFrame, name: str) -> np.ndarray:
    if name not in df.columns:
        raise ValueError(f"Data must contain column {name}")
    return df[name].to_numpy()


@dataclass
class ImmittanceData:
    """Frequency-domain immittance: a frequency grid plus one complex array.

    Subclasses fix the column schema (prefix 'z' or 'y'). Polar/cartesian
    views are derived, never stored.
    """
    freq: np.ndarray
    x: np.ndarray
    time: Optional[np.ndarray] = None
    timestamp: Optional[datetime] = None
    raw_data: Optional[pd.DataFrame] = None

    prefix: ClassVar[str] = "z"

    def __post_init__(self):
        self.freq = np.asarray(self.freq)
        self.x = np.asarray(self.x)

    # -- schema ------------------------------------------------------
    @classmethod
    def _cols(cls) -> dict:
        p = cls.prefix
        return {"freq": "freq", "real": f"{p}_re", "imag": f"{p}_im",
                "modulus": f"{p}_mod", "phase": f"{p}_phase", "time": "time"}

    # -- derived views -----------------------------------------------
    @property
    def real(self) -> np.ndarray:
        return self.x.real

    @property
    def imag(self) -> np.ndarray:
        return self.x.imag

    @property
    def modulus(self) -> np.ndarray:
        return np.abs(self.x)

    @property
    def phase(self) -> np.ndarray:
        """Phase angle in degrees."""
        return np.angle(self.x, deg=True)

    @property
    def cartesian(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.real, self.imag

    @property
    def polar(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.modulus, self.phase

    @property
    def fx(self) -> Tuple[np.ndarray, np.ndarray]:
        """(frequencies, immittance) tuple for fitting."""
        return self.freq, self.x

    @property
    def timestamps(self):
        if self.time is None or self.timestamp is None:
            return None
        return (pd.Timestamp(self.timestamp)
                + pd.to_timedelta(np.asarray(self.time, dtype=float),
                                  unit="s"))

    # -- conversion ----------------------------------------------------
    def as_dataframe(self) -> pd.DataFrame:
        cols = self._cols()
        out = {cols["freq"]: self.freq, cols["real"]: self.real,
               cols["imag"]: self.imag}
        if self.time is not None:
            out[cols["time"]] = self.time
        return pd.DataFrame(out)

    def as_generic_dataframe(self) -> pd.DataFrame:
        out = {"freq": self.freq, "real": self.real, "imag": self.imag,
               "modulus": self.modulus, "phase": self.phase}
        if self.time is not None:
            out["time"] = self.time
        return pd.DataFrame(out)

    def as_tuple(self):
        return self.fx

    @classmethod
    def from_dataframe(cls, data: pd.DataFrame, timestamp=None):
        cols = cls._cols()
        freq = _column(data, cols["freq"])
        if cols["real"] in data.columns and cols["imag"] in data.columns:
            x = data[cols["real"]].to_numpy() + 1j * data[cols["imag"]].to_numpy()
        elif cols["modulus"] in data.columns and cols["phase"] in data.columns:
            x = (data[cols["modulus"]].to_numpy()
                 * np.exp(1j * np.deg2rad(data[cols["phase"]].to_numpy())))
        else:
            raise ValueError(
                f"Data must contain columns ({cols['real']}, {cols['imag']}) "
                f"or ({cols['modulus']}, {cols['phase']})")
        time = (data[cols["time"]].to_numpy()
                if cols["time"] in data.columns else None)
        return cls(freq, x, time=time, timestamp=timestamp, raw_data=data)

    # -- operations ----------------------------------------------------
    def trim_freq(self, f_min=None, f_max=None):
        lo = -np.inf if f_min is None else f_min
        hi = np.inf if f_max is None else f_max
        keep = (self.freq >= lo) & (self.freq <= hi)
        return replace(self, freq=self.freq[keep], x=self.x[keep],
                       time=None if self.time is None else self.time[keep],
                       raw_data=None)

    def invert(self):
        """Impedance <-> admittance."""
        other = YData if isinstance(self, ZData) else ZData
        return other(self.freq, 1 / self.x, time=self.time,
                     timestamp=self.timestamp)


@dataclass
class ZData(ImmittanceData):
    prefix: ClassVar[str] = "z"

    @property
    def z(self):
        return self.x

    z_re = ImmittanceData.real
    z_im = ImmittanceData.imag
    z_mod = ImmittanceData.modulus
    z_phase = ImmittanceData.phase


@dataclass
class YData(ImmittanceData):
    prefix: ClassVar[str] = "y"

    @property
    def y(self):
        return self.x

    y_re = ImmittanceData.real
    y_im = ImmittanceData.imag
    y_mod = ImmittanceData.modulus
    y_phase = ImmittanceData.phase


@dataclass
class ChronoData:
    """Time-domain record: time, current, voltage."""
    time: np.ndarray
    i: np.ndarray
    v: np.ndarray
    timestamp: Optional[datetime] = None
    raw_data: Optional[pd.DataFrame] = None

    columns: ClassVar[Tuple[str, str, str]] = ("time", "i", "v")

    def __post_init__(self):
        self.time = np.asarray(self.time)
        self.i = np.asarray(self.i)
        self.v = np.asarray(self.v)

    @property
    def tiv(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(time, current, voltage) tuple for fitting."""
        return self.time, self.i, self.v

    @property
    def timestamps(self):
        if self.timestamp is None:
            return None
        return (pd.Timestamp(self.timestamp)
                + pd.to_timedelta(np.asarray(self.time, dtype=float),
                                  unit="s"))

    def as_tuple(self):
        return self.tiv

    def as_dataframe(self) -> pd.DataFrame:
        return pd.DataFrame(dict(zip(self.columns, self.tiv)))

    @classmethod
    def from_dataframe(cls, data: pd.DataFrame, timestamp=None):
        t, i, v = (_column(data, c) for c in cls.columns)
        return cls(t, i, v, timestamp=timestamp, raw_data=data)

    def trim_time(self, t_min=None, t_max=None):
        lo = -np.inf if t_min is None else t_min
        hi = np.inf if t_max is None else t_max
        keep = (self.time >= lo) & (self.time <= hi)
        return ChronoData(self.time[keep], self.i[keep], self.v[keep],
                          timestamp=self.timestamp)
