"""Typed measurement containers (reference hybdrt/dataload/datatypes.py)."""
from datetime import datetime
from enum import StrEnum
from typing import List, Optional

import numpy as np
import pandas as pd


class ImmittanceFields(StrEnum):
    @classmethod
    def cartesian_fields(cls):
        return cls.REAL.value, cls.IMAG.value

    @classmethod
    def polar_fields(cls):
        return cls.MODULUS.value, cls.PHASE.value


class ZFields(ImmittanceFields):
    FREQUENCY = "freq"
    REAL = "z_re"
    IMAG = "z_im"
    MODULUS = "z_mod"
    PHASE = "z_phase"
    TIME = "time"


class YFields(ImmittanceFields):
    FREQUENCY = "freq"
    REAL = "y_re"
    IMAG = "y_im"
    MODULUS = "y_mod"
    PHASE = "y_phase"
    TIME = "time"


class ChronoFields(StrEnum):
    TIME = "time"
    CURRENT = "i"
    VOLTAGE = "v"


class BaseData:
    fields: List[str]

    def __init__(self, time=None, timestamp: Optional[datetime] = None,
                 raw_data: Optional[pd.DataFrame] = None):
        self.time = time
        self.timestamp = timestamp
        self.raw_data = raw_data

    def as_tuple(self):
        return tuple(getattr(self, f) for f in self.fields)

    def as_array(self):
        return np.array(self.as_tuple()).T

    def as_dataframe(self):
        return pd.DataFrame.from_dict(dict(zip(self.fields, self.as_tuple())))

    @property
    def timestamps(self):
        if self.time is not None and self.timestamp is not None:
            return self.timestamp + self.time
        return None


class ImmittanceData(BaseData):
    field_enum = ImmittanceFields

    def __init__(self, freq, x, time=None, timestamp=None, raw_data=None):
        self.freq = np.asarray(freq)
        self._x = np.asarray(x)
        super().__init__(time=time, timestamp=timestamp, raw_data=raw_data)

    @property
    def fx(self):
        """(frequencies, immittance) tuple for fitting."""
        return self.freq, self._x

    @property
    def fields(self):
        return [f.value for f in self.field_enum if hasattr(self, f.value)]

    @property
    def real(self):
        return self._x.real

    @property
    def imag(self):
        return self._x.imag

    @property
    def modulus(self):
        return np.abs(self._x)

    @property
    def phase(self):
        return np.angle(self._x, deg=True)

    def polar(self):
        return self.modulus, self.phase

    def cartesian(self):
        return self.real, self.imag

    def as_generic_dataframe(self):
        data = {}
        for key in ("freq", "real", "imag", "modulus", "phase", "time"):
            val = getattr(self, key, None)
            if val is not None:
                data[key] = val
        return pd.DataFrame.from_dict(data)

    def trim_freq(self, f_min=None, f_max=None):
        f_min = -np.inf if f_min is None else f_min
        f_max = np.inf if f_max is None else f_max
        mask = (self.freq >= f_min) & (self.freq <= f_max)
        time_input = self.time[mask] if self.time is not None else None
        return self.__class__(self.freq[mask], self._x[mask], time=time_input,
                              timestamp=self.timestamp)

    @classmethod
    def from_dataframe(cls, data: pd.DataFrame, timestamp=None):
        try:
            freq = data[cls.field_enum.FREQUENCY.value].values
        except KeyError:
            raise ValueError(f"Data must contain column {cls.field_enum.FREQUENCY.value}")
        cart = cls.field_enum.cartesian_fields()
        pol = cls.field_enum.polar_fields()
        if all(c in data.columns for c in cart):
            x = data[cart[0]].values + 1j * data[cart[1]].values
        elif all(c in data.columns for c in pol):
            phase = np.pi * data[pol[1]].values / 180
            x = data[pol[0]].values * (np.cos(phase) + 1j * np.sin(phase))
        else:
            raise ValueError(f"Data must contain columns {cart} or {pol}")
        time = data[cls.field_enum.TIME.value].values \
            if cls.field_enum.TIME.value in data.columns else None
        return cls(freq, x, time=time, timestamp=timestamp, raw_data=data)

    def invert(self):
        """Z <-> Y conversion."""
        new_cls = YData if isinstance(self, ZData) else ZData
        return new_cls(self.freq, 1 / self._x, time=self.time, timestamp=self.timestamp)


class ZData(ImmittanceData):
    field_enum = ZFields

    @property
    def z(self):
        return self._x

    @property
    def z_re(self):
        return self.real

    @property
    def z_im(self):
        return self.imag

    @property
    def z_mod(self):
        return self.modulus

    @property
    def z_phase(self):
        return self.phase


class YData(ImmittanceData):
    field_enum = YFields

    @property
    def y(self):
        return self._x

    @property
    def y_re(self):
        return self.real

    @property
    def y_im(self):
        return self.imag

    @property
    def y_mod(self):
        return self.modulus

    @property
    def y_phase(self):
        return self.phase


class ChronoData(BaseData):
    """Chrono/IV time-series data."""
    field_enum = ChronoFields

    def __init__(self, time, i, v, timestamp=None, raw_data=None):
        self.i = np.asarray(i)
        self.v = np.asarray(v)
        super().__init__(time=np.asarray(time), timestamp=timestamp, raw_data=raw_data)

    @property
    def fields(self):
        return [f.value for f in self.field_enum]

    @property
    def tiv(self):
        """(time, current, voltage) tuple for fitting."""
        return self.time, self.i, self.v

    def trim_time(self, t_min=None, t_max=None):
        t_min = -np.inf if t_min is None else t_min
        t_max = np.inf if t_max is None else t_max
        mask = (self.time >= t_min) & (self.time <= t_max)
        return ChronoData(self.time[mask], self.i[mask], self.v[mask],
                          timestamp=self.timestamp)

    @classmethod
    def from_dataframe(cls, data: pd.DataFrame, timestamp=None):
        try:
            time = data[cls.field_enum.TIME.value].values
            i = data[cls.field_enum.CURRENT.value].values
            v = data[cls.field_enum.VOLTAGE.value].values
        except KeyError as e:
            raise ValueError(f"Data must contain column {e.args[0]}")
        return cls(time, i, v, timestamp=timestamp, raw_data=data)
