"""SI unit-prefix scaling (reference hybdrt/utils/units.py)."""
import numpy as np


class UnitPrefix:
    scale_map = {
        "G": 1e9, "M": 1e6, "k": 1e3, "": 1.0, "m": 1e-3, "mu": 1e-6, "n": 1e-9,
    }
    reverse_scale_map = {v: k for k, v in scale_map.items()}
    chr_map = {"mu": 181}
    reverse_char_map = {chr(v): k for k, v in chr_map.items()}

    def __init__(self, prefix):
        if prefix not in self.scale_map:
            try:
                prefix = self.reverse_char_map[prefix]
            except KeyError:
                raise ValueError(f"Unrecognized unit prefix: {prefix}")
        self._prefix = prefix

    @classmethod
    def from_value(cls, value, min_factor=None, max_factor=None):
        if not np.isscalar(value):
            value = np.max(np.abs(value))
        scales = sorted(cls.reverse_scale_map.keys(), reverse=True)
        if min_factor is not None:
            scales = [s for s in scales if s >= min_factor]
        if max_factor is not None:
            scales = [s for s in scales if s <= max_factor]
        if value == 0 or value is None:
            scale = 1.0
        else:
            value = max(abs(value), min(scales))
            scale = next(s for s in scales if value >= s)
        return cls(cls.reverse_scale_map[scale])

    @property
    def prefix(self):
        return self._prefix

    @property
    def scale(self):
        return self.scale_map[self._prefix]

    @property
    def char(self):
        if self._prefix in self.chr_map:
            return chr(self.chr_map[self._prefix])
        return self._prefix

    def raw_to_scaled(self, raw_value):
        return None if raw_value is None else raw_value / self.scale

    def scaled_to_raw(self, scaled_value):
        return None if scaled_value is None else scaled_value * self.scale


def get_scaled_value(value):
    try:
        return UnitPrefix.from_value(value).raw_to_scaled(value)
    except TypeError:
        return value


def get_prefix_char(value):
    try:
        return UnitPrefix.from_value(value).char
    except TypeError:
        return ""


def get_scaled_value_and_prefix(value, min_factor=None, max_factor=None):
    unit = UnitPrefix.from_value(value, min_factor=min_factor, max_factor=max_factor)
    return unit.raw_to_scaled(value), unit.char


ALL_PREFIXES = [get_prefix_char(v) for v in UnitPrefix.scale_map.values()]


# ------------------------------------------------------------------
# Reference utils/scale.py surface (deprecated there in favor of this
# module; kept so reference plotting workflows port unchanged).
# ------------------------------------------------------------------
_PREFIX_POWER = {"n": -3, r"$\mu$": -2, "m": -1, "": 0, "k": 1, "M": 2, "G": 3}
_POWER_PREFIX = {v: k for k, v in _PREFIX_POWER.items()}


def _scale_power(y):
    y = np.asarray(y)
    if np.iscomplexobj(y) and np.max(np.abs(y.imag)) > 0:
        y = np.concatenate((y.real, y.imag))
    m = np.max(np.abs(y))
    if m == 0 or not np.isfinite(m):
        return 0
    return int(np.floor(np.log10(m) / 3))


def get_scale_prefix(y):
    """SI prefix string for an array's magnitude (reference
    utils/scale.py:7)."""
    return _POWER_PREFIX.get(_scale_power(y), "")


def get_scale_factor(y):
    """Numeric scale factor 10^(3k) for an array (reference
    utils/scale.py:17)."""
    return 10.0 ** (3 * _scale_power(y))


def get_factor_from_prefix(prefix):
    """Numeric factor for an SI prefix string (reference
    utils/scale.py:31)."""
    return 10.0 ** (3 * _PREFIX_POWER[prefix])


def get_scale_prefix_and_factor(y):
    prefix = get_scale_prefix(y)
    return prefix, get_factor_from_prefix(prefix)


def get_common_scale_prefix(y_list, aggregate="max"):
    """Common prefix over multiple arrays (reference utils/scale.py:37)."""
    powers = [_scale_power(y) for y in y_list]
    return _POWER_PREFIX.get(int(getattr(np, aggregate)(powers)), "")
