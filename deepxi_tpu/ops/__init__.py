"""Maps, gains and special functions (ref: deepxi/map.py, deepxi/gain.py)."""

from deepxi_tpu.ops.gains import GAIN_TYPES, gfunc
from deepxi_tpu.ops.maps import map_selector
from deepxi_tpu.ops.special import exp1

__all__ = ["GAIN_TYPES", "exp1", "gfunc", "map_selector"]
