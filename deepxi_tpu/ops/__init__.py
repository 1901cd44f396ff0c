"""Maps, gains and special functions (ref: deepxi/map.py, deepxi/gain.py)."""

from deepxi_tpu.ops.gains import GAIN_TYPES, gfunc
from deepxi_tpu.ops.maps import map_selector
from deepxi_tpu.ops.normalisation import (
    frame_layer_norm,
    normalisation,
    seq_causal_layer_norm,
    seq_layer_norm,
)
from deepxi_tpu.ops.special import exp1

__all__ = [
    "GAIN_TYPES",
    "exp1",
    "frame_layer_norm",
    "gfunc",
    "map_selector",
    "normalisation",
    "seq_causal_layer_norm",
    "seq_layer_norm",
]
