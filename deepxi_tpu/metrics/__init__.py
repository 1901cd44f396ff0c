"""L7 objective evaluation (ref: deepxi/model.py:1814-1861 + MATLAB suite)."""

from deepxi_tpu.metrics.pesq import pesq
from deepxi_tpu.metrics.quality import composite, llr, seg_snr, snr_overall, wss
from deepxi_tpu.metrics.stoi import stoi

__all__ = ["composite", "llr", "pesq", "seg_snr", "snr_overall", "stoi", "wss"]
