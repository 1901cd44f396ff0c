"""Utility subsystems: profiling, determinism helpers."""

from deepxi_tpu.utils.profiling import StageTimer, annotate, trace

__all__ = ["StageTimer", "annotate", "trace"]
