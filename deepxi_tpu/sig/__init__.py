"""L1 signal-processing core (ref: deepxi/sig.py, deepxi/dct.py)."""

from deepxi_tpu.sig.mel import mel_filter_bank
from deepxi_tpu.sig.mix import (
    add_noise,
    add_noise_batch,
    cd,
    gamma,
    mix,
    normalise,
    snr_db,
    spectral_distortion,
    xi,
)
from deepxi_tpu.sig.stdct import dct2, dct3, inverse_stdct, stdct
from deepxi_tpu.sig.stft import (
    frame,
    hamming_window,
    inverse_stft,
    n_frames,
    overlap_and_add,
    polar_analysis,
    polar_synthesis,
    stft,
)

__all__ = [
    "add_noise", "add_noise_batch", "cd", "dct2", "dct3", "frame", "gamma",
    "hamming_window", "inverse_stdct", "inverse_stft", "mel_filter_bank",
    "mix", "n_frames", "normalise", "overlap_and_add", "polar_analysis",
    "polar_synthesis", "snr_db", "spectral_distortion", "stdct", "stft", "xi",
]
