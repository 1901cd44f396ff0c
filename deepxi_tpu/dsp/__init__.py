"""L8 classical DSP / hybrid stack (ref: bak/multiphase.py, hybrid/,
histogram2quantile/, aptfilt/, r_mfcc/ -- scan-based TPU-native rebuilds)."""

from deepxi_tpu.dsp.adaptive import block_nlms, lms, nlms
from deepxi_tpu.dsp.features import delta, fbank, logfbank, mfcc, ssc
from deepxi_tpu.dsp.histnoise import HistOutputs, HistParams, histogram_track
from deepxi_tpu.dsp.mixmax import (MixMaxModel, default_delta,
                                   gaussians_from_stats)
from deepxi_tpu.dsp.mixmax import enhance as mixmax_enhance
from deepxi_tpu.dsp.trackers import (MCRAParams, imcra_track, mcra2_track,
                                     mcra_track, omlsa_enhance)

__all__ = ["HistOutputs", "HistParams", "MCRAParams", "MixMaxModel",
           "block_nlms", "default_delta", "delta", "fbank",
           "gaussians_from_stats", "histogram_track", "imcra_track",
           "lms", "logfbank", "mcra2_track", "mcra_track", "mfcc",
           "mixmax_enhance", "nlms", "omlsa_enhance", "ssc"]
