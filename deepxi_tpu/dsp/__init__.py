"""L8 classical DSP / hybrid stack (ref: bak/multiphase.py, hybrid/,
histogram2quantile/, aptfilt/, r_mfcc/ -- scan-based TPU-native rebuilds)."""

from deepxi_tpu.dsp.adaptive import block_nlms, lms, nlms
from deepxi_tpu.dsp.features import delta, fbank, logfbank, mfcc, ssc
from deepxi_tpu.dsp.histnoise import HistOutputs, HistParams, histogram_track
from deepxi_tpu.dsp.mixmax import (MixMaxModel, default_delta,
                                   gaussians_from_stats)
from deepxi_tpu.dsp.mixmax import enhance as mixmax_enhance
from deepxi_tpu.dsp.phoneme import Dictionary, Phoneme, parse_lexicon
from deepxi_tpu.dsp.trackers import (MCRAParams, imcra_track, mcra2_track,
                                     mcra_tbrr_track, mcra_track,
                                     omlsa_enhance)
from deepxi_tpu.dsp.vts import (VTSModel, em_step, make_model, rt_vts_track,
                                vts_enhance)

__all__ = ["Dictionary", "HistOutputs", "HistParams", "MCRAParams",
           "MixMaxModel", "Phoneme", "VTSModel", "block_nlms",
           "default_delta", "delta", "em_step", "fbank",
           "gaussians_from_stats", "histogram_track", "imcra_track", "lms",
           "logfbank", "make_model", "mcra2_track", "mcra_tbrr_track", "mcra_track", "mfcc",
           "mixmax_enhance", "nlms", "omlsa_enhance", "parse_lexicon",
           "rt_vts_track", "ssc", "vts_enhance"]
