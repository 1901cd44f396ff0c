"""Hybrid/classical inference modes (ref: the fork's `infer_hybrid1`,
`infer_hybrid_mcra`, `infer_tracking_noise*`, `infer_pho` experiments,
deepxi/model.py:334-1782).

The fork hard-wires these as 1000+ lines of per-frame host loops over
private-path artifacts; here each mode is a thin composition of the scan-
based dsp stack over the jitted analysis/synthesis chain, taking explicit
models/posteriors. All return enhanced waveforms.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from deepxi_tpu import sig
from deepxi_tpu.dsp.histnoise import HistParams, histogram_track
from deepxi_tpu.dsp.mixmax import MixMaxModel
from deepxi_tpu.dsp.mixmax import enhance as mixmax_enhance
from deepxi_tpu.dsp.trackers import MCRAParams, omlsa_enhance
from deepxi_tpu.dsp.vts import VTSModel, vts_enhance
from deepxi_tpu.sig.mix import normalise

_DIMS = dict(N_d=512, N_s=256, K=512)


def _analysis(wav: jnp.ndarray, N_d=512, N_s=256, K=512):
    x = normalise(wav) if wav.dtype != jnp.float32 else wav
    return sig.polar_analysis(x, N_d, N_s, K)


def enhance_omlsa(wav: jnp.ndarray, params: MCRAParams = MCRAParams(),
                  tracker: str = "mcra", N_d=512, N_s=256, K=512) -> jnp.ndarray:
    """Classical OM-LSA enhancement with an MCRA-family tracker
    (ref: deepxi/model.py:694-840 infer_hybrid_mcra / the MagPhonemes omlsa
    path, deepxi/inp_tgt.py:1044-1057)."""
    mag, pha = _analysis(wav, N_d, N_s, K)
    y = omlsa_enhance(mag, params, tracker)
    return sig.polar_synthesis(y, pha, N_d, N_s, K)


def enhance_mixmax(wav: jnp.ndarray, model: MixMaxModel,
                   posteriors: Optional[jnp.ndarray] = None,
                   track_noise: bool = True,
                   N_d=512, N_s=256, K=512) -> jnp.ndarray:
    """MixMax enhancement with per-phoneme Gaussians and (optionally) the
    phoneme-classifier's posteriors (ref: deepxi/model.py:542-692
    infer_hybrid1)."""
    mag, pha = _analysis(wav, N_d, N_s, K)
    log_mag = jnp.log(jnp.maximum(mag, jnp.finfo(jnp.float32).eps))
    x_hat = mixmax_enhance(model, log_mag, posteriors=posteriors,
                           track_noise=track_noise)
    return sig.polar_synthesis(jnp.exp(x_hat), pha, N_d, N_s, K)


def enhance_tracking_histogram(wav: jnp.ndarray,
                               params: HistParams = HistParams(),
                               variant: int = 1, floor: float = 0.1,
                               N_d=512, N_s=256, K=512) -> jnp.ndarray:
    """Spectral subtraction driven by the histogram-mode noise tracker
    (ref: deepxi/model.py:898-1256 infer_tracking_noise): noise PSD from the
    selected tracker variant, Wiener-style gain with a spectral floor."""
    mag, pha = _analysis(wav, N_d, N_s, K)
    pwr = jnp.square(mag)
    outs = histogram_track(pwr, params)
    noise = (outs.noise, outs.noise1, outs.noise2)[variant]
    gain = jnp.clip(1.0 - noise / jnp.maximum(pwr, 1e-12), floor, 1.0)
    return sig.polar_synthesis(mag * gain, pha, N_d, N_s, K)


def enhance_vts(wav: jnp.ndarray, model: VTSModel, n_iter: int = 3,
                spp: Optional[jnp.ndarray] = None,
                N_d=512, N_s=256, K=512) -> jnp.ndarray:
    """VTS/GMM model-compensation enhancement
    (ref: deepxi/model.py:1465-1782 infer_tracking_noise_vts)."""
    mag, pha = _analysis(wav, N_d, N_s, K)
    log_mag = jnp.log(jnp.maximum(mag, jnp.finfo(jnp.float32).eps))
    x_hat, _ = vts_enhance(model, log_mag, n_iter=n_iter, spp=spp)
    return sig.polar_synthesis(jnp.exp(x_hat), pha, N_d, N_s, K)
