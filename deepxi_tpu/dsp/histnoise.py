"""Histogram-mode noise trackers (ref: histogram2quantile/histogram.py:11-134).

Keeps a ring buffer of `frame_L` smoothed periodograms per bin; the noise
estimate follows the mode of a 40-bucket histogram over the pool, in three
variants: plain, SNR-masked, and threshold-masked. The reference loops over
the 257 bins per frame on the host; here the histogram/mode is computed for
all bins at once on device and the whole tracker is one `lax.scan`.

Differentially validated against the reference oracle
(tests/test_ref_differential.py): variants 0/2 bit-exact in f64. Two
CATALOGUED DEFECTS of the reference are NOT reproduced:

  * warmup assigns ``self.mean = self.noise`` (histogram.py:30,35),
    permanently aliasing the mode and mean recursions so each post-warmup
    noise update overwrites the mean before the mean update reads it; our
    recursions are independent (the oracle is de-aliased in the test);
  * variant 1's exclusion handling treats ``squeeze(argwhere(..)).any()``
    as "anything excluded" (histogram.py:71-75), which is falsy when
    exactly pool index 0 is excluded -- those frames silently use the full
    pool; we apply the mask as specified.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class HistParams(NamedTuple):
    alpha_d: float = 0.8
    alpha_s: float = 0.9
    frame_L: int = 40
    delta: float = 8.0
    delta_snr: float = 2.5
    n_buckets: int = 40


class HistOutputs(NamedTuple):
    """Per-frame [T, F] trajectories: `noiseX` is the histogram-mode noise
    PSD, `meanX`/`stdX` the pool statistics, for the plain (0), SNR-masked
    (1) and threshold-masked (2) variants."""
    noise: jnp.ndarray
    mean: jnp.ndarray
    std: jnp.ndarray
    noise1: jnp.ndarray
    mean1: jnp.ndarray
    std1: jnp.ndarray
    noise2: jnp.ndarray
    mean2: jnp.ndarray
    std2: jnp.ndarray


def _masked_mode(pool: jnp.ndarray, mask: jnp.ndarray, n_buckets: int) -> Tuple:
    """Per-bin histogram mode (left bucket edge), mean and std over the
    masked pool. pool/mask: [L, F] -> each output [F]."""
    cnt = jnp.sum(mask, axis=0)
    safe_cnt = jnp.maximum(cnt, 1.0)
    mean = jnp.sum(pool * mask, axis=0) / safe_cnt
    var = jnp.sum(jnp.square(pool - mean[None]) * mask, axis=0) / safe_cnt
    std = jnp.sqrt(jnp.maximum(var, 0.0))

    big = jnp.max(pool, axis=0) + 1.0
    lo = jnp.min(jnp.where(mask > 0, pool, big[None]), axis=0)
    hi = jnp.max(jnp.where(mask > 0, pool, (lo - 1.0)[None]), axis=0)
    # per-bin bucket count min(surviving, n_buckets), like the reference's
    # np.histogram(aray, min(pure_len, 40)) (ref: histogram.py:76-77)
    nb = jnp.clip(cnt, 1.0, float(n_buckets))
    width = jnp.maximum(hi - lo, 1e-12) / nb
    # right-edge inclusive like np.histogram: the pool maximum belongs to
    # bucket nb-1 (per-bin bucket count), not a one-past bucket
    idx = jnp.clip(((pool - lo[None]) / width[None]).astype(jnp.int32),
                   0, n_buckets - 1)
    idx = jnp.minimum(idx, nb[None].astype(jnp.int32) - 1)
    onehot = jax.nn.one_hot(idx, n_buckets, axis=-1)  # [L, F, B]
    hist = jnp.sum(onehot * mask[..., None], axis=0)  # [F, B]
    mode_bucket = jnp.argmax(hist, axis=-1)
    mode = lo + mode_bucket.astype(pool.dtype) * width
    return mode, mean, std, cnt


def histogram_track(pwr: jnp.ndarray, params: HistParams = HistParams(),
                    S0: jnp.ndarray = None) -> HistOutputs:
    """Run all three histogram trackers over a [T, F] periodogram
    (ref: histogram2quantile/histogram.py:121-134). During warmup
    (t < frame_L) every variant reports the running pool mean, as in the
    reference.

    `S0` seeds the smoothed periodogram; the default is the first frame,
    matching the reference's construction `histogram(pwr[0], ...)`
    (ref: deepxi/model.py:594)."""
    L, F = params.frame_L, pwr.shape[-1]
    z = jnp.zeros((F,), pwr.dtype)
    S0 = pwr[0] if S0 is None else jnp.asarray(S0, pwr.dtype)
    state = dict(S=S0, pool=jnp.zeros((L, F), pwr.dtype),
                 noise=z, mean=z, std=z, noise1=z, mean1=z, std1=z,
                 noise2=z, mean2=z, std2=z)

    def upd(prev, new):
        return params.alpha_d * prev + (1 - params.alpha_d) * new

    def step(st, inp):
        t, pw = inp
        S = params.alpha_s * st["S"] + (1 - params.alpha_s) * pw
        pool = st["pool"].at[t % L].set(S)
        warm = t < L
        # Warmup pools S_pool[:t] (excluding the current frame) for
        # 0 < t < L, and S_pool[0] alone at t == 0, exactly like the
        # reference's tracking_histogram_win (ref: histogram.py:27-37);
        # std is eps-floored as there.
        warm_mask = ((jnp.arange(L) < jnp.maximum(t, 1)).astype(pw.dtype)[:, None]
                     * jnp.ones((L, F), pw.dtype))
        _, w_mean, w_std, _ = _masked_mode(pool, warm_mask, params.n_buckets)
        w_std = jnp.maximum(w_std, jnp.finfo(pw.dtype).eps)

        # variant 0: plain mode over the full pool
        full = jnp.ones((L, F), pw.dtype)
        mode0, mean0, std0, _ = _masked_mode(pool, full, params.n_buckets)
        noise = jnp.where(warm, w_mean, upd(st["noise"], mode0))
        mean = jnp.where(warm, w_mean, upd(st["mean"], mean0))
        std = jnp.where(warm, w_std, upd(st["std"], std0))

        # variant 1: SNR-masked pool (ref: histogram.py:48-82); updates gated
        # on the number of surviving pool entries like the reference
        prev1 = jnp.maximum(st["noise1"], 1e-16)
        snr_mask = (pool / prev1[None] < params.delta_snr).astype(pw.dtype)
        mode1, mean1_, std1_, cnt1 = _masked_mode(pool, snr_mask, params.n_buckets)
        noise1 = jnp.where(warm, w_mean,
                           jnp.where(cnt1 > 5, upd(st["noise1"], mode1), st["noise1"]))
        mean1 = jnp.where(warm, w_mean,
                          jnp.where(cnt1 > 2, upd(st["mean1"], mean1_), st["mean1"]))
        std1 = jnp.where(warm, w_std,
                         jnp.where(cnt1 > 2, upd(st["std1"], std1_), st["std1"]))

        # variant 2: threshold-masked pool (ref: histogram.py:85-118)
        thr = jnp.minimum(noise1 + params.delta, jnp.mean(pool, axis=0))
        thr_mask = (pool < thr[None]).astype(pw.dtype)
        mode2, mean2_, std2_, cnt2 = _masked_mode(pool, thr_mask, params.n_buckets)
        noise2 = jnp.where(warm, w_mean,
                           jnp.where(cnt2 > 5, upd(st["noise2"], mode2), st["noise2"]))
        mean2 = jnp.where(warm, w_mean,
                          jnp.where(cnt2 > 2, upd(st["mean2"], mean2_), st["mean2"]))
        std2 = jnp.where(warm, w_std,
                         jnp.where(cnt2 > 2, upd(st["std2"], std2_), st["std2"]))

        new = dict(S=S, pool=pool, noise=noise, mean=mean, std=std,
                   noise1=noise1, mean1=mean1, std1=std1, noise2=noise2,
                   mean2=mean2, std2=std2)
        out = HistOutputs(noise, mean, std, noise1, mean1, std1, noise2,
                          mean2, std2)
        return new, out

    T = pwr.shape[0]
    _, outs = jax.lax.scan(step, state, (jnp.arange(T), pwr))
    return outs
