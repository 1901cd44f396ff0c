"""Chain-level differential test against the reference's OWN TF code
(round-3 VERDICT next #7): execute the reference's `MagXi.stats` /
`example` / `enhanced_speech` + `gfunc` pipeline
(ref: deepxi/inp_tgt.py:141-240, deepxi/sig.py:97-299, deepxi/gain.py:13-191,
deepxi/map.py:352-402) from the read-only mount on identical inputs and
assert end-to-end agreement with ours -- closing the gap between the
per-op goldens (tests/golden/stft.npz, gain-vs-SciPy units) and
whole-pipeline parity.

Randomness is removed structurally: the reference's only stochastic step
is the noise-segment crop `tf.random.uniform([1], 0, 1 + d_len - s_len)`
(ref: deepxi/sig.py:276); with d_len == s_len the offset is
deterministically 0, so both chains mix the identical segment.

Nothing is copied from the reference -- its modules are *executed* as the
oracle (dead imports stubbed, the `tests/_ref_oracle.py` pattern).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.inp_tgt import inp_tgt_selector

REF = "/root/reference"
DIMS = dict(N_d=512, N_s=256, K=512, f_s=16000)

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_PREFIXES = ("deepxi", "mcra", "hybrid", "tqdm")


def _purge_and_snapshot():
    """Remove every sys.modules entry under the reference-module prefixes,
    returning what was there. Both directions of contamination are real:
    compat's pickle stubs would shadow the real `deepxi.inp_tgt` here, and
    our non-package `hybrid`/`mcra` stubs would break test_ref_differential's
    real imports afterwards -- each oracle loads into a clean namespace and
    hands the previous one back on teardown."""
    saved = {}
    for name in list(sys.modules):
        if name in _PREFIXES or name.startswith(tuple(p + "." for p in _PREFIXES)):
            saved[name] = sys.modules.pop(name)
    return saved


@pytest.fixture(scope="module")
def ref():
    """The reference MagXi transform + tf, loaded from the read-only mount
    (its dead fork imports stubbed: mcra.mcra123 / asr_mfcc never existed
    in the repo, hybrid drags in soundfile)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if not hasattr(np, "product"):  # removed in numpy 2.0; same semantics
        np.product = np.prod
    saved = _purge_and_snapshot()
    _stub("tqdm", tqdm=lambda x, **k: x)
    _stub("deepxi.utils", save_mat=None)  # librosa/soundfile unavailable
    _stub("mcra")
    _stub("mcra.mcra123", mcra=object, mcra_2=object, imcra=object)
    _stub("hybrid")
    _stub("hybrid.hybridMixMax", hybridMixMax=object,
          simple_extract_gaussians=None, phoneme_extract_gaussians=None)
    import tensorflow as tf
    import deepxi.inp_tgt as ref_inp_tgt
    it = ref_inp_tgt.inp_tgt_selector(
        "MagXi", **DIMS, map_type="DBNormalCDF", map_params=None)
    yield it, tf
    _purge_and_snapshot()
    sys.modules.update(saved)


def _sample(n=6, length=16000):
    """Deterministic clean/noise int16 sample; d_len == s_len everywhere so
    the reference's random noise crop collapses to offset 0."""
    rng = np.random.RandomState(7)
    t = np.arange(length) / DIMS["f_s"]
    s = np.stack([(0.35 * np.sin(2 * np.pi * (150 + 60 * i) * t)
                   * (np.sin(2 * np.pi * (2 + i) * t) > 0)) for i in range(n)])
    s = (s * 24000).astype(np.int16)
    d = (rng.randn(n, length) * 2500).astype(np.int16)
    lens = np.array([length, length - 3000, length - 7777,
                     length, length - 1, length - 256][:n], np.int32)
    snr = np.array([-5.0, 0.0, 5.0, 10.0, 15.0, 0.0][:n], np.float32)
    # zero beyond each wav_len: the reference's sample/batch arrays come
    # from its padding mix() (ref: deepxi/sig.py:214-256), so the tail is
    # zeros there -- a nonzero tail would make its truncating stats STFT
    # (inp_tgt.py:130-132) see different final-frame samples than ours
    for i, ln in enumerate(lens):
        s[i, ln:] = 0
        d[i, ln:] = 0
    return s, d, lens, snr


@pytest.fixture(scope="module")
def fitted(ref):
    """Both transforms with statistics fitted from the identical sample;
    returns (ref_it, tf, ours, sample)."""
    ref_it, tf = ref
    s, d, lens, snr = _sample()
    sf = s.astype(np.float32) / 32768.0
    df = d.astype(np.float32) / 32768.0
    xf = (s.astype(np.int32) + d.astype(np.int32)).astype(np.float32) / 32768.0
    ref_it.stats(sf, df, xf, lens)
    ours = inp_tgt_selector("MagXi", **DIMS,
                            map_type="DBNormalCDF", map_params=None)
    ours = ours.with_stats(sf, df, xf, lens)
    return ref_it, tf, ours, (s, d, lens, snr)


class TestChainParity:
    def test_map_stats(self, fitted):
        """Per-bin mu/sigma of xi_dB from identical raw waveforms
        (ref: deepxi/map.py:392-402 via inp_tgt.py:160-171)."""
        ref_it, _, ours, _ = fitted
        np.testing.assert_allclose(np.asarray(ours.xi_map.mu),
                                   np.asarray(ref_it.xi_map.mu),
                                   rtol=0, atol=2e-3)
        np.testing.assert_allclose(np.asarray(ours.xi_map.sigma),
                                   np.asarray(ref_it.xi_map.sigma),
                                   rtol=0, atol=2e-3)

    def test_example(self, fitted):
        """Training-example parity: x_STMS and mapped-xi target over a
        variable-length batch (ref: deepxi/inp_tgt.py:173-196).

        Stats are synced from the reference's fit before comparing: the
        independently-fitted mu/sigma agree only to ~2e-3 (f32 reduction
        order; asserted by test_map_stats), and that fit noise would
        otherwise dominate the chain comparison."""
        ref_it, tf, ours, (s, d, lens, snr) = fitted
        ours = ours.replace(xi_map=ours.xi_map.replace(
            mu=jnp.asarray(np.asarray(ref_it.xi_map.mu), jnp.float32),
            sigma=jnp.asarray(np.asarray(ref_it.xi_map.sigma), jnp.float32)))
        rx, rt, rn = ref_it.example(tf.constant(s.astype(np.int32)),
                                    tf.constant(d.astype(np.int32)),
                                    tf.constant(lens), tf.constant(lens),
                                    tf.constant(snr))
        ox, ot, on = ours.example(jax.random.PRNGKey(0), jnp.asarray(s),
                                  jnp.asarray(d), jnp.asarray(lens),
                                  jnp.asarray(lens), jnp.asarray(snr))
        np.testing.assert_array_equal(np.asarray(on), rn.numpy())
        rx, rt = rx.numpy(), rt.numpy()
        ox, ot = np.asarray(ox), np.asarray(ot)
        assert ox.shape == rx.shape
        # compare valid frames only (padded tail of shorter utterances)
        for i, nf in enumerate(rn.numpy()):
            np.testing.assert_allclose(ox[i, :nf], rx[i, :nf],
                                       rtol=0, atol=2e-5)
            # the CDF target is erf((xi_dB-mu)/(sigma*sqrt2)): bins with tiny
            # fitted sigma put the f32 xi_dB rounding noise on a near-vertical
            # curve, so a handful of elements land ~2e-3 apart while the bulk
            # agrees to <5e-4 (observed: 2/16191 over 5e-4, max 1.9e-3)
            err = np.abs(ot[i, :nf] - rt[i, :nf])
            assert np.mean(err <= 5e-4) > 0.999, np.sort(err.ravel())[-8:]
            np.testing.assert_allclose(ot[i, :nf], rt[i, :nf],
                                       rtol=0, atol=5e-3)

    @pytest.mark.parametrize("gain", ["mmse-lsa", "mmse-stsa", "wf",
                                      "srwf", "cwf", "irm", "ibm"])
    def test_enhanced_speech(self, fitted, gain):
        """Waveform-level parity of the whole inverse chain -- map inverse
        -> gfunc -> gain multiply -> iSTFT overlap-add
        (ref: deepxi/inp_tgt.py:198-214 + deepxi/gain.py:168-191)."""
        ref_it, tf, ours, (s, d, lens, snr) = fitted
        x = np.clip(s.astype(np.int32) + d.astype(np.int32),
                    -32768, 32767).astype(np.int16)
        ox, op = ours.observation(jnp.asarray(x))
        # a plausible network output: the fitted map of the oracle xi,
        # squashed toward 0.5 like an imperfect estimator
        sm = ours._stms(jnp.asarray(s, jnp.float32) / 32768.0)
        dm = ours._stms(jnp.asarray(d, jnp.float32) / 32768.0)
        from deepxi_tpu import sig
        xi_bar_hat = np.asarray(ours.xi_map.map(sig.xi(sm, dm)))
        xi_bar_hat = np.clip(0.8 * xi_bar_hat + 0.1, 1e-4, 1 - 1e-4)
        ry = ref_it.enhanced_speech(
            tf.constant(np.asarray(ox)), tf.constant(np.asarray(op)),
            tf.constant(xi_bar_hat), gain).numpy()
        oy = np.asarray(jax.jit(ours.enhanced_speech, static_argnums=3)(
            ox, op, jnp.asarray(xi_bar_hat), gain))
        assert oy.shape == ry.shape
        scale = np.max(np.abs(ry)) + 1e-9
        np.testing.assert_allclose(oy / scale, ry / scale,
                                   rtol=0, atol=3e-4)

    def test_xi_hat_inverse(self, fitted):
        """Inverse-map parity on the estimate path
        (ref: deepxi/map.py:373-390 erfinv inverse)."""
        ref_it, tf, ours, _ = fitted
        xb = np.linspace(1e-3, 1 - 1e-3, 257 * 4,
                         dtype=np.float32).reshape(4, 257)
        np.testing.assert_allclose(np.asarray(ours.xi_hat(jnp.asarray(xb))),
                                   np.asarray(ref_it.xi_hat(tf.constant(xb))),
                                   rtol=2e-4, atol=1e-5)
