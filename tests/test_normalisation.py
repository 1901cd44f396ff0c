"""Legacy normalisation library (ref: deepxi/normalisation.py:15-150).

The reference file is dead TF1 code (unimportable under TF2, IndentationError
at :128), so there is no runnable oracle; each variant is checked against a
direct NumPy loop implementing the documented TF-op semantics.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from deepxi_tpu.ops import (
    frame_layer_norm,
    normalisation,
    seq_causal_layer_norm,
    seq_layer_norm,
)

EPS = 1e-12


def _rand(b=3, t=7, f=5, seed=0):
    return np.random.RandomState(seed).randn(b, t, f).astype(np.float32)


def test_frame_layer_norm_matches_numpy_oracle():
    x = _rand()
    mu = x.mean(-1, keepdims=True)
    sig = ((x - mu) ** 2).mean(-1, keepdims=True)
    want = (x - mu) / np.sqrt(sig + EPS)
    got = np.asarray(frame_layer_norm(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_frame_layer_norm_beta_gamma():
    x = _rand(seed=1)
    beta = np.full((5,), 0.25, np.float32)
    gamma = np.full((5,), 2.0, np.float32)
    base = np.asarray(frame_layer_norm(jnp.asarray(x)))
    got = np.asarray(
        frame_layer_norm(jnp.asarray(x), jnp.asarray(beta), jnp.asarray(gamma))
    )
    np.testing.assert_allclose(got, base * 2.0 + 0.25, atol=1e-5)


def test_seq_layer_norm_matches_masked_numpy_oracle():
    x = _rand(seed=2)
    seq_len = np.array([7, 4, 1], np.int32)
    got = np.asarray(seq_layer_norm(jnp.asarray(x), jnp.asarray(seq_len)))
    for b, sl in enumerate(seq_len):
        valid = x[b, :sl]
        mu = valid.mean()
        sig = ((valid - mu) ** 2).mean()
        want = (x[b] - mu) / np.sqrt(sig + EPS)
        np.testing.assert_allclose(got[b, :sl], want[:sl], atol=1e-4)
        assert np.all(got[b, sl:] == 0.0)  # ref re-masks (normalisation.py:149)


def test_seq_causal_layer_norm_matches_reference_estimator():
    # Direct loop over the reference's exact cumulative formulas
    # (normalisation.py:55-58): den[t]=(t+1)*F, mu from cumsum of frame sums,
    # sigma from cumsum of squared deviations from each frame's OWN mu.
    x = _rand(seed=3)
    b_, t_, f_ = x.shape
    seq_len = np.array([7, 5, 3], np.int32)
    mask = (np.arange(t_)[None, :] < seq_len[:, None]).astype(np.float32)
    xm = x * mask[..., None]
    mu = np.zeros((b_, t_)); sig = np.zeros((b_, t_))
    for b in range(b_):
        acc_s, acc_d = 0.0, 0.0
        for t in range(t_):
            acc_s += xm[b, t].sum()
            mu[b, t] = acc_s / ((t + 1) * f_)
            acc_d += ((xm[b, t] - mu[b, t]) ** 2).sum()
            sig[b, t] = acc_d / ((t + 1) * f_)
    want = (x - mu[..., None]) / np.sqrt(sig[..., None] + EPS) * mask[..., None]
    got = np.asarray(seq_causal_layer_norm(jnp.asarray(x), jnp.asarray(seq_len)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_seq_causal_layer_norm_is_causal():
    x = _rand(seed=4)
    seq_len = jnp.asarray([7, 7, 7])
    y1 = np.asarray(seq_causal_layer_norm(jnp.asarray(x), seq_len))
    x2 = x.copy()
    x2[:, 5:] += 100.0  # perturb the future
    y2 = np.asarray(seq_causal_layer_norm(jnp.asarray(x2), seq_len))
    np.testing.assert_allclose(y1[:, :5], y2[:, :5], atol=1e-5)
    assert np.abs(y1[:, 5:] - y2[:, 5:]).max() > 1e-3


def test_seq_causal_layer_norm_padding_cannot_leak():
    # Defect fix vs reference: garbage past seq_len must not alter valid
    # frames (the ref relies on the caller zero-padding; see module doc).
    x = _rand(seed=5)
    seq_len = jnp.asarray([4, 4, 4])
    y1 = np.asarray(seq_causal_layer_norm(jnp.asarray(x), seq_len))
    x2 = x.copy()
    x2[:, 4:] = 1e6
    y2 = np.asarray(seq_causal_layer_norm(jnp.asarray(x2), seq_len))
    np.testing.assert_allclose(y1[:, :4], y2[:, :4], atol=1e-5)


def test_normalisation_dispatch():
    x = jnp.asarray(_rand(seed=6))
    sl = jnp.asarray([7, 7, 7])
    np.testing.assert_allclose(
        np.asarray(normalisation(x, "FrameLayerNorm")),
        np.asarray(frame_layer_norm(x)))
    np.testing.assert_allclose(
        np.asarray(normalisation(x, "SeqLayerNorm", sl)),
        np.asarray(seq_layer_norm(x, sl)))
    np.testing.assert_allclose(
        np.asarray(normalisation(x, "SeqCausalLayerNorm", sl)),
        np.asarray(seq_causal_layer_norm(x, sl)))
    assert normalisation(x, "unnormalised") is x
    # ref defect fixed: unknown type raises instead of returning None
    # (normalisation.py:34 builds the ValueError without `raise`).
    with pytest.raises(ValueError):
        normalisation(x, "NoSuchNorm")
