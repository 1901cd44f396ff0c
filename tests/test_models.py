"""Network zoo tests: shapes, parameter-count parity with the reference's
Keras summaries, causality, and masking invariances."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.models import network_selector


def n_params(p):
    return sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(p))


def make_input(B=2, T=24, F=257, valid=(20, 14)):
    rng = np.random.RandomState(0)
    x = np.zeros((B, T, F), np.float32)
    for i, v in enumerate(valid):
        x[i, :v] = np.abs(rng.randn(v, F)) + 1e-3
    return jnp.asarray(x)


CONFIGS = {
    # (network_type, kwargs, expected_param_count_or_None)
    "resnet-1.1c": ("ResNetV2", dict(d_model=256, n_blocks=40, d_f=64, k=3,
                                     max_d_rate=16, causal=True,
                                     unit_type="ReLU->LN->W+b",
                                     outp_act="Sigmoid"), 1_949_953),
    "mhanet-1.1c": ("MHANetV3", dict(d_model=256, n_blocks=5, n_heads=8,
                                     causal=True, outp_act="Sigmoid",
                                     max_len=2048), 4_600_321),
}

SMALL = [
    ("ResNet", dict(d_model=32, n_blocks=6, d_f=16, k=3, max_d_rate=4,
                    causal=True, outp_act="Sigmoid")),
    ("ResNetV2", dict(d_model=32, n_blocks=6, d_f=16, k=3, max_d_rate=4,
                      causal=True, unit_type="ReLU->LN->W+b", outp_act="Sigmoid")),
    ("ResNetV3", dict(d_model=32, n_blocks=6, d_f=16, k=3, max_d_rate=4,
                      causal=False, unit_type="LN->ReLU->W+b", outp_act="Sigmoid")),
    ("MHANet", dict(d_model=32, n_blocks=2, n_heads=4, causal=True, outp_act="Sigmoid")),
    ("MHANetV2", dict(d_model=32, n_blocks=2, n_heads=4, causal=True, outp_act="Sigmoid")),
    ("MHANetV3", dict(d_model=32, n_blocks=2, n_heads=4, causal=True,
                      outp_act="Sigmoid", max_len=64)),
    ("ResLSTM", dict(d_model=32, n_blocks=2, outp_act="Sigmoid")),
    ("ResBiLSTM", dict(d_model=32, n_blocks=2, outp_act="Sigmoid")),
    ("RDLNet", dict(n_blocks=2, length=5, m_1=16, causal=False, outp_act="Sigmoid")),
]


class TestParamParity:
    @pytest.mark.parametrize("ver", list(CONFIGS))
    def test_flagship_param_counts(self, ver):
        # Exact parity with the reference Keras summaries
        # (ref: log/summary/resnet-1.1c.txt, log/summary/mhanet-1.1c.txt).
        nt, kw, expect = CONFIGS[ver]
        net = network_selector(nt, 257, **kw)
        p = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 257)))
        assert n_params(p) == expect


class TestZoo:
    @pytest.mark.parametrize("nt,kw", [
        pytest.param(c[0], c[1], id=c[0] + str(i),
                     marks=([pytest.mark.slow] if c[0] == "RDLNet"
                            else []))  # lattice compile: 50 s contended
        for i, c in enumerate(SMALL)])
    def test_shapes_and_finite(self, nt, kw):
        x = make_input()
        net = network_selector(nt, 257, **kw)
        p = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(p, x)
        assert out.shape == (2, 24, 257)
        assert np.isfinite(np.asarray(out)).all()
        # Sigmoid output in [0, 1]
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_invalid_network_raises(self):
        with pytest.raises(ValueError):
            network_selector("ResNetV9", 257)


class TestCausality:
    def test_causal_tcn_ignores_future(self):
        # Perturbing frame t must not change outputs at frames < t.
        nt, kw = SMALL[1]
        net = network_selector(nt, 257, **kw)
        x = make_input(B=1, T=24, valid=(24,))
        p = net.init(jax.random.PRNGKey(0), x)
        y0 = np.asarray(net.apply(p, x))
        x2 = x.at[0, 15].set(x[0, 15] + 5.0)
        y1 = np.asarray(net.apply(p, x2))
        np.testing.assert_allclose(y0[0, :15], y1[0, :15], atol=1e-6)
        assert np.abs(y0[0, 15:] - y1[0, 15:]).max() > 1e-6

    def test_causal_attention_ignores_future(self):
        net = network_selector("MHANetV3", 257, d_model=32, n_blocks=2, n_heads=4,
                               causal=True, outp_act="Sigmoid", max_len=64)
        x = make_input(B=1, T=24, valid=(24,))
        p = net.init(jax.random.PRNGKey(0), x)
        y0 = np.asarray(net.apply(p, x))
        x2 = x.at[0, 20].set(x[0, 20] + 3.0)
        y1 = np.asarray(net.apply(p, x2))
        np.testing.assert_allclose(y0[0, :20], y1[0, :20], atol=1e-5)


class TestMasking:
    def test_attention_padding_invariance(self):
        # Valid-frame outputs must not depend on what sits in the padding.
        net = network_selector("MHANetV2", 257, d_model=32, n_blocks=2, n_heads=4,
                               causal=False, outp_act="Sigmoid")
        x = make_input(B=1, T=24, valid=(16,))
        p = net.init(jax.random.PRNGKey(0), x)
        y0 = np.asarray(net.apply(p, x))
        x2 = x.at[0, 16:].set(0.0)  # padding already zero; keep zero
        x3 = jnp.concatenate([x[:, :16], jnp.zeros((1, 30, 257))], axis=1)
        y3 = np.asarray(net.apply(p, x3))
        np.testing.assert_allclose(y0[0, :16], y3[0, :16], atol=1e-5)

    def test_lstm_padding_invariance(self):
        net = network_selector("ResLSTM", 257, d_model=32, n_blocks=2, outp_act="Sigmoid")
        x = make_input(B=1, T=24, valid=(16,))
        p = net.init(jax.random.PRNGKey(0), x)
        y0 = np.asarray(net.apply(p, x))
        x3 = jnp.concatenate([x[:, :16], jnp.zeros((1, 10, 257))], axis=1)
        y3 = np.asarray(net.apply(p, x3))
        np.testing.assert_allclose(y0[0, :16], y3[0, :16], atol=1e-5)


def test_output_activation_softplus():
    """Softplus head (extension beyond the reference's taxonomy; motivated
    by MagSMM's dead-ReLU collapse) is smooth, strictly positive, and
    asymptotically linear."""
    from deepxi_tpu.models.tcn import output_activation

    x = jnp.asarray([-20.0, -1.0, 0.0, 1.0, 20.0])
    y = np.asarray(output_activation(x, "Softplus"))
    assert (y > 0).all()
    np.testing.assert_allclose(y[2], np.log(2.0), rtol=1e-6)
    np.testing.assert_allclose(y[4], 20.0, atol=1e-6)
