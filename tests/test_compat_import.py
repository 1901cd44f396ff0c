"""Checkpoint-importer mapping tests: synthetic Keras-ordered layer dicts
must land in the right flax param slots (shapes verified against the shipped
checkpoint indices; the shipped data shards themselves are truncated)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.compat import import_mhanet_v3, import_resnet
from deepxi_tpu.models import network_selector


def _resnet_layers(n_blocks, d_in, d_model, d_f, k, n_outp, rng):
    """Synthetic checkpoint in Keras layer_with_weights order for ResNetV2."""
    layers = {}
    layers[0] = {"kernel": rng.randn(1, d_in, d_model).astype(np.float32),
                 "bias": rng.randn(d_model).astype(np.float32)}
    layers[1] = {"gamma": rng.randn(d_model).astype(np.float32)}
    idx = 2
    for i in range(n_blocks):
        for (cin, cout, kk) in [(d_model, d_f, 1), (d_f, d_f, k), (d_f, d_model, 1)]:
            layers[idx] = {"kernel": rng.randn(kk, cin, cout).astype(np.float32),
                           "bias": rng.randn(cout).astype(np.float32)}
            idx += 1
    layers[idx] = {"kernel": rng.randn(1, d_model, n_outp).astype(np.float32),
                   "bias": rng.randn(n_outp).astype(np.float32)}
    return layers


class TestResNetImport:
    def test_roundtrip_and_apply(self):
        rng = np.random.RandomState(0)
        layers = _resnet_layers(3, 257, 32, 16, 3, 257, rng)
        params = import_resnet(layers, n_blocks=3, version=2)
        net = network_selector("ResNetV2", 257, d_model=32, n_blocks=3, d_f=16,
                               k=3, max_d_rate=2, causal=True,
                               unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
        # every imported slot matches its source layer
        np.testing.assert_array_equal(params["params"]["ff_conv"]["kernel"],
                                      layers[0]["kernel"])
        np.testing.assert_array_equal(params["params"]["ff_ln"]["scale"],
                                      layers[1]["gamma"])
        np.testing.assert_array_equal(params["params"]["block1_u2_conv"]["kernel"],
                                      layers[2 + 3 + 1]["kernel"])
        np.testing.assert_array_equal(params["params"]["out_conv"]["bias"],
                                      layers[11]["bias"])
        # imported tree has exactly the shapes flax init produces and applies
        ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 257)))
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
        imp_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
        assert ref_shapes == imp_shapes
        out = net.apply(jax.tree_util.tree_map(jnp.asarray, params),
                        jnp.abs(jnp.asarray(rng.randn(1, 8, 257), jnp.float32)))
        assert np.isfinite(np.asarray(out)).all()


class TestMHANetImport:
    def test_roundtrip_and_apply(self):
        rng = np.random.RandomState(1)
        d_model, n_heads, n_blocks, n_outp = 32, 4, 2, 257
        d_k, d_ff = d_model // n_heads, d_model * 4
        layers = {0: {"kernel": rng.randn(1, 257, d_model).astype(np.float32)},
                  1: {"gamma": rng.randn(d_model).astype(np.float32),
                      "beta": rng.randn(d_model).astype(np.float32)},
                  2: {"embeddings": rng.randn(64, d_model).astype(np.float32)}}
        idx = 3
        for i in range(n_blocks):
            layers[idx] = {
                "query_kernel": rng.randn(n_heads, d_model, d_k).astype(np.float32),
                "key_kernel": rng.randn(n_heads, d_model, d_k).astype(np.float32),
                "value_kernel": rng.randn(n_heads, d_model, d_k).astype(np.float32),
                "projection_kernel": rng.randn(n_heads, d_k, d_model).astype(np.float32)}
            idx += 1
            layers[idx] = {"gamma": rng.randn(d_model).astype(np.float32),
                           "beta": rng.randn(d_model).astype(np.float32)}; idx += 1
            layers[idx] = {"kernel": rng.randn(1, d_model, d_ff).astype(np.float32),
                           "bias": rng.randn(d_ff).astype(np.float32)}; idx += 1
            layers[idx] = {"kernel": rng.randn(1, d_ff, d_model).astype(np.float32),
                           "bias": rng.randn(d_model).astype(np.float32)}; idx += 1
            layers[idx] = {"gamma": rng.randn(d_model).astype(np.float32),
                           "beta": rng.randn(d_model).astype(np.float32)}; idx += 1
        layers[idx] = {"kernel": rng.randn(1, d_model, n_outp).astype(np.float32),
                       "bias": rng.randn(n_outp).astype(np.float32)}

        params = import_mhanet_v3(layers, n_blocks=n_blocks)
        net = network_selector("MHANetV3", 257, d_model=d_model,
                               n_blocks=n_blocks, n_heads=n_heads, causal=True,
                               outp_act="Sigmoid", max_len=64)
        ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 257)))
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
        imp_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
        assert ref_shapes == imp_shapes
        np.testing.assert_array_equal(
            params["params"]["block0_mha"]["query_kernel"], layers[3]["query_kernel"])
        np.testing.assert_array_equal(
            params["params"]["block1_ff1"]["kernel"], layers[10]["kernel"][0])
        out = net.apply(jax.tree_util.tree_map(jnp.asarray, params),
                        jnp.abs(jnp.asarray(rng.randn(1, 8, 257), jnp.float32)))
        assert np.isfinite(np.asarray(out)).all()


def _mha_common_layers(rng, d_model, n_blocks, n_outp, d_ff, mha_entry):
    """Synthetic checkpoint layers shared by the V1/V2 builders: in conv,
    in LN, per block [mha, ln1, ff1, ff2, ln2], out conv."""
    layers = {0: {"kernel": rng.randn(1, n_outp, d_model).astype(np.float32)},
              1: {"gamma": rng.randn(d_model).astype(np.float32),
                  "beta": rng.randn(d_model).astype(np.float32)}}
    idx = 2
    for _ in range(n_blocks):
        layers[idx] = mha_entry(); idx += 1
        layers[idx] = {"gamma": rng.randn(d_model).astype(np.float32),
                       "beta": rng.randn(d_model).astype(np.float32)}; idx += 1
        layers[idx] = {"kernel": rng.randn(1, d_model, d_ff).astype(np.float32),
                       "bias": rng.randn(d_ff).astype(np.float32)}; idx += 1
        layers[idx] = {"kernel": rng.randn(1, d_ff, d_model).astype(np.float32),
                       "bias": rng.randn(d_model).astype(np.float32)}; idx += 1
        layers[idx] = {"gamma": rng.randn(d_model).astype(np.float32),
                       "beta": rng.randn(d_model).astype(np.float32)}; idx += 1
    layers[idx] = {"kernel": rng.randn(1, d_model, n_outp).astype(np.float32),
                   "bias": rng.randn(n_outp).astype(np.float32)}
    return layers


class TestMHANetV1Import:
    def test_roundtrip_and_apply(self):
        from deepxi_tpu.compat import import_mhanet_v1
        rng = np.random.RandomState(2)
        d_model, n_heads, n_blocks, n_outp = 32, 4, 2, 257

        def mha_entry():
            return {f"linear_{n}/kernel":
                    rng.randn(1, d_model, d_model).astype(np.float32)
                    for n in "qkvo"}

        layers = _mha_common_layers(rng, d_model, n_blocks, n_outp,
                                    d_model * 4, mha_entry)
        params = import_mhanet_v1(layers, n_blocks=n_blocks)
        net = network_selector("MHANet", n_outp, d_model=d_model,
                               n_blocks=n_blocks, n_heads=n_heads,
                               causal=True, outp_act="Sigmoid")
        ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, n_outp)))
        assert (jax.tree_util.tree_map(lambda a: a.shape, ref)
                == jax.tree_util.tree_map(lambda a: a.shape, params))
        np.testing.assert_array_equal(
            params["params"]["block0_mha"]["linear_q"]["kernel"],
            layers[2]["linear_q/kernel"][0])
        np.testing.assert_array_equal(
            params["params"]["block1_ff2"]["bias"], layers[10]["bias"])
        out = net.apply(jax.tree_util.tree_map(jnp.asarray, params),
                        jnp.abs(jnp.asarray(rng.randn(1, 8, n_outp), jnp.float32)))
        assert np.isfinite(np.asarray(out)).all()


class TestMHANetV2Import:
    def test_roundtrip_and_apply(self):
        from deepxi_tpu.compat import import_mhanet_v2
        rng = np.random.RandomState(3)
        d_model, n_heads, n_blocks, n_outp = 32, 4, 2, 257
        d_k = d_model // n_heads

        def mha_entry():
            return {"query_kernel": rng.randn(n_heads, d_model, d_k).astype(np.float32),
                    "key_kernel": rng.randn(n_heads, d_model, d_k).astype(np.float32),
                    "value_kernel": rng.randn(n_heads, d_model, d_k).astype(np.float32),
                    "projection_kernel": rng.randn(n_heads, d_k, d_model).astype(np.float32)}

        layers = _mha_common_layers(rng, d_model, n_blocks, n_outp,
                                    d_model * 4, mha_entry)
        params = import_mhanet_v2(layers, n_blocks=n_blocks)
        assert "pos_emb" not in params["params"]
        net = network_selector("MHANetV2", n_outp, d_model=d_model,
                               n_blocks=n_blocks, n_heads=n_heads,
                               causal=True, outp_act="Sigmoid")
        ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, n_outp)))
        assert (jax.tree_util.tree_map(lambda a: a.shape, ref)
                == jax.tree_util.tree_map(lambda a: a.shape, params))
        np.testing.assert_array_equal(
            params["params"]["block1_mha"]["key_kernel"],
            layers[7]["key_kernel"])
        out = net.apply(jax.tree_util.tree_map(jnp.asarray, params),
                        jnp.abs(jnp.asarray(rng.randn(1, 8, n_outp), jnp.float32)))
        assert np.isfinite(np.asarray(out)).all()


class TestResLSTMImport:
    @pytest.mark.slow  # 32 s clean CPU: live Keras graph build + TF import
    def test_numeric_parity_with_keras(self):
        """Full numeric oracle: a live Keras model with the reference's
        exact layer structure (ref: deepxi/network/rnn.py:13-79, with the
        upstream return_sequences semantics) is sampled for weights; the
        imported flax model must produce the same outputs on valid frames,
        including under Masking(0.0) padding."""
        tf = pytest.importorskip("tensorflow")
        from deepxi_tpu.compat import import_reslstm

        d_in, d_model, n_blocks, n_outp = 5, 8, 2, 7
        from tensorflow.keras.layers import (LSTM, Add, Dense, Input,
                                             LayerNormalization, Masking,
                                             ReLU, TimeDistributed)
        inp = Input(shape=(None, d_in))
        mask = Masking(mask_value=0.0).compute_mask(inp)
        x = Dense(d_model, use_bias=False)(inp)
        x = LayerNormalization(axis=2, epsilon=1e-6)(x)
        x = ReLU()(x)
        for _ in range(n_blocks):
            h = LSTM(d_model, return_sequences=True)(x, mask=mask)
            x = Add()([x, h])
        out = TimeDistributed(Dense(n_outp))(x)
        kmodel = tf.keras.Model(inp, out)

        # harvest weights in the reference's layer order
        rng = np.random.RandomState(4)
        layers = {}
        idx = 0
        for lyr in kmodel.layers:
            w = lyr.get_weights()
            if not w:
                continue
            # randomise so the test is not at init symmetry
            w = [rng.randn(*a.shape).astype(np.float32) * 0.4 for a in w]
            lyr.set_weights(w)
            if isinstance(lyr, TimeDistributed):
                layers[idx] = {"layer/kernel": w[0], "layer/bias": w[1]}
            elif isinstance(lyr, LSTM):
                layers[idx] = {"cell/kernel": w[0],
                               "cell/recurrent_kernel": w[1],
                               "cell/bias": w[2]}
            elif isinstance(lyr, LayerNormalization):
                layers[idx] = {"gamma": w[0], "beta": w[1]}
            else:
                layers[idx] = {"kernel": w[0]} if len(w) == 1 else \
                    {"kernel": w[0], "bias": w[1]}
            idx += 1

        params = import_reslstm(layers, n_blocks=n_blocks)
        net = network_selector("ResLSTM", n_outp, d_model=d_model,
                               n_blocks=n_blocks, outp_act="Linear")
        ref_shapes = jax.tree_util.tree_map(
            lambda a: a.shape, net.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 4, d_in))))
        assert ref_shapes == jax.tree_util.tree_map(lambda a: a.shape, params)

        x_in = rng.randn(2, 12, d_in).astype(np.float32)
        x_in[1, 8:] = 0.0  # padded tail -> Masking(0.0)
        y_k = np.asarray(kmodel(x_in))
        y_j = np.asarray(net.apply(
            jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x_in)))
        np.testing.assert_allclose(y_j[0], y_k[0], atol=2e-5)
        np.testing.assert_allclose(y_j[1, :8], y_k[1, :8], atol=2e-5)


class TestShippedIndices:
    """Against the real (truncated) checkpoints: shapes in the index must
    line up with our flax trees, proving the positional mapping."""

    def test_resnet_index_alignment(self):
        import os
        p = "/root/reference/model/resnet-1.1c/epoch-199/variables/variables"
        if not os.path.exists(p + ".index"):
            pytest.skip("reference not mounted")
        import re
        import tensorflow as tf
        rdr = tf.train.load_checkpoint(p)
        shapes = {}
        for k, s in rdr.get_variable_to_shape_map().items():
            m = re.match(r"layer_with_weights-(\d+)/([^/]+)/\.ATTRIBUTES/VARIABLE_VALUE$", k)
            if m:
                shapes.setdefault(int(m.group(1)), {})[m.group(2)] = tuple(s)
        assert shapes[0]["kernel"] == (1, 257, 256)
        assert shapes[1] == {"gamma": (256,)}
        assert shapes[2]["kernel"] == (1, 256, 64)
        assert shapes[121]["kernel"] == (1, 64, 256)
        assert shapes[122]["kernel"] == (1, 256, 257)
        assert len(shapes) == 123
