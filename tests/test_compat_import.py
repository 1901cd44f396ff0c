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
