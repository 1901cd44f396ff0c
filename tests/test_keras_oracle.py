"""Live-Keras numeric oracles for the checkpoint importers (round-3
VERDICT next #2): the shipped reference checkpoints are truncated
(resnet-1.1c has 1 of 2 data shards, mhanet-1.1c only the index), so
weight-import parity is proven the way the ResLSTM importer already was
(tests/test_compat_import.py): build the reference's OWN network code as a
live Keras graph, randomise its weights, harvest them in
``layer_with_weights`` order, run them through ``compat.tf_import``, and
assert forward parity between the Keras model and our flax model on
identical (masked, variable-length) batches.

The ResNetV2 (ref: deepxi/network/tcn.py:116-225) and MHANetV2
(ref: deepxi/network/attention.py:278-385) graphs are executed directly
from the read-only reference mount. MHANetV3 (attention.py:387-442) builds
its positional encoding with raw tf ops on symbolic tensors, which Keras 3
rejects, so that oracle runs in a subprocess under legacy Keras
(TF_USE_LEGACY_KERAS=1, tf_keras 2.21) -- the API generation the reference
was written for. tfa.layers.MultiHeadAttention is unavailable in this
image; tests use the faithful einsum stub in tests/_tfa_stub.py (weight
order, scaling and -10e9 masking transcribed from tfa -- see its
docstring), so the attention *internals* are pinned by transcription while
every other layer and the whole graph wiring are the reference's code.
"""

import importlib.util
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.compat import (import_mhanet_v2, import_mhanet_v3,
                               import_resnet)
from deepxi_tpu.models import network_selector

REF = "/root/reference/deepxi/network"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def _load_ref(name, fname):
    path = os.path.join(REF, fname)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _randomise_and_harvest(kmodel, rng):
    """Randomise every weighted layer (LN scale kept near 1 so activations
    stay well-conditioned through deep stacks) and return the
    {layer_index: {field: array}} dict the importers consume."""
    layers = {}
    idx = 0
    for lyr in kmodel.layers:
        w = lyr.get_weights()
        if not w:
            continue
        cls = type(lyr).__name__
        if cls == "LayerNormalization":
            w = [np.ones_like(a) + 0.2 * rng.randn(*a.shape).astype(np.float32)
                 if i == 0 else 0.2 * rng.randn(*a.shape).astype(np.float32)
                 for i, a in enumerate(w)]
        else:
            w = [0.4 * rng.randn(*a.shape).astype(np.float32) for a in w]
        lyr.set_weights(w)
        if cls == "MultiHeadAttention":  # the tfa stub, creation order
            layers[idx] = {"query_kernel": w[0], "key_kernel": w[1],
                           "value_kernel": w[2], "projection_kernel": w[3]}
        elif cls == "Embedding":
            layers[idx] = {"embeddings": w[0]}
        elif cls == "LayerNormalization":
            layers[idx] = {"gamma": w[0]} if len(w) == 1 else \
                {"gamma": w[0], "beta": w[1]}
        else:  # Conv1D
            layers[idx] = {"kernel": w[0]} if len(w) == 1 else \
                {"kernel": w[0], "bias": w[1]}
        idx += 1
    return layers


class TestResNetV2KerasOracle:
    @pytest.mark.parametrize("unit_type", ["ReLU->LN->W+b", "LN->ReLU->W+b"])
    def test_numeric_parity(self, unit_type):
        """Forward parity vs the reference's live ResNetV2 graph
        (ref: deepxi/network/tcn.py:116-225), including the cyclic
        dilation 1,2,4,1,2 at n_blocks=5 / max_d_rate=4 and the
        weightless center/scale=False unit LNs."""
        tf = pytest.importorskip("tensorflow")
        tcn = _load_ref("ref_tcn_oracle", "tcn.py")

        d_in = n_outp = 17
        n_blocks, d_model, d_f, k, max_d_rate = 5, 16, 8, 3, 4
        inp = tf.keras.Input(shape=(None, d_in))
        net_k = tcn.ResNetV2(inp, n_outp, n_blocks=n_blocks, d_model=d_model,
                             d_f=d_f, k=k, max_d_rate=max_d_rate,
                             padding="causal", unit_type=unit_type,
                             outp_act="Sigmoid")
        kmodel = tf.keras.Model(inp, net_k.outp)

        rng = np.random.RandomState(10)
        layers = _randomise_and_harvest(kmodel, rng)
        assert len(layers) == 2 + 3 * n_blocks + 1
        params = import_resnet(layers, n_blocks=n_blocks, version=2)

        net_j = network_selector("ResNetV2", n_outp, d_model=d_model,
                                 n_blocks=n_blocks, d_f=d_f, k=k,
                                 max_d_rate=max_d_rate, causal=True,
                                 unit_type=unit_type, outp_act="Sigmoid")
        x = np.abs(rng.randn(2, 24, d_in)).astype(np.float32)
        y_k = np.asarray(kmodel(x))
        y_j = np.asarray(net_j.apply(
            jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x)))
        np.testing.assert_allclose(y_j, y_k, atol=3e-5)


class TestMHANetV2KerasOracle:
    def test_numeric_parity(self):
        """Forward parity vs the reference's live MHANetV2 graph
        (ref: deepxi/network/attention.py:278-385): AttentionMaskV2's
        merged causal+Masking(0.0) mask, the tfa-layout attention, both
        per-block LNs and the conv FFN, on a batch with a padded tail."""
        tf = pytest.importorskip("tensorflow")
        import _tfa_stub
        _tfa_stub.install()
        att = _load_ref("ref_attention_oracle", "attention.py")

        d_in = n_outp = 11
        d_model, n_blocks, n_heads = 16, 2, 4
        inp = tf.keras.Input(shape=(None, d_in))
        net_k = att.MHANetV2(inp, n_outp, d_model=d_model, n_blocks=n_blocks,
                             n_heads=n_heads, warmup_steps=100, causal=True,
                             outp_act="Sigmoid")
        kmodel = tf.keras.Model(inp, net_k.outp)

        rng = np.random.RandomState(11)
        layers = _randomise_and_harvest(kmodel, rng)
        assert len(layers) == 2 + 5 * n_blocks + 1
        params = import_mhanet_v2(layers, n_blocks=n_blocks)

        net_j = network_selector("MHANetV2", n_outp, d_model=d_model,
                                 n_blocks=n_blocks, n_heads=n_heads,
                                 causal=True, outp_act="Sigmoid")
        x = np.abs(rng.randn(2, 12, d_in)).astype(np.float32)
        x[1, 8:] = 0.0  # padded tail -> Masking(0.0)
        y_k = np.asarray(kmodel(x))
        y_j = np.asarray(net_j.apply(
            jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x)))
        np.testing.assert_allclose(y_j[0], y_k[0], atol=3e-5)
        np.testing.assert_allclose(y_j[1, :8], y_k[1, :8], atol=3e-5)


_V3_SUBPROC = r"""
import os
os.environ["TF_USE_LEGACY_KERAS"] = "1"  # V3 builds raw tf ops on symbolic
import importlib.util, sys
import numpy as np
import tensorflow as tf
sys.path.insert(0, {test_dir!r})
import _tfa_stub
_tfa_stub.install()
spec = importlib.util.spec_from_file_location(
    "ref_attention_oracle", "/root/reference/deepxi/network/attention.py")
mod = importlib.util.module_from_spec(spec)
sys.modules["ref_attention_oracle"] = mod
spec.loader.exec_module(mod)

d_in = n_outp = 11
d_model, n_blocks, n_heads, max_len = 16, 2, 4, 32
inp = tf.keras.Input(shape=(None, d_in))
net = mod.MHANetV3(inp, n_outp, d_model=d_model, n_blocks=n_blocks,
                   n_heads=n_heads, warmup_steps=100, max_len=max_len,
                   causal=True, outp_act="Sigmoid")
kmodel = tf.keras.Model(inp, net.outp)

rng = np.random.RandomState(12)
out = {{}}
idx = 0
for lyr in kmodel.layers:
    w = lyr.get_weights()
    if not w:
        continue
    if type(lyr).__name__ == "LayerNormalization":
        w = [np.ones_like(a) + 0.2 * rng.randn(*a.shape).astype(np.float32)
             if i == 0 else 0.2 * rng.randn(*a.shape).astype(np.float32)
             for i, a in enumerate(w)]
    else:
        w = [0.4 * rng.randn(*a.shape).astype(np.float32) for a in w]
    lyr.set_weights(w)
    names = {{"MultiHeadAttention": ["query_kernel", "key_kernel",
                                     "value_kernel", "projection_kernel"],
              "Embedding": ["embeddings"],
              "LayerNormalization": ["gamma", "beta"],
              "Conv1D": ["kernel", "bias"]}}[type(lyr).__name__]
    for n, a in zip(names, w):
        out[f"l{{idx}}.{{n}}"] = a
    idx += 1

x = np.abs(rng.randn(2, 12, d_in)).astype(np.float32)
x[1, 8:] = 0.0
out["x"] = x
out["y"] = np.asarray(kmodel(x))
np.savez({npz_path!r}, **out)
print("V3_ORACLE_OK", idx)
"""


class TestMHANetV3KerasOracle:
    @pytest.mark.slow  # legacy-Keras subprocess: 37 s contended
    def test_numeric_parity_subprocess(self, tmp_path):
        """Forward parity vs the reference's live MHANetV3 graph
        (ref: deepxi/network/attention.py:387-442) -- V2 plus the
        BERT-style learned positional Embedding added after the
        in-projection -- executed under legacy Keras in a subprocess
        (raw-tf-op graph construction; see module docstring)."""
        pytest.importorskip("tensorflow")
        npz_path = str(tmp_path / "v3_oracle.npz")
        script = _V3_SUBPROC.format(
            test_dir=os.path.dirname(os.path.abspath(__file__)),
            npz_path=npz_path)
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=600)
        assert "V3_ORACLE_OK" in r.stdout, r.stderr[-2000:]

        z = np.load(npz_path)
        layers = {}
        for key in z.files:
            if key.startswith("l"):
                idx, field = key[1:].split(".", 1)
                layers.setdefault(int(idx), {})[field] = z[key]
        params = import_mhanet_v3(layers, n_blocks=2)

        net_j = network_selector("MHANetV3", 11, d_model=16, n_blocks=2,
                                 n_heads=4, causal=True, outp_act="Sigmoid",
                                 max_len=32)
        y_j = np.asarray(net_j.apply(
            jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(z["x"])))
        np.testing.assert_allclose(y_j[0], z["y"][0], atol=3e-5)
        np.testing.assert_allclose(y_j[1, :8], z["y"][1, :8], atol=3e-5)
