"""Minimal faithful stand-in for ``tfa.layers.MultiHeadAttention`` so the
reference's MHANetV2/V3 graphs (ref: deepxi/network/attention.py:278-442)
can be *executed* as live oracles: the real tensorflow_addons package is
archived and incompatible with this image's TF 2.21, and there is no
network egress to fetch a compatible one.

Semantics transcribed from tensorflow_addons/layers/multihead_attention.py
(v0.x): per-head einsum projections with kernels [heads, d_in, head_size]
(query/key/value) and [heads, head_size, d_out] (projection), query scaled
by head_size^-0.5 BEFORE the score matmul, mask applied additively as
``logits += -10e9 * (1 - mask)``, no dropout at inference. Weight creation
order (query, key, value, projection) matches tfa so harvesting
``get_weights()`` reproduces the checkpoint's ``layer_with_weights``
layout. The stub is the ONLY non-reference code in those oracles -- the
graph wiring, masks, LNs, FFNs and positional embedding all execute from
the read-only reference mount.
"""

import sys
import types

import tensorflow as tf


class MultiHeadAttention(tf.keras.layers.Layer):
    def __init__(self, head_size, num_heads, output_size=None, dropout=0.0,
                 use_projection_bias=True, **kw):
        super().__init__(**kw)
        self.head_size, self.num_heads = head_size, num_heads
        self.output_size = output_size
        self.use_projection_bias = use_projection_bias

    def build(self, input_shape):
        d_q, d_k = input_shape[0][-1], input_shape[1][-1]
        out = self.output_size if self.output_size is not None else d_q
        mk = lambda n, s: self.add_weight(name=n, shape=s,
                                          initializer="glorot_uniform")
        self.query_kernel = mk("query_kernel",
                               [self.num_heads, d_q, self.head_size])
        self.key_kernel = mk("key_kernel",
                             [self.num_heads, d_k, self.head_size])
        self.value_kernel = mk("value_kernel",
                               [self.num_heads, d_k, self.head_size])
        self.projection_kernel = mk("projection_kernel",
                                    [self.num_heads, self.head_size, out])
        if self.use_projection_bias:
            self.projection_bias = self.add_weight(
                name="projection_bias", shape=[out], initializer="zeros")
        super().build(input_shape)

    def call(self, inputs):
        q, k, v = inputs[0], inputs[1], inputs[2]
        mask = inputs[3] if len(inputs) > 3 else None
        qp = tf.einsum("...NI,HIO->...NHO", q, self.query_kernel)
        qp /= tf.sqrt(tf.cast(self.head_size, qp.dtype))
        kp = tf.einsum("...MI,HIO->...MHO", k, self.key_kernel)
        vp = tf.einsum("...MI,HIO->...MHO", v, self.value_kernel)
        logits = tf.einsum("...NHO,...MHO->...HNM", qp, kp)
        if mask is not None:
            logits += -10e9 * (1.0 - tf.cast(mask, logits.dtype))
        w = tf.nn.softmax(logits)
        o = tf.einsum("...HNM,...MHO->...NHO", w, vp)
        o = tf.einsum("...NHI,HIO->...NO", o, self.projection_kernel)
        if self.use_projection_bias:
            o += self.projection_bias
        return o


def install():
    """Register the stub as `tensorflow_addons` in sys.modules (idempotent)."""
    tfa = sys.modules.get("tensorflow_addons")
    if tfa is None:
        tfa = types.ModuleType("tensorflow_addons")
        tfa.layers = types.ModuleType("tensorflow_addons.layers")
        sys.modules["tensorflow_addons"] = tfa
        sys.modules["tensorflow_addons.layers"] = tfa.layers
    tfa.layers.MultiHeadAttention = MultiHeadAttention
    return tfa
