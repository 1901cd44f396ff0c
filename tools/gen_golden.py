"""Generate golden test fixtures from TensorFlow (the reference's numerics
substrate) into tests/golden/*.npz.

Run once in an environment with TF available:
    python tools/gen_golden.py

The fixtures pin the exact `tf.signal` semantics the reference relies on
(ref: deepxi/sig.py:43-95, deepxi/dct.py) so the test suite never needs TF at
test time. The reference tree itself is only *called* here (mounted read-only)
to capture behaviour; no reference code is copied into this repo.
"""

import os
import sys

os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

import numpy as np
import tensorflow as tf
from tensorflow.python.ops.signal import window_ops
import functools

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

N_d, N_s, K, f_s = 512, 256, 512, 16000
W = functools.partial(window_ops.hamming_window, periodic=False)


def gen_stft():
    rng = np.random.RandomState(0)
    # Odd length exercises pad_end framing; include a short and a batch case.
    x1 = rng.randn(7000).astype(np.float32)
    x2 = rng.randn(2, 5120).astype(np.float32)
    X1 = tf.signal.stft(x1, N_d, N_s, K, window_fn=W, pad_end=True)
    X2 = tf.signal.stft(x2, N_d, N_s, K, window_fn=W, pad_end=True)
    y1 = tf.signal.inverse_stft(X1, N_d, N_s, K,
                                tf.signal.inverse_stft_window_fn(N_s, W))
    win = W(N_d, dtype=tf.float32)
    np.savez(os.path.join(OUT, "stft.npz"),
             x1=x1, x2=x2,
             X1_re=np.real(X1.numpy()), X1_im=np.imag(X1.numpy()),
             X2_re=np.real(X2.numpy()), X2_im=np.imag(X2.numpy()),
             y1=y1.numpy(), window=win.numpy())


def gen_stdct():
    sys.path.insert(0, "/root/reference")
    import deepxi.dct as refdct  # read-only reference; behaviour capture only
    rng = np.random.RandomState(1)
    x = rng.randn(4000).astype(np.float32)
    S = refdct.stdct(x, N_d, N_s, K, window_fn=W, pad_end=True)
    y = refdct.inverse_stdct(S, N_d, N_s, K,
                             tf.signal.inverse_stft_window_fn(N_s, W))
    np.savez(os.path.join(OUT, "stdct.npz"), x=x, S=S.numpy(), y=y.numpy())


def gen_mel():
    sys.path.insert(0, "/root/reference")
    try:
        import deepxi.sig as refsig
        it = refsig.InputTarget(N_d, N_s, K, f_s)
        H = it.mel_filter_bank(40)
    except Exception as e:  # reference import chain may be broken; skip
        print("mel golden skipped:", e)
        return
    np.savez(os.path.join(OUT, "mel.npz"), H=H)


def gen_map_stats():
    """Golden NormalCDF stats + map/inverse round trip from TF math."""
    rng = np.random.RandomState(2)
    xi_sample = np.abs(rng.randn(512, 257).astype(np.float32)) ** 2 * 10
    x_db = 10.0 * np.log10(np.maximum(xi_sample, 1e-12))
    mu = tf.math.reduce_mean(x_db, axis=0)
    sigma = tf.math.reduce_std(x_db, axis=0)
    v3 = tf.math.erf((x_db - mu) / (sigma * np.sqrt(2.0)))
    xbar = 0.5 * (1.0 + v3)
    inv_db = mu + sigma * np.sqrt(2.0) * tf.math.erfinv(2.0 * xbar - 1.0)
    inv = tf.math.pow(10.0, inv_db / 10.0)
    np.savez(os.path.join(OUT, "normalcdf.npz"),
             xi_sample=xi_sample, mu=mu.numpy(), sigma=sigma.numpy(),
             xbar=xbar.numpy(), inv=inv.numpy())


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    gen_stft()
    gen_stdct()
    gen_mel()
    gen_map_stats()
    print("golden fixtures written to", OUT)
