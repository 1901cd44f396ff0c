"""Package a trained campaign checkpoint as a checked-in artifact.

Artifacts (`artifacts/<name>/`) carry a params-only npz in tree-flatten
order, the version's map statistics, one noisy/clean wav pair from the
campaign's test set, and a meta.json naming the preset -- enough for
`deepxi_tpu.compat.artifact.load_artifact` to rebuild the exact
inference stack with no training-work directory. The bench/driver loop
uses them to re-assert kernel/precision quality-neutrality on REAL
trained weights every round (random weights diverge under bf16).

Reference analogue: its shipped `model/<ver>/epoch-<n>` +
`data/<ver>_inp_tgt.p` pairs (ref: model/info.txt, data/info.txt).

    python tools/make_artifact.py --work /tmp/campaign5 --ver mhanet-1.1c \
        --epoch 400 --pair c012 --out artifacts/mhanet-1.1c-big2400-e400
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", required=True)
    ap.add_argument("--ver", required=True)
    ap.add_argument("--epoch", type=int, required=True)
    ap.add_argument("--pair", default="c012",
                    help="test-set basename; <pair>.wav (clean) and the "
                         "matching <pair>_<noise>_<snr>dB.wav are copied")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # orbax restore is host work
    import jax.numpy as jnp

    from deepxi_tpu.config import preset
    from deepxi_tpu.inp_tgt import inp_tgt_selector
    from deepxi_tpu.models import network_selector
    from deepxi_tpu.training.trainer import (TrainState, make_optimizer,
                                             restore_checkpoint)

    cfg = preset(args.ver)
    it = inp_tgt_selector(cfg.inp_tgt_type, cfg.N_d, cfg.N_s, cfg.K, cfg.f_s,
                          map_type=cfg.map_type, map_params=cfg.map_params)
    net = network_selector(cfg.network_type, it.n_outp,
                           **cfg.network_kwargs())
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, it.n_feat)))
    tx = make_optimizer(cfg.network_type, cfg.d_model or 256,
                        cfg.warmup_steps)
    state = TrainState.create(params, tx)
    model_dir = os.path.join(args.work, "model", args.ver)
    state = restore_checkpoint(model_dir, args.epoch - 1, state)

    os.makedirs(args.out, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(state.params)
    np.savez(os.path.join(args.out, "params.npz"),
             **{f"p{i}": np.asarray(a) for i, a in enumerate(leaves)})
    shutil.copy(os.path.join(args.work, "data", f"{args.ver}_stats.npz"),
                os.path.join(args.out, "stats.npz"))

    clean_dir = os.path.join(args.work, "set", "test_clean_speech")
    noisy_dir = os.path.join(args.work, "set", "test_noisy_speech")
    noisy_name = next(n for n in sorted(os.listdir(noisy_dir))
                      if n.startswith(args.pair + "_"))
    shutil.copy(os.path.join(clean_dir, args.pair + ".wav"), args.out)
    shutil.copy(os.path.join(noisy_dir, noisy_name), args.out)

    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump({"ver": args.ver, "epoch": args.epoch,
                   "clean": args.pair + ".wav", "noisy": noisy_name,
                   "n_leaves": len(leaves),
                   "created_from": os.path.abspath(args.work)}, f, indent=1)
    print(f"artifact written to {args.out} ({len(leaves)} leaves)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
