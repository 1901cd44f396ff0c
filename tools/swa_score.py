"""Checkpoint-averaged (SWA) scoring for a finished campaign.

Averages the parameters of several saved epoch checkpoints of one
trained model (tail averaging / stochastic weight averaging, Izmailov
et al. 2018) and scores the averaged model through the same composite
driver as ``tools/quality_campaign.py``, merging a row into the shared
campaign table.

The reference has no equivalent (it always tests single checkpoints,
ref: deepxi/model.py:279-280); this is a beyond-parity evaluation tool
motivated by the flat val-loss plateau of the attention flagship on the
synthetic corpus -- tail checkpoints bounce around a minimum the average
of which generalises better than any single one.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/swa_score.py \
        --work /tmp/campaign5 --ver mhanet-1.1c --epochs 300,325,350,375,400 \
        --copy_results_to /root/repo/results/quality_campaign_big
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", default="/tmp/quality_campaign")
    ap.add_argument("--ver", default="mhanet-1.1c")
    ap.add_argument("--epochs", required=True,
                    help="comma list of saved (1-indexed) epochs to average,"
                         " e.g. 300,325,350,375,400")
    ap.add_argument("--gain", default="mmse-lsa")
    ap.add_argument("--warmup_steps", type=int, default=None,
                    help="must match the training run so the optimizer "
                         "template restores (only params are used)")
    ap.add_argument("--copy_results_to", default=None)
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (cpu/tpu). Scoring runs use "
                         "cpu so they overlap single-chip TPU jobs (the "
                         "axon sitecustomize overrides JAX_PLATFORMS env, "
                         "so this must go through jax.config.update)")
    args = ap.parse_args(argv)

    epochs = [int(e) for e in args.epochs.split(",")]
    os.chdir(args.work)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from deepxi_tpu.config import preset
    from deepxi_tpu.data import batch_list
    from deepxi_tpu.framework import DeepXiTPU

    extra = {}
    if args.warmup_steps is not None:
        extra["warmup_steps"] = args.warmup_steps
    cfg = preset(args.ver, max_epochs=max(epochs), test_epoch=max(epochs),
                 gain=args.gain, train=True, val_flag=True, **extra)
    s_list = batch_list(os.path.join(cfg.set_path, "train_clean_speech"),
                        "clean_speech", cfg.data_path)
    d_list = batch_list(os.path.join(cfg.set_path, "train_noise"),
                        "noise", cfg.data_path)
    dx = DeepXiTPU(cfg, s_list, d_list)

    print(f"== averaging {args.ver} epochs {epochs} ==", flush=True)
    acc = None
    for e in epochs:
        p = jax.device_get(dx.load_epoch(e))
        acc = p if acc is None else jax.tree_util.tree_map(
            lambda a, b: a + b, acc, p)
    k = float(len(epochs))
    avg = jax.tree_util.tree_map(lambda a: (a / k).astype(a.dtype), acc)

    # relabel so result CSVs / results.txt rows carry the swa tag (stats
    # cache was already resolved under the plain ver at init)
    tag = f"{args.ver}-swa{len(epochs)}"
    dx.cfg = dx.cfg.replace(ver=tag)

    print("== objective test (composite driver) ==", flush=True)
    results = dx.test(params=avg, epochs=[max(epochs)], gains=[args.gain])
    res = results[(max(epochs), args.gain)]
    enh = {}
    for (ns, sl, m), vals in res.items():
        enh.setdefault(m, []).extend(vals)
    enh = {kk: float(np.mean(v)) for kk, v in enh.items()}
    print({kk: round(v, 2) for kk, v in sorted(enh.items())}, flush=True)

    cols = ("CSIG", "CBAK", "COVL", "PESQ", "STOI", "SegSNR", "SNR",
            "eSTOI", "MOS-LQO")
    row = (f"| {tag} e{max(epochs)} {args.gain} | "
           + " | ".join(f"{enh.get(c, float('nan')):.2f}" for c in cols)
           + " |")
    print(row, flush=True)

    if args.copy_results_to:
        import shutil
        dst = args.copy_results_to
        os.makedirs(dst, exist_ok=True)
        dst_table = os.path.join(dst, "campaign_table.md")
        if os.path.exists(dst_table):
            existing = open(dst_table).read().rstrip("\n").split("\n")
            if row not in existing:
                existing.append(row)
            with open(dst_table, "w") as f:
                f.write("\n".join(existing) + "\n")
        res_dir = os.path.join(cfg.log_path, "results")
        for fn in os.listdir(res_dir):
            if tag in fn or fn in ("average.csv", "results.txt"):
                shutil.copy(os.path.join(res_dir, fn), dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
