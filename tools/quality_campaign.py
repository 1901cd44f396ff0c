"""Quality-parity campaign: train the flagship preset on the synthetic
corpus and score every BASELINE.md column with the in-framework DEMAND-VB
composite driver (VERDICT round-1 item 8).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/quality_campaign.py \
        --work /tmp/campaign --epochs 150

Produces under --work: the corpus, checkpoints, log/results CSVs +
results.txt, and writes a markdown table (noisy vs enhanced, all columns)
to <work>/campaign_table.md plus a copy of the result CSVs for check-in.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)


def score_noisy_baseline(cfg):
    """Composite scores of the unprocessed noisy test set (the 'Noisy
    speech' row of BASELINE.md's tables)."""
    from deepxi_tpu.data import test_batch
    from deepxi_tpu.metrics.scoring import score_many

    x_batch, x_lens, _, x_names = test_batch(cfg.test_x_path)
    s_batch, s_lens, _, s_names = test_batch(cfg.test_s_path)
    pairs = []
    for i, name in enumerate(x_names):
        ref_idx = next((j for j, b in enumerate(s_names) if b in name), None)
        if ref_idx is None:
            print(f"WARNING: no clean reference matches {name!r}; skipping",
                  flush=True)
            continue
        s = s_batch[ref_idx, :s_lens[ref_idx]].astype(np.float64) / 32768.0
        pairs.append((s, x_batch[i, : len(s)].astype(np.float64) / 32768.0))
    acc = {}
    for sc in score_many(pairs, cfg.f_s):
        for k, v in sc.items():
            acc.setdefault(k, []).append(v)
    return {k: float(np.mean(v)) for k, v in acc.items()}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", default="/tmp/quality_campaign")
    ap.add_argument("--ver", default="resnet-1.1c")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--n_train", type=int, default=300)
    ap.add_argument("--gain", default="mmse-lsa")
    ap.add_argument("--tcn_fused_train", action="store_true",
                    help="train through the custom-VJP fused Pallas TCN "
                         "(equivalence evidence for the kernel's gradients)")
    ap.add_argument("--warmup_steps", type=int, default=None,
                    help="override the preset's Transformer-schedule warmup "
                         "(the reference's 40k steps assumes its real-corpus "
                         "epoch size; the synthetic campaign runs ~38 "
                         "steps/epoch, so MHA runs need a shorter ramp)")
    ap.add_argument("--inp_tgt_type", default=None,
                    help="override the preset's inp_tgt family (e.g. "
                         "MagXiGamma, STDCTXiCD) for multi-target campaign "
                         "rows; artifacts get a '-<family>' ver suffix")
    ap.add_argument("--map_type", default=None,
                    help="map DSL (';'/',' nesting) when the family needs "
                         "one, e.g. 'DBNormalCDF;DBNormalCDF'")
    ap.add_argument("--map_params", default=None)
    ap.add_argument("--loss_fnc", default=None,
                    help="override the preset's loss (families whose target "
                         "is not in [0,1], e.g. MagSMM's [0,5] mask, train "
                         "with MeanSquaredError instead of BCE)")
    ap.add_argument("--outp_act", default=None,
                    help="override the preset's output activation (e.g. "
                         "ReLU for MagSMM's non-negative unbounded mask)")
    ap.add_argument("--skip_corpus", action="store_true")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_score", action="store_true",
                    help="train only (intermediate segment of a long run "
                         "split across processes -- the axon runtime leaks "
                         "~2 MB host RSS per dispatched step, so long "
                         "trainings run as resumed segments)")
    ap.add_argument("--resume_epoch", type=int, default=0)
    ap.add_argument("--copy_results_to", default=None,
                    help="directory to copy result CSVs + table into")
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (cpu/tpu). Scoring runs use "
                         "cpu so they overlap the single-chip training queue "
                         "(one TPU process at a time on this runtime)")
    ap.add_argument("--test_epochs", default=None,
                    help="comma list of checkpoint epochs to score (defaults "
                         "to --epochs); each writes its own results row")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    os.makedirs(args.work, exist_ok=True)
    os.chdir(args.work)

    if not args.skip_corpus:
        import synth_corpus
        print("== building synthetic corpus ==", flush=True)
        synth_corpus.build("set", n_train=args.n_train)

    from deepxi_tpu.config import preset
    from deepxi_tpu.data import batch_list
    from deepxi_tpu.framework import DeepXiTPU

    extra = {}
    if args.warmup_steps is not None:
        extra["warmup_steps"] = args.warmup_steps
    if args.loss_fnc is not None:
        extra["loss_fnc"] = args.loss_fnc
    if args.outp_act is not None:
        extra["outp_act"] = args.outp_act
    if args.inp_tgt_type is not None:
        from deepxi_tpu.config import str_to_list
        extra["inp_tgt_type"] = args.inp_tgt_type
        if args.map_type:
            extra["map_type"] = str_to_list(args.map_type)
        if args.map_params:
            extra["map_params"] = str_to_list(args.map_params)
    cfg = preset(args.ver, max_epochs=args.epochs, test_epoch=args.epochs,
                 gain=args.gain, train=True, val_flag=True,
                 save_every=25, val_every=5,
                 resume_epoch=args.resume_epoch, **extra)
    if args.inp_tgt_type is not None:
        cfg = cfg.replace(ver=args.ver + "-" + args.inp_tgt_type.lower())
    if args.tcn_fused_train:
        # separate log/model/results names for the equivalence run
        cfg = cfg.replace(tcn_fused_train=True, ver=args.ver + "-ft")
    s_list = batch_list(os.path.join(cfg.set_path, "train_clean_speech"),
                        "clean_speech", cfg.data_path)
    d_list = batch_list(os.path.join(cfg.set_path, "train_noise"),
                        "noise", cfg.data_path)
    dx = DeepXiTPU(cfg, s_list, d_list)

    if not args.skip_train:
        print(f"== training {args.ver} for {args.epochs} epochs ==", flush=True)
        t0 = time.time()
        losses = dx.train(verbose=True)
        print(f"trained in {time.time() - t0:.0f}s; "
              f"loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)

    if args.skip_score:
        return 0

    print("== scoring noisy baseline ==", flush=True)
    noisy = score_noisy_baseline(cfg)
    print({k: round(v, 2) for k, v in sorted(noisy.items())}, flush=True)

    print("== objective test (composite driver) ==", flush=True)
    test_epochs = ([int(e) for e in args.test_epochs.split(",")]
                   if args.test_epochs else [args.epochs])
    results = dx.test(epochs=test_epochs, gains=[args.gain])
    cols = ("CSIG", "CBAK", "COVL", "PESQ", "STOI", "SegSNR", "SNR",
            "eSTOI", "MOS-LQO")
    lines = [
        "| Signal | " + " | ".join(cols) + " |",
        "|---|" + "---|" * len(cols),
        "| Noisy (unprocessed) | " + " | ".join(
            f"{noisy.get(c, float('nan')):.2f}" for c in cols) + " |",
    ]
    for ep in test_epochs:
        res = results[(ep, args.gain)]
        enh = {}
        for (ns, sl, m), vals in res.items():
            enh.setdefault(m, []).extend(vals)
        enh = {k: float(np.mean(v)) for k, v in enh.items()}
        print(f"e{ep}:", {k: round(v, 2) for k, v in sorted(enh.items())},
              flush=True)
        lines.append(
            f"| {cfg.ver} e{ep} {args.gain} | " + " | ".join(
                f"{enh.get(c, float('nan')):.2f}" for c in cols) + " |")
    table = "\n".join(lines) + "\n"
    with open("campaign_table.md", "w") as f:
        f.write(table)
    print(table, flush=True)

    if args.copy_results_to:
        import shutil
        dst = args.copy_results_to
        os.makedirs(dst, exist_ok=True)
        # merge into an existing table (several runs share one corpus /
        # results dir) instead of clobbering earlier model rows
        dst_table = os.path.join(dst, "campaign_table.md")
        if os.path.exists(dst_table):
            existing = open(dst_table).read().rstrip("\n").split("\n")
            for row in lines[3:]:  # model rows (skip header + noisy)
                if row not in existing:
                    existing.append(row)
            with open(dst_table, "w") as f:
                f.write("\n".join(existing) + "\n")
        else:
            shutil.copy("campaign_table.md", dst)
        res_dir = os.path.join(cfg.log_path, "results")
        for fn in os.listdir(res_dir):
            shutil.copy(os.path.join(res_dir, fn), dst)
        loss_csv = os.path.join(cfg.log_path, "loss", f"{cfg.ver}.csv")
        if os.path.exists(loss_csv):
            shutil.copy(loss_csv, dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
