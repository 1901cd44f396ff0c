"""Command-line entry point (ref: main.py + deepxi/args.py + run.sh).

Usage mirrors the reference's flags plus a preset shortcut that replaces the
run.sh/config.sh bash layers:

    python -m deepxi_tpu --ver resnet-1.1c --train 1
    python -m deepxi_tpu --ver resnet-1.1c --infer 1 --test_epoch 200 --gain mmse-lsa
    python -m deepxi_tpu --ver resnet-1.1c --test 1

Any preset hyper-parameter can be overridden on the command line. The
upstream `infer`/`test` dispatch is restored (the fork miswired --infer to a
mixture-writing helper, ref: main.py:82-94 -- a catalogued defect).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from typing import List, Optional

from deepxi_tpu.config import Config, VERSION_PRESETS, preset, str_to_bool, str_to_list


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="deepxi_tpu",
                                description="Deep Xi-TPU speech enhancement framework")
    # general (ref: deepxi/args.py:31-43)
    p.add_argument("--ver", type=str, default="resnet-1.1c", help="Model version/preset")
    p.add_argument("--test_epoch", type=str_to_list, default=None, help="Epoch(s) to test")
    p.add_argument("--train", type=str_to_bool, default=False)
    p.add_argument("--infer", type=str_to_bool, default=False)
    p.add_argument("--test", type=str_to_bool, default=False)
    p.add_argument("--spect_dist", type=str_to_bool, default=False)
    p.add_argument("--export", type=str_to_bool, default=False,
                   help="AOT serving export: serialize the fused enhancer "
                        "of --test_epoch to StableHLO artifacts")
    p.add_argument("--export_path", type=str, default=None)
    p.add_argument("--prelim", type=str_to_bool, default=False)
    # artifact serving: enhance wavs straight from a checked-in artifact
    # (tools/make_artifact.py output) -- no work dir, stats, or set layout
    p.add_argument("--enhance", type=str, default=None,
                   help="artifact dir; enhance --in_wavs into --out_dir")
    p.add_argument("--in_wavs", type=str, nargs="+", default=None,
                   help="wav files, dirs, or globs to enhance")
    p.add_argument("--out_dir", type=str, default="enhanced")
    p.add_argument("--sd_snr_levels", type=str_to_list, default=None)
    p.add_argument("--sd_target", type=str_to_list, default=None,
                   help="spectral-distortion target(s): xi and/or gamma")
    p.add_argument("--network_type", type=str, default=None)
    p.add_argument("--inp_tgt_type", type=str, default=None)
    # train (ref: deepxi/args.py:45-57)
    p.add_argument("--mbatch_size", type=int, default=None)
    p.add_argument("--sample_size", type=int, default=None)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--resume_epoch", type=int, default=None)
    p.add_argument("--save_model", type=str_to_bool, default=None)
    p.add_argument("--save_every", type=int, default=None)
    p.add_argument("--val_every", type=int, default=None)
    p.add_argument("--log_iter", type=str_to_bool, default=None)
    p.add_argument("--eval_example", type=str_to_bool, default=None)
    p.add_argument("--val_flag", type=str_to_bool, default=None)
    p.add_argument("--reset_inp_tgt", type=str_to_bool, default=None)
    p.add_argument("--reset_sample", type=str_to_bool, default=None)
    p.add_argument("--seed", type=int, default=None)
    # outputs (ref: deepxi/args.py:59-74)
    p.add_argument("--out_type", type=str, default=None)
    p.add_argument("--gain", type=str_to_list, default=None)
    # paths (ref: deepxi/args.py:76-85)
    for flag in ("model_path", "set_path", "log_path", "data_path",
                 "test_x_path", "test_s_path", "test_d_path", "out_path",
                 "saved_data_path", "ali_path", "lexicon_path",
                 "mixmax_stats", "vts_stats"):
        p.add_argument(f"--{flag}", type=str, default=None)
    # features (ref: deepxi/args.py:87-94)
    for flag in ("min_snr", "max_snr", "snr_inter", "f_s", "T_d", "T_s", "n_filters"):
        p.add_argument(f"--{flag}", type=int, default=None)
    # network (ref: deepxi/args.py:96-117)
    for flag in ("d_model", "n_blocks", "n_heads", "d_b", "d_f", "d_ff", "k",
                 "max_d_rate", "warmup_steps", "length", "m_1", "max_len",
                 "Noutp"):
        p.add_argument(f"--{flag}", type=int, default=None)
    p.add_argument("--causal", type=str_to_bool, default=None)
    p.add_argument("--unit_type", type=str, default=None)
    p.add_argument("--loss_fnc", type=str, default=None)
    p.add_argument("--outp_act", type=str, default=None)
    # map (ref: deepxi/args.py:119-121)
    p.add_argument("--map_type", type=str_to_list, default=None)
    p.add_argument("--map_params", type=str_to_list, default=None)
    # parallelism (TPU-native)
    p.add_argument("--n_data_shards", type=int, default=None)
    p.add_argument("--n_model_shards", type=int, default=None)
    p.add_argument("--metric_workers", type=int, default=None,
                   help="host metric processes in --test (0=auto, 1=serial)")
    p.add_argument("--platform", type=str, default=None,
                   help="Force a JAX platform (cpu/tpu); overrides any "
                        "site-level backend registration")
    p.add_argument("--attention_impl", type=str, default=None,
                   help="MHANet attention: 'full', 'block' (long audio), "
                        "or 'fused' (VMEM-resident Pallas scores)")
    p.add_argument("--block_q", type=int, default=None)
    p.add_argument("--mha_fused", type=str_to_bool, default=None,
                   help="Fused Pallas attention (VMEM-resident scores) for "
                        "MHANet inference")
    p.add_argument("--tcn_fused", type=str_to_bool, default=None,
                   help="Fused Pallas TCN kernel in the infer fast path")
    p.add_argument("--tcn_fused_train", type=str_to_bool, default=None,
                   help="Custom-VJP fused Pallas TCN in the train step")
    p.add_argument("--dft_precision", type=str, default=None,
                   choices=["highest", "high", "default"],
                   help="MXU precision of the fused-path DFT matmuls "
                        "('default' = bf16 multiplies, quality-neutral on "
                        "trained weights)")
    p.add_argument("--import_stats", type=str, default=None,
                   help="Adopt map statistics from a reference "
                        "<ver>_inp_tgt.p pickle (parity runs)")
    return p


def config_from_args(argv: Optional[List[str]] = None) -> Config:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    base = preset(args.ver) if args.ver in VERSION_PRESETS else Config(ver=args.ver)
    field_names = {f.name for f in dataclasses.fields(Config)}
    overrides = {k: v for k, v in vars(args).items()
                 if k in field_names and v is not None}
    # booleans parsed with default False must still override presets
    for k in ("train", "infer", "test", "spect_dist", "prelim", "export"):
        overrides[k] = getattr(args, k)
    return base.replace(**overrides)


def run_artifact_enhance(artifact: str, in_wavs: List[str], out_dir: str,
                         gain: str) -> int:
    """One-command serving from a checked-in artifact: wavs in, enhanced
    wavs out. No training-work directory, stats bootstrap, or set layout
    needed (the reference always requires its full data/model/log tree,
    ref: deepxi/model.py:44-100)."""
    import glob
    import os

    import numpy as np
    import jax
    import jax.numpy as jnp

    from deepxi_tpu.compat.artifact import load_artifact
    from deepxi_tpu.data.wavio import read_wav, save_wav
    from deepxi_tpu.enhance import make_enhancer

    paths: List[str] = []
    for pat in in_wavs or []:
        if os.path.isdir(pat):
            paths += [os.path.join(pat, f) for f in sorted(os.listdir(pat))
                      if f.endswith((".wav", ".flac"))]
        elif any(c in pat for c in "*?["):
            paths += sorted(glob.glob(pat))
        else:
            paths.append(pat)
    if not paths:
        print("--enhance needs --in_wavs (files, dirs, or globs)")
        return 1

    it, net, params, _, _ = load_artifact(artifact)
    enhance = jax.jit(make_enhancer(it, net, gain))
    # resample every input to the artifact's analysis rate (round-3 ADVICE:
    # the default-16k read enhanced odd-rate wavs with the wrong STFT
    # parameters whenever the artifact's f_s differed)
    wavs, rates = zip(*(read_wav(p, it.f_s) for p in paths))
    lens = [len(w) for w in wavs]
    L = -(-max(lens) // it.N_s) * it.N_s
    x = np.zeros((len(wavs), L), np.int16)
    for i, w in enumerate(wavs):
        x[i, : len(w)] = w
    y = np.asarray(enhance(params, jnp.asarray(x)))
    os.makedirs(out_dir, exist_ok=True)
    for i, p in enumerate(paths):
        out = os.path.join(out_dir, os.path.basename(p))
        save_wav(out, y[i, : lens[i]], rates[i])
    print(f"wrote {len(paths)} enhanced wavs to {out_dir}")
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if args.enhance:
        if args.platform:
            import jax
            jax.config.update("jax_platforms", args.platform)
        gain = args.gain[0] if isinstance(args.gain, list) and args.gain \
            else (args.gain or "mmse-lsa")
        return run_artifact_enhance(args.enhance, args.in_wavs, args.out_dir,
                                    gain)
    cfg = config_from_args(argv)
    print(f"Version: {cfg.ver} ({cfg.network_type}, {cfg.inp_tgt_type})")

    if cfg.prelim:
        # synthetic sanity harness (ref: deepxi/prelim.py), no data needed
        from deepxi_tpu.prelim import run_prelim
        run_prelim(cfg.network_type)
        if not (cfg.train or cfg.infer or cfg.test or cfg.spect_dist):
            return 0

    from deepxi_tpu.data import batch_list, val_wav_batch
    from deepxi_tpu.framework import DeepXiTPU

    train_s_list = train_d_list = None
    if cfg.train:
        import os
        clean_dir = os.path.join(cfg.set_path, "train_clean_speech")
        if cfg.inp_tgt_type in ("MagPhonemes", "MagPhonme"):
            # labelled list from forced alignments (ref: deepxi/utils.py:205-267)
            if not (cfg.ali_path and cfg.lexicon_path):
                print("MagPhonemes training needs --ali_path and --lexicon_path")
                return 1
            from deepxi_tpu.data import batch_list_labelled
            train_s_list = batch_list_labelled(
                clean_dir, cfg.ali_path, cfg.lexicon_path, "clean_speech",
                cfg.data_path, frame_ms=cfg.T_s)
        else:
            train_s_list = batch_list(clean_dir, "clean_speech", cfg.data_path)
        train_d_list = batch_list(os.path.join(cfg.set_path, "train_noise"),
                                  "noise", cfg.data_path)

    deepxi = DeepXiTPU(cfg, train_s_list, train_d_list)
    if cfg.import_stats:
        print(f"adopted reference statistics from {cfg.import_stats}")

    if cfg.train:
        deepxi.train()
    if cfg.infer:
        written = deepxi.infer()
        print(f"wrote {len(written)} outputs")
    if cfg.test:
        deepxi.test()
    if cfg.spect_dist:
        targets = cfg.sd_target if isinstance(cfg.sd_target, list) \
            else [cfg.sd_target]
        for tgt in targets:
            deepxi.spectral_distortion(target=tgt)
    if cfg.export:
        written = deepxi.export_serving(out_dir=cfg.export_path)
        print(f"exported {len(written)} serving artifacts")
    if not (cfg.train or cfg.infer or cfg.test or cfg.spect_dist
            or cfg.prelim or cfg.export):
        print("nothing to do: pass --train 1, --infer 1, --test 1, "
              "--spect_dist 1, --export 1 and/or --prelim 1")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
