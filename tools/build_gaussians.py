"""Build the per-phoneme log-STMS Gaussian statistics that the hybrid
MixMax / VTS inference modes consume.

Rebuilds the fork's private artifact pipeline (the .npy mean/std/probility
files its loaders read from hard-coded paths,
ref: hybrid/hybridMixMax.py:394-541 simple/phoneme_extract_gaussians) as an
actual computation: frame-level phoneme labels from a forced alignment
assign each STFT frame's log-magnitude spectrum to a phoneme class; per
class we accumulate mean/std/occupancy. A noise Gaussian comes from a
noise corpus. One npz serves both consumers:

    python tools/build_gaussians.py --clean set/train_clean_speech \
        --ali out.ali --lexicon lexicon.txt --noise set/train_noise \
        --out data/gaussians.npz

Output keys: means/stds/probs [P, F] / [P] (MixMax,
framework._load_mixmax_model) and x_mu/x_sigma/prio_p/g_mu/g_sigma
(VTS, framework._load_vts_model).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log_stms(wav_i16: np.ndarray, N_d=512, N_s=256, K=512) -> np.ndarray:
    """[T, K//2+1] log short-time magnitude spectrum of an int16 waveform."""
    import jax.numpy as jnp

    from deepxi_tpu import sig
    x = jnp.asarray(wav_i16.astype(np.float32) / 32768.0)
    mag, _ = sig.polar_analysis(x, N_d, N_s, K)
    return np.log(np.maximum(np.asarray(mag), np.finfo(np.float32).eps))


def accumulate(clean_dir: str, ali_path: str, lexicon_path: str,
               n_phonemes: int, frame_ms: float = 16.0):
    from deepxi_tpu.data import batch_list_labelled, read_wav
    items = batch_list_labelled(clean_dir, ali_path, lexicon_path,
                                "gaussians", data_path="/tmp",
                                frame_ms=frame_ms, make_new=True)
    if not items:
        raise SystemExit("no labelled utterances found")
    F = None
    sums = cnts = sqs = None
    for it in items:
        wav, _ = read_wav(it["file_path"])
        lm = log_stms(wav)
        if F is None:
            F = lm.shape[1]
            sums = np.zeros((n_phonemes, F))
            sqs = np.zeros((n_phonemes, F))
            cnts = np.zeros(n_phonemes)
        lab = np.clip(it["labels"][: len(lm)], 0, n_phonemes - 1)
        lm = lm[: len(lab)]
        np.add.at(sums, lab, lm)
        np.add.at(sqs, lab, lm ** 2)
        np.add.at(cnts, lab, 1.0)
    seen = cnts > 1
    mu = np.where(seen[:, None], sums / np.maximum(cnts, 1.0)[:, None], 0.0)
    var = np.where(seen[:, None],
                   sqs / np.maximum(cnts, 1.0)[:, None] - mu ** 2, 1.0)
    std = np.sqrt(np.maximum(var, 1e-4))
    probs = cnts / max(cnts.sum(), 1.0)
    # unseen classes get the global Gaussian so the mixture stays proper
    glob_mu = sums.sum(0) / max(cnts.sum(), 1.0)
    glob_sq = sqs.sum(0) / max(cnts.sum(), 1.0)
    glob_std = np.sqrt(np.maximum(glob_sq - glob_mu ** 2, 1e-4))
    mu[~seen] = glob_mu
    std[~seen] = glob_std
    probs = np.maximum(probs, 1e-6)
    probs /= probs.sum()
    return mu.astype(np.float32), std.astype(np.float32), probs.astype(np.float32)


def noise_gaussian(noise_dir: str):
    from deepxi_tpu.data import batch_list, read_wav
    items = batch_list(noise_dir, "gaussians_noise", "/tmp", make_new=True)
    if not items:
        raise SystemExit("no noise files found")
    frames = []
    for it in items:
        wav, _ = read_wav(it["file_path"])
        frames.append(log_stms(wav))
    lm = np.concatenate(frames)
    return (lm.mean(0).astype(np.float32),
            np.maximum(lm.std(0), 1e-2).astype(np.float32))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clean", required=True, help="labelled clean-speech dir")
    ap.add_argument("--ali", required=True, help="forced-alignment file")
    ap.add_argument("--lexicon", required=True, help="phoneme lexicon")
    ap.add_argument("--noise", required=True, help="noise corpus dir")
    ap.add_argument("--out", required=True, help="output npz path")
    ap.add_argument("--n_phonemes", type=int, default=98)
    ap.add_argument("--frame_ms", type=float, default=16.0)
    args = ap.parse_args(argv)

    mu, std, probs = accumulate(args.clean, args.ali, args.lexicon,
                                args.n_phonemes, args.frame_ms)
    g_mu, g_std = noise_gaussian(args.noise)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out,
             means=mu, stds=std, probs=probs,               # MixMax keys
             x_mu=mu, x_sigma=std, prio_p=probs,            # VTS keys
             g_mu=g_mu, g_sigma=g_std)
    print(f"wrote {args.out}: {mu.shape[0]} classes x {mu.shape[1]} bins")
    return 0


if __name__ == "__main__":
    sys.exit(main())
