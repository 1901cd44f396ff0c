"""Training/statistics visualisation (ref: log/monitor_epoch.m:1-33,
eval_stats.m:1-33, eval_example.m:1-54 -- the reference's MATLAB monitors,
reading the same CSV/npz/mat artifacts this framework writes).

Usage:
  python tools/plot_monitor.py loss  log/loss/resnet-1.1c.csv [out.png]
  python tools/plot_monitor.py stats data/resnet-1.1c_stats.npz [out.png]
  python tools/plot_monitor.py example inp_batch.mat [out.png]
"""

from __future__ import annotations

import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_loss(csv_path: str, out: str) -> None:
    """Loss curves from log/loss/<ver>.csv (ref: log/monitor_epoch.m)."""
    rows = [l.strip().split(",") for l in open(csv_path) if l.strip()]
    header, data = rows[0], np.asarray([[float(v) for v in r] for r in rows[1:]])
    fig, ax = plt.subplots(figsize=(7, 4))
    for i, name in enumerate(header[1:], start=1):
        ax.plot(data[:, 0], data[:, i], label=name)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


def plot_stats(npz_path: str, out: str) -> None:
    """Per-bin map statistics (ref: eval_stats.m plots the Normal pdf of
    xi_dB per frequency bin)."""
    z = np.load(npz_path)
    fig, ax = plt.subplots(figsize=(7, 4))
    for k in z.files:
        ax.plot(z[k], label=k)
    ax.set_xlabel("frequency bin")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


def plot_example(mat_path: str, out: str) -> None:
    """One training mini-batch dump (ref: eval_example.m)."""
    from scipy.io import loadmat
    d = loadmat(mat_path)
    key = [k for k in d if not k.startswith("__")][0]
    batch = d[key]
    n = min(4, batch.shape[0])
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3.5))
    axes = np.atleast_1d(axes)
    for i in range(n):
        img = batch[i].T
        if img.ndim == 1:
            img = img[None]
        axes[i].imshow(np.log10(np.abs(img) + 1e-6), aspect="auto",
                       origin="lower")
        axes[i].set_title(f"{key}[{i}]")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    mode, path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else path.rsplit(".", 1)[0] + ".png"
    {"loss": plot_loss, "stats": plot_stats, "example": plot_example}[mode](path, out)
