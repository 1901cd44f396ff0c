"""Data-scaling crossover plot: the MHANet-minus-ResNet quality gap vs
training-corpus size (VERDICT round-3 next #1: "pin the crossover scale
with three corpus sizes on one plot").

The reference's published tables place MHANet above ResNet on PESQ on
both its (much larger) real corpora (ref: README.md:125,128). On this
environment's synthetic corpora the ordering flips at small scale and
converges as the corpus grows; plotting the GAP (mhanet - resnet, each
architecture at its best scored checkpoint for that corpus size) cancels
the per-corpus test-set difficulty confound (each size has its own test
set, so absolute PESQ is not comparable across sizes).

Sources (checked-in campaign tables):
  600 utts  results/quality_campaign_long/campaign_table.md
            resnet e300 PESQ 2.83 STOI 88.53 | mhanet e600 2.70 86.63
  2400 utts results/quality_campaign_big/campaign_table.md
            resnet e200 PESQ 2.93 STOI 89.06 | mhanet e400 2.92 89.57
  9600 utts results/quality_campaign_8x/campaign_table.md
            resnet e150 PESQ 3.07 STOI 93.14 | mhanet e200 3.11 92.57

Regenerate: python tools/plot_crossover.py  ->  results/crossover.png
"""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# (corpus utterances, mhanet - resnet gap) at each model's best scored
# checkpoint; None = not yet scored (point omitted).
SIZES = [600, 2400, 9600]
PESQ_GAP = [2.70 - 2.83, 2.92 - 2.93, 3.11 - 3.07]
STOI_GAP = [86.63 - 88.53, 89.57 - 89.06, 92.57 - 93.14]
EPOCH_NOTE = ["e600 vs e300", "e400 vs e200", "e200 vs e150"]

# dataviz reference palette (light mode): series-1 blue, text inks,
# chart surface; grid/zero-line in recessive grays.
SERIES = "#2a78d6"
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e3df"


def _panel(ax, gaps, title, unit):
    xs = [s for s, g in zip(SIZES, gaps) if g is not None]
    ys = [g for g in gaps if g is not None]
    notes = [n for n, g in zip(EPOCH_NOTE, gaps) if g is not None]
    ax.set_facecolor(SURFACE)
    ax.axhline(0.0, color=TEXT2, lw=1.0, ls=(0, (4, 3)), zorder=1)
    ax.plot(xs, ys, color=SERIES, lw=2.0, marker="o", ms=8,
            mfc=SERIES, mec=SURFACE, mew=2.0, zorder=3)
    for x, y, n in zip(xs, ys, notes):
        ax.annotate(f"{y:+.2f}", (x, y), textcoords="offset points",
                    xytext=(0, 10), ha="center", fontsize=10, color=TEXT)
        ax.annotate(n, (x, y), textcoords="offset points",
                    xytext=(0, -16), ha="center", fontsize=8, color=TEXT2)
    ax.set_xscale("log")
    ax.set_xticks(SIZES)
    ax.set_xticklabels([f"{s:,}" for s in SIZES], fontsize=10)
    ax.minorticks_off()
    ax.set_title(title, fontsize=11, color=TEXT, loc="left", pad=10)
    ax.set_ylabel(unit, fontsize=9, color=TEXT2)
    ax.tick_params(colors=TEXT2, labelsize=9)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(GRID)
    ax.grid(axis="y", color=GRID, lw=0.75, zorder=0)
    # headroom so the zero (crossover) line is always in frame
    lo = min(ys + [0.0])
    hi = max(ys + [0.0])
    pad = 0.18 * (hi - lo + 1e-9)
    ax.set_ylim(lo - pad - 0.02 * abs(hi - lo + 1e-9), hi + pad)


def main(out="results/crossover.png"):
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9.0, 3.6), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    _panel(ax1, PESQ_GAP, "PESQ gap: MHANet − ResNet (best checkpoint)",
           "PESQ (MOS)")
    _panel(ax2, STOI_GAP, "STOI gap: MHANet − ResNet (best checkpoint)",
           "STOI (pp)")
    for ax in (ax1, ax2):
        ax.set_xlabel("training corpus (utterances, log scale)",
                      fontsize=9, color=TEXT2)
    fig.suptitle("Data-scaling crossover toward the reference's "
                 "MHANet-over-ResNet ordering", fontsize=12, color=TEXT,
                 x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
