"""Streaming-MHANet latency/capacity curve plot (round-5 measurement).

Single-series line: concurrent real-time channels per chip (y) against
added output latency (x, log2 — the hop_batch doubles each point).
Data is the hardware sweep `tools/stream_mha_curve.py` recorded in
`results/hw_evidence_r5/stream_mha_curve.log` and `bench.py` re-records
every driver run as `streaming_mha_capacity_curve`.

Regenerate: python tools/plot_capacity_curve.py
         -> results/stream_mha_capacity.png
"""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# [added output latency ms, real-time channels/chip, ms per dispatch]
CURVE = [
    (16, 192, 14.25),   # strict per-hop steps
    (32, 512, 22.42),   # hop_batch 2
    (64, 1024, 48.69),  # hop_batch 4 — reaches the HBM cache plateau
    (128, 1024, 55.50),  # hop_batch 8
]

# same reference palette as tools/plot_crossover.py (light mode):
# series-1 blue on the chart surface, text inks, recessive grid
SERIES = "#2a78d6"
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e3df"


def main(out="results/stream_mha_capacity.png"):
    xs = [p[0] for p in CURVE]
    ys = [p[1] for p in CURVE]
    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    ax.plot(xs, ys, color=SERIES, lw=2.0, marker="o", ms=8,
            mfc=SERIES, mec=SURFACE, mew=2.0, zorder=3)
    for x, y, ms in CURVE:
        ax.annotate(f"{y:,}", (x, y), textcoords="offset points",
                    xytext=(0, 10), ha="center", fontsize=10, color=TEXT)
        ax.annotate(f"{ms:.0f} ms/dispatch", (x, y),
                    textcoords="offset points", xytext=(0, -16),
                    ha="center", fontsize=8, color=TEXT2)
    ax.axhline(1024, color=TEXT2, lw=1.0, ls=(0, (4, 3)), zorder=1)
    ax.annotate("HBM plateau: 1,024 × ~5.2 MB KV caches", (16, 1024),
                textcoords="offset points", xytext=(0, 6), ha="left",
                fontsize=8, color=TEXT2)
    ax.set_xscale("log", base=2)
    ax.set_xticks(xs)
    ax.set_xticklabels([f"+{x} ms" for x in xs], fontsize=10)
    ax.minorticks_off()
    ax.set_title("Streaming MHANet: real-time channels per chip vs "
                 "added output latency", fontsize=11, color=TEXT,
                 loc="left", pad=10)
    ax.set_xlabel("added output latency (hop_batch × 16 ms hop, log scale)",
                  fontsize=9, color=TEXT2)
    ax.set_ylabel("real-time channels / chip", fontsize=9, color=TEXT2)
    ax.tick_params(colors=TEXT2, labelsize=9)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(GRID)
    ax.grid(axis="y", color=GRID, lw=0.75, zorder=0)
    ax.set_ylim(0, 1260)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
