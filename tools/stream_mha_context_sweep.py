"""Streaming-MHANet capacity vs attention-context length.

The +64 ms capacity plateau (1,024 channels) is an HBM ceiling set by
the ~5.2 MB/channel KV caches at the default max_len=2048 frames
(~33 s of attention context, the offline flagship's window). Serving
deployments that accept a shorter context window shrink the cache
linearly and should buy back capacity — this sweep measures how much,
at hop_batch=4 (the latency knee where the plateau starts).

Context semantics: the streaming model attends to the last
``max_len`` frames (max_len x 16 ms window); the reference's offline
MHANet attends to the full utterance (ref: deepxi/network/attention.py
att_mask), so a shorter window is a documented serving trade, parity
only when utterances fit the window.

Usage (real chip, one TPU process at a time):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/stream_mha_context_sweep.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    out = {"hop_batch": 4, "points": []}
    for max_len, cands in ((2048, (1024,)),          # the measured plateau
                           (1024, (2048, 1536, 1024)),
                           (512, (4096, 3072, 2048))):
        b, ms, skipped = bench.bench_streaming_mha_capacity_chunked(
            hop_batch=4, candidates=cands, max_len=max_len)
        out["points"].append({"max_len_frames": max_len,
                              "context_s": round(max_len * 0.016, 1),
                              "channels": b,
                              "ms_per_dispatch": round(ms, 2),
                              **({"skipped": skipped} if skipped else {})})
        print(out["points"][-1], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
