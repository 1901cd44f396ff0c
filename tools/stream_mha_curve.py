"""Streaming-MHANet latency/capacity curve (round-4 VERDICT next #5).

Round 4 left the frontier as two points: 192 channels at strict 16 ms
(per-hop KV-cache steps) and 1,024 at +128 ms (hop_batch=8 chunks,
HBM-bound). This sweep fills the curve at hop_batch in {2, 4}
(+32/+64 ms added output latency) so a deployment can pick its
latency/capacity trade: each hop_batch H amortises the per-block cache
read over H hops and turns the attention matvecs into [H, L] matmuls;
real time requires the chunk dispatch to clear H x 16 ms.

Method identical to bench.bench_streaming_mha_capacity_chunked
(bf16-resident caches ~5.2 MB/channel, state donated into the jitted
step, host read-back forced, n_rep median-free mean over 10 dispatches).

Usage (real chip, one TPU process at a time):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/stream_mha_curve.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    out = {"curve": []}
    # strict per-hop arm (hop_batch=1): known knee at 192 from r4; confirm
    b1, ms1, _ = bench.bench_streaming_mha_capacity(candidates=(256, 192))
    out["curve"].append({"hop_batch": 1, "added_latency_ms": 16,
                         "channels": b1, "ms_per_dispatch": round(ms1, 2)})
    print(out["curve"][-1], flush=True)
    for hb, cands in ((2, (512, 384, 256, 192)),
                      (4, (1024, 768, 512, 384)),
                      (8, (1024,))):
        b, ms, skipped = bench.bench_streaming_mha_capacity_chunked(
            hop_batch=hb, candidates=cands)
        out["curve"].append({"hop_batch": hb,
                             "added_latency_ms": 16 * hb,
                             "channels": b,
                             "ms_per_dispatch": round(ms, 2),
                             **({"skipped": skipped} if skipped else {})})
        print(out["curve"][-1], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
