"""CPU end-to-end smoke for the inp_tgt families without hardware campaign
rows: micro corpus -> 1-epoch train -> enhance -> composite score, through
`DeepXiTPU` exactly as a user would (ref families: deepxi/inp_tgt.py:242-968).

Not a quality benchmark (1 epoch, 4 utterances, shrunken net) — the point is
that every family completes the full train/enhance/score lifecycle. Results
from a real run are recorded in results/family_smoke.md.

Usage: python tools/family_smoke.py [--work /tmp/famsmoke]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

FAMS = [
    ("MagGamma", dict(map_type="DBNormalCDF")),
    ("MagGain", dict()),
    ("MagMag", dict(map_type="DBNormalCDF")),
    ("MagSMM", dict(loss_fnc="MeanSquaredError", outp_act="ReLU")),
    # phase map defaults to UniformCDF on [-pi, pi] (see inp_tgt_selector)
    ("MagPhaXiPha", dict(map_type=[["DB", "NormalCDF"], ["UniformCDF"]])),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/famsmoke")
    args = ap.parse_args(argv)

    import synth_corpus
    os.makedirs(args.work, exist_ok=True)
    os.chdir(args.work)
    if not os.path.isdir("set/train_clean_speech"):
        synth_corpus.build("set", n_train=4, n_test=4, seconds=2.0)

    import numpy as np
    from deepxi_tpu.config import preset
    from deepxi_tpu.data import batch_list
    from deepxi_tpu.framework import DeepXiTPU

    for fam, kw in FAMS:
        t0 = time.time()
        extra = dict(kw)
        mt = extra.pop("map_type", None)
        cfg = preset("resnet-1.1c", max_epochs=1, test_epoch=1,
                     gain="mmse-lsa", train=True, val_flag=False,
                     save_every=1, val_every=10, inp_tgt_type=fam,
                     mbatch_size=4,
                     **({"map_type": mt} if mt is not None else {}), **extra)
        # shrink the net so one CPU core can train it
        cfg = cfg.replace(ver=f"smoke-{fam.lower()}", n_blocks=4, d_model=64,
                          d_f=32, max_d_rate=4)
        s_list = batch_list(os.path.join(cfg.set_path, "train_clean_speech"),
                            "clean_speech", cfg.data_path)
        d_list = batch_list(os.path.join(cfg.set_path, "train_noise"),
                            "noise", cfg.data_path)
        dx = DeepXiTPU(cfg, s_list, d_list)
        dx.train(verbose=False)
        res = dx.test(epochs=[1], gains=["mmse-lsa"])
        vals = res[(1, "mmse-lsa")]
        pesq = np.mean([v for (ns, sl, m), vv in vals.items() if m == "PESQ"
                        for v in vv])
        stoi = np.mean([v for (ns, sl, m), vv in vals.items() if m == "STOI"
                        for v in vv])
        print(f"[OK] {fam}: PESQ {pesq:.2f} STOI {stoi:.1f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    print("ALL FAMILIES OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
