"""Keyword-spotting dataset manifest builder.

ref: bak/kws_csv_scan.py:1-50, bak/kws_csv_scan_tbrr.py:1-50,
bak/kws_noisy.py:1-47 — the fork's one-off scripts that build/repair the
``path,bytes,transcript`` lexicon CSVs its KWS training consumed. Those
scripts hard-code private dataset paths and cannot run as shipped (both scan
variants reference an undefined ``current_dir`` — a NameError on line 37 —
and ``kws_noisy.py`` silently drops rows whose processed variant is missing
and can emit duplicate rows when several variants match). This rebuild keeps
the CSV format and the ``<spk>_<keyid>_<n>.wav`` filename convention but
takes every path as an argument and fixes the defects (first match wins,
unmatched rows pass through unchanged — both documented deviations).

Modes:
  scan   Walk a directory of keyword utterances and emit a manifest row per
         file: ``<rel_path>,<size_bytes>,<transcript>``; transcripts come
         from a key-id -> phone-string JSON table (the fork's built-in
         ten-keyword table, ``kws_csv_scan.py:15-26``, ships as the default).
  remap  Re-point an existing manifest at a directory of processed variants
         (noisy / enhanced wavs) by filename-stem containment, the
         ``kws_noisy.py`` operation.

Usage:
  python tools/kws_manifest.py scan --audio-dir DIR --out manifest.csv \
      [--key-table keys.json] [--rel-prefix kws_train] [--header "..."]
  python tools/kws_manifest.py remap --manifest in.csv --variant-dir DIR \
      --out out.csv [--rel-prefix kws_train_noisy]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List, Optional

# The fork's keyword table: key id -> space-separated initial/final phone
# string (ref: bak/kws_csv_scan.py:15-26; standard AISHELL-style Mandarin
# command set — data constants, carried as the default table).
DEFAULT_KEY_TABLE: Dict[str, str] = {
    "000": " ie2 k e1 j i4",
    "001": " ie2 t ong2 x ve2",
    "002": "d a3 k ai1 k ong1 t iao2",
    "003": "g uan1 b i4 k ong1 t iao2",
    "004": "sh eng1 g ao1 ii i1 d u4",
    "005": "j iang4 d i1 ii i1 d u4",
    "006": "z eng1 d a4 f eng1 s u4",
    "007": "j ian3 x iao3 f eng1 s u4",
    "008": "l ai2 d ian3 ii in1 vv ve4",
    "009": "t ing2 zh ix3 ii in1 vv ve4",
}


def key_id(filename: str) -> Optional[str]:
    """Keyword id from ``<spk>_<keyid>_<n>.wav`` (ref: kws_csv_scan.py:44)."""
    parts = os.path.basename(filename).split("_")
    return parts[1] if len(parts) >= 2 else None


def build_scan_manifest(
    audio_dir: str,
    key_table: Dict[str, str],
    rel_prefix: str = "",
) -> List[str]:
    """Manifest rows for every known-keyword file in ``audio_dir``.

    ref: kws_csv_scan.py:38-50. Deviations: files whose key id is absent
    from the table are skipped with a warning instead of raising KeyError,
    and the listing is sorted for determinism.
    """
    rows = []
    for fi in sorted(os.listdir(audio_dir)):
        kid = key_id(fi)
        if kid is None or kid not in key_table:
            print(f"kws_manifest: skipping {fi!r} (unknown key id {kid!r})",
                  file=sys.stderr)
            continue
        size = os.path.getsize(os.path.join(audio_dir, fi))
        rel = os.path.join(rel_prefix, fi) if rel_prefix else fi
        rows.append(f"{rel},{size},{key_table[kid].strip()}")
    return rows


def remap_manifest(
    rows: List[str],
    variant_dir: str,
    rel_prefix: str = "",
) -> List[str]:
    """Re-point manifest paths at processed variants by stem containment.

    ref: kws_noisy.py:26-47. Deviations (defect fixes): the first matching
    variant wins (the reference's loop keeps writing a row per match), and a
    row whose variant is missing passes through unchanged (the reference
    silently drops it).
    """
    variants = sorted(os.listdir(variant_dir))
    out = []
    for line in rows:
        cols = line.rstrip("\n").split(",")
        stem = os.path.splitext(os.path.basename(cols[0]))[0]
        match = next((v for v in variants if stem in v), None)
        if match is None:
            out.append(line.rstrip("\n"))
            continue
        rel = os.path.join(rel_prefix, match) if rel_prefix else match
        out.append(",".join([rel] + cols[1:]))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="mode", required=True)

    sc = sub.add_parser("scan", help="build a manifest from keyword wavs")
    sc.add_argument("--audio-dir", required=True)
    sc.add_argument("--out", required=True)
    sc.add_argument("--key-table", default=None,
                    help="JSON file mapping key id -> phone string "
                         "(default: the fork's ten-keyword table)")
    sc.add_argument("--rel-prefix", default="")
    sc.add_argument("--header", default=None,
                    help="optional CSV header line to emit first")

    rm = sub.add_parser("remap", help="re-point a manifest at variant wavs")
    rm.add_argument("--manifest", required=True)
    rm.add_argument("--variant-dir", required=True)
    rm.add_argument("--out", required=True)
    rm.add_argument("--rel-prefix", default="")
    rm.add_argument("--header", action="store_true",
                    help="treat the manifest's first line as a header")

    args = ap.parse_args(argv)
    if args.mode == "scan":
        table = DEFAULT_KEY_TABLE
        if args.key_table:
            with open(args.key_table) as f:
                table = json.load(f)
        rows = build_scan_manifest(args.audio_dir, table, args.rel_prefix)
        with open(args.out, "w") as f:
            if args.header:
                f.write(args.header.rstrip("\n") + "\n")
            f.write("\n".join(rows) + ("\n" if rows else ""))
        print(f"wrote {len(rows)} rows to {args.out}")
    else:
        with open(args.manifest) as f:
            lines = f.read().splitlines()
        head = []
        if args.header and lines:
            head, lines = [lines[0]], lines[1:]
        rows = remap_manifest(lines, args.variant_dir, args.rel_prefix)
        with open(args.out, "w") as f:
            f.write("\n".join(head + rows) + ("\n" if head + rows else ""))
        print(f"wrote {len(rows)} rows to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
