"""KWS manifest tool (ref: bak/kws_csv_scan.py, bak/kws_noisy.py)."""
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from kws_manifest import (  # noqa: E402
    DEFAULT_KEY_TABLE,
    build_scan_manifest,
    key_id,
    remap_manifest,
)


def _mk(path, nbytes=4):
    with open(path, "wb") as f:
        f.write(b"\0" * nbytes)


def test_key_id_convention():
    # ref: kws_csv_scan.py:44 — `fi.split('_')[1]`
    assert key_id("S001_003_12.wav") == "003"
    assert key_id("noextension") is None


def test_scan_builds_rows_and_skips_unknown(tmp_path, capsys):
    d = tmp_path / "kws"
    d.mkdir()
    _mk(d / "S01_000_1.wav", 10)
    _mk(d / "S01_003_2.wav", 20)
    _mk(d / "S01_999_3.wav", 30)  # unknown key id: skipped, not KeyError
    rows = build_scan_manifest(str(d), DEFAULT_KEY_TABLE, rel_prefix="train")
    assert rows == [
        "train/S01_000_1.wav,10,ie2 k e1 j i4",
        "train/S01_003_2.wav,20,g uan1 b i4 k ong1 t iao2",
    ]
    assert "999" in capsys.readouterr().err


def test_remap_first_match_wins_and_passthrough(tmp_path):
    v = tmp_path / "noisy"
    v.mkdir()
    _mk(v / "S01_000_1_babble_5dB.wav")
    _mk(v / "S01_000_1_cafe_0dB.wav")  # second match must NOT duplicate
    rows = [
        "train/S01_000_1.wav,10,ie2 k e1 j i4",
        "train/S01_003_2.wav,20,g uan1 b i4 k ong1 t iao2",  # no variant
    ]
    out = remap_manifest(rows, str(v), rel_prefix="kws_train_noisy")
    # defect fixes vs kws_noisy.py:26-47: one row per input row; unmatched
    # rows pass through instead of being dropped.
    assert out == [
        "kws_train_noisy/S01_000_1_babble_5dB.wav,10,ie2 k e1 j i4",
        "train/S01_003_2.wav,20,g uan1 b i4 k ong1 t iao2",
    ]


def test_cli_end_to_end(tmp_path):
    d = tmp_path / "kws"
    d.mkdir()
    _mk(d / "S01_001_1.wav", 7)
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "kws_manifest.py")
    out_csv = tmp_path / "m.csv"
    r = subprocess.run(
        [sys.executable, tool, "scan", "--audio-dir", str(d),
         "--out", str(out_csv), "--header", "path,bytes,transcript"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lines = out_csv.read_text().splitlines()
    assert lines[0] == "path,bytes,transcript"
    assert lines[1] == "S01_001_1.wav,7,ie2 t ong2 x ve2"
