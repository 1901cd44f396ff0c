"""Dataset file listing and validation pairing (ref: deepxi/utils.py:90-202).

Same on-disk contracts as the reference:
  * training lists are ``{file_path, wav_len}`` dicts gathered by glob over
    ``*.wav/*.flac/*.mp3`` (flac/mp3 require external decoders which this
    environment lacks; wavs are first-class), pickle-cached per hostname;
  * validation pairs are identically-named clean/noise files whose basename
    ends in ``_<snr>dB``, mixed at the filename SNR.
"""

from __future__ import annotations

import glob
import os
import pickle
import platform
from typing import Dict, List, Tuple

import numpy as np

from deepxi_tpu.data.wavio import read_wav, wav_length

EXTENSIONS = ("*.wav", "*.flac", "*.mp3")


def batch_list(file_dir: str, list_name: str, data_path: str = "data",
               make_new: bool = False) -> List[Dict]:
    """File-path + length list with a per-hostname pickle cache
    (ref: deepxi/utils.py:90-134)."""
    cache = os.path.join(data_path, f"{list_name}_list_{platform.node()}.p")
    if not make_new and os.path.exists(cache):
        with open(cache, "rb") as f:
            cached = pickle.load(f)
        if cached and cached[0]["file_path"].find(file_dir) != -1:
            return cached
    out: List[Dict] = []
    for ext in EXTENSIONS:
        for p in sorted(glob.glob(os.path.join(file_dir, ext))):
            try:
                n = wav_length(p)
            except Exception:
                wav, _ = read_wav(p)
                n = len(wav)
            out.append({"file_path": p, "wav_len": n})
    os.makedirs(data_path, exist_ok=True)
    with open(cache, "wb") as f:
        pickle.dump(out, f)
    return out


def val_wav_batch(val_s_dir: str, val_d_dir: str
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Paired clean/noise validation batch with `_XdB` SNR parsing and
    NaN/length guards (ref: deepxi/utils.py:136-202).

    Returns (val_s, val_d, val_s_len, val_d_len, val_snr): int16 padded
    matrices + lengths + SNRs.
    """
    s_list, d_list, s_lens, d_lens, snrs = [], [], [], [], []
    for ext in EXTENSIONS:
        s_paths = sorted(glob.glob(os.path.join(val_s_dir, ext)))
        d_paths = sorted(glob.glob(os.path.join(val_d_dir, ext)))
        for j, k in zip(s_paths, d_paths):
            sb = os.path.basename(os.path.splitext(j)[0])
            db_ = os.path.basename(os.path.splitext(k)[0])
            if sb != db_:
                raise ValueError(f"clean/noise validation files do not match: {sb} vs {db_}")
            if sb[-2:] != "dB":
                raise ValueError(f"validation basename must end in dB: {sb}")
            s_wav, _ = read_wav(j)
            d_wav, _ = read_wav(k)
            if len(s_wav) != len(d_wav):
                raise ValueError(f"validation clean/noise lengths differ for {sb}")
            for wav, p in ((s_wav, j), (d_wav, k)):
                if np.isnan(wav).any() or np.isinf(wav).any():
                    raise ValueError(f"NaN/Inf in validation waveform: {p}")
            s_list.append(s_wav)
            d_list.append(d_wav)
            s_lens.append(len(s_wav))
            d_lens.append(len(d_wav))
            snrs.append(float(sb.split("_")[-1][:-2]))
    if not s_list:
        raise ValueError("no validation files found")
    max_len = max(s_lens)
    val_s = np.zeros([len(s_list), max_len], np.int16)
    val_d = np.zeros([len(d_list), max_len], np.int16)
    for i, w in enumerate(s_list):
        val_s[i, :len(w)] = w
    for i, w in enumerate(d_list):
        val_d[i, :len(w)] = w
    return (val_s, val_d, np.asarray(s_lens, np.int32),
            np.asarray(d_lens, np.int32), np.asarray(snrs, np.int32))


def batch_list_labelled(file_dir: str, ali_path: str, lexicon_path: str,
                        list_name: str, data_path: str = "data",
                        frame_ms: float = 16.0,
                        make_new: bool = False) -> List[Dict]:
    """Training list with per-frame phoneme labels from a forced alignment
    (ref: deepxi/utils.py:205-267 batch_list_phoneme, minus its hard-coded
    lexicon path). Items carry `labels`: an int32 array at the STFT frame
    rate (frame_ms defaults to the 16 ms hop).
    """
    import numpy as _np

    from deepxi_tpu.dsp.labels import frame_labels, read_alignment
    from deepxi_tpu.dsp.phoneme import Phoneme

    cache = os.path.join(data_path,
                         f"{list_name}_labelled_list_{platform.node()}.p")
    if not make_new and os.path.exists(cache):
        with open(cache, "rb") as f:
            cached = pickle.load(f)
        if cached and cached[0]["file_path"].find(file_dir) != -1:
            return cached

    ph = Phoneme(lexicon_path)
    ali = read_alignment(ali_path)
    out: List[Dict] = []
    for item in batch_list(file_dir, list_name, data_path, make_new):
        key = os.path.splitext(os.path.basename(item["file_path"]))[0]
        if key not in ali:
            continue
        n_frames = -(-item["wav_len"] // int(16 * frame_ms))
        labels = frame_labels(ali[key], n_frames, ph.tkn_dict.entry2Index,
                              frame_ms=frame_ms, fill="|")
        out.append(dict(item, labels=_np.asarray(labels, _np.int32)))
    os.makedirs(data_path, exist_ok=True)
    with open(cache, "wb") as f:
        pickle.dump(out, f)
    return out


def test_batch(test_dir: str):
    """Test-set loader (ref: deepxi/se_batch.py:12-55): pad all wavs to the
    longest, return (batch int16 [N, L], lengths, snrs, basenames)."""
    paths: List[str] = []
    for ext in EXTENSIONS:
        paths.extend(sorted(glob.glob(os.path.join(test_dir, ext))))
    if not paths:
        raise ValueError(f"no test files in {test_dir}")
    wavs, lens, snrs, names = [], [], [], []
    for p in paths:
        w, _ = read_wav(p)
        if np.isnan(w).any() or np.isinf(w).any():
            raise ValueError(f"NaN/Inf in test waveform: {p}")
        wavs.append(w)
        lens.append(len(w))
        base = os.path.basename(os.path.splitext(p)[0])
        names.append(base)
        try:
            snrs.append(int(base.split("_")[-1][:-2]))
        except (ValueError, IndexError):
            snrs.append(0)
    batch = np.zeros([len(wavs), max(lens)], np.int16)
    for i, w in enumerate(wavs):
        batch[i, :len(w)] = w
    return batch, np.asarray(lens, np.int32), np.asarray(snrs, np.int32), names
