"""Wav I/O without external audio libraries (ref: deepxi/utils.py:18-50).

The reference reads audio through librosa (resampled to 16 kHz mono int16)
and writes float waveforms scaled by 32768 as int16. This environment has no
librosa/soundfile, so we read PCM wav via the stdlib and resample with a
polyphase filter when the file rate differs from the target.

The hot path is served by the native C++ layer (`deepxi_tpu.native`, the
rebuild's equivalent of the reference's libsndfile/tf.data native IO): each
function tries the compiled decoder first and falls back to the pure-Python
implementation below, which remains the semantic definition (the two are
bit-identical on every supported format; tests/test_native.py).
"""

from __future__ import annotations

import os
import wave
from typing import Tuple

import numpy as np
from scipy.signal import resample_poly

from deepxi_tpu import native


def read_wav(path: str, f_s: int = 16000) -> Tuple[np.ndarray, int]:
    """Read a wav file as int16 mono at ``f_s`` Hz.

    Mirrors the reference's convention (ref: deepxi/utils.py:31-50): output is
    int16, resampled/downmixed if needed.
    """
    y = native.read_wav_i16(path, f_s)
    if y is not None:
        return y, f_s
    with wave.open(path, "rb") as w:
        n_ch, sw, rate, n = w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        raw = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported sample width {sw} in {path}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    if rate != f_s:
        g = np.gcd(rate, f_s)
        x = resample_poly(x, f_s // g, rate // g).astype(np.float32)
    return (np.clip(x, -1.0, 1.0 - 1.0 / 32768.0) * 32768.0).astype(np.int16), f_s


def save_wav(path: str, wav: np.ndarray, f_s: int) -> None:
    """Write a waveform as 16-bit PCM (ref: deepxi/utils.py:18-29): float
    inputs are scaled by 32768 and truncated to int16."""
    wav = np.squeeze(np.asarray(wav))
    if wav.dtype in (np.float32, np.float64):
        wav = np.asarray(wav * 32768.0, dtype=np.int16)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if native.save_wav_i16(path, wav.astype("<i2"), f_s):
        return
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(f_s)
        w.writeframes(wav.astype("<i2").tobytes())


def wav_length(path: str, f_s: int = 16000) -> int:
    """Sample count of a wav file AT THE TARGET RATE without reading samples
    (ref: deepxi/utils.py:120-124 uses SoundFile.seek(0, SEEK_END)). read_wav
    resamples to f_s, so lengths must be reported at f_s or batch buffers and
    the noise-length constraint would use the wrong scale."""
    n_native = native.wav_len(path, f_s)
    if n_native is not None:
        return n_native
    with wave.open(path, "rb") as w:
        n, rate = w.getnframes(), w.getframerate()
    if rate == f_s:
        return n
    from scipy.signal import resample_poly  # match read_wav's output length
    g = np.gcd(rate, f_s)
    up, down = f_s // g, rate // g
    return int(np.ceil(n * up / down))
