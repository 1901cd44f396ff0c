"""Native (C++) host runtime for deepxi_tpu: ctypes bindings + on-demand build.

The reference's host runtime is native where it is hot: audio IO goes
through soundfile/librosa (libsndfile, C -- ref: deepxi/utils.py:18-50) and
the training input pipeline through tf.data's C++ runtime
(ref: deepxi/model.py:1953-2012). This package is the rebuild's equivalent:
`src/wavio.cc` decodes RIFF PCM straight into preallocated int16 batch
buffers with a GIL-free thread pool.

Design rules:
  * The native layer is an ACCELERATOR, never a requirement: every entry
    point either succeeds or reports "fall back", and the pure-Python path
    in `deepxi_tpu.data.wavio` remains the semantic definition. Files the
    native decoder does not handle (non-16k rates needing polyphase
    resample, float wavs) are decoded by Python transparently.
  * Built on demand with the system toolchain (`make` + `g++`, both baked
    into the image); if the build fails, `available()` is False and nothing
    else changes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libdeepxi_native.so")

ERR = -1        # unreadable/malformed
FALLBACK = -2   # valid but needs the Python decoder

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _sources_newer_than_lib() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    src_dir = os.path.join(_DIR, "src")
    for f in os.listdir(src_dir):
        if os.path.getmtime(os.path.join(src_dir, f)) > lib_mtime:
            return True
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if os.environ.get("DEEPXI_TPU_NO_NATIVE"):
            _build_failed = True
            return None
        try:
            if _sources_newer_than_lib():
                subprocess.run(["make", "-s", "-C", _DIR],
                               check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            _build_failed = True
            return None
        lib.dxt_read_wav_i16.restype = ctypes.c_long
        lib.dxt_read_wav_i16.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long)]
        lib.dxt_wav_len.restype = ctypes.c_long
        lib.dxt_wav_len.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.dxt_save_wav_i16.restype = ctypes.c_int
        lib.dxt_save_wav_i16.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_long]
        lib.dxt_load_batch.restype = None
        lib.dxt_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_long), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the compiled library is loadable (building it if needed)."""
    return _load() is not None


def read_wav_i16(path: str, f_s: int = 16000,
                 offset: int = 0) -> Optional[np.ndarray]:
    """Decode ``path`` as int16 mono at ``f_s`` natively, or None to signal
    the caller to use the Python decoder (unsupported format / no lib)."""
    lib = _load()
    if lib is None:
        return None
    n_total = lib.dxt_wav_len(path.encode(), f_s)
    if n_total < 0:
        return None
    out = np.empty(max(int(n_total) - max(offset, 0), 0), np.int16)
    total = ctypes.c_long(0)
    r = lib.dxt_read_wav_i16(
        path.encode(), f_s, offset,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.size, ctypes.byref(total))
    if r < 0:
        return None
    return out[: int(r)]


def wav_len(path: str, f_s: int = 16000) -> Optional[int]:
    """Sample count at the target rate, or None when the lib is unavailable
    or the file malformed (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    n = lib.dxt_wav_len(path.encode(), f_s)
    return None if n < 0 else int(n)


def save_wav_i16(path: str, wav: np.ndarray, f_s: int) -> bool:
    """Write mono 16-bit PCM natively; False -> caller uses the Python path."""
    lib = _load()
    if lib is None:
        return False
    wav = np.ascontiguousarray(wav, np.int16)
    ok = lib.dxt_save_wav_i16(
        path.encode(), f_s,
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), wav.size)
    return ok == 0


def load_batch(paths: Sequence[str], L: int, f_s: int = 16000,
               offsets: Optional[Sequence[int]] = None,
               out: Optional[np.ndarray] = None, n_threads: int = 0,
               ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Thread-pooled decode of ``paths`` into a zero-padded int16 [B, L]
    buffer, starting each file at ``offsets[i]`` samples.

    Returns (out, lens, status) where status[i] is 0 (ok), ERR, or FALLBACK
    (row zeroed; the caller decodes that file in Python). None when the
    native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    B = len(paths)
    if out is None:
        out = np.empty((B, L), np.int16)  # the native layer fills every row
    assert out.shape == (B, L) and out.dtype == np.int16 and out.flags.c_contiguous
    lens = np.zeros(B, np.int32)
    status = np.zeros(B, np.int32)
    c_paths = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    offs = np.asarray(offsets if offsets is not None else np.zeros(B), np.int64)
    lib.dxt_load_batch(
        c_paths, B, f_s,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), L,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    return out, lens, status
