"""Native (C++) host-runtime layer: bit-parity with the pure-Python wav IO
and the batch loader's decode plan (deepxi_tpu/native).

The native decoder accelerates the same semantics defined by
deepxi_tpu/data/wavio.py (ref: deepxi/utils.py:18-50); these tests assert
the two are interchangeable: identical samples on every supported format,
clean fallback on unsupported ones, and loader epochs that are
bit-reproducible whether the native layer is present or not.
"""

import os
import wave

import numpy as np
import pytest

from deepxi_tpu import native
from deepxi_tpu.data.loader import MiniBatchLoader
from deepxi_tpu.data.wavio import read_wav, save_wav, wav_length


def _write_raw(path, frames, n_ch, sw, rate):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(sw)
        w.setframerate(rate)
        w.writeframes(frames)


def _python_read(path, f_s=16000):
    """The pure-Python decoder, bypassing the native fast path."""
    import wave as _w
    from scipy.signal import resample_poly
    with _w.open(str(path), "rb") as w:
        n_ch, sw, rate, n = (w.getnchannels(), w.getsampwidth(),
                             w.getframerate(), w.getnframes())
        raw = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    if rate != f_s:
        g = np.gcd(rate, f_s)
        x = resample_poly(x, f_s // g, rate // g).astype(np.float32)
    return (np.clip(x, -1.0, 1.0 - 1.0 / 32768.0) * 32768.0).astype(np.int16)


class TestNativeWavIO:
    def test_library_builds(self):
        # g++/make are part of the image; the native layer must build here
        assert native.available()

    def test_mono16_bit_exact_and_lengths(self, tmp_path):
        x = (np.random.RandomState(0).randn(33333) * 3000).astype(np.int16)
        p = tmp_path / "a.wav"
        save_wav(str(p), x, 16000)
        y = native.read_wav_i16(str(p))
        assert np.array_equal(x, y)
        assert native.wav_len(str(p)) == 33333 == wav_length(str(p))
        z, fs = read_wav(str(p))
        assert fs == 16000 and np.array_equal(z, x)

    @pytest.mark.parametrize("n_ch,sw", [(2, 2), (1, 1), (1, 4), (3, 2)])
    def test_formats_match_python(self, tmp_path, n_ch, sw):
        rng = np.random.RandomState(n_ch * 10 + sw)
        n = 4097
        if sw == 2:
            frames = (rng.randn(n, n_ch) * 8000).astype("<i2").tobytes()
        elif sw == 4:
            frames = (rng.randn(n, n_ch) * 5e8).astype("<i4").tobytes()
        else:
            frames = (rng.randint(0, 256, (n, n_ch))).astype(np.uint8).tobytes()
        p = tmp_path / "f.wav"
        _write_raw(p, frames, n_ch, sw, 16000)
        yp = _python_read(p)
        yn = native.read_wav_i16(str(p))
        assert yn is not None and len(yn) == len(yp)
        # float32 accumulation order matches; allow 1 LSB for rounding
        assert np.max(np.abs(yp.astype(np.int32) - yn.astype(np.int32))) <= 1

    def test_rate_mismatch_falls_back(self, tmp_path):
        x = (np.random.RandomState(1).randn(8000) * 3000).astype(np.int16)
        p = tmp_path / "lo.wav"
        save_wav(str(p), x, 8000)
        assert native.read_wav_i16(str(p)) is None  # Python resamples
        assert native.wav_len(str(p)) == 16000 == wav_length(str(p))
        y, _ = read_wav(str(p))  # full path still works via fallback
        assert len(y) == 16000

    def test_offset_read(self, tmp_path):
        x = (np.random.RandomState(2).randn(10000) * 3000).astype(np.int16)
        p = tmp_path / "o.wav"
        save_wav(str(p), x, 16000)
        y = native.read_wav_i16(str(p), offset=777)
        assert np.array_equal(x[777:], y)

    def test_malformed_file_rejected(self, tmp_path):
        p = tmp_path / "bad.wav"
        p.write_bytes(b"RIFFxxxxWAVEjunkjunk")
        assert native.read_wav_i16(str(p)) is None
        assert native.wav_len(str(p)) is None

    def test_native_save_python_read_roundtrip(self, tmp_path):
        x = (np.random.RandomState(3).randn(5000) * 3000).astype(np.int16)
        p = tmp_path / "w.wav"
        assert native.save_wav_i16(str(p), x, 16000)
        y = _python_read(p)
        assert np.array_equal(x, y)

    def test_load_batch_padding_and_fallback_rows(self, tmp_path):
        rng = np.random.RandomState(4)
        a = (rng.randn(3000) * 3000).astype(np.int16)
        b = (rng.randn(5000) * 3000).astype(np.int16)
        pa, pb, pc = tmp_path / "a.wav", tmp_path / "b.wav", tmp_path / "c.wav"
        save_wav(str(pa), a, 16000)
        save_wav(str(pb), b, 16000)
        save_wav(str(pc), a, 8000)  # native rejects; row stays zeroed
        out, lens, status = native.load_batch(
            [str(pa), str(pb), str(pc)], L=4096, offsets=[0, 1000, 0])
        assert list(status) == [0, 0, native.FALLBACK]
        assert lens[0] == 3000 and np.array_equal(out[0, :3000], a)
        assert not out[0, 3000:].any()
        assert lens[1] == 4000 and np.array_equal(out[1, :4000], b[1000:5000])
        assert not out[2].any()


class TestLoaderNativeParity:
    def _corpus(self, tmp_path):
        rng = np.random.RandomState(7)
        s_items, d_items = [], []
        for i, n in enumerate([3000, 9000, 14000, 6000]):
            p = tmp_path / f"s{i}.wav"
            save_wav(str(p), (rng.randn(n) * 3000).astype(np.int16), 16000)
            s_items.append({"file_path": str(p), "wav_len": n})
        for i, n in enumerate([20000, 30000]):
            p = tmp_path / f"d{i}.wav"
            save_wav(str(p), (rng.randn(n) * 2000).astype(np.int16), 16000)
            d_items.append({"file_path": str(p), "wav_len": n})
        return s_items, d_items

    def test_epochs_bit_identical_with_and_without_native(
            self, tmp_path, monkeypatch):
        s_items, d_items = self._corpus(tmp_path)

        def run():
            loader = MiniBatchLoader(s_items, d_items, 2, [0, 5, 10], seed=3)
            return [tuple(np.asarray(a).copy() for a in b)
                    for b in loader.epoch(0)]

        assert native.available()
        with_native = run()
        monkeypatch.setattr(native, "load_batch",
                            lambda *a, **k: None)  # force pure-Python path
        without = run()
        assert len(with_native) == len(without) == 2
        for bn, bp in zip(with_native, without):
            for an, ap in zip(bn, bp):
                assert np.array_equal(an, ap)
