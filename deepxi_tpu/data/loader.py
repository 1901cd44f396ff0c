"""Host-side training batch loader: wav reads + bucketed padding + prefetch.

Replaces the reference's single-threaded ``tf.data.from_generator`` pipeline
(ref: deepxi/model.py:1953-2012, 2256-2290) with:

  * deterministic shuffling/noise-draws from a seeded ``np.random.Generator``
    (the reference's `random`/`np.random` calls are unseeded -- a catalogued
    nondeterminism source, SURVEY.md section 5);
  * sequence-length *bucketing*: waveforms pad to the next bucket boundary
    instead of pad-to-longest, so XLA sees a bounded set of static shapes;
  * a double-buffered background thread so wav decoding overlaps device
    compute (the SNR mixing and STFT themselves run on device inside the
    jitted train step).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from deepxi_tpu import native
from deepxi_tpu.data.wavio import read_wav


def bucket_length(n: int, N_s: int = 256, frames_per_bucket: int = 32,
                  min_frames: int = 32) -> int:
    """Pad length: frame count rounded up to a multiple of ``frames_per_bucket``
    (>= min_frames), converted back to samples. ceil(n/N_s) frames cover n
    samples under pad_end framing."""
    frames = -(-n // N_s)
    frames = max(min_frames, -(-frames // frames_per_bucket) * frames_per_bucket)
    return frames * N_s


class MiniBatchLoader:
    """Yields (s, d, s_len, d_len, snr) int16/int32 host batches for the
    fused on-device example pipeline (trainer.make_train_step).

    Semantics mirror the reference's wav_batch (ref: deepxi/model.py:2256-2290):
    clean list shuffled per epoch, noise files re-drawn until at least as
    long as the speech, random noise crop, SNR drawn from the training levels.
    The random noise *segment* draw happens on device (sig.add_noise).
    """

    def __init__(self, train_s_list: List[Dict], train_d_list: List[Dict],
                 mbatch_size: int, snr_levels: List[int], seed: int = 0,
                 N_s: int = 256, frames_per_bucket: int = 32,
                 prefetch: int = 4, with_labels: bool = False):
        self.with_labels = with_labels
        self.s_list = list(train_s_list)
        self.d_list = list(train_d_list)
        self.mbatch_size = mbatch_size
        self.snr_levels = list(snr_levels)
        self.rng = np.random.default_rng(seed)
        self.N_s = N_s
        self.frames_per_bucket = frames_per_bucket
        self.prefetch = prefetch
        self.n_examples = len(self.s_list)
        self.n_iter = -(-self.n_examples // mbatch_size)

    def _load_batch(self, s_items: List[Dict]) -> Tuple[np.ndarray, ...]:
        B = len(s_items)
        max_len = max(it["wav_len"] for it in s_items)
        L = bucket_length(max_len, self.N_s, self.frames_per_bucket)
        s = np.empty((B, L), np.int16)  # every row is fully written by
        d = np.empty((B, L), np.int16)  # _decode_rows (data + zero tail)
        s_len = np.zeros(B, np.int32)
        d_len = np.zeros(B, np.int32)
        # per-frame phoneme labels ride along when requested and the list
        # carries them (batch_list_labelled items; MagPhonemes training)
        labelled = self.with_labels and all("labels" in it for it in s_items)
        labels = np.zeros((B, L // self.N_s), np.int32) if labelled else None
        # Plan the whole batch from list metadata (wav lengths are cached by
        # data.listing) so decoding can happen in one native thread-pooled
        # call; the RNG draw order matches the former per-item loop exactly,
        # keeping epochs bit-reproducible across the native/Python paths.
        d_paths, d_offs = [], []
        for i, item in enumerate(s_items):
            n = min(item["wav_len"], L)
            s_len[i] = n
            # draw a noise file at least as long as the speech, uniformly
            # over the eligible subset (ref: deepxi/model.py:2280-2283 -- the
            # reference re-draws in a loop that never terminates when no
            # noise file is long enough; a catalogued-hazard fix)
            eligible = [it for it in self.d_list if it["wav_len"] >= n]
            if not eligible:
                longest = max(it["wav_len"] for it in self.d_list)
                raise ValueError(
                    f"no noise file is >= {n} samples (longest available: "
                    f"{longest}); speech {item['file_path']!r} cannot be mixed")
            d_item = eligible[self.rng.integers(len(eligible))]
            # random crop to the padded length so the device-side random
            # offset (sig.add_noise) stays within a static buffer
            dn = d_item["wav_len"]
            off = int(self.rng.integers(0, dn - L + 1)) if dn > L else 0
            d_paths.append(d_item["file_path"])
            d_offs.append(off)
            d_len[i] = min(dn, L)
            if labelled:
                lab = item["labels"][: labels.shape[1]]
                labels[i, :len(lab)] = lab
        self._decode_rows([it["file_path"] for it in s_items], [0] * B, L, s)
        self._decode_rows(d_paths, d_offs, L, d)
        snr = self.rng.choice(self.snr_levels, B).astype(np.float32)
        if labelled:
            return s, d, s_len, d_len, snr, labels
        return s, d, s_len, d_len, snr

    @staticmethod
    def _decode_rows(paths: List[str], offsets: List[int], L: int,
                     out: np.ndarray) -> None:
        """Fill out[i, :] with paths[i] decoded from offsets[i], zero-padded
        to L. Native (C++ thread pool) when available; per-row Python
        fallback for formats the native decoder rejects (e.g. non-16k)."""
        res = native.load_batch(paths, L, offsets=offsets, out=out)
        if res is None:
            fall = range(len(paths))
        else:
            fall = [i for i, st in enumerate(res[2]) if st != 0]
        for i in fall:
            wav, _ = read_wav(paths[i])
            seg = wav[offsets[i]:offsets[i] + L]
            out[i, :len(seg)] = seg
            out[i, len(seg):] = 0

    def epoch(self, epoch_idx: int) -> Iterator[Tuple[np.ndarray, ...]]:
        """One epoch of mini-batches, prefetched on a background thread.

        Shuffling is chunk-local length-sorted: items shuffle globally, then
        sort by length within chunks of 8 mini-batches whose order is itself
        shuffled -- batches bucket tightly (fewer XLA shapes, less pad) while
        the visiting order stays random across epochs."""
        order = self.rng.permutation(self.n_examples)
        items = [self.s_list[i] for i in order]
        chunk = self.mbatch_size * 8
        chunks = [sorted(items[i:i + chunk], key=lambda it: it["wav_len"])
                  for i in range(0, len(items), chunk)]
        self.rng.shuffle(chunks)
        items = [it for c in chunks for it in c]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def worker():
            try:
                for it0 in range(self.n_iter):
                    chunk = items[it0 * self.mbatch_size:(it0 + 1) * self.mbatch_size]
                    if not chunk:
                        break
                    q.put(self._load_batch(chunk))
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is SENTINEL:
                break
            yield b
        t.join()
