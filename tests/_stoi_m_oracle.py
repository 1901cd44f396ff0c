"""Loop-level NumPy transcription of the reference's stoi.m -- a
TEST-ONLY differential oracle for deepxi_tpu/metrics/stoi.py.

Mechanically transcribed, statement by statement, from
ref: demand_voice_bank_objective_scoring/stoi.m:1-188 (Taal et al.'s
published MATLAB implementation). The production module vectorises the
framing/band/segment machinery; this oracle keeps MATLAB's per-frame and
per-segment loops (stdft loop, removeSilentFrames masks + overlap-add
loop, thirdoct band trimming, per-(j, m) taa_corr) so the two share no
code path. stoi.m covers STOI only -- the reference's eSTOI comes from
the pystoi package, so eSTOI stays pinned by the published-algorithm
implementation + behavioral tests.

Scope note: stoi.m resamples non-10 kHz input with MATLAB `resample`
(polyphase Kaiser). Reproducing MATLAB's filter bit-exactly is out of
scope; the oracle takes signals already at 10 kHz (the test also runs a
16 kHz case through the production resampler for both paths, pinning
everything downstream of it).
"""

from __future__ import annotations

import numpy as np

FS = 10000


def _hanning(n: int) -> np.ndarray:
    """MATLAB hanning(n): 0.5*(1-cos(2*pi*k/(n+1))), k=1..n."""
    k = np.arange(1, n + 1, dtype=np.float64)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * k / (n + 1)))


def _thirdoct(fs, N_fft, numBands, mn):
    """stoi.m:88-119 thirdoct, with the trailing-band trim logic."""
    f = np.linspace(0, fs, N_fft + 1)[: N_fft // 2 + 1]
    k = np.arange(numBands, dtype=np.float64)
    cf = 2.0 ** (k / 3.0) * mn
    fl = np.sqrt((2.0 ** (k / 3.0) * mn) * 2.0 ** ((k - 1) / 3.0) * mn)
    fr = np.sqrt((2.0 ** (k / 3.0) * mn) * 2.0 ** ((k + 1) / 3.0) * mn)
    A = np.zeros((numBands, len(f)))
    for i in range(numBands):
        fl_ii = int(np.argmin((f - fl[i]) ** 2))
        fr_ii = int(np.argmin((f - fr[i]) ** 2))
        A[i, fl_ii:fr_ii] = 1.0  # MATLAB A(i, fl_ii:(fr_ii-1)) = 1
    rnk = A.sum(axis=1)
    # numBands = find((rnk(2:end)>=rnk(1:end-1)) & (rnk(2:end)~=0), 1,
    #                 'last') + 1
    ok = (rnk[1:] >= rnk[:-1]) & (rnk[1:] != 0)
    last = int(np.nonzero(ok)[0][-1]) + 1  # 0-based index of the kept last
    return A[: last + 1]


def _stdft(x, N, K, N_fft):
    """stoi.m:122-137 stdft: per-frame loop, full complex DFT rows."""
    starts = np.arange(0, len(x) - N, K)  # MATLAB 1:K:(length(x)-N)
    w = _hanning(N)
    out = np.zeros((len(starts), N_fft), np.complex128)
    for i, s in enumerate(starts):
        out[i] = np.fft.fft(x[s:s + N] * w, N_fft)
    return out


def _remove_silent_frames(x, y, rng, N, K):
    """stoi.m:140-177 removeSilentFrames: mask loop + overlap-add loop."""
    starts = np.arange(0, len(x) - N, K)
    w = _hanning(N)
    msk = np.zeros(len(starts))
    for j, s in enumerate(starts):
        msk[j] = 20.0 * np.log10(np.linalg.norm(x[s:s + N] * w)
                                 / np.sqrt(N))
    msk = (msk - msk.max() + rng) > 0
    x_sil = np.zeros(len(x))
    y_sil = np.zeros(len(y))
    count = 0
    end = 0
    for j, s in enumerate(starts):
        if msk[j]:
            o = starts[count]
            x_sil[o:o + N] += x[s:s + N] * w
            y_sil[o:o + N] += y[s:s + N] * w
            end = o + N
            count += 1
    return x_sil[:end], y_sil[:end]


def _taa_corr(x, y):
    """stoi.m:180-188."""
    xn = x - np.mean(x)
    xn = xn / np.sqrt(np.sum(xn ** 2))
    yn = y - np.mean(y)
    yn = yn / np.sqrt(np.sum(yn ** 2))
    return np.sum(xn * yn)


def oracle_stoi(x, y, fs_signal=FS):
    """stoi.m:1-85 top level. x, y must be at 10 kHz (see module note)."""
    assert fs_signal == FS, "oracle takes 10 kHz input; resampling is out " \
                            "of the transcription's scope"
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    assert len(x) == len(y)

    N_frame, K, J, mn = 256, 512, 15, 150
    N = 30
    Beta = -15.0
    dyn_range = 40.0
    H = _thirdoct(FS, K, J, mn)

    x, y = _remove_silent_frames(x, y, dyn_range, N_frame, N_frame // 2)

    x_hat = _stdft(x, N_frame, N_frame // 2, K)[:, : K // 2 + 1].T
    y_hat = _stdft(y, N_frame, N_frame // 2, K)[:, : K // 2 + 1].T

    n_fr = x_hat.shape[1]
    X = np.zeros((H.shape[0], n_fr))
    Y = np.zeros((H.shape[0], n_fr))
    for i in range(n_fr):
        X[:, i] = np.sqrt(H @ np.abs(x_hat[:, i]) ** 2)
        Y[:, i] = np.sqrt(H @ np.abs(y_hat[:, i]) ** 2)

    c = 10.0 ** (-Beta / 20.0)
    # stoi.m:71 zeros(J, length(N:n_fr)): an empty range when n_fr < N
    # (mostly-silent input), so mean(d_interm(:)) is NaN -- mirror that
    # instead of np.zeros with a negative dimension.
    d_interm = np.zeros((H.shape[0], max(0, n_fr - N + 1)))
    for m in range(N - 1, n_fr):  # MATLAB m = N:size(X,2)
        X_seg = X[:, m - N + 1:m + 1]
        Y_seg = Y[:, m - N + 1:m + 1]
        alpha = np.sqrt(np.sum(X_seg ** 2, axis=1)
                        / np.sum(Y_seg ** 2, axis=1))
        aY_seg = Y_seg * alpha[:, None]
        for j in range(H.shape[0]):
            Y_prime = np.minimum(aY_seg[j], X_seg[j] + X_seg[j] * c)
            d_interm[j, m - N + 1] = _taa_corr(X_seg[j], Y_prime)
    return float(np.mean(d_interm))
