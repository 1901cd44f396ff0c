"""Speech-quality measures: segmental SNR, LLR, WSS, and the composite
CSIG/CBAK/COVL regressions.

These mirror the reference's offline MATLAB scoring suite
(ref: demand_voice_bank_objective_scoring/objective_scoring.m:1-83 and its
comp_snr.m / comp_fwseg_variant.m / composite.m helpers), implemented
natively from the published algorithms (Quackenbush, Barnwell & Clements,
"Objective Measures of Speech Quality", 1988; Hu & Loizou, "Evaluation of
objective quality measures for speech enhancement", IEEE TASLP 2008).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
from scipy.linalg import solve_toeplitz


def snr_overall(clean: np.ndarray, enhanced: np.ndarray) -> float:
    """Overall SNR in dB between the clean reference and the residual."""
    n = min(len(clean), len(enhanced))
    c, e = clean[:n].astype(np.float64), enhanced[:n].astype(np.float64)
    noise = c - e
    return float(10.0 * np.log10(np.sum(c ** 2) / max(np.sum(noise ** 2), 1e-12)))


def seg_snr(clean: np.ndarray, enhanced: np.ndarray, fs: int,
            frame_ms: float = 30.0, overlap: float = 0.75,
            lo: float = -10.0, hi: float = 35.0) -> float:
    """Frame-averaged segmental SNR, clamped to [-10, 35] dB per frame (the
    convention of the MATLAB comp_snr.m scorer)."""
    n = min(len(clean), len(enhanced))
    c, e = clean[:n].astype(np.float64), enhanced[:n].astype(np.float64)
    flen = int(fs * frame_ms / 1000.0)
    hop = int(flen * (1.0 - overlap))
    vals = []
    for start in range(0, n - flen + 1, hop):
        cf = c[start:start + flen]
        ef = e[start:start + flen]
        num = np.sum(cf ** 2)
        den = np.sum((cf - ef) ** 2)
        s = 10.0 * np.log10((num + 1e-12) / (den + 1e-12))
        vals.append(np.clip(s, lo, hi))
    return float(np.mean(vals)) if vals else 0.0


def _lpc(x: np.ndarray, order: int) -> Tuple[np.ndarray, np.ndarray]:
    """Autocorrelation-method LPC: returns (a, R) with a[0] == 1."""
    x = x * np.hamming(len(x))
    R = np.array([np.dot(x[: len(x) - k], x[k:]) for k in range(order + 1)])
    if R[0] <= 0:
        return np.r_[1.0, np.zeros(order)], R
    try:
        coeffs = solve_toeplitz((R[:-1], R[:-1]), -R[1:])
    except np.linalg.LinAlgError:
        return np.r_[1.0, np.zeros(order)], R
    return np.r_[1.0, coeffs], R


def llr(clean: np.ndarray, enhanced: np.ndarray, fs: int,
        frame_ms: float = 30.0, overlap: float = 0.75) -> float:
    """Log-likelihood ratio: mean over the lowest 95% of frames (Hu & Loizou
    convention) of log(a_e R_c a_e' / a_c R_c a_c')."""
    n = min(len(clean), len(enhanced))
    c, e = clean[:n].astype(np.float64), enhanced[:n].astype(np.float64)
    flen = int(fs * frame_ms / 1000.0)
    hop = int(flen * (1.0 - overlap))
    order = 10 if fs < 10000 else 16
    vals = []
    for start in range(0, n - flen + 1, hop):
        a_c, R_c = _lpc(c[start:start + flen], order)
        a_e, _ = _lpc(e[start:start + flen], order)
        # full autocorrelation matrix quadratic forms via toeplitz structure
        from scipy.linalg import toeplitz
        Rm = toeplitz(R_c)
        num = a_e @ Rm @ a_e
        den = a_c @ Rm @ a_c
        if den > 0 and num > 0:
            vals.append(min(np.log(num / den), 2.0))
    if not vals:
        return 0.0
    vals = np.sort(vals)[: int(round(len(vals) * 0.95))]
    return float(np.mean(vals))


@functools.lru_cache(maxsize=None)
def _wss_filters(fs: int, nfft: int):
    """25 critical-band Gaussian filters for WSS (Klatt 1982 band centres),
    cached per (fs, nfft)."""
    cent = np.array([50.0, 120.0, 190.0, 260.0, 330.0, 400.0, 470.0, 540.0,
                     617.372, 703.378, 798.717, 904.128, 1020.38, 1148.30,
                     1288.72, 1442.54, 1610.70, 1794.16, 1993.93, 2211.08,
                     2446.71, 2701.97, 2978.04, 3276.17, 3597.63])
    bw = np.array([70.0, 70.0, 70.0, 70.0, 70.0, 70.0, 70.0, 77.3724,
                   86.0056, 95.3398, 105.411, 116.256, 127.914, 140.423,
                   153.823, 168.154, 183.457, 199.776, 217.153, 235.631,
                   255.255, 276.072, 298.126, 321.465, 346.136])
    min_factor = np.exp(-30.0 / (2.0 * 2.303))
    n_bins = nfft // 2 + 1
    f = np.arange(n_bins) * fs / nfft
    filt = np.zeros((25, n_bins))
    for i in range(25):
        f0 = cent[i]
        b = bw[i]
        g = np.exp(-11.0 * (((f - f0) / b) ** 2))
        g[g < min_factor] = 0.0
        filt[i] = g
    return filt


def wss(clean: np.ndarray, enhanced: np.ndarray, fs: int,
        frame_ms: float = 30.0, overlap: float = 0.75) -> float:
    """Weighted spectral slope distance (Klatt 1982 / Hu & Loizou variant):
    mean over the lowest 95% of frames."""
    n = min(len(clean), len(enhanced))
    c, e = clean[:n].astype(np.float64), enhanced[:n].astype(np.float64)
    flen = int(fs * frame_ms / 1000.0)
    hop = int(flen * (1.0 - overlap))
    nfft = int(2 ** np.ceil(np.log2(2 * flen)))
    filt = _wss_filters(fs, nfft)
    win = np.hanning(flen)
    Kmax, Klocmax = 20.0, 1.0
    vals = []
    for start in range(0, n - flen + 1, hop):
        cs = np.abs(np.fft.rfft(c[start:start + flen] * win, nfft))
        es = np.abs(np.fft.rfft(e[start:start + flen] * win, nfft))
        cb_c = 10.0 * np.log10(np.maximum(filt @ (cs ** 2), 1e-10))
        cb_e = 10.0 * np.log10(np.maximum(filt @ (es ** 2), 1e-10))
        sl_c = np.diff(cb_c)
        sl_e = np.diff(cb_e)
        # weights from peak proximity
        dBmax_c = cb_c.max()
        dBmax_e = cb_e.max()

        def weights(cb, sl, dBmax):
            w = np.zeros(len(sl))
            for k in range(len(sl)):
                if sl[k] > 0:
                    nearest = cb[k + 1:][cb[k + 1:] >= cb[k]]
                    peak = nearest[0] if len(nearest) else cb[k]
                else:
                    prev = cb[: k + 1][::-1]
                    big = prev[prev >= cb[k]]
                    peak = big[0] if len(big) else cb[k]
                Wmax = Kmax / (Kmax + dBmax - cb[k])
                Wlocmax = Klocmax / (Klocmax + peak - cb[k])
                w[k] = Wmax * Wlocmax
            return w

        w_c = weights(cb_c, sl_c, dBmax_c)
        w_e = weights(cb_e, sl_e, dBmax_e)
        w = (w_c + w_e) / 2.0
        vals.append(np.sum(w * (sl_c - sl_e) ** 2) / max(np.sum(w), 1e-12))
    if not vals:
        return 0.0
    vals = np.sort(vals)[: int(round(len(vals) * 0.95))]
    return float(np.mean(vals))


def composite(clean: np.ndarray, enhanced: np.ndarray, fs: int,
              pesq_mos: Optional[float] = None) -> dict:
    """CSIG/CBAK/COVL composite measures (Hu & Loizou 2008 regressions, the
    ones used by the DEMAND-VB MATLAB scorer). Requires a PESQ MOS; if
    unavailable the PESQ term is computed via deepxi_tpu.metrics.pesq when
    present, else the composites are omitted."""
    if pesq_mos is None:
        try:
            from deepxi_tpu.metrics.pesq import pesq as _pesq
            pesq_mos = _pesq(clean, enhanced, fs)
        except Exception:
            pesq_mos = None
    out = {
        "SegSNR": seg_snr(clean, enhanced, fs),
        "LLR": llr(clean, enhanced, fs),
        "WSS": wss(clean, enhanced, fs),
        "SNR": snr_overall(clean, enhanced),
    }
    if pesq_mos is not None:
        out["PESQ"] = pesq_mos
        out["CSIG"] = float(np.clip(3.093 - 1.029 * out["LLR"] + 0.603 * pesq_mos
                                    - 0.009 * out["WSS"], 1.0, 5.0))
        out["CBAK"] = float(np.clip(1.634 + 0.478 * pesq_mos - 0.007 * out["WSS"]
                                    + 0.063 * out["SegSNR"], 1.0, 5.0))
        out["COVL"] = float(np.clip(1.594 + 0.805 * pesq_mos - 0.512 * out["LLR"]
                                    - 0.007 * out["WSS"], 1.0, 5.0))
    return out
