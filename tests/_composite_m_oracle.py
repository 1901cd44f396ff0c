"""Loop-level NumPy transcription of the reference's composite.m -- a
TEST-ONLY differential oracle for deepxi_tpu/metrics/quality.py.

Mechanically transcribed, statement by statement, from
ref: demand_voice_bank_objective_scoring/composite.m:1-485 (Hu & Loizou's
published implementation; LLR/SegSNR/WSS after Pellom & Hansen). The
production module vectorises every stage (batched Levinson, matrix WSS
filterbank, quad-form-without-toeplitz LLR); this oracle keeps MATLAB's
per-frame loops, 1-based walks and `toeplitz` products so the two
implementations share no code path -- agreement pins the vectorisation,
disagreement localises a transcription slip (same method as
tests/_pesq_m_oracle.py for pesq.m).

MATLAB semantics preserved deliberately:
  * `for frame_count = 1:num_frames` with float num_frames iterates
    floor(num_frames) times;
  * `round` is round-half-AWAY-FROM-ZERO (np.round / Python round are
    banker's -- a genuine difference this oracle exists to catch);
  * `eps` is double-precision machine eps.
"""

from __future__ import annotations

import numpy as np

EPS = np.finfo(np.float64).eps


def matlab_round(x: float) -> int:
    """MATLAB round(): half away from zero (positive args here)."""
    return int(np.floor(x + 0.5))


def _window(winlength: int) -> np.ndarray:
    # 0.5*(1 - cos(2*pi*(1:winlength)'/(winlength+1)))  (composite.m:175)
    k = np.arange(1, winlength + 1, dtype=np.float64)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * k / (winlength + 1)))


def oracle_wss(clean_speech, processed_speech, sample_rate):
    """composite.m:86-313 `wss`, literal frame loop."""
    clean_speech = np.asarray(clean_speech, np.float64)
    processed_speech = np.asarray(processed_speech, np.float64)
    clean_length = len(clean_speech)

    winlength = matlab_round(30 * sample_rate / 1000.0)
    skiprate = int(np.floor(winlength / 4))
    max_freq = sample_rate / 2.0
    num_crit = 25

    n_fft = int(2 ** np.ceil(np.log2(2 * winlength)))
    n_fftby2 = n_fft // 2
    Kmax = 20.0
    Klocmax = 1.0

    cent_freq = [50.0, 120.0, 190.0, 260.0, 330.0, 400.0, 470.0, 540.0,
                 617.372, 703.378, 798.717, 904.128, 1020.38, 1148.30,
                 1288.72, 1442.54, 1610.70, 1794.16, 1993.93, 2211.08,
                 2446.71, 2701.97, 2978.04, 3276.17, 3597.63]
    bandwidth = [70.0, 70.0, 70.0, 70.0, 70.0, 70.0, 70.0, 77.3724,
                 86.0056, 95.3398, 105.411, 116.256, 127.914, 140.423,
                 153.823, 168.154, 183.457, 199.776, 217.153, 235.631,
                 255.255, 276.072, 298.126, 321.465, 346.136]
    bw_min = bandwidth[0]

    min_factor = np.exp(-30.0 / (2.0 * 2.303))
    crit_filter = np.zeros((num_crit, n_fftby2))
    for i in range(num_crit):
        f0 = (cent_freq[i] / max_freq) * n_fftby2
        bw = (bandwidth[i] / max_freq) * n_fftby2
        norm_factor = np.log(bw_min) - np.log(bandwidth[i])
        j = np.arange(n_fftby2, dtype=np.float64)
        g = np.exp(-11.0 * (((j - np.floor(f0)) / bw) ** 2) + norm_factor)
        crit_filter[i] = g * (g > min_factor)

    num_frames = int(clean_length / skiprate - (winlength / skiprate))
    start = 0  # MATLAB start=1
    window = _window(winlength)

    distortion = []
    for _ in range(num_frames):
        clean_frame = clean_speech[start:start + winlength] * window
        processed_frame = processed_speech[start:start + winlength] * window

        clean_spec = np.abs(np.fft.fft(clean_frame, n_fft)) ** 2
        processed_spec = np.abs(np.fft.fft(processed_frame, n_fft)) ** 2

        clean_energy = np.zeros(num_crit)
        processed_energy = np.zeros(num_crit)
        for i in range(num_crit):
            clean_energy[i] = np.sum(clean_spec[:n_fftby2] * crit_filter[i])
            processed_energy[i] = np.sum(processed_spec[:n_fftby2]
                                         * crit_filter[i])
        clean_energy = 10.0 * np.log10(np.maximum(clean_energy, 1e-10))
        processed_energy = 10.0 * np.log10(np.maximum(processed_energy,
                                                      1e-10))

        clean_slope = clean_energy[1:] - clean_energy[:-1]
        processed_slope = processed_energy[1:] - processed_energy[:-1]

        # nearest-peak walks, composite.m:236-275 (1-based; n here is a
        # 0-based index into slope/energy arrays)
        clean_loc_peak = np.zeros(num_crit - 1)
        processed_loc_peak = np.zeros(num_crit - 1)
        for i in range(num_crit - 1):
            if clean_slope[i] > 0:  # search right: while n<num_crit & slope(n)>0
                n = i
                while n < num_crit - 1 and clean_slope[n] > 0:
                    n += 1
                # MATLAB energy(n-1) with n 1-based = energy[n-1] for our
                # 0-based slope pointer (exactly the production e[m-1])
                clean_loc_peak[i] = clean_energy[n - 1]
            else:  # search left: while n>0 & slope(n)<=0
                n = i
                while n >= 0 and clean_slope[n] <= 0:
                    n -= 1
                clean_loc_peak[i] = clean_energy[n + 1]
            if processed_slope[i] > 0:
                n = i
                while n < num_crit - 1 and processed_slope[n] > 0:
                    n += 1
                processed_loc_peak[i] = processed_energy[n - 1]
            else:
                n = i
                while n >= 0 and processed_slope[n] <= 0:
                    n -= 1
                processed_loc_peak[i] = processed_energy[n + 1]

        dBMax_clean = np.max(clean_energy)
        dBMax_processed = np.max(processed_energy)
        Wmax_clean = Kmax / (Kmax + dBMax_clean - clean_energy[:num_crit - 1])
        Wlocmax_clean = Klocmax / (Klocmax + clean_loc_peak
                                   - clean_energy[:num_crit - 1])
        W_clean = Wmax_clean * Wlocmax_clean
        Wmax_processed = Kmax / (Kmax + dBMax_processed
                                 - processed_energy[:num_crit - 1])
        Wlocmax_processed = Klocmax / (Klocmax + processed_loc_peak
                                       - processed_energy[:num_crit - 1])
        W_processed = Wmax_processed * Wlocmax_processed
        W = (W_clean + W_processed) / 2.0

        d = np.sum(W * (clean_slope[:num_crit - 1]
                        - processed_slope[:num_crit - 1]) ** 2)
        distortion.append(d / np.sum(W))
        start += skiprate
    return np.asarray(distortion)


def _lpcoeff(speech_frame, model_order):
    """composite.m:386-414 lpcoeff: autocorrelation + Levinson-Durbin.
    Returns (R, rcoeff, A=[1, -a])."""
    winlength = len(speech_frame)
    R = np.zeros(model_order + 1)
    for k in range(model_order + 1):  # MATLAB k=1..order+1
        R[k] = np.sum(speech_frame[: winlength - k] * speech_frame[k:])

    a = np.ones(model_order)
    E = np.zeros(model_order + 1)
    E[0] = R[0]
    rcoeff = np.zeros(model_order)
    for i in range(model_order):  # MATLAB i=1..order
        a_past = a[:i].copy()
        sum_term = np.sum(a_past * R[i:0:-1])  # R(i:-1:2) 1-based
        rcoeff[i] = (R[i + 1] - sum_term) / E[i]
        a[i] = rcoeff[i]
        if i > 0:
            a[:i] = a_past - rcoeff[i] * a_past[::-1]
        E[i + 1] = (1 - rcoeff[i] * rcoeff[i]) * E[i]
    return R, rcoeff, np.concatenate([[1.0], -a])


def _toeplitz(r):
    n = len(r)
    return np.asarray([[r[abs(i - j)] for j in range(n)] for i in range(n)])


def oracle_llr(clean_speech, processed_speech, sample_rate):
    """composite.m:316-381 `llr`, literal frame loop with toeplitz
    quadratic forms."""
    clean_speech = np.asarray(clean_speech, np.float64)
    processed_speech = np.asarray(processed_speech, np.float64)
    clean_length = len(clean_speech)
    winlength = matlab_round(30 * sample_rate / 1000.0)
    skiprate = int(np.floor(winlength / 4))
    P = 10 if sample_rate < 10000 else 16

    num_frames = int(clean_length / skiprate - (winlength / skiprate))
    start = 0
    window = _window(winlength)
    distortion = []
    for _ in range(num_frames):
        clean_frame = clean_speech[start:start + winlength] * window
        processed_frame = processed_speech[start:start + winlength] * window
        R_clean, _, A_clean = _lpcoeff(clean_frame, P)
        _R_p, _, A_processed = _lpcoeff(processed_frame, P)
        T = _toeplitz(R_clean)
        numerator = A_processed @ T @ A_processed
        denominator = A_clean @ T @ A_clean
        distortion.append(np.log(numerator / denominator))
        start += skiprate
    return np.asarray(distortion)


def oracle_snr(clean_speech, processed_speech, sample_rate):
    """composite.m:418-485 `snr`: (overall_snr, segmental_snr vector)."""
    clean_speech = np.asarray(clean_speech, np.float64)
    processed_speech = np.asarray(processed_speech, np.float64)
    clean_length = len(clean_speech)

    overall_snr = 10.0 * np.log10(
        np.sum(clean_speech ** 2)
        / np.sum((clean_speech - processed_speech) ** 2))

    winlength = matlab_round(30 * sample_rate / 1000.0)
    skiprate = int(np.floor(winlength / 4))
    MIN_SNR, MAX_SNR = -10.0, 35.0
    num_frames = int(clean_length / skiprate - (winlength / skiprate))
    start = 0
    window = _window(winlength)
    segmental_snr = []
    for _ in range(num_frames):
        clean_frame = clean_speech[start:start + winlength] * window
        processed_frame = processed_speech[start:start + winlength] * window
        signal_energy = np.sum(clean_frame ** 2)
        noise_energy = np.sum((clean_frame - processed_frame) ** 2)
        s = 10.0 * np.log10(signal_energy / (noise_energy + EPS) + EPS)
        segmental_snr.append(min(max(s, MIN_SNR), MAX_SNR))
        start += skiprate
    return overall_snr, np.asarray(segmental_snr)


def oracle_composite(clean, enhanced, f_s, pesq_mos):
    """composite.m:1-81 top level: returns the full score dict. `pesq_mos`
    is supplied (composite.m calls its own pesq.m; the PESQ half of the
    differential validation lives in tests/test_pesq_oracle.py)."""
    clean = np.asarray(clean, np.float64)
    enhanced = np.asarray(enhanced, np.float64)
    alpha = 0.95
    n = min(len(clean), len(enhanced))
    data1 = clean[:n] + EPS
    data2 = enhanced[:n] + EPS

    wss_dist_vec = np.sort(oracle_wss(data1, data2, f_s))
    wss_dist = np.mean(
        wss_dist_vec[: matlab_round(len(wss_dist_vec) * alpha)])

    LLRs = np.sort(oracle_llr(data1, data2, f_s))
    LLR_len = matlab_round(len(LLRs) * alpha)
    llr_mean = np.mean(LLRs[:LLR_len])

    snr_dist, segsnr_dist = oracle_snr(data1, data2, f_s)
    segSNR = np.mean(segsnr_dist)

    Csig = 3.093 - 1.029 * llr_mean + 0.603 * pesq_mos - 0.009 * wss_dist
    Csig = min(5.0, max(1.0, Csig))
    Cbak = 1.634 + 0.478 * pesq_mos - 0.007 * wss_dist + 0.063 * segSNR
    Cbak = min(5.0, max(1.0, Cbak))
    Covl = 1.594 + 0.805 * pesq_mos - 0.512 * llr_mean - 0.007 * wss_dist
    Covl = min(5.0, max(1.0, Covl))
    return {"CSIG": Csig, "CBAK": Cbak, "COVL": Covl, "LLR": llr_mean,
            "WSS": wss_dist, "SegSNR": segSNR, "SNR": snr_dist}
