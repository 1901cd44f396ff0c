"""Test-only differential oracle: a mechanical, loop-for-loop NumPy
transcription of the reference's MATLAB PESQ implementation
(ref: demand_voice_bank_objective_scoring/pesq.m), covering the signal
conditioning + psychoacoustic model stages:

  * apply_filter / fix_power_level        (pesq.m:226-263, 609-630)
  * IRS receive / WB input filtering      (pesq.m:87-108, 287-303)
  * pesq_psychoacoustic_model and helpers (pesq.m:785-1478)
  * Lpq_weight / compute_delay            (pesq.m:1479-1578)
  * MOS-LQO mappings                      (pesq.m:199-216)

This module intentionally does NOT import deepxi_tpu.metrics.pesq: it is
the independent arm of tests/test_pesq_oracle.py, which asserts the
production vectorised implementation agrees with this transcription to
within 1e-2 MOS (VERDICT r4 next-#3). MATLAB's 1-based indexing is kept
in the arithmetic; array accesses subtract 1 explicitly, so each line can
be eyeball-diffed against its pesq.m counterpart.

Shared inputs (disclosed, deliberate): the normative P.862 constant
tables (deepxi_tpu.metrics._pesq_tables — standards data, not logic) and
the utterance-alignment stage (deepxi_tpu.metrics._pesq_align, itself a
cited port of pesq.m's alignment); this oracle independently rebuilds
everything downstream of alignment plus the filter/level stages upstream
of it.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.signal import resample_poly, sosfilt

from deepxi_tpu.metrics import _pesq_align as A
from deepxi_tpu.metrics import _pesq_tables as T

DATAPADDING_MSECS = 320
SEARCHBUFFER = 75


class _Globals:
    """The MATLAB `setup_global` state (ref: pesq.m:1787-2107)."""

    def __init__(self, fs: int):
        sfx = "8k" if fs == 8000 else "16k"
        self.Fs = fs
        self.Downsample = int(getattr(T, f"Downsample_{sfx}"))
        self.Nb = int(getattr(T, f"Nb_{sfx}"))
        self.Sp = float(getattr(T, f"Sp_{sfx}"))
        self.Sl = float(getattr(T, f"Sl_{sfx}"))
        self.nr_of_hz_bands_per_bark_band = [
            int(v) for v in getattr(T, f"nr_of_hz_bands_per_bark_band_{sfx}")]
        self.centre_of_band_bark = list(getattr(T, f"centre_of_band_bark_{sfx}"))
        self.width_of_band_bark = list(getattr(T, f"width_of_band_bark_{sfx}"))
        self.pow_dens_correction_factor = list(
            getattr(T, f"pow_dens_correction_factor_{sfx}"))
        self.abs_thresh_power = list(getattr(T, f"abs_thresh_power_{sfx}"))
        iir = np.asarray(getattr(T, f"InIIR_Hsos_{sfx}")).reshape(-1, 5)
        self.in_sos = np.concatenate(
            [iir[:, :3], np.ones((len(iir), 1)), iir[:, 3:]], axis=1)
        if fs == 16000:
            wb = np.asarray(T.WB_InIIR_Hsos_16k).reshape(-1, 5)
            self.wb_sos = np.concatenate(
                [wb[:, :3], np.ones((len(wb), 1)), wb[:, 3:]], axis=1)
        self.pad = DATAPADDING_MSECS * (fs // 1000)


_IRS_FILTER_DB = [
    (0, -200), (50, -40), (100, -20), (125, -12), (160, -6), (200, 0),
    (250, 4), (300, 6), (350, 8), (400, 10), (500, 11), (600, 12), (700, 12),
    (800, 12), (1000, 12), (1300, 12), (1600, 12), (2000, 12), (2500, 12),
    (3000, 12), (3250, 12), (3500, 4), (4000, -200), (5000, -200),
    (6300, -200), (8000, -200)]

_ALIGN_FILTER_DB = [
    (0, -500), (50, -500), (100, -500), (125, -500), (160, -500), (200, -500),
    (250, -500), (300, -500), (350, 0), (400, 0), (500, 0), (600, 0),
    (630, 0), (800, 0), (1000, 0), (1250, 0), (1600, 0), (2000, 0),
    (2500, 0), (3000, 0), (3250, 0), (3500, -500), (4000, -500),
    (5000, -500), (6300, -500), (8000, -500)]


def _pow_of(data, start_point, end_point, divisor):
    """ref: pesq.m:1781-1786 (1-based inclusive sample range)."""
    seg = np.asarray(data[start_point - 1:end_point], np.float64)
    return float(np.sum(seg * seg) / divisor)


def _apply_filter(data, data_Nsamples, align_filter_dB, G):
    """ref: pesq.m:226-263."""
    align_filtered = np.array(data, np.float64)
    n = data_Nsamples - 2 * SEARCHBUFFER * G.Downsample + G.pad
    pow_of_2 = 2 ** int(math.ceil(math.log2(n)))
    xs = [p[0] for p in align_filter_dB]
    ys = [p[1] for p in align_filter_dB]
    overallGainFilter = np.interp(1000.0, xs, ys)
    x = np.zeros(pow_of_2)
    sb = SEARCHBUFFER * G.Downsample
    x[:n] = data[sb:sb + n]
    x_fft = np.fft.fft(x, pow_of_2)
    freq_resolution = G.Fs / pow_of_2
    factorDb = (np.interp(np.arange(pow_of_2 // 2 + 1) * freq_resolution,
                          xs, ys) - overallGainFilter)
    factor = 10.0 ** (factorDb / 20.0)
    factor = np.concatenate([factor, factor[1:pow_of_2 // 2][::-1]])
    y = np.fft.ifft(x_fft * factor, pow_of_2)
    align_filtered[sb:sb + n] = np.real(y[:n])
    return align_filtered


def _fix_power_level(data, data_Nsamples, maxNsamples, G):
    """ref: pesq.m:609-630."""
    TARGET_AVG_POWER = 1e7
    align_filtered = _apply_filter(data, data_Nsamples, _ALIGN_FILTER_DB, G)
    power_above_300Hz = _pow_of(
        align_filtered, SEARCHBUFFER * G.Downsample + 1,
        data_Nsamples - SEARCHBUFFER * G.Downsample + G.pad,
        maxNsamples - 2 * SEARCHBUFFER * G.Downsample + G.pad)
    global_scale = math.sqrt(TARGET_AVG_POWER / power_above_300Hz)
    return data * global_scale


def _short_term_fft(Nf, data, Whanning, start_sample):
    """ref: pesq.m:1694-1699 (start_sample is 1-based)."""
    x1 = data[start_sample - 1:start_sample - 1 + Nf] * Whanning
    hz = np.abs(np.fft.fft(x1)[:Nf // 2]) ** 2
    hz[0] = 0.0
    return hz


def _freq_warping(hz_spectrum, Nb, G):
    """ref: pesq.m:1703-1720."""
    ppd = np.zeros(Nb)
    hz_band = 1
    for bark_band in range(1, Nb + 1):
        n = G.nr_of_hz_bands_per_bark_band[bark_band - 1]
        s = 0.0
        for _ in range(n):
            s += hz_spectrum[hz_band - 1]
            hz_band += 1
        s *= G.pow_dens_correction_factor[bark_band - 1]
        s *= G.Sp
        ppd[bark_band - 1] = s
    return ppd


def _total_audible(frame, pitch_pow_dens, factor, G):
    """ref: pesq.m:1724-1736."""
    total = 0.0
    for band in range(2, G.Nb + 1):
        h = pitch_pow_dens[frame, band - 1]
        threshold = factor * G.abs_thresh_power[band - 1]
        if h > threshold:
            total += h
    return total


def _time_avg_audible_of(number_of_frames, silent, pitch_pow_dens,
                         total_number_of_frames, G):
    """ref: pesq.m:1673-1689."""
    avg = np.zeros(G.Nb)
    for band in range(1, G.Nb + 1):
        result = 0.0
        for frame in range(1, number_of_frames + 1):
            if not silent[frame - 1]:
                h = pitch_pow_dens[frame - 1, band - 1]
                if h > 100.0 * G.abs_thresh_power[band - 1]:
                    result += h
        avg[band - 1] = result / total_number_of_frames
    return avg


def _freq_resp_compensation(number_of_frames, pitch_pow_dens_ref,
                            avg_ref, avg_deg, constant, G):
    """ref: pesq.m:1650-1668."""
    out = np.array(pitch_pow_dens_ref)
    for band in range(1, G.Nb + 1):
        x = (avg_deg[band - 1] + constant) / (avg_ref[band - 1] + constant)
        if x > 100.0:
            x = 100.0
        elif x < 0.01:
            x = 0.01
        for frame in range(1, number_of_frames + 1):
            out[frame - 1, band - 1] = pitch_pow_dens_ref[frame - 1, band - 1] * x
    return out


def _intensity_warping_of(frame, pitch_pow_dens, G):
    """ref: pesq.m:1600-1628."""
    ZWICKER_POWER = 0.23
    loudness_dens = np.zeros(G.Nb)
    for band in range(1, G.Nb + 1):
        threshold = G.abs_thresh_power[band - 1]
        inp = pitch_pow_dens[frame, band - 1]
        if G.centre_of_band_bark[band - 1] < 4:
            h = 6.0 / (G.centre_of_band_bark[band - 1] + 2.0)
        else:
            h = 1.0
        if h > 2.0:
            h = 2.0
        h = h ** 0.15
        modified_zwicker_power = ZWICKER_POWER * h
        if inp > threshold:
            loudness_dens[band - 1] = (
                (threshold / 0.5) ** modified_zwicker_power
                * ((0.5 + 0.5 * inp / threshold) ** modified_zwicker_power - 1.0))
        else:
            loudness_dens[band - 1] = 0.0
        loudness_dens[band - 1] *= G.Sl
    return loudness_dens


def _pseudo_Lp(x, p, G):
    """ref: pesq.m:1632-1646."""
    totalWeight = 0.0
    result = 0.0
    for band in range(2, G.Nb + 1):
        h = abs(x[band - 1])
        w = G.width_of_band_bark[band - 1]
        prod = h * w
        result += prod ** p
        totalWeight += w
    result = (result / totalWeight) ** (1.0 / p)
    return result * totalWeight


def _multiply_with_asymmetry_factor(disturbance_dens, frame,
                                    ppd_ref, ppd_deg, G):
    """ref: pesq.m:1582-1596."""
    out = np.zeros(G.Nb)
    for i in range(1, G.Nb + 1):
        ratio = (ppd_deg[frame, i - 1] + 50.0) / (ppd_ref[frame, i - 1] + 50.0)
        h = ratio ** 1.2
        if h > 12.0:
            h = 12.0
        elif h < 3.0:
            h = 0.0
        out[i - 1] = disturbance_dens[i - 1] * h
    return out


def _Lpq_weight(start_frame, stop_frame, power_syllable, power_time,
                frame_disturbance, time_weight):
    """ref: pesq.m:1479-1522."""
    NUMBER_OF_PSQM_FRAMES_PER_SYLLABE = 20
    result_time = 0.0
    total_time_weight_time = 0.0
    for start_frame_of_syllable in range(
            start_frame, stop_frame + 1,
            NUMBER_OF_PSQM_FRAMES_PER_SYLLABE // 2):
        result_syllable = 0.0
        count_syllable = 0
        for frame in range(start_frame_of_syllable,
                           start_frame_of_syllable
                           + NUMBER_OF_PSQM_FRAMES_PER_SYLLABE):
            if frame <= stop_frame:
                h = frame_disturbance[frame]
                result_syllable += h ** power_syllable
            count_syllable += 1
        result_syllable /= count_syllable
        result_syllable **= (1.0 / power_syllable)
        tw = time_weight[start_frame_of_syllable - start_frame]
        result_time += (tw * result_syllable) ** power_time
        total_time_weight_time += tw ** power_time
    result_time /= total_time_weight_time
    return result_time ** (1.0 / power_time)


def _compute_delay(start_sample, stop_sample, search_range,
                   time_series1, time_series2):
    """ref: pesq.m:1527-1578 (start/stop_sample are 1-based)."""
    n = stop_sample - start_sample + 1
    power_of_2 = 2 ** int(math.ceil(math.log2(2 * n)))
    power1 = _pow_of(time_series1, start_sample, stop_sample, n) * n / power_of_2
    power2 = _pow_of(time_series2, start_sample, stop_sample, n) * n / power_of_2
    normalization = math.sqrt(power1 * power2)
    # pesq.m:1542-1545 sets best_delay/max_correlation to 0 when either
    # power <= 1e-6 but does NOT return -- control falls through to the
    # FFT correlation below, which overwrites both (the MATLAB branch is
    # dead code). Transcribe the fall-through, not the intent; with
    # normalization == 0 the h = inf/nan comparisons behave identically
    # in MATLAB and NumPy (inf > x true, nan > x false).
    x1 = np.zeros(power_of_2)
    x2 = np.zeros(power_of_2)
    x1[:n] = np.abs(time_series1[start_sample - 1:stop_sample])
    x2[:n] = np.abs(time_series2[start_sample - 1:stop_sample])
    x1_fft = np.fft.fft(x1, power_of_2) / power_of_2
    x2_fft = np.fft.fft(x2, power_of_2)
    y = np.fft.ifft(np.conj(x1_fft) * x2_fft, power_of_2)
    best_delay = 0
    max_correlation = 0.0
    for i in range(-search_range, 0):
        h = abs(y[i + power_of_2]) / normalization
        if h > max_correlation:
            max_correlation = h
            best_delay = i
    for i in range(0, search_range):
        h = abs(y[i]) / normalization
        if h > max_correlation:
            max_correlation = h
            best_delay = i
    return best_delay - 1, max_correlation


def _psychoacoustic_model(ref_data, ref_Nsamples, deg_data, deg_Nsamples,
                          st, G):
    """ref: pesq.m:785-1456. `st` is the alignment result (Utt_* arrays)."""
    Nutterances = st.nutt
    Utt_Start = st.utt_start    # 1-indexed (index 0 unused)
    Utt_End = st.utt_end
    Utt_Delay = st.utt_delay
    D = G.Downsample
    Fs_pad = G.pad

    maxNsamples = max(ref_Nsamples, deg_Nsamples)
    Nf = D * 8

    Whanning = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(Nf) / Nf))

    D_POW_F, D_POW_S, D_POW_T = 2, 6, 2
    A_POW_F, A_POW_S, A_POW_T = 1, 6, 2
    D_WEIGHT, A_WEIGHT = 0.1, 0.0309

    CRITERIUM_FOR_SILENCE_OF_5_SAMPLES = 500
    samples_to_skip_at_start = 0
    sum_of_5_samples = 0.0
    while (sum_of_5_samples < CRITERIUM_FOR_SILENCE_OF_5_SAMPLES
           and samples_to_skip_at_start < maxNsamples / 2):
        lo = samples_to_skip_at_start + SEARCHBUFFER * D + 1
        sum_of_5_samples = float(np.sum(np.abs(ref_data[lo - 1:lo + 4])))
        if sum_of_5_samples < CRITERIUM_FOR_SILENCE_OF_5_SAMPLES:
            samples_to_skip_at_start += 1

    samples_to_skip_at_end = 0
    sum_of_5_samples = 0.0
    while (sum_of_5_samples < CRITERIUM_FOR_SILENCE_OF_5_SAMPLES
           and samples_to_skip_at_end < maxNsamples / 2):
        hi = (maxNsamples - SEARCHBUFFER * D + Fs_pad
              - samples_to_skip_at_end)
        sum_of_5_samples = float(np.sum(np.abs(ref_data[hi - 5:hi])))
        if sum_of_5_samples < CRITERIUM_FOR_SILENCE_OF_5_SAMPLES:
            samples_to_skip_at_end += 1

    start_frame = samples_to_skip_at_start // (Nf // 2)
    stop_frame = ((maxNsamples - 2 * SEARCHBUFFER * D + Fs_pad
                   - samples_to_skip_at_end) // (Nf // 2)) - 1

    Nb = G.Nb
    frame_is_bad = np.zeros(stop_frame + 1, bool)
    smeared_frame_is_bad = np.zeros(stop_frame + 1, bool)
    silent = np.zeros(stop_frame + 1, bool)
    pitch_pow_dens_ref = np.zeros((stop_frame + 1, Nb))
    pitch_pow_dens_deg = np.zeros((stop_frame + 1, Nb))
    frame_disturbance = np.zeros(stop_frame + 1)
    frame_disturbance_asym_add = np.zeros(stop_frame + 1)
    time_weight = np.zeros(stop_frame + 1)
    total_power_ref = np.zeros(stop_frame + 1)
    there_is_a_bad_frame = False

    for frame in range(0, stop_frame + 1):
        start_sample_ref = 1 + SEARCHBUFFER * D + frame * (Nf // 2)
        hz_spectrum_ref = _short_term_fft(Nf, ref_data, Whanning,
                                          start_sample_ref)

        utt = Nutterances
        while utt >= 1 and (Utt_Start[utt] - 1) * D + 1 > start_sample_ref:
            utt -= 1
        delay = Utt_Delay[utt] if utt >= 1 else Utt_Delay[1]
        start_sample_deg = start_sample_ref + delay

        if (start_sample_deg > 0
                and start_sample_deg + Nf - 1 < maxNsamples + Fs_pad):
            hz_spectrum_deg = _short_term_fft(Nf, deg_data, Whanning,
                                              start_sample_deg)
        else:
            hz_spectrum_deg = np.zeros(Nf // 2)

        pitch_pow_dens_ref[frame, :] = _freq_warping(hz_spectrum_ref, Nb, G)
        pitch_pow_dens_deg[frame, :] = _freq_warping(hz_spectrum_deg, Nb, G)

        total_audible_pow_ref = _total_audible(frame, pitch_pow_dens_ref,
                                               1e2, G)
        silent[frame] = total_audible_pow_ref < 1e7

    total_number_of_frames = ((maxNsamples - 2 * SEARCHBUFFER * D + Fs_pad)
                              // (Nf // 2)) - 1
    avg_ref = _time_avg_audible_of(stop_frame + 1, silent,
                                   pitch_pow_dens_ref,
                                   total_number_of_frames, G)
    avg_deg = _time_avg_audible_of(stop_frame + 1, silent,
                                   pitch_pow_dens_deg,
                                   total_number_of_frames, G)
    pitch_pow_dens_ref = _freq_resp_compensation(
        stop_frame + 1, pitch_pow_dens_ref, avg_ref, avg_deg, 1000.0, G)

    MAX_SCALE, MIN_SCALE = 5.0, 3e-4
    oldScale = 1.0
    THRESHOLD_BAD_FRAMES = 30
    for frame in range(0, stop_frame + 1):
        total_audible_pow_ref = _total_audible(frame, pitch_pow_dens_ref, 1, G)
        total_audible_pow_deg = _total_audible(frame, pitch_pow_dens_deg, 1, G)
        total_power_ref[frame] = total_audible_pow_ref

        scale = (total_audible_pow_ref + 5e3) / (total_audible_pow_deg + 5e3)
        if frame > 0:
            scale = 0.2 * oldScale + 0.8 * scale
        oldScale = scale
        if scale > MAX_SCALE:
            scale = MAX_SCALE
        elif scale < MIN_SCALE:
            scale = MIN_SCALE
        pitch_pow_dens_deg[frame, :] = pitch_pow_dens_deg[frame, :] * scale

        loudness_dens_ref = _intensity_warping_of(frame, pitch_pow_dens_ref, G)
        loudness_dens_deg = _intensity_warping_of(frame, pitch_pow_dens_deg, G)
        disturbance_dens = loudness_dens_deg - loudness_dens_ref

        deadzone = np.zeros(Nb)
        for band in range(1, Nb + 1):
            deadzone[band - 1] = 0.25 * min(loudness_dens_deg[band - 1],
                                            loudness_dens_ref[band - 1])
        for band in range(1, Nb + 1):
            d = disturbance_dens[band - 1]
            m = deadzone[band - 1]
            if d > m:
                disturbance_dens[band - 1] -= m
            elif d < -m:
                disturbance_dens[band - 1] += m
            else:
                disturbance_dens[band - 1] = 0.0

        frame_disturbance[frame] = _pseudo_Lp(disturbance_dens, D_POW_F, G)
        if frame_disturbance[frame] > THRESHOLD_BAD_FRAMES:
            there_is_a_bad_frame = True
        disturbance_dens = _multiply_with_asymmetry_factor(
            disturbance_dens, frame, pitch_pow_dens_ref, pitch_pow_dens_deg, G)
        frame_disturbance_asym_add[frame] = _pseudo_Lp(disturbance_dens,
                                                       A_POW_F, G)

    for utt in range(2, Nutterances + 1):
        frame1 = int(math.floor(((Utt_Start[utt] - 1 - SEARCHBUFFER) * D + 1
                                 + Utt_Delay[utt]) / (Nf // 2)))
        j = int(math.floor(math.floor(
            (Utt_End[utt - 1] - 1 - SEARCHBUFFER) * D + 1
            + Utt_Delay[utt - 1]) / (Nf // 2)))
        delay_jump = Utt_Delay[utt] - Utt_Delay[utt - 1]
        if frame1 > j:
            frame1 = j
        if frame1 < 0:
            frame1 = 0
        if delay_jump < -(Nf // 2):
            frame2 = int(math.floor(
                ((Utt_Start[utt] - 1 - SEARCHBUFFER) * D + 1
                 + max(0, abs(delay_jump))) / (Nf // 2))) + 1
            for frame in range(frame1, frame2 + 1):
                if frame < stop_frame:
                    frame_disturbance[frame] = 0.0
                    frame_disturbance_asym_add[frame] = 0.0

    nn = Fs_pad + maxNsamples
    tweaked_deg = np.zeros(nn)
    for i in range(SEARCHBUFFER * D + 1, nn - SEARCHBUFFER * D + 1):
        utt = Nutterances
        while utt >= 1 and (Utt_Start[utt] - 1) * D > i:
            utt -= 1
        delay = Utt_Delay[utt] if utt >= 1 else Utt_Delay[1]
        j = i + delay
        if j < SEARCHBUFFER * D + 1:
            j = SEARCHBUFFER * D + 1
        if j > nn - SEARCHBUFFER * D:
            j = nn - SEARCHBUFFER * D
        tweaked_deg[i - 1] = deg_data[j - 1]

    if there_is_a_bad_frame:
        MAX_BAD = 1000
        start_frame_of_bad_interval = np.zeros(MAX_BAD, np.int64)
        stop_frame_of_bad_interval = np.zeros(MAX_BAD, np.int64)
        start_sample_of_bad_interval = np.zeros(MAX_BAD, np.int64)
        stop_sample_of_bad_interval = np.zeros(MAX_BAD, np.int64)
        number_of_samples_in_bad_interval = np.zeros(MAX_BAD, np.int64)
        delay_in_samples_in_bad_interval = np.zeros(MAX_BAD, np.int64)

        for frame in range(0, stop_frame + 1):
            frame_is_bad[frame] = frame_disturbance[frame] > THRESHOLD_BAD_FRAMES
            smeared_frame_is_bad[frame] = False
        frame_is_bad[0] = False
        SMEAR_RANGE = 2
        for frame in range(SMEAR_RANGE, stop_frame - SMEAR_RANGE):
            max_itself_and_left = frame_is_bad[frame]
            max_itself_and_right = frame_is_bad[frame]
            for i in range(-SMEAR_RANGE, 1):
                if max_itself_and_left < frame_is_bad[frame + i]:
                    max_itself_and_left = frame_is_bad[frame + i]
            for i in range(0, SMEAR_RANGE + 1):
                if max_itself_and_right < frame_is_bad[frame + i]:
                    max_itself_and_right = frame_is_bad[frame + i]
            mini = max_itself_and_left
            if mini > max_itself_and_right:
                mini = max_itself_and_right
            smeared_frame_is_bad[frame] = mini

        MINIMUM_NUMBER_OF_BAD_FRAMES_IN_BAD_INTERVAL = 5
        number_of_bad_intervals = 0
        frame = 0
        while frame <= stop_frame:
            while frame <= stop_frame and not smeared_frame_is_bad[frame]:
                frame += 1
            if frame <= stop_frame:
                start_frame_of_bad_interval[number_of_bad_intervals] = 1 + frame
                while frame <= stop_frame and smeared_frame_is_bad[frame]:
                    frame += 1
                if frame <= stop_frame:
                    stop_frame_of_bad_interval[number_of_bad_intervals] = 1 + frame
                    if (stop_frame_of_bad_interval[number_of_bad_intervals]
                            - start_frame_of_bad_interval[number_of_bad_intervals]
                            >= MINIMUM_NUMBER_OF_BAD_FRAMES_IN_BAD_INTERVAL):
                        number_of_bad_intervals += 1

        for bad_interval in range(number_of_bad_intervals):
            start_sample_of_bad_interval[bad_interval] = (
                (start_frame_of_bad_interval[bad_interval] - 1) * (Nf // 2)
                + SEARCHBUFFER * D + 1)
            stop_sample_of_bad_interval[bad_interval] = (
                (stop_frame_of_bad_interval[bad_interval] - 1) * (Nf // 2)
                + Nf + SEARCHBUFFER * D)
            if stop_frame_of_bad_interval[bad_interval] > stop_frame + 1:
                stop_frame_of_bad_interval[bad_interval] = stop_frame + 1
            number_of_samples_in_bad_interval[bad_interval] = (
                stop_sample_of_bad_interval[bad_interval]
                - start_sample_of_bad_interval[bad_interval] + 1)

        SEARCH_RANGE_IN_TRANSFORM_LENGTH = 4
        search_range_in_samples = SEARCH_RANGE_IN_TRANSFORM_LENGTH * Nf

        for bad_interval in range(number_of_bad_intervals):
            nsamp = int(number_of_samples_in_bad_interval[bad_interval])
            ref = np.zeros(2 * search_range_in_samples + nsamp)
            deg = np.zeros(2 * search_range_in_samples + nsamp)
            s0 = int(start_sample_of_bad_interval[bad_interval])
            ref[search_range_in_samples:search_range_in_samples + nsamp] = \
                ref_data[s0:s0 + nsamp]
            for i in range(2 * search_range_in_samples + nsamp):
                j = s0 - search_range_in_samples + i
                nn2 = maxNsamples - SEARCHBUFFER * D + Fs_pad
                if j <= SEARCHBUFFER * D:
                    j = SEARCHBUFFER * D + 1
                if j > nn2:
                    j = nn2
                deg[i] = tweaked_deg[j - 1]
            delay_in_samples, best_correlation = _compute_delay(
                1, 2 * search_range_in_samples + nsamp,
                search_range_in_samples, ref, deg)
            delay_in_samples_in_bad_interval[bad_interval] = delay_in_samples
            if best_correlation < 0.5:
                delay_in_samples_in_bad_interval[bad_interval] = 0

        if number_of_bad_intervals > 0:
            doubly_tweaked_deg = np.array(tweaked_deg[:maxNsamples + Fs_pad])
            for bad_interval in range(number_of_bad_intervals):
                delay = int(delay_in_samples_in_bad_interval[bad_interval])
                for i in range(int(start_sample_of_bad_interval[bad_interval]),
                               int(stop_sample_of_bad_interval[bad_interval]) + 1):
                    j = i + delay
                    if j < 1:
                        j = 1
                    if j > maxNsamples:
                        j = maxNsamples
                    doubly_tweaked_deg[i - 1] = tweaked_deg[j - 1]

            untweaked_deg = deg_data
            deg_data = doubly_tweaked_deg

            for bad_interval in range(number_of_bad_intervals):
                for msframe in range(
                        int(start_frame_of_bad_interval[bad_interval]),
                        int(stop_frame_of_bad_interval[bad_interval])):
                    frame = msframe - 1
                    start_sample_ref = SEARCHBUFFER * D + frame * Nf // 2 + 1
                    start_sample_deg = start_sample_ref
                    hz_spectrum_deg = _short_term_fft(
                        Nf, deg_data, Whanning, start_sample_deg)
                    pitch_pow_dens_deg[frame, :] = _freq_warping(
                        hz_spectrum_deg, Nb, G)

                oldScale = 1.0
                for msframe in range(
                        int(start_frame_of_bad_interval[bad_interval]),
                        int(stop_frame_of_bad_interval[bad_interval])):
                    frame = msframe - 1
                    total_audible_pow_ref = _total_audible(
                        frame, pitch_pow_dens_ref, 1, G)
                    total_audible_pow_deg = _total_audible(
                        frame, pitch_pow_dens_deg, 1, G)
                    scale = ((total_audible_pow_ref + 5e3)
                             / (total_audible_pow_deg + 5e3))
                    if frame > 0:
                        scale = 0.2 * oldScale + 0.8 * scale
                    oldScale = scale
                    if scale > MAX_SCALE:
                        scale = MAX_SCALE
                    if scale < MIN_SCALE:
                        scale = MIN_SCALE
                    pitch_pow_dens_deg[frame, :] = (
                        pitch_pow_dens_deg[frame, :] * scale)
                    loudness_dens_ref = _intensity_warping_of(
                        frame, pitch_pow_dens_ref, G)
                    loudness_dens_deg = _intensity_warping_of(
                        frame, pitch_pow_dens_deg, G)
                    disturbance_dens = loudness_dens_deg - loudness_dens_ref
                    deadzone = np.zeros(Nb)
                    for band in range(1, Nb + 1):
                        deadzone[band - 1] = 0.25 * min(
                            loudness_dens_deg[band - 1],
                            loudness_dens_ref[band - 1])
                    for band in range(1, Nb + 1):
                        d = disturbance_dens[band - 1]
                        m = deadzone[band - 1]
                        if d > m:
                            disturbance_dens[band - 1] -= m
                        elif d < -m:
                            disturbance_dens[band - 1] += m
                        else:
                            disturbance_dens[band - 1] = 0.0
                    frame_disturbance[frame] = min(
                        frame_disturbance[frame],
                        _pseudo_Lp(disturbance_dens, D_POW_F, G))
                    disturbance_dens = _multiply_with_asymmetry_factor(
                        disturbance_dens, frame,
                        pitch_pow_dens_ref, pitch_pow_dens_deg, G)
                    frame_disturbance_asym_add[frame] = min(
                        frame_disturbance_asym_add[frame],
                        _pseudo_Lp(disturbance_dens, A_POW_F, G))
            deg_data = untweaked_deg

    for frame in range(0, stop_frame + 1):
        h = 1.0
        if stop_frame + 1 > 1000:
            n = ((maxNsamples - 2 * SEARCHBUFFER * D) // (Nf // 2)) - 1
            timeWeightFactor = (n - 1000) / 5500.0
            if timeWeightFactor > 0.5:
                timeWeightFactor = 0.5
            h = (1.0 - timeWeightFactor) + timeWeightFactor * frame / n
        time_weight[frame] = h

    for frame in range(0, stop_frame + 1):
        h = ((total_power_ref[frame] + 1e5) / 1e7) ** 0.04
        frame_disturbance[frame] /= h
        frame_disturbance_asym_add[frame] /= h
        if frame_disturbance[frame] > 45:
            frame_disturbance[frame] = 45
        if frame_disturbance_asym_add[frame] > 45:
            frame_disturbance_asym_add[frame] = 45

    d_indicator = _Lpq_weight(start_frame, stop_frame, D_POW_S, D_POW_T,
                              frame_disturbance,
                              time_weight[start_frame:])
    a_indicator = _Lpq_weight(start_frame, stop_frame, A_POW_S, A_POW_T,
                              frame_disturbance_asym_add,
                              time_weight[start_frame:])
    return 4.5 - D_WEIGHT * d_indicator - A_WEIGHT * a_indicator


def pesq_m(ref, deg, fs, mode="nb"):
    """Oracle PESQ following pesq.m's top-level flow (ref: pesq.m:53-216),
    with the production wrapper's input conventions (float/int16 inputs,
    resampling to the assessment rate) so it is call-compatible with
    deepxi_tpu.metrics.pesq.pesq for differential testing."""
    assert mode in ("nb", "nb-lqo", "wb")
    target_fs = 16000 if mode == "wb" else (fs if fs in (8000, 16000) else 8000)

    def prep(x):
        x = np.asarray(x, np.float64)
        if x.dtype.kind != "f" or np.max(np.abs(x)) > 4.0:
            x = x / 32768.0
        if fs != target_fs:
            g = math.gcd(fs, target_fs)
            x = resample_poly(x, target_fs // g, fs // g)
        return x * 32768.0   # ref: pesq.m:70,76

    G = _Globals(target_fs)
    D = G.Downsample

    ref_data = prep(ref)
    ref_Nsamples = len(ref_data) + 2 * SEARCHBUFFER * D
    ref_data = np.concatenate([np.zeros(SEARCHBUFFER * D), ref_data,
                               np.zeros(G.pad + SEARCHBUFFER * D)])
    deg_data = prep(deg)
    deg_Nsamples = len(deg_data) + 2 * SEARCHBUFFER * D
    deg_data = np.concatenate([np.zeros(SEARCHBUFFER * D), deg_data,
                               np.zeros(G.pad + SEARCHBUFFER * D)])
    maxNsamples = max(ref_Nsamples, deg_Nsamples)

    ref_data = _fix_power_level(ref_data, ref_Nsamples, maxNsamples, G)
    deg_data = _fix_power_level(deg_data, deg_Nsamples, maxNsamples, G)

    if mode == "wb":
        ref_data = sosfilt(G.wb_sos, ref_data)
        deg_data = sosfilt(G.wb_sos, deg_data)
    else:
        ref_data = _apply_filter(ref_data, ref_Nsamples, _IRS_FILTER_DB, G)
        deg_data = _apply_filter(deg_data, deg_Nsamples, _IRS_FILTER_DB, G)

    model_ref = ref_data
    model_deg = deg_data

    # alignment (shared stage -- see module docstring)
    cfg = _AlignCfg(G)
    align_r = A.input_filter_iir(A.dc_block(ref_data, ref_Nsamples, cfg), cfg)
    align_d = A.input_filter_iir(A.dc_block(deg_data, deg_Nsamples, cfg), cfg)
    vad_r, logvad_r = A.apply_vad(align_r, ref_Nsamples, cfg)
    vad_d, logvad_d = A.apply_vad(align_d, deg_Nsamples, cfg)
    st = A.AlignState()
    A.crude_align(st, logvad_r, ref_Nsamples, logvad_d, deg_Nsamples,
                  A.WHOLE_SIGNAL, cfg)
    A.utterance_locate(st, align_r, ref_Nsamples, vad_r, logvad_r,
                       align_d, deg_Nsamples, vad_d, logvad_d, cfg)

    ref_data = model_ref
    deg_data = model_deg
    newlen = maxNsamples + G.pad
    if len(ref_data) < newlen:
        ref_data = np.concatenate([ref_data, np.zeros(newlen - len(ref_data))])
    if len(deg_data) < newlen:
        deg_data = np.concatenate([deg_data, np.zeros(newlen - len(deg_data))])

    pesq_mos = _psychoacoustic_model(ref_data[:newlen], ref_Nsamples,
                                     deg_data[:newlen], deg_Nsamples, st, G)

    if mode == "nb":
        return float(pesq_mos)
    if mode == "nb-lqo":
        return float(0.999 + (4.999 - 0.999)
                     / (1.0 + math.exp(-1.4945 * pesq_mos + 4.6607)))
    return float(0.999 + (4.999 - 0.999)
                 / (1.0 + math.exp(-1.3669 * pesq_mos + 3.8224)))


class _AlignCfg:
    """Adapter exposing the _pesq_align config surface from _Globals."""

    def __init__(self, G):
        sfx = "8k" if G.Fs == 8000 else "16k"
        self.fs = G.Fs
        self.downsample = G.Downsample
        self.align_nfft = int(getattr(T, f"Align_Nfft_{sfx}"))
        self.in_sos = G.in_sos
        self.sb = SEARCHBUFFER * G.Downsample
        self.pad = G.pad
        self.Nf = G.Downsample * 8
