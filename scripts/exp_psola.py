#!/usr/bin/env python
"""Praat-style change-gender via resample + TD-PSOLA — NEGATIVE result.

Praat's 'Change gender' (the reference's timbre perturbation,
src/information_encoder/utils.py:211-258) is resample-by-1/r (formants
and pitch scale by r, duration by 1/r) followed by PSOLA pitch/duration
restoration. This prototypes that exact pipeline Praat-free: FFT
autocorrelation f0 track → waveform-peak epoch marks → 2-period Hann
grain overlap-add with window-sum normalization.

MEASURED (synthetic shifted-formant vowel harness, identical to
tests/test_information_encoder.py::test_mel_spectral_distance_to_ideal_shift):

    mel-spectral distance to the ideal target, dB (lower = better)
    case                          shift   psola   envelope-warp
    f0=110 F=(700,1220)           1.25     1.41    2.21
    f0=110 F=(700,1220)           1.40     1.78    2.72
    f0=110 F=(700,1220)           0.80     2.39    1.40
    f0=210 F=(850,1610)           1.25     2.26    1.76
    f0=210 F=(850,1610)           1.40     3.82    2.17
    f0=210 F=(850,1610)           0.80     5.34    1.82
    f0=120 F=(390,1990)           1.25     1.47    2.75
    f0=120 F=(390,1990)           1.40     1.97    2.75
    f0=120 F=(390,1990)           0.80     3.15    1.67
    f0=180 F=(450,1000,2400)      1.25     3.84    3.87
    f0=180 F=(450,1000,2400)      1.40     3.07    2.81
    f0=180 F=(450,1000,2400)      0.80     3.81    2.51
    mean / worst                          2.86/5.34   2.37/3.87

PSOLA preserves pitch exactly (f0 unchanged to 0.1 Hz) and wins clearly
at upward shifts with low f0, but pitch-raising restoration (shift<1 →
resample lowers f0 → PSOLA raises it back, overlapping grains at hop<P)
smears the spectrum and loses to the source-filter envelope warp there
and at high f0 — worse on BOTH mean and worst-case. The envelope warp
(train/information_encoder._formant_shift_dsp) also preserves pitch
trivially (original phase kept), so it stays the production DSP path;
this script is the recorded experiment.
"""
import numpy as np
from fractions import Fraction
from scipy.signal import resample_poly, lfilter


def vowel(sr, dur=0.6, f0=120.0, formants=(700.0, 1220.0), bw=80.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(sr * dur)
    t = np.arange(n) / sr
    # glottal pulse train with slight jitter
    src = np.zeros(n)
    pos = 0.0
    while pos < n:
        src[int(pos)] = 1.0
        pos += sr / f0
    src = src + rng.normal(size=n) * 1e-4
    out = np.zeros(n)
    for F in formants:
        r = np.exp(-np.pi * bw / sr)
        a = [1.0, -2 * r * np.cos(2 * np.pi * F / sr), r * r]
        out = out + lfilter([1.0], a, src)
    return (out / np.abs(out).max() * 0.5).astype(np.float32)


def track_f0(y, sr, floor=50.0, ceil=800.0, frame_s=0.04, hop_s=0.01):
    frame = int(sr * frame_s)
    hop = int(sr * hop_s)
    lag_min = max(int(sr / ceil), 2)
    lag_max = min(int(sr / floor), frame - 2)
    nfft = 1 << int(np.ceil(np.log2(2 * frame)))
    f0 = []
    n = len(y)
    for start in range(0, max(n - frame + 1, 1), hop):
        seg = y[start : start + frame]
        if len(seg) < frame:
            seg = np.pad(seg, (0, frame - len(seg)))
        seg = seg - seg.mean()
        e = float(seg @ seg)
        if e < 1e-8:
            f0.append(0.0)
            continue
        sp = np.fft.rfft(seg, nfft)
        ac = np.fft.irfft(sp * np.conj(sp))[: lag_max + 1]
        ac = ac / (ac[0] + 1e-12)
        k = int(np.argmax(ac[lag_min:])) + lag_min
        f0.append(sr / k if ac[k] > 0.45 else 0.0)
    return np.array(f0), hop


def mark_epochs(y, sr, f0, hop):
    n = len(y)
    marks, voiced = [], []
    t = 0
    uv_hop = int(0.005 * sr)
    while t < n - 2:
        fk = f0[min(t // hop, len(f0) - 1)] if len(f0) else 0.0
        if fk > 0:
            P = int(sr / fk)
            lo = t + int(0.7 * P)
            hi = min(t + int(1.4 * P), n)
            if hi - lo < 2:
                break
            nxt = lo + int(np.argmax(y[lo:hi]))
            marks.append(nxt)
            voiced.append(True)
            t = nxt
        else:
            t += uv_hop
            if t >= n:
                break
            marks.append(t)
            voiced.append(False)
    return np.array(marks, np.int64), np.array(voiced, bool)


def psola(y, sr, marks, voiced, time_factor, pitch_factor, out_len):
    n = len(y)
    if len(marks) < 3:
        # degenerate: plain resample to target length
        fr = Fraction(out_len / n).limit_denominator(200)
        return resample_poly(y, fr.numerator, fr.denominator)[:out_len]
    out = np.zeros(out_len + int(0.05 * sr))
    wsum = np.zeros_like(out)
    # local periods per mark
    d = np.diff(marks)
    periods = np.concatenate([d[:1], np.minimum(d[:-1], d[1:]) if len(d) > 1 else d[:1], d[-1:]])
    periods = np.maximum(periods[: len(marks)], 8)
    o = float(marks[0]) * time_factor
    guard = 0
    while o < out_len and guard < 10 * out_len:
        guard += 1
        u = o / time_factor
        i = int(np.clip(np.searchsorted(marks, u), 0, len(marks) - 1))
        if i > 0 and abs(marks[i - 1] - u) < abs(marks[i] - u):
            i -= 1
        m = int(marks[i])
        P = int(periods[i])
        half = P
        lo_src = m - half
        g = np.zeros(2 * half)
        s0 = max(lo_src, 0)
        s1 = min(m + half, n)
        g[s0 - lo_src : s1 - lo_src] = y[s0:s1]
        win = np.hanning(2 * half)
        c = int(round(o))
        d0 = c - half
        g0 = max(d0, 0)
        g1 = min(c + half, len(out))
        out[g0:g1] += (g * win)[g0 - d0 : g1 - d0]
        wsum[g0:g1] += win[g0 - d0 : g1 - d0]
        step = P / pitch_factor if voiced[i] else P
        o += max(step, 4.0)
    out = out / np.maximum(wsum, 0.3)
    return out[:out_len]


def formant_shift_psola(wav, sr, shift):
    wav = np.asarray(wav, np.float64)
    L = len(wav)
    if abs(shift - 1.0) < 1e-3 or L < int(0.08 * sr):
        return wav.astype(np.float32)
    fr = Fraction(shift).limit_denominator(200)
    y1 = resample_poly(wav, fr.denominator, fr.numerator)
    actual = fr.numerator / fr.denominator
    f0, hop = track_f0(y1, sr)
    marks, voiced = mark_epochs(y1, sr, f0, hop)
    out = psola(y1, sr, marks, voiced, time_factor=L / len(y1),
                pitch_factor=1.0 / actual, out_len=L)
    return out.astype(np.float32)


# ---- evaluation: same harness as tests/test_information_encoder.py ----
def logmel(wav, sr=16000, n_mels=80):
    from scipy.signal import stft

    f, t, Z = stft(wav, fs=sr, nperseg=512, noverlap=384)
    p = np.abs(Z) ** 2

    def hz2mel(h):
        return 2595 * np.log10(1 + h / 700)

    def mel2hz(m):
        return 700 * (10 ** (m / 2595) - 1)

    hpts = mel2hz(np.linspace(hz2mel(0), hz2mel(sr / 2), n_mels + 2))
    bins = np.floor((512 + 1) * hpts / sr).astype(int)
    fb = np.zeros((n_mels, p.shape[0]))
    for i in range(n_mels):
        lo, c, hi = bins[i], bins[i + 1], bins[i + 2]
        c = max(c, lo + 1)
        hi = max(hi, c + 1)
        fb[i, lo:c] = (np.arange(lo, c) - lo) / (c - lo)
        fb[i, c:hi] = (hi - np.arange(c, hi)) / (hi - c)
    return 10 * np.log10(np.maximum(fb @ p, 1e-10))


def msd(a, b):
    n = min(a.shape[1], b.shape[1])
    return float(np.mean(np.abs(a[:, :n] - b[:, :n])))


def meas_f0(wav, sr):
    f0, _ = track_f0(np.asarray(wav, np.float64), sr)
    v = f0[f0 > 0]
    return float(np.median(v)) if len(v) else 0.0


if __name__ == "__main__":
    sr = 16000
    cases = [
        (110.0, (700.0, 1220.0)),
        (210.0, (850.0, 1610.0)),
        (120.0, (390.0, 1990.0)),
        (180.0, (450.0, 1000.0, 2400.0)),
    ]
    import sys
    sys.path.insert(0, "/root/repo")
    from interspeech_ser_tpu.train.information_encoder import _formant_shift_dsp

    worst_p, worst_e = 0.0, 0.0
    for f0v, F in cases:
        for shift in (1.25, 1.4, 1.0 / 1.25):
            w = vowel(sr, f0=f0v, formants=F)
            tgt = vowel(sr, f0=f0v, formants=tuple(x * shift for x in F))
            out_p = formant_shift_psola(w, sr, shift)
            out_e = _formant_shift_dsp(w.astype(np.float32), sr, shift)
            m_t = logmel(tgt)
            d_p = msd(logmel(out_p), m_t)
            d_e = msd(logmel(out_e), m_t)
            d_in = msd(logmel(w), m_t)
            pf_in, pf_out = meas_f0(w, sr), meas_f0(out_p, sr)
            worst_p = max(worst_p, d_p)
            worst_e = max(worst_e, d_e)
            print(f"f0={f0v:5.0f} F={F} shift={shift:5.3f}: "
                  f"psola {d_p:5.2f}  env {d_e:5.2f}  input {d_in:5.2f} dB   "
                  f"f0 {pf_in:6.1f}->{pf_out:6.1f}", flush=True)
    print(f"worst: psola {worst_p:.2f}  env {worst_e:.2f}")
    # unvoiced robustness
    rng = np.random.default_rng(0)
    noise = rng.normal(size=16000).astype(np.float32) * 0.1
    o = formant_shift_psola(noise, sr, 1.3)
    print("noise: finite:", np.isfinite(o).all(), "rms ratio:",
          float(np.sqrt((o**2).mean()) / np.sqrt((noise**2).mean())))
