"""WORLD-style synthesis and spectral conversions (host-side).

NumPy implementation with an optional C++ fast path (``csrc/world_synth.cpp``
via ctypes). The synthesis model matches WORLD's structure: the spectral
envelope is split into a periodic part ``sp * (1 - ap)`` excited by a glottal
pulse train at f0, and an aperiodic part ``sp * ap`` excited by white noise;
both are filtered with the minimum-phase reconstruction of the envelope and
overlap-added.

Replaces ``pyworld.synthesize`` (reference ``models/f0_test_model.py:136``)
and ``tts_data_tools.wav_gen.world_with_reaper_f0.synthesis``
(``models/RNN_SPSS.py:160``).
"""
import ctypes
import os

import numpy as np
from scipy.signal import savgol_filter

__all__ = [
    'synthesize', 'synthesize_world_feats', 'smooth_f0',
    'mcep_to_spectrum', 'spectrum_to_mcep', 'bap_to_aperiodicity',
    'native_available',
]

_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    lib_path = os.path.join(os.path.dirname(__file__), 'libworld_synth.so')
    source = os.path.join(os.path.dirname(__file__), 'csrc', 'world_synth.cpp')
    from morgana_tpu._build import load_library
    # ABI 2 = seed argument before out/out_capacity; load_library falls back
    # to None (NumPy path) on a stale library rather than calling it with
    # shifted pointer arguments.
    lib = load_library(lib_path, source, 'morgana_world_synth_abi', 2)
    if lib is not None:
        try:
            lib.world_synthesize.restype = ctypes.c_longlong
            lib.world_synthesize.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # f0 (T)
                ctypes.POINTER(ctypes.c_double),  # sp (T*K)
                ctypes.POINTER(ctypes.c_double),  # ap (T*K)
                ctypes.c_longlong,                # T
                ctypes.c_longlong,                # K
                ctypes.c_longlong,                # fs
                ctypes.c_double,                  # frame_period ms
                ctypes.c_longlong,                # noise seed
                ctypes.POINTER(ctypes.c_double),  # out wav
                ctypes.c_longlong,                # out capacity
            ]
            _LIB = lib
        except (AttributeError, OSError):
            _LIB = None
    return _LIB


def native_available():
    return _load_native() is not None


def smooth_f0(f0, window_length=7, polyorder=1):
    """Savitzky-Golay smoothing of an f0 track (reference post-processing,
    ``models/f0_test_model.py:128``)."""
    f0 = np.asarray(f0, np.float64)
    if f0.shape[0] < window_length:
        return f0
    return savgol_filter(f0, window_length, polyorder)


# ---------------------------------------------------------------------------
# Mel-cepstrum <-> spectrum
# ---------------------------------------------------------------------------

def _freqt(c, order_out, alpha):
    """Frequency transform of a (batched) cepstrum: warping by ``alpha``
    (the standard Oppenheim recursion, vectorised over frames)."""
    c = np.atleast_2d(np.asarray(c, np.float64))
    num_frames, order_in = c.shape
    out = np.zeros((num_frames, order_out + 1))
    for i in range(order_in - 1, -1, -1):
        prev = out
        out = np.zeros_like(prev)
        out[:, 0] = c[:, i] + alpha * prev[:, 0]
        if order_out >= 1:
            out[:, 1] = (1 - alpha ** 2) * prev[:, 0] + alpha * prev[:, 1]
        for m in range(2, order_out + 1):
            out[:, m] = prev[:, m - 1] + alpha * (prev[:, m] - out[:, m - 1])
    return out


def default_alpha(fs):
    """Common all-pass warping constants per sample rate."""
    if fs >= 48000:
        return 0.77
    if fs >= 44100:
        return 0.76
    if fs >= 22050:
        return 0.58
    return 0.42  # 16 kHz


def mcep_to_spectrum(mcep, fft_size=1024, alpha=None, fs=16000):
    """Mel-cepstrum (T, M+1) -> power spectral envelope (T, fft_size//2 + 1)."""
    if alpha is None:
        alpha = default_alpha(fs)
    mcep = np.atleast_2d(np.asarray(mcep, np.float64))
    # Unwarp to a linear-frequency cepstrum, then exponentiate its Fourier
    # transform: log|H(w)| = c0 + 2 sum_m c_m cos(m w).
    c_lin = _freqt(mcep, fft_size // 2, -alpha)
    buf = np.zeros((c_lin.shape[0], fft_size))
    buf[:, :fft_size // 2 + 1] = c_lin
    buf[:, fft_size // 2 + 1:] = c_lin[:, 1:fft_size // 2][:, ::-1]
    log_sp = np.fft.rfft(buf, axis=-1).real
    # log amplitude -> power
    return np.exp(2.0 * log_sp)


def spectrum_to_mcep(sp, order=59, alpha=None, fs=16000):
    """Power spectral envelope -> mel-cepstrum (least-squares-free cepstral
    method: log, IFFT, warp). Used for data prep and round-trip tests."""
    if alpha is None:
        alpha = default_alpha(fs)
    sp = np.atleast_2d(np.asarray(sp, np.float64))
    fft_size = (sp.shape[-1] - 1) * 2
    log_amp = 0.5 * np.log(np.maximum(sp, 1e-100))
    # log_amp is the half spectrum of a real, even signal: irfft gives the
    # symmetric real cepstrum; keep the one-sided part (cos-series convention
    # matching mcep_to_spectrum).
    cep = np.fft.irfft(log_amp, n=fft_size, axis=-1)[:, :fft_size // 2 + 1]
    return _freqt(cep, order, alpha)


def bap_to_aperiodicity(bap, fft_size=1024, fs=16000):
    """Band aperiodicity (T, B), log-amplitude per band -> per-bin
    aperiodicity in (0, 1]: linear interpolation of the band values across
    frequency, then exp. Band centres are spaced evenly up to Nyquist."""
    bap = np.atleast_2d(np.asarray(bap, np.float64))
    num_bins = fft_size // 2 + 1
    num_bands = bap.shape[-1]
    band_pos = np.linspace(0, num_bins - 1, num_bands)
    bins = np.arange(num_bins)
    ap = np.empty((bap.shape[0], num_bins))
    for t in range(bap.shape[0]):
        ap[t] = np.interp(bins, band_pos, bap[t])
    return np.clip(np.exp(ap), 1e-16, 1.0)


# ---------------------------------------------------------------------------
# Synthesis
# ---------------------------------------------------------------------------

def _minimum_phase_spectra(power_sp):
    """Batched minimum-phase complex spectra from power envelopes (T, K)."""
    fft_size = (power_sp.shape[-1] - 1) * 2
    log_amp = 0.5 * np.log(np.maximum(power_sp, 1e-100))
    cep = np.fft.irfft(log_amp, n=fft_size, axis=-1)
    # Fold anticausal part onto causal part (minimum phase).
    cep[:, 1:fft_size // 2] *= 2.0
    cep[:, fft_size // 2 + 1:] = 0.0
    return np.exp(np.fft.rfft(cep, axis=-1))


def synthesize(f0, sp, ap, fs, frame_period=5.0, seed=0):
    r"""Synthesises a waveform from WORLD-style frame features.

    Parameters
    ----------
    f0 : np.ndarray (T,) — fundamental frequency per frame, 0 = unvoiced.
    sp : np.ndarray (T, K) — power spectral envelope (K = fft/2 + 1).
    ap : np.ndarray (T, K) — per-bin aperiodicity in [0, 1].
    fs : int — sample rate.
    frame_period : float — frame hop in milliseconds.

    Returns
    -------
    np.ndarray, float64 waveform of length ``T * hop``.
    """
    f0 = np.asarray(f0, np.float64).reshape(-1)
    sp = np.atleast_2d(np.asarray(sp, np.float64))
    ap = np.atleast_2d(np.asarray(ap, np.float64))
    num_frames, num_bins = sp.shape
    ap = np.broadcast_to(ap, (num_frames, num_bins))
    hop = int(fs * frame_period / 1000.0)
    num_samples = num_frames * hop

    lib = _load_native()
    if lib is not None:
        out = np.zeros(num_samples + 2 * (num_bins - 1) * 2, np.float64)
        f0_c = np.ascontiguousarray(f0)
        sp_c = np.ascontiguousarray(sp)
        ap_c = np.ascontiguousarray(ap)
        n = lib.world_synthesize(
            f0_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            sp_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ap_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            num_frames, num_bins, fs, float(frame_period), int(seed),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), out.shape[0])
        if n >= 0:
            return out[:num_samples]
        # fall through to numpy on native error

    return _synthesize_numpy(f0, sp, ap, fs, hop, seed)


def _synthesize_numpy(f0, sp, ap, fs, hop, seed=0):
    num_frames, num_bins = sp.shape
    fft_size = (num_bins - 1) * 2
    num_samples = num_frames * hop
    rng = np.random.default_rng(seed)

    # Per-frame minimum-phase filters for the periodic and aperiodic parts.
    h_per = _minimum_phase_spectra(sp * np.maximum(1.0 - ap ** 2, 1e-12))
    h_apr = _minimum_phase_spectra(sp * np.maximum(ap ** 2, 1e-12))

    # Sample-level excitation: glottal pulse train by phase accumulation.
    f0_per_sample = np.repeat(f0, hop)[:num_samples]
    voiced = f0_per_sample > 0
    phase = np.cumsum(np.where(voiced, f0_per_sample / fs, 0.0))
    pulse_pos = np.nonzero(np.diff(np.floor(phase), prepend=0.0) > 0)[0]
    periodic_exc = np.zeros(num_samples)
    if pulse_pos.size:
        # Energy normalisation: each pulse carries sqrt(T0 * fs).
        amp = np.sqrt(np.maximum(fs / np.maximum(f0_per_sample[pulse_pos], 1.0), 1.0))
        periodic_exc[pulse_pos] = amp
    # Unvoiced regions get pure-noise excitation (the aperiodicity there is
    # ~1, routing nearly all energy through the noise filter anyway).
    noise_exc = rng.standard_normal(num_samples)
    periodic_exc[~voiced] = 0.0

    # Frame both excitations (window length = fft_size), filter, overlap-add.
    win_len = min(fft_size, 4 * hop)
    window = np.hanning(win_len)
    # Normalise OLA gain for this hop/window combination.
    ola_gain = np.sum(window[::hop]) if hop < win_len else 1.0

    out = np.zeros(num_samples + fft_size)
    pad_exc_p = np.concatenate([periodic_exc, np.zeros(fft_size)])
    pad_exc_n = np.concatenate([noise_exc, np.zeros(fft_size)])

    starts = np.arange(num_frames) * hop
    frames_p = np.stack([pad_exc_p[s:s + win_len] for s in starts]) * window
    frames_n = np.stack([pad_exc_n[s:s + win_len] for s in starts]) * window

    spec_p = np.fft.rfft(frames_p, n=fft_size, axis=-1) * h_per
    spec_n = np.fft.rfft(frames_n, n=fft_size, axis=-1) * h_apr
    filt = np.fft.irfft(spec_p + spec_n, n=fft_size, axis=-1)

    for i, s in enumerate(starts):
        out[s:s + fft_size] += filt[i]

    out = out[:num_samples] / max(ola_gain, 1e-12)
    peak = np.max(np.abs(out))
    if peak > 1e-12:
        out = out / max(1.0, peak / 0.9)  # protect against clipping only
    return out


def synthesize_world_feats(f0, vuv, mcep, bap, sample_rate, frame_period=5.0,
                           fft_size=1024):
    r"""Synthesis from model-space features (reference:
    ``world_with_reaper_f0.synthesis(f0, vuv, mcep, bap, sr)``,
    ``models/RNN_SPSS.py:160``)."""
    f0 = np.asarray(f0, np.float64).reshape(-1)
    vuv = np.asarray(vuv).reshape(-1)
    sp = mcep_to_spectrum(mcep, fft_size=fft_size, fs=sample_rate)
    ap = bap_to_aperiodicity(bap, fft_size=fft_size, fs=sample_rate)
    num_frames = min(len(f0), len(vuv), sp.shape[0], ap.shape[0])
    f0 = np.where(vuv[:num_frames] > 0.5, f0[:num_frames], 0.0)
    return synthesize(f0, sp[:num_frames], ap[:num_frames], sample_rate,
                      frame_period=frame_period)
