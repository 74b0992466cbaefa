"""Objective vocoder fidelity harness.

The reference synthesised through the real WORLD/REAPER C++ toolchain
(``/root/reference/models/f0_test_model.py:110-137``,
``models/RNN_SPSS.py:141-161``); this repo's vocoder is a self-contained
rebuild, so its quality is *asserted*, not assumed:

* f0 tracking error on synthetic signals of exactly known f0 (steady tones
  across the range, vibrato, noise robustness, unvoiced rejection),
* an analyze -> synthesize -> re-analyze round trip with thresholds on
  voiced-f0 RMSE, lf0 RMSE, mel-cepstral distortion and V/UV agreement.

Measured values (2026-08, also recorded in BASELINE.md) sit well inside the
asserted bounds: steady-tone RMSE ~0.2 Hz, vibrato ~0.5 Hz, round-trip
f0 ~2.1 Hz / lf0 ~0.014 / MCD ~2.7 dB / V/UV agreement ~0.99.
"""
import numpy as np
import pytest

from morgana_tpu.vocoder import analysis, world

FS = 16000
HOP = int(FS * 5.0 / 1000)


def harmonic_signal(f0_hz, dur=1.0, n_harmonics=8, fs=FS, seed=0, noise=0.0):
    """A harmonic complex with exactly known (possibly time-varying) f0."""
    t = np.arange(int(dur * fs)) / fs
    rng = np.random.default_rng(seed)
    if np.isscalar(f0_hz):
        phase = 2 * np.pi * float(f0_hz) * t
    else:
        phase = 2 * np.pi * np.cumsum(f0_hz) / fs
    wav = sum((1.0 / k) * np.sin(k * phase + rng.uniform(0, 2 * np.pi))
              for k in range(1, n_harmonics + 1))
    wav = 0.3 * wav / np.abs(wav).max()
    if noise:
        wav = wav + noise * rng.standard_normal(len(wav))
    return wav.astype(np.float64)


def _core(x):
    """Drops edge frames (half-window zero padding makes them ill-defined)."""
    return x[5:-5]


class TestF0Tracking:
    @pytest.mark.parametrize('f0_true', [80.0, 120.0, 180.0, 240.0, 320.0])
    def test_steady_tone_under_1hz(self, f0_true):
        f0, vuv = analysis.estimate_f0(harmonic_signal(f0_true), FS)
        voiced = _core(vuv > 0.5)
        assert voiced.mean() > 0.95
        rmse = np.sqrt(np.mean((_core(f0)[voiced] - f0_true) ** 2))
        assert rmse < 1.0, f'{f0_true} Hz tone tracked with {rmse:.2f} Hz RMSE'

    def test_vibrato_under_2hz(self):
        t = np.arange(FS) / FS
        track = 150 + 30 * np.sin(2 * np.pi * 3 * t)
        f0, vuv = analysis.estimate_f0(harmonic_signal(track), FS)
        true = track[::HOP][:len(f0)]
        voiced = _core(vuv > 0.5)
        assert voiced.mean() > 0.95
        rmse = np.sqrt(np.mean((_core(f0)[voiced] - _core(true)[voiced]) ** 2))
        assert rmse < 2.0, f'vibrato tracked with {rmse:.2f} Hz RMSE'

    def test_noisy_tone_under_5hz(self):
        """The VERDICT bound: < 5 Hz voiced RMSE, here under 20 dB SNR."""
        f0_true = 140.0
        wav = harmonic_signal(f0_true, noise=0.03)
        f0, vuv = analysis.estimate_f0(wav, FS)
        voiced = _core(vuv > 0.5)
        assert voiced.mean() > 0.9
        rmse = np.sqrt(np.mean((_core(f0)[voiced] - f0_true) ** 2))
        assert rmse < 5.0, f'noisy tone tracked with {rmse:.2f} Hz RMSE'

    def test_noise_rejected_as_unvoiced(self):
        rng = np.random.default_rng(0)
        _, vuv = analysis.estimate_f0(0.1 * rng.standard_normal(FS // 2), FS)
        assert (vuv > 0.5).mean() < 0.05

    def test_silence_rejected_as_unvoiced(self):
        _, vuv = analysis.estimate_f0(np.zeros(FS // 2), FS)
        assert (vuv > 0.5).mean() == 0.0

    def test_voiced_unvoiced_boundaries(self):
        """Alternating tone/silence: voicing decision localises the segments."""
        seg = FS // 4
        tone = harmonic_signal(160.0, dur=0.25)
        wav = np.concatenate([np.zeros(seg), tone, np.zeros(seg), tone])
        f0, vuv = analysis.estimate_f0(wav, FS)
        frames_per_seg = seg // HOP
        # Interior of each segment is classified correctly (edges are free).
        for s, expect in ((0, 0), (1, 1), (2, 0), (3, 1)):
            interior = vuv[s * frames_per_seg + 4:(s + 1) * frames_per_seg - 4]
            assert (np.mean(interior > 0.5) > 0.9) == bool(expect)


class TestRoundTrip:
    """analyze -> synthesize -> re-analyze on a known-f0 harmonic signal."""

    @pytest.fixture(scope='class')
    def round_trip(self):
        t = np.arange(FS) / FS
        track = 150 + 30 * np.sin(2 * np.pi * 3 * t)
        wav = harmonic_signal(track)
        first = analysis.features_from_wav(wav, FS)
        wav2 = world.synthesize_world_feats(
            np.exp(first['lf0'][:, 0]), first['vuv'][:, 0],
            first['mcep'], first['bap'], FS)
        second = analysis.features_from_wav(np.asarray(wav2), FS)
        n = min(len(first['lf0']), len(second['lf0']))
        return first, second, n

    def test_f0_preserved(self, round_trip):
        first, second, n = round_trip
        both = (first['vuv'][:n, 0] > 0.5) & (second['vuv'][:n, 0] > 0.5)
        assert both.mean() > 0.9
        f0_a = np.exp(first['lf0'][:n, 0][both])
        f0_b = np.exp(second['lf0'][:n, 0][both])
        assert np.sqrt(np.mean((f0_a - f0_b) ** 2)) < 4.0          # Hz
        lf0_rmse = np.sqrt(np.mean(
            (first['lf0'][:n, 0][both] - second['lf0'][:n, 0][both]) ** 2))
        assert lf0_rmse < 0.03

    def test_envelope_preserved(self, round_trip):
        first, second, n = round_trip
        diff = first['mcep'][:n, 1:] - second['mcep'][:n, 1:]
        mcd = np.mean(np.sqrt(np.sum(diff ** 2, axis=1))
                      * (10.0 / np.log(10)) * np.sqrt(2.0))
        assert mcd < 4.0, f'round-trip mel-cepstral distortion {mcd:.2f} dB'

    def test_voicing_preserved(self, round_trip):
        first, second, n = round_trip
        agree = (first['vuv'][:n, 0].round() == second['vuv'][:n, 0].round())
        assert agree.mean() > 0.95

    def test_synthesis_energy_sane(self, round_trip):
        """Synthesised audio is neither silent nor clipped."""
        first, _, _ = round_trip
        wav = np.asarray(world.synthesize_world_feats(
            np.exp(first['lf0'][:, 0]), first['vuv'][:, 0],
            first['mcep'], first['bap'], FS))
        assert np.abs(wav).max() <= 1.0
        assert np.sqrt(np.mean(wav ** 2)) > 1e-3
