"""On-device (jax) WORLD synthesis vs the float64 host implementation.

Same algorithm, two backends: with the NOISE SIGNAL shared, the jax path
must reproduce the host path's waveform to float32 tolerance (pulse train,
min-phase filters, OLA — everything except dtype). Batched synthesis must
match per-utterance synthesis and silence the padding region.
"""
import numpy as np
import pytest

from morgana_tpu.vocoder import analysis, jax_world, world


FS = 16000
HOP = 80  # 5 ms


def _vowel_features(num_frames, f0_hz=140.0, vibrato=0.0, seed=0,
                    order=59, bands=5):
    """Model-space features of a formant-structured vowel."""
    rng = np.random.default_rng(seed)
    t = np.arange(num_frames)
    f0 = f0_hz + vibrato * np.sin(2 * np.pi * t / 40.0)
    vuv = np.ones(num_frames)
    # A smooth spectral envelope with two formant bumps.
    bins = np.linspace(0, FS / 2, 513)
    env = (0.6 * np.exp(-0.5 * ((bins - 700) / 180.0) ** 2)
           + 0.4 * np.exp(-0.5 * ((bins - 1800) / 260.0) ** 2) + 1e-3)
    sp = np.tile((env ** 2)[None, :], (num_frames, 1))
    sp *= (1.0 + 0.05 * rng.standard_normal((num_frames, 1)))
    mcep = world.spectrum_to_mcep(sp, order=order, fs=FS)
    bap = np.full((num_frames, bands), -8.0)  # strongly periodic
    return f0, vuv, mcep, bap


class TestHostParity:
    """With the noise shared, the only f32-vs-f64 difference the algorithm
    cannot hide is sub-sample jitter of a few glottal pulses near frame
    boundaries (float32 phase anchors) — energy, filters, OLA and every
    unvoiced sample must match to float32 precision outright."""

    def test_unvoiced_path_matches_host_bit_for_float32(self):
        # No pulses: isolates the filter + windowing + OLA math exactly.
        T = 100
        _, _, mcep, bap = _vowel_features(T)
        f0 = np.zeros(T)
        sp = world.mcep_to_spectrum(mcep, fs=FS)
        ap = np.ones((T, sp.shape[1]))  # fully aperiodic
        noise = np.random.default_rng(3).standard_normal(T * HOP)
        host = world._synthesize_numpy(f0, sp, ap, FS, HOP, seed=3)
        dev = np.asarray(jax_world.synthesize_jax(f0, sp, ap, FS,
                                                  noise=noise))
        rel = np.linalg.norm(dev - host) / np.linalg.norm(host)
        assert rel < 1e-3, rel

    def test_voiced_parity_up_to_pulse_jitter(self):
        f0, vuv, mcep, bap = _vowel_features(120, vibrato=8.0)
        sp = world.mcep_to_spectrum(mcep, fs=FS)
        ap = world.bap_to_aperiodicity(bap, fs=FS)
        f0v = np.where(vuv > 0.5, f0, 0.0)
        noise = np.random.default_rng(3).standard_normal(120 * HOP)

        host = world._synthesize_numpy(f0v, sp, ap, FS, HOP, seed=3)
        dev = np.asarray(jax_world.synthesize_jax(
            f0v, sp, ap, FS, noise=noise))
        assert dev.shape == host.shape
        # Energy and peak match to f32 precision (pulse jitter preserves
        # both); overall alignment within the jitter bound.
        assert abs(np.sqrt((dev ** 2).mean()) / np.sqrt((host ** 2).mean())
                   - 1.0) < 1e-4
        assert abs(np.abs(dev).max() / np.abs(host).max() - 1.0) < 1e-4
        assert np.corrcoef(host, dev)[0, 1] > 0.99
        # Spectral envelopes agree (insensitive to sub-sample pulse shifts).
        H = np.abs(np.fft.rfft(host))
        D = np.abs(np.fft.rfft(dev))
        k = np.ones(64) / 64.0
        Hs, Ds = np.convolve(H, k, 'same'), np.convolve(D, k, 'same')
        # Normalised by the envelope PEAK: near-Nyquist bins hold ~0.1% of
        # the energy and a 1-sample pulse shift flips their phase, so a
        # pointwise relative bound there measures jitter, not fidelity.
        assert np.max(np.abs(Ds - Hs)) / np.max(Hs) < 0.05

    def test_model_space_entry_matches_host(self):
        f0, vuv, mcep, bap = _vowel_features(100)
        noise = np.random.default_rng(7).standard_normal(100 * HOP)
        host = world._synthesize_numpy(
            np.where(vuv > 0.5, f0, 0.0),
            world.mcep_to_spectrum(mcep, fs=FS),
            world.bap_to_aperiodicity(bap, fs=FS), FS, HOP, seed=7)
        dev = np.asarray(jax_world.synthesize_world_feats_jax(
            f0, vuv, mcep, bap, FS, noise=noise))
        assert abs(np.sqrt((dev ** 2).mean()) / np.sqrt((host ** 2).mean())
                   - 1.0) < 1e-4
        assert np.corrcoef(host, dev)[0, 1] > 0.99

    def test_unvoiced_regions_are_noise_only(self):
        f0, vuv, mcep, bap = _vowel_features(80)
        vuv[40:] = 0.0
        wav = np.asarray(jax_world.synthesize_world_feats_jax(
            f0, vuv, mcep, bap, FS, key=__import__('jax').random.PRNGKey(1)))
        assert np.isfinite(wav).all()
        assert np.abs(wav).max() <= 0.9 + 1e-5


class TestAnalysisRoundTrip:
    def test_f0_tracks_through_jax_synthesis(self):
        f0, vuv, mcep, bap = _vowel_features(140, f0_hz=150.0)
        wav = np.asarray(jax_world.synthesize_world_feats_jax(
            f0, vuv, mcep, bap, FS))
        feats = analysis.features_from_wav(np.asarray(wav, np.float64), FS)
        voiced = feats['vuv'][:, 0] > 0.5
        assert voiced.mean() > 0.6
        f0_est = np.exp(feats['lf0'][voiced, 0])
        err = np.sqrt(np.mean((f0_est - 150.0) ** 2))
        assert err < 3.0, err


class TestBatched:
    def test_batch_matches_single_and_silences_padding(self):
        lens = [90, 60]
        T = 96
        per_utt = [_vowel_features(l, f0_hz=130.0 + 30 * i, seed=i)
                   for i, l in enumerate(lens)]
        f0 = np.zeros((2, T))
        vuv = np.zeros((2, T))
        mcep = np.zeros((2, T, 60))
        bap = np.zeros((2, T, 5))
        for i, (l, (f, v, m, b)) in enumerate(zip(lens, per_utt)):
            f0[i, :l], vuv[i, :l] = f, v
            mcep[i, :l], bap[i, :l] = m, b
        noise = np.random.default_rng(5).standard_normal((2, T * HOP))

        waves, wave_lens = jax_world.synthesize_batch(
            f0, vuv, mcep, bap, np.array(lens), FS, noise=noise)
        waves = np.asarray(waves)
        assert waves.shape == (2, T * HOP)
        np.testing.assert_array_equal(np.asarray(wave_lens),
                                      np.array(lens) * HOP)

        for i, l in enumerate(lens):
            f, v, m, b = per_utt[i]
            # Single-utterance synthesis AT the same padded length with the
            # same noise and an explicit mask == the batched row.
            single = np.asarray(jax_world.synthesize_batch(
                f0[i:i + 1], vuv[i:i + 1], mcep[i:i + 1], bap[i:i + 1],
                np.array([l]), FS, noise=noise[i:i + 1])[0])[0]
            np.testing.assert_allclose(waves[i], single, atol=1e-5, rtol=1e-4)
            # Padding region is silent (filters of padded frames masked).
            tail = waves[i, (l + 3) * HOP:]
            assert np.abs(tail).max() < 1e-4, np.abs(tail).max()

    def test_batch_program_is_cached(self):
        before = len(jax_world._BATCH_FNS)
        f0, vuv, mcep, bap = _vowel_features(40)
        args = (f0[None], vuv[None], mcep[None], bap[None],
                np.array([40]), FS)
        jax_world.synthesize_batch(*args)
        jax_world.synthesize_batch(*args)
        assert len(jax_world._BATCH_FNS) == before + 1
