"""Vocoder, sampling, utils and viz tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morgana_tpu import sampling, utils, vocoder, viz
from morgana_tpu.vocoder import world


class TestVocoder:
    def test_synthesize_basic(self):
        fs, frames, bins = 16000, 60, 129
        f0 = np.full(frames, 150.0)
        f0[40:] = 0.0  # unvoiced tail
        sp = np.full((frames, bins), 1e-4)
        ap = np.full((frames, bins), 0.1)
        wav = vocoder.synthesize(f0, sp, ap, fs)
        hop = int(fs * 5.0 / 1000)
        assert wav.shape == (frames * hop,)
        assert np.isfinite(wav).all()
        assert np.abs(wav).max() > 0

    def test_voiced_region_is_periodic(self):
        fs, frames, bins = 16000, 100, 129
        f0 = np.full(frames, 100.0)  # period = 160 samples
        sp = np.full((frames, bins), 1e-2)
        ap = np.full((frames, bins), 1e-3)  # nearly fully periodic
        wav = vocoder.synthesize(f0, sp, ap, fs)
        seg = wav[2000:6000]
        ac = np.correlate(seg, seg, mode='full')[len(seg) - 1:]
        period = fs // 100
        peak = np.argmax(ac[period - 12:period + 12]) + period - 12
        assert abs(peak - period) <= 5

    def test_mcep_spectrum_roundtrip(self, rng):
        frames, order, fft = 5, 24, 512
        mcep = 0.1 * rng.standard_normal((frames, order + 1))
        mcep[:, 0] = -2.0
        sp = world.mcep_to_spectrum(mcep, fft_size=fft, fs=16000)
        mcep2 = world.spectrum_to_mcep(sp, order=order, fs=16000)
        np.testing.assert_allclose(mcep2, mcep, atol=1e-3)

    def test_bap_to_aperiodicity_range(self, rng):
        bap = -np.abs(rng.standard_normal((4, 5)))
        ap = world.bap_to_aperiodicity(bap, fft_size=256)
        assert ap.shape == (4, 129)
        assert (ap > 0).all() and (ap <= 1.0).all()

    def test_bap_values_land_at_band_centres(self):
        """Band b's value must be applied at its band's CENTRE frequency —
        the same equal-width edge intervals analysis.band_aperiodicity
        measures over — not at linspace(0, nyquist, B) positions, which
        would warp the curve by up to half a band width per round trip."""
        num_bands, fft_size = 5, 256
        num_bins = fft_size // 2 + 1
        bap = np.full((1, num_bands), -10.0)
        bap[0, 2] = 0.0  # only the middle band is fully aperiodic
        ap = world.bap_to_aperiodicity(bap, fft_size=fft_size)
        centre = int(round((2 + 0.5) / num_bands * (num_bins - 1)))
        assert ap[0, centre] == pytest.approx(1.0)
        assert int(np.argmax(ap[0])) == centre
        # Edge bands extend their value to the spectrum edges.
        bap = np.full((1, num_bands), -10.0)
        bap[0, 0] = 0.0
        ap = world.bap_to_aperiodicity(bap, fft_size=fft_size)
        assert ap[0, 0] == pytest.approx(1.0)

    def test_synthesize_rejects_mismatched_f0(self, rng):
        """The native library trusts len(f0) == num_frames — the Python
        wrapper must reject the mismatch BEFORE the call (an OOB heap read
        otherwise; the numpy path raised a clean IndexError)."""
        sp = np.full((8, 129), 1e-3)
        ap = np.full((8, 129), 0.1)
        with pytest.raises(ValueError, match='f0 frames'):
            world.synthesize(np.full(2, 120.0), sp, ap, 16000)

    def test_synthesize_rejects_non_positive_hop(self):
        sp = np.full((8, 129), 1e-3)
        ap = np.full((8, 129), 0.1)
        with pytest.raises(ValueError, match='hop'):
            world.synthesize(np.full(8, 120.0), sp, ap, 16000,
                             frame_period=-0.5)

    def test_synthesize_world_feats(self, rng):
        frames = 40
        f0 = np.full(frames, 120.0)
        vuv = np.ones(frames)
        mcep = 0.05 * rng.standard_normal((frames, 20))
        mcep[:, 0] = -3.0
        bap = -2 + 0.1 * rng.standard_normal((frames, 5))
        wav = vocoder.synthesize_world_feats(f0, vuv, mcep, bap, 16000, fft_size=256)
        assert np.isfinite(wav).all() and wav.size == frames * 80


    def test_freqt_matmul_matches_recursion(self, rng):
        """The cached linear-map freqt (one GEMM per call) reproduces the
        Oppenheim recursion exactly (the transform is linear in the
        cepstrum)."""
        from morgana_tpu.vocoder import world
        for order_in, order_out, alpha in ((61, 512, -0.42), (513, 59, 0.42)):
            c = rng.normal(0, 0.1, (8, order_in))
            ref = world._freqt_recursion(c, order_out, alpha)
            got = world._freqt(c, order_out, alpha)
            np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-14)

    def test_smooth_f0(self):
        f0 = np.full(50, 100.0)
        f0[25] = 200.0  # outlier
        sm = vocoder.smooth_f0(f0)
        assert sm[25] < 150.0


class TestVocoderAnalysis:
    @pytest.fixture(scope='class')
    def synth_wav(self):
        fs, frames, bins = 16000, 160, 129
        f0 = np.full(frames, 150.0)
        f0[130:] = 0.0
        sp = np.full((frames, bins), 1e-3)
        ap = np.full((frames, bins), 0.05)
        return vocoder.synthesize(f0, sp, ap, fs), fs

    def test_f0_tracking_recovers_pitch(self, synth_wav):
        wav, fs = synth_wav
        f0, vuv = vocoder.estimate_f0(wav, fs)
        voiced = f0[10:120]
        voiced = voiced[voiced > 0]
        assert len(voiced) > 80
        assert abs(np.median(voiced) - 150.0) < 8.0

    def test_analyze_shapes_and_ranges(self, synth_wav):
        wav, fs = synth_wav
        f0, sp, ap = vocoder.analyze(wav, fs, fft_size=256)
        assert sp.shape == ap.shape == (len(f0), 129)
        assert np.isfinite(sp).all() and (sp > 0).all()
        assert (ap > 0).all() and (ap <= 1.0).all()

    def test_features_from_wav_roundtrip(self, synth_wav):
        wav, fs = synth_wav
        feats = vocoder.features_from_wav(wav, fs, fft_size=256, mcep_order=24)
        assert feats['mcep'].shape[1] == 25
        assert feats['bap'].shape[1] == 5
        assert feats['lf0'].shape == feats['vuv'].shape
        wav2 = vocoder.synthesize_world_feats(
            np.exp(feats['lf0'][:, 0]), feats['vuv'][:, 0],
            feats['mcep'], feats['bap'], fs, fft_size=256)
        assert np.isfinite(wav2).all() and np.abs(wav2).max() > 0


class TestSampling:
    def test_sphere_radius(self):
        centre = jnp.zeros(8)
        sampler = sampling.UniformSphereSurfaceSampler(centre, radius=3.0)
        pts = sampler.rsample((100,), key=jax.random.PRNGKey(0))
        radii = np.linalg.norm(np.asarray(pts), axis=-1)
        np.testing.assert_allclose(radii, 3.0, atol=1e-5)

    def test_sphere_offset_centre(self):
        centre = jnp.ones(4) * 2.0
        sampler = sampling.UniformSphereSurfaceSampler(centre, radius=1.0)
        pts = sampler.rsample((200,), key=jax.random.PRNGKey(1))
        radii = np.linalg.norm(np.asarray(pts) - 2.0, axis=-1)
        np.testing.assert_allclose(radii, 1.0, atol=1e-5)

    def test_ellipsoid_on_surface(self):
        radii = jnp.array([1.0, 2.0, 3.0])
        sampler = sampling.UniformEllipsoidSurfaceApproximateSampler(jnp.zeros(3), radii)
        pts = np.asarray(sampler.rsample((200,), key=jax.random.PRNGKey(2)))
        # On-ellipsoid: sum((x/r)^2) == 1.
        vals = ((pts / np.asarray(radii)) ** 2).sum(-1)
        np.testing.assert_allclose(vals, 1.0, atol=1e-5)


class TestUtils:
    def test_listify(self):
        assert utils.listify(3) == [3]
        assert utils.listify([3]) == [3]

    def test_epoch_from_checkpoint_path(self):
        assert utils.get_epoch_from_checkpoint_path('experiments/x/checkpoints/epoch_12.npz') == 12
        assert utils.get_epoch_from_checkpoint_path('a/checkpoints/epoch_5_ema.pt') == 5
        assert utils.get_epoch_from_checkpoint_path('nonsense') == 0

    def test_detach_batched_seqs(self, rng):
        x = jnp.array(rng.normal(size=(2, 5, 1)).astype(np.float32))
        out = utils.detach_batched_seqs(x, seq_len=np.array([5, 2]))
        assert isinstance(out, list) and out[0].shape == (5,) and out[1].shape == (2,)

    def test_map_nested(self):
        data = {'a': np.ones(2), 'b': [np.zeros(1), {'c': np.ones(3)}]}
        out = utils.map_nested(lambda x: x + 1, data)
        np.testing.assert_array_equal(out['a'], [2, 2])
        np.testing.assert_array_equal(out['b'][1]['c'], [2, 2, 2])

    def test_format_float_tensor(self):
        assert utils.format_float_tensor(1.23456) == '1.23'
        assert utils.format_float_tensor(np.array([1., 2., 3.])) == '[1, 2, 3]'
        s = utils.format_float_tensor(np.arange(10.))
        assert s.startswith('[0, 1') and '...' in s


class TestVizIO:
    def test_save_batched_seqs(self, tmp_path, rng):
        feats = {'lf0': jnp.array(rng.normal(size=(2, 6, 1)).astype(np.float32)),
                 'mcep': jnp.array(rng.normal(size=(2, 6, 4)).astype(np.float32))}
        viz.save_batched_seqs(feats, ['utt_a', 'utt_b'], str(tmp_path),
                              seq_len=np.array([6, 3]))
        a = np.load(tmp_path / 'feats' / 'mcep' / 'utt_b.npy')
        assert a.shape == (3, 4)
        assert os.path.isfile(tmp_path / 'feats' / 'lf0' / 'utt_a.npy')

    def test_save_batched_seqs_bare_array(self, tmp_path, rng):
        """A bare (batch, time, dim) array is ONE feature, not one feature
        per batch item (the star-splat used to save corrupt slices)."""
        arr = rng.normal(size=(2, 6, 4)).astype(np.float32)
        viz.save_batched_seqs(arr, ['utt_a', 'utt_b'], str(tmp_path),
                              seq_len=np.array([6, 3]), feat_names=['mcep'])
        a = np.load(tmp_path / 'feats' / 'mcep' / 'utt_a.npy')
        b = np.load(tmp_path / 'feats' / 'mcep' / 'utt_b.npy')
        assert a.shape == (6, 4) and b.shape == (3, 4)
        np.testing.assert_array_equal(b, arr[1, :3])

    def test_plot_experiment(self, tmp_path):
        from morgana_tpu.data import file_io
        base = tmp_path / 'experiments'
        for mode in ('train', 'valid'):
            for epoch, val in [(1, 1.0), (2, 0.5)]:
                file_io.save_json({'loss': val},
                                  str(base / 'exp1' / mode / f'epoch_{epoch}' / 'metrics.json'))
        res = viz.plotting.load_experiment_results('exp1', 'loss', 'train', str(base))
        assert list(res['loss'].items()) == [(1, 1.0), (2, 0.5)]
        viz.plotting.plot_experiment('exp1', ['loss'], str(base), save=True)
        assert os.path.isfile(base / 'exp1' / 'metrics.pdf')


class TestMiscAPI:
    def test_losses_module_import_path(self):
        import morgana_tpu.losses as L
        assert callable(L.mse) and callable(L.KLD_standard_normal)

    def test_infer_device(self):
        x = jnp.ones(3)
        dev = utils.infer_device(x)
        assert dev is not None
        assert utils.infer_device(np.ones(3)) is None

    def test_plot_experiment_set(self, tmp_path, monkeypatch):
        from morgana_tpu.data import file_io
        base = tmp_path / 'experiments'
        for exp in ('e1', 'e2'):
            for mode in ('train', 'valid'):
                for epoch, val in [(1, 1.0), (2, 0.5)]:
                    file_io.save_json({'loss': val},
                                      str(base / exp / mode / f'epoch_{epoch}' / 'metrics.json'))
        monkeypatch.chdir(tmp_path)
        viz.plotting.plot_experiment_set(['e1', 'e2'], ['loss'], str(base),
                                         file_name='cmp.pdf')
        assert os.path.isfile(tmp_path / 'plots' / 'cmp.pdf')
