"""Tests for the remaining data sources and the native IO library."""
import os

import numpy as np
import pytest

from morgana_tpu.data import file_io, native_io
from morgana_tpu.data.sources import (
    NumpyBinarySource, TextSource, StringSource, ASCIISource, WavSource,
    SyntheticSource,
)


@pytest.fixture()
def utt_dir(tmp_path, rng):
    d = tmp_path / 'data'
    (d / 'mcep').mkdir(parents=True)
    (d / 'dur').mkdir()
    (d / 'text').mkdir()
    (d / 'chars').mkdir()
    (d / 'wav').mkdir()
    np.save(d / 'mcep' / 'utt1.npy', rng.normal(size=(12, 5)).astype(np.float32))
    (d / 'dur' / 'utt1.txt').write_text('3\n4\n2\n')
    (d / 'text' / 'utt1.txt').write_text('hello world\n')
    (d / 'chars' / 'utt1.txt').write_text('abc')
    wav = (np.sin(np.linspace(0, 60, 800)) * 0.4).astype(np.float32)
    file_io.save_wav(wav, str(d / 'wav' / 'utt1.wav'), sample_rate=16000)
    return str(d)


class TestSources:
    def test_numpy_binary_with_deltas(self, utt_dir):
        src = NumpyBinarySource('mcep', use_deltas=True)
        out = src('utt1', utt_dir)
        assert out['mcep'].shape == (12, 5)
        assert out['mcep_deltas'].shape == (12, 15)
        np.testing.assert_allclose(out['mcep_deltas'][:, :5], out['mcep'])

    def test_text_source(self, utt_dir):
        src = TextSource('dur')
        out = src('utt1', utt_dir)
        np.testing.assert_array_equal(out['dur'], [[3.], [4.], [2.]])

    def test_text_source_sentence_level(self, utt_dir):
        src = TextSource('dur', sentence_level=True)
        out = src('utt1', utt_dir)
        # Multi-value sentence-level features flatten to a vector.
        assert out['dur'].shape == (3,)

    def test_string_source(self, utt_dir):
        out = StringSource('text')('utt1', utt_dir)
        assert out['text'] == 'hello world'

    def test_ascii_source(self, utt_dir):
        out = ASCIISource('chars')('utt1', utt_dir)
        np.testing.assert_array_equal(out['chars'][:, 0], [97, 98, 99])

    def test_wav_source(self, utt_dir):
        out = WavSource('wav')('utt1', utt_dir)
        assert out['wav'].shape == (800, 1)
        assert np.abs(out['wav']).max() <= 1.0

    def test_synthetic_source_deterministic(self):
        src = SyntheticSource('feat', feat_dim=4)
        a = src('utt1', '.')['feat']
        b = src('utt1', '.')['feat']
        np.testing.assert_array_equal(a, b)
        c = src('utt2', '.')['feat']
        assert a.shape != c.shape or not np.array_equal(a, c)

    def test_synthetic_source_stable_across_processes(self):
        """Seeds must not depend on Python's per-process randomised str hash
        (PYTHONHASHSEED), or 'deterministic' features differ between runs,
        hosts, and any normalisation params fitted in an earlier process."""
        import subprocess
        import sys
        code = ("from morgana_tpu.data.sources import SyntheticSource;"
                "import numpy as np;"
                "print(float(SyntheticSource('feat', feat_dim=4)"
                "('utt1', '.')['feat'].sum()))")
        sums = []
        for hashseed in ('1', '2'):
            env = dict(os.environ, PYTHONHASHSEED=hashseed,
                       JAX_PLATFORMS='cpu')
            proc = subprocess.run([sys.executable, '-c', code], env=env,
                                  capture_output=True, text=True, timeout=120)
            assert proc.returncode == 0, proc.stderr[-500:]
            sums.append(float(proc.stdout.strip().splitlines()[-1]))
        assert sums[0] == sums[1]


class TestNativeIO:
    def test_native_available(self):
        # The shared library is built in-tree; if missing the numpy fallback
        # must still satisfy the contract below.
        _ = native_io.native_available()

    def test_load_npy_batch(self, tmp_path, rng):
        paths, items = [], []
        for i in range(5):
            a = rng.normal(size=(int(rng.integers(3, 20)), 6)).astype(np.float32)
            p = str(tmp_path / f'{i}.npy')
            np.save(p, a)
            paths.append(p)
            items.append(a)
        out, lens = native_io.load_npy_batch(paths)
        assert out.shape == (5, max(a.shape[0] for a in items), 6)
        for i, a in enumerate(items):
            assert lens[i] == a.shape[0]
            np.testing.assert_array_equal(out[i, :a.shape[0]], a)
            np.testing.assert_array_equal(out[i, a.shape[0]:], 0)

    def test_3d_npy_rejected_not_misread(self, tmp_path, rng):
        """A (T, A, B) file must error, not be silently read as (T, A): the
        native header parser refuses ndim > 2 (falling back to np.load,
        which then fails the 2-d pad) instead of truncating the data."""
        good = rng.normal(size=(8, 4)).astype(np.float32)
        bad = rng.normal(size=(8, 4, 3)).astype(np.float32)
        p_good, p_bad = str(tmp_path / 'g.npy'), str(tmp_path / 'b.npy')
        np.save(p_good, good)
        np.save(p_bad, bad)
        with pytest.raises(ValueError):
            native_io.load_npy_batch([p_good, p_bad])

    def test_pad_collate_matches_numpy(self, rng):
        items = [rng.normal(size=(n, 3)).astype(np.float32) for n in (4, 9, 1)]
        out = native_io.pad_collate([np.ascontiguousarray(i) for i in items], 16)
        assert out.shape == (3, 16, 3)
        for i, a in enumerate(items):
            np.testing.assert_array_equal(out[i, :a.shape[0]], a)
            np.testing.assert_array_equal(out[i, a.shape[0]:], 0)


class TestPreloadBatch:
    """Native batch preloading must be invisible: identical items to the
    per-file path, through both FilesDataset and the DataLoader."""

    @pytest.fixture()
    def voice(self, tmp_path, rng):
        d = tmp_path / 'data' / 'train'
        for feat, dim in (('mcep', 5), ('lf0', 1)):
            (d / feat).mkdir(parents=True)
        ids = [f'utt_{i}' for i in range(6)]
        for i, utt in enumerate(ids):
            n = 10 + 3 * i
            np.save(d / 'mcep' / f'{utt}.npy', rng.normal(size=(n, 5)).astype(np.float32))
            np.save(d / 'lf0' / f'{utt}.npy', rng.normal(size=(n, 1)).astype(np.float32))
        (d / 'ids.scp').write_text('\n'.join(ids) + '\n')
        return str(tmp_path / 'data')

    def _dataset(self, voice):
        from morgana_tpu.data.dataset import FilesDataset
        sources = {'mcep': NumpyBinarySource('mcep'),
                   'lf0': NumpyBinarySource('lf0', use_deltas=True)}
        return FilesDataset(sources, 'train', 'train/ids.scp', {}, voice)

    def test_preload_matches_per_item(self, voice):
        ds = self._dataset(voice)
        idxs = [0, 3, 5]
        preloaded = ds.preload_batch(idxs)
        if native_io.native_available():
            assert set(preloaded) == {'mcep', 'lf0'}
        for j, i in enumerate(idxs):
            fast = ds.build_item(i, {k: v[j] for k, v in preloaded.items()})
            slow = ds[i]
            assert set(fast) == set(slow)
            for key in slow:
                if isinstance(slow[key], np.ndarray):
                    np.testing.assert_array_equal(fast[key], slow[key])
                else:
                    assert fast[key] == slow[key]

    @pytest.mark.parametrize('threads', [0, 2])
    def test_loader_uses_preload(self, voice, threads):
        from morgana_tpu.data.loader import DataLoader
        ds = self._dataset(voice)
        loader = DataLoader(ds, batch_size=3, shuffle=False,
                            num_data_threads=threads)
        batches = list(loader)
        assert len(batches) == 2
        ref = [ds[i] for i in range(3)]
        max_len = max(r['mcep'].shape[0] for r in ref)
        from morgana_tpu.data.dataset import bucket_size
        assert batches[0]['mcep'].shape == (3, bucket_size(max_len), 5)
        np.testing.assert_array_equal(
            batches[0]['lf0_deltas'][1, :ref[1]['lf0'].shape[0]],
            ref[1]['lf0_deltas'])


class TestFitDurations:
    def test_pad_and_trim_exact(self):
        from morgana_tpu.data.prepare import fit_durations
        np.testing.assert_array_equal(
            fit_durations([10, 10, 10], 35), [10, 10, 15])   # pad last
        np.testing.assert_array_equal(
            fit_durations([10, 10, 10], 25), [10, 10, 5])    # trim last
        # Excess beyond the last phone trims backwards, each phone >= 1.
        out = fit_durations([10, 10, 10], 15)
        assert out.sum() == 15 and (out >= 1).all()
        out = fit_durations([10, 10, 10], 3)
        np.testing.assert_array_equal(out, [1, 1, 1])
        with pytest.raises(ValueError, match='more phones'):
            fit_durations([10, 10, 10], 2)


class TestPrepareVoice:
    def test_prepare_from_wavs(self, tmp_path, rng):
        from morgana_tpu import vocoder
        from morgana_tpu.data.prepare import prepare_voice
        from morgana_tpu.data import FilesDataset, MeanVarianceNormaliser
        from morgana_tpu.data.sources import NumpyBinarySource, TextSource

        fs, bins = 16000, 129
        wav_dir = tmp_path / 'wavs'
        wav_dir.mkdir()
        for i in range(5):
            frames = int(rng.integers(60, 120))
            f0 = np.full(frames, 120.0 + 20 * i)
            sp = np.full((frames, bins), 1e-3)
            ap = np.full((frames, bins), 0.1)
            wav = vocoder.synthesize(f0, sp, ap, fs)
            file_io.save_wav(wav, str(wav_dir / f'utt{i}.wav'), sample_rate=fs)

        out = tmp_path / 'data'
        id_lists = prepare_voice(str(wav_dir), str(out), fft_size=256,
                                 mcep_order=24, seed=0)
        assert sum(len(v) for v in id_lists.values()) == 5
        assert len(id_lists['train']) >= 3

        # Dataset loads the prepared features with normalisation.
        sources = {
            'n_frames': TextSource('n_frames', sentence_level=True),
            'counters': NumpyBinarySource('counters'),
            'lf0': NumpyBinarySource('lf0', use_deltas=True),
            'vuv': NumpyBinarySource('vuv'),
        }
        normalisers = {'lf0': MeanVarianceNormaliser('lf0', use_deltas=True)}
        for norm in normalisers.values():
            norm.load_params('train', str(out))
        ds = FilesDataset(sources, 'train', 'train/train_file_id_list.scp',
                          normalisers, str(out))
        item = ds[0]
        assert item['counters'].shape[1] == 9
        assert 'normalised_lf0_deltas' in item
        assert item['lf0'].shape[0] == int(item['n_frames'])


class TestSyntheticConsistency:
    def test_lengths_agree_across_features(self):
        """All sources of one utterance (same seq_len_range) must agree on
        its frame count — per-feature lengths would misalign frame-level
        streams that models concatenate."""
        a = SyntheticSource('lf0', feat_dim=1)('utt1', '.')['lf0']
        b = SyntheticSource('mcep', feat_dim=60)('utt1', '.')['mcep']
        n = SyntheticSource('n_frames', feat_dim=1,
                            sentence_level=True)('utt1', '.')['n_frames']
        assert a.shape[0] == b.shape[0] == int(np.asarray(n).reshape(-1)[0])

    def test_speakers_need_train_coverage(self, tmp_path):
        """Every listed speaker needs a train utterance to fit per-speaker
        normalisation params; otherwise loading fails far downstream."""
        from morgana_tpu.data.synthetic import generate_voice_data
        with pytest.raises(ValueError, match='speakers'):
            generate_voice_data(str(tmp_path / 'v'), num_train=2,
                                num_valid=1, num_test=1,
                                speakers=['a', 'b', 'c'])
