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

    def test_pad_collate_matches_numpy(self, rng):
        items = [rng.normal(size=(n, 3)).astype(np.float32) for n in (4, 9, 1)]
        out = native_io.pad_collate([np.ascontiguousarray(i) for i in items], 16)
        assert out.shape == (3, 16, 3)
        for i, a in enumerate(items):
            np.testing.assert_array_equal(out[i, :a.shape[0]], a)
            np.testing.assert_array_equal(out[i, a.shape[0]:], 0)


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
