"""Data pipeline tests: sources, normalisers (JSON param contract), dataset
feature dict, bucketed collate, loader iteration and prefetch."""
import os

import numpy as np
import pytest

from morgana_tpu import data
from morgana_tpu.data import file_io
from morgana_tpu.data.dataset import bucket_size


class TestFileIO:
    def test_json_roundtrip(self, tmp_path):
        path = str(tmp_path / 'params.json')
        file_io.save_json({'mean': [1.0, 2.0]}, path)
        assert file_io.load_json(path) == {'mean': [1.0, 2.0]}

    def test_wav_roundtrip(self, tmp_path):
        path = str(tmp_path / 'test.wav')
        wav = (np.sin(np.linspace(0, 100, 1600)) * 0.5).astype(np.float32)
        file_io.save_wav(wav, path, sample_rate=16000)
        loaded, sr = file_io.load_wav(path)
        assert sr == 16000
        np.testing.assert_allclose(loaded / 32767.0, wav, atol=1e-4)

    def test_full_scale_int16_roundtrip_exact(self, tmp_path):
        """2^15 scaling: int16 -> float -> int16 is bit-exact, including
        full-scale -32768 (a 32767 divisor put it at -1.000031 and a later
        save clipped it)."""
        path = str(tmp_path / 'full.wav')
        pcm = np.array([-32768, -1, 0, 1, 32767], np.int16)
        file_io.save_wav(pcm.astype(np.float32) / 32768.0, path)
        loaded, _ = file_io.load_wav(path)
        np.testing.assert_array_equal(loaded, pcm)

    def test_get_file_ids(self, tmp_path):
        path = str(tmp_path / 'ids.scp')
        file_io.save_lines(['a', ' b ', '', 'c'], path)
        assert file_io.get_file_ids(path) == ['a', 'b', 'c']

    def test_save_wav_int16_scale_float_not_rescaled(self, tmp_path):
        """A float signal already at int16 scale (wide range, small positive
        peak) must be clipped only — re-scaling by 32767 would wrap in the
        int16 cast and write full-scale garbage."""
        path = str(tmp_path / 'wide.wav')
        wav = np.array([-30000.0, -2.0, 1.2], np.float32)
        file_io.save_wav(wav, path)
        loaded, _ = file_io.load_wav(path)
        np.testing.assert_array_equal(loaded, np.array([-30000, -2, 1], np.int16))

    def test_load_wav_rejects_non_pcm16(self, tmp_path):
        """IEEE-float / non-16-bit wavs must error, not silently decode the
        byte stream as int16 noise."""
        import struct
        path = str(tmp_path / 'float.wav')
        data = np.zeros(16, np.float32).tobytes()
        with open(path, 'wb') as f:
            f.write(b'RIFF' + struct.pack('<I', 36 + len(data)) + b'WAVEfmt ')
            f.write(struct.pack('<IHHIIHH', 16, 3, 1, 16000, 64000, 4, 32))
            f.write(b'data' + struct.pack('<I', len(data)) + data)
        with pytest.raises(ValueError, match='16-bit PCM'):
            file_io.load_wav(path)


class TestNormalisers:
    def test_mvn_roundtrip(self, tmp_path, rng):
        x = rng.normal(loc=3., scale=2., size=(50, 4)).astype(np.float32)
        norm = data.MeanVarianceNormaliser('feat')
        norm.save_params(data.fit_mvn_params([x]), '.', str(tmp_path))
        norm.load_params('.', str(tmp_path))

        normalised = norm.normalise(x)
        assert abs(normalised.mean()) < 0.1 and abs(normalised.std() - 1) < 0.1
        np.testing.assert_allclose(norm.denormalise(normalised), x, atol=1e-4)
        # JSON file name contract: {name}_mvn.json.
        assert os.path.exists(tmp_path / 'feat_mvn.json')

    def test_minmax_roundtrip(self, tmp_path, rng):
        x = rng.random((50, 4)).astype(np.float32) * 7 - 3
        norm = data.MinMaxNormaliser('feat')
        norm.save_params(data.fit_minmax_params([x]), '.', str(tmp_path))
        norm.load_params('.', str(tmp_path))

        normalised = norm.normalise(x)
        assert normalised.min() >= -1e-6 and normalised.max() <= 1 + 1e-6
        np.testing.assert_allclose(norm.denormalise(normalised), x, atol=1e-4)
        assert os.path.exists(tmp_path / 'feat_minmax.json')

    def test_sentence_level_feature_keeps_shape(self):
        """Normalising a sentence-level (D,) or scalar-ish feature must NOT
        grow a bogus time axis — collate would zero-pad the (1, D) result
        into a fake one-frame sequence (reference broadcasts flat,
        morgana/data.py:533-538)."""
        mean, std = np.full(4, 2.0, np.float32), np.full(4, 0.5, np.float32)
        flat = np.arange(4, dtype=np.float32)
        out = data.normalise_mvn(flat, mean, std)
        assert out.shape == (4,)
        np.testing.assert_allclose(
            data.denormalise_mvn(out, mean, std), flat, atol=1e-5)
        seq = np.arange(12, dtype=np.float32).reshape(3, 4)
        assert data.normalise_mvn(seq, mean, std).shape == (3, 4)
        out = data.normalise_minmax(flat, mean, mean + std)
        assert out.shape == (4,)
        np.testing.assert_allclose(
            data.denormalise_minmax(out, mean, mean + std), flat, atol=1e-5)

    def test_minmax_zero_range_guard(self):
        from morgana_tpu.data.normalisers import normalise_minmax
        x = np.ones((3, 2), np.float32)
        out = normalise_minmax(x, np.array([1., 0.]), np.array([1., 2.]))
        assert np.isfinite(out).all()

    def test_speaker_dependent(self, tmp_path, rng):
        ids_file = tmp_path / 'speakers.scp'
        file_io.save_lines(['spk_a', 'spk_b'], str(ids_file))
        for spk, mean in [('spk_a', 0.), ('spk_b', 5.)]:
            file_io.save_json({'mean': [mean], 'std_dev': [1.0]},
                              str(tmp_path / 'norm' / spk / 'feat_mvn.json'))

        norm = data.SpeakerDependentMeanVarianceNormaliser('feat', 'speakers.scp')
        norm.load_params('norm', str(tmp_path))

        x = np.zeros((2, 3, 1), np.float32)
        out = norm.normalise(x, ['spk_a', 'spk_b'])
        np.testing.assert_allclose(out[0], 0., atol=1e-6)
        np.testing.assert_allclose(out[1], -5., atol=1e-5)

    def test_sd_normaliser_requires_speaker_id_source(self, tmp_path):
        sources = {'feat': data.NumpyBinarySource('feat')}
        norm = {'feat': data.SpeakerDependentMeanVarianceNormaliser('feat', 'x.scp')}
        ids = tmp_path / 'ids.scp'
        file_io.save_lines(['a'], str(ids))
        with pytest.raises(KeyError, match='speaker'):
            data.FilesDataset(sources, '.', 'ids.scp', norm, str(tmp_path))


class TestBucketing:
    def test_bucket_sizes_bounded(self):
        assert bucket_size(1) == 16
        assert bucket_size(16) == 16
        assert bucket_size(17) == 18
        assert bucket_size(100) == 104
        assert bucket_size(129) == 144
        assert bucket_size(1000) == 1024
        # At most 8 buckets per octave, and padding waste is bounded ~12.4%.
        buckets = sorted({bucket_size(n) for n in range(1, 2049)})
        per_octave = [b for b in buckets if 512 < b <= 1024]
        assert len(per_octave) <= 8
        assert max(bucket_size(n) / n for n in range(17, 4097)) < 1.125

    def test_collate_pads_to_bucket(self, rng):
        items = [{'x': rng.normal(size=(n, 2)).astype(np.float32)} for n in (5, 9, 17)]
        out = data.collate(items)
        assert out['x'].shape == (3, bucket_size(17), 2)
        np.testing.assert_allclose(out['x'][0, 5:], 0.)

    def test_collate_pads_higher_rank_features(self, rng):
        """ndim > 2 sequence features (e.g. (seq_len, H, W)) pad on the
        time axis keeping the trailing shape (used to crash with a
        broadcast error in both the float32 and generic paths)."""
        items = [{'x': rng.normal(size=(n, 2, 3)).astype(np.float32)}
                 for n in (5, 9)]
        out = data.collate(items, bucket=False)
        assert out['x'].shape == (2, 9, 2, 3)
        np.testing.assert_allclose(out['x'][0, 5:], 0.)
        np.testing.assert_allclose(out['x'][1], items[1]['x'])

    def test_collate_passthrough_and_scalars(self):
        items = [{'name': 'a', 'n': np.float32(3.)}, {'name': 'b', 'n': np.float32(5.)}]
        out = data.collate(items)
        assert out['name'] == ['a', 'b']
        np.testing.assert_allclose(out['n'], [3., 5.])


class TestDatasetAndLoader:
    def test_dataset_keys(self, voice_data):
        from f0_model_fixture import make_f0_sources, make_f0_normalisers
        sources = make_f0_sources()
        normalisers = make_f0_normalisers()
        for norm in normalisers.values():
            norm.load_params('train', voice_data['data_root'])

        ds = data.FilesDataset(sources, 'train', 'train/train_file_id_list.scp',
                               normalisers, voice_data['data_root'])
        item = ds[0]
        for key in ('name', 'n_frames', 'dur', 'lab', 'lf0', 'lf0_deltas', 'vuv',
                    'normalised_lab', 'normalised_lf0', 'normalised_lf0_deltas',
                    'normalised_counters', 'normalised_dur'):
            assert key in item, key
        assert item['lf0_deltas'].shape[-1] == 3
        assert item['lab'].shape[-1] == 600

    def test_loader_batching(self, voice_data):
        from f0_model_fixture import make_f0_sources, make_f0_normalisers
        sources = make_f0_sources()
        normalisers = make_f0_normalisers()
        for norm in normalisers.values():
            norm.load_params('train', voice_data['data_root'])

        ds = data.FilesDataset(sources, 'train', 'train/train_file_id_list.scp',
                               normalisers, voice_data['data_root'])
        loader = data.batch(ds, batch_size=4, shuffle=True, num_data_threads=2)
        batches = list(loader)
        assert len(batches) == 2 == len(loader)
        b = batches[0]
        assert b['lab'].shape[0] == 4
        assert b['normalised_lf0_deltas'].shape[-1] == 3
        assert len(b['name']) == 4

    def test_loader_shuffles_per_epoch(self, voice_data):
        from f0_model_fixture import make_f0_sources
        ds = data.FilesDataset(make_f0_sources(), 'train', 'train/train_file_id_list.scp',
                               {}, voice_data['data_root'])
        loader = data.DataLoader(ds, batch_size=8, shuffle=True, seed=0)
        names1 = next(iter(loader))['name']
        names2 = next(iter(loader))['name']
        assert sorted(names1) == sorted(names2) == sorted(ds.file_ids)

        ordered = data.DataLoader(ds, batch_size=8, shuffle=False)
        assert next(iter(ordered))['name'] == ds.file_ids

    def test_drop_remainder(self, voice_data):
        from f0_model_fixture import make_f0_sources
        ds = data.FilesDataset(make_f0_sources(), 'train', 'train/train_file_id_list.scp',
                               {}, voice_data['data_root'])
        loader = data.DataLoader(ds, batch_size=3, drop_remainder=True)
        assert len(loader) == 2
        assert all(len(b['name']) == 3 for b in loader)


class TestLengthSortedBatching:
    def test_reduces_padding_after_first_epoch(self, voice_data):
        from f0_model_fixture import make_f0_sources
        ds = data.FilesDataset(make_f0_sources(), 'train', 'train/train_file_id_list.scp',
                               {}, voice_data['data_root'])
        loader = data.DataLoader(ds, batch_size=2, shuffle=True, seed=0,
                                 length_sort_window=4)

        def epoch_names_and_spread(loader):
            names, spreads = [], []
            for b in loader:
                names.extend(b['name'])
                lens = [int(n) for n in np.asarray(b['n_frames']).reshape(-1)]
                spreads.append(max(lens) - min(lens))
            return names, spreads

        names1, _ = epoch_names_and_spread(loader)       # random epoch, learns lengths
        names2, spreads2 = epoch_names_and_spread(loader)  # length-sorted windows
        # All utterances still covered exactly once.
        assert sorted(names1) == sorted(names2) == sorted(ds.file_ids)
        # With the window covering the whole set, each batch pairs neighbours
        # by length: spread within each batch is (near-)minimal.
        lengths = sorted(loader._lengths.values())
        optimal = max(b - a for a, b in zip(lengths[::2], lengths[1::2]))
        assert max(spreads2) <= optimal + 1


    def test_replay_uses_epoch_start_lengths(self, voice_data):
        """A mid-epoch checkpoint must replay the order the interrupted
        epoch's _order() actually used. The live length map can be COMPLETE
        by checkpoint time (prefetch-ahead recording) even though the epoch
        was ordered by a plain shuffle (map incomplete at epoch start) — a
        resume restoring just the live map would flip the epoch to
        length-sorted order and replay a different prefix."""
        from f0_model_fixture import make_f0_sources
        make = lambda: data.DataLoader(
            data.FilesDataset(make_f0_sources(), 'train',
                              'train/train_file_id_list.scp',
                              {}, voice_data['data_root']),
            batch_size=2, shuffle=True, seed=0, length_sort_window=4)

        def epoch_names(loader):
            return [n for b in loader for n in b['name']]

        ref = make()
        order_e1 = epoch_names(ref)   # plain shuffle (map incomplete)
        order_e2 = epoch_names(ref)   # length-sorted (map complete)
        assert order_e1 != order_e2

        # Interrupted run: consume one batch of epoch 1, then simulate the
        # producer having recorded EVERY length by checkpoint time.
        run = make()
        it = iter(run)
        next(it)
        run._lengths.update(ref._lengths)
        state = run.lengths_state()
        assert state['epoch_start'] == {}
        assert len(state['live']) == len(ref._lengths)

        # Resumed run: epoch 1 must replay the PLAIN order, epoch 2 the
        # sorted one — both matching the uninterrupted reference.
        resumed = make()
        resumed.set_lengths(state)
        resumed.set_epoch(0)
        assert epoch_names(resumed) == order_e1
        assert epoch_names(resumed) == order_e2

    def test_drop_remainder_drops_random_not_longest(self, voice_data):
        """drop_remainder + length sorting: the remainder is truncated
        BEFORE sorting, so the dropped items are a random subset — not
        systematically the longest utterances (which sorting pins into the
        trailing partial batch)."""
        from f0_model_fixture import make_f0_sources
        ds = data.FilesDataset(make_f0_sources(), 'train',
                               'train/train_file_id_list.scp',
                               {}, voice_data['data_root'])
        learner = data.DataLoader(ds, batch_size=3, shuffle=True, seed=0,
                                  length_sort_window=8)
        list(learner)  # learn every length
        longest = max(learner._lengths, key=learner._lengths.__getitem__)
        longest_name = ds.file_ids[longest]

        loader = data.DataLoader(ds, batch_size=3, shuffle=True, seed=0,
                                 drop_remainder=True, length_sort_window=8)
        loader.set_lengths(learner.lengths_state())
        seen_longest = 0
        for _ in range(6):
            names = [n for b in loader for n in b['name']]
            assert len(names) == 6  # two of eight dropped
            seen_longest += longest_name in names
        # Sorting-then-dropping would pin the longest utterance into the
        # dropped partial batch in EVERY epoch.
        assert seen_longest >= 1

    def test_partial_batch_stays_aligned(self, voice_data):
        """With n % batch_size != 0, the short chunk must stay LAST so the
        fixed-stride batch slicing still matches the sorted length groups."""
        from f0_model_fixture import make_f0_sources
        ds = data.FilesDataset(make_f0_sources(), 'train',
                               'train/train_file_id_list.scp',
                               {}, voice_data['data_root'])
        loader = data.DataLoader(ds, batch_size=3, shuffle=True, seed=0,
                                 length_sort_window=8)
        list(loader)  # epoch 1 learns lengths
        for epoch in range(3):
            batches = [b['name'] for b in loader]
            sizes = [len(names) for names in batches]
            assert sizes[:-1] == [3, 3] and sizes[-1] == 2
            assert sorted(n for b in batches for n in b) == sorted(ds.file_ids)


class TestLoaderShutdown:
    def test_abandoned_iteration_releases_producer(self):
        """Breaking out of iteration early must unblock the prefetch thread
        (it would otherwise sit in q.put forever holding staged batches)."""
        import threading
        import time

        class Dataset:
            def __len__(self):
                return 64

            def __getitem__(self, i):
                return {'x': np.ones((4, 2), np.float32)}

            @staticmethod
            def collate_fn(items, bucket=True):
                return data.collate(items, bucket=bucket)

        before = threading.active_count()
        loader = data.batch(Dataset(), batch_size=2, shuffle=False, prefetch=1)
        it = iter(loader)
        next(it)
        it.close()  # what an early `break` does on GC
        deadline = time.time() + 5
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before

    def test_device_param_places_batches(self):
        import jax

        class Dataset:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                return {'x': np.ones((4, 2), np.float32)}

            @staticmethod
            def collate_fn(items, bucket=True):
                return data.collate(items, bucket=bucket)

        device = jax.devices('cpu')[-1]
        loader = data.batch(Dataset(), batch_size=2, shuffle=False,
                            device=device)
        batch_out = next(iter(loader))
        assert batch_out['x'].devices() == {device}


class TestLoaderErrorPropagation:
    def test_producer_error_reaches_consumer(self):
        class BadDataset:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                if i >= 2:
                    raise RuntimeError('boom at item 2')
                return {'x': np.ones((3, 2), np.float32)}

            @staticmethod
            def collate_fn(items, bucket=True):
                return data.collate(items, bucket=bucket)

        loader = data.batch(BadDataset(), batch_size=2, shuffle=False)
        with pytest.raises(RuntimeError, match='boom'):
            list(loader)


class TestNormalisersContainer:
    def test_container_forwards_data_root(self, tmp_path, rng):
        """The Normalisers dict container must forward data_root so
        speaker-dependent normalisers resolve their speaker list against the
        dataset root, not the CWD."""
        root = tmp_path / 'voice'
        (root / 'train' / 'spk1').mkdir(parents=True)
        file_io.save_lines(['spk1'], str(root / 'speakers.scp'))
        file_io.save_json({'mean': [0.0], 'std_dev': [1.0]},
                          str(root / 'train' / 'spk1' / 'lf0_mvn.json'))
        file_io.save_json({'mean': [0.0], 'std_dev': [1.0]},
                          str(root / 'train' / 'dur_mvn.json'))
        norms = data.Normalisers(
            {'dur': data.MeanVarianceNormaliser('dur'),
             'lf0': data.SpeakerDependentMeanVarianceNormaliser(
                 'lf0', 'speakers.scp')},
            'train', data_root=str(root))
        assert norms['lf0'].speaker_ids == ['spk1']
        assert 'mean' in norms['lf0'].params['spk1']

    def test_sd_save_params_per_speaker(self, tmp_path):
        (tmp_path / 'train').mkdir()
        file_io.save_lines(['s1'], str(tmp_path / 'speakers.scp'))
        norm = data.SpeakerDependentMeanVarianceNormaliser('lf0', 'speakers.scp')
        with pytest.raises(ValueError, match='speaker_id'):
            norm.save_params({'mean': [0.0], 'std_dev': [1.0]}, 'train',
                             str(tmp_path))
        norm.save_params({'mean': [0.5], 'std_dev': [2.0]}, 'train',
                         str(tmp_path), speaker_id='s1')
        assert os.path.isfile(tmp_path / 'train' / 's1' / 'lf0_mvn.json')
        np.testing.assert_allclose(norm.params['s1']['mean'], [0.5])
