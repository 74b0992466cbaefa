"""Device-resident corpus cache (`--device_cache`).

The cache packs the corpus into per-stream HBM arenas and assembles batches
on device by gather (`morgana_tpu/data/device_cache.py`): the only per-batch
host->device traffic is (B,) index vectors. These tests pin the cached path
to the streaming host path: identical batches (bitwise for arrays, same
lists for strings), identical shuffle/length-sort orders across epochs,
identical training, and graceful fallback when the corpus is over budget.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import builder_args
from tiny_models import TinyF0Model

from morgana_tpu import data, nn
from morgana_tpu.data.device_cache import CacheOverBudget, DeviceCorpusCache
from morgana_tpu.experiment_builder import ExperimentBuilder


def _f0_setup(voice_data):
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'models'))
    from f0_test_model import F0Model
    nn.manual_seed(0)
    model = F0Model()
    norms = model.normaliser_sources()
    for norm in norms.values():
        norm.load_params('train', voice_data['data_root'])
    return model, norms


def _dataset(voice_data, sources, norms, split='valid', **kwargs):
    return data.FilesDataset(sources, split,
                             f'{split}/{split}_file_id_list.scp', norms,
                             voice_data['data_root'], **kwargs)


def _assert_batches_equal(host_batches, cached_batches, check_dtype=True):
    assert len(host_batches) == len(cached_batches) > 0
    for host, cached in zip(host_batches, cached_batches):
        assert set(host) == set(cached)
        for key in host:
            h, c = host[key], cached[key]
            if isinstance(h, list):
                assert h == c, key
                continue
            h, c = np.asarray(h), np.asarray(c)
            assert h.shape == c.shape, key
            if check_dtype:
                assert h.dtype == c.dtype, key
            # The arena gather reads the very same f32 values collate would
            # have padded — bitwise equality, not allclose.
            np.testing.assert_array_equal(h, c, err_msg=key)


class TestLoaderEquality:
    @pytest.mark.parametrize('shuffle', [False, True])
    def test_batches_bitwise_equal(self, voice_data, shuffle):
        model, norms = _f0_setup(voice_data)
        sources = model.valid_data_sources()
        host = list(data.batch(_dataset(voice_data, sources, norms),
                               batch_size=3, shuffle=shuffle, seed=7))
        cache = DeviceCorpusCache(_dataset(voice_data, sources, norms))
        cached = list(data.batch(_dataset(voice_data, sources, norms),
                                 batch_size=3, shuffle=shuffle, seed=7,
                                 device_cache=cache))
        _assert_batches_equal(host, cached)

    def test_two_epochs_follow_host_order(self, voice_data):
        model, norms = _f0_setup(voice_data)
        sources = model.valid_data_sources()
        host_loader = data.batch(_dataset(voice_data, sources, norms),
                                 batch_size=3, shuffle=True, seed=3)
        cache = DeviceCorpusCache(_dataset(voice_data, sources, norms))
        cached_loader = data.batch(_dataset(voice_data, sources, norms),
                                   batch_size=3, shuffle=True, seed=3,
                                   device_cache=cache)
        for _ in range(2):  # reshuffles must track epoch for epoch
            _assert_batches_equal(list(host_loader), list(cached_loader))

    def test_length_sort_window_orders_match(self, voice_data):
        model, norms = _f0_setup(voice_data)
        sources = model.train_data_sources()
        kwargs = dict(batch_size=2, shuffle=True, seed=5,
                      length_sort_window=1)
        host_loader = data.batch(
            _dataset(voice_data, sources, norms, split='train'), **kwargs)
        cache = DeviceCorpusCache(
            _dataset(voice_data, sources, norms, split='train'))
        cached_loader = data.batch(
            _dataset(voice_data, sources, norms, split='train'),
            device_cache=cache, **kwargs)
        # Epoch 1 is plain-shuffled (lengths unknown to the host path yet);
        # epoch 2+ length-sorted. The cached path must reproduce BOTH.
        for _ in range(3):
            _assert_batches_equal(list(host_loader), list(cached_loader))

    def test_device_normalise_composition(self, voice_data):
        from morgana_tpu.data.device_normalise import make_device_transform
        model, norms = _f0_setup(voice_data)
        sources = model.valid_data_sources()
        transform, engaged = make_device_transform(sources, norms)
        assert engaged
        host = list(data.batch(
            _dataset(voice_data, sources, norms, device_normalise=True),
            batch_size=3, shuffle=False, device_transform=transform))
        cache = DeviceCorpusCache(
            _dataset(voice_data, sources, norms, device_normalise=True))
        cached = list(data.batch(
            _dataset(voice_data, sources, norms, device_normalise=True),
            batch_size=3, shuffle=False, device_transform=transform,
            device_cache=cache))
        _assert_batches_equal(host, cached)

    def test_over_budget_raises_before_device(self, voice_data):
        model, norms = _f0_setup(voice_data)
        sources = model.valid_data_sources()
        with pytest.raises(CacheOverBudget, match='budget'):
            DeviceCorpusCache(_dataset(voice_data, sources, norms),
                              max_bytes=64)

    def test_non_numeric_array_streams_stay_on_host(self):
        """String/object ndarrays are not device-residable: they must take
        the host route (stacked, like collate) instead of crashing the
        cache build — mirroring ToDeviceWrapper._put's dtype filter."""
        class TinyDataset:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                return {'name': f'utt_{i}',
                        'x': np.full((4 + i, 2), float(i), np.float32),
                        'tag': np.array(f'spk{i}')}

            @staticmethod
            def collate_fn(items, bucket=True):
                from morgana_tpu.data.dataset import collate
                return collate(items, bucket=bucket)

        cache = DeviceCorpusCache(TinyDataset())
        out = cache.assemble(np.array([2, 0]), bucket=False)
        assert out['name'] == ['utt_2', 'utt_0']
        tags = np.asarray(out['tag'])
        assert tags.dtype.kind == 'U'
        np.testing.assert_array_equal(tags, np.array(['spk2', 'spk0']))
        x = np.asarray(out['x'])
        assert x.shape == (2, 6, 2)
        assert np.all(x[1, 4:] == 0)  # utt_0 padded to utt_2's length

    def test_describe_and_bytes(self, voice_data):
        model, norms = _f0_setup(voice_data)
        sources = model.valid_data_sources()
        cache = DeviceCorpusCache(_dataset(voice_data, sources, norms))
        assert cache.bytes > 0
        assert 'device-resident' in cache.describe()
        assert len(cache) == len(_dataset(voice_data, sources, norms))


class TestSharded:
    def test_sharded_assembly_matches_and_is_sharded(self, voice_data):
        from morgana_tpu import parallel
        model, norms = _f0_setup(voice_data)
        sources = model.valid_data_sources()
        sources = {k: v for k, v in sources.items()}
        mesh = parallel.make_mesh()
        sharding = parallel.batch_sharding(mesh)
        split = dict(split='train')
        train_sources = model.train_data_sources()
        host = list(data.batch(
            _dataset(voice_data, train_sources, norms, **split),
            batch_size=8, shuffle=False, sharding=sharding))
        cache = DeviceCorpusCache(
            _dataset(voice_data, train_sources, norms, **split),
            sharding=sharding)
        cached = list(data.batch(
            _dataset(voice_data, train_sources, norms, **split),
            batch_size=8, shuffle=False, sharding=sharding,
            device_cache=cache))
        _assert_batches_equal(host, cached)
        lf0 = cached[0]['lf0']  # 8 items over the 8-way 'data' axis
        assert lf0.sharding.is_equivalent_to(sharding, lf0.ndim)

    def test_partial_batch_falls_back_to_replicated(self, voice_data):
        from morgana_tpu import parallel
        model, norms = _f0_setup(voice_data)
        sources = model.valid_data_sources()
        mesh = parallel.make_mesh()
        sharding = parallel.batch_sharding(mesh)
        ds = _dataset(voice_data, sources, norms)
        cache = DeviceCorpusCache(ds, sharding=sharding)
        out = cache.assemble(np.array([0, 1, 2]))  # 3 % 8 devices != 0
        assert np.asarray(out['lf0']).shape[0] == 3


class TestTraining:
    def _losses(self, voice_data, tmp_path, name, **overrides):
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            end_epoch=2, valid=True, **overrides)
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name=name, **args)
        exp.run_experiment()
        import json
        import os
        losses = []
        for epoch in (1, 2):
            with open(os.path.join(exp.experiment_dir, 'valid',
                                   f'epoch_{epoch}', 'metrics.json')) as f:
                losses.append(json.load(f)['loss'])
        return losses

    def test_training_matches_host_path(self, voice_data, tmp_path):
        host = self._losses(voice_data, tmp_path, 'dc_off')
        cached = self._losses(voice_data, tmp_path, 'dc_on',
                              device_cache=True)
        # Batches are bitwise identical, so the trajectories agree to float
        # noise (the assemble program itself is a different XLA program).
        np.testing.assert_allclose(cached, host, rtol=1e-6)

    def test_training_matches_under_data_parallel(self, voice_data, tmp_path):
        host = self._losses(voice_data, tmp_path, 'dc_dp_off',
                            data_parallel=True, batch_size=8)
        cached = self._losses(voice_data, tmp_path, 'dc_dp_on',
                              data_parallel=True, batch_size=8,
                              device_cache=True)
        np.testing.assert_allclose(cached, host, rtol=1e-6)

    def test_over_budget_falls_back_with_warning(self, voice_data, tmp_path):
        # A absurdly small budget: training must still complete (streaming
        # loader fallback), not crash.
        losses = self._losses(voice_data, tmp_path, 'dc_tiny',
                              device_cache=True, device_cache_gb=1e-7)
        assert np.isfinite(losses).all()

    def test_budget_is_cumulative_across_splits(self, voice_data, tmp_path):
        """--device_cache_gb bounds the PROCESS's total arena bytes: later
        splits build against what the earlier ones left, falling back to
        streaming instead of silently exceeding the budget."""
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            end_epoch=1, valid=True, device_cache=True)
        nn.manual_seed(args['seed'])
        probe = ExperimentBuilder(TinyF0Model, experiment_name='dc_probe',
                                  **args)
        train_bytes = probe.train_loader.device_cache.bytes
        valid_bytes = probe.valid_loader.device_cache.bytes
        assert train_bytes > 0 and valid_bytes > 0

        # A budget that fits train alone but NOT train + valid.
        budget_gb = (train_bytes + valid_bytes / 2) / 2**30
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='dc_budget',
                                device_cache_gb=budget_gb, **args)
        assert exp.train_loader.device_cache is not None
        assert exp.valid_loader.device_cache is None  # streamed fallback
        exp.run_experiment()  # and the run still completes

    def test_multihost_flag_composes(self, voice_data, tmp_path):
        """--device_cache + --multihost no longer conflicts (round 5: each
        process caches its own corpus shard). With no cluster configured
        this degenerates to the single-host cached path and must train;
        the REAL two-process trajectory gate is
        test_multihost_real.py::test_two_process_device_cache_trajectory."""
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            device_cache=True, multihost=True)
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='dc_mh', **args)
        assert exp.train_loader.device_cache is not None
        exp.run_experiment()

    def test_capacity_search_reserves_arena_bytes(self, voice_data, tmp_path):
        """--search_batch_size must leave room for the resident arenas."""
        import os
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            device_cache=True, search_batch_size=2.0,
                            valid=False)
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='dc_search',
                                **args)
        exp.run_experiment()
        report = os.path.join(exp.experiment_dir, 'batch_size_search.txt')
        with open(report) as f:
            text = f.read()
        assert 'device_cache arenas reserve' in text

    def test_flag_surface(self):
        # Default is AUTO (None): resolved against the backend at init —
        # on for single-host accelerator backends, off on CPU.
        args = ExperimentBuilder.get_experiment_args(['--experiment_name', 'x'])
        assert args['device_cache'] is None
        assert args['device_cache_gb'] == 4.0
        args = ExperimentBuilder.get_experiment_args(
            ['--experiment_name', 'x', '--device_cache',
             '--device_cache_gb', '0.5'])
        assert args['device_cache'] is True
        assert args['device_cache_gb'] == 0.5
        args = ExperimentBuilder.get_experiment_args(
            ['--experiment_name', 'x', '--no-device_cache'])
        assert args['device_cache'] is False
