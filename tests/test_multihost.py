"""Multi-host wiring: per-host id-list sharding, global-batch accounting, and
lead-host-only writes. A two-host topology is faked in one process by
monkeypatching ``parallel.process_info`` (and neutralising the real
``jax.distributed`` initialisation) — the single indirection the builder
reads its topology through."""
import json
import os

import numpy as np
import pytest

from conftest import builder_args
from tiny_models import TinyF0Model

from morgana_tpu import nn, parallel
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu.parallel import distributed


class TestShardIdList:
    def test_equal_shards_cover_everything(self):
        """Shards are EQUAL-SIZED (hosts must run the same number of
        collective steps or they deadlock) with FULL coverage: short shards
        pad by repeating their own ids rather than dropping utterances."""
        ids = [f'utt_{i:03d}' for i in range(11)]
        shards = [distributed.shard_id_list(ids, p, 3) for p in range(3)]
        assert [len(s) for s in shards] == [4, 4, 4]
        assert set(sum(shards, [])) == set(ids)          # nothing dropped
        for a in range(3):
            for b in range(a + 1, 3):
                assert not set(shards[a]) & set(shards[b])  # cross-host disjoint

    def test_divisible_covers_everything_exactly(self):
        ids = [f'utt_{i}' for i in range(12)]
        shards = [distributed.shard_id_list(ids, p, 3) for p in range(3)]
        assert sorted(sum(shards, [])) == sorted(ids)

    def test_unequal_opt_out(self):
        ids = [f'utt_{i}' for i in range(11)]
        shards = [distributed.shard_id_list(ids, p, 3, equal_shards=False)
                  for p in range(3)]
        assert sorted(sum(shards, [])) == sorted(ids)
        assert [len(s) for s in shards] == [4, 4, 3]

    def test_too_few_ids_raises(self):
        with pytest.raises(ValueError, match='at least one utterance'):
            distributed.shard_id_list(['a'], 0, 2)

    def test_default_single_process(self):
        ids = ['a', 'b', 'c']
        assert distributed.shard_id_list(ids) == ids


def _fake_hosts(monkeypatch, rank, count):
    monkeypatch.setattr(parallel, 'process_info', lambda: (rank, count))
    monkeypatch.setattr(parallel, 'initialize_distributed',
                        lambda *a, **k: (rank, count))


def _build(voice_data, tmp_path, name, **overrides):
    args = builder_args(voice_data['data_root'], str(tmp_path / 'experiments'),
                        **overrides)
    nn.manual_seed(args['seed'])
    return ExperimentBuilder(TinyF0Model, experiment_name=name, **args)


class TestMultihostBuilder:
    def test_hosts_load_disjoint_shards_and_only_lead_writes(
            self, voice_data, tmp_path, monkeypatch):
        shard_ids = {}
        for rank in range(2):
            _fake_hosts(monkeypatch, rank, 2)
            exp = _build(voice_data, tmp_path / f'host{rank}', f'mh{rank}',
                         multihost=True, batch_size=4, end_epoch=1, valid=False)
            assert exp.process_count == 2 and exp.process_index == rank
            assert exp.is_lead_host == (rank == 0)
            # Global-batch accounting: --batch_size is global.
            assert exp.local_batch_size == 2
            shard_ids[rank] = list(exp.train_loader.dataset.file_ids)
            exp.run_experiment()

        # Each fake host loaded a disjoint shard; together they cover the set.
        assert not set(shard_ids[0]) & set(shard_ids[1])
        all_ids = open(os.path.join(
            voice_data['data_root'], 'train', 'train_file_id_list.scp')).read().split()
        assert sorted(shard_ids[0] + shard_ids[1]) == sorted(all_ids)

        # Rank 0 wrote the experiment artefacts; rank 1 wrote none of them.
        lead = tmp_path / 'host0' / 'experiments' / 'mh0'
        follower = tmp_path / 'host1' / 'experiments' / 'mh1'
        assert (lead / 'config.json').is_file()
        assert (lead / 'model_summary.txt').is_file()
        assert (lead / 'checkpoints' / 'epoch_1.npz').is_file()
        assert not (follower / 'config.json').exists()
        assert not (follower / 'model_summary.txt').exists()
        assert not (follower / 'checkpoints').exists()
        # Per-epoch metrics.json is gated the same way.
        assert (lead / 'train' / 'epoch_1' / 'metrics.json').is_file()
        assert not (follower / 'train' / 'epoch_1' / 'metrics.json').exists()

        # Both hosts keep their own (collision-free) log files.
        assert any(f.endswith('.stdout') for f in os.listdir(lead / 'log'))
        follower_logs = os.listdir(follower / 'log')
        assert any('.p1.' in f for f in follower_logs)

    def test_global_batch_must_divide_hosts(self, voice_data, tmp_path, monkeypatch):
        _fake_hosts(monkeypatch, 0, 2)
        with pytest.raises(ValueError, match='divisible by the number of hosts'):
            _build(voice_data, tmp_path, 'mh_bad', multihost=True, batch_size=5)

    def test_lead_host_metrics_written_on_output_epoch(
            self, voice_data, tmp_path, monkeypatch):
        _fake_hosts(monkeypatch, 0, 2)
        exp = _build(voice_data, tmp_path, 'mh_lead', multihost=True,
                     batch_size=4, end_epoch=1, valid=False,
                     train_output_interval=1)
        exp.run_experiment()
        lead = tmp_path / 'experiments' / 'mh_lead'
        assert (lead / 'train' / 'epoch_1' / 'metrics.json').is_file()


class TestHarmoniseShapes:
    def test_repads_to_cross_host_max(self, monkeypatch):
        """Each host's locally-bucketed batch is re-padded to the allgathered
        per-key maximum so every process builds the same global shape."""
        import jax
        from morgana_tpu.data.loader import ToDeviceWrapper
        monkeypatch.setattr(jax, 'process_count', lambda: 2)

        import jax.experimental.multihost_utils as mhu
        # Fake the other host reporting longer sequences.
        monkeypatch.setattr(mhu, 'process_allgather',
                            lambda local: np.stack([np.asarray(local),
                                                    np.asarray(local) + 16]))
        features = {
            'mcep': np.ones((2, 32, 5), np.float32),
            'dur': np.ones((2, 8, 1), np.int64),
            'n_frames': np.array([32., 20.], np.float32),
            'name': ['a', 'b'],
        }
        out = ToDeviceWrapper._harmonise_shapes(features)
        assert out['mcep'].shape == (2, 48, 5)
        assert out['dur'].shape == (2, 24, 1)
        np.testing.assert_array_equal(out['mcep'][:, 32:], 0.)
        assert out['n_frames'].shape == (2,)
        assert out['name'] == ['a', 'b']

    def test_single_process_passthrough(self):
        from morgana_tpu.data.loader import ToDeviceWrapper
        features = {'mcep': np.ones((2, 32, 5), np.float32)}
        assert ToDeviceWrapper._harmonise_shapes(features) is features


class TestPutGlobal:
    def test_single_host_put(self):
        import jax
        mesh = parallel.make_mesh()
        sharding = parallel.batch_sharding(mesh)
        n = mesh.shape['data']
        x = np.arange(n * 4, dtype=np.float32).reshape(n * 2, 2)
        arr = parallel.put_global(x, sharding)
        assert isinstance(arr, jax.Array)
        np.testing.assert_array_equal(np.asarray(arr), x)
