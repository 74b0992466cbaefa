"""Parallelism tests on the 8-device virtual CPU mesh: data-parallel training
must be numerically equivalent to single-device training (the gradient psum is
an exact mean over shards), and sharded placement must actually shard."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morgana_tpu import nn, parallel
from morgana_tpu.training import TrainLoop, build_optimizer
from tiny_models import TinyF0Model


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def _synthetic_batch(rng, batch=8, phones=6, frames=24):
    dur = rng.integers(1, frames // phones + 1, size=(batch, phones, 1))
    n_frames = dur.sum(axis=(1, 2)).astype(np.float32)
    return {
        'normalised_lab': rng.random((batch, phones, 600)).astype(np.float32),
        'normalised_counters': rng.random((batch, frames, 9)).astype(np.float32),
        'dur': dur.astype(np.int64),
        'n_frames': n_frames,
        'lf0': rng.normal(size=(batch, frames, 1)).astype(np.float32),
        'vuv': (rng.random((batch, frames, 1)) > 0.3).astype(np.float32),
        'normalised_lf0_deltas': rng.normal(size=(batch, frames, 3)).astype(np.float32),
    }


def _loss_history(model_seed, batches, sharded_mesh=None, steps=4):
    nn.manual_seed(model_seed)
    model = TinyF0Model()
    for name, norm in model.normaliser_sources().items():
        if name == 'lf0':
            norm.params = {'mean': np.zeros(1, np.float32), 'std_dev': np.ones(1, np.float32)}
            norm.delta_params = {'mean': np.zeros(3, np.float32), 'std_dev': np.ones(3, np.float32)}
        model.normalisers[name] = norm
    model.mode = 'train'

    loop = TrainLoop(model, build_optimizer(), seed=0)
    if sharded_mesh is not None:
        loop.params = parallel.shard_params(loop.params, sharded_mesh)

    losses, final = [], None
    for i in range(steps):
        batch = batches[i % len(batches)]
        if sharded_mesh is not None:
            batch = parallel.shard_batch(batch, sharded_mesh)
        loss, staged, _ = loop.train_step(batch, lr=0.01)
        losses.append(float(loss))
    return losses, {k: np.asarray(v) for k, v in loop.params.items()}


class TestDataParallel:
    def test_dp_matches_single_device(self, rng):
        batches = [_synthetic_batch(rng) for _ in range(2)]

        losses_single, params_single = _loss_history(3, batches, sharded_mesh=None)
        mesh = parallel.make_mesh()
        losses_dp, params_dp = _loss_history(3, batches, sharded_mesh=mesh)

        np.testing.assert_allclose(losses_dp, losses_single, rtol=2e-4)
        for k in params_single:
            np.testing.assert_allclose(params_dp[k], params_single[k], atol=2e-5)

    def test_batch_actually_sharded(self, rng):
        mesh = parallel.make_mesh()
        batch = parallel.shard_batch(_synthetic_batch(rng), mesh)
        x = batch['normalised_lab']
        assert len(x.sharding.device_set) == 8
        # Each device holds batch/8 rows.
        shard = x.addressable_shards[0]
        assert shard.data.shape[0] == x.shape[0] // 8

    def test_mesh_shapes(self):
        mesh = parallel.make_mesh()
        assert mesh.shape['data'] == 8 and mesh.shape['model'] == 1
        mesh2 = parallel.make_mesh(num_data=4, num_model=2)
        assert mesh2.shape == {'data': 4, 'model': 2}


class TestTensorParallel:
    def test_param_shardings_split_large_kernels(self):
        mesh = parallel.make_mesh(num_data=4, num_model=2)
        params = {
            'layers.0.weight': jnp.zeros((609, 512)),
            'layers.0.bias': jnp.zeros((512,)),
            'layers.3.w_ih_l0': jnp.zeros((512, 2048)),
            'small.weight': jnp.zeros((4, 4)),
        }
        sharded = parallel.shard_params(params, mesh, tensor_parallel=True)
        # Large kernels split over 'model'.
        w = sharded['layers.0.weight']
        assert w.addressable_shards[0].data.shape[-1] == 256
        # Small params replicated.
        s = sharded['small.weight']
        assert s.addressable_shards[0].data.shape == (4, 4)

    def test_tp_training_step_runs(self, rng):
        """A jitted step over TP-sharded params compiles and executes."""
        mesh = parallel.make_mesh(num_data=4, num_model=2)
        batches = [_synthetic_batch(rng)]

        nn.manual_seed(5)
        model = TinyF0Model(hidden=32)
        norm = model.normaliser_sources()['lf0']
        norm.params = {'mean': np.zeros(1, np.float32), 'std_dev': np.ones(1, np.float32)}
        norm.delta_params = {'mean': np.zeros(3, np.float32), 'std_dev': np.ones(3, np.float32)}
        model.normalisers = {'lf0': norm}
        model.mode = 'train'

        loop = TrainLoop(model, build_optimizer(), seed=0)
        loop.params = parallel.shard_params(loop.params, mesh, tensor_parallel=True)
        batch = parallel.shard_batch(batches[0], mesh)
        loss, _, _ = loop.train_step(batch, lr=0.01)
        assert np.isfinite(float(loss))


class TestBuilderDataParallel:
    def test_builder_trains_data_parallel(self, voice_data, tmp_path):
        """Full builder lifecycle with --data_parallel on the virtual mesh."""
        import json
        import os
        from conftest import builder_args
        from tiny_models import TinyF0Model
        from morgana_tpu.experiment_builder import ExperimentBuilder

        args = builder_args(voice_data['data_root'], str(tmp_path / 'experiments'),
                            end_epoch=2, valid=False, batch_size=8,
                            data_parallel=True)
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='dp', **args)
        assert exp.mesh is not None and exp.mesh.shape['data'] == 8
        exp.run_experiment()

        expdir = os.path.join(str(tmp_path / 'experiments'), 'dp')
        m1 = json.load(open(os.path.join(expdir, 'train', 'epoch_1', 'metrics.json')))
        m2 = json.load(open(os.path.join(expdir, 'train', 'epoch_2', 'metrics.json')))
        assert m2['loss'] < m1['loss']

    def test_builder_trains_tensor_parallel(self, voice_data, tmp_path):
        """--tensor_parallel 2 with --data_parallel: full lifecycle on a
        4 x 2 data x model mesh, large kernels actually sharded."""
        import json
        import os
        from conftest import builder_args
        from tiny_models import TinyF0Model
        from morgana_tpu.experiment_builder import ExperimentBuilder

        # hidden=128: the 609 x 128 kernel crosses param_shardings' min_size
        # so TP actually engages.
        # (lr 0.001: with hidden=128 the default 0.005 overshoots at epoch 2
        # — identically so without TP; the dryrun gate asserts dp x tp == dp
        # equality, this test asserts the full builder lifecycle.)
        args = builder_args(voice_data['data_root'], str(tmp_path / 'experiments'),
                            end_epoch=2, valid=False, batch_size=8,
                            data_parallel=True, tensor_parallel=2,
                            learning_rate=0.001,
                            model_kwargs={'hidden': 128})
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='tp', **args)
        assert exp.mesh.shape == {'data': 4, 'model': 2}
        # Large kernels committed onto the 'model' axis before training.
        sharded = [p for p in exp.loop.params.values()
                   if p.ndim >= 1 and not p.sharding.is_fully_replicated]
        assert sharded, 'expected at least one tensor-parallel-sharded kernel'
        exp.run_experiment()

        expdir = os.path.join(str(tmp_path / 'experiments'), 'tp')
        m1 = json.load(open(os.path.join(expdir, 'train', 'epoch_1', 'metrics.json')))
        m2 = json.load(open(os.path.join(expdir, 'train', 'epoch_2', 'metrics.json')))
        assert m2['loss'] < m1['loss']

    def test_builder_rejects_indivisible_batch(self, voice_data, tmp_path):
        from conftest import builder_args
        from tiny_models import TinyF0Model
        from morgana_tpu.experiment_builder import ExperimentBuilder

        args = builder_args(voice_data['data_root'], str(tmp_path / 'experiments'),
                            batch_size=3, data_parallel=True)
        with pytest.raises(ValueError, match='divisible'):
            ExperimentBuilder(TinyF0Model, experiment_name='dp_bad', **args)


class TestDistributed:
    def test_shard_id_list(self):
        ids = [f'utt{i}' for i in range(10)]
        # Default: equal-sized shards (ceil(10/4) = 3 per host, short shards
        # padded by repeating their own ids; lockstep-safe, full coverage).
        a = parallel.shard_id_list(ids, 0, 4)
        c = parallel.shard_id_list(ids, 2, 4)
        assert a == ['utt0', 'utt4', 'utt8']
        assert c == ['utt2', 'utt6', 'utt2']
        all_shards = [parallel.shard_id_list(ids, p, 4) for p in range(4)]
        assert set(sum(all_shards, [])) == set(ids)
        assert all(len(s) == 3 for s in all_shards)
        # Exact (unpadded) cover when equal sizing is opted out.
        all_shards = [parallel.shard_id_list(ids, p, 4, equal_shards=False)
                      for p in range(4)]
        assert sorted(sum(all_shards, [])) == sorted(ids)


class TestMultiHostDataSharding:
    def test_two_host_loaders_cover_dataset(self, voice_data, tmp_path):
        """Simulated 2-host loading: each host reads only its id-list shard;
        together they cover the dataset exactly once."""
        from morgana_tpu import data
        from morgana_tpu.data import file_io
        from f0_model_fixture import make_f0_sources

        full_ids = file_io.get_file_ids(os.path.join(
            voice_data['data_root'], 'train', 'train_file_id_list.scp'))

        seen = []
        for host in range(2):
            shard = parallel.shard_id_list(full_ids, host, 2)
            shard_list = tmp_path / f'host{host}.scp'
            file_io.save_lines(shard, str(shard_list))
            ds = data.FilesDataset(make_f0_sources(), 'train',
                                   os.path.relpath(shard_list, voice_data['data_root']),
                                   {}, voice_data['data_root'])
            for b in data.DataLoader(ds, batch_size=2, shuffle=False):
                seen.extend(b['name'])
        assert sorted(seen) == sorted(full_ids)


class TestTransformerTensorParallel:
    def test_tp_encoder_matches_unsharded(self, rng):
        """Attention projections TP-shard over 'model' (their `.weight` names
        match the TP pattern) and the dp x tp program must agree with the
        unsharded one — loss AND gradients."""
        mesh = parallel.make_mesh(num_data=4, num_model=2)

        # Sizes chosen so in_proj (160x480) and FFN (160x512) clear the TP
        # min_size threshold and actually shard.
        nn.manual_seed(11)
        enc = nn.TransformerEncoder(2, 160, 4, 512)
        x = jnp.asarray(rng.normal(size=(8, 12, 160)).astype(np.float32))
        lens = np.array([12, 10, 8, 12, 6, 12, 9, 7], np.int32)
        params = nn.parameters(enc)

        def loss_fn(p, x):
            with nn.bind(enc, p):
                out = enc(x, seq_len=lens)
            return jnp.mean(out ** 2)

        loss = float(jax.jit(loss_fn)(params, x))
        grads = jax.jit(jax.grad(loss_fn))(params, x)

        sharded = parallel.shard_params(params, mesh, tensor_parallel=True)
        qkv = [v for k, v in sharded.items() if k.endswith('in_proj.weight')]
        assert qkv and all(
            v.addressable_shards[0].data.shape[-1] == v.shape[-1] // 2
            for v in qkv), 'attention projections were not TP-sharded'

        x_tp = jax.device_put(x, parallel.batch_sharding(mesh))
        loss_tp = float(jax.jit(loss_fn)(sharded, x_tp))
        grads_tp = jax.jit(jax.grad(loss_fn))(sharded, x_tp)

        np.testing.assert_allclose(loss_tp, loss, rtol=1e-5)
        for name in grads:
            np.testing.assert_allclose(np.asarray(grads_tp[name]),
                                       np.asarray(grads[name]),
                                       rtol=1e-4, atol=1e-6, err_msg=name)
