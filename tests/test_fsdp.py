"""FSDP / ZeRO-3 storage sharding on the 8-device virtual CPU mesh.

Parameters, Adam moments and EMA shards live sharded over the 'data' axis;
the jitted step is unchanged (GSPMD inserts the weight all_gather and the
gradient reduce_scatter). Training must be numerically equivalent to the
replicated data-parallel path, and the sharded layout must SURVIVE the
compiled step (outputs stay sharded — the memory saving is per-step, not
just at placement time).
"""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from morgana_tpu import nn, parallel
from morgana_tpu.parallel.mesh import fsdp_param_shardings, make_mesh
from morgana_tpu.training import TrainLoop, build_optimizer
from tiny_models import TinyF0Model
from test_parallel import _synthetic_batch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


class TestFsdpShardings:
    def test_largest_divisible_axis_takes_data(self):
        mesh = make_mesh()  # 8-way 'data'
        params = {'a.weight': jax.numpy.zeros((256, 512)),
                  'b.weight': jax.numpy.zeros((512, 300))}
        sh = fsdp_param_shardings(params, mesh, min_size=2 ** 10)
        assert sh['a.weight'].spec == P(None, 'data')   # 512 is largest
        # 300 not divisible by 8 -> falls back to the 512 axis.
        assert sh['b.weight'].spec == P('data', None)

    def test_small_leaves_replicate(self):
        mesh = make_mesh()
        params = {'norm.weight': jax.numpy.zeros((64,))}
        sh = fsdp_param_shardings(params, mesh)  # default min_size 2**16
        assert all(axis is None for axis in sh['norm.weight'].spec)

    def test_composes_with_tensor_parallel(self):
        mesh = make_mesh(num_model=2)  # 4 x 2 data x model
        params = {'rnn.w_hh_l0': jax.numpy.zeros((128, 512))}
        sh = fsdp_param_shardings(params, mesh, tensor_parallel=True,
                                  min_size=2 ** 10)
        # TP takes the gate axis (last), FSDP the remaining hidden axis.
        assert sh['rnn.w_hh_l0'].spec == P('data', 'model')

    def test_indivisible_everything_replicates(self):
        mesh = make_mesh()
        params = {'odd.weight': jax.numpy.zeros((63, 909))}
        sh = fsdp_param_shardings(params, mesh, min_size=2 ** 10)
        assert all(axis is None for axis in sh['odd.weight'].spec)


def _make_loop(model_seed, ema_decay=0., grad_accum_steps=1):
    nn.manual_seed(model_seed)
    model = TinyF0Model(hidden=128)
    for name, norm in model.normaliser_sources().items():
        if name == 'lf0':
            norm.params = {'mean': np.zeros(1, np.float32),
                           'std_dev': np.ones(1, np.float32)}
            norm.delta_params = {'mean': np.zeros(3, np.float32),
                                 'std_dev': np.ones(3, np.float32)}
        model.normalisers[name] = norm
    model.mode = 'train'
    return TrainLoop(model, build_optimizer(), seed=0, ema_decay=ema_decay,
                     grad_accum_steps=grad_accum_steps)


def _fsdp_place(loop, mesh, min_size=2 ** 10):
    (loop.params, loop.opt_state, loop.ema_params,
     shardings) = parallel.shard_fsdp_state(
        loop.params, loop.opt_state, loop.ema_params, mesh,
        min_size=min_size)
    return shardings


class TestFsdpTraining:
    def test_matches_replicated_dp(self, rng):
        batches = [_synthetic_batch(rng) for _ in range(2)]
        mesh = parallel.make_mesh()

        def run(fsdp):
            loop = _make_loop(5)
            if fsdp:
                shardings = _fsdp_place(loop, mesh)
                assert any('data' in tuple(s.spec) for s in shardings.values())
            losses = []
            for i in range(4):
                batch = parallel.shard_batch(batches[i % 2], mesh)
                loss, _, _ = loop.train_step(batch, lr=0.01)
                losses.append(float(loss))
            return losses, {k: np.asarray(v) for k, v in loop.params.items()}

        losses_dp, params_dp = run(fsdp=False)
        losses_fsdp, params_fsdp = run(fsdp=True)
        np.testing.assert_allclose(losses_fsdp, losses_dp, rtol=2e-5)
        for k in params_dp:
            np.testing.assert_allclose(params_fsdp[k], params_dp[k],
                                       atol=2e-6, err_msg=k)

    def test_layout_survives_the_step(self, rng):
        """The compiled step's OUTPUT params/moments must stay sharded —
        otherwise FSDP saves memory only until the first update."""
        mesh = parallel.make_mesh()
        loop = _make_loop(6, ema_decay=0.9)
        _fsdp_place(loop, mesh)
        batch = parallel.shard_batch(_synthetic_batch(rng), mesh)
        for _ in range(2):
            loop.train_step(batch, lr=0.01)

        kernel = 'layers.0.weight'
        assert 'data' in tuple(loop.params[kernel].sharding.spec)
        # Per-device shard is 1/8 of the kernel.
        shard = loop.params[kernel].addressable_shards[0]
        assert shard.data.size == loop.params[kernel].size // 8
        # Adam moments and EMA keep the parameter's layout.
        mu = jax.tree_util.tree_leaves(
            [getattr(s, 'mu', None) for s in loop.opt_state
             if hasattr(s, 'mu')])
        assert mu, 'expected an Adam state with mu moments'
        adam = [s for s in loop.opt_state if hasattr(s, 'mu')][0]
        assert 'data' in tuple(adam.mu[kernel].sharding.spec)
        assert 'data' in tuple(loop.ema_params[kernel].sharding.spec)
        assert np.isfinite(np.asarray(loop.ema_params[kernel])).all()

    def test_grad_accumulation_composes(self, rng):
        mesh = parallel.make_mesh()
        loop = _make_loop(7, grad_accum_steps=2)
        _fsdp_place(loop, mesh)
        batch = parallel.shard_batch(_synthetic_batch(rng), mesh)
        loop.train_step(batch, lr=0.01)          # accumulate
        assert not loop.last_step_applied
        loop.train_step(batch, lr=0.01)          # apply
        assert loop.last_step_applied
        kernel = 'layers.0.weight'
        assert 'data' in tuple(loop.params[kernel].sharding.spec)
        assert np.isfinite(np.asarray(loop.params[kernel])).all()


class TestBuilderFsdp:
    def test_full_lifecycle(self, voice_data, tmp_path):
        import json
        import os
        from conftest import builder_args
        from morgana_tpu.experiment_builder import ExperimentBuilder

        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            end_epoch=2, valid=False, batch_size=8,
                            data_parallel=True, fsdp=True,
                            learning_rate=0.001,
                            model_kwargs={'hidden': 128})
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='fsdp', **args)
        sharded = [name for name, p in exp.loop.params.items()
                   if 'data' in tuple(p.sharding.spec)]
        assert sharded, 'expected FSDP-sharded parameter leaves'
        exp.run_experiment()

        expdir = os.path.join(str(tmp_path / 'experiments'), 'fsdp')
        m1 = json.load(open(os.path.join(expdir, 'train', 'epoch_1',
                                         'metrics.json')))
        m2 = json.load(open(os.path.join(expdir, 'train', 'epoch_2',
                                         'metrics.json')))
        assert m2['loss'] < m1['loss']
        # Sharded params gather cleanly into the epoch checkpoint.
        ckpt = np.load(os.path.join(expdir, 'checkpoints', 'epoch_2.npz'))
        assert ckpt['layers.0.weight'].shape == (609, 128)

    def test_requires_data_parallel(self, voice_data, tmp_path):
        from conftest import builder_args
        from morgana_tpu.experiment_builder import ExperimentBuilder

        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'), fsdp=True)
        with pytest.raises(ValueError, match='--fsdp requires --data_parallel'):
            ExperimentBuilder(TinyF0Model, experiment_name='bad', **args)

    def test_rejects_shard_map_step(self, voice_data, tmp_path):
        from conftest import builder_args
        from morgana_tpu.experiment_builder import ExperimentBuilder

        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'), batch_size=8,
                            data_parallel=True, fsdp=True,
                            shard_map_step=True)
        with pytest.raises(ValueError, match='--fsdp is not supported with'):
            ExperimentBuilder(TinyF0Model, experiment_name='bad2', **args)


class TestFsdpChainedDispatch:
    def test_chain_matches_per_batch_under_fsdp(self, rng):
        """--steps_per_dispatch composes with --fsdp: the chained scan's
        donated carry keeps the FSDP layout and the trajectory is bitwise
        the per-batch FSDP path's (the step body is the same program; GSPMD
        inserts the same all-gather/reduce-scatter inside the scan)."""
        from morgana_tpu.data.device_cache import DeviceCorpusCache

        mesh = parallel.make_mesh()
        sharding = parallel.batch_sharding(mesh)
        B, steps = 8, 3
        big = _synthetic_batch(rng, batch=B * steps)

        class _Items:
            def __len__(self):
                return B * steps

            def __getitem__(self, i):
                return {k: v[i] for k, v in big.items()}

        cache = DeviceCorpusCache(_Items(), sharding=sharding)
        idx_mat = np.arange(B * steps, dtype=np.int32).reshape(steps, B)

        results = {}
        for label in ('per-batch', 'chained'):
            loop = _make_loop(9, ema_decay=0.9)
            shardings = _fsdp_place(loop, mesh)
            sharded_keys = [k for k, s in shardings.items()
                            if 'data' in tuple(s.spec)]
            assert sharded_keys
            if label == 'per-batch':
                for row in idx_mat:
                    loop.train_step(cache.assemble(row, bucket=False),
                                    lr=1e-3)
            else:
                loop.train_chain(cache, idx_mat, [1e-3] * steps,
                                 batch_sharding=sharding, bucket=False)
            # The FSDP layout must survive the chained program's donation.
            for key in sharded_keys:
                assert 'data' in tuple(loop.params[key].sharding.spec), \
                    f'{label}: {key} lost its FSDP sharding'
            results[label] = {k: np.asarray(v)
                              for k, v in loop.params.items()}
        for k in results['per-batch']:
            np.testing.assert_array_equal(results['chained'][k],
                                          results['per-batch'][k],
                                          err_msg=k)
