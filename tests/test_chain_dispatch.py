"""Chained multi-step dispatch (`--steps_per_dispatch`).

N consecutive same-shape batches run as ONE compiled program — a `lax.scan`
whose body assembles the batch from the device-cached corpus and runs the
fused train step (`training.TrainLoop.train_chain`). These tests pin the
chained path to the per-batch path: identical training trajectories
(including dropout RNG, batch-level LR schedules, EMA and metric values),
graceful fallback on generation epochs, and the flag/conflict surface.
"""
import json
import os

import numpy as np
import pytest

from conftest import builder_args
from tiny_models import TinyF0Model

from morgana_tpu import nn
from morgana_tpu.experiment_builder import ExperimentBuilder


@pytest.fixture(scope='module')
def uniform_voice_data(tmp_path_factory):
    """A corpus with UNIFORM utterance lengths: every batch shares one shape
    signature, so chains actually form (the shared ragged fixture's batches
    mostly land in distinct buckets and run as singletons)."""
    from morgana_tpu.data.synthetic import generate_voice_data
    root = tmp_path_factory.mktemp('uniform_voice')
    data_root = str(root / 'data')
    id_lists = generate_voice_data(data_root, num_train=12, num_valid=4,
                                   num_test=2, seed=4,
                                   dur_range=(5, 6), n_phones_range=(12, 13))
    return {'data_root': data_root, 'id_lists': id_lists}


def _run(voice_data, tmp_path, name, **overrides):
    defaults = dict(end_epoch=2, valid=True, batch_size=2)
    defaults.update(overrides)
    args = builder_args(voice_data['data_root'],
                        str(tmp_path / 'experiments'), **defaults)
    nn.manual_seed(args['seed'])
    exp = ExperimentBuilder(TinyF0Model, experiment_name=name, **args)
    exp.run_experiment()
    return exp


def _valid_losses(exp, epochs=(1, 2)):
    losses = []
    for epoch in epochs:
        with open(os.path.join(exp.experiment_dir, 'valid',
                               f'epoch_{epoch}', 'metrics.json')) as f:
            losses.append(json.load(f)['loss'])
    return losses


def _params(exp, epoch=2, ema=False):
    suffix = '_ema' if ema else ''
    path = os.path.join(exp.experiment_dir, 'checkpoints',
                        f'epoch_{epoch}{suffix}.npz')
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _assert_params_close(a, b, rtol=1e-6, atol=1e-7):
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_allclose(a[key], b[key], rtol=rtol, atol=atol,
                                   err_msg=key)


class TestTrajectoryParity:
    def test_matches_per_batch_path(self, uniform_voice_data, tmp_path):
        base = _run(uniform_voice_data, tmp_path, 'chain_off', device_cache=True)
        chained = _run(uniform_voice_data, tmp_path, 'chain_on', device_cache=True,
                       steps_per_dispatch=4)
        # The chain compiled and ran (consecutive same-bucket batches exist
        # in the tiny corpus) — otherwise this test proves nothing.
        assert chained.loop._chain_fns, 'no chained program was ever built'
        np.testing.assert_allclose(_valid_losses(chained),
                                   _valid_losses(base), rtol=1e-6)
        _assert_params_close(_params(chained), _params(base))

    def test_dropout_rng_matches(self, uniform_voice_data, tmp_path):
        """Stateless per-step RNG: fold_in(base, step) inside the scan must
        draw the SAME dropout masks the per-batch path draws — with dropout
        on, any RNG drift diverges the parameters immediately."""
        kwargs = dict(device_cache=True,
                      model_kwargs={'dropout_prob': 0.5})
        base = _run(uniform_voice_data, tmp_path, 'chain_do_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'chain_do_on',
                       steps_per_dispatch=3, **kwargs)
        assert chained.loop._chain_fns
        _assert_params_close(_params(chained), _params(base))

    def test_batch_level_lr_schedule_matches(self, uniform_voice_data, tmp_path):
        """noam steps once per applied batch; the chain precomputes the
        per-step lr vector, which must reproduce the schedule exactly."""
        kwargs = dict(device_cache=True, lr_schedule_name='noam',
                      lr_schedule_kwargs={'warmup_steps': 4})
        base = _run(uniform_voice_data, tmp_path, 'chain_noam_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'chain_noam_on',
                       steps_per_dispatch=4, **kwargs)
        assert chained.loop._chain_fns
        _assert_params_close(_params(chained), _params(base))

    def test_ema_matches(self, uniform_voice_data, tmp_path):
        kwargs = dict(device_cache=True, ema_decay=0.9)
        base = _run(uniform_voice_data, tmp_path, 'chain_ema_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'chain_ema_on',
                       steps_per_dispatch=4, **kwargs)
        assert chained.loop._chain_fns
        _assert_params_close(_params(chained, ema=True),
                             _params(base, ema=True))

    def test_data_parallel_chain_matches(self, uniform_voice_data, tmp_path):
        kwargs = dict(device_cache=True, data_parallel=True, batch_size=8)
        base = _run(uniform_voice_data, tmp_path, 'chain_dp_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'chain_dp_on',
                       steps_per_dispatch=2, **kwargs)
        np.testing.assert_allclose(_valid_losses(chained),
                                   _valid_losses(base), rtol=1e-6)
        _assert_params_close(_params(chained), _params(base))

    def test_log_norms_in_chain(self, uniform_voice_data, tmp_path):
        base = _run(uniform_voice_data, tmp_path, 'chain_ln_off',
                    device_cache=True, log_norms=True)
        chained = _run(uniform_voice_data, tmp_path, 'chain_ln_on',
                       device_cache=True, log_norms=True,
                       steps_per_dispatch=4)
        assert chained.loop._chain_fns
        for epoch in (1, 2):
            with open(os.path.join(chained.experiment_dir, 'train',
                                   f'epoch_{epoch}', 'metrics.json')) as fc, \
                 open(os.path.join(base.experiment_dir, 'train',
                                   f'epoch_{epoch}', 'metrics.json')) as fb:
                got, want = json.load(fc), json.load(fb)
            for key in ('grad_norm', 'param_norm', 'update_norm', 'loss'):
                np.testing.assert_allclose(got[key], want[key], rtol=1e-5,
                                           err_msg=f'epoch {epoch} {key}')

    def test_length_sorted_orders_match(self, uniform_voice_data, tmp_path):
        """--length_sort_window: the chained grouping records lengths at the
        same cadence as the cached streaming iterator, so epoch orders (and
        therefore the trained parameters) agree."""
        kwargs = dict(device_cache=True, length_sort_window=1)
        base = _run(uniform_voice_data, tmp_path, 'chain_ls_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'chain_ls_on',
                       steps_per_dispatch=4, **kwargs)
        _assert_params_close(_params(chained), _params(base))


class TestChainedAccumulation:
    """--steps_per_dispatch composed with --grad_accum_steps: the chain runs
    micro-batch steps and applies the optimiser every Nth one (lax.cond on a
    host-computed apply schedule), with open cycles carried across chain
    boundaries. Every test pins the chained-accumulation trajectory to the
    UNCHAINED accumulation path (which is itself pinned to the big-batch
    step in test_grad_accum.py)."""

    def test_matches_unchained_accumulation(self, uniform_voice_data,
                                            tmp_path):
        kwargs = dict(device_cache=True, grad_accum_steps=2)
        base = _run(uniform_voice_data, tmp_path, 'acc_chain_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'acc_chain_on',
                       steps_per_dispatch=4, **kwargs)
        assert chained.loop._chain_fns, 'no chained program was ever built'
        np.testing.assert_allclose(_valid_losses(chained),
                                   _valid_losses(base), rtol=1e-6)
        _assert_params_close(_params(chained), _params(base))

    def test_cycle_crosses_chain_boundary(self, uniform_voice_data,
                                          tmp_path):
        """grad_accum_steps=4 with chains of 3: every cycle spans two chain
        calls, so the accumulator must survive the chain boundary intact.
        The epoch has 6 batches, so the second cycle is also force-closed
        at epoch end with only 2 micro-batches (remainder-cycle inv_items)."""
        kwargs = dict(device_cache=True, grad_accum_steps=4)
        base = _run(uniform_voice_data, tmp_path, 'acc_cross_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'acc_cross_on',
                       steps_per_dispatch=3, **kwargs)
        assert chained.loop._chain_fns
        _assert_params_close(_params(chained), _params(base))

    def test_singleton_and_chain_share_cycle(self, uniform_voice_data,
                                             tmp_path):
        """steps_per_dispatch=5 over 6 uniform batches groups as 5 + 1: the
        trailing singleton goes through the ordinary train_step, which must
        continue (and force-close) the cycle the chain left open."""
        kwargs = dict(device_cache=True, grad_accum_steps=2)
        base = _run(uniform_voice_data, tmp_path, 'acc_single_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'acc_single_on',
                       steps_per_dispatch=5, **kwargs)
        assert chained.loop._chain_fns
        _assert_params_close(_params(chained), _params(base))

    def test_ema_updates_only_on_applied_steps(self, uniform_voice_data,
                                               tmp_path):
        kwargs = dict(device_cache=True, grad_accum_steps=2, ema_decay=0.9)
        base = _run(uniform_voice_data, tmp_path, 'acc_ema_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'acc_ema_on',
                       steps_per_dispatch=4, **kwargs)
        assert chained.loop._chain_fns
        _assert_params_close(_params(chained, ema=True),
                             _params(base, ema=True))

    def test_batch_lr_schedule_steps_on_applied_only(self, uniform_voice_data,
                                                     tmp_path):
        """noam advances once per APPLIED step under accumulation; the
        chain's precomputed lr vector must reproduce that cadence."""
        kwargs = dict(device_cache=True, grad_accum_steps=2,
                      lr_schedule_name='noam',
                      lr_schedule_kwargs={'warmup_steps': 2})
        base = _run(uniform_voice_data, tmp_path, 'acc_noam_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'acc_noam_on',
                       steps_per_dispatch=4, **kwargs)
        assert chained.loop._chain_fns
        _assert_params_close(_params(chained), _params(base))

    def test_composes_with_device_normalise(self, uniform_voice_data,
                                             tmp_path):
        """Accumulating chains run the same post-assembly device transform
        (--device_normalise) as every other cached path — raw-only arenas,
        normalisation inside the scan body."""
        kwargs = dict(device_cache=True, device_normalise=True,
                      grad_accum_steps=2)
        base = _run(uniform_voice_data, tmp_path, 'acc_dn_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'acc_dn_on',
                       steps_per_dispatch=4, **kwargs)
        assert chained.loop._chain_fns
        _assert_params_close(_params(chained), _params(base))

    def test_log_norms_matches_unchained(self, uniform_voice_data,
                                         tmp_path):
        """chain + accumulation + --log_norms (the flagship observability
        combination, refused until round 5): the chain stages the three norm
        diagnostics every micro-step masked by the apply flag, so the merged
        per-epoch norms — and the trained parameters — match the unchained
        accumulation path exactly."""
        kwargs = dict(device_cache=True, grad_accum_steps=2, log_norms=True)
        base = _run(uniform_voice_data, tmp_path, 'acc_ln_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'acc_ln_on',
                       steps_per_dispatch=4, **kwargs)
        assert chained.loop._chain_fns, 'no chained program was ever built'
        _assert_params_close(_params(chained), _params(base))
        for epoch in (1, 2):
            with open(os.path.join(chained.experiment_dir, 'train',
                                   f'epoch_{epoch}', 'metrics.json')) as fc, \
                 open(os.path.join(base.experiment_dir, 'train',
                                   f'epoch_{epoch}', 'metrics.json')) as fb:
                got, want = json.load(fc), json.load(fb)
            for key in ('grad_norm', 'param_norm', 'update_norm', 'loss'):
                np.testing.assert_allclose(got[key], want[key], rtol=1e-5,
                                           err_msg=f'epoch {epoch} {key}')

    def test_apply_schedule_unit(self):
        """chain_apply_schedule: pure simulation of the cycle counters."""
        from morgana_tpu.training import TrainLoop
        loop = TrainLoop.__new__(TrainLoop)
        loop.grad_accum_steps = 3
        loop._micro_count, loop._acc_items = 1, 4  # open cycle: 1 micro, 4 items
        flags, invs = loop.chain_apply_schedule(5, 2)
        assert flags == [False, True, False, False, True]
        #   items: 4+2=6 (no), 8 -> apply 1/8; then 2 (no), 4 (no), 6 -> 1/6
        np.testing.assert_allclose(invs, [0.0, 1 / 8, 0.0, 0.0, 1 / 6])
        # force_apply_last closes a cycle that would otherwise stay open.
        flags, invs = loop.chain_apply_schedule(2, 2, force_apply_last=True)
        assert flags == [False, True]
        np.testing.assert_allclose(invs, [0.0, 1 / 8])
        # Without accumulation every step applies.
        loop.grad_accum_steps = 1
        flags, invs = loop.chain_apply_schedule(3, 4)
        assert flags == [True, True, True]


class TestFallbacksAndConflicts:
    def test_generation_epochs_fall_back(self, voice_data, tmp_path):
        """train_output_interval epochs need per-batch outputs for the
        analysis hooks — the chained epoch falls back to the per-batch loop
        and the run still completes (and matches the unchained run, since
        fallback epochs ARE the per-batch path)."""
        kwargs = dict(device_cache=True, train_output_interval=2,
                      valid=False)
        base = _run(voice_data, tmp_path, 'chain_gen_off', **kwargs)
        chained = _run(voice_data, tmp_path, 'chain_gen_on',
                       steps_per_dispatch=4, **kwargs)
        _assert_params_close(_params(chained), _params(base))

    def test_streaming_fallback_still_trains(self, voice_data, tmp_path):
        """Device cache over budget -> streaming loader -> per-batch loop;
        --steps_per_dispatch must degrade gracefully, not crash."""
        exp = _run(voice_data, tmp_path, 'chain_nocache',
                   device_cache=True, device_cache_gb=1e-7,
                   steps_per_dispatch=4)
        assert np.isfinite(_valid_losses(exp)).all()
        assert not exp.loop._chain_fns

    def test_steps_imply_device_cache(self, voice_data, tmp_path):
        """--steps_per_dispatch N implies --device_cache (chains assemble
        from the device-resident corpus); only an explicit
        --no-device_cache conflicts."""
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            steps_per_dispatch=4)
        exp = ExperimentBuilder(TinyF0Model, experiment_name='c_imp', **args)
        assert exp.device_cache and exp.steps_per_dispatch == 4
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            steps_per_dispatch=4, device_cache=False)
        with pytest.raises(ValueError, match='device_cache'):
            ExperimentBuilder(TinyF0Model, experiment_name='c_nodc', **args)

    def test_conflicts_with_shard_map_step(self, voice_data, tmp_path):
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            device_cache=True, steps_per_dispatch=4,
                            batch_size=8, data_parallel=True,
                            shard_map_step=True)
        with pytest.raises(ValueError, match='shard_map'):
            ExperimentBuilder(TinyF0Model, experiment_name='c_sm', **args)

    def test_flag_surface(self):
        # Default is AUTO (None): resolved at init — 16 when the device
        # cache is active and the dispatch round trip is >= 5 ms, else 1.
        args = ExperimentBuilder.get_experiment_args(['--experiment_name', 'x'])
        assert args['steps_per_dispatch'] is None
        args = ExperimentBuilder.get_experiment_args(
            ['--experiment_name', 'x', '--steps_per_dispatch', '16'])
        assert args['steps_per_dispatch'] == 16


class TestUnits:
    def test_apply_staged_stacked_rows_match_per_step(self):
        """Handler.apply_staged(steps=N) must merge exactly like N separate
        per-step applies."""
        import jax.numpy as jnp
        from morgana_tpu import metrics as metrics_mod

        def fresh():
            h = metrics_mod.Handler()
            h.add_metrics(('train',), m=metrics_mod.Mean(),
                          r=metrics_mod.RMSE())
            return h

        # Three steps of partials, staged through the keyed-dict protocol.
        per_step = []
        ref = fresh()
        for step in range(3):
            ref.begin_staging('train')
            ref.accumulate('train', m=jnp.float32(step + 1.5))
            ref.accumulate('train', r=(jnp.full((4,), float(step)),
                                       jnp.zeros((4,))))
            per_step.append(ref.drain_staged_values())
        for staged in per_step:
            ref.apply_staged(staged, tag='train')

        stacked = {key: jnp.stack([s[key] if not isinstance(s[key], dict)
                                   else s[key] for s in per_step])
                   if not isinstance(per_step[0][key], dict) else
                   {leaf: jnp.stack([s[key][leaf] for s in per_step])
                    for leaf in per_step[0][key]}
                   for key in per_step[0]}
        chained = fresh()
        chained.apply_staged(stacked, tag='train', steps=3)

        want = ref.results_as_json_dict('train')
        got = chained.results_as_json_dict('train')
        assert want and got == pytest.approx(want)

    def test_chain_groups_consecutive_same_signature(self, voice_data,
                                                     tmp_path):
        """Groups cap at steps_per_dispatch and break on signature changes;
        concatenated groups reproduce the loader's batch order exactly."""
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            device_cache=True, steps_per_dispatch=2,
                            batch_size=2, train=False, valid=True,
                            checkpoint_path=None, end_epoch=0)
        # Builder needs eval-vs-checkpoint conflict satisfied; build the
        # pieces directly instead.
        from morgana_tpu import data
        from morgana_tpu.data.device_cache import DeviceCorpusCache
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
        model = TinyF0Model()
        norms = model.normaliser_sources()
        for norm in norms.values():
            norm.load_params('train', voice_data['data_root'])
        dataset = data.FilesDataset(
            model.train_data_sources(), 'train',
            'train/train_file_id_list.scp', norms, voice_data['data_root'])
        cache = DeviceCorpusCache(dataset)
        wrapper = data.batch(dataset, batch_size=2, shuffle=True, seed=11,
                             device_cache=cache)
        loader = wrapper.data_loader

        class Host:
            steps_per_dispatch = 2
        groups = list(ExperimentBuilder._chain_groups(Host(), loader, cache))
        assert all(len(g) <= 2 for g, _ in groups)
        flat = np.concatenate([g.reshape(-1) for g, _ in groups])
        loader.set_epoch(loader.epoch - 1)  # replay the same shuffle
        order = np.concatenate(loader.iter_batch_indices())
        np.testing.assert_array_equal(flat, order)
        for g, lengths in groups:
            sigs = {cache.batch_signature(row) for row in g}
            assert len(sigs) == 1
            # The yielded lengths are the group's shared padded lengths.
            assert cache.batch_signature(g[0], lengths=lengths) in sigs


class TestChainedValidation:
    """--steps_per_dispatch applies to validation epochs too: consecutive
    same-shape batches evaluate as one compiled scan (TrainLoop.eval_chain),
    with the per-batch RNG key stream reproduced exactly."""

    def test_valid_chain_builds_and_matches(self, uniform_voice_data, tmp_path):
        base = _run(uniform_voice_data, tmp_path, 'vchain_off',
                    device_cache=True)
        chained = _run(uniform_voice_data, tmp_path, 'vchain_on',
                       device_cache=True, steps_per_dispatch=4)
        assert chained.loop._eval_chain_fns, \
            'no chained eval program was ever built'
        np.testing.assert_allclose(_valid_losses(chained),
                                   _valid_losses(base), rtol=1e-6)

    def test_vae_stochastic_eval_rng_matches(self, uniform_voice_data,
                                             tmp_path):
        """BaseVAE samples a latent from the carried RNG stream during eval;
        the chained epoch must consume exactly the key sequence the
        per-batch loop draws, or valid losses drift."""
        from tiny_models import TinyVAE

        def run(name, **overrides):
            args = builder_args(uniform_voice_data['data_root'],
                                str(tmp_path / 'experiments'),
                                end_epoch=2, valid=True, batch_size=2,
                                device_cache=True, **overrides)
            nn.manual_seed(args['seed'])
            exp = ExperimentBuilder(TinyVAE, experiment_name=name, **args)
            exp.run_experiment()
            return exp

        base = run('vchain_vae_off')
        chained = run('vchain_vae_on', steps_per_dispatch=3)
        assert chained.loop._eval_chain_fns
        np.testing.assert_allclose(_valid_losses(chained),
                                   _valid_losses(base), rtol=1e-6)

    def test_ema_valid_chain_uses_ema_params(self, uniform_voice_data,
                                             tmp_path):
        kwargs = dict(device_cache=True, ema_decay=0.9)
        base = _run(uniform_voice_data, tmp_path, 'vchain_ema_off', **kwargs)
        chained = _run(uniform_voice_data, tmp_path, 'vchain_ema_on',
                       steps_per_dispatch=4, **kwargs)
        assert chained.loop._eval_chain_fns
        np.testing.assert_allclose(_valid_losses(chained),
                                   _valid_losses(base), rtol=1e-6)

    def test_valid_metrics_match_per_batch(self, uniform_voice_data,
                                           tmp_path):
        """Staged metric partials stacked over the eval scan axis merge to
        the same per-epoch values as per-batch staging (LF0 RMSE etc., not
        just the loss column)."""
        base = _run(uniform_voice_data, tmp_path, 'vchain_m_off',
                    device_cache=True)
        chained = _run(uniform_voice_data, tmp_path, 'vchain_m_on',
                       device_cache=True, steps_per_dispatch=4)
        for epoch in (1, 2):
            with open(os.path.join(chained.experiment_dir, 'valid',
                                   f'epoch_{epoch}', 'metrics.json')) as fc, \
                 open(os.path.join(base.experiment_dir, 'valid',
                                   f'epoch_{epoch}', 'metrics.json')) as fb:
                got, want = json.load(fc), json.load(fb)
            assert set(got) == set(want)
            for key in want:
                np.testing.assert_allclose(got[key], want[key], rtol=1e-5,
                                           err_msg=f'epoch {epoch} {key}')


class TestChainParallelCompositions:
    def test_chain_matches_per_batch_under_tensor_parallel(self, rng):
        """--steps_per_dispatch composes with --tensor_parallel: 'model'-axis
        sharded parameters flow through the chained scan unchanged and the
        trajectory is bitwise the per-batch TP path's."""
        from morgana_tpu import parallel
        from morgana_tpu.data.device_cache import DeviceCorpusCache
        from test_fsdp import _make_loop
        from test_parallel import _synthetic_batch

        mesh = parallel.make_mesh(num_data=4, num_model=2)
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
            loop = _make_loop(9)
            loop.params = parallel.shard_params(loop.params, mesh,
                                                tensor_parallel=True)
            assert any('model' in tuple(v.sharding.spec)
                       for v in loop.params.values())
            if label == 'per-batch':
                for row in idx_mat:
                    loop.train_step(cache.assemble(row, bucket=False),
                                    lr=1e-3)
            else:
                loop.train_chain(cache, idx_mat, [1e-3] * steps,
                                 batch_sharding=sharding, bucket=False)
            results[label] = {k: np.asarray(v)
                              for k, v in loop.params.items()}
        for k in results['per-batch']:
            np.testing.assert_array_equal(results['chained'][k],
                                          results['per-batch'][k],
                                          err_msg=k)
