"""Gradient observability (``--log_norms``): grad/param/update global norms
staged out of the fused train step into per-epoch train metrics.

The reference has no gradient observability at all (its loop logs only the
loss, ``morgana/experiment_builder.py:480-490``); here the three norms are
computed inside the compiled step (no host syncs) and ride the staged-metric
protocol like any other metric."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from conftest import builder_args
from test_memory import _make_loop
from test_parallel import _synthetic_batch
from tiny_models import TinyF0Model

from morgana_tpu import nn, training
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu.training import TrainLoop, build_optimizer


class TestLoopNorms:
    def test_norms_match_manual_computation(self, rng):
        lr = 0.01
        loop = _make_loop(log_norms=True)
        batch = training.numeric_features(_synthetic_batch(rng, batch=4))
        # Host copies: the loop's live buffers are donated into the step.
        params0 = jax.tree_util.tree_map(np.array, loop.params)

        # Expected raw gradient at the pre-step parameters, same rng/step.
        rng_step = loop._train_rng()
        step_batch = dict(batch, global_step=jnp.asarray(0, jnp.int32))
        loop.model.metrics.reset_state('train')
        _, _, _, grads = training.staged_value_and_grad(
            loop.model, jax.tree_util.tree_map(jnp.asarray, params0),
            step_batch, rng_step)
        expected_gnorm = float(optax.global_norm(grads))

        loop.model.metrics.reset_state('train')
        _, staged, _ = loop.train_step(batch, lr=lr)
        loop.model.metrics.apply_staged(staged, tag='train')

        handler = loop.model.metrics
        got_gnorm = float(handler['train']['grad_norm'].result())
        got_pnorm = float(handler['train']['param_norm'].result())
        got_unorm = float(handler['train']['update_norm'].result())

        assert got_gnorm == pytest.approx(expected_gnorm, rel=1e-5)
        # param_norm is the POST-update parameter norm.
        expected_pnorm = float(optax.global_norm(loop.params))
        assert got_pnorm == pytest.approx(expected_pnorm, rel=1e-5)
        # update_norm is the norm of the actual parameter change (lr folded
        # in): with plain Adam-free build_optimizer() defaults this is the
        # exact delta between pre- and post-step parameters.
        delta = jax.tree_util.tree_map(
            lambda a, b: np.asarray(a, np.float64) - np.asarray(b, np.float64),
            params0, loop.params)
        expected_unorm = float(np.sqrt(sum(
            float(np.sum(x * x)) for x in jax.tree_util.tree_leaves(delta))))
        assert got_unorm == pytest.approx(expected_unorm, rel=1e-4)
        assert got_gnorm > 0 and got_pnorm > 0 and got_unorm > 0

    def test_registers_metrics_once(self):
        loop = _make_loop(log_norms=True)
        for name in ('grad_norm', 'param_norm', 'update_norm'):
            assert name in loop.model.metrics['train']
        # Not in the valid collection: eval steps stage no norms.
        assert 'grad_norm' not in loop.model.metrics['valid']

    def test_accum_logs_only_applied_steps(self, rng):
        """With grad_accum_steps=N, norms are staged only when the optimiser
        actually applies (micro-gradient norms are not the applied-gradient
        norm) — the Mean's count equals the number of applied updates."""
        loop = _make_loop(grad_accum_steps=2, log_norms=True)
        handler = loop.model.metrics
        handler.reset_state('train')
        for i in range(4):
            batch = training.numeric_features(_synthetic_batch(rng, batch=4))
            _, staged, _ = loop.train_step(batch, lr=0.01)
            handler.apply_staged(staged, tag='train')
        assert handler['train']['grad_norm'].count == 2
        assert handler['train']['update_norm'].count == 2

    def test_accum_norm_equals_big_batch_norm(self, rng):
        """The applied-cycle gradient norm equals the norm a single step on
        the concatenated batch would log (accumulation is per-sample exact)."""
        b1 = _synthetic_batch(rng, batch=4)
        b2 = {k: np.concatenate([v, v]) for k, v in b1.items()}

        loop_a = _make_loop(grad_accum_steps=2, log_norms=True)
        ha = loop_a.model.metrics
        ha.reset_state('train')
        for _ in range(2):
            _, staged, _ = loop_a.train_step(
                training.numeric_features(b1), lr=0.01)
            ha.apply_staged(staged, tag='train')
        norm_accum = float(ha['train']['grad_norm'].result())

        loop_b = _make_loop(log_norms=True)
        hb = loop_b.model.metrics
        hb.reset_state('train')
        # Match the accumulation loop's rng for the applied step? Dropout is
        # off in TinyF0Model (prob 0), so gradients are rng-independent; the
        # two micro-batches are identical so the mean gradient equals the
        # single-batch gradient on the doubled batch.
        _, staged, _ = loop_b.train_step(
            training.numeric_features(b2), lr=0.01)
        hb.apply_staged(staged, tag='train')
        norm_big = float(hb['train']['grad_norm'].result())
        assert norm_accum == pytest.approx(norm_big, rel=1e-5)

    def test_shard_map_norms_match_gspmd(self, rng):
        """The explicit shard_map step stages the same norm diagnostics as
        the fused GSPMD step (round 5: computed on the post-pmean gradients
        and post-update parameters — replicated values, no extra
        collective)."""
        batch = _synthetic_batch(rng, batch=8)
        loop_a = _make_loop(log_norms=True)
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ('data',))
        loop_b = _make_loop(shard_map_mesh=mesh, log_norms=True)

        for loop in (loop_a, loop_b):
            handler = loop.model.metrics
            handler.reset_state('train')
            _, staged, _ = loop.train_step(
                training.numeric_features(batch), lr=0.01)
            handler.apply_staged(staged, tag='train')
        for name in ('grad_norm', 'param_norm', 'update_norm'):
            a = float(loop_a.model.metrics['train'][name].result())
            b = float(loop_b.model.metrics['train'][name].result())
            assert a == pytest.approx(b, rel=1e-5), name


class TestBuilderLogNorms:
    def test_metrics_json_contains_norms(self, voice_data, tmp_path):
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            end_epoch=2, log_norms=True)
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='norms', **args)
        exp.run_experiment()
        train_metrics = json.load(open(os.path.join(
            exp.experiment_dir, 'train', 'epoch_2', 'metrics.json')))
        for name in ('grad_norm', 'param_norm', 'update_norm'):
            assert name in train_metrics, train_metrics.keys()
            assert np.isfinite(train_metrics[name])
            assert train_metrics[name] > 0
        # Eval epochs stage no norms — the keys stay out of valid metrics.
        valid_metrics = json.load(open(os.path.join(
            exp.experiment_dir, 'valid', 'epoch_2', 'metrics.json')))
        assert 'grad_norm' not in valid_metrics

    def test_shard_map_step_logs_norms(self, voice_data, tmp_path):
        """--log_norms + --shard_map_step composes (round 5): the explicit
        step stages the post-pmean norms and they land in metrics.json."""
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            log_norms=True, data_parallel=True,
                            shard_map_step=True, batch_size=8, end_epoch=1)
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='sm_norms',
                                **args)
        exp.run_experiment()
        train_metrics = json.load(open(os.path.join(
            exp.experiment_dir, 'train', 'epoch_1', 'metrics.json')))
        for name in ('grad_norm', 'param_norm', 'update_norm'):
            assert name in train_metrics and np.isfinite(train_metrics[name])
            assert train_metrics[name] > 0
