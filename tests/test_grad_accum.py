"""Gradient accumulation (--grad_accum_steps): N accumulated micro-batches
must be numerically identical to one optimiser step on their concatenation
(``losses.sequence_loss`` is a mean over batch items, so averaging the summed
micro-gradients IS the concatenated-batch gradient)."""
import numpy as np
import pytest

from conftest import builder_args
from tiny_models import TinyF0Model

from morgana_tpu import nn
from morgana_tpu.training import TrainLoop, build_optimizer
from test_parallel import _synthetic_batch


def _make_loop(seed=3, **kwargs):
    nn.manual_seed(seed)
    model = TinyF0Model()
    norm = model.normaliser_sources()['lf0']
    norm.params = {'mean': np.zeros(1, np.float32), 'std_dev': np.ones(1, np.float32)}
    norm.delta_params = {'mean': np.zeros(3, np.float32), 'std_dev': np.ones(3, np.float32)}
    model.normalisers = {'lf0': norm}
    model.mode = 'train'
    return TrainLoop(model, build_optimizer(), seed=0, **kwargs)


def _concat(batches):
    return {k: np.concatenate([b[k] for b in batches], axis=0)
            for k in batches[0]}


class TestCycleEquivalence:
    def test_two_micro_batches_match_concatenated(self, rng):
        micro = [_synthetic_batch(rng, batch=4) for _ in range(2)]

        loop_a = _make_loop(ema_decay=0.99, grad_accum_steps=2)
        losses = []
        for b in micro:
            loss, _, _ = loop_a.train_step(b, lr=0.01)
            losses.append(float(loss))
        assert loop_a.last_step_applied

        loop_b = _make_loop(ema_decay=0.99)
        loss_big, _, _ = loop_b.train_step(_concat(micro), lr=0.01)

        # Concatenated-batch loss is the mean of the micro losses (equal B).
        np.testing.assert_allclose(np.mean(losses), float(loss_big), rtol=1e-5)
        for k, v in loop_a.params.items():
            np.testing.assert_allclose(np.asarray(v), np.asarray(loop_b.params[k]),
                                       atol=1e-6)
        # EMA updated exactly once per cycle, from the same applied params.
        for k, v in loop_a.ema_params.items():
            np.testing.assert_allclose(np.asarray(v),
                                       np.asarray(loop_b.ema_params[k]), atol=1e-6)

    def test_unequal_micro_batches_match_concatenated(self, rng):
        """A remainder-size final micro-batch contributes per-SAMPLE, not
        per-batch: gradients are weighted by item count, so the cycle matches
        one step on the 4+2=6-item concatenation exactly."""
        micro = [_synthetic_batch(rng, batch=4), _synthetic_batch(rng, batch=2)]

        loop_a = _make_loop(grad_accum_steps=2)
        for b in micro:
            loop_a.train_step(b, lr=0.01)
        assert loop_a.last_step_applied

        loop_b = _make_loop()
        loss_big, _, _ = loop_b.train_step(_concat(micro), lr=0.01)

        for k, v in loop_a.params.items():
            np.testing.assert_allclose(np.asarray(v), np.asarray(loop_b.params[k]),
                                       atol=1e-6)

    def test_accum_steps_do_not_touch_params(self, rng):
        loop = _make_loop(grad_accum_steps=3)
        before = {k: np.asarray(v) for k, v in loop.params.items()}
        for i in range(2):
            loop.train_step(_synthetic_batch(rng, batch=4), lr=0.01)
            assert not loop.last_step_applied
            for k, v in loop.params.items():
                np.testing.assert_array_equal(np.asarray(v), before[k])
        loop.train_step(_synthetic_batch(rng, batch=4), lr=0.01)
        assert loop.last_step_applied
        assert any(not np.array_equal(np.asarray(v), before[k])
                   for k, v in loop.params.items())

    def test_force_apply_closes_short_cycle(self, rng):
        """A forced apply right after one accumulated micro-batch averages
        over the actual count (2), matching a plain N=2 cycle."""
        micro = [_synthetic_batch(rng, batch=4) for _ in range(2)]

        loop_a = _make_loop(grad_accum_steps=4)
        loop_a.train_step(micro[0], lr=0.01)
        loop_a.train_step(micro[1], lr=0.01, force_apply=True)
        assert loop_a.last_step_applied

        loop_b = _make_loop(grad_accum_steps=2)
        for b in micro:
            loop_b.train_step(b, lr=0.01)

        for k, v in loop_a.params.items():
            np.testing.assert_allclose(np.asarray(v), np.asarray(loop_b.params[k]),
                                       atol=1e-7)
        # The next cycle starts clean: another full-N cycle applies on time.
        for b in micro:
            loop_a.train_step(b, lr=0.01)
            loop_b.train_step(b, lr=0.01)
        assert not loop_a.last_step_applied  # 2 of 4 accumulated
        assert loop_b.last_step_applied


class TestBuilderFlag:
    def test_runs_and_steps_batch_schedule_per_apply(self, voice_data, tmp_path):
        from morgana_tpu.experiment_builder import ExperimentBuilder

        args = builder_args(voice_data['data_root'], str(tmp_path / 'experiments'),
                            end_epoch=1, valid=False, grad_accum_steps=2,
                            lr_schedule_name='noam',
                            lr_schedule_kwargs={'warmup_steps': 4})
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='ga', **args)
        num_batches = len(exp.train_loader)
        exp.run_experiment()
        # Every batch ran, but only ceil(num_batches / 2) optimiser updates
        # (the last batch force-closes an odd tail cycle).
        assert exp.loop.step_count == num_batches
        assert exp.loop._micro_count == 0 and exp.loop.last_step_applied

    def test_conflicts_with_shard_map_step(self, voice_data, tmp_path):
        from morgana_tpu.experiment_builder import ExperimentBuilder

        args = builder_args(voice_data['data_root'], str(tmp_path / 'experiments'),
                            grad_accum_steps=2, data_parallel=True,
                            shard_map_step=True, batch_size=8)
        with pytest.raises(ValueError, match='grad_accum_steps'):
            ExperimentBuilder(TinyF0Model, experiment_name='ga_conflict', **args)
