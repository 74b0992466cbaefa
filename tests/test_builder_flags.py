"""CLI-reachable runtime paths: --orbax_dir (async full-state checkpoints +
resume) and --shard_map_step (explicit-collective DP step)."""
import os

import jax
import numpy as np
import pytest

from conftest import builder_args
from tiny_models import TinyF0Model

from morgana_tpu import checkpointing, nn
from morgana_tpu.experiment_builder import ExperimentBuilder


def _build(voice_data, tmp_path, name, **overrides):
    args = builder_args(voice_data['data_root'], str(tmp_path / 'experiments'),
                        **overrides)
    nn.manual_seed(args['seed'])
    return ExperimentBuilder(TinyF0Model, experiment_name=name, **args)


@pytest.mark.skipif(not checkpointing.orbax_available(), reason='needs orbax')
class TestOrbaxFlag:
    def test_save_and_resume(self, voice_data, tmp_path):
        orbax_dir = str(tmp_path / 'orbax')
        exp1 = _build(voice_data, tmp_path, 'ob1', end_epoch=1, valid=False,
                      orbax_dir=orbax_dir)
        exp1.run_experiment()
        final = {k: np.asarray(v) for k, v in exp1.loop.params.items()}
        assert os.path.isdir(orbax_dir) and os.listdir(orbax_dir)

        # A new builder with the same orbax dir resumes params + step.
        exp2 = _build(voice_data, tmp_path, 'ob2', start_epoch=2, end_epoch=2,
                      valid=False, orbax_dir=orbax_dir)
        assert exp2.loop.step_count == exp1.loop.step_count
        for k, v in exp2.loop.params.items():
            np.testing.assert_allclose(np.asarray(v), final[k])

    def test_empty_dir_starts_fresh(self, voice_data, tmp_path):
        exp = _build(voice_data, tmp_path, 'ob_fresh', end_epoch=1, valid=False,
                     orbax_dir=str(tmp_path / 'nonexistent_orbax'))
        assert exp.loop.step_count == 0

    def test_resume_bumps_start_epoch(self, voice_data, tmp_path):
        """Relaunching the SAME command resumes after the saved epoch instead
        of retraining from epoch 1 on restored params."""
        orbax_dir = str(tmp_path / 'orbax')
        exp1 = _build(voice_data, tmp_path, 'ob_bump', end_epoch=2, valid=False,
                      orbax_dir=orbax_dir)
        exp1.run_experiment()
        exp2 = _build(voice_data, tmp_path, 'ob_bump2', end_epoch=3, valid=False,
                      orbax_dir=orbax_dir)
        assert exp2.start_epoch == 3

    def test_resume_restores_lr_schedule_state(self, voice_data, tmp_path):
        """A batch-level schedule (noam) must continue from its saved step
        after an Orbax resume, not re-enter warmup at schedule-step 0."""
        orbax_dir = str(tmp_path / 'orbax')
        exp1 = _build(voice_data, tmp_path, 'ob_lr', end_epoch=2, valid=False,
                      orbax_dir=orbax_dir, lr_schedule_name='noam',
                      lr_schedule_kwargs={'warmup_steps': 10})
        exp1.run_experiment()
        exp2 = _build(voice_data, tmp_path, 'ob_lr2', end_epoch=3, valid=False,
                      orbax_dir=orbax_dir, lr_schedule_name='noam',
                      lr_schedule_kwargs={'warmup_steps': 10})
        assert exp2._restored_lr_state is not None
        assert exp2._restored_lr_state['last_epoch'] > 0


class TestLatestResume:
    def test_latest_resolves_and_bumps_start_epoch(self, voice_data, tmp_path):
        exp1 = _build(voice_data, tmp_path, 'lat', end_epoch=2, valid=False)
        exp1.run_experiment()

        exp2 = _build(voice_data, tmp_path, 'lat', end_epoch=3, valid=False,
                      checkpoint_path='latest')
        assert exp2.checkpoint_path.endswith('epoch_2.npz')
        assert exp2.start_epoch == 3
        exp2.run_experiment()
        ckpts = os.listdir(tmp_path / 'experiments' / 'lat' / 'checkpoints')
        assert 'epoch_3.npz' in ckpts

    def test_latest_with_no_checkpoints_starts_fresh(self, voice_data, tmp_path):
        exp = _build(voice_data, tmp_path, 'lat_fresh', end_epoch=1, valid=False,
                     checkpoint_path='latest')
        assert exp.checkpoint_path is None
        assert exp.start_epoch == 1

    def test_epoch_metrics_carry_timing(self, voice_data, tmp_path):
        import json
        exp = _build(voice_data, tmp_path, 'timing', end_epoch=1, valid=False)
        exp.run_experiment()
        m = json.load(open(tmp_path / 'experiments' / 'timing' / 'train' /
                           'epoch_1' / 'metrics.json'))
        assert m['epoch_duration_s'] > 0
        assert m['ms_per_step'] > 0
        assert m['frames_per_sec'] > 0


class TestEmergencyCheckpoint:
    def test_keyboard_interrupt_saves_state(self, voice_data, tmp_path,
                                            monkeypatch):
        exp = _build(voice_data, tmp_path, 'intr', end_epoch=3, valid=False)

        calls = {'n': 0}
        original = exp.train_epoch

        def interrupt_on_second(*args, **kwargs):
            calls['n'] += 1
            if calls['n'] == 2:
                raise KeyboardInterrupt
            return original(*args, **kwargs)

        monkeypatch.setattr(exp, 'train_epoch', interrupt_on_second)
        with pytest.raises(KeyboardInterrupt):
            exp.run_experiment()

        ckpts = os.listdir(tmp_path / 'experiments' / 'intr' / 'checkpoints')
        assert any('_interrupted' in f and f.endswith('.npz') for f in ckpts)
        assert any('_interrupted' in f and f.endswith('.train.pkl') for f in ckpts)
        # `latest` resolution ignores the interrupted file.
        exp2 = _build(voice_data, tmp_path, 'intr', end_epoch=3, valid=False,
                      checkpoint_path='latest')
        assert '_interrupted' not in (exp2.checkpoint_path or '')


class TestCheckpointRetention:
    def test_keep_last_n(self, voice_data, tmp_path):
        exp = _build(voice_data, tmp_path, 'keep', end_epoch=4, valid=False,
                     ema_decay=0.9, keep_checkpoints=2)
        exp.run_experiment()
        ckpts = sorted(os.listdir(tmp_path / 'experiments' / 'keep' / 'checkpoints'))
        epochs = sorted({int(f.split('_')[1].split('.')[0]) for f in ckpts})
        assert epochs == [3, 4]
        assert 'epoch_4_ema.npz' in ckpts and 'epoch_3.train.pkl' in ckpts

    def test_retention_preserves_emergency_checkpoints(self, voice_data,
                                                       tmp_path):
        """An old epoch's `_interrupted` emergency save must survive pruning
        — it exists precisely because that run never reached a clean later
        checkpoint."""
        exp = _build(voice_data, tmp_path, 'keep_intr', end_epoch=4,
                     valid=False, keep_checkpoints=2)
        ckpt_dir = tmp_path / 'experiments' / 'keep_intr' / 'checkpoints'
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        (ckpt_dir / 'epoch_1_interrupted.npz').write_bytes(b'x')
        exp.run_experiment()
        ckpts = sorted(os.listdir(ckpt_dir))
        assert 'epoch_1_interrupted.npz' in ckpts
        assert 'epoch_1.npz' not in ckpts and 'epoch_4.npz' in ckpts


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
class TestShardMapStepFlag:
    def test_trains_end_to_end(self, voice_data, tmp_path):
        exp = _build(voice_data, tmp_path, 'smap', end_epoch=2, valid=False,
                     batch_size=8, data_parallel=True, shard_map_step=True)
        assert exp.loop.shard_map_mesh is not None
        exp.run_experiment()
        import json
        expdir = tmp_path / 'experiments' / 'smap'
        m = json.load(open(expdir / 'train' / 'epoch_2' / 'metrics.json'))
        assert np.isfinite(m['loss'])

    def test_requires_data_parallel(self, voice_data, tmp_path):
        with pytest.raises(ValueError, match='requires --data_parallel'):
            _build(voice_data, tmp_path, 'smap_bad', shard_map_step=True)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
class TestShardedEvalTail:
    def test_partial_eval_batch_not_dropped(self, voice_data, tmp_path):
        """Under --data_parallel, valid/test utterances that do not fill a
        full sharded batch must still be evaluated (regression: they were
        silently dropped, skewing valid loss and skipping synthesis)."""
        exp = _build(voice_data, tmp_path, 'dp_tail', end_epoch=1,
                     batch_size=8, data_parallel=True)
        # 4 valid utterances < global batch 8: drop_remainder would make the
        # loader empty.
        assert len(exp.valid_loader) == 1
        exp.run_experiment()
        import json
        m = json.load(open(tmp_path / 'experiments' / 'dp_tail' / 'valid' /
                           'epoch_1' / 'metrics.json'))
        assert np.isfinite(m['loss'])


class TestExplicitCheckpointProtection:
    def test_ema_latest_does_not_bypass_overwrite_guard(self, voice_data,
                                                        tmp_path):
        """--ema_checkpoint_path latest next to an EXPLICIT --checkpoint_path
        must not silently bump start_epoch past the overwrite guard."""
        exp1 = _build(voice_data, tmp_path, 'guard', end_epoch=2, valid=False,
                      ema_decay=0.9)
        exp1.run_experiment()
        ckpt = str(tmp_path / 'experiments' / 'guard' / 'checkpoints' /
                   'epoch_2.npz')
        with pytest.raises(ValueError, match='start_epoch'):
            _build(voice_data, tmp_path, 'guard', end_epoch=3, valid=False,
                   ema_decay=0.9, checkpoint_path=ckpt,
                   ema_checkpoint_path='latest')


@pytest.mark.skipif(not checkpointing.orbax_available(), reason='needs orbax')
class TestOrbaxOverwrite:
    def test_saving_over_stale_step_succeeds(self, voice_data, tmp_path):
        """After a failed restore 'starts fresh', re-saving an epoch that
        already exists in the orbax dir must overwrite, not crash."""
        orbax_dir = str(tmp_path / 'orbax')
        exp1 = _build(voice_data, tmp_path, 'ob_over', end_epoch=1,
                      valid=False, orbax_dir=orbax_dir)
        exp1.run_experiment()
        from morgana_tpu import checkpointing as ck
        ck.orbax_save(orbax_dir, 1, {'params': exp1.loop.params, 'step': 9})
        ck.orbax_wait(orbax_dir)
        assert ck.orbax_restore(orbax_dir, step=1)['step'] == 9


class TestTransferDtypeFlag:
    def test_bf16_wire_features_and_training(self, voice_data, tmp_path):
        """--transfer_dtype bfloat16: float32 SEQUENCE features cross
        host->device as bf16 (halving upload bytes on bandwidth-limited
        links); scalar features (n_frames) stay f32 for exact masks; the
        fused step runs and learns."""
        import ml_dtypes

        exp = _build(voice_data, tmp_path, 'wire16', end_epoch=1, valid=False,
                     transfer_dtype='bfloat16')
        batch = next(iter(exp.train_loader))
        assert batch['normalised_lf0_deltas'].dtype == ml_dtypes.bfloat16
        assert batch['lf0'].dtype == ml_dtypes.bfloat16
        assert np.asarray(batch['n_frames']).dtype == np.float32

        exp.run_experiment()
        metrics = os.path.join(str(tmp_path / 'experiments'), 'wire16',
                               'train', 'epoch_1', 'metrics.json')
        import json
        with open(metrics) as f:
            loss = json.load(f)['loss']
        assert np.isfinite(loss)

    def test_default_keeps_f32(self, voice_data, tmp_path):
        exp = _build(voice_data, tmp_path, 'wire32', end_epoch=1, valid=False)
        batch = next(iter(exp.train_loader))
        assert batch['normalised_lf0_deltas'].dtype == np.float32


class TestDebugNans:
    def test_flag_arms_jax_nan_checking(self, voice_data, tmp_path):
        """--debug_nans turns on jax_debug_nans before compilation, so the
        first NaN-producing op raises FloatingPointError (instead of the
        NaN surfacing only at the end-of-epoch divergence guard)."""
        assert not jax.config.jax_debug_nans
        try:
            exp = _build(voice_data, tmp_path, 'nandbg', end_epoch=1,
                         valid=False, debug_nans=True)
            assert jax.config.jax_debug_nans
            with pytest.raises(FloatingPointError):
                jax.jit(lambda x: jnp_log_neg(x))(1.0)
        finally:
            jax.config.update('jax_debug_nans', False)
        assert exp is not None


def jnp_log_neg(x):
    import jax.numpy as jnp
    return jnp.log(-jnp.abs(x))
