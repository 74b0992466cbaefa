"""Integration tests: full experiment lifecycle on synthetic data — training
convergence, on-disk contract, checkpoint/resume, EMA, eval-only runs,
setting-conflict validation, VAE plumbing."""
import json
import os

import numpy as np
import pytest

from conftest import builder_args
from tiny_models import TinyF0Model, TinyVAE

from morgana_tpu import nn
from morgana_tpu.experiment_builder import ExperimentBuilder


def _build(voice_data, tmp_path, name, model_cls=TinyF0Model, **overrides):
    args = builder_args(voice_data['data_root'], str(tmp_path / 'experiments'), **overrides)
    nn.manual_seed(args['seed'])
    return ExperimentBuilder(model_cls, experiment_name=name, **args), args


class TestTrainingLifecycle:
    def test_two_epoch_train_decreases_loss(self, voice_data, tmp_path):
        exp, _ = _build(voice_data, tmp_path, 'tiny', end_epoch=3, ema_decay=0.9)
        exp.run_experiment()

        expdir = os.path.join(str(tmp_path / 'experiments'), 'tiny')
        m1 = json.load(open(os.path.join(expdir, 'train', 'epoch_1', 'metrics.json')))
        m3 = json.load(open(os.path.join(expdir, 'train', 'epoch_3', 'metrics.json')))
        assert m3['loss'] < m1['loss']
        assert 'LF0_RMSE_Hz' in m1

        # On-disk contract.
        assert os.path.isfile(os.path.join(expdir, 'config.json'))
        assert os.path.isfile(os.path.join(expdir, 'model_summary.txt'))
        assert os.path.isfile(os.path.join(expdir, 'metrics.pdf'))
        ckpts = sorted(os.listdir(os.path.join(expdir, 'checkpoints')))
        assert 'epoch_1.npz' in ckpts and 'epoch_3_ema.npz' in ckpts
        # valid metrics exist.
        assert os.path.isfile(os.path.join(expdir, 'valid', 'epoch_1', 'metrics.json'))
        # log files exist.
        assert any(f.endswith('.stdout') for f in os.listdir(os.path.join(expdir, 'log')))

    def test_checkpoint_resume(self, voice_data, tmp_path):
        exp1, _ = _build(voice_data, tmp_path, 'resume_a', end_epoch=1, valid=False)
        exp1.run_experiment()
        ckpt = os.path.join(str(tmp_path / 'experiments'), 'resume_a',
                            'checkpoints', 'epoch_1.npz')
        assert os.path.isfile(ckpt)

        exp2, _ = _build(voice_data, tmp_path, 'resume_b', start_epoch=2, end_epoch=2,
                         valid=False, checkpoint_path=ckpt)
        # Params were loaded from the checkpoint.
        p1 = np.load(ckpt)
        p2 = nn.state_dict(exp2.model)
        np.testing.assert_allclose(p1['layers.0.weight'], p2['layers.0.weight'])
        exp2.run_experiment()
        assert os.path.isfile(os.path.join(str(tmp_path / 'experiments'), 'resume_b',
                                           'checkpoints', 'epoch_2.npz'))

    def test_eval_only_requires_checkpoint(self, voice_data, tmp_path):
        with pytest.raises(ValueError, match='checkpoint'):
            _build(voice_data, tmp_path, 'evalonly_fail', train=False, valid=True)

    def test_start_epoch_overwrite_guard(self, voice_data, tmp_path):
        exp1, _ = _build(voice_data, tmp_path, 'guard_a', end_epoch=1, valid=False)
        exp1.run_experiment()
        ckpt = os.path.join(str(tmp_path / 'experiments'), 'guard_a',
                            'checkpoints', 'epoch_1.npz')
        with pytest.raises(ValueError, match='start_epoch'):
            _build(voice_data, tmp_path, 'guard_b', checkpoint_path=ckpt, start_epoch=1)

    def test_no_procedure_errors(self, voice_data, tmp_path):
        with pytest.raises(ValueError, match='No process'):
            _build(voice_data, tmp_path, 'nothing', train=False, valid=False, test=False)

    def test_plateau_requires_valid(self, voice_data, tmp_path):
        with pytest.raises(ValueError, match='plateau'):
            _build(voice_data, tmp_path, 'plat', lr_schedule_name='plateau', valid=False)

    def test_eval_only_run(self, voice_data, tmp_path):
        exp1, _ = _build(voice_data, tmp_path, 'evalsrc', end_epoch=1, valid=False)
        exp1.run_experiment()
        ckpt = os.path.join(str(tmp_path / 'experiments'), 'evalsrc',
                            'checkpoints', 'epoch_1.npz')

        exp2, _ = _build(voice_data, tmp_path, 'evalrun', train=False, valid=True,
                         checkpoint_path=ckpt)
        assert exp2.epoch == 1  # epoch from checkpoint filename
        exp2.run_experiment()
        assert os.path.isfile(os.path.join(str(tmp_path / 'experiments'), 'evalrun',
                                           'valid', 'epoch_1', 'metrics.json'))

    def test_test_epoch_generates(self, voice_data, tmp_path):
        exp, _ = _build(voice_data, tmp_path, 'testgen', end_epoch=1, valid=False,
                        test=True, test_output_interval=1)
        exp.run_experiment()
        # test dir created with metrics.json
        assert os.path.isfile(os.path.join(str(tmp_path / 'experiments'), 'testgen',
                                           'test', 'epoch_1', 'metrics.json'))


class TestEMA:
    def test_ema_matches_manual_recurrence(self, voice_data, tmp_path):
        decay = 0.9
        exp, _ = _build(voice_data, tmp_path, 'ema', end_epoch=1, valid=False,
                        ema_decay=decay, batch_size=8)
        start = {k: np.asarray(v) for k, v in exp.loop.ema_params.items()}
        assert len(exp.train_loader) == 1  # single batch -> single EMA update

        exp.run_experiment()

        final_params = {k: np.asarray(v) for k, v in exp.loop.params.items()}
        final_ema = {k: np.asarray(v) for k, v in exp.loop.ema_params.items()}
        for k in final_ema:
            expected = decay * start[k] + (1 - decay) * final_params[k]
            np.testing.assert_allclose(final_ema[k], expected, atol=1e-6)


class TestVAE:
    def test_vae_trains_and_tracks_kld(self, voice_data, tmp_path):
        exp, _ = _build(voice_data, tmp_path, 'vae', model_cls=TinyVAE,
                        end_epoch=2, valid=True)
        exp.run_experiment()
        expdir = os.path.join(str(tmp_path / 'experiments'), 'vae')
        m = json.load(open(os.path.join(expdir, 'train', 'epoch_2', 'metrics.json')))
        assert 'kld' in m and np.isfinite(m['kld'])

    def test_vae_predict_zero_latent(self, voice_data, tmp_path):
        import jax.numpy as jnp
        nn.manual_seed(0)
        model = TinyVAE()
        for name, norm in model.normaliser_sources().items():
            norm.load_params('train', voice_data['data_root'])
            model.normalisers[name] = norm
        features = {
            'normalised_lab': jnp.ones((2, 5, 600)) * 0.5,
            'normalised_counters': jnp.ones((2, 20, 9)) * 0.5,
            'n_frames': jnp.array([20., 15.]),
        }
        out = model.predict(features)
        assert out['normalised_lf0_deltas'].shape == (2, 20, 3)


class TestFailureDetection:
    def test_divergence_raises(self, voice_data, tmp_path):
        """A non-finite training loss stops the run with a clear error."""
        # An absurd lr overflows the params to inf after the first update;
        # subsequent batch losses become non-finite.
        exp, _ = _build(voice_data, tmp_path, 'nan', end_epoch=5, valid=False,
                        learning_rate=1e30)
        with pytest.raises(FloatingPointError, match='diverged'):
            exp.run_experiment()


class TestKeyboardInterrupt:
    def test_interrupt_still_plots(self, voice_data, tmp_path):
        """KeyboardInterrupt mid-training flushes the metrics plot before
        re-raising (reference behaviour, experiment_builder.py:705-709)."""
        exp, _ = _build(voice_data, tmp_path, 'kint', end_epoch=5, valid=True)

        original = exp.train_epoch
        calls = {'n': 0}

        def interrupting(*args, **kwargs):
            calls['n'] += 1
            if calls['n'] >= 2:
                raise KeyboardInterrupt
            return original(*args, **kwargs)

        exp.train_epoch = interrupting
        with pytest.raises(KeyboardInterrupt):
            exp.run_experiment()
        assert os.path.isfile(os.path.join(str(tmp_path / 'experiments'), 'kint',
                                           'metrics.pdf'))


class TestProfiling:
    def test_profile_dir_writes_trace(self, voice_data, tmp_path):
        profile_dir = str(tmp_path / 'trace')
        exp, _ = _build(voice_data, tmp_path, 'prof', end_epoch=1, valid=False,
                        profile_dir=profile_dir)
        exp.run_experiment()
        # jax.profiler writes plugins/profile/<ts>/*.pb under the trace dir.
        found = [f for root, _, files in os.walk(profile_dir) for f in files]
        assert found, 'profiler trace directory is empty'


class TestFullFeatureMatrix:
    @pytest.mark.slow
    def test_everything_enabled_together(self, voice_data, tmp_path):
        """Soak: EMA + noam schedule + weight decay + remat + length-sorted
        batching + per-epoch generation + test split, all in one run."""
        exp, _ = _build(
            voice_data, tmp_path, 'matrix', end_epoch=3, valid=True, test=True,
            ema_decay=0.99, weight_decay=1e-6,
            lr_schedule_name='noam', lr_schedule_kwargs={'warmup_steps': 5},
            train_output_interval=3, valid_output_interval=3, test_output_interval=3,
            num_data_threads=2)
        exp.length_sort_window = 2
        nn.set_default_remat(True)
        try:
            exp.run_experiment()
        finally:
            nn.set_default_remat(False)

        expdir = os.path.join(str(tmp_path / 'experiments'), 'matrix')
        for sub in ('train/epoch_3/metrics.json', 'valid/epoch_3/metrics.json',
                    'test/epoch_3/metrics.json', 'checkpoints/epoch_3_ema.npz',
                    'metrics.pdf'):
            assert os.path.exists(os.path.join(expdir, sub)), sub
        m1 = json.load(open(os.path.join(expdir, 'train', 'epoch_1', 'metrics.json')))
        m3 = json.load(open(os.path.join(expdir, 'train', 'epoch_3', 'metrics.json')))
        assert np.isfinite(m1['loss']) and np.isfinite(m3['loss'])


class TestReproducibility:
    def test_same_seed_same_checkpoint(self, voice_data, tmp_path):
        """Two runs with the same seed produce byte-identical parameters
        (init RNG + training RNG streams + data order are all seeded)."""
        sds = []
        for name in ('repro_a', 'repro_b'):
            exp, _ = _build(voice_data, tmp_path, name, end_epoch=1, valid=False,
                            model_kwargs={'dropout_prob': 0.2})
            exp.run_experiment()
            ckpt = os.path.join(str(tmp_path / 'experiments'), name,
                                'checkpoints', 'epoch_1.npz')
            sds.append(dict(np.load(ckpt)))
        assert set(sds[0]) == set(sds[1])
        for k in sds[0]:
            np.testing.assert_array_equal(sds[0][k], sds[1][k])


class TestLRScheduleResume:
    def test_schedule_state_survives_resume(self, voice_data, tmp_path):
        """Resuming from a checkpoint continues the LR schedule instead of
        restarting the warmup (the reference lost this state)."""
        exp1, _ = _build(voice_data, tmp_path, 'lrres_a', end_epoch=1, valid=False,
                         lr_schedule_name='noam', lr_schedule_kwargs={'warmup_steps': 3})
        exp1.run_experiment()
        ckpt = os.path.join(str(tmp_path / 'experiments'), 'lrres_a',
                            'checkpoints', 'epoch_1.npz')

        exp2, _ = _build(voice_data, tmp_path, 'lrres_b', start_epoch=2, end_epoch=2,
                         valid=False, checkpoint_path=ckpt,
                         lr_schedule_name='noam', lr_schedule_kwargs={'warmup_steps': 3})
        assert exp2._restored_lr_state is not None
        assert exp2._restored_lr_state['last_epoch'] == 2  # 2 batches in epoch 1
        exp2.run_experiment()

    def test_grad_clip_flag(self, voice_data, tmp_path):
        exp, _ = _build(voice_data, tmp_path, 'clip', end_epoch=1, valid=False,
                        grad_clip_norm=0.5)
        exp.run_experiment()  # runs and converges without error


class TestCallbacks:
    def test_hooks_fire_and_early_stopping_stops(self, voice_data, tmp_path):
        """Callback hooks fire in order with the right payloads, and
        EarlyStopping halts the run once valid loss stops improving."""
        from morgana_tpu.experiment_builder import Callback, EarlyStopping

        events = []

        class Recorder(Callback):
            def on_train_begin(self, b):
                events.append(('begin',))

            def on_epoch_begin(self, b, epoch):
                events.append(('epoch_begin', epoch))

            def on_epoch_end(self, b, epoch, train_loss):
                events.append(('epoch_end', epoch, train_loss))

            def on_valid_end(self, b, epoch, valid_loss):
                events.append(('valid_end', epoch, valid_loss))

            def on_train_end(self, b):
                events.append(('end',))

        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            end_epoch=6, valid=True,
                            learning_rate=0.0)  # frozen -> no improvement
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(
            TinyF0Model, experiment_name='cb',
            callbacks=[Recorder(), EarlyStopping(patience=1)], **args)
        exp.run_experiment()

        kinds = [e[0] for e in events]
        assert kinds[0] == 'begin' and kinds[-1] == 'end'
        epochs_run = [e[1] for e in events if e[0] == 'epoch_end']
        # Epoch 1 sets best; epoch 2 shows no improvement -> stop.
        assert epochs_run == [1, 2], events
        for e in events:
            if e[0] in ('epoch_end', 'valid_end'):
                assert np.isfinite(e[2])
        # Checkpoints only for the epochs that ran.
        ckpts = sorted(os.listdir(os.path.join(
            str(tmp_path / 'experiments'), 'cb', 'checkpoints')))
        assert not any('epoch_3' in c for c in ckpts), ckpts
        # config.json stayed JSON-clean (callbacks popped).
        cfg = json.load(open(os.path.join(
            str(tmp_path / 'experiments'), 'cb', 'config.json')))
        assert 'callbacks' not in cfg
