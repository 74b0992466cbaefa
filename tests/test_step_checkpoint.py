"""Step-level (mid-epoch) checkpointing and exact resume.

The reference recovers only at epoch granularity (relaunch with
``--checkpoint_path``, ``morgana/experiment_builder.py:109-117``). With
``--step_checkpoint_interval N`` a rolling ``checkpoints/step.npz`` (+ full
training-state sidecar recording the exact batch position) is written every N
train batches, and ``--checkpoint_path latest`` resumes from it mid-epoch —
replaying exactly the remainder the uninterrupted run would have executed
(deterministic epoch-keyed shuffle + stateless per-step training RNG).
"""
import os

import numpy as np
import pytest

from conftest import builder_args
from tiny_models import TinyF0Model

from morgana_tpu import checkpointing, nn
from morgana_tpu.experiment_builder import ExperimentBuilder


def _build(voice_data, tmp_path, name, **overrides):
    args = builder_args(voice_data['data_root'], str(tmp_path / 'experiments'),
                        valid=False, batch_size=2, ema_decay=0.9, **overrides)
    nn.manual_seed(args['seed'])
    return ExperimentBuilder(TinyF0Model, experiment_name=name, **args)


def _params(expdir, fname):
    with np.load(os.path.join(expdir, 'checkpoints', fname)) as data:
        return {k: data[k] for k in data.files}


class TestMidEpochResume:
    def test_interrupted_run_resumes_to_identical_params(self, voice_data, tmp_path):
        """Kill a run mid-epoch-2 (after the rolling step checkpoint), resume
        with --checkpoint_path latest, and require the final parameters to be
        BITWISE identical to an uninterrupted run's — params, EMA and Adam
        state all restored, shuffle order and step numbering replayed."""
        # Uninterrupted reference run: 2 epochs, 4 batches each.
        exp_a = _build(voice_data, tmp_path, 'step_a', end_epoch=2)
        exp_a.run_experiment()
        dir_a = os.path.join(str(tmp_path / 'experiments'), 'step_a')

        # Interrupted run: step checkpoint every 2 batches; KeyboardInterrupt
        # on epoch 2's third batch (after step.npz recorded batches 1-2).
        exp_b = _build(voice_data, tmp_path, 'step_b', end_epoch=2,
                       step_checkpoint_interval=2)
        orig_step = exp_b.loop.train_step
        calls = {'n': 0}

        def interrupting(features, lr, force_apply=False):
            calls['n'] += 1
            if calls['n'] == 7:  # epoch 1: 4 batches; epoch 2: batches 1-2 ran
                raise KeyboardInterrupt
            return orig_step(features, lr, force_apply=force_apply)

        exp_b.loop.train_step = interrupting
        with pytest.raises(KeyboardInterrupt):
            exp_b.run_experiment()

        dir_b = os.path.join(str(tmp_path / 'experiments'), 'step_b')
        step_ckpt = os.path.join(dir_b, 'checkpoints', 'step.npz')
        assert os.path.isfile(step_ckpt)
        sidecar = checkpointing.load_training_state(
            checkpointing.training_state_path_for(step_ckpt))
        assert sidecar['extra']['epoch'] == 2
        assert sidecar['extra']['batches_done'] == 2
        assert sidecar['extra']['num_batches'] == 4
        assert sidecar['step'] == 6

        # Relaunch: latest resolves to step.npz at epoch 2, batch 3.
        exp_b2 = _build(voice_data, tmp_path, 'step_b', end_epoch=2,
                        step_checkpoint_interval=2, checkpoint_path='latest')
        assert exp_b2.checkpoint_path == step_ckpt
        assert exp_b2.start_epoch == 2
        assert exp_b2._resume_batches_done == 2
        assert exp_b2.loop.step_count == 6
        exp_b2.run_experiment()

        for fname in ('epoch_2.npz', 'epoch_2_ema.npz'):
            ref, res = _params(dir_a, fname), _params(dir_b, fname)
            assert set(ref) == set(res)
            for key in ref:
                np.testing.assert_array_equal(
                    ref[key], res[key], err_msg=f'{fname}:{key}')

    def test_device_cache_mid_epoch_resume_is_exact(self, voice_data,
                                                    tmp_path):
        """--device_cache shares the ordering machinery (iter_batch_indices)
        with the streaming loader, so an interrupted cached run must resume
        to BITWISE-identical parameters too — and match the uninterrupted
        STREAMING run (batches are bitwise equal across the two paths)."""
        exp_a = _build(voice_data, tmp_path, 'dcstep_a', end_epoch=2)
        exp_a.run_experiment()
        dir_a = os.path.join(str(tmp_path / 'experiments'), 'dcstep_a')

        exp_b = _build(voice_data, tmp_path, 'dcstep_b', end_epoch=2,
                       step_checkpoint_interval=2, device_cache=True)
        orig_step = exp_b.loop.train_step
        calls = {'n': 0}

        def interrupting(features, lr, force_apply=False):
            calls['n'] += 1
            if calls['n'] == 7:
                raise KeyboardInterrupt
            return orig_step(features, lr, force_apply=force_apply)

        exp_b.loop.train_step = interrupting
        with pytest.raises(KeyboardInterrupt):
            exp_b.run_experiment()

        exp_b2 = _build(voice_data, tmp_path, 'dcstep_b', end_epoch=2,
                        step_checkpoint_interval=2, device_cache=True,
                        checkpoint_path='latest')
        assert exp_b2._resume_batches_done == 2
        exp_b2.run_experiment()

        dir_b = os.path.join(str(tmp_path / 'experiments'), 'dcstep_b')
        for fname in ('epoch_2.npz', 'epoch_2_ema.npz'):
            ref, res = _params(dir_a, fname), _params(dir_b, fname)
            assert set(ref) == set(res)
            for key in ref:
                np.testing.assert_array_equal(
                    ref[key], res[key], err_msg=f'{fname}:{key}')

    def test_torn_step_pair_resumes_from_sidecar(self, voice_data, tmp_path):
        """step.npz and its sidecar are each written atomically but
        sequentially: a crash BETWEEN the two leaves a newer step.npz beside
        an older sidecar. Resume must take params from the sidecar — one
        consistent snapshot — never pairing step.npz's params with the
        sidecar's optimiser state."""
        exp = _build(voice_data, tmp_path, 'step_torn', end_epoch=1,
                     step_checkpoint_interval=2)
        orig_step = exp.loop.train_step
        calls = {'n': 0}

        def interrupting(features, lr, force_apply=False):
            calls['n'] += 1
            if calls['n'] == 3:
                raise KeyboardInterrupt
            return orig_step(features, lr, force_apply=force_apply)

        exp.loop.train_step = interrupting
        with pytest.raises(KeyboardInterrupt):
            exp.run_experiment()

        expdir = os.path.join(str(tmp_path / 'experiments'), 'step_torn')
        step_ckpt = os.path.join(expdir, 'checkpoints', 'step.npz')
        # Simulate the torn write: a NEWER params generation landed in
        # step.npz but the crash came before the matching sidecar write.
        torn = {k: v + 100.0 for k, v in _params(expdir, 'step.npz').items()}
        checkpointing.save_state_dict(torn, step_ckpt, atomic=True)
        sidecar_params = checkpointing.load_training_state(
            checkpointing.training_state_path_for(step_ckpt))['params']

        exp2 = _build(voice_data, tmp_path, 'step_torn', end_epoch=1,
                      step_checkpoint_interval=2, checkpoint_path='latest')
        assert exp2.checkpoint_path == step_ckpt
        for name, value in exp2.loop.params.items():
            np.testing.assert_array_equal(
                np.asarray(value), np.asarray(sidecar_params[name]),
                err_msg=name)

    def test_length_sorted_mid_epoch_resume_is_exact(
            self, voice_data, tmp_path):
        """--length_sort_window batch order is a function of the loader's
        learned lengths; the step sidecar snapshots them, so a length-sorted
        run resumes to BITWISE-identical parameters too."""
        exp_a = _build(voice_data, tmp_path, 'lsw_a', end_epoch=2,
                       length_sort_window=2)
        exp_a.run_experiment()
        dir_a = os.path.join(str(tmp_path / 'experiments'), 'lsw_a')

        exp_b = _build(voice_data, tmp_path, 'lsw_b', end_epoch=2,
                       step_checkpoint_interval=2, length_sort_window=2)
        orig_step = exp_b.loop.train_step
        calls = {'n': 0}

        def interrupting(features, lr, force_apply=False):
            calls['n'] += 1
            if calls['n'] == 7:  # epoch 1: 4 batches; epoch 2: batches 1-2 ran
                raise KeyboardInterrupt
            return orig_step(features, lr, force_apply=force_apply)

        exp_b.loop.train_step = interrupting
        with pytest.raises(KeyboardInterrupt):
            exp_b.run_experiment()
        dir_b = os.path.join(str(tmp_path / 'experiments'), 'lsw_b')
        sidecar = checkpointing.load_training_state(os.path.join(
            dir_b, 'checkpoints', 'step.train.pkl'))
        assert sidecar['extra']['loader_lengths'], \
            'sidecar must snapshot the loader length map'

        exp_b2 = _build(voice_data, tmp_path, 'lsw_b', end_epoch=2,
                        step_checkpoint_interval=2, length_sort_window=2,
                        checkpoint_path='latest')
        assert exp_b2._resume_batches_done == 2
        assert exp_b2._resume_loader_lengths
        exp_b2.run_experiment()

        for fname in ('epoch_2.npz', 'epoch_2_ema.npz'):
            ref, res = _params(dir_a, fname), _params(dir_b, fname)
            for key in ref:
                np.testing.assert_array_equal(
                    ref[key], res[key], err_msg=f'{fname}:{key}')

    def test_mid_epoch_resume_warns_when_lengths_missing(
            self, voice_data, tmp_path):
        """A pre-snapshot sidecar (no loader_lengths) under
        --length_sort_window cannot replay exactly; the resume must say so."""
        exp = _build(voice_data, tmp_path, 'step_lsw', end_epoch=1,
                     step_checkpoint_interval=2, length_sort_window=2)
        orig_step = exp.loop.train_step
        calls = {'n': 0}

        def interrupting(features, lr, force_apply=False):
            calls['n'] += 1
            if calls['n'] == 3:
                raise KeyboardInterrupt
            return orig_step(features, lr, force_apply=force_apply)

        exp.loop.train_step = interrupting
        with pytest.raises(KeyboardInterrupt):
            exp.run_experiment()

        # Strip the length snapshot, simulating an older sidecar.
        expdir = os.path.join(str(tmp_path / 'experiments'), 'step_lsw')
        sidecar = os.path.join(expdir, 'checkpoints', 'step.train.pkl')
        state = checkpointing.load_training_state(sidecar)
        state['extra'].pop('loader_lengths')
        checkpointing.save_training_state(
            sidecar, params=state['params'], opt_state=state['opt_state'],
            ema_params=state['ema_params'], step=state['step'],
            extra=state['extra'])

        # create_logger replaces all handlers at builder init, so in-process
        # capture cannot see builder-time records; assert on the log files
        # (the 5-channel contract routes WARNING to the .stdout files).
        exp2 = _build(voice_data, tmp_path, 'step_lsw', end_epoch=1,
                      step_checkpoint_interval=2, length_sort_window=2,
                      checkpoint_path='latest')
        assert exp2._resume_batches_done == 2
        assert exp2._resume_loader_lengths is None
        log_dir = os.path.join(expdir, 'log')
        logged = ''.join(
            open(os.path.join(log_dir, f)).read()
            for f in os.listdir(log_dir) if f.endswith('.stdout'))
        assert 'length_sort_window' in logged and 'WARNING' in logged

    def test_completed_epoch_step_checkpoint_is_stale(self, voice_data, tmp_path):
        """Once the epoch checkpoint for the step checkpoint's epoch exists,
        the (older-or-equal) step checkpoint must be ignored by latest."""
        exp = _build(voice_data, tmp_path, 'step_stale', end_epoch=1,
                     step_checkpoint_interval=2)
        exp.run_experiment()
        expdir = os.path.join(str(tmp_path / 'experiments'), 'step_stale')
        assert os.path.isfile(os.path.join(expdir, 'checkpoints', 'step.npz'))

        exp2 = _build(voice_data, tmp_path, 'step_stale', end_epoch=2,
                      checkpoint_path='latest')
        assert exp2.checkpoint_path.endswith('epoch_1.npz')
        assert exp2.start_epoch == 2
        assert exp2._resume_batches_done == 0

    def test_completed_epoch_without_epoch_checkpoint_resumes_after(
            self, voice_data, tmp_path):
        """A step checkpoint whose sidecar records batches_done == num_batches
        (the epoch ran to completion but was not a checkpointing epoch)
        resumes AFTER that epoch, with no batch skipping."""
        exp = _build(voice_data, tmp_path, 'step_done', end_epoch=1)
        exp.run_experiment()
        expdir = os.path.join(str(tmp_path / 'experiments'), 'step_done')
        step_ckpt = os.path.join(expdir, 'checkpoints', 'step.npz')
        epoch_ckpt = os.path.join(expdir, 'checkpoints', 'epoch_1.npz')
        state = checkpointing.load_training_state(
            checkpointing.training_state_path_for(epoch_ckpt))
        import shutil
        shutil.copy(epoch_ckpt, step_ckpt)
        checkpointing.save_training_state(
            checkpointing.training_state_path_for(step_ckpt),
            params=state['params'], opt_state=state['opt_state'],
            ema_params=state['ema_params'], step=8,
            extra={'epoch': 2, 'batches_done': 4, 'num_batches': 4})

        exp2 = _build(voice_data, tmp_path, 'step_done', end_epoch=3,
                      checkpoint_path='latest')
        assert exp2.checkpoint_path == step_ckpt
        assert exp2.start_epoch == 3
        assert exp2._resume_batches_done == 0
        assert exp2.loop.step_count == 8

    def test_corrupt_step_sidecar_falls_back_to_epoch_checkpoint(
            self, voice_data, tmp_path):
        exp = _build(voice_data, tmp_path, 'step_corrupt', end_epoch=1,
                     step_checkpoint_interval=2)
        exp.run_experiment()
        expdir = os.path.join(str(tmp_path / 'experiments'), 'step_corrupt')
        sidecar = os.path.join(expdir, 'checkpoints', 'step.train.pkl')
        with open(sidecar, 'wb') as f:
            f.write(b'not a pickle')

        exp2 = _build(voice_data, tmp_path, 'step_corrupt', end_epoch=2,
                      checkpoint_path='latest')
        assert exp2.checkpoint_path.endswith('epoch_1.npz')
        assert exp2._resume_batches_done == 0


class TestMultihostLengthSortResume:
    """Multihost + --length_sort_window exact mid-epoch resume: each rank
    snapshots ITS shard's learned length map to
    ``checkpoints/step.lengths.pN.pkl`` at the same batch boundary as the
    lead host's sidecar, and the resume reads the matching-rank file.

    These tests fake the rank coordinates on a single-process builder
    (process_count/process_index only steer the checkpoint logic here; the
    loaders were already built), isolating the per-rank snapshot machinery;
    ``tests/test_multihost_real.py`` covers the genuinely multi-process
    write path.
    """

    def _fake_rank(self, exp, index, count=2):
        exp.process_index, exp.process_count = index, count
        exp.is_lead_host = index == 0

    def test_lead_rank_resume_is_exact(self, voice_data, tmp_path):
        base = _build(voice_data, tmp_path, 'mhls_a', end_epoch=2,
                      length_sort_window=2)
        base.run_experiment()
        dir_a = os.path.join(str(tmp_path / 'experiments'), 'mhls_a')

        exp = _build(voice_data, tmp_path, 'mhls_b', end_epoch=2,
                     step_checkpoint_interval=2, length_sort_window=2)
        self._fake_rank(exp, 0)
        orig_step = exp.loop.train_step
        calls = {'n': 0}

        def interrupting(features, lr, force_apply=False):
            calls['n'] += 1
            if calls['n'] == 7:
                raise KeyboardInterrupt
            return orig_step(features, lr, force_apply=force_apply)

        exp.loop.train_step = interrupting
        with pytest.raises(KeyboardInterrupt):
            exp.run_experiment()
        dir_b = os.path.join(str(tmp_path / 'experiments'), 'mhls_b')
        # The multihost sidecar carries NO lengths; the rank file does.
        sidecar = checkpointing.load_training_state(os.path.join(
            dir_b, 'checkpoints', 'step.train.pkl'))
        assert sidecar['extra']['loader_lengths'] is None
        assert os.path.exists(os.path.join(
            dir_b, 'checkpoints', 'step.lengths.p0.pkl'))

        exp2 = _build(voice_data, tmp_path, 'mhls_b', end_epoch=2,
                      step_checkpoint_interval=2, length_sort_window=2,
                      checkpoint_path='latest')
        # The fresh builder resolved the checkpoint at init under the
        # single-host view (no rank coordinates yet — exactly a real
        # rank's init order, where jax.distributed supplies them); fake
        # the rank and re-read the per-rank length snapshot.
        self._fake_rank(exp2, 0)
        assert exp2._resume_batches_done == 2
        assert exp2._load_rank_lengths(2, 2)
        exp2._resume_loader_lengths = exp2._load_rank_lengths(2, 2)
        exp2.run_experiment()

        for fname in ('epoch_2.npz', 'epoch_2_ema.npz'):
            ref, res = _params(dir_a, fname), _params(dir_b, fname)
            for key in ref:
                np.testing.assert_array_equal(
                    ref[key], res[key], err_msg=f'{fname}:{key}')

    def test_non_lead_rank_writes_only_lengths(self, voice_data, tmp_path):
        exp = _build(voice_data, tmp_path, 'mhls_r1', end_epoch=1,
                     step_checkpoint_interval=2, length_sort_window=2)
        self._fake_rank(exp, 1)
        exp.run_experiment()
        ckpts = os.path.join(str(tmp_path / 'experiments'), 'mhls_r1',
                             'checkpoints')
        assert os.path.exists(os.path.join(ckpts, 'step.lengths.p1.pkl'))
        assert not os.path.exists(os.path.join(ckpts, 'step.npz'))

    def test_torn_rank_file_degrades_to_approximate(self, voice_data,
                                                    tmp_path):
        """A rank file from a DIFFERENT batch boundary than the sidecar
        (crash between the two writes) must be rejected, not silently used
        as the wrong order."""
        exp = _build(voice_data, tmp_path, 'mhls_torn', end_epoch=1,
                     step_checkpoint_interval=2, length_sort_window=2)
        self._fake_rank(exp, 0)
        exp.run_experiment()
        assert exp._load_rank_lengths(1, 4) is not None
        assert exp._load_rank_lengths(1, 3) is None   # wrong batch
        assert exp._load_rank_lengths(2, 4) is None   # wrong epoch
        self._fake_rank(exp, 1)
        assert exp._load_rank_lengths(1, 4) is None   # other rank: no file
