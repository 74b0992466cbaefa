"""REAL multi-process multihost training: two OS processes, each with two
virtual CPU devices, coordinated through jax.distributed (Gloo collectives
over localhost) — the genuine cross-host code paths that single-process
fakes cannot reach (global batch assembly, collective lockstep, replicated
param fetch, shared-filesystem write discipline)."""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize('extra_flags', [
    pytest.param([], id='gspmd'),
    pytest.param(['--shard_map_step'], id='shard_map'),
])
def test_two_process_training_end_to_end(tmp_path, extra_flags):
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))
    data_root = str(tmp_path / 'data')
    subprocess.run(
        [sys.executable, '-c',
         'import sys; sys.argv=[""]\n'
         'from morgana_tpu.data.synthetic import generate_voice_data\n'
         f'generate_voice_data({data_root!r}, num_train=8, num_valid=4, '
         'num_test=2, seed=9)'],
        cwd=repo, check=True, env=_clean_env(repo), timeout=120)

    port = _free_port()
    procs = []
    for rank in range(2):
        env = _clean_env(repo)
        env.update({
            'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
            'MORGANA_COORDINATOR': f'localhost:{port}',
            'MORGANA_NUM_PROCESSES': '2',
            'MORGANA_PROCESS_ID': str(rank),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(repo, 'models', 'f0_test_model.py'),
             '--experiment_name', 'mh', '--data_root', data_root,
             '--train_id_list', 'train/train_file_id_list.scp',
             '--valid_id_list', 'valid/valid_file_id_list.scp',
             '--test_id_list', 'test/test_file_id_list.scp',
             '--batch_size', '4', '--end_epoch', '2', '--device', 'cpu',
             '--multihost', '--data_parallel', '--valid_output_interval', '2']
            + extra_flags,
            cwd=str(tmp_path), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=420)
        outputs.append(out)
        assert proc.returncode == 0, out[-3000:]

    # Synchronised training: both ranks report the SAME validation loss.
    losses = [re.findall(r'valid_loss ([\d.]+)', out) for out in outputs]
    assert losses[0] and losses[0] == losses[1], losses

    expdir = tmp_path / 'experiments' / 'mh'
    ckpts = os.listdir(expdir / 'checkpoints')
    assert 'epoch_2.npz' in ckpts
    # Lead-host-only artefacts, exactly one copy each.
    assert (expdir / 'config.json').is_file()
    assert (expdir / 'train' / 'epoch_1' / 'metrics.json').is_file()
    # Every rank keeps its own (collision-free) log files.
    logs = os.listdir(expdir / 'log')
    assert any('.p1.' in f for f in logs)
    assert any(f.endswith('.stdout') and '.p1.' not in f for f in logs)

    # The saved checkpoint is a replicated global state fetched cleanly.
    params = np.load(expdir / 'checkpoints' / 'epoch_2.npz')
    assert all(np.isfinite(params[k]).all() for k in params.files)

    # Generation hooks: every rank synthesised ITS OWN utterance shard
    # (host-local slices of the global outputs paired with local names),
    # so the shared synth dir holds ALL validation utterances.
    synth = expdir / 'valid' / 'epoch_2' / 'synth'
    wavs = sorted(f for f in os.listdir(synth) if f.endswith('.wav'))
    assert len(wavs) == 4, wavs


def _clean_env(repo):
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    return env


@pytest.mark.slow
def test_two_process_device_cache_trajectory(tmp_path):
    """--device_cache (+ chained dispatch) under REAL two-process multihost
    (round 5): each process packs its own corpus shard into device arenas
    and batches assemble as a collective-free shard_map over the cross-host
    'data' axis. The trained parameters must match the streaming multihost
    loader's trajectory."""
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))
    data_root = str(tmp_path / 'data')
    subprocess.run(
        [sys.executable, '-c',
         'import sys; sys.argv=[""]\n'
         'from morgana_tpu.data.synthetic import generate_voice_data\n'
         f'generate_voice_data({data_root!r}, num_train=8, num_valid=4, '
         'num_test=2, seed=9)'],
        cwd=repo, check=True, env=_clean_env(repo), timeout=120)

    def launch(name, extra_flags):
        port = _free_port()
        procs = []
        for rank in range(2):
            env = _clean_env(repo)
            env.update({
                'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
                'MORGANA_COORDINATOR': f'localhost:{port}',
                'MORGANA_NUM_PROCESSES': '2',
                'MORGANA_PROCESS_ID': str(rank),
            })
            procs.append(subprocess.Popen(
                [sys.executable,
                 os.path.join(repo, 'models', 'f0_test_model.py'),
                 '--experiment_name', name, '--data_root', data_root,
                 '--train_id_list', 'train/train_file_id_list.scp',
                 '--valid_id_list', 'valid/valid_file_id_list.scp',
                 '--test_id_list', 'test/test_file_id_list.scp',
                 '--batch_size', '4', '--end_epoch', '2', '--device', 'cpu',
                 '--multihost', '--data_parallel'] + extra_flags,
                cwd=str(tmp_path), env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outputs = []
        for proc in procs:
            out, _ = proc.communicate(timeout=420)
            outputs.append(out)
            assert proc.returncode == 0, out[-3000:]
        return outputs

    # --device_normalise on BOTH runs: the cached run then fuses the device
    # transform INTO the shard_map assemble body (the post= path), and the
    # streaming run applies the same transform to its global batches — the
    # trajectory gate covers the transform placement too.
    base = launch('mh_stream', ['--no-device_cache', '--device_normalise'])
    cached = launch('mh_cache', ['--device_cache', '--steps_per_dispatch', '4',
                                 '--device_normalise'])

    # The cache actually engaged, on both ranks.
    for out in cached:
        assert 'device cache built' in out, out[-3000:]
    # Lockstep: both ranks of each run report identical validation losses.
    for outputs in (base, cached):
        losses = [re.findall(r'valid_loss ([\d.]+)', out) for out in outputs]
        assert losses[0] and losses[0] == losses[1], losses

    # The trajectory gate: cached (chained) parameters match streaming.
    p_base = np.load(tmp_path / 'experiments' / 'mh_stream' / 'checkpoints'
                     / 'epoch_2.npz')
    p_cache = np.load(tmp_path / 'experiments' / 'mh_cache' / 'checkpoints'
                      / 'epoch_2.npz')
    assert set(p_base.files) == set(p_cache.files)
    for key in p_base.files:
        np.testing.assert_allclose(p_cache[key], p_base[key], rtol=1e-6,
                                   atol=1e-7, err_msg=key)


@pytest.mark.slow
def test_two_process_length_sorted_step_checkpoints(tmp_path):
    """Multihost + --length_sort_window + --step_checkpoint_interval: every
    rank snapshots its OWN shard's learned length map
    (checkpoints/step.lengths.pN.pkl) at the sidecar's batch boundary —
    the piece that makes length-sorted mid-epoch resume exact across hosts
    (the exactness math itself is pinned single-process in
    test_step_checkpoint.py::TestMultihostLengthSortResume)."""
    import pickle

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))
    data_root = str(tmp_path / 'data')
    subprocess.run(
        [sys.executable, '-c',
         'import sys; sys.argv=[""]\n'
         'from morgana_tpu.data.synthetic import generate_voice_data\n'
         f'generate_voice_data({data_root!r}, num_train=8, num_valid=4, '
         'num_test=2, seed=9)'],
        cwd=repo, check=True, env=_clean_env(repo), timeout=120)

    port = _free_port()
    procs = []
    for rank in range(2):
        env = _clean_env(repo)
        env.update({
            'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
            'MORGANA_COORDINATOR': f'localhost:{port}',
            'MORGANA_NUM_PROCESSES': '2',
            'MORGANA_PROCESS_ID': str(rank),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(repo, 'models', 'f0_test_model.py'),
             '--experiment_name', 'mhls', '--data_root', data_root,
             '--train_id_list', 'train/train_file_id_list.scp',
             '--valid_id_list', 'valid/valid_file_id_list.scp',
             '--test_id_list', 'test/test_file_id_list.scp',
             '--batch_size', '4', '--end_epoch', '2', '--device', 'cpu',
             '--multihost', '--data_parallel',
             '--length_sort_window', '1', '--step_checkpoint_interval', '1'],
            cwd=str(tmp_path), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    for proc in procs:
        out, _ = proc.communicate(timeout=420)
        assert proc.returncode == 0, out[-3000:]

    ckpts = tmp_path / 'experiments' / 'mhls' / 'checkpoints'
    # Both ranks snapshotted their shard's lengths at the same boundary.
    payloads = []
    for rank in range(2):
        path = ckpts / f'step.lengths.p{rank}.pkl'
        assert path.is_file(), os.listdir(ckpts)
        with open(path, 'rb') as f:
            payloads.append(pickle.load(f))
    assert payloads[0]['epoch'] == payloads[1]['epoch'] == 2
    assert payloads[0]['batches_done'] == payloads[1]['batches_done']
    for p in payloads:
        assert p['lengths']['live'], p
    # Each rank learned lengths for ITS shard: 8/2 = 4 utterances each,
    # keyed by rank-LOCAL dataset index (the coordinate its own loader
    # replays with).
    assert len(payloads[0]['lengths']['live']) == 4
    assert len(payloads[1]['lengths']['live']) == 4
    # Only the lead host wrote the checkpoint itself.
    assert (ckpts / 'step.npz').is_file()
    assert (ckpts / 'step.train.pkl').is_file()


@pytest.mark.slow
def test_two_process_fsdp_orbax(tmp_path):
    """--fsdp --multihost: parameters/Adam moments/EMA sharded over the
    cross-host 'data' axis (4-way over 2 hosts x 2 devices), with Orbax
    owning checkpoints (each host writes its own shards; .npz saves are
    skipped). A second invocation resumes from the Orbax step and trains
    a further epoch."""
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))
    data_root = str(tmp_path / 'data')
    subprocess.run(
        [sys.executable, '-c',
         'import sys; sys.argv=[""]\n'
         'from morgana_tpu.data.synthetic import generate_voice_data\n'
         f'generate_voice_data({data_root!r}, num_train=8, num_valid=4, '
         'num_test=2, seed=9)'],
        cwd=repo, check=True, env=_clean_env(repo), timeout=120)

    def launch(end_epoch):
        port = _free_port()
        procs = []
        for rank in range(2):
            env = _clean_env(repo)
            env.update({
                'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
                'MORGANA_COORDINATOR': f'localhost:{port}',
                'MORGANA_NUM_PROCESSES': '2',
                'MORGANA_PROCESS_ID': str(rank),
            })
            procs.append(subprocess.Popen(
                [sys.executable,
                 os.path.join(repo, 'models', 'f0_test_model.py'),
                 '--experiment_name', 'mhfsdp', '--data_root', data_root,
                 '--train_id_list', 'train/train_file_id_list.scp',
                 '--valid_id_list', 'valid/valid_file_id_list.scp',
                 '--test_id_list', 'test/test_file_id_list.scp',
                 '--batch_size', '4', '--end_epoch', str(end_epoch),
                 '--device', 'cpu', '--multihost', '--data_parallel',
                 '--fsdp', '--orbax_dir', 'ob'],
                cwd=str(tmp_path), env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outputs = []
        for proc in procs:
            out, _ = proc.communicate(timeout=420)
            outputs.append(out)
            assert proc.returncode == 0, out[-3000:]
        return outputs

    outputs = launch(end_epoch=2)
    # Synchronised FSDP training: both ranks report the SAME losses.
    losses = [re.findall(r'valid_loss ([\d.]+)', out) for out in outputs]
    assert losses[0] and losses[0] == losses[1], losses

    expdir = tmp_path / 'experiments' / 'mhfsdp'
    logs = ''.join(open(expdir / 'log' / f).read()
                   for f in os.listdir(expdir / 'log')
                   if f.endswith('.stdout'))
    assert 'FSDP' in logs
    assert '.npz checkpoints skipped' in logs
    # Orbax steps exist; no .npz was written.
    ob = tmp_path / 'ob'
    steps = sorted(int(d) for d in os.listdir(ob) if d.isdigit())
    assert steps == [1, 2], steps
    ckpt_dir = expdir / 'checkpoints'
    assert not ckpt_dir.is_dir() or not any(
        f.endswith('.npz') for f in os.listdir(ckpt_dir))

    # Resume: a fresh invocation restores the Orbax step and trains on.
    outputs = launch(end_epoch=3)
    assert any('Restored training state from Orbax' in o for o in outputs[:1])
    assert re.search(r'epoch  ?3: Training model',
                     outputs[0]) or 'epoch 3' in outputs[0]
    steps = sorted(int(d) for d in os.listdir(ob) if d.isdigit())
    assert steps[-1] == 3, steps
