"""Integration tests for the bundled example models on synthetic data."""
import json
import os
import sys

import numpy as np
import pytest

from conftest import builder_args
from morgana_tpu import nn
from morgana_tpu.experiment_builder import ExperimentBuilder

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'models'))


def _run(model_cls, voice_data, tmp_path, name, **overrides):
    args = builder_args(voice_data['data_root'], str(tmp_path / 'experiments'), **overrides)
    nn.manual_seed(args['seed'])
    exp = ExperimentBuilder(model_cls, experiment_name=name, **args)
    exp.run_experiment()
    return os.path.join(str(tmp_path / 'experiments'), name)


def _epoch_metrics(expdir, mode, epoch):
    return json.load(open(os.path.join(expdir, mode, f'epoch_{epoch}', 'metrics.json')))


@pytest.mark.slow
def test_duration_model_trains(voice_data, tmp_path):
    from duration_model import DurationModel
    expdir = _run(DurationModel, voice_data, tmp_path, 'dur',
                  end_epoch=3, valid=True, learning_rate=0.01)
    m1, m3 = _epoch_metrics(expdir, 'train', 1), _epoch_metrics(expdir, 'train', 3)
    assert m3['loss'] < m1['loss']
    assert 'dur_RMSE_frames' in m1 and np.isfinite(m1['dur_RMSE_frames'])


@pytest.mark.slow
def test_vae_prosody_model_trains(voice_data, tmp_path):
    from vae_prosody import VAEProsodyModel
    expdir = _run(VAEProsodyModel, voice_data, tmp_path, 'vaepros',
                  end_epoch=2, valid=True, test=True, test_output_interval=2,
                  model_kwargs={'kld_anneal_steps': 4, 'hidden_size': 16})
    m = _epoch_metrics(expdir, 'train', 2)
    assert np.isfinite(m['loss']) and 'kld' in m and 'LF0_RMSE_Hz' in m
    # Test-time latent exploration wrote sphere-sampled lf0 trajectories.
    sample_dir = os.path.join(expdir, 'test', 'epoch_2', 'latent_samples', 'feats', 'lf0')
    assert os.path.isdir(sample_dir) and len(os.listdir(sample_dir)) == 8


@pytest.mark.slow
def test_f0_model_trains_and_generates(voice_data, tmp_path):
    from f0_test_model import F0Model
    expdir = _run(F0Model, voice_data, tmp_path, 'f0full',
                  end_epoch=2, valid=True, valid_output_interval=2,
                  ema_decay=0.995, num_data_threads=2)
    m1, m2 = _epoch_metrics(expdir, 'train', 1), _epoch_metrics(expdir, 'train', 2)
    assert m2['loss'] < m1['loss']
    assert np.isfinite(m1['LF0_RMSE_Hz'])
    # gen_output epoch produced synthesised wavs via the analysis hook.
    synth_dir = os.path.join(expdir, 'valid', 'epoch_2', 'synth')
    wavs = [f for f in os.listdir(synth_dir) if f.endswith('.wav')]
    assert len(wavs) == 4


@pytest.mark.slow
def test_rnn_spss_small_trains(voice_data, tmp_path):
    from rnn_spss import LSTMAcousticModel
    expdir = _run(LSTMAcousticModel, voice_data, tmp_path, 'spss',
                  end_epoch=1, valid=True,
                  model_kwargs={'num_layers': 1, 'hidden_size': 32})
    m = _epoch_metrics(expdir, 'train', 1)
    for key in ('loss', 'LF0_RMSE_Hz', 'VUV_accuracy', 'MCEP_distortion', 'BAP_distortion'):
        assert key in m and np.isfinite(m[key]), key


@pytest.mark.slow
def test_transformer_spss_trains(voice_data, tmp_path):
    from transformer_spss import TransformerAcousticModel
    expdir = _run(TransformerAcousticModel, voice_data, tmp_path, 'tfm',
                  end_epoch=3, valid=True, learning_rate=0.001,
                  model_kwargs={'num_layers': 2, 'd_model': 32,
                                'num_heads': 4, 'dropout_prob': 0.1})
    m1, m3 = _epoch_metrics(expdir, 'train', 1), _epoch_metrics(expdir, 'train', 3)
    assert m3['loss'] < m1['loss'], (m1['loss'], m3['loss'])
    for key in ('loss', 'LF0_RMSE_Hz', 'VUV_accuracy', 'MCEP_distortion',
                'BAP_distortion'):
        assert key in m1 and np.isfinite(m1[key]), key
    assert np.isfinite(_epoch_metrics(expdir, 'valid', 3)['loss'])


@pytest.mark.slow
def test_rnn_spss_convergence_soak(voice_data, tmp_path):
    """Multi-epoch soak: the flagship acoustic model's loss and distortion
    metrics must trend DOWN over 6 epochs (catches silent training
    regressions that a 1-2 epoch smoke test would miss), and the EMA
    model's validation loss must be finite and close to the raw model's."""
    from rnn_spss import LSTMAcousticModel
    expdir = _run(LSTMAcousticModel, voice_data, tmp_path, 'soak',
                  end_epoch=6, valid=True, ema_decay=0.9,
                  learning_rate=0.01,
                  model_kwargs={'num_layers': 1, 'hidden_size': 32})

    losses = [_epoch_metrics(expdir, 'train', e)['loss'] for e in range(1, 7)]
    assert all(np.isfinite(l) for l in losses)
    # Robust trend check: mean of last two epochs well below first two.
    assert np.mean(losses[-2:]) < 0.9 * np.mean(losses[:2]), losses

    lf0 = [_epoch_metrics(expdir, 'train', e)['LF0_RMSE_Hz'] for e in range(1, 7)]
    assert lf0[-1] < lf0[0], lf0

    val = _epoch_metrics(expdir, 'valid', 6)
    assert np.isfinite(val['loss'])
    # Per-epoch timing observability present throughout.
    assert _epoch_metrics(expdir, 'train', 6)['ms_per_step'] > 0
