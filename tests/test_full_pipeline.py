"""The complete user journey on raw audio: wavs -> `data.prepare` ->
normalised training data -> builder training -> waveform resynthesis.

Everything the reference delegated to external tools (feature extraction,
normaliser fitting, WORLD synthesis) runs in-repo here, end to end.
"""
import os

import numpy as np
import pytest

from conftest import builder_args
from morgana_tpu import data, losses, metrics, nn
from morgana_tpu.base_models import BaseSPSS
from morgana_tpu.data import data_sources, file_io
from morgana_tpu.data.prepare import prepare_voice
from morgana_tpu.experiment_builder import ExperimentBuilder

FS = 16000


def _speechy_wav(rng, dur_s=0.8):
    """Harmonic 'voiced' stretches separated by noise 'consonants'."""
    n = int(dur_s * FS)
    t = np.arange(n) / FS
    f0 = 140 + 40 * np.sin(2 * np.pi * 1.7 * t + rng.uniform(0, 6))
    phase = 2 * np.pi * np.cumsum(f0) / FS
    voiced = sum((1 / k) * np.sin(k * phase) for k in range(1, 6))
    gate = (np.sin(2 * np.pi * 2.5 * t + rng.uniform(0, 6)) > -0.3)
    wav = np.where(gate, 0.3 * voiced, 0.02 * rng.standard_normal(n))
    return (wav / np.abs(wav).max() * 0.5).astype(np.float32)


class CountersToAcoustics(BaseSPSS):
    """Frame-position counters -> lf0 regressor over prepared features."""

    def __init__(self, hidden=24):
        super().__init__()
        self.layers = nn.SequentialWithRecurrent(
            nn.Linear(9, hidden), nn.Sigmoid(),
            nn.Recurrent('gru', hidden, hidden),
            nn.Linear(hidden, 1))
        self.metrics.add_metrics('all', LF0_RMSE_Hz=metrics.LF0Distortion())

    def normaliser_sources(self):
        return {'counters': data.MinMaxNormaliser('counters'),
                'lf0': data.MeanVarianceNormaliser('lf0')}

    def train_data_sources(self):
        return {'n_frames': data_sources.TextSource('n_frames', sentence_level=True),
                'counters': data_sources.NumpyBinarySource('counters'),
                'lf0': data_sources.NumpyBinarySource('lf0'),
                'vuv': data_sources.NumpyBinarySource('vuv')}

    def predict(self, features):
        pred = self.layers(features['normalised_counters'],
                           seq_len=features['n_frames'])
        return {'normalised_lf0': pred,
                'lf0': self.normalisers['lf0'].denormalise(pred)}

    def loss(self, features, output_features):
        import jax.numpy as jnp
        self.metrics.accumulate(
            self.mode, LF0_RMSE_Hz=(
                features['lf0'], output_features['lf0'],
                jnp.asarray(features['vuv'], bool), features['n_frames']))
        return losses.mse(output_features['normalised_lf0'],
                          features['normalised_lf0'], features['n_frames'])


@pytest.mark.slow
def test_wav_to_training_to_synthesis(tmp_path, rng):
    # 1. Raw audio corpus.
    wav_dir = tmp_path / 'wavs'
    wav_dir.mkdir()
    for i in range(10):
        file_io.save_wav(_speechy_wav(rng), str(wav_dir / f'utt_{i:02d}.wav'),
                         sample_rate=FS)

    # 2. Feature extraction + normaliser fitting + splits.
    out_dir = str(tmp_path / 'data')
    id_lists = prepare_voice(str(wav_dir), out_dir, sample_rate=FS,
                             valid_fraction=0.2, test_fraction=0.1, seed=0)
    assert len(id_lists['train']) >= 6
    assert os.path.isfile(os.path.join(out_dir, 'train', 'lf0_mvn.json'))
    assert os.path.isfile(os.path.join(out_dir, 'train', 'counters_minmax.json'))

    # 3. Train through the full builder on the prepared voice.
    args = builder_args(out_dir, str(tmp_path / 'experiments'),
                        end_epoch=3, valid=True, batch_size=2,
                        learning_rate=0.02)
    nn.manual_seed(args['seed'])
    exp = ExperimentBuilder(CountersToAcoustics, experiment_name='voice', **args)
    exp.run_experiment()

    import json
    expdir = tmp_path / 'experiments' / 'voice'
    m1 = json.load(open(expdir / 'train' / 'epoch_1' / 'metrics.json'))
    m3 = json.load(open(expdir / 'train' / 'epoch_3' / 'metrics.json'))
    assert m3['loss'] < m1['loss']
    assert np.isfinite(m1['LF0_RMSE_Hz'])

    # 4. Resynthesise audio from the trained model's lf0 with the prepared
    #    spectral features (the reference's F0Model analysis recipe).
    from morgana_tpu import vocoder
    utt = id_lists['valid'][0]
    valid_dir = os.path.join(out_dir, 'valid')
    lf0 = np.load(os.path.join(valid_dir, 'lf0', f'{utt}.npy'))
    vuv = np.load(os.path.join(valid_dir, 'vuv', f'{utt}.npy'))
    mcep = np.load(os.path.join(valid_dir, 'mcep', f'{utt}.npy'))
    bap = np.load(os.path.join(valid_dir, 'bap', f'{utt}.npy'))
    wav = np.asarray(vocoder.synthesize_world_feats(
        np.exp(lf0[:, 0]), vuv[:, 0], mcep, bap, FS))
    assert np.abs(wav).max() <= 1.0
    assert np.sqrt(np.mean(wav ** 2)) > 1e-3
