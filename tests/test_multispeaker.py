"""Multi-speaker pipeline: speaker_id source + speaker-dependent normalisers
end-to-end through the builder."""
import json
import os

import numpy as np
import pytest

from conftest import builder_args
from morgana_tpu import data, losses, metrics, nn
from morgana_tpu.base_models import BaseSPSS
from morgana_tpu.data import data_sources
from morgana_tpu.data.synthetic import generate_voice_data
from morgana_tpu.experiment_builder import ExperimentBuilder

import jax.numpy as jnp


class TinySpeakerModel(BaseSPSS):
    """Frame-level lf0 regressor whose target normalisation is
    speaker-dependent."""

    def __init__(self, hidden=16):
        super().__init__()
        self.layers = nn.SequentialWithRecurrent(
            nn.Linear(9, hidden), nn.Sigmoid(), nn.Linear(hidden, 1))

    def normaliser_sources(self):
        return {
            'lf0': data.SpeakerDependentMeanVarianceNormaliser('lf0', 'speakers.scp'),
        }

    def train_data_sources(self):
        return {
            'speaker_id': data_sources.StringSource('speaker_id'),
            'n_frames': data_sources.TextSource('n_frames', sentence_level=True),
            'counters': data_sources.NumpyBinarySource('counters'),
            'lf0': data_sources.NumpyBinarySource('lf0'),
        }

    def predict(self, features):
        pred = self.layers(features['counters'], seq_len=features['n_frames'])
        return {'normalised_lf0': pred}

    def loss(self, features, output_features):
        return losses.mse(output_features['normalised_lf0'],
                          features['normalised_lf0'], features['n_frames'])


@pytest.fixture(scope='module')
def speaker_voice_data(tmp_path_factory):
    root = tmp_path_factory.mktemp('spk_data')
    data_root = str(root / 'data')
    generate_voice_data(data_root, num_train=8, num_valid=4, num_test=2, seed=7,
                        speakers=['spk_a', 'spk_b'])
    return data_root


class TestMultiSpeaker:
    def test_dataset_normalises_per_speaker(self, speaker_voice_data):
        model = TinySpeakerModel()
        normalisers = model.normaliser_sources()
        for norm in normalisers.values():
            norm.load_params('train', speaker_voice_data)

        ds = data.FilesDataset(model.train_data_sources(), 'train',
                               'train/train_file_id_list.scp', normalisers,
                               speaker_voice_data)
        items = [ds[i] for i in range(len(ds))]
        speakers = {item['speaker_id'] for item in items}
        assert speakers == {'spk_a', 'spk_b'}

        # Per-speaker normalisation makes the per-speaker lf0 offset vanish.
        by_speaker = {}
        for item in items:
            by_speaker.setdefault(item['speaker_id'], []).append(
                item['normalised_lf0'].mean())
        means = {k: float(np.mean(v)) for k, v in by_speaker.items()}
        assert abs(means['spk_a'] - means['spk_b']) < 0.2

        # Raw lf0 keeps the offset (sanity that speakers actually differ).
        raw = {}
        for item in items:
            raw.setdefault(item['speaker_id'], []).append(item['lf0'].mean())
        raw_means = {k: float(np.mean(v)) for k, v in raw.items()}
        assert abs(raw_means['spk_a'] - raw_means['spk_b']) > 0.1

    def test_trains_through_builder(self, speaker_voice_data, tmp_path):
        args = builder_args(speaker_voice_data, str(tmp_path / 'experiments'),
                            end_epoch=2, valid=True)
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinySpeakerModel, experiment_name='spk', **args)
        exp.run_experiment()

        expdir = os.path.join(str(tmp_path / 'experiments'), 'spk')
        m1 = json.load(open(os.path.join(expdir, 'train', 'epoch_1', 'metrics.json')))
        m2 = json.load(open(os.path.join(expdir, 'train', 'epoch_2', 'metrics.json')))
        assert m2['loss'] < m1['loss']

    def test_multispeaker_example_model(self, speaker_voice_data, tmp_path):
        """The shipped models/multispeaker_f0.py example trains end-to-end."""
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'models'))
        from multispeaker_f0 import MultiSpeakerF0Model

        args = builder_args(speaker_voice_data, str(tmp_path / 'experiments'),
                            end_epoch=2, valid=False,
                            model_kwargs={'hidden': 8})
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(MultiSpeakerF0Model, experiment_name='msf0', **args)
        exp.run_experiment()

        expdir = os.path.join(str(tmp_path / 'experiments'), 'msf0')
        m1 = json.load(open(os.path.join(expdir, 'train', 'epoch_1', 'metrics.json')))
        m2 = json.load(open(os.path.join(expdir, 'train', 'epoch_2', 'metrics.json')))
        assert m2['loss'] < m1['loss']
        assert 'RMSE_norm' in m1
