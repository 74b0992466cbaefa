"""Multi-speaker F0 model — speaker adaptation through normalisation.

Beyond-reference example (the reference framework documents speaker-dependent
normalisers as public data-spec surface — ``morgana/data.py:388-530,567-576``
— but ships no model using them): a frame-level lf0 regressor whose target
normalisation is per-speaker, so one network models every speaker's pitch
dynamics while each speaker keeps their own mean/variance — the classic SPSS
average-voice recipe.

Data layout: the corpus adds a ``speaker_id/{utt}.txt`` file per utterance, a
``speakers.scp`` list, and per-speaker normaliser parameters at
``{norm_dir}/{speaker_id}/lf0_mvn.json``
(``morgana_tpu.data.synthetic.generate_voice_data(speakers=[...])`` produces
all of this for a demo voice).

Run:  python models/multispeaker_f0.py --experiment_name msf0 --data_root data ...
"""
import numpy as np

from morgana_tpu.base_models import BaseSPSS
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu import data
from morgana_tpu import losses
from morgana_tpu import metrics
from morgana_tpu import nn
from morgana_tpu.data import data_sources


class MultiSpeakerF0Model(BaseSPSS):
    def __init__(self, dropout_prob=0., hidden=64, rnn_backend='scan'):
        super(MultiSpeakerF0Model, self).__init__()
        self.layers = nn.SequentialWithRecurrent(
            nn.Linear(9, 4 * hidden),
            nn.Sigmoid(),
            nn.Dropout(p=dropout_prob),
            nn.Recurrent('gru', 4 * hidden, hidden, backend=rnn_backend),
            nn.Dropout(p=dropout_prob),
            nn.Linear(hidden, 1),
        )
        # Normalised-space RMSE: speaker-dependent denormalisation needs the
        # (host-side, string) speaker ids, so the in-step metric stays in
        # normalised space; Hz-space evaluation happens in analysis hooks.
        self.metrics.add_metrics('all', RMSE_norm=metrics.RMSE())

    def normaliser_sources(self):
        return {
            'counters': data.MinMaxNormaliser('counters'),
            'lf0': data.SpeakerDependentMeanVarianceNormaliser('lf0', 'speakers.scp'),
        }

    def train_data_sources(self):
        return {
            'speaker_id': data_sources.StringSource('speaker_id'),
            'n_frames': data_sources.TextSource('n_frames', sentence_level=True),
            'counters': data_sources.NumpyBinarySource('counters'),
            'lf0': data_sources.NumpyBinarySource('lf0'),
            'vuv': data_sources.NumpyBinarySource('vuv'),
        }

    def predict(self, features):
        pred = self.layers(features['normalised_counters'],
                           seq_len=features['n_frames'])
        outputs = {'normalised_lf0': pred}
        # Denormalisation is per-speaker: the normaliser gathers each row's
        # speaker parameters. Batch-level speaker ids are host-side strings,
        # so this runs outside jit only when ids are present (analysis path).
        if 'speaker_id' in features and isinstance(features['speaker_id'], list):
            outputs['lf0'] = self.normalisers['lf0'].denormalise(
                np.asarray(pred), features['speaker_id'])
        return outputs

    def loss(self, features, output_features):
        loss = losses.mse(output_features['normalised_lf0'],
                          features['normalised_lf0'], features['n_frames'])
        self.metrics.accumulate(
            self.mode,
            RMSE_norm=(features['normalised_lf0'],
                       output_features['normalised_lf0'],
                       features['n_frames']))
        return loss


def main():
    args = ExperimentBuilder.get_experiment_args()
    nn.manual_seed(args.get('seed', 1234567890))
    experiment = ExperimentBuilder(MultiSpeakerF0Model, **args)
    experiment.run_experiment()


if __name__ == '__main__':
    main()
