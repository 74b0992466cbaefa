"""Duration model: linguistic-label -> phone-duration regression.

One of the reference framework's canonical use-cases (BASELINE config:
"duration model: linguistic-label->phone-duration regression with TextSource
'dur' targets"): a phone-level recurrent regressor trained on normalised
log-ish durations, evaluated with duration RMSE in frames.
"""
import jax.numpy as jnp

from morgana_tpu.base_models import BaseSPSS
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu import data
from morgana_tpu import losses
from morgana_tpu import metrics
from morgana_tpu import nn
from morgana_tpu import viz
from morgana_tpu.data import data_sources


class DurationModel(BaseSPSS):
    def __init__(self, input_dim=600, hidden_size=128, dropout_prob=0.):
        super(DurationModel, self).__init__()
        self.input_dim = input_dim

        self.layers = nn.SequentialWithRecurrent(
            nn.Linear(self.input_dim, hidden_size),
            nn.Sigmoid(),
            nn.Dropout(p=dropout_prob),
            nn.Recurrent('gru', hidden_size, hidden_size),
            nn.Dropout(p=dropout_prob),
            nn.Linear(hidden_size, 1),
        )

        self.metrics.add_metrics('all', dur_RMSE_frames=metrics.RMSE())

    def normaliser_sources(self):
        return {
            'lab': data.MinMaxNormaliser('lab'),
            'dur': data.MeanVarianceNormaliser('dur'),
        }

    def train_data_sources(self):
        return {
            'n_phones': data_sources.TextSource('n_phones', sentence_level=True),
            'dur': data_sources.TextSource('dur'),
            'lab': data_sources.NumpyBinarySource('lab'),
        }

    def predict(self, features):
        n_phones = features['n_phones']
        pred_norm_dur = self.layers(features['normalised_lab'], seq_len=n_phones)
        pred_dur = self.normalisers['dur'].denormalise(pred_norm_dur)
        return {
            'normalised_dur': pred_norm_dur,
            'dur': pred_dur,
        }

    def loss(self, features, output_features):
        n_phones = features['n_phones']
        self.metrics.accumulate(
            self.mode,
            dur_RMSE_frames=(features['dur'].astype(jnp.float32),
                             output_features['dur'], n_phones))
        return losses.mse(output_features['normalised_dur'],
                          features['normalised_dur'], n_phones)

    def analysis_for_valid_batch(self, features, output_features, out_dir, **kwargs):
        # Dump rounded predicted durations per utterance.
        viz.save_batched_seqs({'dur': output_features['dur']},
                              features['name'], out_dir,
                              seq_len=features['n_phones'])


def main():
    args = ExperimentBuilder.get_experiment_args()
    nn.manual_seed(args.get('seed', 1234567890))
    experiment = ExperimentBuilder(DurationModel, **args)
    experiment.run_experiment()


if __name__ == '__main__':
    main()
