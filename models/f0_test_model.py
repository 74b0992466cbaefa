"""F0 regression model — the CPU-runnable smoke-test model.

TPU-native rebuild of the reference ``models/f0_test_model.py``: DNN + 3xGRU
lf0-delta regressor with MLPG trajectory smoothing. The user-facing structure
is identical (``normaliser_sources`` / ``train_data_sources`` / ``predict`` /
``loss`` / ``analysis_for_valid_batch``); differences are TPU-idiomatic:
``upsample_to_repetitions`` takes the static frame length from the padded
counters feature, and MLPG runs on device inside the jitted step (the
reference round-tripped to host bandmat per batch).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from morgana_tpu.base_models import BaseSPSS
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu import data
from morgana_tpu import losses
from morgana_tpu import metrics
from morgana_tpu import nn
from morgana_tpu import utils
from morgana_tpu import viz
from morgana_tpu.data import data_sources
from morgana_tpu.data import file_io


class F0Model(BaseSPSS):
    def __init__(self, dropout_prob=0., input_dim=600 + 9, output_dim=1 * 3,
                 rnn_backend='scan', rnn_unroll=8):
        r"""Initialises acoustic model parameters and settings
        (reference architecture: ``models/f0_test_model.py:22-45``)."""
        super(F0Model, self).__init__()
        self.input_dim = input_dim
        self.output_dim = output_dim

        self.layers = nn.SequentialWithRecurrent(
            nn.Linear(self.input_dim, 256),
            nn.Sigmoid(),
            nn.Dropout(p=dropout_prob),
            nn.Recurrent('gru', 256, 64, backend=rnn_backend, unroll=rnn_unroll),
            nn.Dropout(p=dropout_prob),
            nn.Recurrent('gru', 64, 64, backend=rnn_backend, unroll=rnn_unroll),
            nn.Dropout(p=dropout_prob),
            nn.Recurrent('gru', 64, 64, backend=rnn_backend, unroll=rnn_unroll),
            nn.Dropout(p=dropout_prob),
            nn.Linear(64, 64),
            nn.Sigmoid(),
            nn.Dropout(p=dropout_prob),
            nn.Linear(64, self.output_dim),
        )

        self.metrics.add_metrics('all', LF0_RMSE_Hz=metrics.LF0Distortion())

    def normaliser_sources(self):
        return {
            'dur': data.MeanVarianceNormaliser('dur'),
            'lab': data.MinMaxNormaliser('lab'),
            'counters': data.MinMaxNormaliser('counters'),
            'lf0': data.MeanVarianceNormaliser('lf0', use_deltas=True),
        }

    def train_data_sources(self):
        return {
            'n_frames': data_sources.TextSource('n_frames', sentence_level=True),
            'n_phones': data_sources.TextSource('n_phones', sentence_level=True),
            'dur': data_sources.TextSource('dur'),
            'lab': data_sources.NumpyBinarySource('lab'),
            'counters': data_sources.NumpyBinarySource('counters'),
            'lf0': data_sources.NumpyBinarySource('lf0', use_deltas=True),
            'vuv': data_sources.NumpyBinarySource('vuv'),
        }

    def valid_data_sources(self):
        sources = self.train_data_sources()
        sources['sp'] = data_sources.NumpyBinarySource('sp')
        sources['ap'] = data_sources.NumpyBinarySource('ap')
        return sources

    def predict(self, features):
        # Input preparation is shared with the streaming path (one source of
        # truth): upsample phone-level labels to frame level by duration and
        # concatenate the frame-level counters.
        model_inputs = self.stream_inputs(features)
        n_frames = features['n_frames']

        # Run the network.
        pred_norm_lf0_deltas = self.layers(model_inputs, seq_len=n_frames)

        # Prepare the outputs (denormalise deltas, MLPG for the trajectory).
        pred_lf0_deltas = self.normalisers['lf0'].denormalise(pred_norm_lf0_deltas, deltas=True)

        global_variance = self.normalisers['lf0'].delta_params['std_dev'] ** 2
        # stop_gradient matches the reference's `.detach()` before MLPG —
        # the loss trains on normalised deltas; MLPG output feeds metrics only.
        pred_lf0 = viz.synthesis.MLPG(
            jax.lax.stop_gradient(pred_lf0_deltas), global_variance,
            padding_size=100, seq_len=n_frames)

        return {
            'normalised_lf0_deltas': pred_norm_lf0_deltas,
            'lf0': pred_lf0,
        }

    # ------------------------------------------------------- streaming hooks

    def stream_inputs(self, features):
        # Also predict()'s input-preparation stage; the static frame length
        # comes from the padded frame-level counters feature.
        max_n_frames = features['normalised_counters'].shape[1]
        norm_lab_at_frame_rate = utils.upsample_to_repetitions(
            features['normalised_lab'], features['dur'], max_len=max_n_frames)
        return jnp.concatenate(
            (norm_lab_at_frame_rate, features['normalised_counters']), axis=-1)

    def stream_step(self, inputs_chunk, state):
        pred_norm_lf0_deltas, state = self.layers(
            inputs_chunk, hiddens=state, return_hiddens=True)
        pred_lf0_deltas = self.normalisers['lf0'].denormalise(
            pred_norm_lf0_deltas, deltas=True)
        return {'normalised_lf0_deltas': pred_norm_lf0_deltas,
                'lf0_deltas': pred_lf0_deltas}, state

    def stream_output_spec(self):
        global_variance = self.normalisers['lf0'].delta_params['std_dev'] ** 2
        return {
            'normalised_lf0_deltas': None,
            # Same global variance + burn-in as predict()'s batch MLPG.
            'lf0': ('lf0_deltas', global_variance, 100),
        }

    def loss(self, features, output_features):
        seq_len = features['n_frames']

        loss = losses.mse(output_features['normalised_lf0_deltas'],
                          features['normalised_lf0_deltas'], seq_len)

        self.metrics.accumulate(
            self.mode,
            LF0_RMSE_Hz=(features['lf0'], output_features['lf0'], features['vuv'], seq_len))

        return loss

    def analysis_for_valid_batch(self, features, output_features, out_dir,
                                 sample_rate=16000, **kwargs):
        kwargs['sample_rate'] = sample_rate
        super(F0Model, self).analysis_for_valid_batch(features, output_features, out_dir, **kwargs)

        # Synthesise waveforms with the WORLD-style vocoder (host-side C++/numpy).
        from morgana_tpu import vocoder

        synth_dir = os.path.join(out_dir, 'synth')
        os.makedirs(synth_dir, exist_ok=True)

        lf0 = np.asarray(output_features['lf0'])
        vuv = np.asarray(features['vuv'])
        sp = np.asarray(features['sp'])
        ap = np.asarray(features['ap'])
        n_frames = np.asarray(features['n_frames']).astype(np.int64).reshape(-1)

        for i, (n_frame, name) in enumerate(zip(n_frames, features['name'])):
            f0_i = np.exp(lf0[i, :n_frame, 0])
            f0_i = vocoder.smooth_f0(f0_i)
            f0_i = f0_i * vuv[i, :n_frame, 0]

            wav = vocoder.synthesize(f0_i.astype(np.float64),
                                     sp[i, :n_frame].astype(np.float64),
                                     ap[i, :n_frame].astype(np.float64),
                                     sample_rate)
            file_io.save_wav(wav, os.path.join(synth_dir, f'{name}.wav'), sample_rate=sample_rate)


def main():
    args = ExperimentBuilder.get_experiment_args()
    nn.manual_seed(args.get('seed', 1234567890))
    experiment = ExperimentBuilder(F0Model, **args)
    experiment.run_experiment()


if __name__ == '__main__':
    main()
