"""Full acoustic model: LSTM stack predicting all vocoder parameter streams.

TPU-native rebuild of the reference ``models/RNN_SPSS.py``:
Linear(609->512) + 8xLSTM(512) + Linear->256 -> per-stream heads
(lf0: 3, vuv: 1, mcep: 180, bap: 15). The masked-MSE + BCE loss trains on
normalised deltas; MLPG runs fully on device (the reference detached to host
bandmat inside ``predict`` on every batch, ``models/RNN_SPSS.py:108-118``).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from morgana_tpu.base_models import BaseSPSS
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu.viz.synthesis import MLPG_streams
from morgana_tpu import data
from morgana_tpu import losses
from morgana_tpu import metrics
from morgana_tpu import nn
from morgana_tpu import utils
from morgana_tpu.data import data_sources
from morgana_tpu.data import file_io


class LSTMAcousticModel(BaseSPSS):
    def __init__(self, input_dim=600 + 9, output_dims=None, dropout_prob=0.,
                 num_layers=8, hidden_size=512, rnn_backend='scan',
                 rnn_unroll=8):
        """Initialises acoustic model parameters and settings (reference
        architecture: ``models/RNN_SPSS.py:21-48``)."""
        if output_dims is None:
            output_dims = {'lf0': 1 * 3, 'vuv': 1, 'mcep': 60 * 3, 'bap': 5 * 3}

        super(LSTMAcousticModel, self).__init__()
        self.input_dim = input_dim
        self.output_dims = output_dims
        self.dropout_prob = dropout_prob
        self.num_layers = num_layers
        self.hidden_size = hidden_size
        self.rnn_backend = rnn_backend
        self.rnn_unroll = rnn_unroll

        # rnn_backend='pallas' selects the fused persistent-RNN kernel
        # (ops/pallas_rnn.py): ~1.75x faster fwd+bwd per layer on TPU than the
        # masked scan at this size. 'scan' keeps exact pack/unpack semantics;
        # rnn_unroll amortises per-iteration loop overhead (unroll 32-64 is
        # ~3x faster than 8 on TPU at training shapes, exact same numerics).
        self.layers = nn.SequentialWithRecurrent(
            nn.Linear(self.input_dim, hidden_size),
            nn.Sigmoid(),
            nn.Dropout(p=self.dropout_prob),
            *[nn.Recurrent('lstm', hidden_size, hidden_size, dropout=self.dropout_prob,
                           backend=rnn_backend, unroll=rnn_unroll)
              for _ in range(self.num_layers)],
            nn.Linear(hidden_size, 256),
            nn.Sigmoid(),
            nn.Dropout(p=self.dropout_prob),
            nn.Linear(256, sum(self.output_dims.values())),
        )

        self.metrics.add_metrics('all',
                                 LF0_RMSE_Hz=metrics.LF0Distortion(),
                                 VUV_accuracy=metrics.Mean(),
                                 MCEP_distortion=metrics.MelCepDistortion(),
                                 BAP_distortion=metrics.Distortion())

    def normaliser_sources(self):
        return {
            'dur': data.MeanVarianceNormaliser('dur'),
            'lab': data.MinMaxNormaliser('lab'),
            'counters': data.MinMaxNormaliser('counters'),
            'lf0': data.MeanVarianceNormaliser('lf0', use_deltas=True),
            'mcep': data.MeanVarianceNormaliser('mcep', use_deltas=True),
            'bap': data.MeanVarianceNormaliser('bap', use_deltas=True),
        }

    def train_data_sources(self):
        return {
            'n_frames': data_sources.TextSource('n_frames', sentence_level=True),
            'dur': data_sources.TextSource('dur'),
            'lab': data_sources.NumpyBinarySource('lab'),
            'counters': data_sources.NumpyBinarySource('counters'),
            'lf0': data_sources.NumpyBinarySource('lf0', use_deltas=True),
            'vuv': data_sources.NumpyBinarySource('vuv'),
            'mcep': data_sources.NumpyBinarySource('mcep', use_deltas=True),
            'bap': data_sources.NumpyBinarySource('bap', use_deltas=True),
        }

    def predict(self, features):
        # Input preparation + head split are shared with the streaming path
        # (one source of truth for both).
        model_inputs = self.stream_inputs(features)

        # Run the model.
        n_frames = features['n_frames']
        pred_norm_deltas = self.layers(model_inputs, seq_len=n_frames)

        pred_norm_lf0_deltas, pred_vuv, pred_norm_mcep_deltas, pred_norm_bap_deltas = \
            self._split_heads(pred_norm_deltas)

        # All three MLPG stream solves fuse into ONE batched banded solve
        # (stop-gradient matches the reference's `.detach()` before MLPG).
        streams = {}
        for name, pred in (('lf0', pred_norm_lf0_deltas),
                           ('mcep', pred_norm_mcep_deltas),
                           ('bap', pred_norm_bap_deltas)):
            deltas = self.normalisers[name].denormalise(pred, deltas=True)
            streams[name] = (jax.lax.stop_gradient(deltas),
                             self.normalisers[name].delta_params['std_dev'] ** 2)
        trajs = MLPG_streams(streams, padding_size=100, seq_len=n_frames)
        pred_lf0, pred_mcep, pred_bap = trajs['lf0'], trajs['mcep'], trajs['bap']

        pred_vuv = jax.nn.sigmoid(pred_vuv)

        return {
            'normalised_lf0_deltas': pred_norm_lf0_deltas,
            'normalised_mcep_deltas': pred_norm_mcep_deltas,
            'normalised_bap_deltas': pred_norm_bap_deltas,
            'lf0': pred_lf0,
            'vuv': pred_vuv,
            'mcep': pred_mcep,
            'bap': pred_bap,
        }

    # ------------------------------------------------------- streaming hooks

    def _split_heads(self, pred_norm_deltas):
        """Splits the network output into the (lf0, vuv, mcep, bap) heads —
        one definition for predict() and stream_step()."""
        output_dims = [self.output_dims[n] for n in ['lf0', 'vuv', 'mcep', 'bap']]
        splits = np.cumsum(output_dims)[:-1]
        return jnp.split(pred_norm_deltas, splits, axis=-1)

    def stream_inputs(self, features):
        # Also predict()'s input-preparation stage: duration-upsample phone
        # labels to frame rate and concatenate the frame-level counters.
        max_n_frames = features['normalised_counters'].shape[1]
        norm_lab_at_frame_rate = utils.upsample_to_repetitions(
            features['normalised_lab'], features['dur'], max_len=max_n_frames)
        return jnp.concatenate(
            (norm_lab_at_frame_rate, features['normalised_counters']), axis=-1)

    def stream_step(self, inputs_chunk, state):
        pred_norm_deltas, state = self.layers(
            inputs_chunk, hiddens=state, return_hiddens=True)
        pred_norm_lf0_deltas, pred_vuv, pred_norm_mcep_deltas, pred_norm_bap_deltas = \
            self._split_heads(pred_norm_deltas)

        outputs = {
            'normalised_lf0_deltas': pred_norm_lf0_deltas,
            'normalised_mcep_deltas': pred_norm_mcep_deltas,
            'normalised_bap_deltas': pred_norm_bap_deltas,
            'vuv': jax.nn.sigmoid(pred_vuv),
        }
        for name, pred in (('lf0', pred_norm_lf0_deltas),
                           ('mcep', pred_norm_mcep_deltas),
                           ('bap', pred_norm_bap_deltas)):
            outputs[f'{name}_deltas'] = self.normalisers[name].denormalise(
                pred, deltas=True)
        return outputs, state

    def stream_output_spec(self):
        spec = {'vuv': None}
        for name in ('lf0', 'mcep', 'bap'):
            # Same global variances + burn-in as predict()'s fused MLPG.
            variances = self.normalisers[name].delta_params['std_dev'] ** 2
            spec[name] = (f'{name}_deltas', variances, 100)
        return spec

    def loss(self, features, output_features):
        n_frames = features['n_frames']
        vuv = output_features['vuv'] > 0.5

        self.metrics.accumulate(
            self.mode,
            LF0_RMSE_Hz=(features['lf0'], output_features['lf0'], vuv, n_frames),
            VUV_accuracy=((features['vuv'] == vuv).astype(jnp.float32), n_frames),
            MCEP_distortion=(features['mcep'], output_features['mcep'], n_frames),
            BAP_distortion=(features['bap'], output_features['bap'], n_frames))

        loss = 0.
        loss += losses.mse(output_features['normalised_lf0_deltas'],
                           features['normalised_lf0_deltas'], n_frames)
        loss += losses.mse(output_features['normalised_mcep_deltas'],
                           features['normalised_mcep_deltas'], n_frames)
        loss += losses.mse(output_features['normalised_bap_deltas'],
                           features['normalised_bap_deltas'], n_frames)
        loss += losses.bce(output_features['vuv'].astype(jnp.float32),
                           features['vuv'].astype(jnp.float32), n_frames)

        return loss / 4.

    def analysis_for_valid_batch(self, features, output_features, out_dir,
                                 sample_rate=16000, **kwargs):
        kwargs['sample_rate'] = sample_rate
        super(LSTMAcousticModel, self).analysis_for_valid_batch(
            features, output_features, out_dir, **kwargs)

        from morgana_tpu import vocoder

        synth_dir = os.path.join(out_dir, 'synth')
        os.makedirs(synth_dir, exist_ok=True)

        lf0, vuv, mcep, bap = utils.detach_batched_seqs(
            output_features['lf0'], output_features['vuv'],
            output_features['mcep'], output_features['bap'],
            seq_len=features['n_frames'])

        for _lf0, _vuv, _mcep, _bap, _file_id in zip(lf0, vuv, mcep, bap, features['name']):
            _vuv = _vuv > 0.5
            _f0 = np.exp(_lf0)
            _f0 = vocoder.smooth_f0(_f0)

            wav = vocoder.synthesize_world_feats(_f0, _vuv, _mcep, _bap, sample_rate)
            file_io.save_wav(wav, os.path.join(synth_dir, f'{_file_id}.wav'),
                             sample_rate=sample_rate)


def main():
    args = ExperimentBuilder.get_experiment_args()
    nn.manual_seed(args.get('seed', 1234567890))
    experiment = ExperimentBuilder(LSTMAcousticModel, **args)
    experiment.run_experiment()


if __name__ == '__main__':
    main()
