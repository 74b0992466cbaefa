"""Small fast-compiling models used by integration tests."""
import jax.numpy as jnp

from morgana_tpu import data, losses, metrics, nn, utils
from morgana_tpu.base_models import BaseSPSS, BaseVAE
from morgana_tpu.data import data_sources


class TinyF0Model(BaseSPSS):
    """Linear DNN lf0-delta regressor (no RNN/MLPG): the 'minimum slice'."""

    def __init__(self, hidden=16, dropout_prob=0.0):
        super().__init__()
        self.layers = nn.SequentialWithRecurrent(
            nn.Linear(600 + 9, hidden),
            nn.Sigmoid(),
            nn.Dropout(dropout_prob),
            nn.Linear(hidden, 3),
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
            'dur': data_sources.TextSource('dur'),
            'lab': data_sources.NumpyBinarySource('lab'),
            'counters': data_sources.NumpyBinarySource('counters'),
            'lf0': data_sources.NumpyBinarySource('lf0', use_deltas=True),
            'vuv': data_sources.NumpyBinarySource('vuv'),
        }

    def predict(self, features):
        max_n_frames = features['normalised_counters'].shape[1]
        lab_frames = utils.upsample_to_repetitions(
            features['normalised_lab'], features['dur'], max_len=max_n_frames)
        inputs = jnp.concatenate((lab_frames, features['normalised_counters']), axis=-1)
        pred = self.layers(inputs, seq_len=features['n_frames'])
        return {'normalised_lf0_deltas': pred}

    def loss(self, features, output_features):
        seq_len = features['n_frames']
        # lf0 metric on the static stream (denormalised).
        pred_deltas = self.normalisers['lf0'].denormalise(
            output_features['normalised_lf0_deltas'], deltas=True)
        self.metrics.accumulate(
            self.mode,
            LF0_RMSE_Hz=(features['lf0'], pred_deltas[..., :1], features['vuv'], seq_len))
        return losses.mse(output_features['normalised_lf0_deltas'],
                          features['normalised_lf0_deltas'], seq_len)


class TinyVAE(BaseVAE):
    """Sentence-level VAE over mean lf0 (tests the BaseVAE plumbing)."""

    def __init__(self, z_dim=4, kld_weight=1.0):
        super().__init__(z_dim=z_dim, kld_weight=kld_weight)
        self.enc = nn.Linear(600, 2 * z_dim)
        self.dec = nn.Linear(z_dim + 9, 3)

    def normaliser_sources(self):
        return {
            'lab': data.MinMaxNormaliser('lab'),
            'counters': data.MinMaxNormaliser('counters'),
            'lf0': data.MeanVarianceNormaliser('lf0', use_deltas=True),
        }

    def train_data_sources(self):
        return {
            'n_frames': data_sources.TextSource('n_frames', sentence_level=True),
            'dur': data_sources.TextSource('dur'),
            'lab': data_sources.NumpyBinarySource('lab'),
            'counters': data_sources.NumpyBinarySource('counters'),
            'lf0': data_sources.NumpyBinarySource('lf0', use_deltas=True),
        }

    def encode(self, features):
        pooled = jnp.mean(features['normalised_lab'], axis=1)  # (B, 600)
        stats = self.enc(pooled)
        return stats[:, :self.z_dim], stats[:, self.z_dim:]

    def decode(self, latent, features):
        frames = features['normalised_counters']
        z = jnp.broadcast_to(latent[:, None, :], frames.shape[:2] + (self.z_dim,))
        pred = self.dec(jnp.concatenate((z, frames), axis=-1))
        return {'normalised_lf0_deltas': pred}

    def loss(self, features, output_features):
        seq_len = features['n_frames']
        recon = losses.mse(output_features['normalised_lf0_deltas'],
                           features['normalised_lf0_deltas'], seq_len)
        kld = losses.kld_standard_normal(output_features['mean'],
                                         output_features['log_variance'])
        self.metrics.accumulate(self.mode, kld=kld[None, None, None])
        return recon + self.kld_weight * kld


class TinyStreamModel(BaseSPSS):
    """GRU lf0-delta regressor with MLPG: small streaming-capable model
    (implements the stream_inputs/stream_step/stream_output_spec hooks)."""

    def __init__(self, hidden=16, dropout_prob=0.0):
        super().__init__()
        self.layers = nn.SequentialWithRecurrent(
            nn.Linear(600 + 9, hidden),
            nn.Sigmoid(),
            nn.Dropout(dropout_prob),
            nn.Recurrent('gru', hidden, hidden),
            nn.Recurrent('lstm', hidden, hidden),
            nn.Linear(hidden, 3),
        )
        self.metrics.add_metrics('all', LF0_RMSE_Hz=metrics.LF0Distortion())

    normaliser_sources = TinyF0Model.normaliser_sources
    train_data_sources = TinyF0Model.train_data_sources

    def _inputs(self, features):
        max_n_frames = features['normalised_counters'].shape[1]
        lab_frames = utils.upsample_to_repetitions(
            features['normalised_lab'], features['dur'], max_len=max_n_frames)
        return jnp.concatenate((lab_frames, features['normalised_counters']),
                               axis=-1)

    def predict(self, features):
        import jax as _jax
        from morgana_tpu import viz
        pred = self.layers(self._inputs(features), seq_len=features['n_frames'])
        pred_deltas = self.normalisers['lf0'].denormalise(pred, deltas=True)
        global_variance = self.normalisers['lf0'].delta_params['std_dev'] ** 2
        lf0 = viz.synthesis.MLPG(
            _jax.lax.stop_gradient(pred_deltas), global_variance,
            padding_size=20, seq_len=features['n_frames'])
        return {'normalised_lf0_deltas': pred, 'lf0': lf0}

    def loss(self, features, output_features):
        return losses.mse(output_features['normalised_lf0_deltas'],
                          features['normalised_lf0_deltas'],
                          features['n_frames'])

    # streaming hooks
    def stream_inputs(self, features):
        return self._inputs(features)

    def stream_step(self, inputs_chunk, state):
        pred, state = self.layers(inputs_chunk, hiddens=state,
                                  return_hiddens=True)
        pred_deltas = self.normalisers['lf0'].denormalise(pred, deltas=True)
        return {'normalised_lf0_deltas': pred,
                'lf0_deltas': pred_deltas}, state

    def stream_output_spec(self):
        global_variance = self.normalisers['lf0'].delta_params['std_dev'] ** 2
        return {'normalised_lf0_deltas': None,
                'lf0': ('lf0_deltas', global_variance, 20)}
