"""VAE prosody model: sentence-level latent prosody embedding over lf0.

The reference framework's BaseVAE use-case (BASELINE config: "BaseVAE prosody
model with sampling.py Gaussian latent sampling + KL-annealed loss"): a
recurrent encoder summarises the acoustics into a Gaussian posterior over a
sentence-level latent; the decoder reconstructs lf0 deltas from upsampled
linguistic features + the latent. The KL weight anneals linearly over
training steps (driven by the traced ``global_step`` feature the train step
injects, so annealing happens fully inside the fused jit step). At test time,
latents are explored with :mod:`morgana_tpu.sampling` sphere samplers.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from morgana_tpu.base_models import BaseVAE
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu import data
from morgana_tpu import losses
from morgana_tpu import metrics
from morgana_tpu import nn
from morgana_tpu import sampling
from morgana_tpu import utils
from morgana_tpu import viz
from morgana_tpu.data import data_sources


class VAEProsodyModel(BaseVAE):
    def __init__(self, z_dim=16, kld_weight=1., kld_anneal_steps=1000,
                 hidden_size=64, dropout_prob=0.):
        super(VAEProsodyModel, self).__init__(z_dim=z_dim, kld_weight=kld_weight)
        self.kld_anneal_steps = kld_anneal_steps

        self.encoder_rnn = nn.Recurrent('gru', 3, hidden_size)
        self.encoder_out = nn.Linear(hidden_size, 2 * z_dim)

        self.decoder = nn.SequentialWithRecurrent(
            nn.Linear(600 + 9 + z_dim, hidden_size),
            nn.Sigmoid(),
            nn.Dropout(p=dropout_prob),
            nn.Recurrent('gru', hidden_size, hidden_size),
            nn.Dropout(p=dropout_prob),
            nn.Linear(hidden_size, 3),
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

    def encode(self, features):
        n_frames = features['n_frames']
        _, h_final = self.encoder_rnn(features['normalised_lf0_deltas'], seq_len=n_frames)
        stats = self.encoder_out(h_final)
        return stats[:, :self.z_dim], stats[:, self.z_dim:]

    def decode(self, latent, features):
        max_n_frames = features['normalised_counters'].shape[1]
        lab_frames = utils.upsample_to_repetitions(
            features['normalised_lab'], features['dur'], max_len=max_n_frames)
        z = jnp.broadcast_to(latent[:, None, :],
                             lab_frames.shape[:2] + (self.z_dim,))
        inputs = jnp.concatenate(
            (lab_frames, features['normalised_counters'], z), axis=-1)

        pred_norm_lf0_deltas = self.decoder(inputs, seq_len=features['n_frames'])

        pred_lf0_deltas = self.normalisers['lf0'].denormalise(pred_norm_lf0_deltas, deltas=True)
        global_variance = self.normalisers['lf0'].delta_params['std_dev'] ** 2
        pred_lf0 = viz.synthesis.MLPG(
            jax.lax.stop_gradient(pred_lf0_deltas), global_variance,
            padding_size=100, seq_len=features['n_frames'])

        return {
            'normalised_lf0_deltas': pred_norm_lf0_deltas,
            'lf0': pred_lf0,
        }

    def kld_schedule(self, features):
        """Linear KL annealing from 0 to `kld_weight` over `kld_anneal_steps`,
        driven by the traced global step (no retrace per step)."""
        if 'global_step' in features:
            frac = jnp.minimum(features['global_step'] / self.kld_anneal_steps, 1.0)
        else:
            frac = 1.0
        return self.kld_weight * frac

    def loss(self, features, output_features):
        seq_len = features['n_frames']

        recon = losses.mse(output_features['normalised_lf0_deltas'],
                           features['normalised_lf0_deltas'], seq_len)
        kld = losses.kld_standard_normal(output_features['mean'],
                                         output_features['log_variance'])

        self.metrics.accumulate(
            self.mode,
            kld=jnp.broadcast_to(kld, (1, 1, 1)),
            LF0_RMSE_Hz=(features['lf0'], output_features['lf0'],
                         features['vuv'], seq_len))

        return recon + self.kld_schedule(features) * kld

    def analysis_for_test_batch(self, features, output_features, out_dir,
                                num_latent_samples=4, latent_radius=1.0, **kwargs):
        """Explores the prosody space: decodes latents sampled uniformly on a
        sphere around the prior mean (reference capability: sampling.py)."""
        super(VAEProsodyModel, self).analysis_for_test_batch(
            features, output_features, out_dir, **kwargs)

        sampler = sampling.UniformSphereSurfaceSampler(
            jnp.zeros(self.z_dim), latent_radius)
        sample_dir = os.path.join(out_dir, 'latent_samples')
        os.makedirs(sample_dir, exist_ok=True)

        for s in range(num_latent_samples):
            latent = sampler.rsample((len(features['name']),),
                                     key=jax.random.PRNGKey(s))
            out = self.decode(latent, features)
            viz.save_batched_seqs(
                {'lf0': out['lf0']},
                [f'{name}_sample{s}' for name in features['name']],
                sample_dir, seq_len=features['n_frames'])


def main():
    args = ExperimentBuilder.get_experiment_args()
    nn.manual_seed(args.get('seed', 1234567890))
    experiment = ExperimentBuilder(VAEProsodyModel, **args)
    experiment.run_experiment()


if __name__ == '__main__':
    main()
