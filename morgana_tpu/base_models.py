"""Model abstraction: BaseModel / BaseSPSS / BaseVAE.

Reference-parity surface of ``morgana/base_models.py``: a user model is a
class with ``train_data_sources`` / ``predict`` / ``loss`` (and optionally
``normaliser_sources``, analysis hooks). The model *object* keeps the
torch-like mutable support attributes (``normalisers``, ``mode``, ``metrics``,
``step``, ``tensorboard``) while its parameters are an explicit pytree
(:func:`morgana_tpu.nn.parameters`) that the experiment builder jits, donates,
shards and differentiates. The same ``predict``/``loss`` method code runs
eagerly (analysis, debugging) and traced (inside the fused train step).
"""
import os

import jax.numpy as jnp

from morgana_tpu import metrics
from morgana_tpu import nn
from morgana_tpu import checkpointing
from morgana_tpu.ops.losses import kld_standard_normal  # noqa: F401 (convenience)

__all__ = ['BaseModel', 'BaseSPSS', 'BaseVAE']


class BaseModel(nn.Module):
    r"""Abstract model with utility functions (reference
    ``morgana/base_models.py:9-271``).

    Attributes
    ----------
    normalisers : dict[str, morgana_tpu.data._FeatureNormaliser]
        Set by the experiment builder from :func:`normaliser_sources`.
    mode : {'', 'train', 'valid', 'test'}
    metrics : morgana_tpu.metrics.Handler
    step : int
        Global step maintained by the experiment builder.
    tensorboard : tensorboardX.SummaryWriter or None
    """

    def __init__(self):
        self.normalisers = {}
        self.mode = ''
        self.metrics = metrics.Handler(loss=metrics.Mean())
        self.step = 0
        self.tensorboard = None

    # Support attributes must not be traversed as parameters/submodules.
    _SUPPORT_ATTRS = ('normalisers', 'metrics', 'tensorboard')

    def _children(self):
        for name, value in vars(self).items():
            if name in self._SUPPORT_ATTRS:
                continue
            yield name, value

    def finalise_init(self):
        r"""Called at the end of ExperimentBuilder.__init__ (normalisers are
        available here)."""
        pass

    def normaliser_sources(self):
        r"""Specifies the normalisers used by the datasets."""
        return {}

    def train_data_sources(self):
        r"""Specifies the data loaded for training (dict of _DataSource)."""
        raise NotImplementedError

    def valid_data_sources(self):
        return self.train_data_sources()

    def test_data_sources(self):
        return self.valid_data_sources()

    def forward(self, features):
        r"""Computation including loss. Returns ``(loss, output_features)``."""
        raise NotImplementedError('Forward computation must be implemented in a subclass.')

    def predict(self, features):
        r"""Computation graph. Returns output features."""
        raise NotImplementedError('Prediction must be implemented in a subclass.')

    def loss(self, features, output_features):
        r"""Loss used to train the model. Wrap frame-level losses with
        ``morgana_tpu.losses.sequence_loss`` to mask padding."""
        raise NotImplementedError('Loss must be implemented in a subclass.')

    # -- checkpointing -------------------------------------------------------

    def save_parameters(self, experiment_dir, epoch):
        r"""Saves the parameter state dict to
        ``{experiment_dir}/checkpoints/epoch_{epoch}.npz``
        (same layout contract as ``morgana/base_models.py:142-154``)."""
        path = os.path.join(experiment_dir, 'checkpoints', f'epoch_{epoch}.npz')
        checkpointing.save_state_dict(nn.state_dict(self), path)
        return path

    def load_parameters(self, checkpoint_path, strict=True, device=None):
        r"""Loads a state dict saved by :func:`save_parameters`."""
        sd = checkpointing.load_state_dict(checkpoint_path)
        nn.load_state_dict(self, sd, strict=strict)
        return sd

    # -- analysis hooks (fall-through defaults test -> valid -> train) --------

    def analysis_for_train_batch(self, features, output_features, out_dir, **kwargs):
        pass

    def analysis_for_valid_batch(self, features, output_features, out_dir, **kwargs):
        self.analysis_for_train_batch(features, output_features, out_dir, **kwargs)

    def analysis_for_test_batch(self, features, output_features, out_dir, **kwargs):
        self.analysis_for_valid_batch(features, output_features, out_dir, **kwargs)

    def analysis_for_train_epoch(self, out_dir, **kwargs):
        pass

    def analysis_for_valid_epoch(self, out_dir, **kwargs):
        self.analysis_for_train_epoch(out_dir, **kwargs)

    def analysis_for_test_epoch(self, out_dir, **kwargs):
        self.analysis_for_valid_epoch(out_dir, **kwargs)


class BaseSPSS(BaseModel):
    r"""Abstract SPSS acoustic model: ``forward = loss(features, predict(features))``
    (reference ``morgana/base_models.py:274-285``)."""

    def forward(self, features):
        output_features = self.predict(features)
        loss = self.loss(features, output_features)
        return loss, output_features

    # ------------------------------------------------------- streaming hooks
    #
    # Optional contract for chunked streaming inference (beyond the
    # reference, which only generates whole utterances): implement all three
    # and the model becomes drivable by morgana_tpu.serve.StreamingSession —
    # constant time-to-first-frame regardless of utterance length, with ONE
    # compiled fixed-chunk-shape program reused for every chunk.

    def stream_inputs(self, features):
        """Returns the frame-rate network inputs (batch, max_frames, D_in)
        for a collated batch — predict()'s input-preparation stage
        (e.g. duration-upsampled labels + counters), separated out so the
        network itself can then run chunk by chunk."""
        raise NotImplementedError(
            f'{type(self).__name__} does not implement streaming '
            '(stream_inputs/stream_step/stream_output_spec).')

    def stream_step(self, inputs_chunk, state):
        """Runs the network on one (batch, chunk, D_in) slice of
        :meth:`stream_inputs`' output. ``state`` is ``None`` for the first
        chunk, thereafter whatever this method returned. Returns
        ``(outputs_dict, new_state)``; arrays in ``outputs_dict`` are
        (batch, chunk, D). Must be jit-compatible: the serving loop compiles
        it once for the fixed chunk shape."""
        raise NotImplementedError(
            f'{type(self).__name__} does not implement streaming '
            '(stream_inputs/stream_step/stream_output_spec).')

    def stream_output_spec(self):
        """Declares what the stream emits, as
        ``{emitted_name: None | (means_key, variances, padding_size)}``:
        ``None`` passes ``outputs_dict[emitted_name]`` through unchanged;
        a tuple routes ``outputs_dict[means_key]`` through a
        :class:`morgana_tpu.streaming.StreamingMLPG` with the given global
        variances and edge burn-in, emitting the smoothed trajectory as
        ``emitted_name`` (match predict()'s MLPG settings for
        streamed == batch consistency)."""
        raise NotImplementedError(
            f'{type(self).__name__} does not implement streaming '
            '(stream_inputs/stream_step/stream_output_spec).')


class BaseVAE(BaseSPSS):
    r"""Abstract VAE whose decoder is an SPSS model
    (reference ``morgana/base_models.py:288-380``).

    Parameters
    ----------
    z_dim : int
        Latent dimensionality.
    kld_weight : float
        Weight of the KL divergence term (posterior-collapse mitigation).
    """

    def __init__(self, z_dim=16, kld_weight=1.):
        super().__init__()
        self.z_dim = z_dim
        self.kld_weight = kld_weight
        self.metrics.add_metrics('all', kld=metrics.Mean())

    def encode(self, features):
        r"""Returns ``(mean, log_variance)``, each (batch, z_dim)."""
        raise NotImplementedError('Encoder must be implemented in a subclass.')

    def sample(self, mean, log_variance):
        r"""One reparameterised sample from the approximate posterior."""
        import jax
        std_dev = jnp.exp(log_variance * 0.5)
        noise = jax.random.normal(nn.next_rng(), mean.shape, mean.dtype)
        return mean + std_dev * noise

    def decode(self, latent, features):
        r"""Returns reconstruction output features."""
        raise NotImplementedError('Decoder must be implemented in a subclass.')

    def forward(self, features):
        mean, log_variance = self.encode(features)
        latent_sample = self.sample(mean, log_variance)
        output_features = self.decode(latent_sample, features)

        output_features['latent'] = latent_sample
        output_features['mean'] = mean
        output_features['log_variance'] = log_variance

        loss = self.loss(features, output_features)
        return loss, output_features

    def predict(self, features):
        r"""Decodes with the provided latent, or the zero vector
        (``morgana/base_models.py:368-380``)."""
        if 'latent' in features:
            latent = features['latent']
        else:
            feature = next(iter(
                v for v in features.values() if hasattr(v, 'shape') and getattr(v, 'ndim', 0) >= 1))
            batch_size = feature.shape[0]
            latent = jnp.zeros((batch_size, self.z_dim))
        return self.decode(latent, features)
