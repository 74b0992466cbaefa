"""Masked sequence losses.

JAX re-implementation of the reference loss math (``morgana/losses.py``):
element-wise loss -> per-sequence mean over valid frames (masked) -> mean over
batch and feature dims. Everything here is jit-safe and fuses into the train
step; there are no host syncs.
"""
import functools

import jax.numpy as jnp

from morgana_tpu.ops.masking import sequence_mask

__all__ = ['sequence_loss', 'mse', 'bce', 'ce', 'kld_standard_normal', 'KLD_standard_normal']

_EPS = 1e-12


def sequence_loss(loss_fn):
    r"""Sequence-loss wrapper adding an optional ``seq_len`` masking argument.

    Matches the semantics of the reference decorator
    (``morgana/losses.py:9-46``): the wrapped ``loss_fn(predictions, targets)``
    must return an element-wise loss of shape ``(batch, seq_len, feat_dim)``;
    the wrapper averages over valid frames per sequence, then over batch and
    feature dims.
    """
    @functools.wraps(loss_fn)
    def wrapped_loss(predictions, targets, seq_len=None):
        feature_loss = loss_fn(predictions, targets)

        if seq_len is None:
            max_num_frames = feature_loss.shape[1]
            feature_loss = jnp.sum(feature_loss, axis=1) / max_num_frames
        else:
            mask = sequence_mask(seq_len, max_len=feature_loss.shape[1], dtype=feature_loss.dtype)
            num_valid_frames = jnp.sum(mask, axis=1)
            feature_loss = jnp.sum(feature_loss * mask, axis=1) / jnp.maximum(num_valid_frames, 1.)

        return jnp.mean(feature_loss)

    return wrapped_loss


@sequence_loss
def mse(predictions, targets):
    r"""Masked mean-squared error (reference ``morgana/losses.py:49-51``)."""
    return jnp.square(predictions - targets)


@sequence_loss
def bce(predictions, targets):
    r"""Masked binary cross-entropy on probabilities (reference ``morgana/losses.py:54-56``).

    Like ``torch.nn.functional.binary_cross_entropy``, log terms are clamped
    at -100 for numerical safety.
    """
    log_p = jnp.maximum(jnp.log(jnp.maximum(predictions, _EPS)), -100.0)
    log_1mp = jnp.maximum(jnp.log(jnp.maximum(1.0 - predictions, _EPS)), -100.0)
    return -(targets * log_p + (1.0 - targets) * log_1mp)


@sequence_loss
def ce(predictions, targets):
    r"""Masked categorical cross-entropy on logits (reference ``morgana/losses.py:59-61``).

    ``predictions``: logits of shape (batch, seq_len, num_classes);
    ``targets``: integer class ids of shape (batch, seq_len).
    """
    targets = jnp.asarray(targets)
    if targets.ndim == predictions.ndim:  # Allow a trailing singleton dim.
        targets = targets[..., 0]
    log_probs = predictions - jax_logsumexp(predictions)
    nll = -jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32), axis=-1)
    return nll  # (batch, seq_len, 1)


def jax_logsumexp(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))


def kld_standard_normal(mean, log_variance):
    r"""KL divergence of N(mean, exp(log_variance)) from N(0, 1).

    Reference: ``morgana/losses.py:64-67``. Sums over the latent dim and
    averages over the batch.
    """
    kld = -0.5 * jnp.sum(1. + log_variance - jnp.square(mean) - jnp.exp(log_variance), axis=-1)
    return jnp.mean(kld)


# Reference-compatible alias (``morgana.losses.KLD_standard_normal``).
KLD_standard_normal = kld_standard_normal
