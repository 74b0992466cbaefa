"""Sequence-mask primitives for variable-length sequences under XLA static shapes.

TPU-native replacements for the mask helpers in the reference
(``morgana/utils.py:115-172``): everything here is jit-compatible, operates on
fixed-shape padded batches, and compiles to fused VPU element-wise code.
"""
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'sequence_mask',
    'batched_masked_select',
    'both_voiced_mask',
]


def sequence_mask(seq_len, max_len=None, dtype=jnp.float32):
    r"""Creates a sequence mask of shape ``(batch_size, max_len, 1)``.

    Mirrors the semantics of the reference ``sequence_mask``
    (``morgana/utils.py:115-144``) with a JAX-native implementation.

    Parameters
    ----------
    seq_len : jnp.ndarray, shape (batch_size,)
        Sequence lengths.
    max_len : int, optional
        Maximum sequence length. Must be provided when tracing (inside jit);
        if None the (concrete) max of ``seq_len`` is used.
    dtype : jnp.dtype
        dtype of the returned mask.

    Returns
    -------
    mask : jnp.ndarray, shape (batch_size, max_len, 1)
    """
    seq_len = jnp.asarray(seq_len)
    if seq_len.ndim == 2:  # Accept (batch, 1) shaped lengths.
        seq_len = seq_len[:, 0]

    if max_len is None:
        if isinstance(seq_len, jax.core.Tracer):
            raise ValueError(
                'sequence_mask requires a static `max_len` when used inside jit; '
                'pass max_len=features[...].shape[1].')
        max_len = int(jnp.max(seq_len))

    positions = jnp.arange(max_len, dtype=seq_len.dtype)
    mask = positions[None, :] < seq_len[:, None]
    return mask[:, :, None].astype(dtype)


def batched_masked_select(sequence_feature, seq_len):
    r"""Gets the feature vectors of all valid (in-sequence) frames in a batch.

    Equivalent to the reference ``batched_masked_select``
    (``morgana/utils.py:147-166``). The output has a data-dependent shape
    ``(sum(seq_len), feat_dim)``, so this is a **host/eager-only** operation:
    it cannot be jitted. It is used by streaming metrics
    (:class:`morgana_tpu.metrics.TensorHistory`) on the host side.
    """
    feature = np.asarray(sequence_feature)
    lens = np.asarray(seq_len).reshape(-1).astype(np.int64)

    parts = [feature[b, :lens[b]] for b in range(feature.shape[0])]
    if not parts:
        return np.zeros((0,) + feature.shape[2:], dtype=feature.dtype)
    return np.concatenate(parts, axis=0)


def both_voiced_mask(*sequence_features, dtype=jnp.float32):
    r"""Whether all the sequence features are non-zero at the same positions.

    Reference: ``morgana/utils.py:169-172``.
    """
    is_voiced = [jnp.not_equal(f, 0.) for f in sequence_features]
    out = is_voiced[0]
    for v in is_voiced[1:]:
        out = jnp.logical_and(out, v)
    return out.astype(dtype)
