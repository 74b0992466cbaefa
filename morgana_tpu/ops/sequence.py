"""On-device variable-length sequence rearrangement kernels.

TPU-native replacements for the host-loop index builders in the reference
(``morgana/utils.py:175-330``). The reference built gather indices with
per-batch-item ``np.repeat`` loops on the host (a device->host->device round
trip on *every* training batch, ``morgana/utils.py:219-222``); here the index
arithmetic is expressed with ``cumsum`` + ``searchsorted`` + one gather so the
whole thing stays on-device and fuses under jit.
"""
import jax
import jax.numpy as jnp

__all__ = [
    'upsample_to_repetitions',
    'split_to_segments',
    'get_segment_ends',
]


def upsample_to_repetitions(sequence_feature, repeats, max_len=None):
    r"""Repeats each sequence item ``repeats`` times along the time axis.

    Functionally equivalent to per-item ``np.repeat`` (reference
    ``morgana/utils.py:175-228``): used to upsample phone-level linguistic
    features to frame level using durations.

    Parameters
    ----------
    sequence_feature : jnp.ndarray, shape (batch_size, max_seq_len, feat_dim)
    repeats : jnp.ndarray, shape (batch_size, max_seq_len, 1) or (batch_size, max_seq_len)
        Integer number of repetitions per sequence item. Padded positions must
        have ``repeats == 0``.
    max_len : int, optional
        Static output length. Required under jit; when None (eager) the
        concrete ``max(sum(repeats))`` is used, matching the reference.

    Returns
    -------
    jnp.ndarray, shape (batch_size, max_len, feat_dim)
        Out-of-sequence positions are zero-filled (the reference gathers a
        zero "padder" frame there).
    """
    sequence_feature = jnp.asarray(sequence_feature)
    batch_size, max_seq_len, _ = sequence_feature.shape

    reps = jnp.asarray(repeats).reshape(batch_size, max_seq_len)
    if not jnp.issubdtype(reps.dtype, jnp.integer):
        reps = reps.astype(jnp.int32)

    ends = jnp.cumsum(reps, axis=1)            # (B, S): frame index where item i ends
    totals = ends[:, -1]                       # (B,)

    if max_len is None:
        if isinstance(totals, jax.core.Tracer):
            raise ValueError(
                'upsample_to_repetitions requires a static `max_len` inside jit; '
                'pass e.g. max_len=frame_level_feature.shape[1].')
        max_len = int(jnp.max(totals))

    positions = jnp.arange(max_len, dtype=ends.dtype)  # (T,)
    # idx[b, t] = first i such that ends[b, i] > t  == searchsorted(ends, t, 'right')
    # 'right' side also correctly skips zero-length (repeats == 0) items.
    idx = jax.vmap(lambda e: jnp.searchsorted(e, positions, side='right'))(ends)

    valid = positions[None, :] < totals[:, None]       # (B, T)
    idx = jnp.where(valid, jnp.clip(idx, 0, max_seq_len - 1), 0)

    gathered = jnp.take_along_axis(sequence_feature, idx[:, :, None], axis=1)
    return jnp.where(valid[:, :, None], gathered, jnp.zeros((), gathered.dtype))


def split_to_segments(sequence_feature, segment_lens, max_segment_len=None):
    r"""Splits each sequence into shorter segments according to lengths.

    Reference: ``morgana/utils.py:231-284``. Useful for splitting sentence
    level features into phone- or word-level sequences.

    Parameters
    ----------
    sequence_feature : jnp.ndarray, shape (batch_size, max_seq_len, feat_dim)
    segment_lens : jnp.ndarray, shape (batch_size, max_num_segments[, 1])
    max_segment_len : int, optional
        Static segment length. Required under jit; defaults to the concrete
        ``max(segment_lens)``.

    Returns
    -------
    jnp.ndarray, shape (batch_size, max_num_segments, max_segment_len, feat_dim)
        Positions beyond each segment's length are zero-filled.
    """
    sequence_feature = jnp.asarray(sequence_feature)
    batch_size, max_seq_len, _ = sequence_feature.shape

    lens = jnp.asarray(segment_lens).reshape(batch_size, -1)
    if not jnp.issubdtype(lens.dtype, jnp.integer):
        lens = lens.astype(jnp.int32)
    max_num_segments = lens.shape[1]

    if max_segment_len is None:
        if isinstance(lens, jax.core.Tracer):
            raise ValueError('split_to_segments requires a static `max_segment_len` inside jit.')
        max_segment_len = int(jnp.max(lens))

    starts = jnp.cumsum(lens, axis=1) - lens                       # (B, N) exclusive cumsum
    k = jnp.arange(max_segment_len, dtype=lens.dtype)              # (K,)
    idx = starts[:, :, None] + k[None, None, :]                    # (B, N, K)
    valid = k[None, None, :] < lens[:, :, None]                    # (B, N, K)
    idx = jnp.where(valid, jnp.clip(idx, 0, max_seq_len - 1), 0)

    flat_idx = idx.reshape(batch_size, max_num_segments * max_segment_len)
    gathered = jnp.take_along_axis(sequence_feature, flat_idx[:, :, None], axis=1)
    gathered = gathered.reshape(batch_size, max_num_segments, max_segment_len, -1)
    return jnp.where(valid[..., None], gathered, jnp.zeros((), gathered.dtype))


def get_segment_ends(sequence_feature, segment_lens):
    r"""Gets the feature at the last position of each segment.

    Reference: ``morgana/utils.py:287-330`` ("clockwork RNN" helper): given
    segment lengths, gather the sequence state at the end of each segment.
    Fully static shapes: jit-safe with no extra arguments.

    Returns
    -------
    jnp.ndarray, shape (batch_size, max_num_segments, feat_dim)
        Zero vectors for zero-length (padding) segments.
    """
    sequence_feature = jnp.asarray(sequence_feature)
    batch_size, max_seq_len, _ = sequence_feature.shape

    lens = jnp.asarray(segment_lens).reshape(batch_size, -1)
    if not jnp.issubdtype(lens.dtype, jnp.integer):
        lens = lens.astype(jnp.int32)

    valid = lens > 0
    ends = jnp.cumsum(lens, axis=1) - 1                            # (B, N) index of last frame
    idx = jnp.where(valid, jnp.clip(ends, 0, max_seq_len - 1), 0)

    gathered = jnp.take_along_axis(sequence_feature, idx[:, :, None], axis=1)
    return jnp.where(valid[:, :, None], gathered, jnp.zeros((), gathered.dtype))
