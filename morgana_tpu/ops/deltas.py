"""Delta (dynamic) feature computation.

The reference consumes precomputed ``{name}_deltas`` features from
tts_data_tools (static + delta + delta-delta, hence the x3 feature dims in
``models/RNN_SPSS.py:24``) using the standard SPSS windows, which are also the
MLPG defaults (``morgana/viz/synthesis.py:122-127``)::

    static:      [1.0]
    delta:       [-0.5, 0.0, 0.5]
    delta-delta: [1.0, -2.0, 1.0]

This module provides the equivalent computation: a NumPy path for the host
data pipeline and a jnp path usable inside jit.
"""
import jax.numpy as jnp
import numpy as np

__all__ = ['DEFAULT_WINDOWS', 'compute_deltas', 'compute_deltas_jax']

# (left extent, right extent, coefficients) as in the reference MLPG windows.
DEFAULT_WINDOWS = (
    (0, 0, (1.0,)),
    (1, 1, (-0.5, 0.0, 0.5)),
    (1, 1, (1.0, -2.0, 1.0)),
)


def _apply_window_np(feature, l, u, coeffs):
    """Applies one delta window along the time axis with edge replication."""
    num_frames = feature.shape[0]
    padded = np.concatenate(
        [np.repeat(feature[:1], l, axis=0), feature, np.repeat(feature[-1:], u, axis=0)],
        axis=0)
    out = np.zeros_like(feature)
    for k, c in enumerate(coeffs):
        if c != 0.0:
            out += c * padded[k:k + num_frames]
    return out


def compute_deltas(feature, windows=DEFAULT_WINDOWS):
    r"""Computes windowed (delta) features, concatenated along the feature dim.

    Parameters
    ----------
    feature : np.ndarray, shape (seq_len, feat_dim)
        Static feature track.
    windows : sequence of (l, u, coeffs)

    Returns
    -------
    np.ndarray, shape (seq_len, feat_dim * len(windows))
        ``[static, delta, delta-delta]`` concatenated, matching the layout
        MLPG expects (``morgana/viz/synthesis.py:150``).
    """
    feature = np.asarray(feature, dtype=np.float32)
    if feature.ndim == 1:
        feature = feature[:, None]
    outs = [_apply_window_np(feature, l, u, np.asarray(c, np.float32)) for l, u, c in windows]
    return np.concatenate(outs, axis=-1)


def compute_deltas_jax(feature, windows=DEFAULT_WINDOWS, seq_len=None):
    r"""jnp version of :func:`compute_deltas` operating on batched sequences.

    Parameters
    ----------
    feature : jnp.ndarray, shape (batch, seq_len, feat_dim)
    seq_len : jnp.ndarray, shape (batch,), optional
        True per-item lengths. When given, edge replication clamps to each
        item's OWN last real frame (index ``seq_len - 1``) — matching the
        host path, which computes deltas per utterance before padding. When
        omitted, the batch's padded tail frame is replicated (only correct
        for unpadded/equal-length batches). Frames at/after ``seq_len`` are
        NOT zeroed here; mask downstream if the padding region matters.

    Returns
    -------
    jnp.ndarray, shape (batch, seq_len, feat_dim * len(windows))
    """
    feature = jnp.asarray(feature)
    num_frames = feature.shape[1]
    max_l = max(l for l, _, _ in windows)
    max_u = max(u for _, u, _ in windows)
    if seq_len is not None:
        # One gather builds the edge-replicated frame window per item:
        # position t in [-max_l, T+max_u) reads frame clip(t, 0, len-1).
        pos = jnp.arange(-max_l, num_frames + max_u)
        idx = jnp.clip(pos[None, :], 0,
                       jnp.asarray(seq_len).reshape(-1, 1) - 1)
        gathered = jnp.take_along_axis(feature, idx[:, :, None], axis=1)
    else:
        gathered = jnp.concatenate(
            [jnp.repeat(feature[:, :1], max_l, axis=1), feature,
             jnp.repeat(feature[:, -1:], max_u, axis=1)], axis=1)
    outs = []
    for l, u, coeffs in windows:
        acc = jnp.zeros_like(feature)
        for k, c in enumerate(coeffs):
            if c != 0.0:
                start = max_l - l + k
                acc = acc + c * gathered[:, start:start + num_frames]
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)
