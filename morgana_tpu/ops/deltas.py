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


def compute_deltas_jax(feature, windows=DEFAULT_WINDOWS):
    r"""jnp version of :func:`compute_deltas` operating on batched sequences.

    Parameters
    ----------
    feature : jnp.ndarray, shape (batch, seq_len, feat_dim)

    Returns
    -------
    jnp.ndarray, shape (batch, seq_len, feat_dim * len(windows))
    """
    feature = jnp.asarray(feature)
    num_frames = feature.shape[1]
    outs = []
    for l, u, coeffs in windows:
        padded = jnp.concatenate(
            [jnp.repeat(feature[:, :1], l, axis=1), feature, jnp.repeat(feature[:, -1:], u, axis=1)],
            axis=1)
        acc = jnp.zeros_like(feature)
        for k, c in enumerate(coeffs):
            if c != 0.0:
                acc = acc + c * padded[:, k:k + num_frames]
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)
