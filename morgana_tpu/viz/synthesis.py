"""MLPG public API (reference-parity surface of ``morgana/viz/synthesis.py``).

Two backends:

* ``'jax'`` (default): the batched on-device banded Cholesky kernel in
  :mod:`morgana_tpu.ops.mlpg` — float32, jit-compatible, vectorised over
  batch x feature dims. Validated to ~1e-6 against the float64 exact solve.
* ``'numpy'``: an exact float64 banded solve on the host (scipy
  ``solveh_banded``), matching the reference's bandmat path bit-for-bit in
  semantics; used for golden tests. ``MLPG(backend='numpy')`` returns
  float32 like the jax backend (same public contract); call
  :func:`mlpg_numpy` directly when float64 output is required.
"""
import numpy as np
import jax.numpy as jnp
from scipy.linalg import solveh_banded

from morgana_tpu.ops.mlpg import mlpg as _mlpg_jax
from morgana_tpu.ops.deltas import DEFAULT_WINDOWS

__all__ = ['MLPG', 'mlpg_numpy', 'DEFAULT_WINDOWS']


def _canonical_windows(windows):
    if windows is None:
        return DEFAULT_WINDOWS
    return tuple((int(l), int(u), tuple(float(c) for c in np.asarray(coeffs).reshape(-1)))
                 for l, u, coeffs in windows)


def MLPG(means, variances, windows=None, padding_size=0, seq_len=None, backend='jax'):
    r"""Maximum-likelihood parameter generation.

    Same signature/behaviour as the reference ``MLPG``
    (``morgana/viz/synthesis.py:79-180``): accepts single sequences
    ``(seq_len, W*D)`` or batches ``(batch, seq_len, W*D)``; ``variances`` may
    be per-frame or a global variance vector ``(W*D,)``; ``padding_size``
    replicates edge frames as burn-in; ``seq_len`` masks padded frames.

    Returns the most probable trajectory, shape ``(batch, seq_len, D)`` (or
    unbatched if the input was unbatched), same array flavour as the input
    (jnp in, jnp out; np in, np out).
    """
    windows = _canonical_windows(windows)

    if backend not in ('jax', 'numpy'):
        raise ValueError(f"backend must be 'jax' or 'numpy', got {backend!r}")

    is_jax_in = isinstance(means, jnp.ndarray) and not isinstance(means, np.ndarray)
    using_batches = np.ndim(means) == 3

    if backend == 'numpy':
        out = mlpg_numpy(np.asarray(means), np.asarray(variances), windows,
                         padding_size=padding_size,
                         seq_len=None if seq_len is None
                         else np.atleast_1d(np.asarray(seq_len)))
        out = out.astype(np.float32)
        if not using_batches:
            out = out[0]
        return jnp.asarray(out) if is_jax_in else out

    means_j = jnp.asarray(means)
    if means_j.ndim == 2:
        means_j = means_j[None]
    out = _mlpg_jax(means_j, jnp.asarray(variances), windows,
                        int(padding_size), None if seq_len is None else jnp.asarray(seq_len))
    if not using_batches:
        out = out[0]
    return out if is_jax_in else np.asarray(out)


def MLPG_streams(streams, windows=None, padding_size=0, seq_len=None):
    r"""Runs MLPG for several feature streams in ONE batched solve.

    ``streams`` maps name -> (means, variances) with means shaped
    (batch, time, W * D_name). All streams share windows/padding/seq_len, so
    their per-lane solves concatenate along the feature dim — one kernel
    launch and one set of scans instead of one per stream (the acoustic model
    runs lf0+mcep+bap per training step).

    Returns {name: trajectory (batch, time, D_name)}.
    """
    if not streams:
        return {}
    windows = _canonical_windows(windows)
    num_windows = len(windows)
    names = list(streams.keys())

    means_parts, var_parts, dims = [], [], []
    batch, time = None, None
    for name in names:
        means, variances = streams[name]
        means = jnp.asarray(means)
        batch, time = means.shape[0], means.shape[1]
        d = means.shape[-1] // num_windows
        dims.append(d)
        means_parts.append(means.reshape(batch, time, num_windows, d))
        var_parts.append(jnp.broadcast_to(jnp.asarray(variances), means.shape)
                         .reshape(batch, time, num_windows, d))

    means_all = jnp.concatenate(means_parts, axis=-1).reshape(batch, time, -1)
    vars_all = jnp.concatenate(var_parts, axis=-1).reshape(batch, time, -1)

    traj = _mlpg_jax(means_all, vars_all, windows, int(padding_size),
                     None if seq_len is None else jnp.asarray(seq_len))

    out, start = {}, 0
    for name, d in zip(names, dims):
        out[name] = traj[:, :, start:start + d]
        start += d
    return out


def _window_matrix(l, u, coeffs, num_frames):
    w = np.zeros((num_frames, num_frames))
    for t in range(num_frames):
        for k in range(l + u + 1):
            j = t - l + k
            if 0 <= j < num_frames:
                w[t, j] = coeffs[k]
    return w


def mlpg_numpy(means, variances, windows=DEFAULT_WINDOWS, padding_size=0, seq_len=None):
    r"""Exact float64 host MLPG: the banded Gaussian product-of-experts
    natural parameters (built with shift-and-add vector ops, never dense) are
    solved with scipy's banded Cholesky (``solveh_banded``) — the same
    banded-efficiency class as the reference's bandmat computation
    (``morgana/viz/synthesis.py:39-171``)."""
    means = np.asarray(means, np.float64)
    if means.ndim == 2:
        means = means[None]
    batch, num_frames, total_dim = means.shape
    num_windows = len(windows)
    feat_dim = total_dim // num_windows

    variances = np.broadcast_to(np.asarray(variances, np.float64), means.shape)
    if seq_len is None:
        seq_len = [num_frames] * batch
    else:
        # Accept a scalar/0-d seq_len the same way the jax backend does.
        seq_len = np.atleast_1d(np.asarray(seq_len))
    bandwidth = max(l + u for l, u, _ in windows)

    def pad(x, n):
        if n == 0:
            return x
        return np.concatenate([np.repeat(x[:1], n, 0), x, np.repeat(x[-1:], n, 0)], 0)

    def shifted(x, s):
        """out[t] = x[t + s], zero padded (t outside the matrix contributes 0)."""
        if s == 0:
            return x
        out = np.zeros_like(x)
        if s > 0:
            out[:-s] = x[s:]
        else:
            out[-s:] = x[:s]
        return out

    out = np.zeros((batch, num_frames, feat_dim))
    for i in range(batch):
        n = int(seq_len[i])
        tn = n + 2 * padding_size
        m_i = pad(means[i, :n], padding_size).reshape(tn, num_windows, feat_dim)
        v_i = pad(variances[i, :n], padding_size).reshape(tn, num_windows, feat_dim)

        tau = 1.0 / v_i                               # (tn, W, D)
        b_fr = m_i * tau

        b = np.zeros((tn, feat_dim))
        band = np.zeros((bandwidth + 1, tn, feat_dim))
        for w, (l, u, coeffs) in enumerate(windows):
            width = l + u + 1
            for a in range(width):
                ca = float(coeffs[a])
                if ca:
                    b += ca * shifted(b_fr[:, w], l - a)
            for mo in range(bandwidth + 1):
                for a in range(width - mo):
                    c2 = float(coeffs[a]) * float(coeffs[a + mo])
                    if c2:
                        band[mo] += c2 * shifted(tau[:, w], l - a)

        for d in range(feat_dim):
            # Upper banded storage: ab[bw - mo, j] = P[j - mo, j].
            ab = np.zeros((bandwidth + 1, tn))
            for mo in range(bandwidth + 1):
                ab[bandwidth - mo, mo:] = band[mo, :tn - mo, d]
            x = solveh_banded(ab, b[:, d])
            out[i, :n, d] = x[padding_size:padding_size + n]
    return out


def _mlpg_dense(means, variances, windows=DEFAULT_WINDOWS, padding_size=0, seq_len=None):
    r"""Dense-matrix MLPG built literally from window matrices — slow, used
    only as an independent correctness oracle in tests."""
    means = np.asarray(means, np.float64)
    if means.ndim == 2:
        means = means[None]
    batch, num_frames, total_dim = means.shape
    num_windows = len(windows)
    feat_dim = total_dim // num_windows
    variances = np.broadcast_to(np.asarray(variances, np.float64), means.shape)
    if seq_len is None:
        seq_len = [num_frames] * batch
    else:
        seq_len = np.atleast_1d(np.asarray(seq_len))

    def pad(x, n):
        if n == 0:
            return x
        return np.concatenate([np.repeat(x[:1], n, 0), x, np.repeat(x[-1:], n, 0)], 0)

    out = np.zeros((batch, num_frames, feat_dim))
    for i in range(batch):
        n = int(seq_len[i])
        m_i = pad(means[i, :n], padding_size)
        v_i = pad(variances[i, :n], padding_size)
        tn = n + 2 * padding_size
        win_mats = [_window_matrix(l, u, c, tn) for l, u, c in windows]
        for d in range(feat_dim):
            idx = np.arange(num_windows) * feat_dim + d
            mu, var = m_i[:, idx], v_i[:, idx]
            b = np.zeros(tn)
            prec = np.zeros((tn, tn))
            for w, wm in enumerate(win_mats):
                b += wm.T @ (mu[:, w] / var[:, w])
                prec += wm.T @ np.diag(1.0 / var[:, w]) @ wm
            x = np.linalg.solve(prec, b)
            out[i, :n, d] = x[padding_size:padding_size + n]
    return out
