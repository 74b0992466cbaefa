"""Maximum-likelihood parameter generation (MLPG) as a batched on-device solve.

The reference (``morgana/viz/synthesis.py``) runs MLPG on the host through the
bandmat Cython library with a *Python double loop* over batch items and
feature dims (``morgana/viz/synthesis.py:154-171``) — and RNN_SPSS calls it
inside ``predict`` on every training batch (``models/RNN_SPSS.py:90-92``),
forcing a device->host->device round trip per step.

Here the whole computation is JAX: the Gaussian product-of-experts natural
parameters (b, P) are built with a handful of shift-and-add vector ops, and
the banded symmetric positive-definite system ``P x = b`` is solved with a
banded Cholesky factorisation expressed as ``lax.scan`` over frames,
``vmap``-ed over batch x feature dims. With the default static/delta/delta2
windows the bandwidth is 2, so each scan step is a few fused VPU ops over
(batch*feat_dim) lanes. Everything is jit-safe and differentiable (though the
framework wraps it in ``stop_gradient`` inside train steps, matching the
reference's ``.detach()``).
"""
import functools
import os

import jax
import jax.numpy as jnp

from morgana_tpu.ops.deltas import DEFAULT_WINDOWS

__all__ = ['mlpg', 'DEFAULT_WINDOWS']

# Scan-body unroll knob for the three per-frame solves (numerics unchanged).
# Unlike nn.Recurrent's unroll (a ~3x win), A/B on TPU measured this neutral
# to slightly negative at default shapes — the wide vmapped lanes already
# amortise per-iteration overhead — so the default stays 1; env-overridable
# for site tuning (MORGANA_MLPG_UNROLL).
_SCAN_UNROLL = int(os.environ.get('MORGANA_MLPG_UNROLL', '1'))


def _build_banded_poe(b_frames, tau_frames, windows, bandwidth):
    """Builds the banded PoE natural parameters.

    Parameters
    ----------
    b_frames : (T, W) mean/variance per window.
    tau_frames : (T, W) 1/variance per window.

    Returns
    -------
    b : (T,) b-value vector.
    p_band : (T, bandwidth+1) upper-banded precision, ``p_band[i, m] = P[i, i+m]``
        (entries beyond the matrix edge are zero).
    """
    num_frames = b_frames.shape[0]

    def shifted(x, s):
        """x shifted so that out[i] = x[i + s], zero padded."""
        if s == 0:
            return x
        if s > 0:
            return jnp.concatenate([x[s:], jnp.zeros((s,), x.dtype)])
        return jnp.concatenate([jnp.zeros((-s,), x.dtype), x[:s]])

    b = jnp.zeros((num_frames,), b_frames.dtype)
    p_band = [jnp.zeros((num_frames,), b_frames.dtype) for _ in range(bandwidth + 1)]

    for w, (l, u, coeffs) in enumerate(windows):
        width = l + u + 1
        # b[i] = sum_a c[a] * b_frames[i + l - a, w]
        for a in range(width):
            c = float(coeffs[a])
            if c == 0.0:
                continue
            b = b + c * shifted(b_frames[:, w], l - a)
        # P[i, i+m] += c[a] c[a+m] tau[i + l - a, w]
        for m in range(bandwidth + 1):
            for a in range(width - m):
                c2 = float(coeffs[a]) * float(coeffs[a + m])
                if c2 == 0.0:
                    continue
                p_band[m] = p_band[m] + c2 * shifted(tau_frames[:, w], l - a)

    # Zero the band entries that fall outside the matrix: P[i, i+m] for i+m >= T.
    idx = jnp.arange(num_frames)
    for m in range(1, bandwidth + 1):
        p_band[m] = jnp.where(idx + m < num_frames, p_band[m], 0.)

    return b, jnp.stack(p_band, axis=-1)


def _banded_cholesky_solve(b, p_band, bandwidth):
    """Solves ``P x = b`` for SPD banded ``P`` via Cholesky ``P = L L^T``.

    Three scans over frames: factorise, forward substitution, back
    substitution. All static-shaped, differentiable, vmappable.
    """
    num_frames = b.shape[0]
    bw = bandwidth
    dtype = b.dtype

    if bw == 0:
        # Diagonal system: pure elementwise solve.
        return b / p_band[:, 0]

    # Row-form access: row i needs P[i, i-p] = p_band[i-p, p] for p = bw..1 and
    # the diagonal p_band[i, 0]. Precompute those shifts outside the scan.
    row_p = [p_band[:, 0]]  # diagonal first
    for p in range(1, bw + 1):
        shiftedcol = jnp.concatenate([jnp.zeros((p,), dtype), p_band[:-p, p]])
        row_p.append(shiftedcol)  # row_p[p][i] = P[i, i-p]
    row_p = jnp.stack(row_p, axis=-1)  # (T, bw+1): [diag, p=1, ..., p=bw]

    # --- Cholesky factorisation ---------------------------------------------
    # carry: the previous `bw` rows of L, each stored as r[q] = L[j, j-bw+q]
    # (q = bw is the diagonal). Rows "before" frame 0 are identity rows.
    init_row = jnp.zeros((bw + 1,), dtype).at[bw].set(1.0)
    init_prev = jnp.broadcast_to(init_row, (bw, bw + 1))

    def chol_body(prev, p_row):
        # prev[k] is row i-1-k (k=0 -> row i-1, ..., k=bw-1 -> row i-bw).
        r = [None] * (bw + 1)
        # Off-diagonals, farthest first: L[i, i-p], p = bw..1 at q = bw-p.
        for p in range(bw, 0, -1):
            q = bw - p
            s = p_row[p]  # P[i, i-p]
            # Subtract sum over k = i-bw+q' for q' in [0, bw-p-1]; within
            # row j = i-p's stored band, k sits at index q' + p.
            for qp in range(0, bw - p):
                rj = prev[p - 1]                      # row i-p
                s = s - r[qp] * rj[qp + p]
            diag_j = prev[p - 1][bw]                  # L[i-p, i-p]
            r[q] = s / diag_j
        # Diagonal.
        s = p_row[0]
        for q in range(bw):
            s = s - r[q] * r[q]
        r[bw] = jnp.sqrt(jnp.maximum(s, 1e-20))
        row = jnp.stack(r)
        new_prev = jnp.concatenate([row[None], prev[:-1]], axis=0)
        return new_prev, row

    _, l_rows = jax.lax.scan(chol_body, init_prev, row_p,
                             unroll=_SCAN_UNROLL)  # (T, bw+1)

    # --- Forward substitution: L y = b ---------------------------------------
    def fwd_body(prev_y, inp):
        l_row, b_i = inp
        s = b_i
        for p in range(1, bw + 1):
            s = s - l_row[bw - p] * prev_y[p - 1]     # L[i, i-p] * y[i-p]
        y_i = s / l_row[bw]
        new_prev = jnp.concatenate([y_i[None], prev_y[:-1]])
        return new_prev, y_i

    _, y = jax.lax.scan(fwd_body, jnp.zeros((bw,), dtype), (l_rows, b),
                        unroll=_SCAN_UNROLL)

    # --- Back substitution: L^T x = y ----------------------------------------
    # x[i] = (y[i] - sum_p L[i+p, i] x[i+p]) / L[i, i];  L[i+p, i] = l_rows[i+p, bw-p]
    # (bw >= 1 here: the bw == 0 diagonal system returned early above.)
    fut = [jnp.concatenate([l_rows[p:, bw - p], jnp.zeros((p,), dtype)])
           for p in range(1, bw + 1)]
    fut = jnp.stack(fut, axis=-1)

    def back_body(next_x, inp):
        l_diag, fut_i, y_i = inp
        s = y_i
        for p in range(1, bw + 1):
            s = s - fut_i[p - 1] * next_x[p - 1]
        x_i = s / l_diag
        new_next = jnp.concatenate([x_i[None], next_x[:-1]])
        return new_next, x_i

    _, x = jax.lax.scan(back_body, jnp.zeros((bw,), dtype),
                        (l_rows[:, bw], fut, y), reverse=True,
                        unroll=_SCAN_UNROLL)
    return x


def _solve_single(means_tw, taus_tw, windows, bandwidth, valid_len=None):
    """means/taus of shape (T, W) for one (batch, feat) lane -> trajectory (T,).

    ``valid_len`` (scalar) bounds the item's solve domain inside the fixed
    buffer: trajectory rows >= valid_len become decoupled identity rows
    (P[i,i]=1, off-band 0, b=0), and band entries crossing the boundary are
    zeroed, so rows < valid_len solve EXACTLY the reference's
    crop-to-length system — without it, the edge-replicated experts beyond
    the boundary would keep full precision and drag the last ~bandwidth
    valid frames away from the reference solution.
    """
    b, p_band = _build_banded_poe(means_tw * taus_tw, taus_tw, windows, bandwidth)
    if valid_len is not None:
        i = jnp.arange(b.shape[0])
        inside = i < valid_len
        b = jnp.where(inside, b, 0.)
        bands = [jnp.where(inside, p_band[:, 0], 1.)]
        for m in range(1, bandwidth + 1):
            bands.append(jnp.where(i + m < valid_len, p_band[:, m], 0.))
        p_band = jnp.stack(bands, axis=-1)
    return _banded_cholesky_solve(b, p_band, bandwidth)


@functools.partial(jax.jit, static_argnames=('windows', 'padding_size'))
def mlpg(means, variances, windows=DEFAULT_WINDOWS, padding_size=0, seq_len=None):
    r"""Batched maximum-likelihood parameter generation, fully on device.

    Parameters
    ----------
    means : jnp.ndarray, shape (batch, time, num_windows * feat_dim)
        Window-ordered means ``[static | delta | delta-delta]`` per feature.
    variances : jnp.ndarray, broadcastable to ``means``:
        shape (batch, time, W*D), (time, W*D) or (W*D,) (global variance).
    windows : tuple of (l, u, coeffs) tuples — must be hashable (static).
    padding_size : int
        Edge "burn-in" padding, replicating the first/last valid frame
        (matching the reference's ``_pad``, ``morgana/viz/synthesis.py:114-120``).
    seq_len : jnp.ndarray (batch,), optional
        Valid lengths; out-of-sequence output frames are zeroed. Edge padding
        replicates the frame at ``seq_len - 1``, as in the reference's crop.

    Returns
    -------
    jnp.ndarray, shape (batch, time, feat_dim)
    """
    means = jnp.asarray(means)
    if means.ndim == 2:
        means = means[None]
    batch, num_frames, total_dim = means.shape
    num_windows = len(windows)
    feat_dim = total_dim // num_windows

    variances = jnp.asarray(variances)
    variances = jnp.broadcast_to(variances, means.shape)

    if seq_len is None:
        seq_len = jnp.full((batch,), num_frames, dtype=jnp.int32)
    else:
        seq_len = jnp.asarray(seq_len).reshape(batch).astype(jnp.int32)

    bandwidth = max(l + u for l, u, _ in windows)
    pad = int(padding_size)

    # Edge-replicated gather: positions -pad .. T+pad-1, clamped into
    # [0, seq_len-1]. Identical to the reference's crop-to-seq_len + edge pad
    # for all frames < seq_len.
    pos = jnp.arange(-pad, num_frames + pad)
    idx = jnp.clip(pos[None, :], 0, (seq_len - 1)[:, None])      # (B, T+2p)
    means_p = jnp.take_along_axis(means, idx[:, :, None], axis=1)
    vars_p = jnp.take_along_axis(variances, idx[:, :, None], axis=1)

    # (B, T', W, D) -> (B, D, T', W) -> (B*D, T', W)
    tp = num_frames + 2 * pad

    def to_lanes(x):
        x = x.reshape(batch, tp, num_windows, feat_dim)
        x = jnp.transpose(x, (0, 3, 1, 2))
        return x.reshape(batch * feat_dim, tp, num_windows)

    means_l = to_lanes(means_p)
    taus_l = 1.0 / to_lanes(vars_p)

    # Per-item solve boundary in buffer coordinates: seq_len real frames plus
    # pad replicas on each side. Experts at positions beyond it must carry NO
    # precision (the clamped gather otherwise replicates frame seq_len-1 with
    # full precision into every remaining buffer slot, over-constraining the
    # sequence tail).
    valid = jnp.repeat(seq_len + 2 * pad, feat_dim)              # (B*D,)
    pos_t = jnp.arange(tp)
    taus_l = jnp.where(pos_t[None, :, None] < valid[:, None, None], taus_l, 0.)

    solve = jax.vmap(
        lambda m, t, v: _solve_single(m, t, windows, bandwidth, v))
    traj = solve(means_l, taus_l, valid)                         # (B*D, T')
    traj = traj.reshape(batch, feat_dim, tp)[:, :, pad:pad + num_frames]
    traj = jnp.transpose(traj, (0, 2, 1))                        # (B, T, D)

    mask = (jnp.arange(num_frames)[None, :] < seq_len[:, None])[:, :, None]
    return jnp.where(mask, traj, 0.).astype(means.dtype)
