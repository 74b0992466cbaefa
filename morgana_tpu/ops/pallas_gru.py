"""Fused Pallas GRU layer kernel — persistent-RNN pattern (see pallas_rnn.py).

Same structure as the LSTM kernel: resident ``w_hh`` block, VMEM-carried
state, sequential time-chunk grid, reverse-grid backward with gate
recomputation. GRU-specific backward notes (torch gate formulation):

    r = sig(xg_r + hg_r);  z = sig(xg_z + hg_z);  n = tanh(xg_n + r * hg_n)
    h' = (1 - z) * n + z * h

The kernel emits ``dxg = [da_r, da_z, da_n]`` (pre-activation grads of the
*input*-side gates). The hidden-side pre-activation grads differ only in the
n column (``dhg_n = da_n * r``), so ``dW_hh``/``db_hh``/the ``b_hh`` pullback
are recovered OUTSIDE the kernel from big batched matmuls (recomputing
``hg``/``r`` for the whole sequence at once on the MXU).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from morgana_tpu.ops.pallas_rnn import _pick_chunk, TIME_CHUNK, BWD_TIME_CHUNK

__all__ = ['gru_layer']


def _gru_gates(gates_x, hg, hidden):
    r = jax.nn.sigmoid(gates_x[:, :hidden] + hg[:, :hidden])
    z = jax.nn.sigmoid(gates_x[:, hidden:2 * hidden] + hg[:, hidden:2 * hidden])
    n = jnp.tanh(gates_x[:, 2 * hidden:] + r * hg[:, 2 * hidden:])
    return r, z, n


def _gru_fwd_kernel(xg_ref, w_hh_ref, b_hh_ref, h0_ref, y_ref, hn_ref, h_s):
    chunk = xg_ref.shape[0]
    hidden = h_s.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_s[:] = h0_ref[:]

    def step(k, _):
        h = h_s[:]
        hg = jnp.dot(h, w_hh_ref[:], preferred_element_type=jnp.float32) + b_hh_ref[:]
        r, z, n = _gru_gates(xg_ref[k], hg, hidden)
        h_new = (1.0 - z) * n + z * h
        y_ref[k] = h_new
        h_s[:] = h_new
        return 0

    jax.lax.fori_loop(0, chunk, step, 0, unroll=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        hn_ref[:] = h_s[:]


def _gru_bwd_kernel(xg_ref, w_hh_ref, b_hh_ref, h_prev_ref, dy_ref, dhn_ref,
                    dxg_ref, dh0_ref, dh_s):
    chunk = xg_ref.shape[0]
    hidden = dh_s.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_s[:] = dhn_ref[:]

    def step(j, _):
        k = chunk - 1 - j
        h_prev = h_prev_ref[k]
        hg = jnp.dot(h_prev, w_hh_ref[:], preferred_element_type=jnp.float32) + b_hh_ref[:]
        r, z, n = _gru_gates(xg_ref[k], hg, hidden)
        hg_n = hg[:, 2 * hidden:]

        dh = dy_ref[k] + dh_s[:]
        dn = dh * (1.0 - z)
        dz = dh * (h_prev - n)
        da_n = dn * (1.0 - n * n)
        dr = da_n * hg_n
        da_z = dz * z * (1.0 - z)
        da_r = dr * r * (1.0 - r)

        dgates = jnp.concatenate([da_r, da_z, da_n], axis=-1)
        dxg_ref[k] = dgates

        # dh_prev = dh * z + dhg @ w_hh^T with dhg = [da_r, da_z, da_n * r].
        dhg = jnp.concatenate([da_r, da_z, da_n * r], axis=-1)
        dh_s[:] = dh * z + jax.lax.dot_general(
            dhg, w_hh_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0, unroll=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        dh0_ref[:] = dh_s[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gru_layer_core(xg, w_hh, b_hh, h0, interpret):
    # b_hh arrives shaped (1, 3H) for 2-D VMEM tiling.
    y, hn = _fwd_call(xg, w_hh, b_hh, h0, interpret)
    return y, hn


def _fwd_call(xg, w_hh, b_hh, h0, interpret):
    time, batch, gates3 = xg.shape
    hidden = gates3 // 3
    chunk = _pick_chunk(time, TIME_CHUNK)
    grid = time // chunk

    time_block = lambda i: (i, 0, 0)
    const2 = lambda i: (0, 0)

    y, hn = pl.pallas_call(
        _gru_fwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gates3), time_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gates3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gates3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, batch, hidden), time_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((time, batch, hidden), xg.dtype),
            jax.ShapeDtypeStruct((batch, hidden), xg.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
    )(xg, w_hh, b_hh, h0)
    return y, hn


def _core_fwd(xg, w_hh, b_hh, h0, interpret):
    y, hn = _fwd_call(xg, w_hh, b_hh, h0, interpret)
    return (y, hn), (xg, w_hh, b_hh, h0, y)


def _core_bwd(interpret, residuals, grads):
    xg, w_hh, b_hh, h0, y = residuals
    dy, dhn = grads

    time, batch, gates3 = xg.shape
    hidden = gates3 // 3
    chunk = _pick_chunk(time, BWD_TIME_CHUNK)
    grid = time // chunk

    h_prev = jnp.concatenate([h0[None], y[:-1]], axis=0)

    rev = lambda i: (grid - 1 - i, 0, 0)
    const2 = lambda i: (0, 0)

    dxg, dh0 = pl.pallas_call(
        _gru_bwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gates3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gates3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gates3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, batch, gates3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((time, batch, gates3), xg.dtype),
            jax.ShapeDtypeStruct((batch, hidden), xg.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
    )(xg, w_hh, b_hh, h_prev, dy, dhn)

    # Hidden-side pre-activation grads: only the n column is rescaled by r.
    # Recompute hg/r for the whole sequence as large batched MXU matmuls.
    hp = h_prev.reshape(time * batch, hidden)
    hg = hp @ w_hh + b_hh.reshape(-1)
    r = jax.nn.sigmoid(xg.reshape(time * batch, gates3)[:, :hidden] + hg[:, :hidden])
    dxg_flat = dxg.reshape(time * batch, gates3)
    dhg = jnp.concatenate(
        [dxg_flat[:, :2 * hidden], dxg_flat[:, 2 * hidden:] * r], axis=-1)

    dw_hh = jax.lax.dot_general(hp, dhg, dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    db_hh = jnp.sum(dhg, axis=0, keepdims=True)  # matches (1, 3H) input shape
    return dxg, dw_hh, db_hh, dh0


_gru_layer_core.defvjp(_core_fwd, _core_bwd)


def gru_layer(x, w_ih, w_hh, b_ih, b_hh, seq_len=None, h0=None, interpret=False):
    r"""Fused-Pallas single-layer GRU over a padded batch.

    Same interface and semantics as :func:`morgana_tpu.ops.rnn.gru`: outputs
    at padded positions are zeroed and the final state is the state at
    ``seq_len`` (gathered from the output trace — for a GRU, ``y`` IS the
    hidden-state trace).
    """
    from morgana_tpu.ops.pallas_rnn import _state_at_seq_len

    batch, time, _ = x.shape
    hidden = w_hh.shape[0]
    dtype = x.dtype

    xg = x @ w_ih + b_ih                        # one big MXU matmul
    xg = jnp.swapaxes(xg, 0, 1)                 # (T, B, 3H)

    h0 = jnp.zeros((batch, hidden), dtype) if h0 is None else h0

    y, hn = _gru_layer_core(xg, w_hh, b_hh.reshape(1, -1), h0, interpret)
    y = jnp.swapaxes(y, 0, 1)

    if seq_len is not None:
        t = jnp.arange(time, dtype=jnp.asarray(seq_len).dtype)
        mask = (t[None, :] < jnp.asarray(seq_len).reshape(batch)[:, None])
        y = y * mask[:, :, None].astype(dtype)
        hn = _state_at_seq_len(y, seq_len, h0)
    return y, hn
