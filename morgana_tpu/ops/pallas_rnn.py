"""Fused Pallas LSTM layer kernel — the persistent-RNN pattern on TPU.

The ``lax.scan`` LSTM (:mod:`morgana_tpu.ops.rnn`) relies on XLA to keep the
recurrent weights resident; this kernel makes the speed-of-light structure
explicit: the whole layer runs as ONE kernel whose sequential grid walks time
chunks while

* ``w_hh`` (H, 4H) is a constant-index block — fetched into VMEM once and
  reused for every timestep (the HBM-bandwidth term that dominates small-batch
  RNNs drops from O(T) to O(1)),
* ``h``/``c`` live in VMEM scratch that persists across grid steps,
* the time-chunked ``xg``/outputs stream through the standard Pallas pipeline
  (double-buffered DMA overlapping the MXU matmuls).

The backward pass is the same structure run in reverse (reverse-indexed grid)
over the gate activations SAVED by the forward (the cuDNN recipe): with
``i, f, g, o`` streamed from HBM, each backward step needs only the single
sequential-critical matmul ``dh_{t-1} = dgates @ w_hh^T`` — recomputing the
gates instead was measured ~25% slower on the full train step (one extra
(B, H) x (H, 4H) matmul per step, ~0.33 TFLOP/step at bench shapes, vs
~0.2 ms of extra HBM traffic to store them). The kernel emits the per-step
``dgates`` (= ``dxg``); the weight gradient
``dW_hh = sum_t h_{t-1}^T dgates_t`` then falls out as ONE large MXU matmul
over the whole sequence outside the kernel (keeping the kernel's VMEM budget
to the streamed blocks + resident ``w_hh``). Gradients w.r.t. the final
(h, c) state enter as the initial backward carries, so the VJP is exact.

Semantics: identical to the masked ``lax.scan`` path. The kernel carries
state through padded frames (valid positions are unaffected — the recurrence
is causal), outputs are masked with ``seq_len``, and the final (h, c) is
gathered from the state traces at ``seq_len - 1``, matching pack/unpack
final-state semantics exactly (values and gradients). The scan path remains
the default; this kernel is opt-in via ``nn.Recurrent(..., backend='pallas')``.

The time dimension must be divisible by the chosen chunk; the chunk is picked
as the largest divisor of T up to ``TIME_CHUNK`` (length-bucketed batches are
multiples of 16, giving full-size chunks).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['lstm_layer', 'TIME_CHUNK', 'BWD_TIME_CHUNK']

# Chunk sizes are VMEM-budget driven (v5e scoped VMEM is 16 MB): forward
# streams xg (chunk, B, 4H) double-buffered next to the resident (H, 4H)
# weights; backward streams four extra state blocks. Chunk 8/8 measured best
# on v5e at B=32 H=512 in f32 (variants within ~5%); with bf16 streamed
# blocks (store_dtype='bfloat16', halving every DMA) chunk 16 fits.
# MORGANA_PALLAS_CHUNK / MORGANA_PALLAS_STORE override both for sweeps.
import os as _os

TIME_CHUNK = int(_os.environ.get('MORGANA_PALLAS_CHUNK', 8))
BWD_TIME_CHUNK = int(_os.environ.get('MORGANA_PALLAS_BWD_CHUNK',
                                     _os.environ.get('MORGANA_PALLAS_CHUNK', 8)))
STORE_DTYPE = _os.environ.get('MORGANA_PALLAS_STORE', None)  # e.g. 'bfloat16'


def _pick_chunk(time, limit):
    for c in range(min(limit, time), 0, -1):
        if time % c == 0:
            return c
    return 1


def _gate_slices(gates, hidden):
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    return i, f, g, o


def _lstm_fwd_kernel(xg_ref, w_hh_ref, h0_ref, c0_ref, y_ref, c_all_ref,
                     g_all_ref, hn_ref, cn_ref, h_s, c_s):
    chunk = xg_ref.shape[0]
    hidden = h_s.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_s[:] = h0_ref[:].astype(jnp.float32)
        c_s[:] = c0_ref[:].astype(jnp.float32)

    def step(k, _):
        h, c = h_s[:], c_s[:]
        # With bf16 storage the matmul runs bf16 x bf16 on the MXU with f32
        # accumulation (the carried state stays f32 in scratch).
        gates = xg_ref[k].astype(jnp.float32) + jnp.dot(
            h.astype(w_hh_ref.dtype), w_hh_ref[:],
            preferred_element_type=jnp.float32)
        i, f, g, o = _gate_slices(gates, hidden)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        y_ref[k] = h_new.astype(y_ref.dtype)
        c_all_ref[k] = c_new.astype(c_all_ref.dtype)
        # Activated gates saved for the backward pass (store-don't-recompute).
        g_all_ref[k] = jnp.concatenate([i, f, g, o], axis=-1).astype(g_all_ref.dtype)
        h_s[:] = h_new
        c_s[:] = c_new
        return 0

    jax.lax.fori_loop(0, chunk, step, 0, unroll=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        hn_ref[:] = h_s[:].astype(hn_ref.dtype)
        cn_ref[:] = c_s[:].astype(cn_ref.dtype)


def _lstm_bwd_kernel(g_all_ref, w_hh_ref, c_prev_ref, c_all_ref,
                     dy_ref, dc_all_ref, dhn_ref, dcn_ref,
                     dxg_ref, dh0_ref, dc0_ref,
                     dh_s, dc_s):
    """Reverse-time chunk over the saved gate activations: one matmul/step."""
    chunk = g_all_ref.shape[0]
    hidden = dh_s.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        # Gradients w.r.t. the layer's final (h, c) enter as initial carries.
        dh_s[:] = dhn_ref[:].astype(jnp.float32)
        dc_s[:] = dcn_ref[:].astype(jnp.float32)

    def step(j, _):
        k = chunk - 1 - j
        c_prev = c_prev_ref[k].astype(jnp.float32)

        gates = g_all_ref[k].astype(jnp.float32)
        i = gates[:, :hidden]
        f = gates[:, hidden:2 * hidden]
        g = gates[:, 2 * hidden:3 * hidden]
        o = gates[:, 3 * hidden:]

        tanh_c = jnp.tanh(c_all_ref[k].astype(jnp.float32))
        dh_total = dy_ref[k].astype(jnp.float32) + dh_s[:]
        do = dh_total * tanh_c
        # dc_all carries external cotangents on the exposed cell-state trace
        # (e.g. the final-state-at-seq_len gather in lstm_layer).
        dct = dh_total * o * (1.0 - tanh_c * tanh_c) + dc_s[:] \
            + dc_all_ref[k].astype(jnp.float32)

        da_i = dct * g * i * (1.0 - i)
        da_f = dct * c_prev * f * (1.0 - f)
        da_g = dct * i * (1.0 - g * g)
        da_o = do * o * (1.0 - o)
        dgates = jnp.concatenate([da_i, da_f, da_g, da_o], axis=-1)  # (B, 4H)

        dxg_ref[k] = dgates.astype(dxg_ref.dtype)
        # dh_{t-1} = dgates @ w_hh^T without materialising the transpose.
        dh_s[:] = jax.lax.dot_general(
            dgates.astype(w_hh_ref.dtype), w_hh_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dc_s[:] = dct * f
        return 0

    jax.lax.fori_loop(0, chunk, step, 0, unroll=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        dh0_ref[:] = dh_s[:].astype(dh0_ref.dtype)
        dc0_ref[:] = dc_s[:].astype(dc0_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _lstm_layer_core(xg, w_hh, h0, c0, interpret):
    # Exposes the full cell-state trace c_all so callers can read the state
    # at any timestep (lstm_layer gathers the state at seq_len).
    y, c_all, _g_all, hn, cn = _fwd_call(xg, w_hh, h0, c0, interpret)
    return y, c_all, hn, cn


def _store_dtype(xg):
    """Storage dtype for the streamed blocks (xg, y, c/gate traces): bf16
    halves every DMA and the resident w_hh when MORGANA_PALLAS_STORE is set;
    compute and the carried state stay f32 (MXU-native mixed precision —
    same numerics class as the scan backend's compute_dtype='bfloat16')."""
    return jnp.dtype(STORE_DTYPE) if STORE_DTYPE else xg.dtype


def _fwd_call(xg, w_hh, h0, c0, interpret):
    time, batch, gates4 = xg.shape
    hidden = gates4 // 4
    chunk = _pick_chunk(time, TIME_CHUNK)
    grid = time // chunk
    store = _store_dtype(xg)

    time_block = lambda i: (i, 0, 0)
    const2 = lambda i: (0, 0)

    y, c_all, g_all, hn, cn = pl.pallas_call(
        _lstm_fwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gates4), time_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gates4), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, batch, hidden), time_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), time_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gates4), time_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((time, batch, hidden), store),
            jax.ShapeDtypeStruct((time, batch, hidden), store),
            jax.ShapeDtypeStruct((time, batch, gates4), store),
            jax.ShapeDtypeStruct((batch, hidden), xg.dtype),
            jax.ShapeDtypeStruct((batch, hidden), xg.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xg.astype(store), w_hh.astype(store), h0, c0)
    return y, c_all, g_all, hn, cn


def _core_fwd(xg, w_hh, h0, c0, interpret):
    y, c_all, g_all, hn, cn = _fwd_call(xg, w_hh, h0, c0, interpret)
    # xg is NOT a residual: the backward works entirely off the saved gate
    # activations (dxg = dgates needs no xg).
    return (y, c_all, hn, cn), (w_hh, h0, c0, y, c_all, g_all)


def _core_bwd(interpret, residuals, grads):
    w_hh, h0, c0, y, c_all, g_all = residuals
    dy, dc_all, dhn, dcn = grads

    time, batch, gates4 = g_all.shape
    hidden = gates4 // 4
    chunk = _pick_chunk(time, BWD_TIME_CHUNK)
    grid = time // chunk
    store = g_all.dtype

    # Previous-step states: h_{t-1} = y[t-1] (h0 at t=0), same for c.
    h_prev = jnp.concatenate([h0[None].astype(store), y[:-1]], axis=0)
    c_prev = jnp.concatenate([c0[None].astype(store), c_all[:-1]], axis=0)
    w_hh_s = w_hh.astype(store)

    rev = lambda i: (grid - 1 - i, 0, 0)
    const2 = lambda i: (0, 0)

    dxg, dh0, dc0 = pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gates4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gates4), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, batch, gates4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((time, batch, gates4), g_all.dtype),
            jax.ShapeDtypeStruct((batch, hidden), g_all.dtype),
            jax.ShapeDtypeStruct((batch, hidden), g_all.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(g_all, w_hh_s, c_prev, c_all, dy.astype(store), dc_all.astype(store),
      dhn, dcn)

    # dW_hh = sum_t h_{t-1}^T dgates_t: one large MXU matmul outside the
    # kernel over the flattened (T*B) dimension.
    dw_hh = jax.lax.dot_general(
        h_prev.reshape(time * batch, hidden), dxg.reshape(time * batch, gates4),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # Cotangents in the PRIMAL input dtypes (f32 callers get f32 grads even
    # when the streamed storage is bf16).
    return (dxg.astype(w_hh.dtype), dw_hh.astype(w_hh.dtype),
            dh0.astype(h0.dtype), dc0.astype(c0.dtype))


_lstm_layer_core.defvjp(_core_fwd, _core_bwd)


def _state_at_seq_len(trace, seq_len, state0):
    """Reads each row's state at position ``seq_len - 1`` from a (B, T, H)
    state trace (``state0`` for empty rows) — the pack/unpack final-state
    semantics of the reference cuDNN wrapper
    (``/root/reference/morgana/utils.py:366-393``) recovered from a
    carry-through-padding kernel. Differentiable: the gather routes the
    final-state cotangent to timestep ``seq_len - 1``.
    """
    batch, time, _ = trace.shape
    seq_len = jnp.asarray(seq_len).reshape(batch)
    idx = jnp.clip(seq_len - 1, 0, time - 1).astype(jnp.int32)
    picked = jnp.take_along_axis(trace, idx[:, None, None], axis=1)[:, 0]
    return jnp.where((seq_len > 0)[:, None], picked, state0)


def lstm_layer(x, w_ih, w_hh, b_ih, b_hh, seq_len=None, h0=None, c0=None,
               interpret=False):
    r"""Fused-Pallas single-layer LSTM over a padded batch.

    Same interface and semantics as :func:`morgana_tpu.ops.rnn.lstm`: outputs
    at padded positions are zeroed, and the returned final state is the state
    at ``seq_len`` (the kernel carries state through padded frames — harmless
    for the causal recurrence — and the true final state is gathered from the
    h/c traces at ``seq_len - 1``).
    """
    batch, time, _ = x.shape
    hidden = w_hh.shape[0]
    dtype = x.dtype

    xg = x @ w_ih + (b_ih + b_hh)               # one big MXU matmul
    xg = jnp.swapaxes(xg, 0, 1)                 # (T, B, 4H)

    h0 = jnp.zeros((batch, hidden), dtype) if h0 is None else h0
    c0 = jnp.zeros((batch, hidden), dtype) if c0 is None else c0

    y, c_all, hn, cn = _lstm_layer_core(xg, w_hh, h0, c0, interpret)
    # Back to the caller's dtype (a no-op without MORGANA_PALLAS_STORE; the
    # astype's VJP routes the bf16 cotangent back into the kernel otherwise).
    y = jnp.swapaxes(y, 0, 1).astype(dtype)     # (B, T, H)

    if seq_len is not None:
        t = jnp.arange(time, dtype=jnp.asarray(seq_len).dtype)
        mask = (t[None, :] < jnp.asarray(seq_len).reshape(batch)[:, None])
        y = y * mask[:, :, None].astype(dtype)
        # y is masked but position seq_len-1 is valid, so gathering from the
        # masked trace is exact (and shares the mask multiply's gradient).
        hn = _state_at_seq_len(y, seq_len, h0)
        cn = _state_at_seq_len(jnp.swapaxes(c_all, 0, 1).astype(dtype),
                               seq_len, c0)
    return y, (hn, cn)
