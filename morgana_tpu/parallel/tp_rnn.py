"""Explicit tensor-parallel LSTM/GRU — the Megatron-style recurrence.

The GSPMD TP path (``mesh.param_shardings`` over the flat ``(in, G*H)``
torch-layout weights) is correct but leaves the gate split (``jnp.split`` on
a 'model'-sharded ``G*H`` axis) to the compiler: a contiguous partition of
the concatenated-gates axis puts *whole gates* on single devices, so GSPMD
must reshard around every gate nonlinearity. This module is the
*hand-placed-collective* formulation with the layout designed so that **no
resharding exists to insert**:

* Weights are stored **gate-major**: ``(in, G, H)`` instead of torch's
  ``(in, G*H)``. Sharding the last axis over ``'model'`` then gives every
  device a ``(in, G, H/m)`` block — *all G gates for its own H/m hidden
  units* — which is exactly the slice needed to update those units locally.
  (This block-interleaved slice of the flat ``G*H`` axis is not expressible
  as a ``NamedSharding``; the 3-D layout is what makes TP a first-class
  sharding instead of a compiler negotiation.)
* The hidden state lives sharded: each device carries ``(batch, H/m)``.
* Per timestep, the ONE unavoidable collective of a tensor-parallel
  recurrence: ``all_gather`` of the hidden block over ``'model'``
  (``batch * H`` values over ICI), because ``h @ w_hh`` contracts over the
  *full* hidden axis. Everything else — input projection, gate
  nonlinearities, cell/hidden update, masking — is local.

  (The alternative row-parallel placement — shard ``w_hh``'s contraction
  axis and ``psum`` the partial gate pre-activations — moves ``batch * G*H``
  values per step, G times more; gathering activations instead of reducing
  partials is the right side of that trade for G in {3, 4}.)

Cost model (per layer per timestep): one ``all_gather`` of ``B*H`` values,
latency-bound at small ``B*H`` — at this framework's flagship shapes
(H=512, B=32 -> 64 KiB per step over ICI) the recurrence is already
latency-bound on a single chip, so TP pays only at much larger hidden sizes
or when params/activations exceed one device's HBM. ``docs/design.md``
carries the measured analysis; this module makes the capability real,
exact, and tested (vs ``ops.rnn`` bit-for-bit up to reduction order).

Semantics match :mod:`morgana_tpu.ops.rnn` (torch gate order, masked carry
freeze at ``seq_len``, zeroed padded outputs); replaces nothing in the
reference (it has no distributed execution at all — SURVEY.md §2.4).
"""
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = [
    'gate_major', 'gate_flat', 'tp_lstm', 'tp_gru',
    'tp_lstm_stack', 'tp_gru_stack', 'build_tp_stack',
    'recurrent_tp_shardings', 'tp_value_and_grad',
]


def gate_major(w, num_gates):
    """Torch layout -> gate-major TP layout.

    ``(in, G*H) -> (in, G, H)`` for weights, ``(G*H,) -> (G, H)`` for biases.
    The last axis (hidden units) is the TP shard axis.
    """
    h = w.shape[-1] // num_gates
    return w.reshape(w.shape[:-1] + (num_gates, h))


def gate_flat(w):
    """Inverse of :func:`gate_major`: ``(..., G, H) -> (..., G*H)``."""
    return w.reshape(w.shape[:-2] + (w.shape[-2] * w.shape[-1],))


def _flatten_local(w):
    # (in, G, Hs) -> (in, G*Hs): the local gate-blocked concatenation, so the
    # cell math can use the same split-into-G code path as ops.rnn.
    return w.reshape(w.shape[0], w.shape[1] * w.shape[2]) if w.ndim == 3 \
        else w.reshape(w.shape[0] * w.shape[1])


def _time_major(x):
    return jnp.swapaxes(x, 0, 1)


def _step_mask(seq_len, num_frames, batch_size, dtype):
    if seq_len is None:
        return jnp.ones((num_frames, batch_size, 1), dtype)
    seq_len = jnp.asarray(seq_len).reshape(batch_size)
    t = jnp.arange(num_frames, dtype=seq_len.dtype)
    return (t[:, None] < seq_len[None, :]).astype(dtype)[:, :, None]


def _cast(x, compute_dtype):
    return x if compute_dtype is None else x.astype(compute_dtype)


def tp_lstm(x, w_ih, w_hh, bias, seq_len=None, axis='model', unroll=8,
            compute_dtype=None):
    r"""Single tensor-parallel LSTM layer — the per-device program.

    Must run inside ``shard_map`` (or ``jax.jit`` of a shard-mapped caller)
    with a mesh axis named ``axis``.

    Parameters (per-device shapes; ``Hs = H / mesh.shape[axis]``)
    ----------
    x : (batch, time, input_dim) — replicated over ``axis``
    w_ih : (input_dim, 4, Hs) — this device's gate-major block
    w_hh : (H, 4, Hs) — FULL hidden rows (the contraction side), local cols
    bias : (4, Hs) — the folded ``b_ih + b_hh`` (LSTM folds both input-side)
    seq_len : (batch,), optional

    Returns ``(y_local, (h_local, c_local))`` with ``y_local``
    ``(batch, time, Hs)`` — this device's hidden units, zeroed at padding;
    final state frozen at each sequence's ``seq_len`` (ops.rnn semantics).
    """
    batch, time, _ = x.shape
    dtype = x.dtype
    hs = w_ih.shape[-1]
    w_ih2, w_hh2 = _flatten_local(w_ih), _flatten_local(w_hh)
    b2 = _flatten_local(bias)

    # Input projection for all timesteps: one large local MXU matmul.
    xg = jnp.dot(_cast(x, compute_dtype), _cast(w_ih2, compute_dtype),
                 preferred_element_type=dtype) + b2
    xg = _time_major(xg)                                    # (T, B, 4*Hs)
    mask = _step_mask(seq_len, time, batch, dtype)
    w_hh_c = _cast(w_hh2, compute_dtype)

    h = jnp.zeros((batch, hs), dtype)
    c = jnp.zeros((batch, hs), dtype)

    def body(carry, inp):
        h, c = carry
        xg_t, m = inp
        # THE tensor-parallel collective: assemble the full hidden vector
        # (device-order blocks == global hidden-unit order by construction).
        h_full = jax.lax.all_gather(h, axis, axis=1, tiled=True)   # (B, H)
        gates = xg_t + jnp.dot(_cast(h_full, compute_dtype), w_hh_c,
                               preferred_element_type=dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h_out = h_new * m
        h_keep = jnp.where(m > 0, h_new, h)
        c_keep = jnp.where(m > 0, c_new, c)
        return (h_keep, c_keep), h_out

    (h, c), ys = jax.lax.scan(body, (h, c), (xg, mask), unroll=unroll)
    return _time_major(ys), (h, c)


def tp_gru(x, w_ih, w_hh, b_ih, b_hh, seq_len=None, axis='model', unroll=8,
           compute_dtype=None):
    r"""Single tensor-parallel GRU layer — per-device program (torch gate
    formulation; ``b_hh`` stays separate because it sits inside the reset
    gate's product). Shapes as :func:`tp_lstm` with 3 gates.
    """
    batch, time, _ = x.shape
    dtype = x.dtype
    hs = w_ih.shape[-1]
    w_ih2, w_hh2 = _flatten_local(w_ih), _flatten_local(w_hh)
    b_ih2, b_hh2 = _flatten_local(b_ih), _flatten_local(b_hh)

    xg = jnp.dot(_cast(x, compute_dtype), _cast(w_ih2, compute_dtype),
                 preferred_element_type=dtype) + b_ih2
    xg = _time_major(xg)                                    # (T, B, 3*Hs)
    mask = _step_mask(seq_len, time, batch, dtype)
    w_hh_c = _cast(w_hh2, compute_dtype)

    h = jnp.zeros((batch, hs), dtype)

    def body(h, inp):
        xg_t, m = inp
        h_full = jax.lax.all_gather(h, axis, axis=1, tiled=True)   # (B, H)
        hg = jnp.dot(_cast(h_full, compute_dtype), w_hh_c,
                     preferred_element_type=dtype) + b_hh2
        xr, xz, xn = jnp.split(xg_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1. - z) * n + z * h
        h_out = h_new * m
        h_keep = jnp.where(m > 0, h_new, h)
        return h_keep, h_out

    h, ys = jax.lax.scan(body, h, (xg, mask), unroll=unroll)
    return _time_major(ys), h


def tp_lstm_stack(x, layers, seq_len=None, axis='model', unroll=8,
                  compute_dtype=None):
    """Stacked TP LSTM (per-device program). ``layers`` is a sequence of
    ``(w_ih, w_hh, bias)`` per-device blocks (layer 0's ``w_ih`` rows are the
    model input dim; later layers' rows are the FULL hidden dim H).

    Between layers the output sequence is all-gathered ONCE (outside the
    scan) so the next layer sees its full-H input — L-1 sequence-sized
    gathers total, amortised over all T steps, vs the per-step hidden gather
    inside each scan.

    Returns ``(y_full, [(h_local, c_local) per layer])`` where ``y_full`` is
    the top layer's full (batch, time, H) output (replicated over ``axis``).
    """
    states = []
    for i, (w_ih, w_hh, bias) in enumerate(layers):
        y_local, hc = tp_lstm(x, w_ih, w_hh, bias, seq_len=seq_len, axis=axis,
                              unroll=unroll, compute_dtype=compute_dtype)
        states.append(hc)
        x = jax.lax.all_gather(y_local, axis, axis=2, tiled=True)
    return x, states


def tp_gru_stack(x, layers, seq_len=None, axis='model', unroll=8,
                 compute_dtype=None):
    """Stacked TP GRU (per-device program); ``layers`` holds
    ``(w_ih, w_hh, b_ih, b_hh)`` per-device blocks. See
    :func:`tp_lstm_stack`."""
    states = []
    for w_ih, w_hh, b_ih, b_hh in layers:
        y_local, h = tp_gru(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len,
                            axis=axis, unroll=unroll,
                            compute_dtype=compute_dtype)
        states.append(h)
        x = jax.lax.all_gather(y_local, axis, axis=2, tiled=True)
    return x, states


def tp_value_and_grad(loss_fn, sharded, axis='model'):
    r"""``value_and_grad`` for a per-device TP program (inside ``shard_map``)
    whose loss comes out REPLICATED over ``axis``.

    The subtlety this encodes: every model-device computes the same loss
    value, so reverse-mode AD — whose collective transposes (all_gather ->
    reduce-scatter) sum the backward streams of ALL devices — differentiates
    ``m * L``, not ``L``, along any path that crosses a collective. Sharded
    params (used through the gather) would come out ``m x`` too large, while
    replicated params (local use only) would be exact. The fix is Megatron's
    gradient rule, stated in shard_map terms:

    * differentiate ``L / m`` -> sharded-leaf grads are exact,
    * ``psum`` the replicated leaves' grads over ``axis`` to undo the 1/m
      (their per-device copies are identical, so this is an exact ``* m``).

    Parameters
    ----------
    loss_fn : params -> scalar loss (replicated over ``axis``)
    sharded : pytree of bools matching ``params``
        True for leaves sharded over ``axis`` (gate-major TP weights), False
        for replicated leaves (e.g. an output head).

    Returns ``fn(params) -> (loss, grads)`` with the UNSCALED loss and exact
    gradients for both kinds of leaf.
    """
    def fn(params):
        m = jax.lax.psum(1, axis)
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p) / m)(params)
        grads = jax.tree_util.tree_map(
            lambda g, s: g if s else jax.lax.psum(g, axis), grads, sharded)
        return loss * m, grads

    return fn


def recurrent_tp_shardings(mesh, mode='lstm', axis='model'):
    """The ``NamedSharding``s of one gate-major TP layer's global params:
    ``(w_ih, w_hh, bias...)`` with the hidden-unit axis over ``axis``."""
    w = NamedSharding(mesh, P(None, None, axis))
    b = NamedSharding(mesh, P(None, axis))
    return (w, w, b) if mode == 'lstm' else (w, w, b, b)


def build_tp_stack(mesh, mode='lstm', axis='model', data_axis=None, unroll=8,
                   compute_dtype=None):
    r"""Builds the jitted tensor-parallel stack over ``mesh``.

    Takes GLOBAL gate-major params (convert a :class:`morgana_tpu.nn.Recurrent`
    layer's torch-layout weights with :func:`gate_major`; fold LSTM biases as
    ``gate_major(b_ih + b_hh, 4)``) and a global batch; ``shard_map``
    distributes the hidden-unit axis over ``axis`` (and, if ``data_axis`` is
    given, the batch over it — dp x tp).

    Returns ``fn(x, layers, seq_len) -> (y, states)`` where ``layers`` is a
    list of gate-major param tuples, ``y`` is the full top-layer output and
    ``states`` the full final states — numerically equal to
    ``ops.rnn.lstm``/``gru`` applied layer by layer (up to reduction order).
    """
    stack = tp_lstm_stack if mode == 'lstm' else tp_gru_stack
    bspec = P(data_axis) if data_axis else P()
    wspec = P(None, None, axis)
    bias_spec = P(None, axis)
    n_bias = 1 if mode == 'lstm' else 2
    layer_spec = (wspec, wspec) + (bias_spec,) * n_bias

    def per_device(x, layers, seq_len):
        y, states = stack(x, layers, seq_len=seq_len, axis=axis,
                          unroll=unroll, compute_dtype=compute_dtype)
        # Final states are (B, Hs) locals; gather to full for the caller.
        states = jax.tree_util.tree_map(
            lambda s: jax.lax.all_gather(s, axis, axis=1, tiled=True), states)
        return y, states

    def run(x, layers, seq_len=None):
        layers = [tuple(l) for l in layers]
        # States come back gathered-full: replicated over `axis`, batch over
        # data_axis — (h, c) per layer for LSTM, h per layer for GRU.
        state_spec = [(bspec, bspec) if mode == 'lstm' else bspec
                      for _ in layers]
        fn = jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(bspec, [layer_spec for _ in layers], bspec),
            out_specs=(bspec, state_spec),
            check_vma=False)
        return jax.jit(fn)(x, layers, seq_len)

    return run
