"""Masked scan LSTM/GRU recurrence kernels.

TPU-native replacement for the reference's cuDNN RNNs with sort/pack/unpack
(``morgana/utils.py:333-393``). On TPU there is no packing: batches are fixed
shape and zero padded, so the recurrence is a masked ``lax.scan``:

* The input projection for the *whole sequence* is computed as one large
  matmul (batch*time, 4H) that maps straight onto the MXU.
* The scan body only does the small recurrent matmul + gate math (VPU),
  carrying ``(h, c)``.
* Masking freezes the carried state at each sequence's end, so the final
  hidden state equals the state at ``seq_len`` — identical semantics to
  pack/unpack — and outputs at padded positions are zeroed, identical to
  ``pad_packed_sequence``.

Gate layout matches torch (LSTM: i, f, g, o; GRU: r, z, n) so parity tests can
load torch-trained weights directly.
"""
import jax
import jax.numpy as jnp

__all__ = ['lstm', 'gru', 'lstm_stack', 'gru_stack', 'reverse_sequences']


def _time_major(x):
    return jnp.swapaxes(x, 0, 1)


def _step_mask(seq_len, num_frames, batch_size, dtype):
    if seq_len is None:
        return jnp.ones((num_frames, batch_size, 1), dtype)
    seq_len = jnp.asarray(seq_len).reshape(batch_size)
    t = jnp.arange(num_frames, dtype=seq_len.dtype)
    return (t[:, None] < seq_len[None, :]).astype(dtype)[:, :, None]


def reverse_sequences(x, seq_len=None):
    r"""Reverses each sequence along time WITHIN its valid length; padding
    stays in place. With ``seq_len=None`` this is a plain flip.

    Used for the backward direction of bidirectional RNNs: the recurrence must
    start at each sequence's last valid frame, not at the padded tail (torch
    pack/unpack semantics).
    """
    batch, time = x.shape[0], x.shape[1]
    if seq_len is None:
        return jnp.flip(x, axis=1)
    seq_len = jnp.asarray(seq_len).reshape(batch).astype(jnp.int32)
    # Clamp: a seq_len > time (caller sliced x without re-clamping lengths)
    # would make rev_idx out of bounds, and take_along_axis fills OOB reads
    # with NaN — poisoning VALID frames silently. Clamped, invalid input
    # degrades gracefully like the forward kernels.
    seq_len = jnp.minimum(seq_len, time)
    t = jnp.arange(time, dtype=jnp.int32)
    rev_idx = seq_len[:, None] - 1 - t[None, :]
    idx = jnp.where(t[None, :] < seq_len[:, None], rev_idx, t[None, :])
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def _cast_for_matmul(x, w, compute_dtype):
    if compute_dtype is None:
        return x, w
    return x.astype(compute_dtype), w.astype(compute_dtype)


def _lstm_cell(gates, c):
    """The LSTM cell equations (torch gate order i, f, g, o), shared by the
    scan and wavefront backends so the gate math cannot drift between them
    (their bit-for-bit equality is a tested contract). ``gates`` is the
    (B, 4H) pre-activation sum of input- and hidden-side projections."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def _gru_cell(xg, hg, h):
    """The GRU cell equations (torch formulation: the hidden-side bias sits
    inside the reset product via ``hg``), shared by the scan and wavefront
    backends. ``xg``/``hg`` are the (B, 3H) input-/hidden-side gate sums."""
    xr, xz, xn = jnp.split(xg, 3, axis=-1)
    hr, hz, hn = jnp.split(hg, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1. - z) * n + z * h


def lstm(x, w_ih, w_hh, b_ih, b_hh, seq_len=None, h0=None, c0=None, unroll=8,
         compute_dtype=None):
    r"""Single-layer LSTM over a padded batch.

    Parameters
    ----------
    x : jnp.ndarray, shape (batch, time, input_dim)
    w_ih : jnp.ndarray, shape (input_dim, 4*hidden)   -- gate order i, f, g, o
    w_hh : jnp.ndarray, shape (hidden, 4*hidden)
    b_ih, b_hh : jnp.ndarray, shape (4*hidden,)
    seq_len : jnp.ndarray, shape (batch,), optional
    h0, c0 : jnp.ndarray, shape (batch, hidden), optional

    Returns
    -------
    y : jnp.ndarray, shape (batch, time, hidden) -- zero at padded positions
    (h, c) : final state at each sequence's ``seq_len`` (pack/unpack semantics)
    """
    batch, time, _ = x.shape
    hidden = w_hh.shape[0]
    dtype = x.dtype

    # One big MXU matmul for all timesteps; both biases fold in here for LSTM.
    # With a bf16 compute_dtype the matmuls run on the MXU in bf16 with f32
    # accumulation (halves HBM traffic for the weights); the gate math and
    # the carried state stay f32.
    x_c, w_ih_c = _cast_for_matmul(x, w_ih, compute_dtype)
    xg = jnp.dot(x_c, w_ih_c, preferred_element_type=dtype) + (b_ih + b_hh)
    xg = _time_major(xg)                       # (T, B, 4H)
    mask = _step_mask(seq_len, time, batch, dtype)
    w_hh_c = w_hh if compute_dtype is None else w_hh.astype(compute_dtype)

    h = jnp.zeros((batch, hidden), dtype) if h0 is None else h0.astype(dtype)
    c = jnp.zeros((batch, hidden), dtype) if c0 is None else c0.astype(dtype)

    def body(carry, inp):
        h, c = carry
        xg_t, m = inp
        h_c = h if compute_dtype is None else h.astype(compute_dtype)
        gates = xg_t + jnp.dot(h_c, w_hh_c, preferred_element_type=dtype)
        h_new, c_new = _lstm_cell(gates, c)
        h_out = h_new * m
        h_keep = jnp.where(m > 0, h_new, h)
        c_keep = jnp.where(m > 0, c_new, c)
        return (h_keep, c_keep), h_out

    (h, c), ys = jax.lax.scan(body, (h, c), (xg, mask), unroll=unroll)
    return _time_major(ys), (h, c)



def _wavefront(x, layers, num_gates, bias0, bias_inner, hh_bias, state0,
               cell_step, seq_len, unroll, ct, dropout_masks=None):
    """Shared wavefront-scan scaffolding for stacked RNNs.

    Runs L layers as one scan over ``T + L - 1`` diagonals ``d = t + layer``:
    every layer's cell update for its own timestep happens as a single
    batched matmul per diagonal. ``cell_step(gates_in, hg, state)`` supplies
    the cell math and returns ``(h_new, new_state)`` where ``state`` is a
    tuple of (L, B, H) arrays whose first element is the hidden state.

    ``dropout_masks`` (optional): L-1 arrays of shape (B, T, H), the
    inter-layer dropout SCALE masks (bernoulli/keep, i.e. dropout applied to
    ones). Mask j multiplies layer j's output where it feeds layer j+1 —
    exactly the sequential stack's ``x = dropout(x)`` between layers; carried
    hidden states and the top layer's output stay unmasked, as there.

    Exactness contract (tested per cell type): per-diagonal-element masking
    reproduces the sequential stack's output zeroing and carry freezing, so
    outputs, final states and gradients match bit-for-bit up to reduction
    order.
    """
    num_layers = len(layers)
    batch, time, _ = x.shape
    hidden = layers[0][1].shape[0]
    dtype = x.dtype

    # Layer 0's input projection over the whole sequence: one big MXU matmul.
    x_c, w_ih0_c = _cast_for_matmul(x, layers[0][0], ct)
    xg0 = jnp.dot(x_c, w_ih0_c, preferred_element_type=dtype) + bias0
    xg0 = _time_major(xg0)                                     # (T, B, G*H)
    num_diags = time + num_layers - 1
    xg0 = jnp.concatenate(
        [xg0, jnp.zeros((num_layers - 1, batch, num_gates * hidden), dtype)],
        axis=0)

    # Stacked weights: inner layers' input projections and all hh projections.
    w_in = jnp.stack([l[0] for l in layers[1:]])               # (L-1, H, G*H)
    b_in = jnp.stack(bias_inner)[:, None, :]                   # (L-1, 1, G*H)
    w_hh = jnp.stack([l[1] for l in layers])                   # (L, H, G*H)
    b_hh = None if hh_bias is None else jnp.stack(hh_bias)[:, None, :]
    if ct is not None:
        w_in, w_hh = w_in.astype(ct), w_hh.astype(ct)

    seq = (jnp.full((batch,), time, jnp.int32) if seq_len is None
           else jnp.asarray(seq_len).reshape(batch).astype(jnp.int32))
    layer_off = jnp.arange(num_layers, dtype=jnp.int32)
    out_all = jnp.zeros((num_layers, batch, hidden), dtype)

    # Rearrange the (L-1, B, T, H) inter-layer dropout masks into diagonals:
    # at diagonal d, boundary j masks layer j's output from time d-1-j (the
    # value feeding layer j+1 this diagonal). Out-of-range times get 1.0 —
    # those positions are dead (zeroed by the validity mask) anyway.
    dm_diag = None
    if dropout_masks is not None:
        dm = jnp.stack(list(dropout_masks))                    # (L-1, B, T, H)
        j_idx = jnp.arange(num_layers - 1, dtype=jnp.int32)
        d_idx = jnp.arange(time + num_layers - 1, dtype=jnp.int32)
        t_idx = d_idx[:, None] - 1 - j_idx[None, :]            # (D, L-1)
        valid = (t_idx >= 0) & (t_idx < time)
        dm_diag = dm[j_idx[None, :], :, jnp.clip(t_idx, 0, time - 1), :]
        dm_diag = jnp.where(valid[:, :, None, None], dm_diag,
                            jnp.ones((), dtype))               # (D, L-1, B, H)

    batched = (((2,), (1,)), ((0,), (0,)))  # (L,B,H) @ (L,H,G*H) -> (L,B,G*H)

    def body(carry, inp):
        state, out_all = carry
        if dm_diag is None:
            xg_d, d = inp
            h_in = out_all[:-1]
        else:
            xg_d, d, dm_d = inp
            h_in = out_all[:-1] * dm_d
        t_l = d - layer_off                                    # (L,)

        h_in = h_in if ct is None else h_in.astype(ct)
        gates_in = jax.lax.dot_general(h_in, w_in, dimension_numbers=batched,
                                       preferred_element_type=dtype) + b_in
        gates_in = jnp.concatenate([xg_d[None], gates_in], axis=0)

        h_c = state[0] if ct is None else state[0].astype(ct)
        hg = jax.lax.dot_general(h_c, w_hh, dimension_numbers=batched,
                                 preferred_element_type=dtype)
        if b_hh is not None:
            hg = hg + b_hh

        h_new, new_state = cell_step(gates_in, hg, state)

        # Per-diagonal-element validity: layer l is live at time d - l while
        # that time is inside its sequence (exactly the per-layer step mask
        # of the sequential stack).
        m = (t_l[:, None] >= 0) & (t_l[:, None] < seq[None, :])
        m = m[:, :, None]
        h_out = h_new * m.astype(dtype)
        kept = tuple(jnp.where(m, new, old)
                     for new, old in zip(new_state, state))
        return (kept, h_out), h_out[-1]

    diag_idx = jnp.arange(num_diags, dtype=jnp.int32)
    scan_inputs = (xg0, diag_idx) if dm_diag is None else (xg0, diag_idx, dm_diag)
    (state, _), ys = jax.lax.scan(body, (state0, out_all), scan_inputs,
                                  unroll=unroll)
    # Top layer emits time t at diagonal t + (L-1).
    return _time_major(ys[num_layers - 1:]), state


def lstm_stack(x, layers, seq_len=None, h0s=None, unroll=8, compute_dtype=None,
               dropout_masks=None):
    r"""Multi-layer LSTM as a diagonal WAVEFRONT scan — semantically identical
    to applying :func:`lstm` layer by layer, much less sequential.

    Applying L layers as L separate scans serialises ``L * T`` dependent
    small-M recurrent matmuls. But layer ``l`` at time ``t`` only needs layer
    ``l-1``'s output at the SAME ``t`` — so along the diagonal ``d = t + l``
    all L layers are independent and run as one BATCHED matmul (cuDNN's
    multi-layer wavefront): ~L x fewer sequential rounds, no per-layer
    (B, T, H) intermediates materialised to HBM between layers.

    Parameters
    ----------
    x : jnp.ndarray (batch, time, input_dim)
    layers : sequence of (w_ih, w_hh, b_ih, b_hh)
        Layer 0's ``w_ih`` is (input_dim, 4H); all later layers must be
        (H, 4H) with the SAME hidden size H (uniform stacks only).
    seq_len, unroll, compute_dtype : as in :func:`lstm`.
    h0s : optional list of (h0, c0) per layer.

    Returns ``(y, [(h, c) per layer])`` with :func:`lstm` semantics.
    """
    num_layers = len(layers)
    if num_layers == 1:
        w_ih, w_hh, b_ih, b_hh = layers[0]
        h0, c0 = h0s[0] if h0s else (None, None)
        y, hc = lstm(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len, h0=h0, c0=c0,
                     unroll=unroll, compute_dtype=compute_dtype)
        return y, [hc]

    batch, hidden, dtype = x.shape[0], layers[0][1].shape[0], x.dtype
    if h0s:
        state0 = (jnp.stack([hc[0].astype(dtype) for hc in h0s]),
                  jnp.stack([hc[1].astype(dtype) for hc in h0s]))
    else:
        zeros = jnp.zeros((num_layers, batch, hidden), dtype)
        state0 = (zeros, jnp.zeros_like(zeros))

    def cell_step(gates_in, hg, state):
        _h, c = state
        h_new, c_new = _lstm_cell(gates_in + hg, c)
        return h_new, (h_new, c_new)

    # LSTM: both biases fold into the input-side gate projections.
    y, (h_all, c_all) = _wavefront(
        x, layers, num_gates=4, bias0=layers[0][2] + layers[0][3],
        bias_inner=[l[2] + l[3] for l in layers[1:]], hh_bias=None,
        state0=state0, cell_step=cell_step, seq_len=seq_len, unroll=unroll,
        ct=compute_dtype, dropout_masks=dropout_masks)
    return y, [(h_all[l], c_all[l]) for l in range(num_layers)]


def gru_stack(x, layers, seq_len=None, h0s=None, unroll=8, compute_dtype=None,
              dropout_masks=None):
    r"""Multi-layer GRU as a diagonal wavefront scan — the GRU analogue of
    :func:`lstm_stack` (same exactness guarantees vs the sequential stack).

    Note the GRU's hidden-side bias sits INSIDE the reset gate's product
    (torch formulation), so ``b_ih`` and ``b_hh`` are folded separately.
    """
    num_layers = len(layers)
    if num_layers == 1:
        w_ih, w_hh, b_ih, b_hh = layers[0]
        h0 = h0s[0] if h0s else None
        y, h = gru(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len, h0=h0,
                   unroll=unroll, compute_dtype=compute_dtype)
        return y, [h]

    batch, hidden, dtype = x.shape[0], layers[0][1].shape[0], x.dtype
    state0 = (jnp.stack([h.astype(dtype) for h in h0s]) if h0s
              else jnp.zeros((num_layers, batch, hidden), dtype),)

    def cell_step(gates_in, hg, state):
        (h,) = state
        h_new = _gru_cell(gates_in, hg, h)
        return h_new, (h_new,)

    y, (h_all,) = _wavefront(
        x, layers, num_gates=3, bias0=layers[0][2],
        bias_inner=[l[2] for l in layers[1:]], hh_bias=[l[3] for l in layers],
        state0=state0, cell_step=cell_step, seq_len=seq_len, unroll=unroll,
        ct=compute_dtype, dropout_masks=dropout_masks)
    return y, [h_all[l] for l in range(num_layers)]

def gru(x, w_ih, w_hh, b_ih, b_hh, seq_len=None, h0=None, unroll=8,
        compute_dtype=None):
    r"""Single-layer GRU over a padded batch (torch gate formulation).

    ``r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)``,
    ``z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)``,
    ``n = tanh(x W_in + b_in + r * (h W_hn + b_hn))``,
    ``h' = (1 - z) * n + z * h``.

    Shapes as in :func:`lstm` with 3*hidden gate dims (order r, z, n).
    """
    batch, time, _ = x.shape
    hidden = w_hh.shape[0]
    dtype = x.dtype

    x_c, w_ih_c = _cast_for_matmul(x, w_ih, compute_dtype)
    xg = jnp.dot(x_c, w_ih_c, preferred_element_type=dtype) + b_ih
    xg = _time_major(xg)                       # (T, B, 3H)
    mask = _step_mask(seq_len, time, batch, dtype)
    w_hh_c = w_hh if compute_dtype is None else w_hh.astype(compute_dtype)

    h = jnp.zeros((batch, hidden), dtype) if h0 is None else h0.astype(dtype)

    def body(h, inp):
        xg_t, m = inp
        h_c = h if compute_dtype is None else h.astype(compute_dtype)
        hg = jnp.dot(h_c, w_hh_c, preferred_element_type=dtype) + b_hh
        h_new = _gru_cell(xg_t, hg, h)
        h_out = h_new * m
        h_keep = jnp.where(m > 0, h_new, h)
        return h_keep, h_out

    h, ys = jax.lax.scan(body, h, (xg, mask), unroll=unroll)
    return _time_major(ys), h
