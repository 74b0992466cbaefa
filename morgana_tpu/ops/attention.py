"""Scaled dot-product attention — the MXU-native sequence mixer.

The reference framework is RNN-only (``morgana/utils.py:333-393`` wraps
cuDNN RNNs); this module is the beyond-reference attention path that the
Transformer acoustic model (``models/transformer_spss.py``) builds on.
Everything here is jit-safe with static shapes:

* batched heads — the two einsums are (B·H, T, Dh) matmuls, large enough to
  tile onto the MXU at training shapes;
* bf16-friendly — logits accumulate in float32 (``preferred_element_type``)
  and the softmax runs in float32 regardless of the compute dtype, the
  numerically safe mixed-precision recipe;
* masking is additive — padding (and optionally causal) structure enters as
  a large negative bias on the logits, so variable-length batches use the
  same static-shape program.
"""
import jax
import jax.numpy as jnp

__all__ = [
    'padding_bias',
    'causal_bias',
    'local_causal_bias',
    'streaming_bias',
    'scaled_dot_product_attention',
    'sinusoidal_positions',
    'sinusoidal_positions_at',
]

# Large-negative logit bias for masked positions. Finite (not -inf) so that
# fully-padded query rows still produce a well-defined (uniform) softmax and
# a zero gradient instead of NaNs; padded frames are discarded by the
# sequence-masked losses downstream.
_MASK_BIAS = -1e9


def padding_bias(seq_len, max_len, dtype=jnp.float32):
    """Additive attention bias hiding padded *key* positions.

    Parameters
    ----------
    seq_len : jnp.ndarray, shape (batch,) or (batch, 1)
        Valid lengths per sequence.
    max_len : int
        Static padded length (key axis).

    Returns
    -------
    bias : jnp.ndarray, shape (batch, 1, 1, max_len)
        0 at valid keys, ``_MASK_BIAS`` at padded keys; broadcasts over
        (heads, queries).
    """
    seq_len = jnp.asarray(seq_len)
    if seq_len.ndim == 2:
        seq_len = seq_len[:, 0]
    positions = jnp.arange(max_len, dtype=seq_len.dtype)
    valid = positions[None, :] < seq_len[:, None]          # (B, T)
    return jnp.where(valid, 0.0, _MASK_BIAS).astype(dtype)[:, None, None, :]


def causal_bias(max_len, dtype=jnp.float32):
    """Additive bias hiding keys *after* each query position,
    shape (1, 1, max_len, max_len)."""
    q = jnp.arange(max_len)
    allowed = q[:, None] >= q[None, :]                     # (Tq, Tk)
    return jnp.where(allowed, 0.0, _MASK_BIAS).astype(dtype)[None, None]


def local_causal_bias(max_len, window, dtype=jnp.float32):
    """Sliding-window causal bias: query ``i`` sees keys ``j`` with
    ``i - window < j <= i`` (``window`` keys including self), shape
    (1, 1, max_len, max_len). Attention cost becomes linear in sequence
    length, and the window IS the streaming KV-cache size — a chunked
    stream with a ``window``-deep cache reproduces this bias exactly
    (:func:`streaming_bias`)."""
    q = jnp.arange(max_len)
    diff = q[:, None] - q[None, :]                         # (Tq, Tk)
    allowed = (diff >= 0) & (diff < window)
    return jnp.where(allowed, 0.0, _MASK_BIAS).astype(dtype)[None, None]


def streaming_bias(pos, chunk, window, dtype=jnp.float32):
    """Bias for one streamed chunk over ``[cache | chunk]`` keys.

    Queries are the ``chunk`` frames at absolute positions ``pos + i``;
    keys are the ``window`` cached frames (absolute ``pos - window + j``)
    followed by the chunk itself. A key is visible iff it exists
    (absolute position >= 0 — the cache starts zero-filled) and lies in
    the query's causal window. ``pos`` may be a traced scalar; shapes stay
    static at (1, 1, chunk, window + chunk).
    """
    pos = jnp.asarray(pos)
    q_abs = pos + jnp.arange(chunk)                        # (C,)
    k_abs = pos - window + jnp.arange(window + chunk)      # (W+C,)
    diff = q_abs[:, None] - k_abs[None, :]
    allowed = (k_abs >= 0)[None, :] & (diff >= 0) & (diff < window)
    return jnp.where(allowed, 0.0, _MASK_BIAS).astype(dtype)[None, None]


def scaled_dot_product_attention(q, k, v, bias=None, dropout_p=0.0,
                                 dropout_rng=None, compute_dtype=None):
    """Attention over batched heads.

    Parameters
    ----------
    q, k, v : jnp.ndarray, shape (batch, heads, T, head_dim)
        Projected queries/keys/values. ``k``/``v`` may have a different T
        (cross-attention).
    bias : jnp.ndarray, optional
        Additive logit bias broadcastable to (batch, heads, Tq, Tk) — sum of
        :func:`padding_bias` / :func:`causal_bias` terms.
    dropout_p : float
        Dropout on the attention probabilities (training only; caller gates).
    dropout_rng : jax PRNG key, required when ``dropout_p > 0``.
    compute_dtype : jnp dtype, optional
        Matmul input dtype (e.g. bf16). Logits/softmax stay float32.

    Returns
    -------
    out : jnp.ndarray, shape (batch, heads, Tq, head_dim), dtype of ``q``.
    """
    out_dtype = q.dtype
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))

    if compute_dtype is not None:
        q, k, v = (x.astype(compute_dtype) for x in (q, k, v))

    # (B, H, Tq, Tk) logits, accumulated in f32 whatever the input dtype.
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)

    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_p > 0.0:
        if dropout_rng is None:
            raise ValueError('dropout_p > 0 requires dropout_rng')
        keep = 1.0 - dropout_p
        mask = jax.random.bernoulli(dropout_rng, keep, probs.shape)
        probs = jnp.where(mask, probs / keep, 0.0)

    probs = probs.astype(v.dtype)
    out = jnp.einsum('bhqk,bhkd->bhqd', probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def sinusoidal_positions(max_len, dim, dtype=jnp.float32):
    """The 'Attention is all you need' sinusoidal position table,
    shape (max_len, dim). Computed with jnp ops so it constant-folds
    inside jit (static ``max_len``/``dim``)."""
    return sinusoidal_positions_at(jnp.arange(max_len, dtype=jnp.float32),
                                   dim, dtype=dtype)


def sinusoidal_positions_at(positions, dim, dtype=jnp.float32):
    """Sinusoid encodings for explicit (possibly traced) absolute frame
    positions, shape (len(positions), dim) — the streaming path encodes
    each chunk at its true offset so chunked == batch exactly."""
    if dim % 2 != 0:
        raise ValueError(f'sinusoidal position dim must be even, got {dim}')
    pos = jnp.asarray(positions, jnp.float32)[:, None]
    half = jnp.arange(dim // 2, dtype=jnp.float32)[None, :]
    angles = pos / jnp.power(10000.0, 2.0 * half / dim)
    # Interleaved to the canonical (sin, cos, sin, cos, ...) layout.
    table = jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    return table.reshape(pos.shape[0], dim).astype(dtype)
