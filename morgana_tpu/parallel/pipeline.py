"""Pipeline parallelism (GPipe-style) over a ``'stage'`` mesh axis.

The reference has no distributed execution at all (SURVEY.md §2.4 marks
PP out of scope for parity); this module makes pipeline parallelism a real,
exact, tested capability for the transformer flagship, built the TPU-native
way rather than as a torch-style microbatch scheduler thread:

* The encoder's ``num_layers`` identical pre-LN blocks are split into ``S``
  contiguous stages. Each device holds its stage's block parameters — the
  stacked parameter tree is sharded on its leading (layer) axis over
  ``'stage'``.
* Microbatch scheduling is a **single ``lax.scan`` over
  ``M + S - 1`` ticks inside ``shard_map``** (compiler-friendly control
  flow; one compiled program, no host round-trips). At each tick every
  device applies its stage to the activation it holds and ``ppermute``s the
  result one stage forward over ICI. Stage 0 injects microbatch ``t``;
  stage ``S-1`` emits results from tick ``S-1`` on.
* Reverse-mode AD of the whole ``shard_map`` gives the backward pipeline
  for free: ``ppermute`` transposes to the reverse permutation, the
  forward's scan transposes to a reverse-order scan, so gradients flow
  stage ``S-1 -> 0`` exactly like a hand-scheduled 1F1B backward would —
  with XLA overlapping the per-tick compute and the ICI transfer.

Cost model: the classic GPipe bubble — every device runs ``M + S - 1``
ticks to do ``M`` ticks of useful work, so utilisation is
``M / (M + S - 1)`` (choose ``M >= 4*S`` to keep the bubble under ~20%).
Per tick, one activation block (``mb x T x d_model`` values) crosses ICI
per stage boundary. PP pays off when a model's layers do not fit one
device's HBM or when batch scaling has exhausted the data axis; at this
framework's flagship sizes it is a capability (and a correctness-tested
template), not a speedup — the same honesty note as tensor parallelism
(docs/design.md).

Composition: the mesh may carry a ``'data'`` axis alongside ``'stage'``
(:func:`make_pipeline_mesh`); microbatches are then data-sharded inside the
same ``shard_map`` and the gradient ``psum`` over ``'data'`` is inserted by
XLA outside, so dp x pp trains with the standard fused step unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from morgana_tpu import nn
from morgana_tpu.ops import attention as attention_ops

__all__ = [
    'make_pipeline_mesh', 'round_microbatches', 'stack_block_params',
    'transformer_block_apply',
    'pipeline_apply', 'PipelinedTransformerEncoder',
]


def round_microbatches(requested, per_shard):
    """Largest divisor of the per-data-shard batch ``per_shard`` that is
    <= the ``requested`` microbatch count, so every microbatch still splits
    evenly over 'data'. (gcd would round down further than needed — e.g.
    gcd(8, 6) = 2 where 6 is a valid count — needlessly inflating the
    GPipe bubble.)"""
    return max(d for d in range(1, max(1, min(requested, per_shard)) + 1)
               if per_shard % d == 0)


def make_pipeline_mesh(num_stages, num_data=None, devices=None):
    """A ``('data', 'stage')`` mesh: batch over 'data', layers over 'stage'."""
    if devices is None:
        devices = jax.devices()
    if num_stages < 1 or num_stages > len(devices):
        raise ValueError(f"mesh axis 'stage' = {num_stages} must be between "
                         f'1 and the device count ({len(devices)})')
    if num_data is None:
        num_data = len(devices) // num_stages
    devices = np.asarray(devices[:num_data * num_stages]).reshape(
        num_data, num_stages)
    return Mesh(devices, axis_names=('data', 'stage'))


# Block-parameter leaves, in the order they appear in one
# ``nn.TransformerEncoderLayer`` (names mirror its module tree).
_BLOCK_LEAVES = (
    'attn_norm.weight', 'attn_norm.bias',
    'attn.in_proj.weight', 'attn.in_proj.bias',
    'attn.out_proj.weight', 'attn.out_proj.bias',
    'ffn_norm.weight', 'ffn_norm.bias',
    'ffn_in.weight', 'ffn_in.bias',
    'ffn_out.weight', 'ffn_out.bias',
)


def stack_block_params(blocks):
    """Stacks a ``ModuleList`` of identical ``TransformerEncoderLayer``s into
    ``{leaf_name: (num_layers, ...)}`` — the pipeline's stage-shardable
    parameter tree. Under jit the stack is free to fuse, and a
    ``with_sharding_constraint`` (applied by the caller) lays the copy out
    stage-sharded."""
    def leaf(block, name):
        obj = block
        for part in name.split('.'):
            obj = getattr(obj, part)
        return obj.value

    return {name: jnp.stack([leaf(b, name) for b in blocks])
            for name in _BLOCK_LEAVES}


def _layer_norm(x, w, b, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def _linear(x, w, b, compute_dtype):
    if compute_dtype is not None:
        y = jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                    preferred_element_type=x.dtype)
    else:
        y = x @ w
    return y + b


def transformer_block_apply(p, x, seq_len, num_heads, causal=False,
                            window=None, compute_dtype=None):
    """One pre-LN encoder block as a pure function of ``{leaf: array}``
    params — the same math as ``nn.TransformerEncoderLayer.forward``
    (dropout-free: pipeline stages draw no RNG), asserted equal in
    ``tests/test_pipeline_parallel.py``."""
    batch, q_len, d_model = x.shape
    head_dim = d_model // num_heads

    h = _layer_norm(x, p['attn_norm.weight'], p['attn_norm.bias'])
    qkv = _linear(h, p['attn.in_proj.weight'], p['attn.in_proj.bias'],
                  compute_dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def to_heads(t):
        return t.reshape(batch, q_len, num_heads, head_dim).transpose(0, 2, 1, 3)

    bias_term = attention_ops.padding_bias(seq_len, q_len)
    if causal:
        cb = (attention_ops.local_causal_bias(q_len, window)
              if window else attention_ops.causal_bias(q_len))
        bias_term = bias_term + cb
    out = attention_ops.scaled_dot_product_attention(
        to_heads(q), to_heads(k), to_heads(v), bias=bias_term,
        compute_dtype=compute_dtype)
    out = out.transpose(0, 2, 1, 3).reshape(batch, q_len, d_model)
    x = x + _linear(out, p['attn.out_proj.weight'], p['attn.out_proj.bias'],
                    compute_dtype)

    h = _layer_norm(x, p['ffn_norm.weight'], p['ffn_norm.bias'])
    h = _linear(h, p['ffn_in.weight'], p['ffn_in.bias'], compute_dtype)
    h = jax.nn.gelu(h, approximate=False)
    return x + _linear(h, p['ffn_out.weight'], p['ffn_out.bias'],
                       compute_dtype)


def pipeline_apply(stacked, x, seq_len, mesh, num_heads, num_microbatches,
                   axis='stage', data_axis=None, causal=False, window=None,
                   remat=False, compute_dtype=None):
    """Runs the stacked blocks over ``x`` (batch, T, d_model) as an
    ``S``-stage pipeline on ``mesh``; differentiable end to end.

    ``stacked`` leaves are (num_layers, ...); num_layers must divide by the
    mesh's ``axis`` size. The batch splits into ``num_microbatches`` equal
    microbatches (must divide; with ``data_axis``, each microbatch is
    additionally sharded over it). Returns (batch, T, d_model), numerically
    equal to applying the blocks sequentially (up to reduction order).
    """
    num_stages = mesh.shape[axis]
    num_layers = next(iter(stacked.values())).shape[0]
    if num_layers % num_stages:
        raise ValueError(f'num_layers {num_layers} not divisible by '
                         f'{num_stages} pipeline stages')
    batch = x.shape[0]
    m = int(num_microbatches)
    if batch % m:
        raise ValueError(f'batch {batch} not divisible by '
                         f'{m} microbatches')
    layers_per_stage = num_layers // num_stages
    mb = batch // m
    if data_axis and mb % mesh.shape[data_axis]:
        raise ValueError(f'microbatch size {mb} not divisible by the '
                         f"'{data_axis}' axis ({mesh.shape[data_axis]})")
    x_mb = x.reshape((m, mb) + x.shape[1:])
    seq_len_mb = jnp.asarray(seq_len).reshape(-1)[:batch].reshape(m, mb)

    block = transformer_block_apply
    if remat:
        block = jax.checkpoint(block, static_argnums=(3, 4, 5, 6))

    def per_device(local, x_all, sl_all):
        stage = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

        def stage_apply(h, sl):
            for i in range(layers_per_stage):
                p_i = {k: v[i] for k, v in local.items()}
                h = block(p_i, h, sl, num_heads, causal, window,
                          compute_dtype)
            return h

        def tick(state, t):
            # Stage s works on microbatch (t - s); clamped indices keep the
            # warm-up/drain ticks in bounds (their outputs are masked away).
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            inject = x_all[jnp.clip(t, 0, m - 1)]
            current = jnp.where(stage == 0, inject, state)
            out = stage_apply(current, sl_all[mb_idx])
            return jax.lax.ppermute(out, axis, perm), out

        _, outs = jax.lax.scan(tick, jnp.zeros_like(x_all[0]),
                               jnp.arange(m + num_stages - 1))
        y = outs[num_stages - 1:]                       # (M, mb, T, d)
        # Only the last stage's emissions are real; broadcast them to every
        # stage so the caller sees a stage-replicated result.
        y = jnp.where(stage == num_stages - 1, y, jnp.zeros_like(y))
        return jax.lax.psum(y, axis)

    bspec = P(None, data_axis) if data_axis else P()
    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), bspec, bspec),
        out_specs=bspec,
        check_vma=False)
    y = fn(stacked, x_mb, seq_len_mb)
    return y.reshape((batch,) + x.shape[1:])


class PipelinedTransformerEncoder(nn.TransformerEncoder):
    """Drop-in :class:`nn.TransformerEncoder` whose blocks execute as a
    pipeline over a ``('data', 'stage')`` mesh.

    The parameter tree (and init RNG consumption) is IDENTICAL to the
    sequential encoder, so checkpoints interchange freely between
    pipelined and non-pipelined configurations; the forward stacks the
    per-block leaves under jit (a sharding constraint lays the stacked
    copy out stage-sharded) and runs :func:`pipeline_apply`.

    ``mesh=None`` builds a mesh over all visible devices at first use with
    ``num_stages`` stages and the rest on 'data'. ``num_microbatches`` is
    rounded down to a divisor of each batch.
    """

    def __init__(self, num_layers, d_model, num_heads, d_ff, dropout=0.0,
                 add_positions=True, causal=False, window=None, remat=None,
                 attention_backend='auto', num_stages=2, num_microbatches=8,
                 mesh=None):
        if dropout:
            raise ValueError(
                'pipeline parallelism does not support dropout (stages are '
                'pure functions drawing no RNG); train with dropout_prob=0 '
                'or use the sequential encoder')
        if num_layers % num_stages:
            raise ValueError(f'num_layers {num_layers} must divide into '
                             f'{num_stages} pipeline stages')
        super().__init__(num_layers, d_model, num_heads, d_ff, dropout=0.0,
                         add_positions=add_positions, causal=causal,
                         window=window, remat=remat,
                         attention_backend=attention_backend)
        self.num_heads = num_heads
        self.num_stages = int(num_stages)
        self.num_microbatches = int(num_microbatches)
        self._mesh = mesh

    def _pipeline_mesh(self):
        if self._mesh is None:
            self._mesh = make_pipeline_mesh(self.num_stages)
        return self._mesh

    def forward(self, x, seq_len=None):
        if self.add_positions:
            x = x + attention_ops.sinusoidal_positions(
                x.shape[1], self.d_model, dtype=x.dtype)
        mesh = self._pipeline_mesh()
        stacked = stack_block_params(self.blocks)
        stacked = jax.lax.with_sharding_constraint(
            stacked, jax.sharding.NamedSharding(mesh, P('stage')))
        if seq_len is None:
            seq_len = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
        data_size = mesh.shape.get('data', 1)
        if x.shape[0] % data_size:
            raise ValueError(f'batch {x.shape[0]} not divisible by the '
                             f"mesh's 'data' axis ({data_size})")
        m = round_microbatches(self.num_microbatches,
                               x.shape[0] // data_size)
        remat = self.remat if self.remat is not None else nn.default_remat()
        y = pipeline_apply(
            stacked, x, seq_len, mesh, self.num_heads, m,
            data_axis='data' if mesh.shape.get('data', 1) > 1 else None,
            causal=self.causal, window=self.window, remat=bool(remat),
            compute_dtype=nn.default_compute_dtype())
        return self.norm(y)

    def __repr__(self):
        return (f'PipelinedTransformerEncoder(layers={len(self.blocks)}, '
                f'stages={self.num_stages}, '
                f'microbatches={self.num_microbatches})')
