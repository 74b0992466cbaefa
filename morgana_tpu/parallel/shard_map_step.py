"""Explicit shard_map data-parallel training step.

The default DP path relies on GSPMD: sharded batches + replicated params in a
plain ``jit``, with XLA inserting the gradient ``psum``. This module provides
the *explicit-collective* formulation — ``shard_map`` over the ``'data'``
mesh axis with a hand-placed ``jax.lax.pmean`` on gradients and loss — which
is numerically identical but gives manual control over where the ICI
collective happens (useful for overlapping communication or customising the
reduction, and the canonical pattern for multi-host DP).
"""
import jax
from jax.sharding import PartitionSpec as P

__all__ = ['build_shard_map_train_step']


def build_shard_map_train_step(model, optimizer, mesh, axis='data', ema_decay=0.,
                               log_norms=False):
    r"""Builds a jitted shard_map train step for ``model`` over ``mesh``.

    Parameters are replicated; the batch is split over ``axis``. Each device
    computes grads on its shard; ``pmean`` over ICI reduces them; all devices
    apply the identical optimiser update.

    Returns ``step(params, opt_state, ema_params, batch, lr, global_step,
    rng)`` -> ``(params, opt_state, ema_params, loss, staged, outputs)`` —
    the same signature as :meth:`morgana_tpu.training.TrainLoop`'s fused
    step, so ``TrainLoop(shard_map_mesh=...)`` (the builder's
    ``--shard_map_step`` flag) can swap it in unchanged. ``global_step``
    travels outside the batch because it is replicated, not batch-sharded.

    ``log_norms`` stages the grad/param/update global-norm diagnostics,
    computed on the POST-``pmean`` gradients and post-update parameters —
    replicated values, so they append to the (already psum-reduced) staged
    dict with no extra collective and merge exactly like the fused step's.
    """

    def per_device_step(params, opt_state, ema_params, batch, lr, global_step, rng):
        from morgana_tpu import training

        batch = dict(batch, global_step=global_step)
        # Decorrelate stochastic layers across data shards: the key arrives
        # replicated (in_specs P()), so without the fold-in every device
        # would draw IDENTICAL dropout masks / VAE noise for its shard.
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        loss, staged, outputs, grads = training.staged_value_and_grad(
            model, params, batch, rng)

        # Explicit ICI collectives: mean-reduce loss and gradients.
        loss = jax.lax.pmean(loss, axis)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis), grads)
        staged = jax.tree_util.tree_map(lambda s: jax.lax.psum(s, axis), staged)

        params, opt_state, ema_params, updates = training.apply_updates(
            optimizer, ema_decay, params, opt_state, ema_params, grads, lr)
        if log_norms:
            staged = training.stage_norms(model.metrics, staged, grads,
                                          params, updates, lr)
        return params, opt_state, ema_params, loss, staged, outputs

    # Pytree-prefix specs: a single P() / P(axis) broadcasts over each whole
    # argument subtree — no per-leaf spec trees needed. Outputs stay
    # batch-sharded (each device's shard of the forward outputs).
    fn = jax.shard_map(
        per_device_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P(axis)),
        check_vma=False)

    return jax.jit(fn, donate_argnums=(0, 1, 2))
