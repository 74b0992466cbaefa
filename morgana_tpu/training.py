"""Fused jit train/valid/test steps.

This is the performance core replacing the reference's eager per-batch loop
(``morgana/experiment_builder.py:431-505``): forward + masked loss + grad +
Adam (+ weight decay) + EMA update compile into **one XLA program** with
donated parameter/optimiser buffers. Per batch, the host only dispatches the
step and merges the returned metric partials — there are no mid-forward host
round trips (the reference did MLPG on host inside ``predict`` every batch,
``models/RNN_SPSS.py:108-118``) and no blocking ``.item()`` syncs
(``morgana/experiment_builder.py:480``).

Data-parallel scaling needs no changes here: with batches placed in a
``NamedSharding`` over a device mesh (and replicated params), XLA's SPMD
partitioner runs the same jitted step on every device and inserts the
gradient ``psum`` over ICI automatically.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from morgana_tpu import nn

__all__ = ['build_optimizer', 'TrainLoop', 'numeric_features', 'host_features',
           'staged_value_and_grad', 'apply_updates']


def staged_value_and_grad(model, params, batch, rng):
    """Loss + staged-metric forward and its gradients — the shared core of
    the fused, accumulation and shard_map train steps. Returns
    ``(loss, staged, outputs, grads)``."""
    def loss_fn(p):
        with nn.bind(model, p, rng=rng, train=True):
            model.metrics.begin_staging('train')
            loss, outputs = model(batch)
            # Layer-registered auxiliary losses (e.g. MoE load balancing)
            # fold into the optimised — and therefore the REPORTED train —
            # loss, exactly like any other regulariser. Eval losses run
            # outside this step and stay pure task loss, so with MoE the
            # train/valid loss columns differ by the aux term.
            loss = loss + nn.collected_aux_loss()
            staged = model.metrics.drain_staged_values()
        return loss, (outputs, staged)

    (loss, (outputs, staged)), grads = \
        jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, staged, outputs, grads


def apply_updates(optimizer, ema_decay, params, opt_state, ema_params,
                  grads, lr):
    """Optimiser + EMA tail shared by every step that updates parameters.
    ``lr`` is a traced scalar so schedules never retrace. Also returns the
    raw optimiser ``updates`` (pre-lr) so callers can observe them (e.g.
    ``log_norms``) without recomputing the transform chain."""
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
    if ema_decay:
        ema_params = nn.ema_update(ema_params, params, ema_decay)
    return params, opt_state, ema_params, updates


def stage_norm_values(handler, staged, diags, valid=None):
    """Appends named scalar diagnostics to an already-drained staged-metric
    dict (jit-side; the builder's ``apply_staged`` merges them like any
    other staged partial). ``diags`` is an iterable of ``(name, scalar)``;
    each metric must already be registered in the handler's ``'train'``
    collection. Keys extend the drained dict's ``'NNN|collection|name'``
    scheme so identity rides with each value.

    ``valid`` (a traced bool) multiplies every partial leaf — for a
    ``Mean`` this zeroes both ``sum`` AND ``count``, so a masked-out step
    contributes nothing to the merged result. This is what lets a scanned
    accumulation chain stage a UNIFORM key set every micro-step while the
    merged norms cover exactly the applied optimiser steps."""
    out = dict(staged)
    idx = len(staged)
    for name, value in diags:
        # collections[...] (not handler['train']): plain dict access — the
        # public indexer flushes pending merges, a host-sync side effect
        # that must not fire at trace time.
        p = handler.collections['train'][name].partials(value)
        if valid is not None:
            p = jax.tree_util.tree_map(
                lambda t: t * jnp.asarray(valid, t.dtype), p)
        out[f'{idx:04d}|train|{name}'] = p
        idx += 1
    return out


def stage_norms(handler, staged, grads, params, updates, lr):
    """Stages the three global L2-norm diagnostics of an applied optimiser
    step (see :func:`stage_norm_values` for the staging mechanics):

    - ``grad_norm``: raw global gradient norm, BEFORE any clipping — the
      quantity torch's ``clip_grad_norm_`` returns, and the one to watch for
      recurrent-net explosions.
    - ``param_norm``: global norm of the post-update parameters.
    - ``update_norm``: global norm of the actual parameter change
      ``lr * update`` (the effective step size in parameter space)."""
    return stage_norm_values(
        handler, staged,
        (('grad_norm', optax.global_norm(grads)),
         ('param_norm', optax.global_norm(params)),
         ('update_norm', lr * optax.global_norm(updates))))


#: Optimiser registry, mirroring the LR-schedule registry
#: (``lr_schedules.SUPPORTED``). The reference hard-codes ``torch.optim.Adam``
#: (``morgana/experiment_builder.py:516``); ``'adam'`` reproduces its
#: semantics exactly and stays the default. The rest are beyond-reference.
SUPPORTED_OPTIMIZERS = ('adam', 'adamw', 'sgd', 'lamb')


def build_optimizer(name='adam', weight_decay=0., b1=0.9, b2=0.999, eps=1e-8,
                    grad_clip_norm=0., momentum=0., nesterov=False):
    r"""Gradient transform for the fused train step. The learning rate is
    applied separately inside the step (as a traced scalar, ``p - lr * u``)
    so LR schedules never retrace; every transform here therefore excludes
    the lr factor. ``grad_clip_norm`` > 0 clips the global gradient norm
    first (the classic guard against recurrent-net gradient explosions).

    - ``'adam'``: Adam with L2 regularisation added to the *gradient* —
      torch ``Adam(weight_decay=...)`` semantics
      (``morgana/experiment_builder.py:516``), not AdamW.
    - ``'adamw'``: decoupled weight decay — ``u = adam(g) + wd * p``
      (torch ``AdamW`` semantics; the modern default for transformers).
    - ``'sgd'``: L2-in-gradient then (optionally Nesterov) momentum —
      torch ``SGD(momentum=, nesterov=, weight_decay=)`` semantics.
    - ``'lamb'``: AdamW update rescaled per layer by the trust ratio
      ``||p|| / ||u||`` (You et al. 2020) — large-batch training.

    ``b1/b2/eps`` apply to the Adam-family members, ``momentum/nesterov``
    to SGD; irrelevant knobs are ignored by the chosen optimiser.
    """
    if name not in SUPPORTED_OPTIMIZERS:
        raise ValueError(
            f'Unknown optimizer {name!r}; supported: {SUPPORTED_OPTIMIZERS}')
    transforms = []
    if grad_clip_norm:
        transforms.append(optax.clip_by_global_norm(grad_clip_norm))
    if name == 'adam':
        if weight_decay:
            transforms.append(optax.add_decayed_weights(weight_decay))
        transforms.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    elif name == 'adamw':
        transforms.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        if weight_decay:
            transforms.append(optax.add_decayed_weights(weight_decay))
    elif name == 'sgd':
        if nesterov and not momentum:
            # torch.optim.SGD raises the same way: Nesterov needs momentum,
            # and silently training plain SGD would misreport the config.
            raise ValueError('SGD: nesterov=True requires momentum > 0')
        if weight_decay:
            transforms.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            transforms.append(optax.trace(decay=momentum, nesterov=nesterov))
    elif name == 'lamb':
        transforms.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        if weight_decay:
            transforms.append(optax.add_decayed_weights(weight_decay))
        transforms.append(optax.scale_by_trust_ratio())
    if not transforms:
        transforms.append(optax.identity())
    return optax.chain(*transforms)


def batch_items(batch):
    """Number of items in a collated batch — the leading dim of the first
    batched array (a trace-time constant under jit: shapes are static)."""
    for value in batch.values():
        if hasattr(value, 'shape') and len(value.shape) >= 1:
            return int(value.shape[0])
    return 1


def numeric_features(features):
    """The jit-able subset of a batch (numeric/bool arrays only).

    Uses jnp.issubdtype: numpy's treats extension dtypes like bfloat16 as
    non-numeric, which would silently drop bf16 features from the batch."""
    out = {}
    for key, value in features.items():
        if isinstance(value, (np.ndarray, jax.Array)) and (
                jnp.issubdtype(value.dtype, jnp.number)
                or value.dtype == np.bool_):
            out[key] = value
    return out


def host_features(features):
    """The non-numeric remainder (names, strings) kept host-side."""
    numeric = numeric_features(features)
    return {k: v for k, v in features.items() if k not in numeric}


class TrainLoop(object):
    r"""Owns the training state (params, optimiser state, EMA params) and the
    compiled step functions for one model.

    The model object's parameters are donated into the loop; call
    :meth:`sync_model` (and :meth:`sync_ema_model`) before using the model
    eagerly (analysis hooks, checkpointing).
    """

    def __init__(self, model, optimizer, ema_decay=0., seed=1234567890,
                 ema_model=None, shard_map_mesh=None, grad_accum_steps=1,
                 log_norms=False):
        self.model = model
        self.optimizer = optimizer
        self.ema_decay = float(ema_decay)
        self.ema_model = ema_model
        # Gradient observability: stage grad/param/update global norms out
        # of every APPLIED step (accumulation micro-steps have no update and
        # their micro-gradient norm is not the applied-gradient norm, so
        # they stage nothing — the dict-keyed staging protocol tolerates the
        # differing key sets across executables).
        self.log_norms = bool(log_norms)
        if self.log_norms:
            from morgana_tpu import metrics as metrics_mod
            for name in ('grad_norm', 'param_norm', 'update_norm'):
                if name not in model.metrics['train']:
                    model.metrics.add_metrics(
                        ('train',), **{name: metrics_mod.Mean()})
        # When set, the train step uses the explicit-collective shard_map
        # formulation over this mesh instead of relying on GSPMD.
        self.shard_map_mesh = shard_map_mesh
        # Gradient accumulation: micro-batch gradients (each a mean over its
        # batch items) are weighted by item count, summed on device, and the
        # optimiser (and EMA) applies once every N calls after dividing by
        # the total item count — numerically identical to one step on the
        # N-batch concatenation (sequence_loss is a mean over batch items)
        # even when the last micro-batch of a cycle is a smaller remainder
        # batch. The effective batch is N * batch_size without N x the
        # activation memory.
        self.grad_accum_steps = int(grad_accum_steps) if grad_accum_steps else 1
        if self.grad_accum_steps > 1 and shard_map_mesh is not None:
            raise ValueError('grad_accum_steps > 1 is not supported with the '
                             'explicit shard_map step; use the GSPMD '
                             '(--data_parallel) path, which shards the '
                             'accumulated gradients automatically.')

        self.params = nn.parameters(model)
        self.opt_state = optimizer.init(self.params)
        if self.ema_decay:
            src = ema_model if ema_model is not None else model
            # Deep copy: ema_params must never alias params, both are donated
            # into the fused step (donating the same buffer twice is an error).
            self.ema_params = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), nn.parameters(src))
        else:
            self.ema_params = None

        self.rng = jax.random.PRNGKey(seed)
        # Training randomness is STATELESS per step: key(step) =
        # fold_in(train_base, step_count). A run resumed from a checkpointed
        # step_count therefore draws exactly the dropout/sampling noise the
        # uninterrupted run would have drawn — step-level exact resume — and
        # interleaved eval/predict calls (which consume the carried self.rng
        # stream) cannot shift the training stream.
        self._train_rng_base = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
        self.step_count = 0
        # Accumulation-cycle state: weighted gradients summed so far, plus
        # the micro-batch count and total item count of the open cycle.
        self._acc_grads = None
        self._micro_count = 0
        self._acc_items = 0
        # True when the last train_step call applied an optimiser update
        # (always true without accumulation); batch-level LR schedules step
        # only on applied steps.
        self.last_step_applied = True

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._predict_step = self._build_predict_step()
        if self.grad_accum_steps > 1:
            self._accum_step = self._build_accum_step()
            self._apply_step = self._build_apply_step()
        # Compiled chained-dispatch programs, keyed by chain shape signature
        # (see train_chain / eval_chain).
        self._chain_fns = {}
        self._eval_chain_fns = {}

    # -- step builders -------------------------------------------------------

    def _build_train_step(self):
        if self.shard_map_mesh is not None:
            from morgana_tpu.parallel.shard_map_step import build_shard_map_train_step
            return build_shard_map_train_step(
                self.model, self.optimizer, self.shard_map_mesh,
                ema_decay=self.ema_decay, log_norms=self.log_norms)

        model, optimizer, ema_decay = self.model, self.optimizer, self.ema_decay
        log_norms = self.log_norms

        def train_step(params, opt_state, ema_params, batch, lr, global_step, rng):
            batch = dict(batch, global_step=global_step)
            loss, staged, outputs, grads = staged_value_and_grad(
                model, params, batch, rng)
            params, opt_state, ema_params, updates = apply_updates(
                optimizer, ema_decay, params, opt_state, ema_params, grads, lr)
            if log_norms:
                staged = stage_norms(model.metrics, staged, grads, params,
                                     updates, lr)
            return params, opt_state, ema_params, loss, staged, outputs

        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    def _build_accum_step(self):
        """Micro-batch step of a gradient-accumulation cycle: computes loss,
        metrics and gradients and sums the item-count-weighted gradients into
        the (donated) accumulator — no parameter, optimiser or EMA update."""
        model = self.model

        def accum_step(params, acc_grads, batch, global_step, rng):
            # Per-item weighting: each micro-gradient is a mean over its
            # (static) item count n, so acc accumulates n * grad and the
            # apply step divides by the cycle's total item count.
            weight = float(batch_items(batch))
            batch = dict(batch, global_step=global_step)
            loss, staged, outputs, grads = staged_value_and_grad(
                model, params, batch, rng)
            # Weight in each leaf's own dtype: an f32 scalar would promote
            # non-f32 gradients, mismatching the donated accumulator's
            # dtype (donation silently defeated + a retrace).
            acc_grads = jax.tree_util.tree_map(
                lambda a, g: a + jnp.asarray(weight, g.dtype) * g,
                acc_grads, grads)
            return acc_grads, loss, staged, outputs

        return jax.jit(accum_step, donate_argnums=(1,))

    def _build_apply_step(self):
        """Final micro-batch of an accumulation cycle: adds this batch's
        item-count-weighted gradients to the accumulator, divides by the
        cycle's total item count (``inv_items``), and runs the optimiser +
        EMA update. Returns a zeroed accumulator for the next cycle
        (device-side, no host transfer)."""
        model, optimizer, ema_decay = self.model, self.optimizer, self.ema_decay
        log_norms = self.log_norms

        def apply_step(params, opt_state, ema_params, acc_grads, batch, lr,
                       inv_items, global_step, rng):
            weight = float(batch_items(batch))
            batch = dict(batch, global_step=global_step)
            loss, staged, outputs, grads = staged_value_and_grad(
                model, params, batch, rng)
            grads = jax.tree_util.tree_map(
                lambda a, g: (a + jnp.asarray(weight, g.dtype) * g)
                * jnp.asarray(inv_items, g.dtype), acc_grads, grads)
            params, opt_state, ema_params, updates = apply_updates(
                optimizer, ema_decay, params, opt_state, ema_params, grads, lr)
            if log_norms:
                # grads here is the cycle's full averaged gradient — the
                # quantity actually fed to the optimiser.
                staged = stage_norms(model.metrics, staged, grads, params,
                                     updates, lr)
            acc_grads = jax.tree_util.tree_map(jnp.zeros_like, grads)
            return params, opt_state, ema_params, acc_grads, loss, staged, outputs

        return jax.jit(apply_step, donate_argnums=(0, 1, 2, 3))

    def _build_chain_step(self, assemble, chain_len, batch_sharding):
        """Compiles ``chain_len`` consecutive fused train steps into ONE XLA
        program: a ``lax.scan`` whose body assembles the batch from the
        device-resident corpus arenas (``--device_cache``) and runs the
        forward + grad + optimiser + EMA tail. One host dispatch — and one
        tiny ``(chain_len, B)`` index upload — now covers N batches, so on
        dispatch-latency-bound deployments (a tunnelled/remote device, where
        each jitted call costs a network round trip) steady-state training
        overhead drops by ~N (BASELINE.md measured ~92 ms/batch of dispatch
        latency against a 17.5 ms step on the tunnel).

        Per-step semantics are unchanged: the same stateless per-step RNG
        (``fold_in(base, step_count)``), per-step learning rates, traced
        ``global_step``, metric partials staged per step (stacked over the
        scan axis), EMA every step. The reference has no analogue — its
        eager loop syncs the host every batch
        (``morgana/experiment_builder.py:464-484``)."""
        model, optimizer, ema_decay = self.model, self.optimizer, self.ema_decay
        log_norms = self.log_norms
        rng_base = self._train_rng_base

        def chain_step(params, opt_state, ema_params, arenas, stacked,
                       idx_mat, lrs, step0):
            def body(carry, xs):
                params, opt_state, ema_params = carry
                idxs, lr, offset = xs
                batch = assemble(idxs, arenas=arenas, stacked=stacked)
                if batch_sharding is not None:
                    # The per-batch cached path places batches via
                    # out_shardings; inside the scan the equivalent is a
                    # constraint so GSPMD keeps the batch data-parallel
                    # rather than replicating the gather on every device.
                    batch = {k: jax.lax.with_sharding_constraint(
                                 v, batch_sharding)
                             for k, v in batch.items()}
                step_count = step0 + offset
                rng = jax.random.fold_in(rng_base, step_count)
                batch = dict(batch, global_step=step_count)
                loss, staged, outputs, grads = staged_value_and_grad(
                    model, params, batch, rng)
                del outputs  # not scan-stacked; chained epochs skip analysis
                params, opt_state, ema_params, updates = apply_updates(
                    optimizer, ema_decay, params, opt_state, ema_params,
                    grads, lr)
                if log_norms:
                    staged = stage_norms(model.metrics, staged, grads, params,
                                         updates, lr)
                return (params, opt_state, ema_params), (loss, staged)

            offsets = jnp.arange(chain_len, dtype=jnp.int32)
            (params, opt_state, ema_params), (losses, staged) = jax.lax.scan(
                body, (params, opt_state, ema_params), (idx_mat, lrs, offsets))
            return params, opt_state, ema_params, losses, staged

        return jax.jit(chain_step, donate_argnums=(0, 1, 2))

    def _build_chain_accum_step(self, assemble, batch_sharding):
        """Chained dispatch WITH gradient accumulation: ``chain_len``
        consecutive micro-batch steps as one ``lax.scan``, where the
        optimiser/EMA update fires only on the steps the host-computed
        ``apply_flags`` mark (every Nth micro-batch, plus a forced epoch-end
        close). The gradient accumulator rides in the scan carry — and in
        the loop's ``_acc_grads`` between chain calls, so cycles may cross
        chain boundaries (and mix with singleton per-batch steps) with
        numerics identical to the unchained accumulation path: micro-
        gradients are item-count-weighted on accumulation and divided by the
        cycle's total item count (``inv_items``, host-computed per step) at
        apply, exactly as :meth:`_build_accum_step`/:meth:`_build_apply_step`
        do. ``lax.cond`` keeps the non-apply branch a pure pass-through so
        XLA compiles one program for any apply schedule (flags are traced
        inputs, not compile-time constants).

        With ``log_norms`` the three norm diagnostics are staged on EVERY
        micro-step (a scanned chain must stage a uniform key set), masked
        by the apply flag: a non-applied step contributes zero to both the
        sum and the count of each ``Mean`` accumulator, so the merged norms
        cover exactly the applied optimiser steps — the same numbers the
        unchained accumulation path reports."""
        model, optimizer, ema_decay = self.model, self.optimizer, self.ema_decay
        log_norms = self.log_norms
        rng_base = self._train_rng_base

        def chain_step(params, opt_state, ema_params, acc_grads, arenas,
                       stacked, idx_mat, lrs, apply_flags, inv_items_vec,
                       step0):
            def body(carry, xs):
                params, opt_state, ema_params, acc_grads = carry
                idxs, lr, apply_flag, inv_items, offset = xs
                batch = assemble(idxs, arenas=arenas, stacked=stacked)
                if batch_sharding is not None:
                    batch = {k: jax.lax.with_sharding_constraint(
                                 v, batch_sharding)
                             for k, v in batch.items()}
                step_count = step0 + offset
                rng = jax.random.fold_in(rng_base, step_count)
                weight = float(batch_items(batch))
                batch = dict(batch, global_step=step_count)
                loss, staged, outputs, grads = staged_value_and_grad(
                    model, params, batch, rng)
                del outputs  # not scan-stacked; chained epochs skip analysis
                acc_grads = jax.tree_util.tree_map(
                    lambda a, g: a + jnp.asarray(weight, g.dtype) * g,
                    acc_grads, grads)

                def do_apply(operand):
                    params, opt_state, ema_params, acc = operand
                    avg = jax.tree_util.tree_map(
                        lambda a: a * jnp.asarray(inv_items, a.dtype), acc)
                    params, opt_state, ema_params, updates = apply_updates(
                        optimizer, ema_decay, params, opt_state, ema_params,
                        avg, lr)
                    # Norms of the APPLIED quantities: the cycle-averaged
                    # gradient actually fed to the optimiser, the post-
                    # update parameters, and the effective step size.
                    norms = () if not log_norms else (
                        optax.global_norm(avg).astype(jnp.float32),
                        optax.global_norm(params).astype(jnp.float32),
                        (lr * optax.global_norm(updates)).astype(
                            jnp.float32))
                    acc = jax.tree_util.tree_map(jnp.zeros_like, acc)
                    return params, opt_state, ema_params, acc, norms

                def no_apply(operand):
                    params, opt_state, ema_params, acc = operand
                    zeros = (jnp.float32(0.),) * 3 if log_norms else ()
                    return params, opt_state, ema_params, acc, zeros

                (params, opt_state, ema_params, acc_grads,
                 norms) = jax.lax.cond(
                    apply_flag, do_apply, no_apply,
                    (params, opt_state, ema_params, acc_grads))
                if log_norms:
                    staged = stage_norm_values(
                        model.metrics, staged,
                        zip(('grad_norm', 'param_norm', 'update_norm'),
                            norms),
                        valid=apply_flag)
                return (params, opt_state, ema_params, acc_grads), (loss,
                                                                    staged)

            offsets = jnp.arange(idx_mat.shape[0], dtype=jnp.int32)
            carry, (losses, staged) = jax.lax.scan(
                body, (params, opt_state, ema_params, acc_grads),
                (idx_mat, lrs, apply_flags, inv_items_vec, offsets))
            params, opt_state, ema_params, acc_grads = carry
            return params, opt_state, ema_params, acc_grads, losses, staged

        return jax.jit(chain_step, donate_argnums=(0, 1, 2, 3))

    def chain_apply_schedule(self, chain_len, batch, force_apply_last=False):
        """The deterministic optimiser-apply schedule for the NEXT
        ``chain_len`` chained steps of ``batch`` items each, given the
        currently open accumulation cycle — WITHOUT mutating any state.
        Returns ``(apply_flags, inv_items)`` (lists of bool / float); with
        ``grad_accum_steps == 1`` every step applies. The builder uses this
        to advance batch-level LR schedules exactly on applied steps."""
        if self.grad_accum_steps <= 1:
            return [True] * chain_len, [1.0 / float(batch)] * chain_len
        flags, invs = [], []
        micro, items = self._micro_count, self._acc_items
        for i in range(chain_len):
            micro += 1
            items += batch
            apply = micro >= self.grad_accum_steps or \
                (force_apply_last and i == chain_len - 1)
            flags.append(bool(apply))
            invs.append(1.0 / float(items) if apply else 0.0)
            if apply:
                micro, items = 0, 0
        return flags, invs

    def train_chain(self, cache, idx_mat, lr_values, post=None,
                    batch_sharding=None, bucket=True, force_apply_last=False,
                    lengths=None):
        """Runs ``len(idx_mat)`` consecutive train steps as one compiled
        program over a :class:`~morgana_tpu.data.device_cache.DeviceCorpusCache`
        (``--steps_per_dispatch``). All rows of ``idx_mat`` must share one
        batch-shape signature (the builder groups consecutive equal-signature
        batches; ``cache.batch_signature``). Returns ``(losses, staged)``
        where ``losses`` is the per-step ``(chain_len,)`` loss vector and
        ``staged`` the per-step-stacked metric partials for
        ``Handler.apply_staged(..., steps=chain_len)``.

        With ``grad_accum_steps=N > 1`` the chain runs micro-batch steps and
        applies the optimiser every Nth one (and on the last step when
        ``force_apply_last``, closing the cycle at epoch end); open cycles
        carry across chain calls and singleton :meth:`train_step` calls via
        the shared accumulator, so the trajectory is identical to the
        unchained accumulation path."""
        if self.shard_map_mesh is not None:
            raise ValueError('train_chain requires the default GSPMD step')
        accum = self.grad_accum_steps > 1
        idx_mat = np.asarray(idx_mat, np.int32)
        chain_len, batch = idx_mat.shape
        multihost = getattr(cache, 'multihost', False)
        if lengths is None:
            lengths = cache.padded_lengths(idx_mat.reshape(-1), bucket=bucket)
            if multihost:
                lengths = cache.harmonise_lengths([lengths])[0]
        if multihost:
            # idx_mat is this process's local slice: the assembled batches
            # (and therefore item accounting for accumulation) are GLOBAL,
            # and the shard_map assemble already emits the sharded layout.
            batch *= jax.process_count()
            batch_sharding = None
            idx_arg = cache.global_indices(idx_mat)
        else:
            idx_arg = idx_mat
        if batch_sharding is not None and not cache.can_shard(batch):
            batch_sharding = None
        sig = (chain_len, batch, post is not None,
               batch_sharding is not None, accum,
               tuple(sorted(lengths.items())))
        fn = self._chain_fns.get(sig)
        if fn is None:
            body = cache.scan_assemble(lengths, post=post)
            if accum:
                fn = self._build_chain_accum_step(body, batch_sharding)
            else:
                fn = self._build_chain_step(body, chain_len, batch_sharding)
            self._chain_fns[sig] = fn
        arenas, stacked = cache.device_buffers()
        if accum:
            flags, invs = self.chain_apply_schedule(
                chain_len, batch, force_apply_last=force_apply_last)
            if self._acc_grads is None:
                # zeros_like preserves each leaf's sharding under dp/tp.
                self._acc_grads = jax.tree_util.tree_map(
                    jnp.zeros_like, self.params)
            (self.params, self.opt_state, self.ema_params, self._acc_grads,
             losses, staged) = fn(
                self.params, self.opt_state, self.ema_params,
                self._acc_grads, arenas, stacked, idx_arg,
                jnp.asarray(lr_values, jnp.float32),
                jnp.asarray(flags, jnp.bool_),
                jnp.asarray(invs, jnp.float32),
                jnp.asarray(self.step_count, jnp.int32))
            # Mirror the device-side cycle state on the host (deterministic:
            # same simulation chain_apply_schedule ran).
            for applied in flags:
                if applied:
                    self._micro_count, self._acc_items = 0, 0
                else:
                    self._micro_count += 1
                    self._acc_items += batch
            self.last_step_applied = flags[-1]
        else:
            (self.params, self.opt_state, self.ema_params, losses,
             staged) = fn(
                self.params, self.opt_state, self.ema_params, arenas,
                stacked, idx_arg, jnp.asarray(lr_values, jnp.float32),
                jnp.asarray(self.step_count, jnp.int32))
            self.last_step_applied = True
        self.step_count += chain_len
        return losses, staged

    def _build_eval_chain(self, assemble, batch_sharding):
        """Compiles ``chain_len`` consecutive eval steps (jitted forward, no
        grads) into ONE program — the validation-epoch analogue of
        :meth:`_build_chain_step`. The per-batch RNG keys come in as a scan
        input so the chained epoch consumes exactly the key sequence the
        per-batch loop's ``_next_rng`` stream would have drawn (stochastic
        eval elements, e.g. VAE latent sampling, stay bit-identical)."""
        model = self.model

        def chain_eval(params, arenas, stacked, idx_mat, global_step, rngs):
            def body(carry, xs):
                idxs, rng = xs
                batch = assemble(idxs, arenas=arenas, stacked=stacked)
                if batch_sharding is not None:
                    batch = {k: jax.lax.with_sharding_constraint(
                                 v, batch_sharding)
                             for k, v in batch.items()}
                # global_step rides along for step-scheduled losses (e.g.
                # VAE KL annealing), fixed at the current train step for the
                # whole epoch exactly like the per-batch eval path.
                batch = dict(batch, global_step=global_step)
                with nn.bind(model, params, rng=rng, train=False):
                    model.metrics.begin_staging('eval')
                    loss, outputs = model(batch)
                    staged = model.metrics.drain_staged_values()
                del outputs  # not scan-stacked; chained epochs skip analysis
                return carry, (loss, staged)

            _, (losses, staged) = jax.lax.scan(body, (), (idx_mat, rngs))
            return losses, staged

        return jax.jit(chain_eval)

    def eval_chain(self, cache, idx_mat, post=None, batch_sharding=None,
                   bucket=True, use_ema=False, lengths=None):
        """Runs ``len(idx_mat)`` consecutive eval steps as one compiled
        program over a device-resident corpus (``--steps_per_dispatch`` on
        validation epochs). Same grouping contract as :meth:`train_chain`;
        returns ``(losses, staged)`` with per-step-stacked staged partials
        for ``Handler.apply_staged(..., steps=chain_len)``."""
        idx_mat = np.asarray(idx_mat, np.int32)
        chain_len, batch = idx_mat.shape
        multihost = getattr(cache, 'multihost', False)
        if lengths is None:
            lengths = cache.padded_lengths(idx_mat.reshape(-1), bucket=bucket)
            if multihost:
                lengths = cache.harmonise_lengths([lengths])[0]
        if multihost:
            batch *= jax.process_count()
            batch_sharding = None
            idx_arg = cache.global_indices(idx_mat)
        else:
            idx_arg = idx_mat
        if batch_sharding is not None and not cache.can_shard(batch):
            batch_sharding = None
        sig = (chain_len, batch, post is not None,
               batch_sharding is not None, tuple(sorted(lengths.items())))
        fn = self._eval_chain_fns.get(sig)
        if fn is None:
            body = cache.scan_assemble(lengths, post=post)
            fn = self._eval_chain_fns[sig] = self._build_eval_chain(
                body, batch_sharding)
        params = self._resolve_params(use_ema)
        # Draw the chain's keys from the carried stream IN ORDER, so a
        # chained epoch and a per-batch epoch consume identical keys.
        rngs = jnp.stack([self._next_rng() for _ in range(chain_len)])
        arenas, stacked = cache.device_buffers()
        return fn(params, arenas, stacked, idx_arg,
                  jnp.asarray(self.step_count, jnp.int32), rngs)

    def _build_eval_step(self):
        model = self.model

        def eval_step(params, batch, global_step, rng):
            # global_step rides along for step-scheduled losses (e.g. VAE KL
            # annealing): validation must weight the loss exactly as the
            # current training step does, not at the fully-annealed value.
            batch = dict(batch, global_step=global_step)
            with nn.bind(model, params, rng=rng, train=False):
                model.metrics.begin_staging('eval')
                loss, outputs = model(batch)
                staged = model.metrics.drain_staged_values()
            return loss, staged, outputs

        return jax.jit(eval_step)

    def _build_predict_step(self):
        model = self.model

        def predict_step(params, batch, rng):
            with nn.bind(model, params, rng=rng, train=False):
                model.metrics.begin_staging('predict')
                outputs = model.predict(batch)
                staged = model.metrics.drain_staged_values()
            return staged, outputs

        return jax.jit(predict_step)

    def _next_rng(self):
        self.rng, key = jax.random.split(self.rng)
        return key

    def _train_rng(self):
        """The (stateless) training key for the CURRENT step_count."""
        return jax.random.fold_in(self._train_rng_base, self.step_count)

    # -- public steps ---------------------------------------------------------

    def train_step(self, features, lr, force_apply=False):
        """One fused training step. Returns (loss, staged, outputs) as
        device values (no host sync).

        With ``grad_accum_steps=N > 1`` only every Nth call applies the
        optimiser/EMA update (averaging the summed micro-batch gradients);
        ``force_apply=True`` closes a cycle early (e.g. at the last batch of
        an epoch), averaging over however many micro-batches accumulated.
        ``self.last_step_applied`` reports which kind this call was.
        """
        batch = numeric_features(features)
        # Traced global-step scalar (passed outside the batch-sharded dict —
        # it is replicated): models can schedule (e.g. KL annealing) without
        # retracing — `self.step` on the model is a trace-time python int and
        # must not be used inside jitted code. int32 (not f32): past 2^24
        # steps consecutive f32 values collide and step schedules would
        # stall; arithmetic like `global_step / anneal_steps` promotes to
        # float inside the model as needed.
        global_step = jnp.asarray(self.step_count, jnp.int32)
        if self.grad_accum_steps > 1:
            if self._acc_grads is None:
                # zeros_like preserves each leaf's sharding under dp/tp.
                self._acc_grads = jax.tree_util.tree_map(
                    jnp.zeros_like, self.params)
            if self._micro_count + 1 < self.grad_accum_steps and not force_apply:
                self._acc_grads, loss, staged, outputs = self._accum_step(
                    self.params, self._acc_grads, batch, global_step,
                    self._train_rng())
                self._micro_count += 1
                self._acc_items += batch_items(batch)
                self.last_step_applied = False
            else:
                # Divide by the cycle's total ITEM count (not micro-batch
                # count): micro-gradients were weighted by their item counts,
                # so unequal-size batches (e.g. an epoch-final remainder)
                # still contribute per-sample, matching one big-batch step.
                inv_items = jnp.float32(
                    1.0 / (self._acc_items + batch_items(batch)))
                (self.params, self.opt_state, self.ema_params, self._acc_grads,
                 loss, staged, outputs) = self._apply_step(
                    self.params, self.opt_state, self.ema_params,
                    self._acc_grads, batch, jnp.asarray(lr, jnp.float32),
                    inv_items, global_step, self._train_rng())
                self._micro_count = 0
                self._acc_items = 0
                self.last_step_applied = True
        else:
            (self.params, self.opt_state, self.ema_params,
             loss, staged, outputs) = self._train_step(
                self.params, self.opt_state, self.ema_params, batch,
                jnp.asarray(lr, jnp.float32), global_step, self._train_rng())
            self.last_step_applied = True
        self.step_count += 1
        return loss, staged, outputs

    def _resolve_params(self, use_ema):
        if use_ema:
            if self.ema_params is None:
                # Falling back silently would report raw-parameter metrics
                # as EMA numbers.
                raise ValueError('use_ema=True but this loop tracks no EMA '
                                 'parameters (construct with ema_decay > 0)')
            return self.ema_params
        return self.params

    def eval_step(self, features, use_ema=False):
        batch = numeric_features(features)
        params = self._resolve_params(use_ema)
        global_step = jnp.asarray(self.step_count, jnp.int32)
        return self._eval_step(params, batch, global_step, self._next_rng())

    def predict_step(self, features, use_ema=False):
        batch = numeric_features(features)
        params = self._resolve_params(use_ema)
        return self._predict_step(params, batch, self._next_rng())

    # -- state sync ------------------------------------------------------------

    def sync_model(self):
        """Copies the loop's current parameters back into the model object."""
        nn.load_parameters(self.model, self.params)

    def sync_ema_model(self):
        if self.ema_model is not None and self.ema_params is not None:
            nn.load_parameters(self.ema_model, self.ema_params)
