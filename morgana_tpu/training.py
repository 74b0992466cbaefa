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

__all__ = ['build_optimizer', 'TrainLoop', 'numeric_features', 'host_features']


def build_optimizer(weight_decay=0., b1=0.9, b2=0.999, eps=1e-8,
                    grad_clip_norm=0.):
    r"""Adam with L2 regularisation added to the gradient — torch
    ``Adam(weight_decay=...)`` semantics (``morgana/experiment_builder.py:516``),
    not AdamW. The learning rate is applied separately inside the step (as a
    traced scalar) so LR schedules never retrace. ``grad_clip_norm`` > 0
    clips the global gradient norm before the Adam transform (the classic
    guard against recurrent-net gradient explosions)."""
    transforms = []
    if grad_clip_norm:
        transforms.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay:
        transforms.append(optax.add_decayed_weights(weight_decay))
    transforms.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    return optax.chain(*transforms)


def numeric_features(features):
    """The jit-able subset of a batch (numeric arrays only)."""
    out = {}
    for key, value in features.items():
        if isinstance(value, (np.ndarray, jax.Array)) and \
                np.issubdtype(np.asarray(value).dtype if isinstance(value, np.ndarray) else value.dtype, np.number):
            out[key] = value
        elif isinstance(value, (np.ndarray, jax.Array)):
            if value.dtype == np.bool_:
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
                 ema_model=None, shard_map_mesh=None):
        self.model = model
        self.optimizer = optimizer
        self.ema_decay = float(ema_decay)
        self.ema_model = ema_model
        # When set, the train step uses the explicit-collective shard_map
        # formulation over this mesh instead of relying on GSPMD.
        self.shard_map_mesh = shard_map_mesh

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
        self.step_count = 0

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._predict_step = self._build_predict_step()

    # -- step builders -------------------------------------------------------

    def _build_train_step(self):
        if self.shard_map_mesh is not None:
            from morgana_tpu.parallel.shard_map_step import build_shard_map_train_step
            return build_shard_map_train_step(
                self.model, self.optimizer, self.shard_map_mesh,
                ema_decay=self.ema_decay)

        model, optimizer, ema_decay = self.model, self.optimizer, self.ema_decay

        def train_step(params, opt_state, ema_params, batch, lr, global_step, rng):
            batch = dict(batch, global_step=global_step)

            def loss_fn(p):
                with nn.bind(model, p, rng=rng, train=True):
                    model.metrics.begin_staging('train')
                    loss, outputs = model(batch)
                    staged = model.metrics.drain_staged_values()
                return loss, (outputs, staged)

            (loss, (outputs, staged)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(params)

            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)

            if ema_decay:
                ema_params = nn.ema_update(ema_params, params, ema_decay)

            return params, opt_state, ema_params, loss, staged, outputs

        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    def _build_eval_step(self):
        model = self.model

        def eval_step(params, batch, rng):
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

    # -- public steps ---------------------------------------------------------

    def train_step(self, features, lr):
        """One fused optimisation step. Returns (loss, staged, outputs) as
        device values (no host sync)."""
        batch = numeric_features(features)
        # Traced global-step scalar (passed outside the batch-sharded dict —
        # it is replicated): models can schedule (e.g. KL annealing) without
        # retracing — `self.step` on the model is a trace-time python int and
        # must not be used inside jitted code.
        (self.params, self.opt_state, self.ema_params,
         loss, staged, outputs) = self._train_step(
            self.params, self.opt_state, self.ema_params, batch,
            jnp.asarray(lr, jnp.float32),
            jnp.asarray(self.step_count, jnp.float32), self._next_rng())
        self.step_count += 1
        return loss, staged, outputs

    def eval_step(self, features, use_ema=False):
        batch = numeric_features(features)
        params = self.ema_params if (use_ema and self.ema_params is not None) else self.params
        return self._eval_step(params, batch, self._next_rng())

    def predict_step(self, features, use_ema=False):
        batch = numeric_features(features)
        params = self.ema_params if (use_ema and self.ema_params is not None) else self.params
        return self._predict_step(params, batch, self._next_rng())

    # -- state sync ------------------------------------------------------------

    def sync_model(self):
        """Copies the loop's current parameters back into the model object."""
        nn.load_parameters(self.model, self.params)

    def sync_ema_model(self):
        if self.ema_model is not None and self.ema_params is not None:
            nn.load_parameters(self.ema_model, self.ema_params)
