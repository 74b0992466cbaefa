"""Streaming (online) metrics.

Reference-parity surface of ``morgana/metrics.py`` with one structural change
for TPU: metrics are split into a jit-safe **partials** computation (pure
device math returning fixed-shape partial statistics, e.g. masked sum +
count) and a host-side **merge** into the stateful accumulator.

Inside the fused train step, ``Handler.accumulate`` runs in *staging* mode:
the partials (tracers) are recorded and returned as step outputs; the builder
merges the concrete device values afterwards. Outside jit,
``accumulate`` == ``merge(partials(...))`` — the same user call-sites
(``self.metrics.accumulate(self.mode, LF0_RMSE_Hz=(...))``,
``models/RNN_SPSS.py:124-129``) work identically in both worlds.

Merged sums are kept as lazy device scalars (async adds, no per-batch host
sync); ``result()`` is the only synchronisation point.
"""
from collections.abc import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from morgana_tpu import utils
from morgana_tpu.ops.masking import sequence_mask, batched_masked_select

__all__ = [
    'StatefulMetric', 'Handler', 'Print', 'History', 'TensorHistory', 'Mean',
    'Variance', 'StandardDeviation', 'RMSE', 'Accuracy', 'Error', 'MAE',
    'F0Distortion', 'LF0Distortion', 'Distortion', 'MelCepDistortion',
]


def _to_python(value):
    if isinstance(value, (np.ndarray, jax.Array)):
        return np.asarray(value).tolist()
    if isinstance(value, (np.floating, np.integer)):
        return value.item()
    return value


class StatefulMetric(object):
    r"""Abstract online metric: ``reset_state`` / ``accumulate`` / ``result``.

    Subclasses implement :meth:`partials` (jit-safe device math) and
    :meth:`merge` (host-state update); ``accumulate`` composes the two.
    """

    def __init__(self, hidden=False):
        self._hidden = hidden
        self.hidden = True

    def reset_state(self, *args):
        self.hidden = True

    def partials(self, *args, **kwargs):
        raise NotImplementedError

    def merge(self, partials):
        raise NotImplementedError

    def accumulate(self, *args, **kwargs):
        self.hidden = self._hidden
        self.merge(self.partials(*args, **kwargs))

    def result(self, *args):
        raise NotImplementedError

    def result_as_json(self, *args):
        return _to_python(self.result(*args))

    def __str__(self):
        return utils.format_float_tensor(self.result())


class Handler(StatefulMetric):
    r"""Container running named collections of metrics
    (``all``/``train``/``valid``/``test``), see ``morgana/metrics.py:52-185``."""

    def __init__(self, **metrics):
        super().__init__(hidden=False)
        self.collections = {'all': metrics, 'train': {}, 'valid': {}, 'test': {}}
        self.metrics = self.collections['all']
        self.add_metrics(('train', 'valid'), **metrics)

        self._staging = False
        self._staging_tag = 'default'
        self._staged_keys = []
        self._staged_vals = []
        # (collection, name) key lists captured at trace time, per step tag —
        # separate tags keep interleaved traces of different compiled step
        # functions (train/eval/predict) from clobbering each other's keys.
        self._keys_by_tag = {}
        # Staged batches awaiting their host merge: [(keys, device pytree)].
        # apply_staged only STASHES; flush_staged does one bulk device_get.
        self._pending = []
        self._flushing = False

    def __getitem__(self, name):
        if name in self.collections:
            # Public access point: anyone grabbing a collection is about to
            # READ metric state, so pending staged batches merge first
            # (internal hot paths index self.collections directly).
            self.flush_staged()
            return self.collections[name]
        raise ValueError(f'No collection found by the name {name}')

    def add_metrics(self, collections=('all',), **kwargs):
        if not isinstance(collections, Iterable) or isinstance(collections, str):
            collections = [collections]
        if 'all' in collections:
            collections = list(self.collections.keys())
        for collection_name in collections:
            self.collections[collection_name].update(kwargs)
        self.metrics.update(kwargs)

    def add_collection(self, collection, from_collections=tuple()):
        if not isinstance(from_collections, Iterable) or isinstance(from_collections, str):
            from_collections = [from_collections]
        self.collections[collection] = {}
        for from_collection in from_collections:
            self[collection].update(self[from_collection])

    def reset_state(self, collection, *args):
        # Pending batches belong to the PREVIOUS read window: merge them
        # before the reset so nothing re-surfaces in the fresh epoch.
        self.flush_staged()
        for metric in self[collection].values():
            metric.reset_state()

    # -- jit staging --------------------------------------------------------

    def begin_staging(self, tag='default'):
        self._staging = True
        self._staging_tag = tag
        self._staged_keys = []
        self._staged_vals = []

    def drain_staged_values(self):
        """Returns the staged partials as a dict keyed by
        ``'NNN|collection|name'`` for use as jit outputs, and exits staging
        mode. The STATIC dict keys travel through jit with each executable,
        so every value arrives at :meth:`apply_staged` carrying its own
        identity — two executables of one step that stage different metric
        sequences under the same tag (conditional accumulation on a static
        batch property) cannot mispair values. (A bare value list paired
        with a per-tag key registry recorded only the LAST trace's
        sequence; equal-length but differently-keyed sequences would have
        zip-merged into the wrong accumulators.) The index prefix keeps
        repeat accumulations of one metric distinct and order stable under
        pytree key sorting."""
        self._staging = False
        self._keys_by_tag[self._staging_tag] = list(self._staged_keys)
        vals = {f'{i:04d}|{collection}|{name}': val
                for i, ((collection, name), val)
                in enumerate(zip(self._staged_keys, self._staged_vals))}
        self._staged_vals = []
        return vals

    def apply_staged(self, values, tag='default', steps=None):
        """Records one step's staged partials for merging. Values come as
        the keyed dict :meth:`drain_staged_values` builds (identity rides in
        the keys); a bare list (legacy form) is paired with the tag's
        recorded key sequence instead.

        ``steps=N`` marks a CHAINED batch (``--steps_per_dispatch``): every
        value leaf is stacked over a leading axis of N per-step partials
        (the ``lax.scan`` output layout). The flush merges the rows in step
        order on host — numerically identical to N separate ``apply_staged``
        calls, with zero extra device dispatches.

        The merge itself is LAZY: values are stashed as device arrays and
        merged by :meth:`flush_staged` (one bulk ``jax.device_get``) the
        next time any result is read. Per-metric eager merges each forced a
        tiny device->host readback every batch — on a tunnelled device a
        full network round trip per metric per step, which dominated
        end-to-end training once batch uploads were eliminated
        (``--device_cache``). Reads (results/str/reset) flush first, so the
        observable accumulator semantics are unchanged; the sync cadence is
        now set by how often results are READ (``--log_interval``), not by
        the batch rate."""
        if isinstance(values, dict):
            keys = []
            vals = []
            for key in sorted(values):
                _, collection, name = key.split('|', 2)
                keys.append((collection, name))
                vals.append(values[key])
            self._pending.append((keys, vals, steps))
            return
        if steps is not None:
            raise ValueError('steps= (chained partials) requires the keyed '
                             'dict form from drain_staged_values')
        keys = self._keys_by_tag.get(tag, [])
        if len(keys) != len(values):
            # The legacy list form has no per-value identity; the key list
            # records the LAST trace's sequence, so a length mismatch means
            # another executable is feeding this tag — zip would silently
            # mispair values into the wrong accumulators. (Validated NOW,
            # against the tag state at apply time, not at flush.)
            raise ValueError(
                f"staged-metric mismatch for tag {tag!r}: {len(values)} "
                f"values vs {len(keys)} recorded keys. Accumulate the same "
                f"metrics on every trace of a step (use zero-valued inputs "
                f"instead of skipping the call).")
        self._pending.append((list(keys), list(values), None))

    @staticmethod
    def _to_host(tree):
        """Fetches every jax array in ``tree`` with one batched async
        round (all copies issued before any wait); host objects (numpy,
        strings, python scalars) pass through untouched."""
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        for leaf in leaves:
            if isinstance(leaf, jax.Array):
                leaf.copy_to_host_async()
        out = [np.asarray(leaf) if isinstance(leaf, jax.Array) else leaf
               for leaf in leaves]
        return jax.tree_util.tree_unflatten(treedef, out)

    def flush_staged(self):
        """Merges every pending batch into its accumulators with ONE bulk
        host transfer. Idempotent; called automatically by every read path
        (result/results_as_*/__str__/reset_state)."""
        if not self._pending or self._flushing:
            return
        self._flushing = True
        try:
            pending, self._pending = self._pending, []
            all_vals = self._to_host([vals for _, vals, _ in pending])
            for (keys, _, steps), vals in zip(pending, all_vals):
                if steps is None:
                    rows = [vals]
                else:
                    # Chained batch: each value leaf is stacked over a
                    # leading per-step axis; merge the rows in step order
                    # (identical to per-step applies).
                    rows = [jax.tree_util.tree_map(lambda x, j=j: x[j], vals)
                            for j in range(steps)]
                for row in rows:
                    for (collection, name), val in zip(keys, row):
                        metric = self.collections[collection][name]
                        metric.hidden = metric._hidden
                        metric.merge(val)
        finally:
            self._flushing = False

    # -- accumulate ----------------------------------------------------------

    def accumulate(self, collection, **kwargs):
        for metric_name, inputs in kwargs.items():
            inputs = utils.listify(inputs)
            if isinstance(inputs[-1], dict):
                inputs, kwinputs = inputs[:-1], inputs[-1]
            else:
                kwinputs = dict()

            metric = self.collections[collection][metric_name]
            if self._staging:
                self._staged_keys.append((collection, metric_name))
                self._staged_vals.append(metric.partials(*inputs, **kwinputs))
            else:
                # Host-path accumulation is LAZY too (the epoch loop feeds
                # device scalars like batch_loss every step): partials are
                # computed now, the merge's host readback joins the next
                # flush_staged bulk transfer.
                metric.hidden = metric._hidden
                self._pending.append(
                    ([(collection, metric_name)],
                     [metric.partials(*inputs, **kwinputs)], None))

    def result(self, collection='all', *args):
        self.flush_staged()
        return {name: metric.result(*args) for name, metric in self[collection].items()}

    def results_as_json_dict(self, collection='all', prefix=''):
        self.flush_staged()
        return {prefix + name: metric.result_as_json()
                for name, metric in self[collection].items() if not metric.hidden}

    def results_as_str_dict(self, collection='all', prefix=''):
        self.flush_staged()
        return {prefix + name: str(metric)
                for name, metric in self[collection].items() if not metric.hidden}

    def __str__(self):
        d = self.results_as_str_dict('all')
        return ' | '.join(f'{name} = {value}' for name, value in d.items())


class Print(StatefulMetric):
    r"""Reports the most recent accumulated value."""

    def __init__(self, hidden=False):
        super().__init__(hidden=hidden)
        self.reset_state()

    def reset_state(self, *args):
        StatefulMetric.reset_state(self)
        self.value = None

    def partials(self, tensor):
        return tensor

    def merge(self, partials):
        self.value = partials

    def result(self, *args):
        return self.value


class History(StatefulMetric):
    r"""Stores the history of any object (list semantics)."""

    def __init__(self, max_len=None, hidden=False):
        super().__init__(hidden=hidden)
        self.max_len = max_len
        self.reset_state()

    def reset_state(self, *args):
        StatefulMetric.reset_state(self)
        self.history = []

    def partials(self, obj):
        return obj

    def merge(self, obj):
        if isinstance(obj, (np.ndarray, jax.Array)):
            # atleast_1d: a 0-d array (scalar staged through jit) is not
            # iterable and would crash list().
            obj = list(np.atleast_1d(np.asarray(obj)))
        elif not isinstance(obj, (list, tuple)):
            obj = [obj]
        self.history.extend(obj)
        if self.max_len is not None:
            self.history = self.history[-self.max_len:]

    def result(self):
        return self.history

    def str_summary(self, result):
        return str(result[-1])

    def result_as_json(self):
        return str(self)

    def __str__(self):
        return self.str_summary(self.result())


class TensorHistory(StatefulMetric):
    r"""Stores the history of a tensor; padded frames removed with ``seq_len``."""

    def __init__(self, feat_dim, max_len=None, dtype=np.float32, hidden=False):
        super().__init__(hidden=hidden)
        self.feat_dim = feat_dim
        self.max_len = max_len
        self.dtype = dtype
        self.reset_state()

    def reset_state(self, *args):
        StatefulMetric.reset_state(self)
        shape = (0,) if self.feat_dim == 0 else (0, self.feat_dim)
        self.history = np.empty(shape, dtype=self.dtype)

    def partials(self, tensor, seq_len=None):
        return {'tensor': tensor, 'seq_len': seq_len}

    def merge(self, partials):
        tensor = np.asarray(partials['tensor'])
        seq_len = partials.get('seq_len')
        if seq_len is None:
            tensor = tensor.reshape(-1, self.feat_dim) if self.feat_dim else tensor.reshape(-1)
        else:
            tensor = batched_masked_select(tensor, np.asarray(seq_len))
            if self.feat_dim == 0:
                tensor = tensor.reshape(-1)
        self.history = np.concatenate([self.history, tensor.astype(self.dtype)])
        if self.max_len is not None:
            self.history = self.history[-self.max_len:]

    def result(self):
        return self.history

    def str_summary(self, result):
        mean, std = float(np.mean(result)), float(np.std(result))
        if np.isnan(std):
            std = 0.0
        return 'N({mean}, {std}) in range [{min}, {max}]'.format(
            mean=utils.format_float_tensor(mean), std=utils.format_float_tensor(std),
            min=utils.format_float_tensor(np.min(result)),
            max=utils.format_float_tensor(np.max(result)))

    def result_as_json(self):
        result = self.result()
        if result.size == 1:
            return float(result.reshape(-1)[0])
        return self.str_summary(result)

    def __str__(self):
        result = self.result()
        if result.size == 1:
            return utils.format_float_tensor(float(result.reshape(-1)[0]))
        return self.str_summary(result)


class Mean(StatefulMetric):
    r"""Online mean of (optionally masked) values."""

    def __init__(self, hidden=False):
        super().__init__(hidden=hidden)
        self.reset_state()

    def reset_state(self, *args):
        StatefulMetric.reset_state(self)
        self.sum = 0.
        self.count = 0.

    def partials(self, tensor, seq_len=None):
        tensor = jnp.asarray(tensor)
        if seq_len is None:
            return {'sum': jnp.sum(tensor), 'count': jnp.asarray(float(tensor.size))}
        # Masked count is in *frames*, matching the reference accumulators
        # (``morgana/metrics.py:391-394``).
        mask = sequence_mask(seq_len, max_len=tensor.shape[1], dtype=tensor.dtype)
        return {'sum': jnp.sum(tensor * mask), 'count': jnp.sum(mask)}

    def merge(self, partials):
        # Host-side accumulation in exact Python floats: the partials
        # arrive in the compute dtype (bf16 under the recommended
        # compute_dtype='bfloat16'), whose ulp exceeds a batch's frame
        # count past ~2^15 frames — accumulating IN that dtype would make
        # the running sum/count silently stop increasing mid-epoch. The
        # reference kept exact Python floats via .item() the same way.
        self.sum = self.sum + float(np.asarray(partials['sum'], np.float64))
        self.count = self.count + float(np.asarray(partials['count'],
                                                   np.float64))

    def result(self, *args):
        return float(self.sum) / (float(self.count) + 1e-8)


class Variance(StatefulMetric):
    r"""Online variance of (optionally masked) values."""

    def __init__(self, hidden=False):
        super().__init__(hidden=hidden)
        self.reset_state()

    def reset_state(self, *args):
        StatefulMetric.reset_state(self)
        self.sum = 0.
        self.sum_square = 0.
        self.count = 0.

    def partials(self, tensor, seq_len=None):
        tensor = jnp.asarray(tensor)
        if seq_len is None:
            return {'sum': jnp.sum(tensor), 'sum_square': jnp.sum(tensor ** 2),
                    'count': jnp.asarray(float(tensor.size))}
        mask = sequence_mask(seq_len, max_len=tensor.shape[1], dtype=tensor.dtype)
        masked = tensor * mask
        return {'sum': jnp.sum(masked), 'sum_square': jnp.sum(masked ** 2),
                'count': jnp.sum(mask)}

    def merge(self, partials):
        # Exact host floats — see Mean.merge (bf16 running totals saturate).
        self.sum = self.sum + float(np.asarray(partials['sum'], np.float64))
        self.sum_square = self.sum_square + float(
            np.asarray(partials['sum_square'], np.float64))
        self.count = self.count + float(np.asarray(partials['count'],
                                                   np.float64))

    def result(self, *args):
        count = float(self.count) + 1e-8
        return (float(self.sum_square) - (float(self.sum) ** 2) / count) / count


class StandardDeviation(Variance):
    def result(self, *args):
        # Clamp: fp cancellation can drive the online variance a hair
        # negative, and Python's ** 0.5 on a negative float returns a
        # COMPLEX number, crashing printing/JSON export.
        return max(0.0, super().result(*args)) ** 0.5


class RMSE(Mean):
    r"""Online root-mean-squared-error between targets and predictions."""

    def partials(self, target, pred, seq_len=None):
        square_diff = (jnp.asarray(target) - jnp.asarray(pred)) ** 2
        return Mean.partials(self, square_diff, seq_len)

    def result(self, *args):
        return (float(self.sum) / (float(self.count) + 1e-8)) ** 0.5


class Accuracy(Mean):
    r"""Online accuracy (%) of boolean targets/predictions."""

    def partials(self, target, pred, seq_len=None):
        acc = jnp.logical_and(jnp.asarray(target).astype(bool),
                              jnp.asarray(pred).astype(bool)).astype(jnp.float32)
        return Mean.partials(self, acc, seq_len)

    def result(self, *args):
        return Mean.result(self, *args) * 100.


class Error(Mean):
    r"""Online error rate (%) of boolean targets/predictions."""

    def partials(self, target, pred, seq_len=None):
        err = jnp.logical_xor(jnp.asarray(target).astype(bool),
                              jnp.asarray(pred).astype(bool)).astype(jnp.float32)
        return Mean.partials(self, err, seq_len)

    def result(self, *args):
        return Mean.result(self, *args) * 100.


class MAE(Mean):
    r"""Online mean-absolute-error."""

    def partials(self, target, pred, seq_len=None):
        abs_diff = jnp.abs(jnp.asarray(target) - jnp.asarray(pred))
        return Mean.partials(self, abs_diff, seq_len)


class F0Distortion(RMSE):
    r"""F0 RMSE in Hz over frames voiced in both target and prediction."""

    def partials(self, f0_target, f0_pred, is_voiced, seq_len=None):
        f0_target = jnp.asarray(f0_target)
        mask = jnp.asarray(is_voiced).astype(f0_target.dtype)
        if seq_len is not None:
            mask = mask * sequence_mask(seq_len, max_len=f0_target.shape[1], dtype=f0_target.dtype)
        square_diff = (f0_target - jnp.asarray(f0_pred)) ** 2
        return {'sum': jnp.sum(square_diff * mask), 'count': jnp.sum(mask)}


class LF0Distortion(F0Distortion):
    r"""F0 RMSE in Hz computed from log-F0 inputs."""

    def partials(self, lf0_target, lf0_pred, is_voiced, seq_len=None):
        return F0Distortion.partials(
            self, jnp.exp(jnp.asarray(lf0_target)), jnp.exp(jnp.asarray(lf0_pred)),
            is_voiced, seq_len)


class Distortion(Mean):
    r"""Spectral distortion in dB (per-frame L2 over the feature dim)."""

    log_spec_dB_const = 10. / np.log(10.) * np.sqrt(2.)

    def partials(self, target, pred, seq_len=None):
        square_diff = (jnp.asarray(target) - jnp.asarray(pred)) ** 2
        root_square_diff = jnp.sqrt(jnp.sum(square_diff, keepdims=True, axis=-1))
        return Mean.partials(self, root_square_diff, seq_len)

    def result(self, *args):
        return Mean.result(self, *args) * self.log_spec_dB_const


class MelCepDistortion(RMSE):
    r"""Mel-cepstral distortion excluding C0."""

    def partials(self, target, pred, seq_len=None):
        return RMSE.partials(
            self, jnp.asarray(target)[..., 1:], jnp.asarray(pred)[..., 1:], seq_len=seq_len)
