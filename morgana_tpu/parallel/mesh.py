"""Device meshes and sharding layouts.

The canonical layout for this framework's workloads (frame-level acoustic
models, <= tens of M params):

* batch dim sharded over ``'data'`` (pure DP — gradients psum over ICI),
* optionally the hidden dim of large kernels sharded over ``'model'`` (TP).

Because parameters are replicated in DP, the fused train step needs no code
changes: committed input shardings propagate through jit and XLA inserts the
collectives (the GSPMD model; cf. the "How to Scale Your Model" recipe:
pick a mesh, annotate shardings, let XLA insert collectives).
"""
import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    'make_mesh', 'make_moe_mesh', 'make_seq_mesh', 'batch_sharding',
    'replicated_sharding', 'put_global', 'host_local_batch', 'shard_batch',
    'shard_params', 'param_shardings', 'expert_param_shardings',
    'fsdp_param_shardings', 'fsdp_state_shardings', 'shard_fsdp_state',
]


def _check_axis(name, size, devices):
    if size < 1 or size > len(devices):
        raise ValueError(
            f"mesh axis '{name}' = {size} must be between 1 and the device "
            f'count ({len(devices)})')


def make_mesh(num_data=None, num_model=1, devices=None):
    """Creates a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    devices = np.asarray(devices[:num_data * num_model]).reshape(num_data, num_model)
    return Mesh(devices, axis_names=('data', 'model'))


def make_seq_mesh(num_seq, devices=None):
    """A ('data', 'seq') mesh for sequence-parallel transformer activations:
    batch over 'data', the time axis over 'seq'."""
    if devices is None:
        devices = jax.devices()
    _check_axis('seq', num_seq, devices)
    num_data = len(devices) // num_seq
    devices = np.asarray(devices[:num_data * num_seq]).reshape(num_data, num_seq)
    return Mesh(devices, axis_names=('data', 'seq'))


def make_moe_mesh(num_experts, num_expert_axis=None, devices=None):
    """A ('data', 'expert') mesh for expert-parallel MoE layers. The expert
    axis defaults to the largest divisor of ``num_experts`` that also
    divides the device count (so stacked ``(E, ...)`` expert parameters
    shard evenly)."""
    import math as _math
    if devices is None:
        devices = jax.devices()
    if num_expert_axis is None:
        num_expert_axis = _math.gcd(int(num_experts), len(devices))
    _check_axis('expert', num_expert_axis, devices)
    num_data = len(devices) // num_expert_axis
    devices = np.asarray(devices[:num_data * num_expert_axis]).reshape(
        num_data, num_expert_axis)
    return Mesh(devices, axis_names=('data', 'expert'))


def batch_sharding(mesh):
    """Sharding for batches: leading (batch) dim split over 'data'."""
    return NamedSharding(mesh, P('data'))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def put_global(value, sharding):
    """Places one array into a sharding, multi-host aware.

    Single-host: a plain ``device_put``. Multi-host: ``value`` is this
    host's slice of the global batch (per-host sharded loading), so the
    global array is assembled with
    ``jax.make_array_from_process_local_data`` — each host contributes its
    local shard and no data crosses DCN.
    """
    if jax.process_count() > 1 and sharding is not None:
        return jax.make_array_from_process_local_data(sharding, np.asarray(value))
    return jax.device_put(value, sharding)


def host_local_batch(tree):
    """Converts a pytree of (possibly multi-host global) batch arrays to this
    host's local slice as numpy, for host-side analysis hooks.

    Each global array's addressable shards are reassembled in index order —
    exactly the rows this host contributed via :func:`put_global` — so they
    pair correctly with the host-local ``name`` lists from the loader.
    Fully-addressable arrays (single host) pass through as numpy unchanged;
    non-arrays (strings, lists) pass through untouched.
    """
    def convert(value):
        if not isinstance(value, jax.Array):
            return value
        if getattr(value, 'is_fully_addressable', True) or value.is_fully_replicated:
            return np.asarray(value)
        # General assembly: place every addressable shard at its global index
        # with the batch axis rebased to this host's rows. Handles sharding
        # along non-batch axes too (e.g. tensor-parallel outputs); replicas
        # overwrite with identical data.
        shards = value.addressable_shards
        row_starts = sorted({s.index[0].start or 0 for s in shards})
        row_extent = {}
        for shard in shards:
            row_extent[shard.index[0].start or 0] = shard.data.shape[0]
        offsets, total = {}, 0
        for start in row_starts:
            offsets[start] = total
            total += row_extent[start]
        out = np.empty((total,) + value.shape[1:], value.dtype)
        for shard in shards:
            start = shard.index[0].start or 0
            rows = slice(offsets[start], offsets[start] + shard.data.shape[0])
            out[(rows,) + tuple(shard.index[1:])] = np.asarray(shard.data)
        return out

    return jax.tree_util.tree_map(
        convert, tree, is_leaf=lambda x: isinstance(x, (jax.Array, list, str)))


def shard_batch(batch, mesh):
    """Places a batch dict into the data-parallel layout."""
    sharding = batch_sharding(mesh)
    out = {}
    for key, value in batch.items():
        if isinstance(value, (np.ndarray, jax.Array)) and value.dtype.kind in 'fiub':
            out[key] = put_global(value, sharding)
        else:
            out[key] = value
    return out


# Parameter-name patterns whose *last* axis is sharded over 'model' (TP).
# Matches the dotted names produced by morgana_tpu.nn (Linear kernels and
# recurrent gate projections).
_TP_LAST_AXIS = re.compile(r'.*(weight|w_ih_l\d+|w_hh_l\d+)$')
_TP_BIAS = re.compile(r'.*(bias|b_ih_l\d+|b_hh_l\d+)$')


def param_shardings(params, mesh, tensor_parallel=False, min_size=2 ** 16):
    """Builds a {name: NamedSharding} map for a parameter pytree.

    With ``tensor_parallel=False`` (the default and the right call at this
    model scale) everything is replicated. With TP on, large matrices shard
    their output axis over 'model' when divisible.
    """
    model_size = mesh.shape.get('model', 1)
    out = {}
    for name, value in params.items():
        spec = P()
        if tensor_parallel and model_size > 1 and value.ndim >= 1 and value.size >= min_size:
            if _TP_LAST_AXIS.match(name) and value.shape[-1] % model_size == 0:
                spec = P(*([None] * (value.ndim - 1) + ['model']))
            elif _TP_BIAS.match(name) and value.shape[-1] % model_size == 0:
                spec = P('model') if value.ndim == 1 else P()
        out[name] = NamedSharding(mesh, spec)
    return out


# Stacked expert parameters produced by nn.MoEFeedForward: (E, ...) arrays
# whose leading axis shards over 'expert' (expert parallelism). The leaf
# names w_in/b_in/w_out/b_out are unique to MoEFeedForward (Linear uses
# weight/bias, Recurrent uses w_ih_lN/...), so a bare MoE module's params
# match too — not only ones nested under a `moe.` attribute.
_EXPERT_STACKED = re.compile(r'(^|.*\.)(w_in|b_in|w_out|b_out)$')


def expert_param_shardings(params, mesh, expert_axis='expert'):
    """Builds a {name: NamedSharding} map for expert parallelism: the
    stacked ``(E, ...)`` expert parameters of every ``nn.MoEFeedForward``
    shard their leading axis over ``expert_axis``; everything else
    replicates. This is the STORAGE half of expert parallelism — the
    compute half is the sharding constraints inside
    ``MoEFeedForward.forward`` — and it is what makes per-device parameter
    (and Adam-moment) memory scale as E / mesh.shape['expert']."""
    size = mesh.shape.get(expert_axis, 1)
    out = {}
    for name, value in params.items():
        spec = P()
        if size > 1 and value.ndim >= 1 and _EXPERT_STACKED.match(name):
            spec = P(expert_axis)
        out[name] = NamedSharding(mesh, spec)
    return out


def shard_params(params, mesh, tensor_parallel=False):
    """Places a parameter pytree onto the mesh according to
    :func:`param_shardings` — plus :func:`expert_param_shardings` when the
    mesh carries an 'expert' axis."""
    shardings = param_shardings(params, mesh, tensor_parallel=tensor_parallel)
    if mesh.shape.get('expert', 1) > 1:
        expert = expert_param_shardings(params, mesh)
        shardings.update({name: s for name, s in expert.items()
                          if s.spec != P()})
    return {name: jax.device_put(value, shardings[name]) for name, value in params.items()}


def _fsdp_spec(shape, num_data, taken=(), min_size=2 ** 16):
    """The FSDP axis choice for one leaf: its LARGEST axis that divides
    evenly over ``num_data`` and is not already taken (by TP), or None.

    Unlike TP this is pure shape math — FSDP sharding is a storage layout,
    not a computation layout, so no parameter-name knowledge is needed.
    """
    size = 1
    for dim in shape:
        size *= dim
    if num_data <= 1 or size < min_size:
        return None
    for axis in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if axis not in taken and shape[axis] % num_data == 0:
            return axis
    return None


def fsdp_param_shardings(params, mesh, tensor_parallel=False,
                         min_size=2 ** 16):
    """ZeRO-3/FSDP layout: every large parameter shards its largest axis
    over the ``'data'`` mesh axis (storage sharding). The jitted step is
    UNCHANGED — under GSPMD, XLA inserts the weight ``all_gather`` where a
    sharded kernel meets a data-sharded batch and the matching
    ``reduce_scatter`` in the backward, and the optimiser update runs on
    each device's own parameter shard. Composes with TP: the ``'model'``
    axis (from :func:`param_shardings`) keeps its dimension, ``'data'``
    takes the largest remaining one.

    Leaves smaller than ``min_size`` elements (biases, LayerNorm scales)
    stay replicated: their all-gather latency would cost more than the
    memory they occupy.
    """
    num_data = mesh.shape.get('data', 1)
    base = param_shardings(params, mesh, tensor_parallel=tensor_parallel)
    out = {}
    for name, value in params.items():
        spec = list(base[name].spec)
        spec += [None] * (value.ndim - len(spec))
        taken = tuple(i for i, s in enumerate(spec) if s is not None)
        axis = _fsdp_spec(value.shape, num_data, taken=taken,
                          min_size=min_size)
        if axis is not None:
            spec[axis] = 'data'
        out[name] = NamedSharding(mesh, P(*spec))
    return out


def fsdp_state_shardings(state, param_shardings_map, param_shapes, mesh):
    """Sharding pytree for optimiser state mirroring a parameter dict
    (e.g. optax ``mu``/``nu``): a leaf whose innermost dict key names a
    parameter of the same shape takes that parameter's FSDP sharding —
    Adam moments shard WITH their parameter, the ZeRO point — everything
    else (step counts, scalars) replicates."""
    replicated = NamedSharding(mesh, P())

    def choose(path, leaf):
        if not hasattr(leaf, 'shape'):
            return replicated
        for entry in reversed(path):
            name = getattr(entry, 'key', None)
            if name is None:
                continue
            sharding = param_shardings_map.get(name)
            # Shape must match the parameter (guards against name
            # collisions with non-moment state of a different shape).
            if sharding is not None and \
                    tuple(leaf.shape) == tuple(param_shapes[name]):
                return sharding
            break
        return replicated

    return jax.tree_util.tree_map_with_path(choose, state)


def shard_fsdp_state(params, opt_state, ema_params, mesh,
                     tensor_parallel=False, min_size=2 ** 16):
    """Places (params, opt_state, ema_params) into the FSDP layout.
    Returns the re-placed triple (ema may be None) and the param shardings.
    """
    multiprocess = len({d.process_index for d in mesh.devices.flat}) > 1

    def place(value, sharding):
        # A cross-process target sharding cannot be reached by device_put
        # from a committed process-local jax.Array (backends without DCN
        # cross-host transfers reject it — seen on multihost Orbax resume,
        # where the restored leaves are committed local arrays). Drop such
        # leaves to host numpy first: every process holds the full
        # (replicated) value, so device_put then places each process's
        # addressable shards locally, no cross-host transfer needed.
        if multiprocess and isinstance(value, jax.Array) \
                and value.is_fully_addressable:
            value = np.asarray(value)
        return jax.device_put(value, sharding)

    shardings = fsdp_param_shardings(params, mesh,
                                     tensor_parallel=tensor_parallel,
                                     min_size=min_size)
    shapes = {name: tuple(value.shape) for name, value in params.items()}
    params = {name: place(value, shardings[name])
              for name, value in params.items()}
    state_shardings = fsdp_state_shardings(opt_state, shardings, shapes, mesh)
    opt_state = jax.tree_util.tree_map(place, opt_state, state_shardings)
    if ema_params is not None:
        ema_params = {name: place(value, shardings[name])
                      for name, value in ema_params.items()}
    return params, opt_state, ema_params, shardings
