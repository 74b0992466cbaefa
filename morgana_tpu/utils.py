"""General tensor/sequence utilities (reference-parity surface of
``morgana/utils.py``, rebuilt on JAX).

The compute-heavy members live in :mod:`morgana_tpu.ops` (jit-safe kernels)
and :mod:`morgana_tpu.nn` (modules); they are re-exported here so user code
written against the reference API (``utils.sequence_mask`` etc.) ports with an
import change only.
"""
import re
from collections.abc import Mapping, Iterable, Sized

import jax
import numpy as np

from morgana_tpu.ops.masking import sequence_mask, batched_masked_select, both_voiced_mask  # noqa: F401
from morgana_tpu.ops.sequence import upsample_to_repetitions, split_to_segments, get_segment_ends  # noqa: F401
from morgana_tpu.nn import (  # noqa: F401
    Recurrent, SequentialWithRecurrent, ExponentialMovingAverage,
)

__all__ = [
    'listify', 'format_float_tensor', 'map_nested', 'detach_batched_seqs',
    'get_epoch_from_checkpoint_path', 'sequence_mask', 'batched_masked_select',
    'both_voiced_mask', 'upsample_to_repetitions', 'split_to_segments',
    'get_segment_ends', 'Recurrent', 'SequentialWithRecurrent',
    'ExponentialMovingAverage',
]


def listify(object_or_list):
    r"""Converts input to a list if it is not already a list/tuple."""
    if not isinstance(object_or_list, (list, tuple)):
        object_or_list = [object_or_list]
    return object_or_list


def format_float_tensor(value):
    r"""Formats a scalar or 1-d vector as a short string (reference
    ``morgana/utils.py:17-34``)."""
    def fmt(v):
        v = float(v)
        if abs(v) >= 1e-3 or v == 0.0:
            return f'{v:.3g}'
        return f'{v:.2e}'

    if isinstance(value, (np.ndarray, jax.Array)):
        value = np.asarray(value)
        if value.ndim == 0:
            return fmt(value)
        flat = value.reshape(-1)
    elif isinstance(value, Sized) and not isinstance(value, str):
        flat = list(value)
    else:
        return fmt(value)

    if len(flat) <= 1:
        return fmt(flat[0]) if len(flat) else '[]'
    if len(flat) <= 4:
        return '[{}]'.format(', '.join(fmt(v) for v in flat))
    return '[{}, {}, ..., {}]'.format(fmt(flat[0]), fmt(flat[1]), fmt(flat[-1]))


def infer_device(array):
    r"""Gets the device of a jax array (reference API parity,
    ``morgana/utils.py:56-63``). Returns None for host numpy arrays."""
    if isinstance(array, jax.Array):
        devices = array.devices()
        return next(iter(devices)) if devices else None
    return None


def map_nested(func, data):
    r"""Recursively applies ``func`` over nested dict/list structures.
    Base cases: ``np.ndarray`` and ``jax.Array`` (reference ``morgana/utils.py:37-53``)."""
    if isinstance(data, (np.ndarray, jax.Array)):
        return func(data)
    if isinstance(data, Mapping):
        return {k: map_nested(func, v) for k, v in data.items()}
    if isinstance(data, Iterable) and not isinstance(data, str):
        return [map_nested(func, v) for v in data]
    return func(data)


def detach_batched_seqs(*sequence_features, seq_len=None, squeeze=True):
    r"""Device arrays -> host numpy, with padding removed per batch item.

    Reference: ``morgana/utils.py:66-102``. Returns, per input feature, a list
    of per-item ``(seq_len_i, feat_dim)`` arrays (squeezed if 1-d).
    """
    if seq_len is not None:
        seq_len = np.asarray(seq_len).reshape(-1).astype(np.int64)

    detached = []
    for batchf in sequence_features:
        batchf = np.asarray(batchf)
        if seq_len is not None and batchf.ndim > 2:
            items = []
            for feature, n in zip(batchf, seq_len):
                item = feature[:n]
                items.append(item.squeeze() if squeeze else item)
            batchf = items
        detached.append(batchf)

    if len(detached) == 1:
        return detached[0]
    return detached


def get_epoch_from_checkpoint_path(checkpoint_path):
    r"""Extracts the epoch number from ``.*checkpoints/epoch_(N)[_suffix].ext``
    (reference ``morgana/utils.py:105-112``)."""
    epoch_regex = re.compile(r'.*checkpoints/epoch_(?P<epoch>\d+)(_\w+)?\.\w+')
    match = epoch_regex.match(str(checkpoint_path))
    if match is None:
        return 0
    return int(match['epoch'])
