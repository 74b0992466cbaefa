"""Weight-only int8 / packed int4 quantization for serving.

Beyond-reference capability (the reference deploys float32 torch checkpoints
only — ``morgana/base_models.py:142-175``); this is the TPU deployment
story for weight-bound inference:

* **Why weight-only**: at serving batch sizes the recurrent/feed-forward
  matmuls are HBM-bandwidth-bound on their *weights*, not compute-bound —
  an int8 weight costs 4x less HBM traffic and 4x less checkpoint/host
  memory than float32, while activations stay float (no calibration data
  needed, no activation-range cliffs). XLA fuses the dequantisation
  (``int8 -> float * scale``) into the consuming matmul.
* **Per-output-channel symmetric scales**: each output unit's column of a
  ``(in, out)`` kernel gets its own scale ``max(|w|)/127``, the standard
  recipe that keeps RNN/attention regression error at the 1e-3 relative
  level (bounds asserted in ``tests/test_quantize.py``).

The mechanism is transparent to model code: :class:`QuantizedArray` is a
registered JAX pytree that *presents* as its dequantised array (via
``__jax_array__``/``astype``/``shape``), so an engine can substitute
quantized leaves into the parameter pytree it feeds its jitted predict
program — ``nn.bind`` installs them, ``Linear``/``Recurrent``/attention
consume them unchanged, and jit flattens them into (int8, scale) device
buffers. Training never sees quantized leaves (no straight-through
estimator is provided; this is a deployment transform, not QAT).

Use from serving (``--quantize int8`` on ``python -m morgana_tpu.serve``)::

    engine = InferenceEngine(Model, 'epoch_50.npz', quantize='int8', ...)

or produce a 4x-smaller deployment checkpoint offline::

    python -m morgana_tpu.quantize --checkpoint epoch_50.npz --out epoch_50_q8.npz

``--bits 4`` (or ``quantize='int4'`` on the engine) packs two weights per
byte with **group-wise** scales (:class:`Int4QuantizedArray`,
``--group_size`` input rows per scale): ~7-8x smaller than float32 at
slightly higher — still percent-level — output error; 2-d kernels only,
other quantizable leaves fall back to int8.

Quantized checkpoints are self-describing (``__quantized_format__`` marker)
and load back through :func:`load_quantized_checkpoint`;
``InferenceEngine`` detects and serves them directly.

Backend note: the ``scan`` (default) and ``wavefront`` recurrent backends
consume quantized weights through ordinary jnp ops; the demoted ``pallas``
reference backend feeds raw buffers to kernels and is not supported with
quantized params.
"""
import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'QuantizedArray', 'Int4QuantizedArray', 'quantize_array',
    'quantize_array_int4', 'quantize_params', 'dequantize_params',
    'default_should_quantize', 'save_quantized_checkpoint',
    'load_quantized_checkpoint', 'is_quantized_checkpoint', 'main',
]

# v1 files hold only int8/raw leaves and stay readable by every release;
# files containing int4 leaves carry the v2 marker so a pre-int4 reader
# rejects them with a clear format error instead of KeyError-ing on the
# missing '{name}.q' array.
QUANTIZED_FORMAT = 'morgana_tpu.int8.v1'
QUANTIZED_FORMAT_V2 = 'morgana_tpu.quant.v2'
_ACCEPTED_FORMATS = (QUANTIZED_FORMAT, QUANTIZED_FORMAT_V2)
_MARKER = '__quantized_format__'
DEFAULT_INT4_GROUP = 64


@jax.tree_util.register_pytree_node_class
class QuantizedArray:
    """An int8-quantized weight that presents as its dequantised float array.

    ``q`` holds ``round(w / scale)`` as int8; ``scale`` is broadcastable to
    ``q``'s shape (per-output-channel: ``(1, ..., out)``). Any jnp operation
    (via ``__jax_array__``) or ``.astype`` sees ``q * scale`` — XLA fuses
    that dequantisation into the consumer, so the weight lives in HBM as
    int8. Registered as a pytree so jit/device_put treat (q, scale) as the
    leaves.
    """
    __slots__ = ('q', 'scale', 'float_dtype')

    def __init__(self, q, scale, float_dtype=jnp.float32):
        self.q = q
        self.scale = scale
        self.float_dtype = jnp.dtype(float_dtype)

    # -- pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        return (self.q, self.scale), self.float_dtype

    @classmethod
    def tree_unflatten(cls, float_dtype, children):
        q, scale = children
        return cls(q, scale, float_dtype)

    # -- array duck type -------------------------------------------------------
    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def size(self):
        return self.q.size

    @property
    def dtype(self):
        # The dtype consumers see (the dequantised dtype), NOT int8: shape/
        # dtype-driven code paths must behave as if the float weight were
        # still there.
        return self.float_dtype

    def dequantize(self, dtype=None):
        dtype = self.float_dtype if dtype is None else jnp.dtype(dtype)
        return self.q.astype(dtype) * self.scale.astype(dtype)

    def astype(self, dtype):
        return self.dequantize(dtype)

    def __jax_array__(self):
        return self.dequantize()

    def __repr__(self):
        return (f'QuantizedArray(shape={tuple(self.shape)}, int8, '
                f'float_dtype={self.float_dtype.name})')


@jax.tree_util.register_pytree_node_class
class Int4QuantizedArray:
    """An int4-quantized 2-d weight, two values packed per int8 byte, with
    **group-wise** scales: one scale per (``group_size`` input rows x output
    channel), so the coarser 4-bit grid tracks local weight magnitude —
    the standard recipe (GPTQ/AWQ-style grouping, symmetric) that keeps
    int4 regression error near int8's at half the bytes.

    Layout: for a ``(in, out)`` kernel, ``packed[(r // 2), c]`` holds rows
    ``2r`` (low nibble) and ``2r + 1`` (high nibble); ``scale`` is
    ``(ceil(in / group), out)``. ``rows`` records the true input dim (the
    packed form pads to even; group padding pads the scale grid).

    Presents as its dequantised float array exactly like
    :class:`QuantizedArray` (``__jax_array__``/``astype``/``shape``), so
    ``Linear``/``Recurrent``/attention consume it unchanged under jit; the
    nibble unpack + scale multiply fuse into the consuming matmul.
    """
    __slots__ = ('packed', 'scale', 'rows', 'group_size', 'float_dtype')

    def __init__(self, packed, scale, rows, group_size,
                 float_dtype=jnp.float32):
        self.packed = packed
        self.scale = scale
        self.rows = int(rows)
        self.group_size = int(group_size)
        self.float_dtype = jnp.dtype(float_dtype)

    # -- pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        return ((self.packed, self.scale),
                (self.rows, self.group_size, self.float_dtype))

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, scale = children
        rows, group_size, float_dtype = aux
        return cls(packed, scale, rows, group_size, float_dtype)

    # -- array duck type -------------------------------------------------------
    @property
    def shape(self):
        return (self.rows,) + tuple(self.packed.shape[1:])

    @property
    def ndim(self):
        return self.packed.ndim

    @property
    def size(self):
        return int(np.prod(self.shape))

    @property
    def dtype(self):
        return self.float_dtype

    def dequantize(self, dtype=None):
        dtype = self.float_dtype if dtype is None else jnp.dtype(dtype)
        p = jnp.asarray(self.packed)
        # Arithmetic shifts sign-extend the nibbles: low = (p << 4) >> 4.
        low = jnp.right_shift(jnp.left_shift(p, 4), 4)
        high = jnp.right_shift(p, 4)
        # Interleave back to row order [2r] = low, [2r + 1] = high.
        q = jnp.stack([low, high], axis=1).reshape(
            (2 * p.shape[0],) + p.shape[1:])[:self.rows]
        scale = jnp.repeat(jnp.asarray(self.scale), self.group_size,
                           axis=0)[:self.rows]
        return q.astype(dtype) * scale.astype(dtype)

    def astype(self, dtype):
        return self.dequantize(dtype)

    def __jax_array__(self):
        return self.dequantize()

    def __repr__(self):
        return (f'Int4QuantizedArray(shape={tuple(self.shape)}, int4 '
                f'group={self.group_size}, '
                f'float_dtype={self.float_dtype.name})')


def quantize_array_int4(w, group_size=DEFAULT_INT4_GROUP, float_dtype=None):
    """Group-wise symmetric int4 quantization of a 2-d ``(in, out)`` kernel:
    one scale per (``group_size`` input rows x output channel), values in
    [-7, 7], two per stored byte."""
    w = jnp.asarray(w)
    if w.ndim != 2:
        raise ValueError(f'int4 quantization takes 2-d kernels, got shape '
                         f'{tuple(w.shape)} (non-matrix leaves stay float '
                         'or use int8)')
    float_dtype = w.dtype if float_dtype is None else jnp.dtype(float_dtype)
    rows, out = int(w.shape[0]), int(w.shape[1])
    group_size = int(group_size)
    groups = -(-rows // group_size)
    pad_to = max(groups * group_size, rows + rows % 2)
    # One padded buffer serves both the group grid and the nibble pairing.
    if pad_to % 2:
        pad_to += 1
    w32 = jnp.zeros((pad_to, out), jnp.float32).at[:rows].set(
        w.astype(jnp.float32))
    grouped = w32[:groups * group_size].reshape(groups, group_size, out)
    absmax = jnp.max(jnp.abs(grouped), axis=1)             # (groups, out)
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    scale_rows = jnp.repeat(scale, group_size, axis=0)
    scale_rows = jnp.concatenate(
        [scale_rows, jnp.ones((pad_to - scale_rows.shape[0], out),
                              jnp.float32)], axis=0)
    q = jnp.clip(jnp.round(w32 / scale_rows), -7, 7).astype(jnp.int8)
    pairs = q.reshape(pad_to // 2, 2, out)
    packed = jnp.bitwise_or(
        jnp.bitwise_and(pairs[:, 0], 0x0F),
        jnp.left_shift(pairs[:, 1], 4)).astype(jnp.int8)
    return Int4QuantizedArray(packed, scale.astype(jnp.float32), rows,
                              group_size, float_dtype)


def quantize_array(w, axis=-1, float_dtype=None):
    """Per-channel symmetric int8 quantization of ``w`` along every axis
    except ``axis`` (one scale per slice of the kept axis — for an
    ``(in, out)`` kernel, per-output-channel)."""
    w = jnp.asarray(w)
    float_dtype = w.dtype if float_dtype is None else jnp.dtype(float_dtype)
    reduce_axes = tuple(a for a in range(w.ndim) if a != (axis % w.ndim))
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes,
                     keepdims=True)
    # An all-zero channel has scale 0; keep it representable (q=0, scale=1).
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return QuantizedArray(q.astype(jnp.int8), scale.astype(jnp.float32),
                          float_dtype)


def default_should_quantize(name, value):
    """The default leaf filter: matrix-shaped (ndim >= 2) float weights.
    Biases, gains and other vectors stay float — they are a rounding error
    of the parameter bytes but carry disproportionate precision (LayerNorm
    scales, gate biases)."""
    arr_dtype = getattr(value, 'dtype', None)
    return (getattr(value, 'ndim', 0) >= 2
            and arr_dtype is not None
            and jnp.issubdtype(arr_dtype, jnp.floating))


def quantize_params(params, should_quantize=None, bits=8,
                    group_size=DEFAULT_INT4_GROUP):
    """Quantizes a ``{name: array}`` parameter pytree for serving: every leaf
    passing ``should_quantize(name, value)`` (default:
    :func:`default_should_quantize`) becomes a :class:`QuantizedArray`
    (``bits=8``) or :class:`Int4QuantizedArray` (``bits=4``, group-wise
    scales; non-2-d weights fall back to int8 — the packed-nibble layout is
    a matrix format); everything else passes through unchanged.
    Already-quantized leaves pass through (idempotent)."""
    if bits not in (4, 8):
        raise ValueError(f'bits must be 4 or 8, got {bits!r}')
    should_quantize = should_quantize or default_should_quantize
    out = {}
    for name, value in params.items():
        if isinstance(value, (QuantizedArray, Int4QuantizedArray)):
            out[name] = value
        elif should_quantize(name, value):
            if bits == 4 and getattr(value, 'ndim', 0) == 2:
                out[name] = quantize_array_int4(value, group_size=group_size)
            else:
                out[name] = quantize_array(value)
        else:
            out[name] = value
    return out


def dequantize_params(params):
    """Back to a plain float pytree (e.g. for analysis code that wants numpy
    weights)."""
    return {name: value.dequantize()
            if isinstance(value, (QuantizedArray, Int4QuantizedArray))
            else value for name, value in params.items()}


# ---------------------------------------------------------------------------
# Quantized checkpoint files
# ---------------------------------------------------------------------------

def save_quantized_checkpoint(params, path, should_quantize=None, bits=8,
                              group_size=DEFAULT_INT4_GROUP):
    """Writes a quantized ``.npz`` deployment checkpoint (~4x smaller than
    the float32 ``epoch_{N}.npz`` it came from at int8, ~7x at int4).
    Self-describing via a format marker; float leaves are stored as-is.
    Returns the path the file was actually written to (``np.savez`` appends
    ``.npz`` when missing, so an extensionless ``path`` would otherwise name
    a nonexistent file)."""
    if not path.endswith('.npz'):
        path = path + '.npz'
    qparams = quantize_params(params, should_quantize=should_quantize,
                              bits=bits, group_size=group_size)
    has_int4 = any(isinstance(v, Int4QuantizedArray)
                   for v in qparams.values())
    marker = QUANTIZED_FORMAT_V2 if has_int4 else QUANTIZED_FORMAT
    arrays = {_MARKER: np.array(marker)}
    manifest = {}
    for name, value in qparams.items():
        if isinstance(value, Int4QuantizedArray):
            arrays[f'{name}.q4'] = np.asarray(value.packed)
            arrays[f'{name}.scale'] = np.asarray(value.scale)
            manifest[name] = {'kind': 'int4', 'rows': value.rows,
                              'group_size': value.group_size,
                              'float_dtype': value.float_dtype.name}
        elif isinstance(value, QuantizedArray):
            arrays[f'{name}.q'] = np.asarray(value.q)
            arrays[f'{name}.scale'] = np.asarray(value.scale)
            manifest[name] = {'kind': 'int8',
                              'float_dtype': value.float_dtype.name}
        else:
            raw = np.asarray(value)
            if raw.dtype == object:
                # np.savez would pickle this without complaint, producing
                # an artifact load_quantized_checkpoint (allow_pickle=False)
                # can never read back.
                raise ValueError(
                    f'parameter {name!r} is not an array (got '
                    f'{type(value).__name__}); quantized checkpoints take '
                    'the flat {dotted_name: array} pytree nn.parameters() '
                    'produces')
            arrays[name] = raw
            manifest[name] = {'kind': 'raw'}
    arrays['__manifest__'] = np.array(json.dumps(manifest))
    np.savez(path, **arrays)
    return path


def is_quantized_checkpoint(path):
    """True when ``path`` is a :func:`save_quantized_checkpoint` artifact."""
    try:
        with np.load(path, allow_pickle=False) as data:
            return _MARKER in data.files \
                and str(data[_MARKER]) in _ACCEPTED_FORMATS
    except (OSError, ValueError, KeyError):
        return False


def load_quantized_checkpoint(path):
    """Loads a quantized checkpoint back into a ``{name: QuantizedArray |
    array}`` pytree ready to feed a jitted predict program."""
    with np.load(path, allow_pickle=False) as data:
        if _MARKER not in data.files \
                or str(data[_MARKER]) not in _ACCEPTED_FORMATS:
            raise ValueError(
                f'{path} is not a morgana_tpu quantized checkpoint '
                f'(write one with python -m morgana_tpu.quantize)')
        manifest = json.loads(str(data['__manifest__']))
        params = {}
        for name, spec in manifest.items():
            if spec['kind'] == 'int8':
                params[name] = QuantizedArray(
                    jnp.asarray(data[f'{name}.q']),
                    jnp.asarray(data[f'{name}.scale']),
                    jnp.dtype(spec['float_dtype']))
            elif spec['kind'] == 'int4':
                params[name] = Int4QuantizedArray(
                    jnp.asarray(data[f'{name}.q4']),
                    jnp.asarray(data[f'{name}.scale']),
                    spec['rows'], spec['group_size'],
                    jnp.dtype(spec['float_dtype']))
            elif spec['kind'] == 'raw':
                params[name] = jnp.asarray(data[name])
            else:
                raise ValueError(
                    f'{path}: unknown quantized-leaf kind {spec["kind"]!r} '
                    f'for {name!r} — written by a newer morgana_tpu?')
        return params


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Quantize a trained checkpoint to an int8 deployment '
                    'artifact (weight-only, per-channel scales).')
    parser.add_argument('--checkpoint', required=True,
                        help='Float epoch_{N}.npz checkpoint to quantize.')
    parser.add_argument('--out', default=None,
                        help="Output path (default: '<checkpoint>_q8.npz' "
                             "or '_q4.npz' with --bits 4).")
    parser.add_argument('--bits', type=int, default=8, choices=(4, 8),
                        help='4 = packed int4 with group-wise scales '
                             '(~7x smaller, slightly higher error); '
                             '8 = per-channel int8 (default).')
    parser.add_argument('--group_size', type=int, default=DEFAULT_INT4_GROUP,
                        help='Input rows per int4 scale group (--bits 4).')
    args = parser.parse_args(argv)

    # Pure host-side work: never initialise an accelerator backend for a
    # checkpoint-file transform (a TPU attach can take seconds — or hang on
    # a broken tunnel — for zero benefit here).
    from morgana_tpu import platform as _platform
    _platform.force_cpu()

    out = args.out
    if out is None:
        root, ext = os.path.splitext(args.checkpoint)
        out = f'{root}_q{args.bits}{ext or ".npz"}'
    with np.load(args.checkpoint, allow_pickle=False) as data:
        if _MARKER in data.files:
            parser.error(f'{args.checkpoint} is already quantized')
        params = {name: data[name] for name in data.files}
    out = save_quantized_checkpoint(params, out, bits=args.bits,
                                    group_size=args.group_size)
    stats = {
        'checkpoint': args.checkpoint,
        'out': out,
        'bytes_in': os.path.getsize(args.checkpoint),
        'bytes_out': os.path.getsize(out),
    }
    stats['compression'] = round(stats['bytes_in'] / max(stats['bytes_out'], 1), 2)
    print(json.dumps(stats))


if __name__ == '__main__':
    main()
