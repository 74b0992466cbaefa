"""Device-memory observability and compile-time batch-size capacity search.

TPU-native counterpart of the CUDA memory tooling torch users reach for
(``torch.cuda.max_memory_allocated`` / nvidia-smi). The reference has no
memory tooling at all — OOM discovery there is run-and-crash inside the eager
epoch loop (``morgana/experiment_builder.py:431-505``). Under XLA the story
is structurally better: the fused train step (``training.py``) is ONE
compiled program with a static buffer assignment, so its peak HBM use is a
*compile-time fact* (``jax.stages.Compiled.memory_analysis()``) available
before any step executes — capacity questions ("what batch size fits?") are
answered by compiling, not by crashing.

Pieces:

- :func:`program_memory` — per-program byte breakdown (arguments / outputs /
  temporaries / donated-aliased / peak) for any jitted function at given
  arg shapes (accepts concrete arrays or ``jax.ShapeDtypeStruct`` trees —
  the latter allocate nothing).
- :func:`train_step_memory` — that breakdown for a ``TrainLoop``'s fused
  train step at the exact shapes of a given feature batch (picks the
  gradient-accumulation apply step when accumulation is on: it is the
  cycle's largest program — it holds the gradient accumulator too).
- :func:`device_memory_stats` — live allocator numbers where the backend
  reports them (TPU HBM: ``bytes_in_use`` / ``peak_bytes_in_use`` /
  ``bytes_limit``; CPU reports none).
- :func:`find_max_batch_size` — largest batch whose compile-time peak fits a
  byte budget: doubling probe then binary search, never an OOM crash loop.
- :func:`write_report` — the one-page ``memory_report.txt`` behind the
  builder's ``--memory_report`` flag.

Note on cost: every probe is an XLA compile. ``jit_fn.lower(...).compile()``
does not reuse the in-process jit execution cache, so a report on an
already-trained step compiles the program a second time (the persistent
compilation cache, ``--compilation_cache_dir``, removes that cost across
runs). That is why ``--memory_report`` is opt-in.
"""
import jax
import jax.numpy as jnp

__all__ = ['program_memory', 'train_step_memory', 'device_memory_stats',
           'find_max_batch_size', 'search_train_batch_size',
           'batch_shapes_at', 'batch_granularity', 'format_report',
           'write_report', 'MemoryAnalysisUnavailable']

# (report name, CompiledMemoryStats attribute)
_FIELDS = (
    ('arguments', 'argument_size_in_bytes'),
    ('outputs', 'output_size_in_bytes'),
    ('temporaries', 'temp_size_in_bytes'),
    ('aliased', 'alias_size_in_bytes'),
    ('generated_code', 'generated_code_size_in_bytes'),
    ('peak', 'peak_memory_in_bytes'),
)


def _stats_dict(analysis):
    if analysis is None:
        return None
    out = {}
    for name, attr in _FIELDS:
        value = getattr(analysis, attr, None)
        if value is not None:
            out[name + '_bytes'] = int(value)
    return out or None


def program_memory(jit_fn, *args, **kwargs):
    """Compile-time memory breakdown of ``jit_fn`` called with ``args``.

    ``args`` may be concrete arrays or ``jax.ShapeDtypeStruct`` trees (only
    shapes/dtypes matter; abstract args allocate no device memory). Returns
    a dict of ``*_bytes`` fields, or None when the backend's compiler does
    not report a memory analysis for this program.
    """
    lowered = jit_fn.lower(*args, **kwargs)
    try:
        analysis = lowered.compile().memory_analysis()
    except NotImplementedError:
        return None
    return _stats_dict(analysis)


class MemoryAnalysisUnavailable(RuntimeError):
    """The backend's compiler reports no memory analysis — capacity search
    cannot run (distinct from a probe whose compile legitimately fails)."""


def abstract_shapes(tree):
    """Maps every array leaf to a ``ShapeDtypeStruct`` (allocation-free
    stand-in for lowering); non-array leaves pass through.

    Mesh shardings are preserved: a leaf carrying a ``NamedSharding`` (e.g.
    FSDP-sharded params, a data-parallel batch) lowers with that sharding,
    so the analysed program is the real SPMD program and the reported bytes
    are PER-DEVICE — without this, --memory_report/--search_batch_size under
    --data_parallel would analyse an unsharded single-device program and
    overstate per-device HBM by roughly the device count."""
    def to_abstract(x):
        if hasattr(x, 'shape') and hasattr(x, 'dtype'):
            sharding = getattr(x, 'sharding', None)
            if isinstance(sharding, jax.sharding.NamedSharding):
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=sharding)
            return jax.ShapeDtypeStruct(x.shape, x.dtype)
        return x
    return jax.tree_util.tree_map(to_abstract, tree)


def _step_memory(loop, abstract_batch):
    """Memory breakdown of ``loop``'s train step at an already-abstract
    batch (a dict of ``ShapeDtypeStruct``)."""
    params = abstract_shapes(loop.params)
    opt_state = abstract_shapes(loop.opt_state)
    ema = abstract_shapes(loop.ema_params)
    scalar_f32 = jax.ShapeDtypeStruct((), jnp.float32)
    scalar_i32 = jax.ShapeDtypeStruct((), jnp.int32)
    rng = abstract_shapes(loop._train_rng())
    if loop.grad_accum_steps > 1:
        return program_memory(
            loop._apply_step, params, opt_state, ema, params, abstract_batch,
            scalar_f32, scalar_f32, scalar_i32, rng)
    return program_memory(
        loop._train_step, params, opt_state, ema, abstract_batch,
        scalar_f32, scalar_i32, rng)


def train_step_memory(loop, features):
    """Memory breakdown of ``loop``'s fused train step at ``features``'
    shapes.

    Lowers with abstract (shape-only) arguments, so nothing is allocated —
    but the program IS compiled (see module note on cost). With gradient
    accumulation active this analyses the cycle's *apply* step, which is the
    peak program of the cycle (it carries the gradient accumulator alongside
    the optimiser update).
    """
    from morgana_tpu import training
    return _step_memory(
        loop, abstract_shapes(training.numeric_features(features)))


def batch_granularity(features):
    """Number of batch-axis shards the features' shardings imply (1 when
    unsharded): probe batch sizes must be multiples of this for the resized
    abstract batch to keep its ``NamedSharding``."""
    from morgana_tpu import training
    g = 1
    for value in training.numeric_features(features).values():
        sharding = getattr(value, 'sharding', None)
        if (isinstance(sharding, jax.sharding.NamedSharding)
                and sharding.spec and sharding.spec[0] is not None):
            axes = sharding.spec[0]
            axes = (axes,) if isinstance(axes, str) else axes
            shards = 1
            for axis in axes:
                shards *= sharding.mesh.shape[axis]
            g = max(g, shards)
    return g


def batch_shapes_at(features, batch_size):
    """Abstract copy of a numeric feature batch with the leading (batch)
    axis of every array replaced by ``batch_size``; time/feature axes stay
    fixed (the first batch's length bucket). Batch-axis ``NamedSharding``s
    are preserved when ``batch_size`` divides evenly over their shards (see
    :func:`batch_granularity`)."""
    from morgana_tpu import training
    out = {}
    for key, value in training.numeric_features(features).items():
        shape = (int(batch_size),) + tuple(value.shape[1:])
        sharding = getattr(value, 'sharding', None)
        if (isinstance(sharding, jax.sharding.NamedSharding)
                and int(batch_size) % batch_granularity({key: value}) == 0):
            out[key] = jax.ShapeDtypeStruct(shape, value.dtype,
                                            sharding=sharding)
        else:
            out[key] = jax.ShapeDtypeStruct(shape, value.dtype)
    return out


def search_train_batch_size(loop, features, limit_bytes, start=1,
                            max_batch=4096):
    """Largest batch size whose fused-train-step compile-time peak fits
    ``limit_bytes``, probing ``loop``'s step at ``features``' per-item
    shapes (see :func:`find_max_batch_size` for the search contract).

    Caveats the caller should surface: probes hold the TIME axis at this
    batch's length bucket — longer buckets compile larger programs, so leave
    headroom (or probe with the longest bucket); each probe is one XLA
    compile of the full step.
    """
    def peak(b):
        stats = _step_memory(loop, batch_shapes_at(features, b))
        if stats is None:
            raise MemoryAnalysisUnavailable(
                'backend reports no compile-time memory analysis; cannot '
                'search batch size')
        return stats['peak_bytes']

    return find_max_batch_size(peak, limit_bytes, start=start,
                               max_batch=max_batch,
                               granularity=batch_granularity(features))


def device_memory_stats(device=None):
    """Live allocator statistics for ``device`` (default: first local
    device), or None where the backend does not report them (CPU)."""
    if device is None:
        device = jax.local_devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:  # noqa: BLE001 — optional API, varies by plugin
        return None
    if not stats:
        return None
    return {key: int(value) for key, value in stats.items()
            if isinstance(value, (int, float))}


def find_max_batch_size(peak_bytes_fn, limit_bytes, start=1, max_batch=4096,
                        granularity=1):
    """Largest batch size in ``[start, max_batch]`` whose compile-time peak
    fits ``limit_bytes``.

    ``peak_bytes_fn(batch_size) -> bytes`` is typically a closure over
    :func:`train_step_memory` (build the step at that batch size, return
    ``['peak_bytes']``). A probe that *raises* (e.g. the compiler itself
    reports the program cannot be assigned buffers) counts as over-limit —
    EXCEPT :class:`MemoryAnalysisUnavailable`, which propagates ("cannot
    search" must not masquerade as "nothing fits"). Returns
    ``(best_batch_or_None, probes)`` where ``probes`` maps each probed batch
    size to its peak bytes (None for raised probes) —
    ``best_batch_or_None`` is None when even the smallest probe does not
    fit. With ``granularity`` g > 1 (a sharded batch axis: see
    :func:`batch_granularity`) only multiples of g are probed.

    Probe count is O(log(max_batch / start)): doubling to bracket the
    boundary, then binary search inside the bracket.
    """
    if start < 1 or max_batch < start:
        raise ValueError(f'need 1 <= start <= max_batch, got '
                         f'start={start} max_batch={max_batch}')
    g = max(int(granularity), 1)
    # Search in units of g: b = k * g with k in [k_start, k_max].
    k_start = max((start + g - 1) // g, 1)
    k_max = max_batch // g
    if k_max < k_start:
        raise ValueError(f'granularity {g} leaves no probe sizes in '
                         f'[{start}, {max_batch}]')
    probes = {}

    def fits(k):
        b = k * g
        if b not in probes:
            try:
                probes[b] = int(peak_bytes_fn(b))
            except MemoryAnalysisUnavailable:
                raise
            except Exception:  # noqa: BLE001 — a failing compile IS the signal
                probes[b] = None
        return probes[b] is not None and probes[b] <= limit_bytes

    if not fits(k_start):
        return None, probes
    lo, hi = k_start, None  # lo always fits; hi is the smallest known misfit
    while hi is None and lo < k_max:
        nxt = min(lo * 2, k_max)
        if fits(nxt):
            lo = nxt
        else:
            hi = nxt
    while hi is not None and hi - lo > 1:
        mid = (lo + hi) // 2
        if fits(mid):
            lo = mid
        else:
            hi = mid
    return lo * g, probes


def _fmt_bytes(n):
    for unit in ('B', 'KiB', 'MiB', 'GiB', 'TiB'):
        if abs(n) < 1024 or unit == 'TiB':
            return f'{n:.2f} {unit}' if unit != 'B' else f'{n:d} B'
        n /= 1024.0
    return f'{n:.2f} TiB'


def format_report(program, device_stats=None, batch_shapes=None, header=''):
    """Human-readable memory report (the ``memory_report.txt`` body)."""
    lines = []
    if header:
        lines += [header, '=' * len(header), '']
    if batch_shapes:
        lines.append('Batch shapes (the analysed program is specific to '
                     'these; other length buckets compile separate programs):')
        for key, shape in sorted(batch_shapes.items()):
            lines.append(f'  {key}: {tuple(shape)}')
        lines.append('')
    if program:
        lines.append('Fused train step — compile-time buffer assignment:')
        for name, _ in _FIELDS:
            key = name + '_bytes'
            if key in program:
                lines.append(f'  {name:>15}: {_fmt_bytes(program[key]):>12}')
        lines.append('')
        lines.append('  peak = high-water mark XLA reserves while the step '
                     'runs; aliased = donated in/out buffers (params, '
                     'optimiser state) counted once.')
    else:
        lines.append('This backend reports no compile-time memory analysis.')
    lines.append('')
    if device_stats:
        lines.append('Device allocator (live, includes params/optimiser '
                     'state and any other resident programs):')
        for key in ('bytes_in_use', 'peak_bytes_in_use', 'bytes_limit',
                    'largest_free_block_bytes'):
            if key in device_stats:
                lines.append(f'  {key:>24}: {_fmt_bytes(device_stats[key]):>12}')
        extra = sorted(set(device_stats) - {'bytes_in_use', 'peak_bytes_in_use',
                                            'bytes_limit',
                                            'largest_free_block_bytes'})
        for key in extra:
            lines.append(f'  {key:>24}: {device_stats[key]}')
    else:
        lines.append('Device allocator stats: not reported by this backend '
                     '(CPU backends report none; TPU reports HBM use).')
    return '\n'.join(lines) + '\n'


def write_report(path, loop, features, header=''):
    """Analyses ``loop``'s train step at ``features`` and writes the report
    to ``path``. Returns the program breakdown dict (or None)."""
    from morgana_tpu import training
    program = train_step_memory(loop, features)
    batch_shapes = {key: value.shape for key, value
                    in training.numeric_features(features).items()}
    text = format_report(program, device_memory_stats(),
                         batch_shapes=batch_shapes, header=header)
    with open(path, 'w') as f:
        f.write(text)
    return program
