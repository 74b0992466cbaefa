"""Device-resident corpus cache (``--device_cache``).

The measured end-to-end training bottleneck on link-limited deployments is
the per-batch host->device transfer (BASELINE.md: the tunnel link bounds e2e
an order of magnitude below compute; ``--device_normalise`` cut the bytes 5x
but every batch still crosses the wire). This module removes the wire from
the steady state entirely, the TPU-native way: the whole corpus lives in HBM
as per-stream arenas, and every batch is assembled ON DEVICE by a gather —
the only per-batch upload is a handful of ``(B,)`` int32 vectors (~8 bytes
per utterance, vs megabytes for the collated batch).

Layout (built once, at loader construction):

- sequence streams (``ndim > 1`` per item — the collate rule,
  ``data/dataset.py::collate``): one ``(sum_T, ...)`` arena per key
  (utterances concatenated along time) + host-side ``(N,)`` offset/length
  tables;
- scalar / per-utterance streams: one stacked ``(N, ...)`` array per key;
- non-numeric values (utterance names, speaker ids): host lists.

Batch assembly for indices ``idxs``: for each sequence key, gather rows
``offset[i] + t`` for ``t < len[i]`` (clamped to 0 and masked back to
exact zero where padded — collate's zero-padding semantics), padded to the
same bucketed length :func:`~morgana_tpu.data.dataset.bucket_size` would
give, so compiled-program reuse matches the host path batch for batch. The
whole batch is ONE jitted call (compiled per ``(B, per-key bucket)``
signature, the same granularity the fused train step already recompiles
at); under ``--data_parallel`` the arenas are replicated over the mesh and
the gather writes straight into the batch's ``NamedSharding`` layout
(``out_shardings`` — no post-hoc resharding).

Composition: with ``--device_normalise`` only the RAW streams are cached
(the dataset already strips the host keys) and the loader's device
transform reconstructs the rest after assembly — the corpus footprint
shrinks by the same ~5-8x as the wire bytes did. ``--transfer_dtype`` is
moot (there is no per-batch wire) and the arenas stay f32: the cache is
strictly MORE faithful than a lossy wire.

Multi-host (``--multihost``, round 5): each process packs ITS OWN corpus
shard (the builder shards the id list per process), and the arenas become
GLOBAL ``(D, ...)`` arrays with one row per device — every device carries a
copy of its own process's arena (the same memory cost as the single-host
per-device replication). Batch assembly is a ``shard_map`` over the
``'data'`` axis: each device gathers its sub-batch rows from ITS row of
the arena with ITS slice of the (sharded) index vector — no collective in
the program, nothing crosses DCN. Per-host padded lengths must agree for
the global batch shape, so callers harmonise them with ONE small allgather
per epoch (:meth:`harmonise_lengths`). Requires a pure-data mesh (every
non-``'data'`` axis of size 1); the builder falls back to the streaming
loader otherwise.

The reference has no analogue: its ``DataLoader`` re-reads and re-collates
from disk every epoch (``morgana/data.py:29-57``).
"""
import numpy as np

from morgana_tpu.data.dataset import bucket_size

__all__ = ['DeviceCorpusCache', 'CacheOverBudget']


class CacheOverBudget(RuntimeError):
    """The corpus would exceed the configured device-cache byte budget."""


def _iter_items(dataset, chunk=64):
    """Yields every item dict in dataset-index order, reading through the
    loader's item-load dispatch (``loader.load_items`` — native batch
    preloader when available) so the cache sees exactly what the streaming
    path would."""
    from morgana_tpu.data.loader import load_items
    n = len(dataset)
    for start in range(0, n, chunk):
        idxs = list(range(start, min(start + chunk, n)))
        for item in load_items(dataset, idxs):
            yield item


class DeviceCorpusCache(object):
    """Packs a dataset into device-resident arenas and assembles batches
    on device. See the module docstring for the design.

    Parameters
    ----------
    dataset : FilesDataset (or any indexable yielding feature dicts)
    max_bytes : int or None
        Raise :class:`CacheOverBudget` (BEFORE touching the device) if the
        packed corpus exceeds this.
    sharding : jax.sharding.NamedSharding or None
        The training batch sharding; arenas are replicated over its mesh
        and full batches assemble directly into this layout.
    device : jax.Device or None
        Explicit placement when no sharding is given.
    """

    def __init__(self, dataset, max_bytes=None, sharding=None, device=None):
        import jax

        self._sharding = sharding
        self._device = device
        self._fns = {}

        seq_data = {}       # key -> list of (T, ...) arrays
        stack_data = {}     # key -> list of scalars / small arrays
        host_data = {}      # key -> list of non-numeric values
        item_lens = []      # per-item max sequence length (for length-sort)

        n_items = 0
        for item in _iter_items(dataset):
            n_items += 1
            max_len = 0
            for key, value in item.items():
                # Mirror ToDeviceWrapper._put's dtype filter: only numeric
                # arrays are device-residable; string/object arrays stay on
                # host exactly as the streaming loader passes them through.
                numeric = isinstance(value, np.ndarray) \
                    and value.dtype.kind in 'fiub'
                if isinstance(value, np.ndarray) and value.ndim > 1:
                    # Length recording matches DataLoader._record_lengths
                    # (ANY ndim>1 array counts, numeric or not).
                    max_len = max(max_len, value.shape[0])
                if numeric and value.ndim > 1:
                    seq_data.setdefault(key, []).append(value)
                elif numeric:
                    stack_data.setdefault(key, []).append(value)
                elif isinstance(value, bool):
                    # bool before int: Python bool subclasses int (collate's
                    # uint8 rule, reference dtype map morgana/data.py:25).
                    stack_data.setdefault(key, []).append(
                        np.asarray(value, np.uint8))
                elif isinstance(value, (int, np.integer)):
                    stack_data.setdefault(key, []).append(
                        np.asarray(value, np.int64))
                elif isinstance(value, (float, np.floating)):
                    stack_data.setdefault(key, []).append(
                        np.asarray(value, np.float32))
                else:
                    host_data.setdefault(key, []).append(value)
            item_lens.append(max_len)

        for key, values in {**seq_data, **stack_data, **host_data}.items():
            if len(values) != n_items:
                raise ValueError(
                    f'device_cache: key {key!r} present in only '
                    f'{len(values)}/{n_items} items (uniform keys required, '
                    'as for collate)')

        self.num_items = n_items
        self.item_lengths = np.asarray(item_lens, np.int64)
        self._host = host_data

        arenas = {}
        self._offsets = {}
        self._lens = {}
        total_bytes = 0
        for key, values in seq_data.items():
            lens = np.asarray([v.shape[0] for v in values], np.int64)
            offsets = np.zeros(len(values), np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            arena = np.concatenate(values, axis=0) if values else \
                np.zeros((0,), np.float32)
            if offsets[-1] + lens[-1] > np.iinfo(np.int32).max:
                raise CacheOverBudget(
                    f'device_cache: stream {key!r} exceeds int32 row '
                    'addressing; corpus too large to cache')
            arenas[key] = arena
            self._offsets[key] = offsets.astype(np.int32)
            self._lens[key] = lens
            total_bytes += arena.nbytes
        stacked = {}
        for key, values in stack_data.items():
            stacked[key] = np.stack(values)
            total_bytes += stacked[key].nbytes
        # Host copies of the stacked (per-utterance) streams: tiny (scalars /
        # small vectors per item), and they let host-side accounting — e.g.
        # the chained-dispatch path summing `n_frames` per batch — read
        # per-item values without a device round trip.
        self._stacked_host = dict(stacked)

        self.bytes = int(total_bytes)
        if max_bytes is not None and total_bytes > max_bytes:
            raise CacheOverBudget(
                f'device_cache: corpus needs {total_bytes / 2**30:.2f} GiB '
                f'on device, budget is {max_bytes / 2**30:.2f} GiB '
                '(raise --device_cache_gb or drop --device_cache)')

        # Multi-host detection: the batch sharding spans > 1 process when
        # each host packed only its own corpus shard.
        self.multihost = sharding is not None and \
            len({d.process_index for d in sharding.mesh.devices.flat}) > 1

        self._seq_keys = sorted(arenas)
        self._stack_keys = sorted(stacked)
        if self.multihost:
            self._place_multihost(arenas, stacked)
            return

        # One-time placement. Replicated over the mesh when the batches are
        # sharded (each device gathers its batch shard from a local arena
        # copy — no collective in the assemble program).
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            replicated = NamedSharding(sharding.mesh, PartitionSpec())
            put = lambda x: jax.device_put(x, replicated)  # noqa: E731
        elif device is not None:
            put = lambda x: jax.device_put(x, device)  # noqa: E731
        else:
            put = jax.device_put
        self._arenas = {k: put(v) for k, v in arenas.items()}
        self._stacked = {k: put(v) for k, v in stacked.items()}
        # Offset/length tables also live on device: per-batch assembly then
        # uploads ONE (B,) index vector and gathers everything else locally
        # (host copies stay for the static padded-shape computation).
        self._offsets_dev = {k: put(v) for k, v in self._offsets.items()}
        self._lens_dev = {k: put(v.astype(np.int32))
                          for k, v in self._lens.items()}

    def _place_multihost(self, arenas, stacked):
        """Multi-host placement: every stream becomes a global ``(D, ...)``
        array, row ``d`` = device ``d``'s own process's copy (padded to the
        cross-process maximum rows so the global shape is well-formed).
        The offset/length tables ride in the arena bundle so the chained
        train step can pass them as explicit jit arguments (a closure-
        captured cross-process array would be baked as a constant)."""
        import jax
        from jax.experimental import multihost_utils
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._sharding.mesh
        for name, size in mesh.shape.items():
            if name != 'data' and size > 1:
                raise ValueError(
                    "multihost device_cache requires a pure-data mesh "
                    f"(axis {name!r} has size {size}); use the streaming "
                    'loader with tensor/sequence/expert parallelism '
                    'across hosts')

        # Agree on padded arena sizes (shards hold different total frames)
        # and check the per-shard item counts match (shard_id_list pads
        # shards equal — unequal shards would deadlock lockstep training).
        keys = self._seq_keys
        local_sizes = np.asarray(
            [arenas[k].shape[0] for k in keys] + [self.num_items], np.int64)
        all_sizes = np.asarray(multihost_utils.process_allgather(local_sizes))
        if not (all_sizes[:, -1] == all_sizes[0, -1]).all():
            raise ValueError(
                'multihost device_cache requires equal corpus shards per '
                f'process, got item counts {all_sizes[:, -1].tolist()}')
        max_rows = all_sizes[:, :-1].max(axis=0)
        for i, key in enumerate(keys):
            pad = int(max_rows[i]) - arenas[key].shape[0]
            if pad > 0:
                arena = arenas[key]
                arenas[key] = np.concatenate(
                    [arena, np.zeros((pad,) + arena.shape[1:], arena.dtype)])

        devices = list(mesh.devices.flat)
        process = jax.process_index()
        row_spec = P(mesh.axis_names)  # axis 0 over every mesh axis: 1 row/device

        def put_rows(x):
            shards = [jax.device_put(x[None], d) for d in devices
                      if d.process_index == process]
            return jax.make_array_from_single_device_arrays(
                (len(devices),) + x.shape,
                NamedSharding(mesh, row_spec), shards)

        bundle = {k: put_rows(v) for k, v in arenas.items()}
        for key in keys:
            bundle[f'offsets:{key}'] = put_rows(self._offsets[key])
            bundle[f'lens:{key}'] = put_rows(self._lens[key].astype(np.int32))
        self._arenas = bundle
        self._stacked = {k: put_rows(v) for k, v in stacked.items()}
        self._offsets_dev = None
        self._lens_dev = None

    def global_indices(self, idxs):
        """A global ``(B,)`` / ``(chain, B)`` index array assembled from this
        process's local index slice (multi-host; trailing axis over 'data')."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        idxs = np.asarray(idxs, np.int32)
        spec = P(*([None] * (idxs.ndim - 1) + ['data']))
        return jax.make_array_from_process_local_data(
            NamedSharding(self._sharding.mesh, spec), idxs)

    def harmonise_lengths(self, lengths_list):
        """Cross-host agreement on padded lengths: element-wise max of each
        batch's per-key padded lengths over all processes (ONE small
        allgather for a whole epoch's list). Multi-host batches must share a
        global shape; each host's local max generally lands in a different
        bucket. No-op on a single host."""
        if not self.multihost or not lengths_list:
            return list(lengths_list)
        from jax.experimental import multihost_utils

        keys = self._seq_keys
        local = np.asarray([[d[k] for k in keys] for d in lengths_list],
                           np.int32)
        gathered = np.asarray(multihost_utils.process_allgather(local))
        best = gathered.max(axis=0)
        return [dict(zip(keys, row.tolist())) for row in best]

    def __len__(self):
        return self.num_items

    def describe(self):
        return (f'{self.num_items} items, {len(self._seq_keys)} sequence + '
                f'{len(self._stacked)} stacked streams, '
                f'{self.bytes / 2**20:.1f} MiB device-resident')

    def _divides(self, batch):
        """True when the batch sharding can actually split ``batch`` items
        (a partial eval batch may not divide the data axis — assemble it
        replicated instead, mirroring ``ToDeviceWrapper._put``'s fallback)."""
        try:
            self._sharding.shard_shape((batch, 1))
            return True
        except (ValueError, ZeroDivisionError):
            return False

    def can_shard(self, batch):
        """Public form of :meth:`_divides` (False when unsharded)."""
        return self._sharding is not None and self._divides(batch)

    def device_buffers(self):
        """The device-resident ``(arenas, stacked)`` dicts, for callers that
        compile their own programs over the cache (the chained train step
        passes them as explicit jit arguments so XLA never clones the
        arenas into an executable as constants)."""
        return self._arenas, self._stacked

    # -- assembly ---------------------------------------------------------

    def host_stacked(self, key):
        """Host-side copy of a stacked per-utterance stream (or None)."""
        return self._stacked_host.get(key)

    def padded_lengths(self, idxs, bucket=True):
        """The padded frame count per sequence key for a batch of dataset
        indices — the static shape half of :meth:`assemble`, computed from
        the host-side length tables (no device work)."""
        idxs = np.asarray(idxs)
        lengths = {}
        for key in self._seq_keys:
            key_lens = self._lens[key][idxs]
            padded = int(key_lens.max()) if len(idxs) else 0
            if bucket:
                padded = bucket_size(padded)
            lengths[key] = padded
        return lengths

    def batch_signature(self, idxs, bucket=True, lengths=None):
        """Hashable shape signature of the batch ``idxs`` would assemble to:
        ``(batch_items, ((seq_key, padded_len), ...))``. Batches sharing a
        signature run the same compiled program — the grouping key for
        chained multi-step dispatch (``--steps_per_dispatch``). ``lengths``
        overrides the padded lengths (multi-host harmonised grouping)."""
        if lengths is None:
            lengths = self.padded_lengths(idxs, bucket=bucket)
        return (len(np.asarray(idxs)), tuple(sorted(lengths.items())))

    def scan_assemble(self, lengths, post=None):
        """Pure (traceable) batch-assembly function for one shape signature:
        ``fn(idxs) -> batch dict`` gathering from the device arenas, with the
        loader's device transform fused in. Shared by the per-batch jitted
        assemble (:meth:`assemble`) and the chained train step, which calls
        it inside ``lax.scan`` (``training.TrainLoop.train_chain``) so N
        batches assemble inside ONE compiled program.

        Multi-host: ``idxs`` is a GLOBAL (B,) array sharded over 'data' and
        the body is a ``shard_map`` — each device gathers its own sub-batch
        from its own arena row (see :meth:`_place_multihost`)."""
        if self.multihost:
            return self._scan_assemble_multihost(lengths, post=post)
        import jax.numpy as jnp

        seq_keys = self._seq_keys
        stack_keys = self._stack_keys
        offsets_dev = self._offsets_dev
        lens_dev = self._lens_dev
        arenas = self._arenas
        stacked = self._stacked

        def fn(idxs, arenas=arenas, stacked=stacked):
            out = {}
            for key in seq_keys:
                T = lengths[key]
                offs = offsets_dev[key][idxs]
                lens = lens_dev[key][idxs]
                pos = jnp.arange(T, dtype=jnp.int32)
                valid = pos[None, :] < lens[:, None]
                rows = jnp.where(valid, offs[:, None] + pos[None, :], 0)
                gathered = arenas[key][rows]          # (B, T, ...)
                mask = valid.reshape(valid.shape
                                     + (1,) * (gathered.ndim - 2))
                # Exact zero in the padding region (collate semantics).
                out[key] = jnp.where(mask, gathered,
                                     jnp.zeros((), gathered.dtype))
            for key in stack_keys:
                out[key] = stacked[key][idxs]
            if post is not None:
                out = post(out)
            return out

        return fn

    def _scan_assemble_multihost(self, lengths, post=None):
        """The shard_map formulation of :meth:`scan_assemble`: per device,
        gather ``(B/D,)`` local indices from this device's ``(1, ...)`` arena
        row; ``out_specs=P('data')`` reassembles the global sharded batch.
        No collective anywhere in the program."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        mesh = self._sharding.mesh
        seq_keys = self._seq_keys
        stack_keys = self._stack_keys

        def block(idxs, arenas, stacked):
            out = {}
            for key in seq_keys:
                T = lengths[key]
                offs = arenas[f'offsets:{key}'][0][idxs]
                lens = arenas[f'lens:{key}'][0][idxs]
                pos = jnp.arange(T, dtype=jnp.int32)
                valid = pos[None, :] < lens[:, None]
                rows = jnp.where(valid, offs[:, None] + pos[None, :], 0)
                gathered = arenas[key][0][rows]       # (B/D, T, ...)
                mask = valid.reshape(valid.shape
                                     + (1,) * (gathered.ndim - 2))
                out[key] = jnp.where(mask, gathered,
                                     jnp.zeros((), gathered.dtype))
            for key in stack_keys:
                out[key] = stacked[key][0][idxs]
            if post is not None:
                # Element-wise per row (normalisation / delta windows along
                # the unsharded time axis) — safe per shard.
                out = post(out)
            return out

        # Pytree-prefix specs: one P('data') broadcasts over each whole
        # argument/output subtree (same idiom as parallel/shard_map_step.py).
        row = P('data')
        sm = jax.shard_map(
            block, mesh=mesh,
            in_specs=(row, row, row),
            out_specs=row,
            check_vma=False)

        def fn(idxs, arenas=self._arenas, stacked=self._stacked):
            return sm(idxs, arenas, stacked)

        return fn

    def _make_fn(self, batch, lengths, shard_out, post=None):
        """Builds the jitted assemble program for one shape signature:
        ``batch`` items, ``lengths[key]`` padded frames per sequence key.
        ``post`` (the loader's device transform) is fused INTO the program
        so assembly + normalisation/deltas run as ONE dispatch."""
        import jax

        body = self.scan_assemble(lengths, post=post)

        def fn(arenas, stacked, idxs):
            return body(idxs, arenas=arenas, stacked=stacked)

        kwargs = {}
        if shard_out:
            kwargs['out_shardings'] = self._sharding
        return jax.jit(fn, **kwargs)

    def assemble(self, idxs, bucket=True, post=None, lengths=None):
        """Builds the device batch for dataset indices ``idxs`` — the cached
        equivalent of load + collate + device_put (+ the device transform,
        when ``post`` is given — one fused program, one dispatch, and the
        only per-batch host->device transfer is the (B,) index vector).
        ``post`` must be the same callable across calls (it is baked into
        the compiled program per shape signature). ``lengths`` overrides the
        padded per-key frame counts (multi-host callers pass cross-host
        harmonised lengths; ``idxs`` is then this PROCESS's local slice of
        the global batch and the result is a global sharded batch)."""
        import jax

        idxs = np.asarray(idxs)
        batch = len(idxs)
        if lengths is None:
            lengths = self.padded_lengths(idxs, bucket=bucket)
            if self.multihost:
                lengths = self.harmonise_lengths([lengths])[0]

        if self.multihost:
            sig = ('mh', batch, post is not None,
                   tuple(sorted(lengths.items())))
            fn = self._fns.get(sig)
            if fn is None:
                body = self._scan_assemble_multihost(lengths, post=post)
                fn = self._fns[sig] = jax.jit(
                    lambda arenas, stacked, gidx: body(
                        gidx, arenas=arenas, stacked=stacked))
            gidx = self.global_indices(idxs)
            out = dict(fn(self._arenas, self._stacked, gidx))
        else:
            shard_out = self._sharding is not None and self._divides(batch)
            sig = (batch, bool(shard_out), post is not None,
                   tuple(sorted(lengths.items())))
            fn = self._fns.get(sig)
            if fn is None:
                fn = self._fns[sig] = self._make_fn(batch, lengths, shard_out,
                                                    post=post)
            out = dict(fn(self._arenas, self._stacked, idxs.astype(np.int32)))
        for key, values in self._host.items():
            picked = [values[int(i)] for i in idxs]
            # collate semantics for host-kept values: ndarrays (e.g. string
            # arrays) stack to (B, ...); other objects pass through as lists.
            # Multi-host: host values stay HOST-LOCAL (this process's rows),
            # pairing with parallel.host_local_batch in the analysis hooks.
            out[key] = np.stack(picked) \
                if isinstance(picked[0], np.ndarray) else picked
        return out
