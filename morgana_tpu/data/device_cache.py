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
strictly MORE faithful than a lossy wire. Everything here is single-host
(multi-host training shards the corpus across hosts; the builder refuses
the combination).

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
        self._seq_keys = sorted(arenas)
        self._stack_keys = sorted(stacked)

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

    def batch_signature(self, idxs, bucket=True):
        """Hashable shape signature of the batch ``idxs`` would assemble to:
        ``(batch_items, ((seq_key, padded_len), ...))``. Batches sharing a
        signature run the same compiled program — the grouping key for
        chained multi-step dispatch (``--steps_per_dispatch``)."""
        lengths = self.padded_lengths(idxs, bucket=bucket)
        return (len(np.asarray(idxs)), tuple(sorted(lengths.items())))

    def scan_assemble(self, lengths, post=None):
        """Pure (traceable) batch-assembly function for one shape signature:
        ``fn(idxs) -> batch dict`` gathering from the device arenas, with the
        loader's device transform fused in. Shared by the per-batch jitted
        assemble (:meth:`assemble`) and the chained train step, which calls
        it inside ``lax.scan`` (``training.TrainLoop.train_chain``) so N
        batches assemble inside ONE compiled program."""
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

    def assemble(self, idxs, bucket=True, post=None):
        """Builds the device batch for dataset indices ``idxs`` — the cached
        equivalent of load + collate + device_put (+ the device transform,
        when ``post`` is given — one fused program, one dispatch, and the
        only per-batch host->device transfer is the (B,) index vector).
        ``post`` must be the same callable across calls (it is baked into
        the compiled program per shape signature)."""
        idxs = np.asarray(idxs)
        batch = len(idxs)
        lengths = self.padded_lengths(idxs, bucket=bucket)

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
            out[key] = np.stack(picked) \
                if isinstance(picked[0], np.ndarray) else picked
        return out
