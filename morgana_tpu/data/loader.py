"""Batched data loading with threaded reads and device prefetch.

Replaces the reference's torch ``DataLoader`` + ``ToDeviceWrapper``
(``morgana/data.py:29-57, 648-663``). The pipeline is:

    batch build (load+normalise+collate, pipelined across a thread pool,
    native C++ batch reads inside) -> background device_put (double
    buffered) -> jitted step

so host I/O and the host->device transfer overlap with TPU compute, and the
train loop never blocks on disk. With a ``jax.sharding.Sharding``, batches are
placed directly into their data-parallel layout (one transfer per device
shard, no host gather).
"""
import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

__all__ = ['DataLoader', 'batch', 'ToDeviceWrapper', 'load_items']


def load_items(dataset, idxs, pool=None):
    """Loads the items at ``idxs``, preferring the dataset's native batch
    preloader (GIL-free C++ reads in one parallel call); otherwise per-item
    loads, optionally spread over ``pool``. The ONE implementation of the
    preload/fallback dispatch — shared by the streaming loader and the
    device-cache builder so both paths read items identically."""
    preload = getattr(dataset, 'preload_batch', None)
    build = getattr(dataset, 'build_item', None)
    preloaded = preload(idxs) if preload is not None and build is not None \
        else None
    if preloaded:
        return [build(i, {name: arrs[j] for name, arrs in preloaded.items()})
                for j, i in enumerate(idxs)]
    if pool is not None:
        return list(pool.map(dataset.__getitem__, idxs))
    return [dataset[i] for i in idxs]


class DataLoader(object):
    r"""Iterates padded batches of a dataset.

    Parameters
    ----------
    dataset : FilesDataset (or any indexable with ``collate_fn``)
    batch_size : int
    shuffle : bool
        Reshuffles item order each epoch (seeded, epoch-keyed).
    num_data_threads : int
        Thread-pool size for parallel item loading (0 = inline).
    seed : int
    drop_remainder : bool
        Drop the final partial batch (required when batches must divide a
        device mesh evenly).
    bucket : bool
        Bucket padded lengths to bound XLA recompilation.
    """

    def __init__(self, dataset, batch_size=32, shuffle=True, num_data_threads=0,
                 seed=0, drop_remainder=False, bucket=True, length_sort_window=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_data_threads = num_data_threads
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.bucket = bucket
        # length_sort_window > 0 enables length-smart batching: within a
        # shuffled window of `window * batch_size` utterances, sort by
        # sequence length so each batch pads to a similar max — cutting
        # padded-frame compute (classic RNN bucketing). Lengths are learned
        # from the first (randomly ordered) epoch, so it needs no schema.
        self.length_sort_window = length_sort_window
        self.epoch = 0
        self.skip_batches = 0
        self._lengths = {}
        # _order_lengths: snapshot of the map the CURRENT epoch's _order()
        # actually used (checkpointed for exact mid-epoch replay — the live
        # map may have grown past it via prefetch-ahead recording).
        # _replay_lengths: one-shot override for the next _order() (resume).
        self._order_lengths = None
        self._replay_lengths = None
        self._pool = (ThreadPoolExecutor(max_workers=num_data_threads)
                      if num_data_threads and num_data_threads > 0 else None)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _order(self):
        n = len(self.dataset)
        # Latch the map this epoch's order is computed from. The live map
        # keeps growing WHILE the epoch runs (prefetch-ahead recording), so
        # a mid-epoch checkpoint must save what _order saw — not the live
        # state — or the resumed epoch could flip from plain-shuffle to
        # length-sorted order and replay a different prefix.
        if self._replay_lengths is not None:
            lengths, self._replay_lengths = self._replay_lengths, None
        else:
            lengths = dict(self._lengths)
        self._order_lengths = lengths
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.default_rng((self.seed, self.epoch))
        perm = rng.permutation(n)

        if self.drop_remainder:
            # Drop the remainder BEFORE any length sorting: sorted windows
            # pin the longest items into the trailing partial batch, so
            # dropping it after sorting would systematically undertrain the
            # longest utterances. Pre-truncating drops a uniformly random
            # subset instead (identical to post-drop for plain shuffling).
            perm = perm[:(n // self.batch_size) * self.batch_size]

        n_used = len(perm)
        if self.length_sort_window and len(lengths) == n:
            window = max(1, self.length_sort_window) * self.batch_size
            sorted_perm = np.concatenate([
                sorted(perm[s:s + window], key=lengths.__getitem__)
                for s in range(0, n_used, window)])
            # Re-shuffle batch order so batches aren't presented short->long.
            # Only FULL batches shuffle; the partial batch (if any) stays
            # last so __iter__'s fixed-stride slicing keeps every batch
            # aligned with one sorted group.
            starts = np.arange(0, n_used, self.batch_size)
            num_full = n_used // self.batch_size
            full_starts = starts[:num_full].copy()
            rng.shuffle(full_starts)
            ordered = np.concatenate([full_starts, starts[num_full:]])
            perm = np.concatenate(
                [sorted_perm[s:s + self.batch_size] for s in ordered.astype(int)])
        return perm

    def _record_lengths(self, idxs, items):
        for idx, item in zip(idxs, items):
            max_len = 0
            for value in item.values():
                if isinstance(value, np.ndarray) and value.ndim > 1:
                    max_len = max(max_len, value.shape[0])
            self._lengths[int(idx)] = max_len

    def _load_items(self, idxs, use_pool=False):
        """Loads one batch of items. When the dataset supports native batch
        preloading (GIL-free C++ .npy reads), the heavy file I/O happens in
        one parallel call and per-item assembly follows inline; otherwise
        ``use_pool`` spreads the per-item Python file loads over the thread
        pool (the pre-pipelining strategy, still right for the pure-Python
        path where batch-level workers would just contend on the GIL)."""
        return load_items(self.dataset, idxs,
                          pool=self._pool if use_pool else None)

    def _build_batch(self, idxs, use_pool=False):
        """One complete batch: load + (optional) length recording + collate.
        This is the unit of pipeline parallelism — see __iter__."""
        items = self._load_items(idxs, use_pool=use_pool)
        if self.length_sort_window:
            self._record_lengths(idxs, items)
        collate = getattr(self.dataset, 'collate_fn', None)
        if collate is not None:
            return collate(items, bucket=self.bucket)
        return items

    def set_epoch(self, epoch):
        """Sets the shuffle-epoch counter keying the next ``__iter__``'s
        deterministic order. A resumed run calls this with ``start_epoch - 1``
        so training epoch N replays exactly the shuffled order the
        uninterrupted run would have used (the counter otherwise restarts at
        0 on every relaunch)."""
        self.epoch = int(epoch)

    def lengths_state(self):
        """The learned per-item length maps (index -> max frames), for
        checkpointing: with ``length_sort_window`` the batch order is a
        function of these lengths, so a mid-epoch resume needs them to
        replay the interrupted epoch's exact order. Two maps because they
        can differ mid-epoch: ``epoch_start`` is what this epoch's
        ``_order`` call saw (replays THIS epoch's order exactly, even when
        the order was a plain shuffle because the map was still
        incomplete), ``live`` includes everything recorded since (so the
        NEXT epochs' orders match the uninterrupted run's too)."""
        return {'epoch_start': dict(self._order_lengths or {}),
                'live': dict(self._lengths)}

    def set_lengths(self, state):
        """Restores a :meth:`lengths_state` snapshot (mid-epoch resume).
        Accepts the legacy flat ``{index: length}`` form as both maps."""
        def clean(d):
            return {int(k): int(v) for k, v in (d or {}).items()}

        if isinstance(state, dict) and state and \
                set(state) <= {'epoch_start', 'live'}:
            self._lengths = clean(state.get('live'))
            self._replay_lengths = clean(state.get('epoch_start'))
        else:
            self._lengths = clean(state)
            self._replay_lengths = dict(self._lengths)

    def set_skip_batches(self, n):
        """The next ``__iter__`` (only) skips its first ``n`` batches without
        loading or collating them — mid-epoch resume positions the iterator
        at the checkpointed batch in O(1)."""
        self.skip_batches = int(n)

    def iter_batch_indices(self):
        """Yields the epoch's batch index arrays — the ordering half of
        ``__iter__`` (shuffle, length-sorted windows, remainder dropping,
        mid-epoch skip), shared with the device-cached path where batch
        CONTENT never leaves the device (``data/device_cache.py``)."""
        order = self._order()
        self.epoch += 1

        batches = []
        for start in range(0, len(order), self.batch_size):
            idxs = order[start:start + self.batch_size]
            if self.drop_remainder and len(idxs) < self.batch_size:
                break
            batches.append(idxs)

        skip, self.skip_batches = self.skip_batches, 0
        if skip:
            batches = batches[skip:]
        return batches

    def __iter__(self):
        batches = self.iter_batch_indices()

        # Pipeline WHOLE batches across the thread pool (not just items
        # within one batch): while batch N is consumed, batches N+1..N+depth
        # load, assemble and collate concurrently. Only worthwhile when the
        # dataset's native preload carries the file I/O (C++ reader threads,
        # GIL-free) — pure-Python batch builds would contend on the GIL, so
        # that path keeps the classic per-item thread-pool loading instead.
        pipeline = (self._pool is not None
                    and getattr(self.dataset, 'supports_native_preload', False))
        if not pipeline:
            for idxs in batches:
                yield self._build_batch(idxs, use_pool=True)
            return

        # depth is capped to bound the host memory held by in-flight padded
        # batches.
        depth = min(max(2, self.num_data_threads), 4)
        futures = deque(self._pool.submit(self._build_batch, idxs)
                        for idxs in batches[:depth])
        next_batch = depth
        while futures:
            result = futures.popleft().result()
            if next_batch < len(batches):
                futures.append(
                    self._pool.submit(self._build_batch, batches[next_batch]))
                next_batch += 1
            yield result


class ToDeviceWrapper(object):
    r"""Wraps a loader, asynchronously staging each batch onto device(s).

    Numeric arrays are ``device_put`` (optionally with a sharding); strings
    and other non-numeric values pass through untouched. A background thread
    keeps ``prefetch`` batches in flight so the host pipeline overlaps with
    device compute.
    """

    def __init__(self, data_loader, sharding=None, prefetch=2, device=None,
                 transfer_dtype=None, device_transform=None,
                 device_cache=None):
        self.data_loader = data_loader
        self.sharding = sharding
        self.device = device  # explicit placement when no sharding is given
        self.prefetch = max(1, prefetch)
        # Device-resident corpus (data/device_cache.py): batches assemble ON
        # device from HBM arenas; the underlying loader supplies only the
        # index order. Multi-host: each process caches ITS OWN corpus shard
        # and assembly is a collective-free shard_map (the per-batch padded
        # lengths are harmonised once per epoch — see _iter_cached).
        self.device_cache = device_cache
        # Optional wire dtype for float32 SEQUENCE features (ndim >= 3):
        # bf16 halves host->device bytes — the binding term when the device
        # sits behind a bandwidth-limited link (see BASELINE.md e2e
        # analysis). Scalar/per-utterance floats (n_frames, ...) stay f32:
        # they parameterise masks and must stay exact.
        self.transfer_dtype = np.dtype(transfer_dtype) if transfer_dtype else None
        # Optional jitted post-put transform (device-side normalisation /
        # delta expansion — data/device_normalise.py): runs on already-placed
        # (and sharded) arrays; purely elementwise, so it issues no
        # collectives and is safe on whichever thread runs _put.
        self.device_transform = device_transform

    def __len__(self):
        return len(self.data_loader)

    def __getattr__(self, attr):
        return getattr(self.data_loader, attr)

    @staticmethod
    def _harmonise_shapes(features):
        """Multi-host only: re-pads each host's (locally bucketed) sequence
        features to the cross-host maximum length.

        Each host collates its OWN utterance shard, so per-host padded
        lengths generally land in different buckets; assembling a global
        array requires every host to agree on the shape. One small allgather
        of the per-key lengths (hosts iterate batches in lockstep, so the
        collective always matches up) establishes the common pad."""
        if jax.process_count() == 1:
            return features
        from jax.experimental import multihost_utils
        keys = sorted(k for k, v in features.items()
                      if isinstance(v, np.ndarray) and v.ndim >= 2
                      and v.dtype.kind in 'fiub')
        if not keys:
            return features
        local = np.array([features[k].shape[1] for k in keys], np.int32)
        lens = np.max(np.asarray(multihost_utils.process_allgather(local)),
                      axis=0)
        out = dict(features)
        for key, target in zip(keys, lens):
            value = features[key]
            if value.shape[1] < target:
                pad = [(0, 0)] * value.ndim
                pad[1] = (0, int(target) - value.shape[1])
                out[key] = np.pad(value, pad)
        return out

    def _put(self, features):
        if self.sharding is not None:
            features = self._harmonise_shapes(features)
        # Lossy wire dtype + device normalisation: the transform's host-side
        # hook swaps shiftable raw streams for centered residuals so the
        # cast below rounds |x - center|, not |x| (data/device_normalise.py).
        pre_put = getattr(self.device_transform, 'pre_put', None)
        if pre_put is not None:
            features = pre_put(features)
        # Streams the device transform insists on receiving in f32 (delta'd
        # device-normalised streams: wire rounding would be amplified by
        # sigma_x/sigma_delta in their normalised-delta keys).
        keep_f32 = getattr(self.device_transform, 'keep_f32', ())
        out = {}
        for key, value in features.items():
            if (self.transfer_dtype is not None
                    and isinstance(value, np.ndarray)
                    and value.dtype == np.float32 and value.ndim >= 3
                    and key not in keep_f32):
                value = value.astype(self.transfer_dtype)
            if isinstance(value, np.ndarray) and (value.dtype.kind in 'fiub'
                                                  or value.dtype == self.transfer_dtype):
                if self.sharding is not None:
                    # Multi-host aware: assembles the global batch from this
                    # host's local shard when running over DCN.
                    from morgana_tpu.parallel.mesh import put_global
                    try:
                        out[key] = put_global(value, self.sharding)
                    except ValueError:
                        if jax.process_count() > 1:
                            raise  # lockstep hazard: never place unevenly
                        # Final partial batch the data axis can't divide
                        # (single-host eval): place unsharded; GSPMD
                        # reshards inside the step as needed.
                        out[key] = jax.device_put(value)
                else:
                    out[key] = jax.device_put(value, self.device)
            else:
                out[key] = value
        if self.device_transform is not None:
            out = self.device_transform(out)
        return out

    def _iter_cached(self):
        """Device-cache iteration: batch indices from the loader's ordering
        machinery (shuffle / length-sort / skip all apply), content gathered
        from the HBM arenas — nothing but (B,) index vectors on the wire.

        Multi-host: per-batch padded lengths are harmonised across hosts
        with ONE allgather for the whole epoch up front (every host must
        assemble the same global batch shape), then each assemble is a
        collective-free shard_map program."""
        loader = self.data_loader
        cache = self.device_cache
        batches = loader.iter_batch_indices()
        lengths_list = None
        if getattr(cache, 'multihost', False):
            lengths_list = cache.harmonise_lengths(
                [cache.padded_lengths(idxs, bucket=loader.bucket)
                 for idxs in batches])
        for i, idxs in enumerate(batches):
            if loader.length_sort_window:
                # The host path learns lengths as it loads items; the cache
                # knows them outright. Record at the same per-batch cadence
                # so epoch orders match the host path exactly (epoch 1 is
                # plain-shuffled either way, epoch 2+ length-sorted).
                for idx in idxs:
                    loader._lengths[int(idx)] = int(
                        cache.item_lengths[int(idx)])
            # The device transform fuses INTO the assemble program (one
            # dispatch per batch; see DeviceCorpusCache.assemble).
            yield cache.assemble(
                idxs, bucket=loader.bucket, post=self.device_transform,
                lengths=None if lengths_list is None else lengths_list[i])

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error = []
        stop = threading.Event()

        if self.device_cache is not None:
            if jax.process_count() > 1:
                # Multi-host cached iteration runs SYNCHRONOUSLY on the
                # caller's thread: the epoch-level harmonising allgather and
                # every program launch must interleave identically with the
                # train-step launches on all hosts (one global collective
                # order). There is no host I/O to overlap anyway — assembly
                # is a device program over resident arenas.
                yield from self._iter_cached()
                return
            source = self._iter_cached()
            stage = lambda features: features  # noqa: E731 — already placed
        else:
            source = self.data_loader
            stage = self._put

        # Multi-host: _put issues a cross-host collective (the pad-harmonising
        # allgather). Collectives MUST all be enqueued from one thread in one
        # global order, or hosts can interleave batch-collectives with step-
        # collectives differently and deadlock — so the producer thread only
        # loads/collates (host-local work) and _put runs on the consumer
        # (main) thread, totally ordered with the train steps it feeds.
        put_in_producer = jax.process_count() == 1

        def put_or_stop(item):
            # Interruptible put: if the consumer abandons iteration (early
            # stop, exception), the producer must not block forever on a
            # full queue holding device-resident batches.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for features in source:
                    staged = stage(features) if put_in_producer else features
                    if not put_or_stop(staged):
                        return
            except BaseException as e:  # noqa: BLE001 - must surface in consumer
                error.append(e)
            finally:
                put_or_stop(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item if put_in_producer else stage(item)
        finally:
            # Runs on generator close/GC as well as normal exit: release the
            # producer and drop any staged batches.
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass


def batch(data_generator, batch_size=32, shuffle=True, num_data_threads=0,
          device=None, sharding=None, seed=0, drop_remainder=False, prefetch=2,
          length_sort_window=0, transfer_dtype=None, device_transform=None,
          device_cache=None):
    r"""Creates the batched, device-prefetching loader for a dataset
    (reference API: ``morgana/data.py:29-57``)."""
    loader = DataLoader(data_generator, batch_size=batch_size, shuffle=shuffle,
                        num_data_threads=num_data_threads, seed=seed,
                        drop_remainder=drop_remainder,
                        length_sort_window=length_sort_window)
    return ToDeviceWrapper(loader, sharding=sharding, prefetch=prefetch,
                           device=device, transfer_dtype=transfer_dtype,
                           device_transform=device_transform,
                           device_cache=device_cache)
