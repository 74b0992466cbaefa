"""Deployment inference: serve a trained checkpoint without the experiment
scaffolding.

The reference's only generation path is a full ``ExperimentBuilder`` test run
(``morgana/experiment_builder.py:682-693``): it needs the ``experiments/<name>``
directory layout, the whole flag surface and three data loaders. In production
you have a checkpoint and a directory of utterances. :class:`InferenceEngine`
is the serving-shaped surface for that: build once (model + normalisers +
checkpoint + a compiled predict program), then call it repeatedly —

    engine = InferenceEngine(LSTMAcousticModel, 'epoch_50.npz', data_root='data')
    outputs = engine.predict_ids(['utt_001', 'utt_002'])   # unpadded feature dicts
    stats = engine.generate('out')                          # wav synthesis + stats

Batches are padded to the same length buckets the training loader uses
(``data/dataset.py::bucket_size``), so the engine compiles a handful of
programs total and reuses them across calls — steady-state latency is one
device dispatch per batch.

CLI (one command from checkpoint to synthesised outputs)::

    python -m morgana_tpu.serve --model models/rnn_spss.py:LSTMAcousticModel \
        --checkpoint_path experiments/voice/checkpoints/epoch_50.npz \
        --data_root data --data_dir test --id_list test/test_file_id_list.scp \
        --out_dir generated
"""
import argparse
import importlib
import importlib.util
import json
import os
import re
import tempfile
import threading
import time

import numpy as np

from morgana_tpu import nn
from morgana_tpu import platform as _platform

__all__ = ['InferenceEngine', 'StreamingSession', 'DynamicBatcher',
           'Overloaded', 'load_model_class', 'load_exported_program', 'main']


class Overloaded(RuntimeError):
    """Raised by :class:`DynamicBatcher` when the pending-request queue is
    full — backpressure for callers (the HTTP layer maps it to 503)."""


def load_exported_program(path):
    """Loads a :meth:`InferenceEngine.export_program` StableHLO artifact and
    returns it as a jitted callable ``fn(params, batch, rng) -> (staged,
    outputs)``.

    Runs without the model class / data sources / normalisers — the artifact
    IS the compiled program; callers supply same-shape inputs (shapes are
    validated by the export's signature).
    """
    import jax
    from jax import export as jax_export

    with open(path, 'rb') as f:
        exported = jax_export.deserialize(f.read())
    return jax.jit(exported.call)


def load_model_class(spec):
    """Resolves ``'pkg.module:ClassName'`` or ``'path/to/file.py:ClassName'``."""
    if ':' not in spec:
        raise ValueError(f"--model must be 'module:Class' or 'file.py:Class', got {spec!r}")
    target, class_name = spec.rsplit(':', 1)
    if target.endswith('.py'):
        name = os.path.splitext(os.path.basename(target))[0]
        module_spec = importlib.util.spec_from_file_location(name, target)
        module = importlib.util.module_from_spec(module_spec)
        module_spec.loader.exec_module(module)
    else:
        module = importlib.import_module(target)
    return getattr(module, class_name)


def _check_unique(names):
    """Results are keyed by utterance name; duplicates would silently
    overwrite each other's outputs (the HTTP layer replies 400 for the same
    reason — the Python API raises)."""
    seen = set()
    dupes = sorted({str(n) for n in names if str(n) in seen or seen.add(str(n))})
    if dupes:
        raise ValueError(f'duplicate utterance names: {dupes}')


class InferenceEngine(object):
    r"""Persistent predict/synthesis engine for one trained model.

    Parameters
    ----------
    model_class : type
        A :class:`~morgana_tpu.base_models.BaseModel` subclass.
    checkpoint_path : str
        ``epoch_{N}.npz`` checkpoint (an EMA twin works the same).
    data_root : str
        Root containing the normalisation parameter files and data dirs.
    normalisation_dir : str
        Sub-directory of ``data_root`` with the ``{name}_mvn/_minmax.json``
        files (same contract as training).
    model_kwargs : dict, optional
    device : str, optional
        Platform to serve on ('tpu', 'cpu', ...); decided before any JAX
        backend initialises, failing loudly otherwise.
    compute_dtype : str, optional
        E.g. ``'bfloat16'`` for bf16 MXU matmuls at inference.
    batch_size, num_data_threads : int
        Loader settings for the file-driven entry points.
    analysis_kwargs : dict, optional
        Extra kwargs for the model's analysis hooks (e.g. ``sample_rate``).
    quantize : str, optional
        ``'int8'`` serves weight-only quantized parameters
        (:mod:`morgana_tpu.quantize`): 4x less parameter HBM/host memory,
        dequantisation fused into the consuming matmuls. ``'int4'`` packs
        two weights per byte with group-wise scales (~8x less weight
        memory, slightly higher error). A checkpoint produced by
        ``python -m morgana_tpu.quantize`` is detected and served
        quantized automatically (no flag needed).
    data_parallel : bool
        Shard prediction batches over ALL local devices (params replicated,
        batch dim over a 'data' mesh axis — the GSPMD recipe the trainer
        uses): corpus generation throughput scales with the slice. Batches
        the device count cannot divide (ragged final chunks) fall back to
        single-device placement, so any id-list length works.
    """

    def __init__(self, model_class, checkpoint_path, data_root='.',
                 normalisation_dir='train', model_kwargs=None, device=None,
                 compute_dtype=None, batch_size=8, num_data_threads=0,
                 analysis_kwargs=None, seed=0, compilation_cache_dir=None,
                 stream_configs=None, quantize=None, data_parallel=False):
        if quantize not in (None, 'int8', 'int4'):
            raise ValueError(
                f"quantize must be None, 'int8' or 'int4', got {quantize!r}")
        if device:
            _platform.select_platform(device)
        if compute_dtype:
            nn.set_default_compute_dtype(compute_dtype)
        if compilation_cache_dir:
            # Persistent compile cache: restarted serving processes reload
            # their per-bucket predict programs from disk instead of
            # recompiling (cold-start elimination across process churn).
            _platform.enable_compilation_cache(compilation_cache_dir)

        import jax  # after platform selection

        self.data_root = data_root
        self.checkpoint_path = checkpoint_path
        self.batch_size = int(batch_size)
        self.num_data_threads = int(num_data_threads)
        self.analysis_kwargs = dict(analysis_kwargs or {})
        # (chunk_frames, context, lookahead) tuples the HTTP /stream
        # endpoint will serve — each combination compiles (and permanently
        # caches) its own programs, so the set is operator-chosen, never
        # client-chosen.
        self.stream_configs = {tuple(int(v) for v in cfg)
                               for cfg in (stream_configs or [(64, 32, 16)])}

        nn.manual_seed(seed)
        self.model = model_class(**(model_kwargs or {}))
        normalisers = self.model.normaliser_sources()
        for name in normalisers:
            normalisers[name].load_params(normalisation_dir, data_root)
        self.model.normalisers = normalisers
        self._quantize = quantize
        self._mesh = None
        self._batch_sharding = None
        if data_parallel:
            from morgana_tpu import parallel
            self._mesh = parallel.make_mesh()
            self._batch_sharding = parallel.batch_sharding(self._mesh)
        self._params = self._load_checkpoint_params(checkpoint_path)
        # One consistent mode for EVERY compiled predict program: predict()
        # bodies read self.mode at trace time (e.g. metric accumulation into
        # self.metrics[self.mode]), so tracing some programs with mode '' and
        # others with 'test' would poison whichever traces first.
        self.model.mode = 'test'
        self._rng = jax.random.PRNGKey(seed)
        model = self.model

        def predict_step(params, batch, rng):
            with nn.bind(model, params, rng=rng, train=False):
                model.metrics.begin_staging('predict')
                outputs = model.predict(batch)
                staged = model.metrics.drain_staged_values()
            return staged, outputs

        self._predict_step = jax.jit(predict_step)

    # ----------------------------------------------------------------- core

    def _load_checkpoint_params(self, checkpoint_path):
        """Loads a checkpoint into a serving-ready parameter pytree: float
        or pre-quantized artifact, engine-level int8 quantization applied,
        replicated over the data-parallel mesh when one exists. The module's
        Params always hold floats (analysis hooks and bind's save/restore
        see ordinary arrays); the jitted predict consumes the returned
        pytree."""
        import jax

        from morgana_tpu import quantize as quantize_mod
        if quantize_mod.is_quantized_checkpoint(checkpoint_path):
            params = quantize_mod.load_quantized_checkpoint(checkpoint_path)
            nn.load_parameters(self.model,
                               quantize_mod.dequantize_params(params))
        else:
            self.model.load_parameters(checkpoint_path)
            params = nn.parameters(self.model)
        if self._quantize in ('int8', 'int4'):
            params = quantize_mod.quantize_params(
                params, bits=4 if self._quantize == 'int4' else 8)
        if self._mesh is not None:
            from morgana_tpu import parallel
            params = jax.device_put(
                params, parallel.replicated_sharding(self._mesh))
        return params

    def reload_checkpoint(self, checkpoint_path):
        """Hot-swaps the served parameters to another checkpoint of the
        same architecture — rolling model updates without restarting the
        process or recompiling (shapes/dtypes unchanged, so every compiled
        program is reused). The swap is one reference assignment: requests
        in flight finish on the old parameters — streams included, which
        snapshot the pytree at stream start so one utterance is never a
        splice of two models — and the next ``predict_batch``
        serves the new ones. Engine-level quantization and data-parallel
        replication are re-applied. Raises (and keeps serving the OLD
        parameters' pytree for future calls made before the module reload)
        if the checkpoint does not match the model."""
        params = self._load_checkpoint_params(checkpoint_path)
        self._params = params
        self.checkpoint_path = checkpoint_path
        return checkpoint_path

    def maybe_reload_newer_checkpoint(self):
        """Polls the current checkpoint's directory for a higher-epoch
        sibling (same ``epoch_{N}`` filename pattern) and hot-reloads the
        newest one. Returns the reloaded path, or None when already
        current. One poll step of :func:`watch_checkpoints`."""
        match = re.match(r'^(.*epoch_)(\d+)(\D.*\.npz|\.npz)$',
                         os.path.basename(self.checkpoint_path))
        if not match:
            return None
        prefix, current, suffix = match.group(1), int(match.group(2)), \
            match.group(3)
        ckpt_dir = os.path.dirname(self.checkpoint_path) or '.'
        best, best_epoch = None, current
        try:
            names = os.listdir(ckpt_dir)
        except OSError:
            return None
        for name in names:
            m = re.match(rf'^{re.escape(prefix)}(\d+){re.escape(suffix)}$',
                         name)
            if m and int(m.group(1)) > best_epoch:
                best_epoch = int(m.group(1))
                best = os.path.join(ckpt_dir, name)
        if best is None:
            return None
        return self.reload_checkpoint(best)

    def _next_rng(self):
        import jax
        self._rng, key = jax.random.split(self._rng)
        return key

    def predict_batch(self, features):
        """Runs the compiled predict program on one collated (padded) batch.
        Returns ``(staged_metrics, output_features)`` as device values."""
        from morgana_tpu.training import numeric_features
        batch = numeric_features(features)
        if self._batch_sharding is not None:
            batch = self._shard_batch(batch)
        return self._predict_step(self._params, batch, self._next_rng())

    def _shard_batch(self, batch):
        """Places numeric batch arrays into the data-parallel layout; a
        batch the 'data' axis cannot divide (ragged final chunk) stays
        single-device — GSPMD still runs it against the replicated params."""
        import jax
        out = {}
        for key, value in batch.items():
            if hasattr(value, 'dtype') and value.dtype.kind in 'fiub':
                try:
                    out[key] = jax.device_put(value, self._batch_sharding)
                except ValueError:
                    out[key] = jax.device_put(value)
            else:
                out[key] = value
        return out

    def export_program(self, features, path):
        """AOT-exports the compiled predict program for this batch's padded
        shapes as a serialized StableHLO artifact (``jax.export``).

        The artifact is a deployable, runtime-independent compilation unit:
        :func:`load_exported_program` runs it without the model's Python
        class, data sources, or normaliser files — only the checkpoint's
        parameter pytree and same-shape batches. One artifact per padded
        shape (= per length bucket); export each bucket you serve.

        Parameters
        ----------
        features : dict
            One collated (padded) batch whose array shapes/dtypes define the
            program's signature (its values are not baked in).
        path : str
            Output file. Returns ``path``.
        """
        import jax
        from jax import export as jax_export
        from morgana_tpu.training import numeric_features

        args = (self._params, numeric_features(features), self._rng)
        # Only shapes/dtypes are needed — read them without pulling device
        # arrays (the whole parameter pytree) back to host.
        avals = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x), getattr(x, 'dtype', None) or np.asarray(x).dtype),
            args)
        exported = jax_export.export(self._predict_step)(*avals)
        with open(path, 'wb') as f:
            f.write(exported.serialize())
        return path

    def _unpad(self, features, outputs):
        """Strips batch padding from frame-level outputs: every (B, T_pad, D)
        array becomes a list of (t_i, D) arrays cut at each utterance's
        ``n_frames``; everything else converts to numpy unchanged."""
        seq_len = features.get('n_frames')
        if seq_len is not None:
            seq_len = np.asarray(seq_len).astype(np.int64).reshape(-1)
        out = {}
        for key, value in outputs.items():
            arr = np.asarray(value)
            # Only (B, T_pad, D...) arrays are unpadded: requiring ndim >= 3
            # keeps utterance-level (B, D) outputs (e.g. embeddings) intact
            # rather than misreading D as a padded time axis.
            if seq_len is not None and arr.ndim >= 3 and arr.shape[0] == len(seq_len) \
                    and arr.shape[1] >= seq_len.max():
                out[key] = [arr[b, :seq_len[b]] for b in range(arr.shape[0])]
            else:
                out[key] = arr
        return out

    # --------------------------------------------------------- file-driven

    def _loader(self, data_dir, id_list=None, file_ids=None, sources=None):
        # An explicit file_ids list needs no id-list file on disk at all:
        # FilesDataset accepts a path, so write one to the SYSTEM temp dir
        # (never into data_root — it may be a read-only mount) and remove it
        # before returning; the dataset reads it eagerly in its constructor.
        from morgana_tpu import data

        tmp = None
        try:
            if id_list is None:
                if not file_ids:
                    raise ValueError('pass id_list or a non-empty file_ids list')
                fd, tmp = tempfile.mkstemp(suffix='.scp', prefix='serve_ids_')
                with os.fdopen(fd, 'w') as f:
                    f.write('\n'.join(file_ids))
                id_list = tmp
            dataset = data.FilesDataset(
                sources or self.model.test_data_sources(), data_dir, id_list,
                self.model.normalisers, self.data_root)
        finally:
            if tmp:
                os.unlink(tmp)
        return data.batch(dataset, batch_size=self.batch_size, shuffle=False,
                          num_data_threads=self.num_data_threads,
                          sharding=self._batch_sharding)

    def predict_items(self, items, sources=None):
        """In-memory serving: no files needed. ``items`` is a list of
        per-utterance dicts mapping each test data-source name to its raw
        loaded feature (what that source's ``load_file`` returns, e.g. a
        ``(seq_len, dim)`` array for a ``NumpyBinarySource``); an optional
        ``'name'`` key labels the utterance. Delta expansion, normalisation
        and bucketed collation run exactly as the file pipeline, then one
        compiled predict. Returns ``{name: outputs}`` with frame-level
        outputs unpadded.

        ``sources`` overrides the model's test data sources — e.g. a subset
        holding only ``predict()``'s true inputs, so generation-time callers
        (``morgana_tpu.pipeline``) need not fabricate training targets the
        sources would otherwise demand."""
        from morgana_tpu.data import assemble_item, collate

        names = [str(item.get('name', i)) for i, item in enumerate(items)]
        _check_unique(names)
        if sources is None:
            sources = self.model.test_data_sources()
        built = []
        for i, item in enumerate(items):
            built.append(assemble_item(
                sources, self.model.normalisers,
                lambda name, source: source.package(item[name]),
                str(item.get('name', i))))
        results = {}
        # Chunk like the file-driven loader: one giant batch would pad every
        # item to the longest utterance's bucket and compile a fresh program
        # per unseen (N, bucket) shape.
        for start in range(0, len(built), self.batch_size):
            features = collate(built[start:start + self.batch_size])
            _, outputs = self.predict_batch(features)
            unpadded = self._unpad(features, outputs)
            for b, name in enumerate(features['name']):
                results[name] = {
                    k: (v[b] if isinstance(v, list) else np.asarray(v)[b])
                    for k, v in unpadded.items()}
        return results

    def predict_ids(self, file_ids, data_dir='test'):
        """Predicts the given utterance ids; returns ``{id: outputs}`` with
        frame-level outputs unpadded to each utterance's true length."""
        _check_unique(file_ids)
        loader = self._loader(data_dir, file_ids=file_ids)
        results = {}
        done = 0
        for features in loader:
            _, outputs = self.predict_batch(features)
            unpadded = self._unpad(features, outputs)
            # collate always emits 'name'; the slice of the request is the
            # fallback (a per-batch str(i) would collide across batches).
            names = features.get('name') or \
                file_ids[done:done + len(next(iter(unpadded.values())))]
            for b, name in enumerate(names):
                results[name] = {
                    k: (v[b] if isinstance(v, list) else np.asarray(v)[b])
                    for k, v in unpadded.items()}
            done += len(names)
        return results

    def generate(self, out_dir, data_dir='test', id_list=None, file_ids=None):
        """Predicts a whole split and runs the model's test analysis hooks
        (e.g. WORLD synthesis to ``.wav``) — the serving equivalent of the
        reference's ``run_test`` (``morgana/experiment_builder.py:682-693``).
        Returns throughput stats."""
        import jax

        loader = self._loader(data_dir, id_list=id_list, file_ids=file_ids)
        os.makedirs(out_dir, exist_ok=True)
        self.model.metrics.reset_state('test')
        utterances = 0
        frames = 0.0
        outputs = None
        start = time.perf_counter()
        for features in loader:
            staged, outputs = self.predict_batch(features)
            self.model.metrics.apply_staged(staged, tag='predict')
            self.model.analysis_for_test_batch(features, outputs, out_dir,
                                               **self.analysis_kwargs)
            if 'n_frames' in features:
                frames += float(np.asarray(features['n_frames']).sum())
            utterances += len(features.get('name', [])) or \
                int(np.asarray(features['n_frames']).shape[0])
        self.model.analysis_for_test_epoch(out_dir, **self.analysis_kwargs)
        if outputs is not None:
            jax.block_until_ready(outputs)
        elapsed = time.perf_counter() - start
        stats = {'utterances': utterances, 'frames': int(frames),
                 'seconds': round(elapsed, 3),
                 'frames_per_sec': round(frames / elapsed, 1) if elapsed else 0.0,
                 'out_dir': out_dir}
        metrics = self.model.metrics.results_as_json_dict('test')
        if metrics:
            stats['metrics'] = metrics
        return stats

    # ----------------------------------------------------------- streaming

    def _stream_session(self, chunk_frames, context, lookahead):
        # One session per chunk configuration, cached: a session owns the
        # jit-compiled chunk programs, so recreating it per call would
        # retrace and recompile every utterance.
        if not hasattr(self, '_stream_sessions'):
            self._stream_sessions = {}
        key = (int(chunk_frames), int(context), int(lookahead))
        if key not in self._stream_sessions:
            self._stream_sessions[key] = StreamingSession(
                self, chunk_frames=chunk_frames, context=context,
                lookahead=lookahead)
        return self._stream_sessions[key]

    def stream_item(self, item, chunk_frames=64, context=32, lookahead=16,
                    sources=None):
        """Streams ONE in-memory utterance (same item format as
        :meth:`predict_items`): returns a generator of
        ``{name: (new_frames, D) array}`` chunks. Requires the model to
        implement the streaming hooks (``stream_inputs`` / ``stream_step`` /
        ``stream_output_spec``). ``sources`` overrides the model's test
        data sources (see :meth:`predict_items`)."""
        from morgana_tpu.data import assemble_item, collate

        if sources is None:
            sources = self.model.test_data_sources()
        built = assemble_item(
            sources, self.model.normalisers,
            lambda name, source: source.package(item[name]),
            str(item.get('name', 0)))
        features = collate([built])
        session = self._stream_session(chunk_frames, context, lookahead)
        return session.stream(features)

    def stream_id(self, file_id, data_dir='test', chunk_frames=64,
                  context=32, lookahead=16):
        """Streams one on-disk utterance by id; see :meth:`stream_item`."""
        loader = self._loader(data_dir, file_ids=[file_id])
        features = next(iter(loader))
        session = self._stream_session(chunk_frames, context, lookahead)
        return session.stream(features)

    def stream_item_audio(self, item, chunk_frames=64, context=32,
                          lookahead=16, sample_rate=16000, frame_period=5.0,
                          sources=None, device_lock=None):
        """Streams one utterance all the way to AUDIO: yields
        ``(feature_chunk, wav_chunk)`` pairs where ``wav_chunk`` is the
        float64 samples finalised by that feature chunk (possibly empty
        while the vocoder's excitation window fills; the final pair carries
        the flush). Requires a model whose streaming outputs cover the full
        WORLD parameter set (lf0, vuv, mcep, bap).

        The waveform equals the NUMPY batch synthesis of the streamed
        features (:class:`morgana_tpu.vocoder.StreamingSynthesizer`,
        bitwise vs ``_synthesize_numpy`` with the same seed, up to the
        batch path's global clip-protection rescale; the native batch
        library's noise stream differs) with ONE
        deliberate recipe difference from the analysis hooks: f0 is NOT
        ``smooth_f0``'d — that Savitzky-Golay filter needs future frames,
        so it cannot run causally; streamed f0 carries the model's raw
        frame-to-frame contour (lf0 clipped at 8 ≈ 3 kHz as a guard).

        ``device_lock`` (optional): a lock to hold around each MODEL chunk
        computation only — the host-side vocoder DSP runs outside it, so a
        server can share one device among concurrent streams without
        serialising their synthesis work (``http_serve`` passes its device
        lock here)."""
        from morgana_tpu.vocoder import StreamingSynthesizer

        session = self._stream_session(chunk_frames, context, lookahead)
        needed = {'lf0', 'vuv', 'mcep', 'bap'}
        have = set(session.spec)
        if not needed <= have:
            raise ValueError(
                f'audio streaming needs streamed outputs {sorted(needed)}; '
                f'{type(self.model).__name__} streams {sorted(have)} '
                '(use stream_item for feature-only streaming)')
        synth = StreamingSynthesizer(sample_rate, frame_period=frame_period,
                                     seed=0)
        # Eager: item assembly/collation (and its KeyErrors for missing
        # features) happen HERE, not at the first next() — callers like the
        # HTTP layer validate before committing to a streamed response.
        feature_stream = iter(self.stream_item(
            item, chunk_frames=chunk_frames, context=context,
            lookahead=lookahead, sources=sources))
        sentinel = object()

        def next_chunk():
            if device_lock is not None:
                with device_lock:
                    return next(feature_stream, sentinel)
            return next(feature_stream, sentinel)

        def generate():
            chunk = None
            while True:
                got = next_chunk()
                if got is sentinel:
                    break
                chunk = got
                f0 = np.exp(np.clip(chunk['lf0'][:, 0], None, 8.0))
                wav = synth.push_world_feats(f0, chunk['vuv'][:, 0],
                                             chunk['mcep'], chunk['bap'])
                yield chunk, wav
            tail = synth.flush()
            if tail.shape[0]:
                yield ({} if chunk is None else
                       {k: v[:0] for k, v in chunk.items()}), tail

        return generate()


class StreamingSession(object):
    """Chunked streaming inference: constant time-to-first-frame regardless
    of utterance length (beyond the reference, which generates whole
    utterances only — ``morgana/experiment_builder.py:639-680``).

    TPU-native design: the network runs as ONE jit-compiled fixed-shape
    chunk program (``(1, chunk_frames, D_in)``) whose recurrent state is
    carried between calls — no per-length compilation, no padding to the
    utterance bucket. Trajectory smoothing runs through
    :class:`morgana_tpu.streaming.StreamingMLPG` windows (also one compiled
    shape). Emission is aligned across all declared outputs, delayed by the
    MLPG lookahead.

    Reusable across utterances: each :meth:`stream` call is an independent
    generator; the compiled programs are shared.
    """

    def __init__(self, engine, chunk_frames=64, context=32, lookahead=16):
        import jax

        self.engine = engine
        self.chunk_frames = int(chunk_frames)
        self.context = int(context)
        self.lookahead = int(lookahead)
        model = engine.model
        self.spec = model.stream_output_spec()

        def inputs_fn(params, batch, rng):
            with nn.bind(model, params, rng=rng, train=False):
                return model.stream_inputs(batch)

        def step_fn(params, chunk, state, rng):
            with nn.bind(model, params, rng=rng, train=False):
                return model.stream_step(chunk, state)

        self._inputs_fn = jax.jit(inputs_fn)
        self._step_fn = jax.jit(step_fn)

    def stream(self, features):
        """Generator over one collated single-utterance batch: yields
        ``{name: (new_frames, D) np.ndarray}`` with every yielded dict
        covering the SAME frame range across names (names from the model's
        ``stream_output_spec``)."""
        import jax
        import jax.numpy as jnp
        from morgana_tpu.streaming import StreamingMLPG
        from morgana_tpu.training import numeric_features

        engine = self.engine
        rng = jax.random.PRNGKey(0)
        batch = numeric_features(features)
        # Snapshot the parameters for the WHOLE stream: a checkpoint
        # hot-reload (serve --watch_checkpoints) between chunks would
        # otherwise splice two models into one utterance — carried RNN/KV
        # state from the old weights continuing under the new ones. Batch
        # requests in flight already finish on the old parameters
        # (reload_checkpoint's contract); streams get the same guarantee.
        params = engine._params
        inputs = self._inputs_fn(params, batch, rng)
        if inputs.shape[0] != 1:
            raise ValueError('streaming serves one utterance per session; '
                             f'got a batch of {inputs.shape[0]}')
        if 'n_frames' in features:
            n_frames = int(np.asarray(features['n_frames']).reshape(-1)[0])
        else:
            n_frames = inputs.shape[1]

        chunk_size = self.chunk_frames
        buffers, drained = {}, 0
        for name in self.spec:
            buffers[name] = []

        # All MLPG streams sharing a burn-in size fuse into ONE windowed
        # solve per chunk (the streaming counterpart of MLPG_streams):
        # lanes concatenate inside each delta-window group, so one device
        # dispatch smooths lf0+mcep+bap together instead of one per stream.
        from morgana_tpu.ops.deltas import DEFAULT_WINDOWS
        num_windows = len(DEFAULT_WINDOWS)
        groups = {}
        for name, spec in self.spec.items():
            if spec is None:
                continue
            means_key, variances, padding_size = spec
            variances = np.asarray(variances, np.float32).reshape(-1)
            dim = variances.size // num_windows
            groups.setdefault(int(padding_size), []).append(
                (name, means_key, dim, variances))
        mlpg_streams = []
        for padding_size, members in groups.items():
            var_cat = np.concatenate(
                [v.reshape(num_windows, d) for (_, _, d, v) in members],
                axis=1).reshape(-1)
            mlpg_streams.append((members, StreamingMLPG(
                var_cat, chunk_size, context=self.context,
                lookahead=self.lookahead, padding_size=padding_size)))

        def push_mlpg(outputs, valid):
            for members, sm in mlpg_streams:
                parts = [np.asarray(outputs[mk])[:, :valid]
                         .reshape(1, valid, num_windows, d)
                         for (_, mk, d, _) in members]
                got = sm.push(
                    np.concatenate(parts, axis=3).reshape(1, valid, -1))
                _split_emitted(got, members)

        def flush_mlpg():
            for members, sm in mlpg_streams:
                _split_emitted(sm.flush(), members)

        def _split_emitted(got, members):
            if not got.shape[1]:
                return
            offset = 0
            for name, _, d, _ in members:
                buffers[name].append(got[0, :, offset:offset + d])
                offset += d

        def drain(done):
            # Buffers hold only not-yet-yielded frames (yielded frames are
            # dropped, so a long stream retains O(lookahead) frames, not the
            # whole history).
            ready = min(sum(a.shape[0] for a in parts)
                        for parts in buffers.values())
            if ready == 0:
                return None, done
            out = {}
            for name, parts in buffers.items():
                whole = parts[0] if len(parts) == 1 \
                    else np.concatenate(parts, axis=0)
                out[name] = whole[:ready]
                buffers[name] = [whole[ready:]]
            return out, done + ready

        state = None
        for start in range(0, n_frames, chunk_size):
            valid = min(chunk_size, n_frames - start)
            chunk = inputs[:, start:start + valid]
            if valid < chunk_size:
                # Fixed compiled shape: zero-pad the final partial chunk
                # (never emitted; only the carried state would see it, and
                # the stream ends here).
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((1, chunk_size - valid) + chunk.shape[2:],
                                      chunk.dtype)], axis=1)
            outputs, state = self._step_fn(params, chunk, state, rng)
            for name, spec in self.spec.items():
                if spec is None:
                    buffers[name].append(np.asarray(outputs[name])[0, :valid])
            push_mlpg(outputs, valid)
            out, drained = drain(drained)
            if out is not None:
                yield out

        flush_mlpg()
        out, drained = drain(drained)
        if out is not None:
            yield out
        if drained != n_frames:
            raise RuntimeError(
                f'stream emitted {drained} of {n_frames} frames')


class DynamicBatcher(object):
    """Coalesces concurrent :meth:`InferenceEngine.predict_items` calls into
    shared device batches — the production answer to serialised per-request
    dispatch (the reference has no serving at all;
    ``morgana/experiment_builder.py:682-693`` is its closest analogue).

    Why: on a device where each dispatch pays a fixed round-trip cost
    (measured ~35-40 ms over the TPU tunnel, BASELINE.md serving table),
    N concurrent single-utterance requests served one-at-a-time cost
    N round trips. Coalesced into one collated batch they cost ~one. The
    MXU prefers the batched shape anyway.

    Mechanics: callers block in :meth:`predict_items` while a worker thread
    gathers requests for up to ``max_wait_ms`` (or until ``max_batch``
    utterances are pending), renames items to collision-free internal ids,
    runs ONE engine call for the group, and hands each caller back exactly
    its own results under its own names. To keep the compiled-program count
    bounded, group sizes are padded up to the next power of two (capped at
    ``max_batch``) by repeating the first item — static-shape discipline on
    the batch axis, mirroring the length bucketing of
    ``data/dataset.py::bucket_size``.

    A failing coalesced group falls back to per-request execution so one
    malformed request cannot fail innocent neighbours.

    Parameters
    ----------
    engine : InferenceEngine
    max_wait_ms : float
        How long a forming group waits for more company once AT LEAST TWO
        requests are pending. A lone request never waits (it dispatches
        immediately — default-on batching adds zero latency to sequential
        traffic); 0 disables the window entirely but still coalesces
        whatever is already queued (opportunistic batching under backlog).
    max_batch : int, optional
        Utterance budget per group (default: the engine's ``batch_size``).
    lock : threading.Lock, optional
        Device lock shared with other request paths (e.g. ``/stream``).
    max_queue : int, optional
        Backpressure bound: when more than this many UTTERANCES are already
        pending, :meth:`predict_items` raises :class:`Overloaded` instead of
        queueing without limit (default: ``32 * max_batch``).
    """

    def __init__(self, engine, max_wait_ms=5.0, max_batch=None, lock=None,
                 max_queue=None):
        self.engine = engine
        self.max_wait = float(max_wait_ms) / 1e3
        self.max_batch = int(max_batch or engine.batch_size)
        if self.max_batch < 1:
            raise ValueError('max_batch must be >= 1')
        self.max_queue = int(max_queue or 32 * self.max_batch)
        self.lock = lock if lock is not None else threading.Lock()
        self.batches_run = 0        # observability: device dispatch groups
        self.requests_coalesced = 0
        self._cv = threading.Condition()
        self._pending = []
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name='morgana-dynamic-batcher')
        self._worker.start()

    def predict_items(self, items):
        """Same contract and results as ``engine.predict_items(items)``;
        blocks until this request's group has run."""
        if not items:
            return {}
        # Per-request duplicate names fail fast HERE (the engine would see
        # only collision-free internal names); duplicates ACROSS concurrent
        # requests are fine — every caller gets its own result dict.
        _check_unique([str(item.get('name', i))
                       for i, item in enumerate(items)])
        req = {'items': list(items), 'event': threading.Event(),
               'results': None, 'error': None}
        with self._cv:
            if self._closed:
                raise RuntimeError('DynamicBatcher is closed')
            queued = sum(len(r['items']) for r in self._pending)
            # Reject only under load (an empty queue admits any size: a
            # request larger than max_queue must still be servable).
            if queued and queued + len(req['items']) > self.max_queue:
                raise Overloaded(
                    f'{queued} utterances already pending '
                    f'(max_queue={self.max_queue}); retry later')
            self._pending.append(req)
            self._cv.notify()
        req['event'].wait()
        if req['error'] is not None:
            raise req['error']
        return req['results']

    def close(self):
        """Stops the worker after draining already-queued requests."""
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._worker.join(timeout=30)

    # ------------------------------------------------------------- internals

    def _run(self):
        while True:
            with self._cv:
                while not self._pending and not self._closed:
                    self._cv.wait()
                if not self._pending:
                    return  # closed and drained
                # Gather-window policy: a LONE request never waits — it
                # dispatches immediately, so default-on dynamic batching
                # adds zero latency to sequential traffic. The max_wait
                # window only opens with >= 2 requests already pending
                # (concurrency evidence); requests arriving during a
                # dispatch queue up and coalesce into the next group
                # naturally either way.
                if self.max_wait > 0 and not self._closed \
                        and len(self._pending) > 1:
                    deadline = time.monotonic() + self.max_wait
                    while sum(len(r['items'])
                              for r in self._pending) < self.max_batch:
                        left = deadline - time.monotonic()
                        if left <= 0 or self._closed:
                            break
                        self._cv.wait(timeout=left)
                group, total = [], 0
                while self._pending:
                    n = len(self._pending[0]['items'])
                    if group and total + n > self.max_batch:
                        break
                    group.append(self._pending.pop(0))
                    total += n
            self._execute(group)

    @staticmethod
    def _padded_count(n, cap):
        """Next power of two >= n, capped: bounds the set of batch-count
        shapes (hence compiled programs) to log2(cap)+1 per length bucket."""
        size = 1
        while size < n:
            size *= 2
        return min(size, max(n, cap))

    def _execute(self, group):
        renamed, owners = [], []
        for gi, req in enumerate(group):
            for ii, item in enumerate(req['items']):
                internal = dict(item)
                internal['name'] = f'__dyn{gi}.{ii}'
                renamed.append(internal)
                owners.append((req, str(item.get('name', ii)), internal['name']))
        pad = self._padded_count(len(renamed), self.max_batch) - len(renamed)
        for p in range(pad):
            filler = dict(renamed[0])
            filler['name'] = f'__dynpad{p}'
            renamed.append(filler)
        try:
            with self.lock:
                results = self.engine.predict_items(renamed)
            self.batches_run += 1
            self.requests_coalesced += len(group)
            split = {}
            for req, public, internal in owners:
                split.setdefault(id(req), {})[public] = results[internal]
            for req in group:
                req['results'] = split.get(id(req), {})
                req['event'].set()
        except Exception:
            # Isolate the fault: rerun each request alone so one bad item
            # (e.g. a missing feature key) fails only its own caller.
            for req in group:
                try:
                    with self.lock:
                        req['results'] = self.engine.predict_items(req['items'])
                    self.batches_run += 1
                    self.requests_coalesced += 1
                except Exception as exc:  # noqa: BLE001 - delivered to caller
                    req['error'] = exc
                req['event'].set()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Serve a trained morgana_tpu checkpoint: batch prediction '
                    'and synthesis without the experiment scaffolding.')
    parser.add_argument('--model', default=None,
                        help="Model class: 'pkg.module:Class' or 'file.py:Class' "
                             '(required unless --fleet is given).')
    parser.add_argument('--checkpoint_path', default=None)
    parser.add_argument('--data_root', default='.')
    parser.add_argument('--normalisation_dir', default='train')
    parser.add_argument('--data_dir', default='test')
    parser.add_argument('--id_list', default=None,
                        help='Id-list file (relative to --data_root). Defaults '
                             'to the conventional '
                             '{data_dir}/{data_dir}_file_id_list.scp.')
    parser.add_argument('--out_dir', default='generated')
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--num_data_threads', type=int, default=0)
    parser.add_argument('--device', default=None)
    parser.add_argument('--compute_dtype', default=None)
    parser.add_argument('--model_kwargs', default='{}',
                        help='Python-dict string of model constructor kwargs.')
    parser.add_argument('--analysis_kwargs', default='{}',
                        help='Python-dict string of analysis-hook kwargs.')
    parser.add_argument('--data_parallel', action='store_true', default=False,
                        help='Shard prediction batches over all local devices '
                             '(params replicated): corpus generation '
                             'throughput scales with the slice.')
    parser.add_argument('--quantize', default=None,
                        choices=['int8', 'int4'],
                        help='Serve weight-only quantized parameters: int8 '
                             '(4x less parameter memory) or int4 (packed '
                             'nibbles + group-wise scales, ~8x). '
                             'Dequantisation is fused into the matmuls. '
                             'Pre-quantized checkpoints (python -m '
                             'morgana_tpu.quantize) are detected without '
                             'this flag.')
    parser.add_argument('--compilation_cache_dir', default=None,
                        help='Persistent JAX compile cache: restarted serving '
                             'processes reload compiled programs from here '
                             'instead of recompiling.')
    parser.add_argument('--stream_configs', default='64,32,16',
                        help='Semicolon-separated chunk_frames,context,'
                             'lookahead triples the HTTP /stream endpoint '
                             'serves (each compiles its own programs, so '
                             'the set is operator-chosen).')
    parser.add_argument('--http_port', type=int, default=None,
                        help='Serve over HTTP on this port instead of batch '
                             'generation (GET /healthz, POST /predict).')
    parser.add_argument('--fleet', default=None,
                        help='Multi-voice serving: JSON file mapping voice '
                             'name -> engine spec ({"model", '
                             '"checkpoint_path", optional "model_kwargs"/'
                             '"data_root"/"normalisation_dir"/"batch_size"/'
                             '"quantize"/"analysis_kwargs"}); unset fields '
                             'inherit this command\'s flags. Requires '
                             '--http_port; requests pick a voice with a '
                             'top-level "model" key. Overrides --model/'
                             '--checkpoint_path.')
    parser.add_argument('--http_host', default='127.0.0.1')
    parser.add_argument('--watch_checkpoints', type=float, default=0.0,
                        help='Poll every N seconds for a higher-epoch '
                             'checkpoint next to the served one and '
                             'hot-reload it (rolling updates while training '
                             'writes new epochs; HTTP mode only, applies to '
                             'every fleet voice).')
    parser.add_argument('--dynamic_batch_ms', type=float, default=5.0,
                        help='Coalesce concurrent /predict requests into '
                             'shared device batches, each waiting at most '
                             'this long for company (0 opts out and serves '
                             'requests individually). Default ON (5 ms): N '
                             'simultaneous clients cost ~one device dispatch '
                             'instead of N — measured 1.6x throughput at '
                             '0.6x median latency on a tunnelled TPU, and '
                             'an improvement even on a 1-core CPU host '
                             '(BASELINE.md serving table). Sequential '
                             'clients never wait (a lone request dispatches '
                             'immediately).')
    args = parser.parse_args(argv)

    if args.fleet is None and (args.model is None
                               or args.checkpoint_path is None):
        parser.error('--model and --checkpoint_path are required '
                     '(or pass --fleet)')
    if args.fleet is not None and args.http_port is None:
        parser.error('--fleet serves over HTTP; add --http_port')

    if args.id_list is None and args.http_port is None:
        base = os.path.basename(os.path.normpath(args.data_dir))
        candidate = os.path.join(args.data_dir, f'{base}_file_id_list.scp')
        if os.path.exists(os.path.join(args.data_root, candidate)):
            args.id_list = candidate
        else:
            parser.error(f'--id_list is required (no conventional id list at '
                         f'{os.path.join(args.data_root, candidate)})')

    import ast

    def build_engine(spec, first):
        def get(key, fallback):
            return spec.get(key, fallback) if spec else fallback
        kwargs = get('model_kwargs', None)
        if kwargs is None:
            kwargs = ast.literal_eval(args.model_kwargs)
        analysis = get('analysis_kwargs', None)
        if analysis is None:
            analysis = ast.literal_eval(args.analysis_kwargs)
        return InferenceEngine(
            load_model_class(get('model', args.model)),
            get('checkpoint_path', args.checkpoint_path),
            data_root=get('data_root', args.data_root),
            normalisation_dir=get('normalisation_dir', args.normalisation_dir),
            model_kwargs=kwargs,
            # Platform/dtype/cache selection is process-global: the FIRST
            # engine owns it, the rest inherit.
            device=args.device if first else None,
            compute_dtype=args.compute_dtype if first else None,
            batch_size=int(get('batch_size', args.batch_size)),
            num_data_threads=args.num_data_threads,
            analysis_kwargs=analysis,
            compilation_cache_dir=(args.compilation_cache_dir
                                   if first else None),
            quantize=get('quantize', args.quantize),
            data_parallel=args.data_parallel,
            stream_configs=[tuple(int(v) for v in cfg.split(','))
                            for cfg in args.stream_configs.split(';') if cfg])

    if args.fleet is not None:
        with open(args.fleet) as f:
            fleet = json.load(f)
        if not isinstance(fleet, dict) or not fleet:
            parser.error(f'--fleet {args.fleet} must be a non-empty JSON '
                         'object of name -> engine spec')
        engine = {}
        for i, (name, spec) in enumerate(fleet.items()):
            if not isinstance(spec, dict):
                parser.error(f'--fleet entry {name!r} must be a JSON object '
                             f'(got {type(spec).__name__})')
            if 'checkpoint_path' not in spec:
                parser.error(f"--fleet entry {name!r} needs 'checkpoint_path'")
            if 'model' not in spec and args.model is None:
                parser.error(f"--fleet entry {name!r} needs 'model' "
                             '(or pass a shared --model)')
            engine[name] = build_engine(spec, first=(i == 0))
    else:
        engine = build_engine(None, first=True)

    if args.http_port is not None:
        from morgana_tpu.http_serve import serve_forever
        serve_forever(engine, host=args.http_host, port=args.http_port,
                      dynamic_batch_ms=args.dynamic_batch_ms,
                      watch_checkpoints=args.watch_checkpoints)
        return
    stats = engine.generate(args.out_dir, data_dir=args.data_dir,
                            id_list=args.id_list)
    print(json.dumps(stats))


if __name__ == '__main__':
    main()
