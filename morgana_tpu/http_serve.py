"""HTTP serving: a dependency-free REST endpoint over :class:`InferenceEngine`.

The reference had no serving story at all (generation required a full
``ExperimentBuilder`` test run); ``morgana_tpu.serve`` added the engine and
batch CLI, and this module puts a network front on it — stdlib
``http.server`` only, no web framework:

    python -m morgana_tpu.serve --model models/rnn_spss.py:LSTMAcousticModel \
        --checkpoint_path ckpt.npz --data_root data --http_port 8080

Endpoints
---------
``GET /healthz``
    ``{"status": "ok", "model": <class>, "checkpoint": <path>}`` — liveness
    probe for load balancers.
``GET /stats``
    Rolling observability: request/error counters, p50/p95 latency over the
    last 512 completed ``/predict`` requests, and (when dynamic batching is
    on) coalescing counters. Under overload with dynamic batching,
    ``/predict`` returns **503 + Retry-After** instead of queueing without
    bound.
``POST /predict``
    Body ``{"items": [{"name": ..., "<source>": <nested lists>, ...}]}``
    with one entry per test data source (what that source's ``load_file``
    returns). Runs the compiled bucketed predict (chunked by the engine's
    ``batch_size``) and returns ``{"results": {name: {key: nested lists}}}``
    with frame-level outputs unpadded to each utterance's true length.
``POST /stream``
    Body ``{"item": {...}, "chunk_frames": 64, "context": 32,
    "lookahead": 16}`` — ONE utterance. Responds with chunked
    transfer-encoding NDJSON: one ``{"chunk": {name: nested lists}}`` line
    per emitted block as it is computed (constant time-to-first-line), then
    a final ``{"done": true, "frames": N}`` line. Requires a model with the
    streaming hooks; a mid-stream failure emits an ``{"error": ...}`` line
    and closes.

Requests are served one at a time (the device runs one program at a time
anyway); the engine's compiled-program cache makes steady-state latency one
dispatch per batch.
"""
import base64
import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ['make_server', 'serve_forever']


class _Stats(object):
    """Rolling request stats for ``GET /stats``: counters + latency
    percentiles over the last ``window`` completed /predict requests."""

    def __init__(self, window=512):
        self._lock = threading.Lock()
        self._latency = deque(maxlen=window)
        self.requests = 0
        self.errors = 0

    def record(self, seconds, ok):
        with self._lock:
            self.requests += 1
            if ok:
                self._latency.append(seconds * 1e3)
            else:
                self.errors += 1

    def snapshot(self):
        with self._lock:
            lat = np.asarray(self._latency)
            out = {'requests': self.requests, 'errors': self.errors}
        if lat.size:
            out['latency_ms'] = {
                'p50': round(float(np.percentile(lat, 50)), 2),
                'p95': round(float(np.percentile(lat, 95)), 2),
                'n': int(lat.size)}
        return out


def _to_arrays(item):
    """JSON item -> feature dict: numeric lists become arrays (ints stay
    integral for duration-style features, floats become float32)."""
    out = {}
    for key, value in item.items():
        if key == 'name':
            out[key] = str(value)
            continue
        arr = np.asarray(value)
        if arr.dtype.kind == 'f':
            arr = arr.astype(np.float32)
        out[key] = arr
    return out


def _to_lists(outputs):
    return {key: np.asarray(value).tolist() for key, value in outputs.items()}


def make_server(engine, host='127.0.0.1', port=0, dynamic_batch_ms=0.0,
                watch_checkpoints=0.0):
    """Builds a ``ThreadingHTTPServer`` wrapping ``engine``. Returns the
    server; call ``.serve_forever()`` (or :func:`serve_forever`) to run it.
    ``port=0`` binds an ephemeral port (``server.server_address[1]``).

    ``engine`` is either ONE :class:`~morgana_tpu.serve.InferenceEngine` or
    a ``{name: engine}`` dict — multi-voice serving from one process/port.
    With several engines a request picks its voice with a top-level
    ``"model": <name>`` key (``/predict`` and ``/stream``); the FIRST dict
    entry is the default when the key is omitted. All engines share the one
    device lock (one chip, one program at a time); compiled programs,
    normalisers and parameters are per engine.

    ``watch_checkpoints > 0`` polls each engine's checkpoint directory
    every that-many seconds for a higher-epoch sibling (same
    ``epoch_{N}`` filename pattern) and hot-reloads it
    (:meth:`InferenceEngine.maybe_reload_newer_checkpoint`) — rolling
    model updates while training writes new epochs, no restart, no
    recompile. Reloads run under the device lock; failures (e.g. a
    half-written file) are logged and retried next poll.

    ``dynamic_batch_ms > 0`` routes ``/predict`` through a per-engine
    :class:`morgana_tpu.serve.DynamicBatcher`: concurrent requests for the
    SAME voice are coalesced into shared device batches (each waits at most
    that long for company), so N simultaneous single-utterance clients cost
    ~one dispatch round trip instead of N. The default engine's batcher is
    exposed as ``server.batcher`` (all of them as ``server.batchers``) and
    shut down by ``server.server_close()``."""
    from morgana_tpu.serve import Overloaded as _Overloaded

    engines = dict(engine) if isinstance(engine, dict) else {'default': engine}
    if not engines:
        raise ValueError('make_server needs at least one engine')
    default_name = next(iter(engines))

    lock = threading.Lock()  # one device, one request at a time
    stats = _Stats()
    batchers = {}
    if dynamic_batch_ms and float(dynamic_batch_ms) > 0:
        from morgana_tpu.serve import DynamicBatcher
        batchers = {name: DynamicBatcher(eng,
                                         max_wait_ms=float(dynamic_batch_ms),
                                         lock=lock)
                    for name, eng in engines.items()}
    batcher = batchers.get(default_name)

    def resolve(request):
        """(engine, batcher, error_payload) for a request body's 'model'."""
        name = request.get('model', default_name)
        if name not in engines:
            return None, None, {
                'error': f'unknown model {name!r}; '
                         f'serving: {sorted(engines)}'}
        return engines[name], batchers.get(name), None

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 enables chunked transfer-encoding for /stream; every
        # non-streamed reply carries an exact Content-Length (required for
        # 1.1 keep-alive correctness).
        protocol_version = 'HTTP/1.1'

        def _reply(self, code, payload, headers=None):
            try:
                # allow_nan=False: Python's default emits the NaN/Infinity
                # tokens, which are not JSON and break strict clients.
                body = json.dumps(payload, allow_nan=False).encode()
            except ValueError:
                code = 500
                body = json.dumps({'error': 'model output contains '
                                            'non-finite values'}).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            for name, value in (headers or {}).items():
                self.send_header(name, value)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/healthz':
                default = engines[default_name]
                payload = {'status': 'ok',
                           'model': type(default.model).__name__,
                           'checkpoint': default.checkpoint_path}
                if len(engines) > 1:
                    payload['models'] = {
                        name: {'model': type(eng.model).__name__,
                               'checkpoint': eng.checkpoint_path}
                        for name, eng in engines.items()}
                    payload['default'] = default_name
                self._reply(200, payload)
            elif self.path == '/stats':
                payload = stats.snapshot()

                def engine_info(name, eng):
                    from morgana_tpu.quantize import (
                        Int4QuantizedArray, QuantizedArray)
                    info = {
                        'model': type(eng.model).__name__,
                        'batch_size': eng.batch_size,
                        'quantized': any(
                            isinstance(v, (QuantizedArray,
                                           Int4QuantizedArray))
                            for v in getattr(eng, '_params', {}).values()),
                        'data_parallel': getattr(eng, '_mesh', None)
                        is not None}
                    # Batcher capacity differs per voice (max_batch defaults
                    # to the engine's batch_size), so it belongs HERE, not
                    # in a single global block an operator of a multi-voice
                    # fleet would misread.
                    b = batchers.get(name)
                    if b is not None:
                        info['dynamic_batching'] = {
                            'max_wait_ms': b.max_wait * 1e3,
                            'max_batch': b.max_batch,
                            'max_queue': b.max_queue}
                    return info

                payload['engine'] = engine_info(default_name,
                                                engines[default_name])
                if len(engines) > 1:
                    payload['engines'] = {name: engine_info(name, eng)
                                          for name, eng in engines.items()}
                if batchers:
                    # Counters aggregate across voices; per-voice capacity
                    # rides in each engine block above.
                    payload['dynamic_batching'] = {
                        'dispatch_groups': sum(b.batches_run
                                               for b in batchers.values()),
                        'requests_coalesced': sum(b.requests_coalesced
                                                  for b in batchers.values())}
                self._reply(200, payload)
            else:
                self._reply(404, {'error': f'unknown path {self.path}'})

        def _write_chunk(self, line):
            data = line.encode()
            self.wfile.write(f'{len(data):x}\r\n'.encode() + data + b'\r\n')
            self.wfile.flush()

        def _do_stream(self):
            if self.request_version == 'HTTP/1.0':
                # The NDJSON stream rides chunked transfer-encoding, which
                # HTTP/1.0 clients cannot parse — they would read the hex
                # chunk-size lines as body bytes.
                self._reply(505, {'error': '/stream requires HTTP/1.1 '
                                           '(chunked transfer encoding)'})
                return
            try:
                length = int(self.headers.get('Content-Length', 0))
                request = json.loads(self.rfile.read(length))
                engine, _, err = resolve(request)
                if err is not None:
                    self._reply(404, err)
                    return
                item = _to_arrays(request['item'])
                kwargs = {k: int(request[k])
                          for k in ('chunk_frames', 'context', 'lookahead')
                          if k in request}
                # Clients pick only from the pre-approved chunk
                # configurations: every NEW (chunk, context, lookahead)
                # combination permanently caches freshly-compiled programs,
                # so unvalidated values would let a remote caller force
                # unbounded compilation.
                allowed = getattr(engine, 'stream_configs', None) or \
                    {(64, 32, 16)}  # pre-stream_configs engines

                config = (kwargs.get('chunk_frames', 64),
                          kwargs.get('context', 32),
                          kwargs.get('lookahead', 16))
                if config not in allowed:
                    self._reply(400, {
                        'error': f'stream config {config} not served; '
                                 f'allowed: {sorted(allowed)}'})
                    return
                audio = bool(request.get('audio', False))
                gain = 1.0
                if audio:
                    kwargs['sample_rate'] = int(request.get('sample_rate',
                                                            16000))
                    # Streaming cannot apply the batch path's global
                    # peak-based clip protection (it needs the whole
                    # signal), so the operator/client sets the headroom:
                    # samples are encoded as clip(wav * gain) int16.
                    gain = float(request.get('gain', 1.0))
            except Exception as exc:  # noqa: BLE001 - malformed request
                self._reply(400, {'error': f'{type(exc).__name__}: {exc}'})
                return
            try:
                # Creating the stream validates the model AND the item up
                # front (streaming hooks present; audio needs the full WORLD
                # stream set; item assembly/collation runs here), so caller
                # mistakes get a clean 4xx BEFORE headers go out instead of
                # a mid-stream error line. In audio mode the engine takes
                # the device lock itself around each model chunk, keeping
                # the host-side vocoder DSP OUTSIDE the lock.
                if audio:
                    stream = iter(engine.stream_item_audio(
                        item, device_lock=lock, **kwargs))
                else:
                    stream = iter(engine.stream_item(item, **kwargs))
            except KeyError as exc:
                self._reply(400, {'error': f'missing feature {exc}'})
                return
            except (ValueError, NotImplementedError, TypeError) as exc:
                self._reply(400, {'error': f'{type(exc).__name__}: {exc}'})
                return
            except Exception as exc:  # noqa: BLE001 - server fault
                self._reply(500, {'error': f'{type(exc).__name__}: {exc}'})
                return
            self.send_response(200)
            self.send_header('Content-Type', 'application/x-ndjson')
            self.send_header('Transfer-Encoding', 'chunked')
            self.end_headers()
            frames = 0
            samples = 0
            try:
                # Hold the device lock only while COMPUTING a chunk, never
                # while writing to the client socket or running vocoder DSP:
                # a stalled reader (or heavy host-side synthesis) must not
                # block other requests' device work. Audio mode manages the
                # lock inside the engine generator (model chunk under lock,
                # vocoder outside), so it is consumed unlocked here.
                while True:
                    try:
                        if audio:
                            emitted = next(stream)
                        else:
                            with lock:
                                emitted = next(stream)
                    except StopIteration:
                        break
                    if audio:
                        chunk, wav = emitted
                        line = {'chunk': _to_lists(chunk)} if chunk else {}
                        # int16 PCM, base64 — NDJSON-safe raw audio; the
                        # client concatenates the decoded chunks.
                        pcm = np.clip(np.asarray(wav) * gain * 32767.0,
                                      -32768, 32767).astype('<i2')
                        line['wav_int16_b64'] = base64.b64encode(
                            pcm.tobytes()).decode('ascii')
                        samples += pcm.shape[0]
                    else:
                        chunk = emitted
                        line = {'chunk': _to_lists(chunk)}
                    if chunk:
                        frames += next(iter(chunk.values())).shape[0]
                    self._write_chunk(json.dumps(line, allow_nan=False)
                                      + '\n')
                done = {'done': True, 'frames': frames}
                if audio:
                    done['samples'] = samples
                    done['sample_rate'] = kwargs['sample_rate']
                self._write_chunk(json.dumps(done) + '\n')
                self.wfile.write(b'0\r\n\r\n')
            except Exception as exc:  # noqa: BLE001 - mid-stream fault
                # Headers are gone; the error travels as the final line.
                # OSError here means the CLIENT vanished — nothing left to
                # tell it, and the connection closes below either way.
                try:
                    self._write_chunk(json.dumps(
                        {'error': f'{type(exc).__name__}: {exc}'}) + '\n')
                    self.wfile.write(b'0\r\n\r\n')
                except OSError:
                    pass
            # The stream's framing is complete but trust is not: close the
            # connection rather than risk a desynced keep-alive reuse.
            self.close_connection = True

        def do_POST(self):
            if self.path == '/stream':
                self._do_stream()
                return
            if self.path != '/predict':
                self._reply(404, {'error': f'unknown path {self.path}'})
                return
            try:
                length = int(self.headers.get('Content-Length', 0))
                request = json.loads(self.rfile.read(length))
                engine, engine_batcher, err = resolve(request)
                if err is not None:
                    self._reply(404, err)
                    return
                items = [_to_arrays(item) for item in request['items']]
                names = [item.get('name', str(i))
                         for i, item in enumerate(items)]
                if len(set(names)) != len(names):
                    # Results key by name; duplicates would silently
                    # overwrite each other.
                    self._reply(400, {'error': 'duplicate item names'})
                    return
            except Exception as exc:  # noqa: BLE001 - malformed request
                self._reply(400, {'error': f'{type(exc).__name__}: {exc}'})
                return
            start = time.perf_counter()
            try:
                if engine_batcher is not None:
                    results = engine_batcher.predict_items(items)
                else:
                    with lock:
                        results = engine.predict_items(items)
                payload = {'results': {name: _to_lists(outputs)
                                       for name, outputs in results.items()}}
                stats.record(time.perf_counter() - start, ok=True)
            except _Overloaded as exc:
                # Backpressure, not failure: tell the client to retry.
                stats.record(time.perf_counter() - start, ok=False)
                self._reply(503, {'error': str(exc)},
                            headers={'Retry-After': '1'})
                return
            except KeyError as exc:
                # A missing data-source key is a caller mistake.
                stats.record(time.perf_counter() - start, ok=False)
                self._reply(400, {'error': f'missing feature {exc}'})
                return
            except Exception as exc:  # noqa: BLE001 - server fault, not caller
                stats.record(time.perf_counter() - start, ok=False)
                self._reply(500, {'error': f'{type(exc).__name__}: {exc}'})
                return
            # The success write sits OUTSIDE the compute try: an OSError
            # here means the CLIENT vanished after a successful prediction —
            # re-counting it as a server error and writing a second status
            # line onto the broken socket would both be wrong.
            try:
                self._reply(200, payload)
            except OSError:
                self.close_connection = True

        def log_message(self, fmt, *args):  # quiet by default
            pass

    watcher_stop = threading.Event()

    class Server(ThreadingHTTPServer):
        def server_close(self):
            watcher_stop.set()
            for b in batchers.values():
                b.close()
            super().server_close()

    server = Server((host, port), Handler)
    server.batcher = batcher
    server.batchers = batchers
    server.engines = engines

    if watch_checkpoints and float(watch_checkpoints) > 0:
        interval = float(watch_checkpoints)

        def watch():
            import logging
            log = logging.getLogger('morgana_tpu')
            while not watcher_stop.wait(interval):
                for name, eng in engines.items():
                    try:
                        # Under the device lock: a reload mutates module
                        # Params, which must not interleave with a predict
                        # trace's bind save/restore.
                        with lock:
                            reloaded = eng.maybe_reload_newer_checkpoint()
                        if reloaded:
                            log.info('hot-reloaded %s -> %s', name, reloaded)
                    except Exception as exc:  # noqa: BLE001 - retry next poll
                        log.warning('checkpoint watch for %s failed '
                                    '(%s: %s); retrying next poll',
                                    name, type(exc).__name__, exc)

        threading.Thread(target=watch, daemon=True,
                         name='morgana-checkpoint-watcher').start()
    return server


def serve_forever(engine, host='127.0.0.1', port=8080, dynamic_batch_ms=0.0,
                  watch_checkpoints=0.0):
    server = make_server(engine, host, port,
                         dynamic_batch_ms=dynamic_batch_ms,
                         watch_checkpoints=watch_checkpoints)
    mode = (f', dynamic batching {dynamic_batch_ms:g} ms'
            if server.batcher is not None else '')
    models = ' + '.join(f'{name}={type(eng.model).__name__}'
                        for name, eng in server.engines.items()) \
        if len(server.engines) > 1 \
        else type(next(iter(server.engines.values())).model).__name__
    print(f'serving {models} on '
          f'http://{host}:{server.server_address[1]} '
          f'(GET /healthz, POST /predict, POST /stream{mode})')
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
