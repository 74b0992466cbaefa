"""HTTP-serving latency benchmark: steady-state p50/p95 over the REST
endpoint, single-item and batched, plus a concurrent-client run.

Trains a tiny model for one epoch on a synthetic corpus, serves it via
``morgana_tpu.http_serve`` (ThreadingHTTPServer + engine lock) and measures
wall-clock request latency from the client side:

* ``single``      — sequential requests, one utterance each (the common
                    interactive path; after warmup the compiled program is
                    cached, so this is one device dispatch per request).
* ``batch8``      — sequential requests, eight utterances each.
* ``concurrent4`` — 4 client threads issuing single-item requests at once
                    (the engine lock serialises device work; measures queue
                    latency under contention).

Run: ``python benchmarks/bench_serve.py [num_requests] [--device cpu|tpu]``
Prints one JSON line per configuration.
"""
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', 'tests'))


def make_item(rng, name, frames=64):
    phones = max(2, frames // 4)
    return {'name': name,
            'lab': rng.random((phones, 600)).tolist(),
            'counters': rng.random((frames, 9)).tolist(),
            'lf0': rng.normal(size=(frames, 1)).tolist(),
            'vuv': (rng.random((frames, 1)) > 0.3).astype(float).tolist(),
            'dur': np.full((phones, 1), frames // phones).tolist(),
            'n_frames': [float(frames)]}


def post(port, items, timeout=600):
    body = json.dumps({'items': items}).encode()
    req = urllib.request.Request(
        f'http://127.0.0.1:{port}/predict', data=body,
        headers={'Content-Type': 'application/json'})
    start = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        json.loads(r.read())
    return (time.perf_counter() - start) * 1000.0  # ms


def percentiles(samples):
    arr = np.sort(np.asarray(samples))
    return {'p50_ms': round(float(np.percentile(arr, 50)), 2),
            'p95_ms': round(float(np.percentile(arr, 95)), 2),
            'mean_ms': round(float(arr.mean()), 2),
            'n': len(arr)}


def main():
    num_requests = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 120
    device = 'cpu'
    if '--device' in sys.argv:
        device = sys.argv[sys.argv.index('--device') + 1]

    from morgana_tpu import nn
    from morgana_tpu import platform as _platform
    if device:
        _platform.select_platform(device)

    # NOT tests/conftest: importing it would force the CPU backend and
    # silently override --device tpu (see benchmarks/common.py).
    from common import builder_args  # noqa: E402
    from tiny_models import TinyF0Model  # noqa: E402
    from morgana_tpu.data.synthetic import generate_voice_data
    from morgana_tpu.experiment_builder import ExperimentBuilder
    from morgana_tpu.serve import InferenceEngine
    from morgana_tpu.http_serve import make_server

    tmp = tempfile.mkdtemp(prefix='bench_serve_')
    data_root = os.path.join(tmp, 'data')
    generate_voice_data(data_root, num_train=8, num_valid=2, num_test=2, seed=0)
    args = builder_args(data_root, os.path.join(tmp, 'experiments'),
                        end_epoch=1, valid=False, test=False)
    nn.manual_seed(args['seed'])
    exp = ExperimentBuilder(TinyF0Model, experiment_name='srv_bench', **args)
    exp.run_experiment()
    ckpt = os.path.join(tmp, 'experiments', 'srv_bench', 'checkpoints', 'epoch_1.npz')

    engine = InferenceEngine(TinyF0Model, ckpt, data_root=data_root, batch_size=8)
    server = make_server(engine, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)
    try:
        # Warmup: compile the (1, bucket) and (8, bucket) predict programs.
        post(port, [make_item(rng, 'w0')])
        post(port, [make_item(rng, f'w{i}') for i in range(8)])

        single = [post(port, [make_item(rng, f's{i}')])
                  for i in range(num_requests)]
        print(json.dumps(dict({'config': 'single', 'device': device},
                              **percentiles(single))))

        batch = [post(port, [make_item(rng, f'b{i}_{j}') for j in range(8)])
                 for i in range(max(10, num_requests // 4))]
        print(json.dumps(dict({'config': 'batch8', 'device': device},
                              **percentiles(batch))))

        def run_concurrent(config_name, srv_port):
            # Items are pre-built on the main thread: numpy Generators are
            # not thread-safe, and item construction shouldn't be in the
            # timed region anyway.
            per_client = max(5, num_requests // 8)
            prebuilt = [[[make_item(rng, f'{config_name}_{t}_{i}')]
                         for i in range(per_client)] for t in range(4)]
            lat = []
            lock = threading.Lock()

            def client(tid):
                for items in prebuilt[tid]:
                    ms = post(srv_port, items)
                    with lock:
                        lat.append(ms)

            threads = [threading.Thread(target=client, args=(t,))
                       for t in range(4)]
            start = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            elapsed = time.perf_counter() - start
            stats = percentiles(lat)
            stats['requests_per_sec'] = round(len(lat) / elapsed, 1)
            print(json.dumps(dict({'config': config_name, 'device': device},
                                  **stats)))

        run_concurrent('concurrent4', port)
    finally:
        server.shutdown()
        server.server_close()

    # Same concurrent load with dynamic batching: simultaneous requests
    # coalesce into shared device batches (one dispatch round trip for the
    # group instead of one per request).
    server = make_server(engine, port=0, dynamic_batch_ms=5.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        # Warm every padded batch-count program the batcher can hit
        # ((1|2|4|8) x bucket): coalesced group sizes vary with timing, and
        # a cold compile mid-run would be charged to queueing.
        for n in (1, 2, 4, 8):
            post(port, [make_item(rng, f'w_dyn{n}_{j}') for j in range(n)])
        run_concurrent('concurrent4_dynbatch', port)
        print(json.dumps({
            'config': 'concurrent4_dynbatch_stats', 'device': device,
            'dispatch_groups': server.batcher.batches_run,
            'requests_coalesced': server.batcher.requests_coalesced}))
    finally:
        server.shutdown()
        server.server_close()

    # Single-item latency with int8 weight-only quantization (4x less
    # parameter HBM; dequantisation fused into the matmuls). On a tiny CPU
    # model the weights are not the bottleneck, so this row mainly proves
    # the path and prices the dequant overhead honestly.
    q_engine = InferenceEngine(TinyF0Model, ckpt, data_root=data_root,
                               batch_size=8, quantize='int8')
    server = make_server(q_engine, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        post(port, [make_item(rng, 'wq0')])
        single_q = [post(port, [make_item(rng, f'q{i}')])
                    for i in range(num_requests)]
        print(json.dumps(dict({'config': 'single_int8', 'device': device},
                              **percentiles(single_q))))
    finally:
        server.shutdown()
        server.server_close()


if __name__ == '__main__':
    main()
