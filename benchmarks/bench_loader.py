"""Loader-throughput micro-bench: native C++ batch reads vs the GIL thread pool.

Generates a synthetic on-disk voice corpus, then measures utterances/sec for
one full pass of the DataLoader under three configurations:

* ``python``        — per-file np.load, inline (the naive baseline)
* ``threads``       — per-file np.load in the GIL-bound Python thread pool
                      (the reference's --num_data_threads analogue)
* ``native``        — one GIL-free C++ threaded batch read per batch
                      (csrc/batch_io.cpp), assembly in the thread pool

Run: ``python benchmarks/bench_loader.py [num_utts] [frames]``
Prints one JSON line per configuration.
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

from morgana_tpu.data import native_io  # noqa: E402
from morgana_tpu.data.dataset import FilesDataset  # noqa: E402
from morgana_tpu.data.loader import DataLoader  # noqa: E402
from morgana_tpu.data.sources import NumpyBinarySource  # noqa: E402


def make_corpus(root, num_utts, frames, rng):
    feats = {'lab': 600, 'lf0': 1, 'mcep': 60, 'bap': 5}
    train = os.path.join(root, 'train')
    ids = []
    for name, dim in feats.items():
        os.makedirs(os.path.join(train, name), exist_ok=True)
    for i in range(num_utts):
        utt = f'utt_{i:04d}'
        ids.append(utt)
        n = int(rng.integers(frames // 2, frames))
        for name, dim in feats.items():
            np.save(os.path.join(train, name, f'{utt}.npy'),
                    rng.normal(size=(n, dim)).astype(np.float32))
    with open(os.path.join(train, 'ids.scp'), 'w') as f:
        f.write('\n'.join(ids) + '\n')
    return {name: NumpyBinarySource(name, use_deltas=name == 'lf0')
            for name in feats}


def run_pass(dataset, threads, use_native, batch_size=32):
    if not use_native:
        # Disable the native preload path for this pass.
        preload, dataset.preload_batch = dataset.preload_batch, lambda idxs: {}
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                        num_data_threads=threads)
    count = 0
    start = time.perf_counter()
    for batch in loader:
        count += len(batch['name'])
    elapsed = time.perf_counter() - start
    if not use_native:
        dataset.preload_batch = preload
    return count / elapsed


def main():
    num_utts = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    rng = np.random.default_rng(0)

    with tempfile.TemporaryDirectory() as root:
        sources = make_corpus(root, num_utts, frames, rng)
        dataset = FilesDataset(sources, 'train', 'train/ids.scp', {}, root)

        configs = [('python', 0, False), ('threads', 8, False)]
        if native_io.native_available():
            configs.append(('native', 8, True))

        results = {}
        for name, threads, use_native in configs:
            run_pass(dataset, threads, use_native)  # warm page cache
            rate = max(run_pass(dataset, threads, use_native) for _ in range(3))
            results[name] = rate
            print(json.dumps({'config': name, 'utts_per_sec': round(rate, 1)}))

        if 'native' in results:
            print(json.dumps({
                'metric': 'loader_native_speedup_vs_threads',
                'value': round(results['native'] / results['threads'], 2),
                'unit': 'x'}))


if __name__ == '__main__':
    main()
