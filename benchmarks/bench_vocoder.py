"""Vocoder synthesis throughput: host (C++ / numpy) vs on-device batch.

The host paths synthesise one utterance at a time on a CPU core (the
reference's only option — pyworld is host C++); `vocoder/jax_world.py`
synthesises a whole BATCH as one compiled XLA program on the accelerator.
Prints one JSON line with frames/sec per backend (a frame = one 5 ms
vocoder frame; realtime factor = frames_per_sec / 200).

Usage: python benchmarks/bench_vocoder.py [batch] [frames] [--device cpu]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FS = 16000
HOP = 80


def make_batch(batch, frames, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(frames)
    f0 = 140.0 + 15 * np.sin(2 * np.pi * t / 50.0)
    bins = np.linspace(0, FS / 2, 513)
    env = (0.6 * np.exp(-0.5 * ((bins - 700) / 180.0) ** 2)
           + 0.4 * np.exp(-0.5 * ((bins - 1800) / 260.0) ** 2) + 1e-3)
    from morgana_tpu.vocoder import world
    mcep = world.spectrum_to_mcep(np.tile((env ** 2)[None], (frames, 1)),
                                  fs=FS)
    f0s = np.tile(f0[None], (batch, 1)) * (1 + 0.02 * rng.standard_normal(
        (batch, 1)))
    vuv = np.ones((batch, frames))
    mceps = np.tile(mcep[None], (batch, 1, 1)).astype(np.float64)
    baps = np.full((batch, frames, 5), -8.0)
    seq_len = np.full(batch, frames, np.int64)
    return f0s, vuv, mceps, baps, seq_len


def bench_host(f0, vuv, mcep, bap, rounds=3):
    from morgana_tpu.vocoder import world
    batch, frames = f0.shape
    best = float('inf')
    for _ in range(rounds):
        t0 = time.perf_counter()
        for i in range(batch):
            world.synthesize_world_feats(f0[i], vuv[i], mcep[i], bap[i], FS)
        best = min(best, time.perf_counter() - t0)
    return batch * frames / best


def bench_device(f0, vuv, mcep, bap, seq_len, rounds=3):
    from morgana_tpu.vocoder import jax_world
    batch, frames = f0.shape
    noise = np.random.default_rng(0).standard_normal(
        (batch, frames * HOP)).astype(np.float32)
    # Warm up (compile), then best-of-rounds with a readback barrier and
    # fresh operands per round (tunnel benchmarking rules: see CLAUDE.md).
    waves, _ = jax_world.synthesize_batch(f0, vuv, mcep, bap, seq_len, FS,
                                          noise=noise)
    float(waves[0, -1])
    best = float('inf')
    for r in range(rounds):
        f0_r = f0 * (1.0 + 1e-4 * (r + 1))
        t0 = time.perf_counter()
        waves, _ = jax_world.synthesize_batch(f0_r, vuv, mcep, bap, seq_len,
                                              FS, noise=noise)
        barrier = float(waves[-1, -1]) + float(waves[0, 0])
        best = min(best, time.perf_counter() - t0)
    del barrier
    return batch * frames / best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('batch', nargs='?', type=int, default=16)
    parser.add_argument('frames', nargs='?', type=int, default=600)
    parser.add_argument('--device', choices=('cpu',), default=None)
    args = parser.parse_args()
    if args.device == 'cpu':
        from morgana_tpu import platform
        platform.force_cpu()

    f0, vuv, mcep, bap, seq_len = make_batch(args.batch, args.frames)
    host_fps = bench_host(f0, vuv, mcep, bap)
    device_fps = bench_device(f0, vuv, mcep, bap, seq_len)
    import jax
    print(json.dumps({
        'metric': 'vocoder_frames_per_sec',
        'batch': args.batch, 'frames': args.frames,
        'host_frames_per_sec': round(host_fps, 1),
        'device_frames_per_sec': round(device_fps, 1),
        'device_vs_host': round(device_fps / host_fps, 2),
        'host_realtime_x': round(host_fps / 200.0, 1),
        'device_realtime_x': round(device_fps / 200.0, 1),
        'backend': jax.default_backend(),
    }))


if __name__ == '__main__':
    main()
