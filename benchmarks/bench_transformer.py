"""Transformer acoustic-model train-step benchmark: the MXU showcase.

Measures the fused train step of ``models/transformer_spss.py`` at flagship
shapes (same batch/frames/schema as the headline LSTM bench, so the two are
directly comparable) and reports frames/s + analytical-FLOP MFU against the
empirically measured roofline peak (``bench.measure_peak_tflops``).

Why this exists: the LSTM flagship is *latency*-bound (a chain of small
matmuls), so its MFU ceiling is low by construction. Attention has O(1)
sequential depth — every matmul is (B·T, d)-sized — so this benchmark is
where the framework's compute path should approach the chip's measured
speed of light.

Run: ``python benchmarks/bench_transformer.py [--layers 6 --d_model 512
--heads 8 --d_ff 2048 --dtype bfloat16 --no-peak]``
Prints one JSON line. Tunnel rules apply (CLAUDE.md): readback-barriered
sustained timing is the primary number, bursts secondary.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'models'))


def analytical_train_flops(batch, frames, d_model, num_layers, num_heads,
                           d_ff, in_dim=609, out_dim=199):
    """Matmul FLOPs of one transformer train step over PADDED frames
    (what the MXU executes); backward costs 2x forward, hence 3x."""
    t, e, f = frames, d_model, d_ff
    per_layer = (
        6 * t * e * e          # fused QKV projection
        + 4 * t * t * e        # logits + probs·V (summed over heads)
        + 2 * t * e * e        # output projection
        + 4 * t * e * f        # FFN in + out
    )
    per_item = num_layers * per_layer + 2 * t * in_dim * e + 2 * t * e * out_dim
    return 3.0 * batch * per_item


def measure(d_model, num_layers, num_heads, d_ff, dtype, batch, frames,
            remat=False, attention_backend='auto'):
    import jax
    import jax.numpy as jnp
    import bench
    from __graft_entry__ import install_unit_normalisers
    from morgana_tpu import nn
    from morgana_tpu.training import TrainLoop, build_optimizer
    from transformer_spss import TransformerAcousticModel

    nn.set_default_compute_dtype(dtype if dtype != 'float32' else None)
    nn.manual_seed(0)
    model = install_unit_normalisers(TransformerAcousticModel(
        num_layers=num_layers, d_model=d_model, num_heads=num_heads,
        d_ff=d_ff, remat=remat, attention_backend=attention_backend))
    model.mode = 'train'
    loop = TrainLoop(model, build_optimizer(), ema_decay=0.99, seed=0)

    rng = np.random.default_rng(0)
    features, frames_per_batch = bench.make_batch(rng, batch=batch,
                                                  frames=frames)
    # Stage the batch on device once: this is a COMPUTE benchmark (e2e
    # disk->device throughput is bench.bench_e2e). Repeated numpy args
    # usually dedup on the tunnel's upload path, but staging makes that
    # explicit instead of relying on it.
    features = {k: jax.device_put(jnp.asarray(v))
                if isinstance(v, np.ndarray) and v.dtype.kind in 'fiub' else v
                for k, v in features.items()}

    for _ in range(2):
        loss, _, _ = loop.train_step(features, lr=1e-4)
    jax.block_until_ready(loss)

    # Burst rounds (secondary; spread = throttle transparency).
    round_times = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(5):
            loss, _, _ = loop.train_step(features, lr=1e-4)
        jax.block_until_ready(loss)
        round_times.append(time.perf_counter() - t0)
    burst = min(round_times) / 5

    # Primary: continuous steps to a scalar readback, best of 3 mini-runs.
    steps = 15
    run_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            loss, _, _ = loop.train_step(features, lr=1e-4)
        float(loss)
        run_times.append((time.perf_counter() - t0) / steps)
    step_time = min(run_times)

    flops = analytical_train_flops(batch, frames, d_model, num_layers,
                                   num_heads, d_ff)
    return {
        'config': f'{num_layers}L d{d_model} h{num_heads} ff{d_ff} {dtype}'
                  + (' remat' if remat else '')
                  + (f' {attention_backend}'
                     if attention_backend != 'auto' else ''),
        'batch': batch, 'frames': frames,
        'frames_per_sec': float(frames_per_batch / step_time),
        'ms_per_step': round(step_time * 1e3, 2),
        'burst_ms_per_step': round(burst * 1e3, 2),
        'throttle_ratio': round(float(np.median(round_times) / min(round_times)), 2),
        'sustained_spread': round(max(run_times) / step_time, 2),
        'flops_per_step': flops,
        'achieved_tflops': round(flops / step_time / 1e12, 1),
        'loss': float(loss),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument('--layers', type=int, default=6)
    parser.add_argument('--d_model', type=int, default=512)
    parser.add_argument('--heads', type=int, default=8)
    parser.add_argument('--d_ff', type=int, default=2048)
    parser.add_argument('--dtype', default='bfloat16',
                        choices=['bfloat16', 'float32'])
    parser.add_argument('--batch', type=int, default=32)
    parser.add_argument('--frames', type=int, default=640)
    parser.add_argument('--remat', action='store_true')
    parser.add_argument('--attention_backend', default='auto',
                        choices=['auto', 'xla', 'flash', 'splash'])
    parser.add_argument('--no-peak', action='store_true',
                        help='skip the roofline probe (reuse a known peak)')
    parser.add_argument('--peak', type=float, default=None,
                        help='measured peak TF/s to compute MFU against')
    args = parser.parse_args(argv)

    out = measure(args.d_model, args.layers, args.heads, args.d_ff,
                  args.dtype, args.batch, args.frames, remat=args.remat,
                  attention_backend=args.attention_backend)

    peak = args.peak
    if peak is None and not args.no_peak:
        # Subprocess-isolated: a second measurement in the same interpreter
        # reads ~30x slow on the shared TPU runtime (see bench.py).
        import bench
        probe = bench._run_bench_code(
            'import bench, json; print("BENCH_JSON:" + json.dumps('
            '{"peak": bench.measure_peak_tflops()}))')
        peak = probe['peak']
    if peak:
        out['measured_peak_tflops'] = round(peak, 1)
        out['mfu'] = round(out['achieved_tflops'] / peak, 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
