"""Train-step config sweep: backend / dtype / unroll / shapes.

The headline benchmark (``bench.py``) measures a fixed flagship workload.
This tool is for *tuning*: it measures one train-step configuration per
invocation (one config per process — a second measurement in the same
interpreter reads ~30x slow on the shared TPU runtime) so configs can be
compared back-to-back within one chip window, e.g.::

    python benchmarks/bench_step.py --backend scan --dtype bfloat16 --unroll 64
    python benchmarks/bench_step.py --backend wavefront --batch 64 --frames 1280

Sweep mode runs each config in its own subprocess and prints a table::

    python benchmarks/bench_step.py --sweep unroll=8,32,64

Found with this tool (see BASELINE.md): recurrent-scan unroll 64 is ~3x
faster than the default 8 at flagship shapes; the MLPG solves are unroll-
neutral; the wavefront backend tracks the per-layer scan.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(backend, dtype, unroll, batch, frames, steps, rounds,
            remat=False):
    import bench

    if remat:
        # Global recurrent-layer rematerialisation (the --remat training
        # flag): activations recompute in the backward, trading FLOPs for
        # the HBM that caps large-batch x unroll configs (BASELINE.md
        # round-2 batch-scaling note).
        from morgana_tpu import nn
        nn.set_default_remat(True)
    # MEASURE_* are read at call time inside bench_tpu; shapes must be
    # passed explicitly (module globals were bound into signature defaults
    # at import time).
    bench.MEASURE_STEPS = steps
    bench.MEASURE_ROUNDS = rounds
    return bench.bench_tpu(backend, dtype if dtype != 'float32' else None,
                           unroll=unroll, batch_size=batch, frames=frames)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument('--backend', default='scan',
                        choices=['scan', 'pallas', 'wavefront'])
    parser.add_argument('--dtype', default='bfloat16',
                        choices=['bfloat16', 'float32'])
    parser.add_argument('--unroll', type=int, default=8)
    parser.add_argument('--batch', type=int, default=32)
    parser.add_argument('--frames', type=int, default=640)
    parser.add_argument('--steps', type=int, default=5,
                        help='Steps per timed round (short bursts: the '
                             'shared chip throttles sustained load).')
    parser.add_argument('--rounds', type=int, default=6,
                        help='Timed rounds; best-of-rounds is reported.')
    parser.add_argument('--remat', action='store_true', default=False,
                        help='Recurrent rematerialisation (the --remat '
                             'training flag); frees the HBM that caps '
                             'batch >= 128 at unroll 64.')
    parser.add_argument('--sweep', default=None,
                        help="e.g. 'unroll=8,32,64' or 'backend=scan,pallas' "
                             '— runs one subprocess per value.')
    args = parser.parse_args(argv)

    if args.sweep:
        field, _, values = args.sweep.partition('=')
        base = [sys.executable, os.path.abspath(__file__),
                '--backend', args.backend, '--dtype', args.dtype,
                '--unroll', str(args.unroll), '--batch', str(args.batch),
                '--frames', str(args.frames), '--steps', str(args.steps),
                '--rounds', str(args.rounds)] \
               + (['--remat'] if args.remat else [])
        for value in values.split(','):
            cmd = list(base)
            try:
                cmd[cmd.index(f'--{field}') + 1] = value
            except ValueError:
                parser.error(f'unknown sweep field {field!r}')
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=1200)
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith('{')), None)
            if line is None:
                print(f'{field}={value}: FAILED\n{proc.stderr[-500:]}')
                continue
            r = json.loads(line)
            print(f"{field}={value:>10}: {r['ms_per_step']:8.2f} ms/step  "
                  f"{r['frames_per_sec']:12.0f} frames/s")
        return

    r = measure(args.backend, args.dtype, args.unroll, args.batch,
                args.frames, args.steps, args.rounds, remat=args.remat)
    print(json.dumps({k: v for k, v in r.items()
                      if k != 'xla_flops_per_step' or v is not None}))


if __name__ == '__main__':
    main()
