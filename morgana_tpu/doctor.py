"""Deployment self-check: ``python -m morgana_tpu.doctor``.

One command that answers "can this box train and serve?" before a real run
burns an allocation — the operational counterpart of the reference's
"run it and see what crashes" workflow (the reference has no environment
tooling at all). Each check is timed, exception-contained, and reported as
PASS / FAIL / SKIP with a one-line detail; the process exits 1 if anything
FAILs. ``--json`` prints a machine-readable report instead,
``--device cpu`` skips accelerator discovery (host-only validation).

Checks, in dependency order:

1. ``environment``  — interpreter + jax/numpy versions.
   (+ ``platform`` under ``--device cpu``: forcing the CPU backend is itself
   a contained check — if it fails, every backend-touching check SKIPs
   rather than contacting the accelerator the flag promised to avoid.)
2. ``device``       — backend init, device count/kind, a tiny matmul timed
                      to a host readback (catches a wedged tunnel).
3. ``transfer``     — host->device bandwidth probe (8 MB, readback-barriered
                      with the null round trip subtracted): the number that
                      bounds end-to-end training on link-limited setups.
4. ``native_libs``  — the two C++ libraries build/load (vocoder synthesis,
                      GIL-free batch IO); degraded pure-python fallbacks
                      are reported, not failed.
5. ``train_step``   — a fused value_and_grad + Adam step through a
                      Linear+GRU stack under jit: the framework's compute
                      core end to end.
6. ``sharding``     — data-parallel psum across every local device (>1
                      device only).
7. ``data_pipeline``— a 2-utterance corpus written to a temp dir, read back
                      through FilesDataset + the prefetching loader.
8. ``vocoder``      — synthesise a 150 Hz tone from WORLD-style features,
                      re-analyse it, and bound the f0 error.
9. ``checkpoint``   — state-dict save/load round-trip (atomic path).
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

__all__ = ['run_checks', 'main']


def _check(name, fn, results, skip=None):
    if skip:
        results.append(dict(name=name, status='SKIP', detail=skip,
                            seconds=0.0))
        return results[-1]
    t0 = time.perf_counter()
    try:
        detail = fn() or 'ok'
        results.append(dict(name=name, status='PASS', detail=str(detail),
                            seconds=round(time.perf_counter() - t0, 3)))
    except Exception as e:  # noqa: BLE001 — each check is contained
        results.append(dict(name=name, status='FAIL',
                            detail=f'{type(e).__name__}: {e}',
                            seconds=round(time.perf_counter() - t0, 3)))
    return results[-1]


def run_checks(device=None):
    """Runs every check; returns the list of result dicts."""
    results = []

    def environment():
        import jax
        import numpy as np
        return (f'python {sys.version.split()[0]}, jax {jax.__version__}, '
                f'numpy {np.__version__}')

    _check('environment', environment, results)

    # When force_cpu fails (a non-CPU backend already owns the process),
    # every later check that touches the backend must SKIP — running them
    # would contact the very accelerator `--device cpu` promised to avoid.
    backend_skip = None
    if device == 'cpu':
        def platform_cpu():
            from morgana_tpu import platform as _platform
            _platform.force_cpu()
            return 'cpu backend forced (host-only validation)'

        if _check('platform', platform_cpu, results)['status'] != 'PASS':
            backend_skip = 'cpu backend could not be forced'

    def device_check():
        import jax
        import jax.numpy as jnp
        devices = jax.devices()
        x = jnp.ones((256, 256), jnp.float32)
        t0 = time.perf_counter()
        s = float(jnp.sum(x @ x))  # host readback: true completion barrier
        ms = (time.perf_counter() - t0) * 1000
        if s != 256.0 * 256 * 256:
            raise RuntimeError(f'matmul readback wrong: {s}')
        kind = getattr(devices[0], 'device_kind', devices[0].platform)
        return (f'{len(devices)} x {kind} ({devices[0].platform}), '
                f'256^2 matmul readback {ms:.0f} ms')

    dev = _check('device', device_check, results, skip=backend_skip)

    def transfer():
        import jax
        import numpy as np

        def put_timed(num_floats, fill):
            host = np.full((num_floats,), fill, np.float32)
            t0 = time.perf_counter()
            placed = jax.device_put(host)
            # Scalar READBACK as the barrier: a data-dependent device value
            # cannot be produced before the transfer lands, whereas
            # block_until_ready on a tunnelled runtime can credit
            # scheduling, not completion (see CLAUDE.md / bench.py).
            got = float(placed[-1])
            dt = time.perf_counter() - t0
            if got != fill:
                raise RuntimeError(f'transfer readback wrong: {got}')
            return dt

        mb = 8
        rounds = 3
        # Null round trip (dispatch + readback latency on a tiny buffer),
        # subtracted so the bandwidth figure reflects the transfer itself.
        null = min(put_timed(8, float(r + 1)) for r in range(rounds))
        n = mb * (1 << 20) // 4
        best = min(put_timed(n, float(r + 1)) for r in range(rounds))
        bw = mb / max(best - null, 1e-9)
        return (f'host->device {bw:.0f} MB/s ({mb} MB probe, readback-'
                f'barriered, {null * 1000:.0f} ms round trip subtracted)')

    _check('transfer', transfer, results,
           skip=None if dev['status'] == 'PASS' else 'device check not PASS')

    def native_libs():
        from morgana_tpu.data import native_io
        from morgana_tpu.vocoder import world
        parts = []
        parts.append('batch_io: ' + ('native' if native_io.native_available()
                                     else 'python fallback'))
        native_synth = getattr(world, 'native_available', None)
        if callable(native_synth):
            parts.append('world_synth: ' + ('native' if native_synth()
                                            else 'numpy fallback'))
        return ', '.join(parts)

    _check('native_libs', native_libs, results)

    def train_step():
        import jax
        import jax.numpy as jnp
        import numpy as np
        from morgana_tpu import losses, nn
        from morgana_tpu.training import apply_updates, build_optimizer

        nn.manual_seed(0)

        class Net(nn.Module):
            def __init__(self):
                self.stack = nn.SequentialWithRecurrent(
                    nn.Linear(8, 16), nn.Sigmoid(), nn.GRU(16, 16),
                    nn.Linear(16, 2))

            def forward(self, x, seq_len):
                return self.stack(x, seq_len=seq_len)

        model = Net()
        params = nn.parameters(model)
        optimizer = build_optimizer()
        opt_state = optimizer.init(params)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 12, 8)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(4, 12, 2)).astype(np.float32))
        seq_len = jnp.asarray([12, 9, 5, 12])

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                with nn.bind(model, p, train=True):
                    return losses.mse(model(x, seq_len), y, seq_len=seq_len)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            params2, opt_state2, _, _ = apply_updates(
                optimizer, 0., params, opt_state, None, grads,
                jnp.float32(0.01))
            return params2, opt_state2, loss

        t0 = time.perf_counter()
        params, opt_state, loss0 = step(params, opt_state)
        compile_s = time.perf_counter() - t0
        losses_seen = [float(loss0)]
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state)
            losses_seen.append(float(loss))
        if not all(np.isfinite(losses_seen)):
            raise RuntimeError(f'non-finite losses: {losses_seen}')
        if not losses_seen[-1] < losses_seen[0]:
            raise RuntimeError(f'loss did not decrease: {losses_seen}')
        # Sustained pace, readback-barriered (best of 2 x 8-step runs):
        # surfaces the tunnel's degraded device modes — scan-heavy programs
        # have been observed executing 15x slow for hours while matmul
        # probes run at full speed (BASELINE.md round-4 diagnosis). A user
        # seeing slow training should see it HERE too, not suspect their
        # model. Informational (never fails the check: absolute pace
        # depends on the link).
        best = float('inf')
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(8):
                params, opt_state, loss = step(params, opt_state)
            float(loss)
            best = min(best, (time.perf_counter() - t0) / 8)

        # Chained-pace discriminator: the same 8 steps as ONE compiled
        # lax.scan program. Comparing it with the per-dispatch pace
        # separates the two slow-training causes a user cannot otherwise
        # tell apart (BASELINE.md round-4 diagnosis): chained << per-step
        # means per-dispatch round trips dominate (a high-RTT link —
        # --steps_per_dispatch recovers the gap), while chained ~= per-step
        # with both slow means the device window itself is degraded for
        # scan-heavy programs (no flag helps; wait it out).
        def chain_body(carry, _):
            p, s = carry
            def loss_fn(pp):
                with nn.bind(model, pp, train=True):
                    return losses.mse(model(x, seq_len), y, seq_len=seq_len)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            p2, s2, _, _ = apply_updates(optimizer, 0., p, s, None, grads,
                                         jnp.float32(0.01))
            return (p2, s2), loss

        @jax.jit
        def chain8(params, opt_state):
            (p, s), chain_losses = jax.lax.scan(
                chain_body, (params, opt_state), None, length=8)
            return p, s, chain_losses[-1]

        params, opt_state, closs = chain8(params, opt_state)  # compile
        float(closs)
        chained_best = float('inf')
        for _ in range(2):
            t0 = time.perf_counter()
            params, opt_state, closs = chain8(params, opt_state)
            float(closs)
            chained_best = min(chained_best,
                               (time.perf_counter() - t0) / 8)
        if best > 0.005 and best > 2.0 * chained_best:
            diagnosis = ('dispatch-bound link: chaining amortises the '
                         'per-dispatch round trip — use '
                         '--steps_per_dispatch')
        elif best > 0.050 and chained_best > 0.5 * best:
            diagnosis = ('degraded device window: even one fused program '
                         'runs slow — environment weather, retry later')
        else:
            diagnosis = 'healthy: dispatch overhead is not the bottleneck'
        return (f'compile {compile_s:.1f}s, loss {losses_seen[0]:.4f} -> '
                f'{losses_seen[-1]:.4f} over 4 steps; sustained '
                f'{best * 1e3:.1f} ms/step per-dispatch vs '
                f'{chained_best * 1e3:.1f} ms/step chained (8-step scan; '
                f'readback-barriered) — {diagnosis}')

    _check('train_step', train_step, results,
           skip=None if dev['status'] == 'PASS' else 'device check not PASS')

    def sharding():
        import jax
        import jax.numpy as jnp
        from morgana_tpu import parallel
        n = len(jax.devices())
        mesh = parallel.make_mesh()
        x = jnp.arange(n * 4, dtype=jnp.float32).reshape(n * 4, 1)
        sharded = jax.device_put(x, parallel.batch_sharding(mesh))
        total = float(jax.jit(jnp.sum)(sharded))
        expect = float(x.sum())
        if total != expect:
            raise RuntimeError(f'sharded sum {total} != {expect}')
        return f'mesh {dict(mesh.shape)}, sharded reduction exact'

    sharding_skip = None
    if dev['status'] != 'PASS':
        sharding_skip = 'device check not PASS'
    else:
        import jax
        if len(jax.devices()) < 2:
            sharding_skip = 'single device'
    _check('sharding', sharding, results, skip=sharding_skip)

    def data_pipeline():
        from morgana_tpu import data
        from morgana_tpu.data.sources import NumpyBinarySource, TextSource
        from morgana_tpu.data.normalisers import MeanVarianceNormaliser
        import numpy as np

        tmp = tempfile.mkdtemp(prefix='morgana_doctor_')
        try:
            rng = np.random.default_rng(0)
            split = os.path.join(tmp, 'train')
            os.makedirs(os.path.join(split, 'lf0'))
            os.makedirs(os.path.join(split, 'n_frames'))
            ids = ['utt_a', 'utt_b']
            for i, utt in enumerate(ids):
                frames = 20 + 5 * i
                np.save(os.path.join(split, 'lf0', f'{utt}.npy'),
                        rng.normal(size=(frames, 1)).astype(np.float32))
                with open(os.path.join(split, 'n_frames', f'{utt}.txt'),
                          'w') as f:
                    f.write(str(frames))
            with open(os.path.join(split, 'ids.scp'), 'w') as f:
                f.write('\n'.join(ids))
            norm = MeanVarianceNormaliser('lf0')
            norm.params = {'mean': np.zeros(1, np.float32),
                           'std_dev': np.ones(1, np.float32)}
            dataset = data.FilesDataset(
                {'lf0': NumpyBinarySource('lf0'),
                 'n_frames': TextSource('n_frames', sentence_level=True)},
                'train', 'train/ids.scp', {'lf0': norm}, tmp)
            batches = list(data.batch(dataset, batch_size=2, shuffle=False))
            if len(batches) != 1:
                raise RuntimeError(f'expected 1 batch, got {len(batches)}')
            batch0 = batches[0]
            if 'normalised_lf0' not in batch0:
                raise RuntimeError('normalised key missing')
            return (f"2 utts -> 1 batch, lf0 {tuple(batch0['lf0'].shape)}, "
                    'device-resident')
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    _check('data_pipeline', data_pipeline, results, skip=backend_skip)

    def vocoder():
        import numpy as np
        from morgana_tpu.vocoder import analysis, world
        fs, f0_true = 16000, 150.0
        # A harmonic tone with a decaying spectrum (speech-shaped enough for
        # the estimator; a flat impulse train is a known pathology).
        t = np.arange(int(0.6 * fs)) / fs
        wav = sum((0.6 ** k) * np.sin(2 * np.pi * f0_true * (k + 1) * t)
                  for k in range(8))
        feats = analysis.features_from_wav(np.asarray(wav, np.float64), fs)
        voiced = feats['vuv'][:, 0] > 0.5
        if voiced.mean() < 0.5:
            raise RuntimeError(f'voicing collapsed ({voiced.mean():.2f})')
        f0_est = np.exp(feats['lf0'][voiced, 0])
        err = float(np.sqrt(np.mean((f0_est - f0_true) ** 2)))
        if err > 3.0:
            raise RuntimeError(f'analysis f0 RMSE {err:.2f} Hz > 3 Hz')
        wav2 = np.asarray(world.synthesize_world_feats(
            np.exp(feats['lf0'][:, 0]), feats['vuv'][:, 0],
            feats['mcep'], feats['bap'], fs))
        if not np.isfinite(wav2).all() or np.abs(wav2).max() == 0:
            raise RuntimeError('degenerate resynthesis output')
        return f'150 Hz tone: analysis f0 RMSE {err:.2f} Hz, resynth finite'

    _check('vocoder', vocoder, results)

    def checkpoint():
        import numpy as np
        from morgana_tpu import checkpointing
        tmp = tempfile.mkdtemp(prefix='morgana_doctor_ckpt_')
        try:
            sd = {'w': np.arange(6, dtype=np.float32).reshape(2, 3),
                  'b': np.zeros(3, np.float32)}
            path = checkpointing.save_state_dict(
                sd, os.path.join(tmp, 'epoch_1.npz'), atomic=True)
            back = checkpointing.load_state_dict(path)
            for k in sd:
                np.testing.assert_array_equal(back[k], sd[k])
            return f'atomic save/load round-trip ({os.path.basename(path)})'
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    _check('checkpoint', checkpoint, results)
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='morgana_tpu environment self-check: validates device, '
                    'native libraries, the fused train step, data pipeline, '
                    'vocoder and checkpointing before a real run.')
    parser.add_argument('--device', choices=('cpu',), default=None,
                        help="'cpu' = host-only validation (never touches "
                             'an accelerator/tunnel).')
    parser.add_argument('--json', action='store_true',
                        help='Machine-readable report on stdout.')
    args = parser.parse_args(argv)

    results = run_checks(device=args.device)
    failed = [r for r in results if r['status'] == 'FAIL']
    if args.json:
        print(json.dumps({'checks': results, 'ok': not failed}))
    else:
        width = max(len(r['name']) for r in results)
        for r in results:
            print(f"{r['name']:<{width}}  {r['status']:<4}  "
                  f"[{r['seconds']:7.3f}s]  {r['detail']}")
        print()
        print('OK: every check passed.' if not failed else
              f"FAILED: {', '.join(r['name'] for r in failed)}")
    return 1 if failed else 0


if __name__ == '__main__':
    raise SystemExit(main())
