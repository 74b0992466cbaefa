"""Benchmark: acoustic-frame training throughput of the flagship model.

Measures frames/sec of the fused jit training step for LSTMAcousticModel
(Linear(609->512) + 8xLSTM(512) + heads, exactly the reference architecture
``models/RNN_SPSS.py:32-42``) on realistic Blizzard-like shapes
(batch 32 x ~600 frames), including everything the reference does per batch:
duration upsampling, the LSTM stack, per-stream MLPG, masked losses, metric
accumulation, Adam and EMA updates.

Baseline: the same training step implemented faithfully in PyTorch on CPU
(the reference's architecture and per-batch host MLPG), measured once and
cached in BENCH_BASELINE.json.

Prints the result as a JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N, ...}
A provisional line is printed (flushed) as soon as the first measurement
exists and is re-printed, enriched, after every later stage — the LAST
parseable line is the result, so a hard timeout at any point still captures
everything measured so far. Stage timeouts are derived from the wall-clock
budget (MORGANA_BENCH_BUDGET_S, default 1350 s); the secondary rows (full
e2e ladder, vocoder, transformer) run only under MORGANA_BENCH_FULL=1.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), 'models'))

BATCH = 32
PHONES = 64
FRAMES = 640           # ~3.2 s utterances at 5 ms frames
WARMUP_STEPS = 2
MEASURE_STEPS = 5
MEASURE_ROUNDS = 4     # best-of-rounds: the shared TPU shows throttling episodes
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'BENCH_BASELINE.json')


def make_batch(rng, batch=BATCH, phones=PHONES, frames=FRAMES):
    """Realistic ragged batch on the flagship schema (which lives in ONE
    place: ``__graft_entry__.batch_from_durations``)."""
    from __graft_entry__ import batch_from_durations

    reps = frames // phones
    dur = np.full((batch, phones, 1), reps, np.int64)
    # Vary lengths a little (80-100% of max) like real batches.
    lens = rng.integers(int(0.8 * phones), phones + 1, size=batch)
    for b in range(batch):
        dur[b, lens[b]:] = 0
    features = batch_from_durations(rng, dur, frames)
    return features, features['n_frames'].sum()


# v5e (TPU v5 lite) bf16 MXU peak; JAX's DEFAULT matmul precision on TPU
# runs f32 inputs through bf16 multiplies with f32 accumulation, so this is
# the relevant speed-of-light denominator for MFU.
PEAK_TFLOPS_BF16 = {'TPU v5 lite': 197.0, 'TPU v5': 197.0,
                    'TPU v4': 275.0, 'TPU v6 lite': 918.0}
DEFAULT_PEAK_TFLOPS = 197.0


def _device_peak_tflops():
    import jax
    kind = getattr(jax.devices()[0], 'device_kind', '')
    for name, peak in PEAK_TFLOPS_BF16.items():
        if name.lower() in str(kind).lower():
            return peak
    return DEFAULT_PEAK_TFLOPS


def analytical_train_flops(batch=BATCH, frames=FRAMES, hidden=512,
                           num_layers=8, in_dim=609, head=(256, 199)):
    """Matmul FLOPs of one training step of the flagship model, counted over
    PADDED frames (that is what the MXU executes). Backward of a matmul costs
    2x its forward, hence the 3x multiplier; elementwise/MLPG terms are
    negligible at these shapes (<2%)."""
    per_frame = 2 * in_dim * hidden                      # input projection
    per_frame += num_layers * 2 * (2 * hidden * 4 * hidden)   # LSTM ih + hh
    per_frame += 2 * hidden * head[0] + 2 * head[0] * head[1]  # output head
    return 3.0 * batch * frames * per_frame


def compiled_step_flops(loop, batch):
    """XLA's own FLOP count for the compiled train step, when the backend
    reports one (jax.jit(...).lower().compile().cost_analysis())."""
    import jax
    import jax.numpy as jnp
    from morgana_tpu.training import numeric_features
    try:
        args = (loop.params, loop.opt_state, loop.ema_params,
                numeric_features(batch), jnp.float32(1e-3), jnp.float32(0),
                loop.rng)
        cost = loop._train_step.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get('flops', 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def measure_peak_tflops(size=8192, rounds=4, iters=32):
    """Empirical roofline probe: best-of-rounds timing of a long bf16 matmul
    chain (iters x size^3, f32 accumulation — the MXU's native mode), timed
    to a SCALAR HOST READBACK. This is the measured speed of light for the
    silicon actually behind the device tunnel, making MFU well-defined even
    when the nominal peak for the reported device_kind mislabels the
    hardware (round-2 verdict: analytical MFU 1.78 vs the nominal 197 TF/s).

    Two tunnel pitfalls this probe is built around: (a) `block_until_ready`
    on a remote buffer can return before execution completes, reading
    ~1000x the silicon peak — only a host readback of a value is a true
    barrier; (b) the readback round trip costs ~25-30 ms, so the chain must
    be long enough (iters=32 ~= 35 TFLOP ~= 200 ms) to amortise it; the
    probe is therefore a few percent CONSERVATIVE, never optimistic."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (size, size), jnp.bfloat16)
    b = jax.random.normal(key, (size, size), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        x = a
        # tanh keeps XLA from collapsing the chain algebraically.
        for _ in range(iters):
            x = jnp.tanh(jnp.dot(x, b, preferred_element_type=jnp.float32)
                         / size).astype(jnp.bfloat16)
        return x, jnp.sum(x.astype(jnp.float32))

    a, s = chain(a, b)  # compile + warmup
    float(s)
    best = float('inf')
    for _ in range(rounds):
        t0 = time.perf_counter()
        # Output feeds back as input: fresh operands every dispatch.
        a, s = chain(a, b)
        float(s)  # host readback: the only reliable completion barrier
        best = min(best, time.perf_counter() - t0)
    flops = iters * 2.0 * size ** 3
    return flops / best / 1e12


def measure_transfer_bandwidth(mbytes=64, rounds=5):
    """Host->device transfer bandwidth (MB/s). On a tunnelled device this is
    network bandwidth, not PCIe — measured explicitly because it bounds any
    end-to-end (disk->device) throughput number and is a property of the
    environment, not of the framework's input pipeline.

    Barrier discipline: a scalar READBACK of the placed buffer, not
    ``block_until_ready`` (which on the tunnelled runtime can credit
    scheduling rather than completion — the same pathology as step timing).
    The null round trip (tiny-buffer put + readback) is measured and
    subtracted so the figure reflects the transfer itself."""
    import jax

    def put_timed(num_floats, fill):
        host = np.full((num_floats,), fill, np.float32)  # fresh per round
        t0 = time.perf_counter()
        placed = jax.device_put(host)
        got = float(placed[-1])  # data-dependent readback: true barrier
        dt = time.perf_counter() - t0
        if got != fill:
            raise RuntimeError(f'transfer readback wrong: {got} != {fill}')
        return dt

    null = min(put_timed(8, float(r + 1)) for r in range(rounds))
    n = mbytes * (1 << 20) // 4
    best = min(put_timed(n, float(r + 1)) for r in range(rounds))
    return mbytes / max(best - null, 1e-9)


def _build_batch_chain(model, optimizer, ema_decay, rng_base, n):
    """One jitted program running ``n`` consecutive fused train steps on a
    (device-resident) batch — the compute-side analogue of
    ``TrainLoop.train_chain`` without the corpus cache (same
    staged_value_and_grad / apply_updates building blocks,
    ``training.py::_build_chain_step``). Measures the per-step pace a
    ``--steps_per_dispatch`` user sees: one dispatch covers n steps, so
    per-dispatch round-trip cost (the dominant term when the tunnel stops
    pipelining dispatches — BASELINE.md round-4 pathology note) is
    amortised by n."""
    import jax
    import jax.numpy as jnp
    from morgana_tpu.training import apply_updates, staged_value_and_grad

    def fn(params, opt_state, ema_params, batch, lr, step0):
        def body(carry, offset):
            params, opt_state, ema_params = carry
            b = dict(batch, global_step=step0 + offset)
            rng = jax.random.fold_in(rng_base, step0 + offset)
            loss, staged, outputs, grads = staged_value_and_grad(
                model, params, b, rng)
            del staged, outputs
            params, opt_state, ema_params, _ = apply_updates(
                optimizer, ema_decay, params, opt_state, ema_params,
                grads, lr)
            return (params, opt_state, ema_params), loss

        (params, opt_state, ema_params), losses = jax.lax.scan(
            body, (params, opt_state, ema_params),
            jnp.arange(n, dtype=jnp.int32))
        return params, opt_state, ema_params, losses

    return jax.jit(fn, donate_argnums=(0, 1, 2))


def bench_tpu(rnn_backend='pallas', compute_dtype=None, unroll=8,
              batch_size=None, frames=None, sustained_steps=0,
              chained_steps=0, quick=False):
    import jax
    import jax.numpy as jnp
    from morgana_tpu.training import TrainLoop, build_optimizer
    from __graft_entry__ import _make_model

    # Explicit shape args (bench_step's sweeps): module-level BATCH/FRAMES
    # are only defaults — they were bound into make_batch's signature at
    # import time, so mutating them after import has no effect.
    batch_size = batch_size or BATCH
    frames = frames or FRAMES

    # Set unconditionally: the in-process fallback in main() runs several
    # configs in one interpreter, so a previous config's bf16 must not leak.
    # (bf16 = bf16 MXU matmuls with f32 accumulation/state; measured ~15%
    # faster on the scan backend with loss identical to 4 decimals.)
    from morgana_tpu import nn
    nn.set_default_compute_dtype(compute_dtype)

    kwargs = {} if rnn_backend == 'pallas' else {'rnn_unroll': unroll}
    model = _make_model(num_layers=8, hidden_size=512, rnn_backend=rnn_backend,
                        **kwargs)
    model.mode = 'train'
    loop = TrainLoop(model, build_optimizer(), ema_decay=0.99, seed=0)

    rng = np.random.default_rng(0)
    batch, frames_per_batch = make_batch(rng, batch=batch_size, frames=frames)
    # Stage the batch ON DEVICE once: this is a COMPUTE benchmark (the e2e
    # rows price the wire). Passing the numpy dict per step re-uploads
    # ~26 MB per dispatch unless the tunnel's content-dedup elides it —
    # and that dedup has been observed to switch off (whole afternoons
    # where sustained readings degrade to the ~0.6 s/step upload bound,
    # masquerading as compute throttling). Staging removes the dependence
    # on an undocumented runtime behaviour entirely.
    from morgana_tpu.training import numeric_features
    batch = jax.device_put(numeric_features(batch))

    for _ in range(WARMUP_STEPS):
        loss, _, _ = loop.train_step(batch, lr=1e-3)
    jax.block_until_ready(loss)

    # quick=True (breadth-first A/B rows): halve the burst rounds and
    # sustained mini-runs — the compile dominates a config's cost anyway,
    # and a short measured pass per config beats budget-starved skips
    # (round-4 verdict: 3 of 4 configs read skipped_budget).
    burst_rounds = 2 if quick else MEASURE_ROUNDS
    sustained_runs = 2 if quick else 3

    # Burst rounds (block_until_ready-timed). On the tunnelled runtime
    # block_until_ready can credit scheduling rather than completion, so the
    # burst is reported as a SECONDARY number; its round spread still gives
    # throttle transparency (median round / best round, ~1.0 = healthy).
    round_times = []
    for _ in range(burst_rounds):
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            loss, _, _ = loop.train_step(batch, lr=1e-3)
        jax.block_until_ready(loss)
        round_times.append(time.perf_counter() - t0)
    best = min(round_times)
    throttle_ratio = float(np.median(round_times) / best)
    burst_time = best / MEASURE_STEPS

    # PRIMARY measurement: continuous mini-runs timed to a scalar host
    # readback — the only reliable completion barrier on the tunnel, and
    # the number a long training job actually sees. Best-of-mini-runs
    # because the shared chip has severe throttling EPISODES (a single
    # 30-step reading has been observed 800x off); the ~28 ms readback
    # amortises to ~2 ms/step over 15 steps.
    steps = max(int(sustained_steps), 12)
    run_times = []
    for _ in range(sustained_runs):
        t0 = time.perf_counter()
        for _ in range(steps):
            loss, _, _ = loop.train_step(batch, lr=1e-3)
        float(loss)
        run_times.append((time.perf_counter() - t0) / steps)
    step_time = min(run_times)
    fps = float(frames_per_batch / step_time)
    sustained = {'sustained_steps': steps,
                 'sustained_spread': round(max(run_times) / step_time, 2)}

    # MFU uses the ANALYTICAL model-FLOP count (the standard definition:
    # useful model math / time / peak). XLA's cost_analysis cannot see inside
    # Pallas kernels, so it would misstate the pallas backend; it is reported
    # separately as xla_flops_per_step where available.
    flops = analytical_train_flops(batch=batch_size, frames=frames)
    xla_flops = compiled_step_flops(loop, batch)
    peak = _device_peak_tflops()
    out = {
        'frames_per_sec': fps,
        'ms_per_step': step_time * 1e3,
        'burst_ms_per_step': burst_time * 1e3,
        'burst_frames_per_sec': float(frames_per_batch / burst_time),
        'throttle_ratio': round(throttle_ratio, 2),
        'flops_per_step': flops,
        'xla_flops_per_step': xla_flops,
        'achieved_tflops': flops / step_time / 1e12,
        'mfu_vs_nominal': flops / step_time / (peak * 1e12),
        'nominal_peak_tflops': peak,
        'device_kind': str(getattr(jax.devices()[0], 'device_kind', '')),
        'loss': float(loss),
    }
    if sustained:
        out.update(sustained)

    # Chained-dispatch pace (--steps_per_dispatch N): N fused steps as ONE
    # lax.scan program, so the per-dispatch round trip amortises by N.
    # Secondary, clearly labeled — reported next to the per-dispatch
    # sustained number, NOT in place of it.
    if chained_steps:
        n = int(chained_steps)
        chain_fn = _build_batch_chain(loop.model, loop.optimizer,
                                      loop.ema_decay, loop._train_rng_base,
                                      n)
        params, opt_state, ema_params = (loop.params, loop.opt_state,
                                         loop.ema_params)
        lr = jnp.float32(1e-3)
        step0 = jnp.int32(0)
        params, opt_state, ema_params, losses = chain_fn(
            params, opt_state, ema_params, batch, lr, step0)  # compile
        float(losses[-1])
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            params, opt_state, ema_params, losses = chain_fn(
                params, opt_state, ema_params, batch, lr, step0)
            float(losses[-1])  # readback barrier
            best = min(best, (time.perf_counter() - t0) / n)
        out['chained_steps_per_dispatch'] = n
        out['chained_ms_per_step'] = best * 1e3
        out['chained_frames_per_sec'] = float(frames_per_batch / best)
    return out


def bench_torch_baseline(measure_steps=5):
    """Faithful reference training step in torch on CPU: upsample via host
    np.repeat indices, LSTM stack, per-stream host MLPG inside predict
    (as the reference does every batch, models/RNN_SPSS.py:108-118),
    masked MSE+BCE, Adam."""
    import torch
    from morgana_tpu.viz.synthesis import mlpg_numpy

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    class RefModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.pre = torch.nn.Sequential(torch.nn.Linear(609, 512), torch.nn.Sigmoid())
            self.rnns = torch.nn.ModuleList(
                [torch.nn.LSTM(512, 512, batch_first=True) for _ in range(8)])
            self.post = torch.nn.Sequential(
                torch.nn.Linear(512, 256), torch.nn.Sigmoid(), torch.nn.Linear(256, 199))

        def forward(self, x):
            h = self.pre(x)
            for rnn in self.rnns:
                h, _ = rnn(h)
            return self.post(h)

    model = RefModel()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    rng = np.random.default_rng(0)
    batch, frames_per_batch = make_batch(rng)

    lab = torch.tensor(batch['normalised_lab'])
    counters = torch.tensor(batch['normalised_counters'])
    dur = batch['dur'][:, :, 0]
    n_frames = batch['n_frames'].astype(np.int64)
    targets = torch.tensor(np.concatenate(
        [batch['normalised_lf0_deltas'], batch['vuv'],
         batch['normalised_mcep_deltas'], batch['normalised_bap_deltas']], axis=-1))
    mask = torch.zeros(BATCH, FRAMES, 1)
    for b in range(BATCH):
        mask[b, :n_frames[b]] = 1.

    def step():
        opt.zero_grad()
        # Host-side np.repeat upsampling (reference utils.py:219-220).
        ups = np.zeros((BATCH, FRAMES, 600), np.float32)
        lab_np = lab.numpy()
        for b in range(BATCH):
            rep = np.repeat(np.arange(lab_np.shape[1]), dur[b])
            ups[b, :len(rep)] = lab_np[b, rep]
        x = torch.cat([torch.tensor(ups), counters], dim=-1)
        pred = model(x)
        # Reference runs MLPG (host) inside predict for each stream.
        pred_np = pred.detach().numpy()
        for s, dims in (('lf0', (0, 3)), ('mcep', (4, 184)), ('bap', (184, 199))):
            mlpg_numpy(pred_np[..., dims[0]:dims[1] if s != 'mcep' else 184],
                       np.ones(dims[1] - dims[0], np.float32),
                       padding_size=100, seq_len=n_frames)
        el = (pred - targets) ** 2
        loss = ((el * mask).sum(1) / mask.sum(1)).mean()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(measure_steps):
        step()
    elapsed = time.perf_counter() - t0
    return float(measure_steps * frames_per_batch / elapsed)


def get_baseline():
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)['frames_per_sec']
    fps = bench_torch_baseline()
    tmp = BASELINE_FILE + '.tmp'
    with open(tmp, 'w') as f:
        json.dump({'frames_per_sec': float(fps),
                   'config': 'RNN_SPSS torch CPU, batch 32 x 640 frames, '
                             'incl. host MLPG per batch'}, f, indent=2)
    os.replace(tmp, BASELINE_FILE)
    return fps


def _run_bench_code(code, timeout=1200):
    import subprocess
    proc = subprocess.run([sys.executable, '-c', code], capture_output=True,
                          text=True, timeout=timeout,
                          cwd=os.path.dirname(os.path.abspath(__file__)))
    for line in proc.stdout.splitlines():
        if line.startswith('BENCH_JSON:'):
            return json.loads(line[len('BENCH_JSON:'):])
    raise RuntimeError(f'bench subprocess failed: {proc.stderr[-1000:]}')


def _probe_subprocess(timeout=600):
    """Roofline + transfer probes in one clean process (same contention rule
    as the config benches)."""
    return _run_bench_code(
        'import bench, json; print("BENCH_JSON:" + '
        'json.dumps({"peak": bench.measure_peak_tflops(), '
        '"bw": bench.measure_transfer_bandwidth()}))', timeout=timeout)


def _bench_subprocess(backend, compute_dtype=None, unroll=8, sustained_steps=0,
                      chained_steps=0, quick=False, timeout=900):
    """One config per process: a second measurement in the same process
    reads ~30x slow on the shared TPU (runtime contention with the first
    program's buffers), so each config gets a clean process.

    ``timeout`` is derived by the caller from the remaining wall-clock
    budget (round-3 lesson: a fixed generous timeout let a stage started
    with 301s of budget run 20 minutes, and the driver killed the whole
    bench before its only JSON line). Cold compiles through the AOT service
    are cached server-side, so a timed-out first attempt still warms the
    cache for a rerun."""
    code = (f'import bench, json; print("BENCH_JSON:" + json.dumps('
            f'bench.bench_tpu({backend!r}, compute_dtype={compute_dtype!r}, '
            f'unroll={unroll}, sustained_steps={sustained_steps}, '
            f'chained_steps={chained_steps}, quick={quick})))')
    return _run_bench_code(code, timeout=timeout)


def bench_configs_pack(configs, with_probes=False):
    """Measures several ``(name, backend, dtype, unroll)`` configs
    SEQUENTIALLY in one process, ``quick`` methodology each. Historically
    forbidden (round 2: a second in-process measurement read ~30x slow) —
    re-validated in round 5 AFTER batches moved onto the device: sequential
    in-process sustained readings now match subprocess isolation (68.4 vs
    68.5 ms/step same-window A/B; the old contention was the per-step
    upload path, which staging removed). One process for the whole A/B
    sweep saves the ~240 s fresh-process first-program cost per config
    that some chip windows charge. ``with_probes`` also runs the roofline +
    transfer probes FIRST (clean process state), under the ``__probes__``
    key — folding stage 2 into the same process."""
    out = {}
    if with_probes:
        out['__probes__'] = {'peak': measure_peak_tflops(),
                             'bw': measure_transfer_bandwidth()}
        print('BENCH_JSON:' + json.dumps({'__probes__': out['__probes__']}),
              flush=True)
    for name, backend, dtype, unroll in configs:
        out[name] = bench_tpu(backend, dtype, unroll=unroll, quick=True)
        # One flushed line per phase: a pack killed mid-flight still
        # delivers every phase that finished (the caller merges all lines).
        print('BENCH_JSON:' + json.dumps({name: out[name]}), flush=True)
    return out


def _run_merge_code(code, timeout=900):
    """Runs ``code`` in one subprocess and merges EVERY ``BENCH_JSON:``
    dict line it managed to print — a timeout keeps the finished phases
    instead of discarding the whole stage (``__partial__`` marks it)."""
    import subprocess
    stdout = ''
    timed_out = False
    try:
        proc = subprocess.run([sys.executable, '-c', code],
                              capture_output=True, text=True, timeout=timeout,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
        stdout = proc.stdout or ''
    except subprocess.TimeoutExpired as e:
        timed_out = True
        stdout = e.output if isinstance(e.output, str) else \
            (e.output or b'').decode('utf-8', 'replace')
    merged = {}
    for line in stdout.splitlines():
        if line.startswith('BENCH_JSON:'):
            merged.update(json.loads(line[len('BENCH_JSON:'):]))
    if not merged:
        raise RuntimeError(
            f'stage produced no results '
            f'({"timeout" if timed_out else "no BENCH_JSON lines"})')
    if timed_out:
        merged['__partial__'] = True
    return merged


def _pack_subprocess(configs, with_probes=False, timeout=900):
    code = ('import bench; '
            f'bench.bench_configs_pack({[tuple(c) for c in configs]!r}, '
            f'with_probes={bool(with_probes)})')
    return _run_merge_code(code, timeout=timeout)


def bench_full_pack(configs, headline=None, transformer=True, e2e=True):
    """EVERY stage in one process, most-valuable-first, one flushed
    ``BENCH_JSON:`` line per phase (the caller consumes phases AS THEY
    ARRIVE and keeps whatever finished if the process is cut off): the
    headline config (full methodology + chained-dispatch row), roofline +
    transfer probes, the transformer row (healthy even in scan-degraded
    device windows), the quick A/B config sweep, then the compact e2e row
    (the longest phase — a real corpus through the real user path). One
    process for all of it because some chip windows charge each fresh
    process ~240 s for its first program, which starved these stages when
    each had its own subprocess (round-5 rehearsals)."""
    def phase(name, value):
        print('BENCH_JSON:' + json.dumps({name: value}), flush=True)

    if headline:
        name, backend, dtype, unroll = headline
        phase(name, bench_tpu(backend, dtype, unroll=unroll,
                              chained_steps=16))
    phase('__probes__', {'peak': measure_peak_tflops(),
                         'bw': measure_transfer_bandwidth()})
    if transformer:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), 'benchmarks'))
        import bench_transformer as bt
        phase('transformer', bt.measure(512, 6, 4, 2048, 'bfloat16', 32, 640))
    if e2e:
        # Before the A/B sweep: the verdict's Done criterion names
        # headline + e2e + transformer rows explicitly, so in a window too
        # slow for everything the sweep is the sacrificed tail.
        # length_sort_window stays OFF here: with only 2 epochs the
        # length-sorted epoch 2 re-groups into NEW chain shapes and pays
        # their compiles inside the measured epoch (seen as a ~1000x-low
        # row in rehearsal); without it epoch 2 reuses epoch 1's programs
        # and measures the steady state. The full-budget ladder
        # (MORGANA_BENCH_FULL) keeps the flagship sorted config over
        # enough epochs to amortise.
        phase('e2e_chain', bench_e2e(
            num_utts=128, epochs=2, device_normalise=True, device_cache=True,
            steps_per_dispatch=16))
    for name, backend, dtype, unroll in configs:
        phase(name, bench_tpu(backend, dtype, unroll=unroll, quick=True))


def _full_pack_subprocess(configs, timeout=900):
    code = ('import bench; '
            f'bench.bench_full_pack({[tuple(c) for c in configs]!r})')
    return _run_merge_code(code, timeout=timeout)


def _stream_worker(headline, configs, deadline_s, on_phase):
    """Launches bench_full_pack in one subprocess and feeds each
    ``BENCH_JSON:`` phase line to ``on_phase`` AS IT ARRIVES, so the main
    process can re-emit an enriched headline line after every phase — a
    driver kill at any moment keeps everything delivered so far. The child
    is killed at ``deadline_s``. Returns (n_phases, timed_out)."""
    import subprocess
    import threading

    code = ('import bench; '
            f'bench.bench_full_pack({[tuple(c) for c in configs]!r}, '
            f'headline={tuple(headline)!r})')
    proc = subprocess.Popen(
        [sys.executable, '-c', code], stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    timer = threading.Timer(max(1.0, deadline_s), proc.kill)
    timer.start()
    phases = 0
    try:
        for line in proc.stdout:
            if line.startswith('BENCH_JSON:'):
                on_phase(json.loads(line[len('BENCH_JSON:'):]))
                phases += 1
    finally:
        timer.cancel()
        if proc.poll() is None:
            proc.kill()
        proc.wait()
    return phases, proc.returncode not in (0,)


def bench_generate(rnn_backend='scan', compute_dtype='bfloat16', unroll=64,
                   num_batches=10):
    """Generation (predict-only, incl. fused-stream on-device MLPG)
    throughput with the tunnel-honest methodology: DISTINCT pre-staged
    batches (dispatch dedup), one scalar readback as the completion barrier,
    best of 3 passes."""
    import jax
    from morgana_tpu import nn
    from morgana_tpu.training import TrainLoop, build_optimizer, numeric_features
    from __graft_entry__ import _make_model

    nn.set_default_compute_dtype(compute_dtype)
    model = _make_model(num_layers=8, hidden_size=512, rnn_backend=rnn_backend,
                        rnn_unroll=unroll)
    model.mode = 'train'
    loop = TrainLoop(model, build_optimizer(), seed=0)

    rng = np.random.default_rng(0)
    batches = []
    total_frames = 0.0
    for i in range(num_batches):
        batch, frames = make_batch(np.random.default_rng(i))
        batches.append(jax.device_put(numeric_features(batch)))
        total_frames += float(frames)

    staged, out = loop._predict_step(loop.params, batches[0], loop.rng)
    float(next(iter(out.values())).sum())  # compile + warmup, true barrier

    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for batch in batches:
            staged, out = loop._predict_step(loop.params, batch, loop.rng)
        float(next(iter(out.values())).astype(np.float32).sum())
        best = min(best, time.perf_counter() - t0)
    return {'generate_frames_per_sec': total_frames / best,
            'generate_ms_per_batch': best / num_batches * 1e3}


def bench_e2e(num_utts=512, epochs=4, num_data_threads=8, transfer_dtype=None,
              device_normalise=False, device_cache=False, model_kwargs=None,
              steps_per_dispatch=1, length_sort_window=0):
    """End-to-end disk->device training throughput: a REAL epoch over an
    on-disk synthetic corpus at bench shapes through the actual user path
    (ExperimentBuilder: FilesDataset + threaded/native reads + prefetch +
    fused step). Reports the best post-compile epoch's frames/sec — the
    number a user training on real data sees, next to the compute-only
    headline (VERDICT r2 item 2). ``device_normalise`` moves normalisation
    + delta windows on-device so only raw streams ride the (measured
    bottleneck) host->device link.
    """
    import shutil
    import tempfile

    from morgana_tpu import nn
    from morgana_tpu.data.synthetic import generate_voice_data
    from morgana_tpu.experiment_builder import ExperimentBuilder
    from rnn_spss import LSTMAcousticModel

    tmp = tempfile.mkdtemp(prefix='bench_e2e_')
    try:
        data_root = os.path.join(tmp, 'data')
        # ~640-frame utterances like the compute bench; sp_bins=2 keeps the
        # (unused-by-training) sp/ap files from dominating the corpus size.
        generate_voice_data(data_root, num_train=num_utts, num_valid=1,
                            num_test=1, seed=0, n_phones_range=(52, 64),
                            dur_range=(8, 12), sp_bins=2)
        nn.manual_seed(0)
        # Full flag surface from the live parser defaults (the real CLI path).
        import argparse
        parser = argparse.ArgumentParser()
        ExperimentBuilder.add_args(parser)
        args = vars(parser.parse_args(['--experiment_name', 'bench_e2e']))
        args.update(
            experiments_base=os.path.join(tmp, 'experiments'),
            data_root=data_root,
            train_id_list='train/train_file_id_list.scp',
            valid_id_list='valid/valid_file_id_list.scp',
            test_id_list='test/test_file_id_list.scp',
            model_kwargs=model_kwargs
            or {'rnn_backend': 'scan', 'rnn_unroll': 64},
            compute_dtype='bfloat16', batch_size=BATCH,
            num_data_threads=num_data_threads, end_epoch=epochs,
            valid=False, test=False, model_checkpoint_interval=10 ** 6,
            ema_decay=0., transfer_dtype=transfer_dtype,
            device_normalise=device_normalise, device_cache=device_cache,
            steps_per_dispatch=steps_per_dispatch,
            length_sort_window=length_sort_window,
            # The recommended throughput config: reading metrics every batch
            # forces a host sync per read; staged merges are lazy, so the
            # sync cadence follows the log cadence (docs/design.md).
            log_interval=25)
        name = args.pop('experiment_name')
        exp = ExperimentBuilder(LSTMAcousticModel, experiment_name=name, **args)
        exp.run_experiment()

        best = None
        for epoch in range(2, epochs + 1):  # epoch 1 pays the compile
            path = os.path.join(tmp, 'experiments', 'bench_e2e', 'train',
                                f'epoch_{epoch}', 'metrics.json')
            with open(path) as f:
                metrics = json.load(f)
            fps = metrics.get('frames_per_sec')
            if fps and (best is None or fps > best):
                best = fps

        # Size of one collated batch ON THE WIRE (what each step uploads).
        host_batch = next(iter(exp.train_loader.data_loader))

        def wire_bytes(v):
            if transfer_dtype and v.dtype == np.float32 and v.ndim >= 3:
                return v.size * 2  # bf16 wire format
            return v.nbytes

        batch_bytes = sum(wire_bytes(v) for v in host_batch.values()
                          if isinstance(v, np.ndarray))
        cache = getattr(exp.train_loader, 'device_cache', None)
        if cache is not None:
            # Per-batch wire traffic is ONE (B,) int32 index vector (offset/
            # length tables live on device); the corpus itself was a
            # one-time arena upload.
            batch_bytes = 4 * BATCH
        batch_frames = float(np.asarray(host_batch['n_frames']).sum())
        out = {'e2e_frames_per_sec': float(best),
               'e2e_utts': num_utts, 'e2e_epochs_measured': epochs - 1,
               'e2e_num_data_threads': num_data_threads,
               'e2e_batch_mb': round(batch_bytes / (1 << 20), 1),
               'e2e_frames_per_batch': batch_frames}
        if transfer_dtype:
            out['e2e_transfer_dtype'] = str(transfer_dtype)
        if device_normalise:
            out['e2e_device_normalise'] = True
        if cache is not None:
            out['e2e_device_cache'] = True
            out['e2e_cache_mb'] = round(cache.bytes / (1 << 20), 1)
        if steps_per_dispatch > 1:
            out['e2e_steps_per_dispatch'] = int(steps_per_dispatch)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _e2e_subprocess(device_normalise=False, device_cache=False,
                    steps_per_dispatch=1, length_sort_window=0,
                    num_utts=512, epochs=4, timeout=1200):
    return _run_bench_code(
        'import bench, json; print("BENCH_JSON:" + json.dumps('
        f'bench.bench_e2e(num_utts={int(num_utts)}, epochs={int(epochs)}, '
        f'device_normalise={bool(device_normalise)}, '
        f'device_cache={bool(device_cache)}, '
        f'steps_per_dispatch={int(steps_per_dispatch)}, '
        f'length_sort_window={int(length_sort_window)})))', timeout=timeout)


# (name, rnn_backend, compute_dtype, scan unroll). Scan unroll 64 amortises
# per-iteration loop overhead of the sequential recurrence — measured ~3x
# faster than unroll 8 at these shapes with identical numerics.
CONFIGS = (
    ('scan_bf16_u64', 'scan', 'bfloat16', 64),
    ('scan_bf16', 'scan', 'bfloat16', 8),
    ('scan', 'scan', None, 8),
    ('pallas', 'pallas', None, 8),
)


def main():
    # Wall-clock budget. Round-3 lesson: the driver's window is FINITE and
    # bench.py printed its single JSON line only at the very end, so a
    # driver timeout produced rc=124 with ZERO captured output. The fix is
    # structural: (a) a provisional headline line is printed (flushed) the
    # moment the first successful measurement exists, and the line is
    # RE-emitted, enriched, after every subsequent stage — the driver takes
    # the last parseable line, so a kill at any point still captures
    # everything measured so far; (b) every stage's subprocess timeout is
    # derived from the remaining budget, never fixed; (c) the default
    # budget is small enough to provably fit, and the secondary rows (e2e
    # ladder, vocoder, transformer) only run under MORGANA_BENCH_FULL=1.
    budget_s = float(os.environ.get('MORGANA_BENCH_BUDGET_S', 1350))
    full = os.environ.get('MORGANA_BENCH_FULL') == '1'
    if full:
        budget_s = float(os.environ.get('MORGANA_BENCH_BUDGET_S', 5400))
    t_start = time.monotonic()
    remaining = lambda: budget_s - (time.monotonic() - t_start)

    def stage_timeout(cap, reserve=20):
        """Subprocess timeout for a stage: its own cap, never past the
        budget (minus a small reserve so the final emit always happens)."""
        return max(60.0, min(float(cap), remaining() - reserve))

    _last_emitted = [None]

    def emit(line):
        # Deduplicate: a stage that added nothing (skipped/failed) would
        # otherwise re-print a byte-identical line.
        s = json.dumps(line)
        if s != _last_emitted[0]:
            print(s, flush=True)
            _last_emitted[0] = s

    baseline_fps = get_baseline()

    # Fail fast when the device is unreachable: the tunnel has been observed
    # to wedge (jax.devices() hangs indefinitely in every fresh process).
    # Without this guard each config subprocess would burn its full timeout
    # and the in-process fallback would hang with no timeout at all — no
    # JSON line would ever come out. Wedges are sometimes transient, so keep
    # re-probing while the budget allows a meaningful measurement afterwards
    # (headline config needs ~400s).
    probe_waited, reachable, probed = 0.0, False, False
    while not probed or remaining() > 500:
        probed = True
        try:
            _run_bench_code(
                'import json, jax; d = jax.devices();'
                'print("BENCH_JSON:" + json.dumps({"n": len(d)}))',
                timeout=stage_timeout(150))
            reachable = True
            break
        except Exception:
            probe_waited = time.monotonic() - t_start
            # Brief pause so a flapping tunnel isn't hammered; the probe
            # itself already consumed up to 150s of the budget.
            time.sleep(min(60, max(0, remaining() - 500)))
    if not reachable:
        emit({
            'metric': 'rnn_spss_train_frames_per_sec', 'value': 0.0,
            'unit': 'frames/sec', 'vs_baseline': 0.0,
            'error': 'device unreachable: jax.devices() did not respond '
                     f'across {probe_waited:.0f}s of repeated probes '
                     '(tunnel wedged); no measurement possible in this '
                     'window'})
        return

    # FIRST line out the door: the device is reachable, measurement is
    # starting. If everything after this dies at a driver kill (round-3's
    # rc=124/parsed=null, re-reproduced in the round-5 wedge rehearsal),
    # the artifact still parses and says WHY it is empty.
    emit({'metric': 'rnn_spss_train_frames_per_sec', 'value': 0.0,
          'unit': 'frames/sec', 'vs_baseline': 0.0,
          'status': 'provisional: device reachable after '
                    f'{probe_waited:.0f}s of probing; measurement starting '
                    '(later lines supersede this one)',
          't_elapsed_s': round(time.monotonic() - t_start, 1)})

    # Mutable stage state; _build_line snapshots it after every stage.
    results = {}
    degraded = False
    failed = []
    failure_notes = {}  # stage name -> first line of the failure reason
    measured_peak = transfer_bw = None
    extras = {}  # e2e/vocoder/transformer rows keyed by name

    def _throttled(res):
        if res['ms_per_step'] > 5 * res['burst_ms_per_step']:
            return True
        return bool(measured_peak) and \
            res['achieved_tflops'] / measured_peak < 0.15

    def _build_line():
        best_backend = max(results,
                           key=lambda b: results[b]['frames_per_sec'])
        result = results[best_backend]
        line = {
            'metric': 'rnn_spss_train_frames_per_sec',
            # The headline is the SUSTAINED (readback-barrier) number; the
            # burst rides along as burst_* (block_until_ready on the
            # tunnelled runtime can credit scheduling rather than
            # completion, which is how round 2 printed a physically
            # impossible MFU of 1.78).
            'value': round(result['frames_per_sec'], 1),
            'unit': 'frames/sec',
            'vs_baseline': round(result['frames_per_sec'] / baseline_fps, 2),
            'backend': best_backend,
            'ms_per_step': round(result['ms_per_step'], 2),
            'sustained_steps': result.get('sustained_steps'),
            'sustained_spread': result.get('sustained_spread'),
            'burst_ms_per_step': round(result['burst_ms_per_step'], 2),
            'sustained_vs_burst': round(
                result['ms_per_step'] / result['burst_ms_per_step'], 2),
            'achieved_tflops': round(result['achieved_tflops'], 1),
            'throttle_ratio': result.get('throttle_ratio'),

            'nominal_peak_tflops': result['nominal_peak_tflops'],
            'mfu_vs_nominal': round(result['mfu_vs_nominal'], 3),
            'device_kind': result.get('device_kind', ''),
        }
        if measured_peak is not None:
            line['measured_peak_tflops'] = round(measured_peak, 1)
            line['mfu'] = round(result['achieved_tflops'] / measured_peak, 3)
        if transfer_bw is not None:
            line['host_to_device_mb_per_sec'] = round(transfer_bw, 1)
        e2e = extras.get('e2e')
        if e2e:
            line.update({k: (round(v, 1) if isinstance(v, float) else v)
                         for k, v in e2e.items()})
            line['e2e_of_compute'] = round(
                e2e['e2e_frames_per_sec'] / result['frames_per_sec'], 3)
            if transfer_bw is not None and e2e.get('e2e_batch_mb'):
                # The transfer-bound ceiling for e2e on THIS device link:
                # when the device sits behind a network tunnel, batch
                # upload — not the input pipeline — is what bounds
                # disk->device throughput.
                ceiling = (transfer_bw / e2e['e2e_batch_mb']
                           * e2e.get('e2e_frames_per_batch', 32 * 640.0))
                line['e2e_transfer_ceiling_frames_per_sec'] = round(
                    ceiling, 1)
        e2e_devnorm = extras.get('e2e_devnorm')
        if e2e_devnorm:
            line['e2e_devnorm_frames_per_sec'] = round(
                e2e_devnorm['e2e_frames_per_sec'], 1)
            line['e2e_devnorm_batch_mb'] = e2e_devnorm.get('e2e_batch_mb')
        e2e_devcache = extras.get('e2e_devcache')
        if e2e_devcache:
            line['e2e_devcache_frames_per_sec'] = round(
                e2e_devcache['e2e_frames_per_sec'], 1)
            line['e2e_devcache_batch_mb'] = e2e_devcache.get('e2e_batch_mb')
            line['e2e_devcache_corpus_mb'] = e2e_devcache.get('e2e_cache_mb')
            line['e2e_devcache_of_compute'] = round(
                e2e_devcache['e2e_frames_per_sec']
                / result['frames_per_sec'], 3)
        e2e_chain = extras.get('e2e_chain')
        if e2e_chain:
            line['e2e_chain_frames_per_sec'] = round(
                e2e_chain['e2e_frames_per_sec'], 1)
            line['e2e_chain_steps_per_dispatch'] = e2e_chain.get(
                'e2e_steps_per_dispatch')
            line['e2e_chain_of_compute'] = round(
                e2e_chain['e2e_frames_per_sec']
                / result['frames_per_sec'], 3)
        vocoder_row = extras.get('vocoder')
        if vocoder_row:
            line['vocoder_device_frames_per_sec'] = round(
                vocoder_row['device'], 1)
            line['vocoder_host_frames_per_sec'] = round(
                vocoder_row['host'], 1)
            line['vocoder_device_vs_host'] = round(
                vocoder_row['device'] / vocoder_row['host'], 2)
        transformer = extras.get('transformer')
        if transformer:
            line['transformer_frames_per_sec'] = round(
                transformer['frames_per_sec'], 1)
            line['transformer_ms_per_step'] = transformer['ms_per_step']
            line['transformer_achieved_tflops'] = \
                transformer['achieved_tflops']
            line['transformer_config'] = transformer['config']
            # Window-health fields ride with the row (VERDICT r4 item 1).
            line['transformer_sustained_vs_burst'] = round(
                transformer['ms_per_step']
                / max(transformer.get('burst_ms_per_step', 0.0), 1e-9), 2)
            line['transformer_throttle_ratio'] = \
                transformer.get('throttle_ratio')
            if measured_peak is not None:
                line['transformer_mfu'] = round(
                    transformer['achieved_tflops'] / measured_peak, 3)
        if degraded:
            line['degraded'] = 'subprocess isolation unavailable; single '\
                               'in-process measurement'
        if failed:
            line['failed_configs'] = list(failed)
        if failure_notes:
            line['stage_errors'] = {k: v.splitlines()[0][:160]
                                    for k, v in failure_notes.items()}
        line['t_elapsed_s'] = round(time.monotonic() - t_start, 1)
        if measured_peak is not None and line.get('mfu', 0) > 1.0:
            line['mfu_note'] = (
                'mfu > 1 vs the measured peak: the probe and the bench hit '
                'different chip windows (see throttle_ratio); rerun for a '
                'comparable pair')
        if _throttled(result):
            line['throttle_note'] = (
                'bench window hit a tunnel throttling episode (sustained '
                f'{line["sustained_vs_burst"]}x slower than burst); '
                'burst_ms_per_step shows the program\'s dispatch pace and '
                'healthy-window sustained numbers are in BASELINE.md — '
                'rerun in another window for a representative sustained '
                'reading')
        if 'chained_ms_per_step' in result:
            # The pace a --steps_per_dispatch user sees: N fused steps per
            # dispatch, so per-dispatch round-trip cost amortises by N.
            line['chained_steps_per_dispatch'] = result[
                'chained_steps_per_dispatch']
            line['chained_ms_per_step'] = round(
                result['chained_ms_per_step'], 2)
            line['chained_frames_per_sec'] = round(
                result['chained_frames_per_sec'], 1)
        for backend, res in results.items():
            if backend != best_backend:
                line[f'{backend}_frames_per_sec'] = round(
                    res['frames_per_sec'], 1)
                line[f'{backend}_ms_per_step'] = round(
                    res['ms_per_step'], 2)
                # Per-row window health: an A/B row measured in a degraded
                # window says so itself instead of being silently skipped.
                line[f'{backend}_sustained_vs_burst'] = round(
                    res['ms_per_step'] / res['burst_ms_per_step'], 2)
        return line

    # ---- The worker: EVERY stage in ONE streamed subprocess. ----
    # Phases arrive as flushed lines (headline -> probes -> transformer ->
    # quick A/B sweep -> compact e2e) and the main process re-emits the
    # enriched headline line after each one — a driver kill at any moment
    # keeps everything delivered so far, and the whole run pays the
    # fresh-process first-program cost (~240 s in some chip windows) ONCE.
    # Two attempts: the tunnel wedge that blocks fresh processes flaps on
    # the scale of minutes.
    name, backend, dtype, unroll = CONFIGS[0]

    def on_phase(d):
        nonlocal measured_peak, transfer_bw
        probes = d.pop('__probes__', None)
        if probes:
            measured_peak, transfer_bw = probes['peak'], probes['bw']
        for key, value in d.items():
            if key in ('transformer', 'e2e_chain'):
                extras[key] = value
            else:
                results[key] = value
        if results:
            emit(_build_line())

    for attempt in range(2):
        if attempt and (results or remaining() < 300):
            break
        try:
            phases, timed_out = _stream_worker(
                CONFIGS[0], CONFIGS[1:],
                deadline_s=max(60.0, remaining() - 60), on_phase=on_phase)
            if timed_out and phases:
                failure_notes['worker'] = \
                    f'worker cut off after {phases} phases; finished ' \
                    'phases kept'
            elif not phases:
                failure_notes[f'worker#{attempt}'] = \
                    'worker produced no phases (wedged or crashed)'
        except Exception as e:
            failure_notes[f'worker#{attempt}'] = \
                f'{type(e).__name__}: {e}'[:300]

    if name not in results:
        failed.append(name)
        # In-process fallback (only with budget left: in wedge windows the
        # MAIN process's first program can itself cost ~240 s, and a kill
        # mid-fallback must still leave the provisional line standing).
        if remaining() > 60:
            try:
                results[name] = bench_tpu(rnn_backend=backend,
                                          compute_dtype=dtype,
                                          unroll=unroll, sustained_steps=50,
                                          chained_steps=16)
                degraded = True
                failed.remove(name)
            except Exception as e:
                failure_notes[f'{name}#inproc'] = \
                    f'{type(e).__name__}: {e}'[:300]
    if not results:
        emit({'metric': 'rnn_spss_train_frames_per_sec', 'value': 0.0,
              'unit': 'frames/sec', 'vs_baseline': 0.0,
              'error': 'headline config failed in both subprocess and '
                       'in-process modes; see BASELINE.md for the last '
                       'healthy-window numbers',
              'stage_errors': {k: v.splitlines()[0][:160]
                               for k, v in failure_notes.items()},
              't_elapsed_s': round(time.monotonic() - t_start, 1)})
        raise SystemExit('no backend could be benchmarked')
    emit(_build_line())

    # After an in-process fallback, probe whether subprocess isolation has
    # RECOVERED (the fresh-process wedge flaps on the scale of minutes):
    # the remaining fallback stages run in their own processes and only
    # need the wedge gone now.
    isolation = not degraded
    if degraded and remaining() > 300:
        try:
            _run_bench_code(
                'import json, jax; d = jax.devices();'
                'print("BENCH_JSON:" + json.dumps({"n": len(d)}))',
                timeout=stage_timeout(120))
            isolation = True
            failure_notes['isolation'] = 'recovered after in-process fallback'
        except Exception:
            pass

    # ---- Per-piece fallbacks for what the worker did not deliver. ----
    # Breadth-first discipline (round-4 verdict): every backend config gets
    # one short measured pass before any budget goes to headline retries;
    # rows measured in a degraded window carry their own health fields
    # (per-config sustained_vs_burst) instead of being skipped.
    if not isolation:
        # In-process probes only (same interpreter as the fallback headline).
        if measured_peak is None and remaining() > 90:
            try:
                measured_peak = measure_peak_tflops()
                transfer_bw = measure_transfer_bandwidth()
            except Exception as e:
                failure_notes['probes'] = f'{type(e).__name__}: {e}'[:300]
            emit(_build_line())
    else:
        rest = [c for c in CONFIGS[1:] if c[0] not in results]
        # Per-piece fallbacks for whatever the pack did not deliver, each
        # budget-guarded (they matter in windows where the pack was cut
        # off early but the chip has since sped up).
        if measured_peak is None and remaining() > 330:
            try:
                probes = _probe_subprocess(timeout=stage_timeout(420))
                measured_peak, transfer_bw = probes['peak'], probes['bw']
            except Exception as e:
                failure_notes['probes'] = f'{type(e).__name__}: {e}'[:300]
        for cfg_name, cfg_backend, cfg_dtype, cfg_unroll in rest:
            if remaining() < 380:
                failed.append(cfg_name + ':skipped_budget')
                continue
            try:
                results[cfg_name] = _bench_subprocess(
                    cfg_backend, cfg_dtype, cfg_unroll, quick=True,
                    timeout=stage_timeout(450))
            except Exception as e:
                # Report, don't hide: a missing config silently shifting the
                # headline to a slower backend would read as a regression.
                failed.append(cfg_name)
                failure_notes[cfg_name] = f'{type(e).__name__}: {e}'[:300]
        emit(_build_line())

    # ---- Transformer / compact e2e fallback (when the pack missed them,
    # same per-phase merge; the 512-utt ladder stays behind
    # MORGANA_BENCH_FULL). ----
    missing = [k for k in ('transformer', 'e2e_chain') if k not in extras]
    if isolation and missing and remaining() > 300:
        parts = ['import json, sys, os;'
                 'sys.path.insert(0, '
                 'os.path.join(os.getcwd(), "benchmarks"));']
        if 'transformer' in missing:
            parts.append(
                'import bench_transformer as bt;'
                'print("BENCH_JSON:" + json.dumps({"transformer": '
                'bt.measure(512, 6, 4, 2048, "bfloat16", 32, 640)}), '
                'flush=True);')
        if 'e2e_chain' in missing:
            parts.append(
                'import bench;'
                'print("BENCH_JSON:" + json.dumps({"e2e_chain": '
                'bench.bench_e2e(num_utts=128, epochs=2, '
                'device_normalise=True, device_cache=True, '
                'steps_per_dispatch=16)}), '
                'flush=True);')
        try:
            merged = _run_merge_code(''.join(parts),
                                     timeout=stage_timeout(650))
            if merged.pop('__partial__', False):
                failure_notes['extras'] = \
                    'transformer/e2e fallback hit its timeout; finished ' \
                    'phases kept'
            extras.update(merged)
        except Exception as e:
            failure_notes['extras'] = f'{type(e).__name__}: {e}'[:300]
        for key in missing:
            if key not in extras:
                failed.append(key)
        emit(_build_line())

    # ---- Stage 6: throttle-episode retries for the headline, LAST. ----
    # When the sustained reading is wildly slower than the burst (or
    # achieved compute is far below the measured peak), the window was a
    # throttling episode, not the chip's real pace. Only after every stage
    # has its one measured pass does leftover budget go to escalating
    # cooldown retries (each still a genuine >= 3 x 15-step
    # readback-barriered measurement).
    if isolation:
        for cooldown in (60, 180, 300):
            if not _throttled(results[name]) or \
                    remaining() < cooldown + 240:
                break
            time.sleep(cooldown)
            try:
                retry = _bench_subprocess(backend, dtype, unroll,
                                          chained_steps=16,
                                          timeout=stage_timeout(500))
            except Exception:
                continue
            if retry['frames_per_sec'] > results[name]['frames_per_sec']:
                retry['throttle_retry'] = True
                results[name] = retry
                emit(_build_line())

    # ---- Stage 7 (MORGANA_BENCH_FULL=1): full e2e ladder + vocoder. ----
    if full and isolation:
        if remaining() > 420:
            try:
                extras['e2e'] = _e2e_subprocess(
                    timeout=stage_timeout(600))
            except Exception:
                pass
            emit(_build_line())
        # Corpus device-RESIDENT: steady-state epochs upload only (B,)
        # index vectors — the wire leaves the picture entirely.
        if remaining() > 420:
            try:
                extras['e2e_devcache'] = _e2e_subprocess(
                    device_normalise=True, device_cache=True,
                    timeout=stage_timeout(600))
            except Exception:
                pass
            emit(_build_line())
        # --device_normalise only: raw streams cross the wire, ~5x fewer
        # upload bytes — the recommended config when the corpus exceeds HBM.
        if remaining() > 420:
            try:
                extras['e2e_devnorm'] = _e2e_subprocess(
                    device_normalise=True, timeout=stage_timeout(600))
            except Exception:
                pass
            emit(_build_line())
        # On-device vocoder (vocoder/jax_world.py): batch waveform
        # synthesis on the accelerator vs the per-utterance host loop.
        if remaining() > 300:
            try:
                extras['vocoder'] = _run_bench_code(
                    'import json, sys, os;'
                    'sys.path.insert(0, '
                    'os.path.join(os.getcwd(), "benchmarks"));'
                    'import bench_vocoder as bv;'
                    'f0, vuv, mcep, bap, seq_len = bv.make_batch(32, 600);'
                    'host = bv.bench_host(f0, vuv, mcep, bap);'
                    'dev = bv.bench_device(f0, vuv, mcep, bap, seq_len);'
                    'print("BENCH_JSON:" + json.dumps('
                    '{"host": host, "device": dev}))',
                    timeout=stage_timeout(450))
            except Exception:
                pass

    emit(_build_line())


if __name__ == '__main__':
    main()
