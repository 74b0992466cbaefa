"""Streaming-inference latency benchmark: time-to-first-output for chunked
streaming vs whole-utterance batch prediction.

Trains a small GRU+LSTM+MLPG model for one epoch, then serves one LONG
utterance both ways:

* ``batch``  — ``predict_items``: full-utterance compiled predict + MLPG,
               latency = whole utterance before the first frame exists.
* ``stream`` — ``stream_item``: fixed-chunk compiled program with state
               carry + windowed MLPG; reports time-to-first-frames, total
               time, and inter-chunk arrival percentiles.
* ``wav``    — streamed features through vocoder.StreamingSynthesizer:
               time-to-first-audio-sample.

Streaming's advantage grows linearly with utterance length (batch latency
is O(T); time-to-first-chunk is O(chunk + lookahead)).

Run: ``python benchmarks/bench_stream.py [frames] [--device cpu|tpu]``
Prints one JSON line per configuration.
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', 'tests'))


def make_long_item(rng, frames, acoustic=False):
    phones = max(2, frames // 4)
    reps = frames // phones
    item = {'name': 'long',
            'lab': rng.random((phones, 600)).astype(np.float32),
            'counters': rng.random((frames, 9)).astype(np.float32),
            'lf0': rng.normal(size=(frames, 1)).astype(np.float32),
            'vuv': (rng.random((frames, 1)) > 0.3).astype(np.float32),
            'dur': np.full((phones, 1), reps, np.float32),
            'n_frames': np.asarray([float(phones * reps)], np.float32)}
    if acoustic:
        item['mcep'] = (0.05 * rng.standard_normal((frames, 60))).astype(np.float32)
        item['mcep'][:, 0] -= 2.0
        item['bap'] = (-2.0 + 0.1 * rng.standard_normal((frames, 5))).astype(np.float32)
    return item


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1600
    device = 'cpu'
    if '--device' in sys.argv:
        device = sys.argv[sys.argv.index('--device') + 1]
    model_name = 'tiny'
    if '--model' in sys.argv:
        model_name = sys.argv[sys.argv.index('--model') + 1]

    from morgana_tpu import nn
    from morgana_tpu import platform as _platform
    if device:
        _platform.select_platform(device)

    # NOT tests/conftest: importing it would force the CPU backend and
    # silently override --device tpu (see benchmarks/common.py).
    from common import builder_args  # noqa: E402
    from morgana_tpu.data.synthetic import generate_voice_data
    from morgana_tpu.experiment_builder import ExperimentBuilder
    from morgana_tpu.serve import InferenceEngine
    from morgana_tpu.vocoder import StreamingSynthesizer

    acoustic = model_name in ('acoustic', 'transformer')
    if model_name == 'acoustic':
        # The flagship LSTMAcousticModel (8x512 LSTM, lf0+vuv+mcep+bap
        # heads): end-to-end streaming TTS with real vocoder features.
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), '..', 'models'))
        from rnn_spss import LSTMAcousticModel as model_cls  # noqa: E402
        model_kwargs = {'rnn_unroll': 64}
    elif model_name == 'transformer':
        # The causal transformer in its streamable configuration: per-layer
        # KV caches instead of recurrent state; same output heads.
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), '..', 'models'))
        from transformer_spss import TransformerAcousticModel as model_cls  # noqa: E402
        model_kwargs = {'causal': True, 'attention_window': 256,
                        'num_layers': 6, 'd_model': 512, 'num_heads': 8}
    else:
        from tiny_models import TinyStreamModel as model_cls  # noqa: E402
        model_kwargs = {}

    tmp = tempfile.mkdtemp(prefix='bench_stream_')
    data_root = os.path.join(tmp, 'data')
    generate_voice_data(data_root, num_train=8, num_valid=2, num_test=2, seed=0)
    args = builder_args(data_root, os.path.join(tmp, 'experiments'),
                        end_epoch=1, valid=False, test=False,
                        model_kwargs=model_kwargs)
    nn.manual_seed(args['seed'])
    ExperimentBuilder(model_cls, experiment_name='stream_bench',
                      **args).run_experiment()
    ckpt = os.path.join(tmp, 'experiments', 'stream_bench', 'checkpoints',
                        'epoch_1.npz')
    engine = InferenceEngine(model_cls, ckpt, data_root=data_root,
                             batch_size=1, model_kwargs=model_kwargs)

    rng = np.random.default_rng(0)
    # make_long_item upsamples phones by integer repetitions; use the exact
    # frame count it realises.
    frames = (frames // 4) * 4
    item = make_long_item(rng, frames, acoustic=acoustic)
    chunk_frames, lookahead = 64, 16
    frame_ms = 5.0  # synthetic corpus frame period

    def vary(round_idx):
        # Tunnel rule (CLAUDE.md): identical repeated dispatches can be
        # deduplicated server-side — vary operands between rounds.
        out = dict(item)
        out['counters'] = item['counters'] + np.float32(1e-4 * (round_idx + 1))
        return out

    # Warmup both paths (compiles: bucketed batch program, chunk programs,
    # MLPG window programs).
    engine.predict_items([item])
    for _ in engine.stream_item(item, chunk_frames=chunk_frames,
                                lookahead=lookahead):
        pass

    def best_of(fn, rounds=3):
        results = [fn(vary(i)) for i in range(rounds)]
        return min(results, key=lambda r: r['total_ms'])

    # Batch: first output frame exists only when the whole utterance is done.
    def run_batch(it):
        start = time.perf_counter()
        out = engine.predict_items([it])
        lf0 = np.asarray(out['long']['lf0'])
        total = (time.perf_counter() - start) * 1000.0
        assert lf0.shape[0] == frames
        return {'total_ms': total, 'first_output_ms': total}

    batch = best_of(run_batch)
    print(json.dumps({'config': 'batch', 'model': model_name,
                      'device': device, 'frames': frames,
                      'first_output_ms': round(batch['first_output_ms'], 2),
                      'total_ms': round(batch['total_ms'], 2)}))

    # Streaming: frames arrive incrementally.
    def run_stream(it):
        arrivals = []
        start = time.perf_counter()
        got = 0
        for chunk in engine.stream_item(it, chunk_frames=chunk_frames,
                                        lookahead=lookahead):
            arrivals.append((time.perf_counter() - start) * 1000.0)
            got += chunk['lf0'].shape[0]
        assert got == frames
        return {'total_ms': arrivals[-1], 'first_output_ms': arrivals[0],
                'arrivals': arrivals}

    stream = best_of(run_stream)
    gaps = np.diff([0.0] + stream['arrivals'])
    print(json.dumps({
        'config': 'stream', 'model': model_name, 'device': device,
        'frames': frames,
        'chunk_frames': chunk_frames, 'lookahead': lookahead,
        'first_output_ms': round(stream['first_output_ms'], 2),
        'total_ms': round(stream['total_ms'], 2),
        'chunk_gap_p50_ms': round(float(np.percentile(gaps, 50)), 2),
        'chunk_gap_p95_ms': round(float(np.percentile(gaps, 95)), 2),
        'speedup_to_first_output': round(
            batch['first_output_ms'] / stream['first_output_ms'], 1),
        'realtime_budget_ms_per_chunk': chunk_frames * frame_ms}))

    # Streamed features -> audio: time to the first finalised wav sample.
    # The acoustic model streams its own vocoder features (mcep/bap/vuv);
    # the tiny lf0-only model gets a flat stand-in envelope.
    bins = 513

    def run_wav(it):
        synth = StreamingSynthesizer(16000, frame_period=frame_ms, seed=0)
        start = time.perf_counter()
        first = None
        samples = 0
        for chunk in engine.stream_item(it, chunk_frames=chunk_frames,
                                        lookahead=lookahead):
            f0 = np.exp(np.clip(chunk['lf0'][:, 0], None, 8.0))
            n = f0.shape[0]  # a flush can emit more than chunk_frames
            if acoustic:
                wav = synth.push_world_feats(f0, chunk['vuv'][:, 0],
                                             chunk['mcep'], chunk['bap'])
            else:
                wav = synth.push(f0, np.full((n, bins), 1e-4),
                                 np.full((n, bins), 0.5))
            samples += wav.shape[0]
            if first is None and wav.shape[0]:
                first = (time.perf_counter() - start) * 1000.0
        samples += synth.flush().shape[0]
        total = (time.perf_counter() - start) * 1000.0
        assert samples == frames * 80
        return {'total_ms': total, 'first_output_ms': first}

    wav = best_of(run_wav)
    audio_ms = frames * frame_ms
    print(json.dumps({
        'config': 'wav', 'model': model_name, 'device': device,
        'frames': frames, 'audio_ms': audio_ms,
        'time_to_first_audio_ms': round(wav['first_output_ms'], 2),
        'total_ms': round(wav['total_ms'], 2),
        'realtime_factor': round(audio_ms / wav['total_ms'], 1)}))


if __name__ == '__main__':
    main()
