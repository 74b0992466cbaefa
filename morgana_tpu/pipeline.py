"""Two-stage TTS pipeline: linguistic labels -> durations -> acoustic
features -> waveform.

The reference trains duration and acoustic models as separate experiments
but has NO composition step — at generation time its test sources still
read ground-truth durations and frame counts from disk
(``models/RNN_SPSS.py:60-70`` loads 'dur'/'n_frames' targets even in the
test epoch). Synthesising *new* speech requires chaining the two models:
predict phone durations, derive the frame clock from them, then drive the
acoustic model. :class:`TTSPipeline` is that missing composition, built on
two :class:`~morgana_tpu.serve.InferenceEngine` instances so each stage
reuses the serving stack (compiled bucketed predicts, normaliser handling,
optional int8 quantization — all of it applies per engine):

    dur_engine = InferenceEngine(DurationModel, 'dur/epoch_20.npz', ...)
    ac_engine = InferenceEngine(LSTMAcousticModel, 'ac/epoch_50.npz', ...)
    pipeline = TTSPipeline(dur_engine, ac_engine)
    results = pipeline.synthesize_ids(['utt_001'], data_dir='test',
                                      out_dir='tts_out')

Stage coupling details, all handled here:

* predicted float durations are rounded to integer frames, clamped to at
  least ``min_frames_per_phone`` within each utterance's true phone count
  and zeroed beyond it;
* the frame-level ``counters`` input is rebuilt from the PREDICTED
  durations with the same function the data-prep CLI uses for training
  corpora (``data/prepare.py::_frame_counters``), keeping the train/serve
  feature definition identical;
* each stage's engine is fed through ``predict_items(..., sources=...)``
  with only that model's true *inputs* (labels for the duration stage;
  labels+durations+counters for the acoustic stage), so no training
  targets need to exist on disk;
* when the acoustic model emits the full WORLD parameter set
  (lf0, vuv, mcep, bap), waveforms are synthesised exactly like
  ``models/rnn_spss.py``'s analysis hook (smoothed exp(lf0), 0.5 V/UV
  threshold); models that emit only some streams return features without
  audio.

CLI (one command from labels to wavs)::

    python -m morgana_tpu.pipeline \
        --duration_model models/duration_model.py:DurationModel \
        --duration_checkpoint dur/checkpoints/epoch_20.npz \
        --acoustic_model models/rnn_spss.py:LSTMAcousticModel \
        --acoustic_checkpoint ac/checkpoints/epoch_50.npz \
        --data_root data --data_dir test --out_dir tts_out
"""
import argparse
import json
import os
import time

import numpy as np

__all__ = ['TTSPipeline', 'durations_to_int', 'main']


def durations_to_int(pred_dur, n_phones, min_frames_per_phone=1,
                     max_total_frames=None):
    """Predicted float durations (P,) or (P, 1) -> integer frame counts of
    shape ``(n_phones,)`` (any padded tail of the prediction is dropped):
    rounded and clamped to ``min_frames_per_phone``. ``max_total_frames``
    (optional) rescales an over-long utterance proportionally and then
    trims longest-phones-first so the cap holds EXACTLY (unless
    ``n_phones * min_frames_per_phone`` already exceeds it, the floor
    wins)."""
    dur = np.asarray(pred_dur, np.float64).reshape(-1)[:int(n_phones)]
    if not np.isfinite(dur).all():
        # np.maximum propagates NaN past the floor and astype(int64) turns
        # it into INT64_MIN — a silently dropped phone. Fail loudly instead:
        # non-finite durations mean the duration model diverged.
        raise ValueError(
            f'{int(np.sum(~np.isfinite(dur)))} non-finite predicted '
            f'duration(s); the duration model appears to have diverged')
    if max_total_frames and dur.sum() > max_total_frames:
        dur = dur * (max_total_frames / max(dur.sum(), 1e-9))
    dur = np.maximum(np.rint(dur), min_frames_per_phone).astype(np.int64)
    if max_total_frames:
        excess = int(dur.sum()) - int(max_total_frames)
        while excess > 0 and (dur > min_frames_per_phone).any():
            # Trim the longest phones first, one frame per pass.
            order = np.argsort(-dur)
            for i in order:
                if excess == 0:
                    break
                if dur[i] > min_frames_per_phone:
                    dur[i] -= 1
                    excess -= 1
    return dur


class TTSPipeline(object):
    """Chains a duration engine into an acoustic engine (and the vocoder).

    Parameters
    ----------
    duration_engine : InferenceEngine
        Engine over a model predicting ``'dur'`` from phone-level
        ``'lab'`` (+ ``'n_phones'``), e.g. ``models/duration_model.py``.
    acoustic_engine : InferenceEngine
        Engine over a model consuming ``'lab'``/``'dur'``/``'counters'``/
        ``'n_frames'``, e.g. ``models/rnn_spss.py`` or the transformer.
    min_frames_per_phone : int
        Floor applied to rounded predicted durations (a phone the duration
        model regressed to ~0 still occupies one frame).
    max_total_frames : int, optional
        Proportional cap on predicted utterance length — a guard against a
        mis-trained duration model compiling enormous buckets.
    sample_rate : int
        Vocoder sample rate for waveform synthesis.
    """

    # Each stage's true inputs: the subset of its model's data sources fed
    # at generation time (everything else a source dict may declare is a
    # training target that does not exist when synthesising new speech).
    DURATION_INPUTS = ('n_phones', 'lab')
    ACOUSTIC_INPUTS = ('n_frames', 'dur', 'lab', 'counters')

    def __init__(self, duration_engine, acoustic_engine,
                 min_frames_per_phone=1, max_total_frames=None,
                 sample_rate=16000, counter_fn=None, device_vocoder=False):
        self.duration_engine = duration_engine
        self.acoustic_engine = acoustic_engine
        self.min_frames_per_phone = int(min_frames_per_phone)
        self.max_total_frames = max_total_frames
        self.sample_rate = int(sample_rate)
        # device_vocoder: synthesise ALL waveforms as one batched XLA
        # program on the accelerator (vocoder/jax_world.py, ~12x the
        # per-utterance host loop on the bench chip) instead of the host
        # C++/numpy path. Same algorithm; the excitation noise comes from a
        # jax PRNG rather than the host path's per-utterance numpy seed.
        self.device_vocoder = bool(device_vocoder)
        if counter_fn is None:
            # The data-prep CLI's definition — train/serve identical for
            # corpora prepared by `python -m morgana_tpu.data.prepare`. A
            # corpus with a different counters convention supplies its own
            # fn(n_frames, dur) -> (n_frames, D).
            from morgana_tpu.data.prepare import _frame_counters
            counter_fn = _frame_counters
        self.counter_fn = counter_fn

    # ------------------------------------------------------------- stage 1

    def _stage_sources(self, engine, names):
        sources = engine.model.test_data_sources()
        missing = [n for n in names if n not in sources]
        if missing:
            raise ValueError(
                f'{type(engine.model).__name__} has no data source(s) '
                f'{missing}; pipeline stages need {names}')
        return {name: sources[name] for name in names}

    def predict_durations(self, items):
        """``items``: dicts with ``'name'`` and phone-level ``'lab'``.
        Returns ``{name: (P,) int64 frame counts}`` (zeros past each
        utterance's phone count)."""
        sources = self._stage_sources(self.duration_engine,
                                      self.DURATION_INPUTS)
        built = []
        for i, item in enumerate(items):
            lab = np.asarray(item['lab'], np.float32)
            built.append({'name': str(item.get('name', i)), 'lab': lab,
                          'n_phones': np.asarray([[float(lab.shape[0])]],
                                                 np.float32)})
        outputs = self.duration_engine.predict_items(built, sources=sources)
        durs = {}
        for item in built:
            out = outputs[item['name']]
            if 'dur' not in out:
                raise ValueError(
                    f'{type(self.duration_engine.model).__name__}.predict '
                    "must return a 'dur' output to drive the pipeline")
            durs[item['name']] = durations_to_int(
                out['dur'], int(float(np.asarray(item['n_phones']).ravel()[0])),
                self.min_frames_per_phone, self.max_total_frames)
        return durs

    # ------------------------------------------------------------- stage 2

    def synthesize_items(self, items, out_dir=None):
        """Full pipeline over in-memory items (``'name'`` + ``'lab'``).

        Returns ``{name: outputs}`` where outputs holds the predicted
        ``'dur'`` (int frames), ``'n_frames'``, every acoustic output
        (unpadded), and — when the acoustic model emits lf0/vuv/mcep/bap —
        a float ``'wav'``. With ``out_dir``, wavs are written to
        ``{out_dir}/synth/{name}.wav`` and every predicted feature to
        ``{out_dir}/feats/{key}/{name}.npy`` (the ``viz.io`` dump layout),
        durations included — so the directory is populated even for
        models that emit features but not the full WORLD parameter set."""
        durs = self.predict_durations(items)
        sources = self._stage_sources(self.acoustic_engine,
                                      self.ACOUSTIC_INPUTS)
        built = []
        for i, item in enumerate(items):
            name = str(item.get('name', i))
            dur = durs[name]
            valid = dur[dur > 0]
            n_frames = int(valid.sum())
            built.append({
                'name': name,
                'lab': np.asarray(item['lab'], np.float32),
                'dur': dur.astype(np.float32)[:, None],
                'counters': self.counter_fn(n_frames, valid),
                'n_frames': np.asarray([[float(n_frames)]], np.float32),
            })
        acoustic = self.acoustic_engine.predict_items(built, sources=sources)

        results = {}
        for item in built:
            name = item['name']
            out = dict(acoustic[name])
            out['dur'] = durs[name]
            out['n_frames'] = int(np.asarray(item['n_frames']).ravel()[0])
            if not self.device_vocoder:
                wav = self._synthesize_wav(out)
                if wav is not None:
                    out['wav'] = wav
            results[name] = out
        if self.device_vocoder:
            self._synthesize_wavs_device(results)
        if out_dir:
            for name, out in results.items():
                self._dump_outputs(name, out, out_dir)
        return results

    def _dump_outputs(self, name, out, out_dir):
        from morgana_tpu.data import file_io
        for key, value in out.items():
            if key == 'wav':
                continue
            arr = np.asarray(value)
            if arr.ndim >= 1 and arr.dtype.kind in 'fiub':
                file_io.save_bin(arr, os.path.join(out_dir, 'feats', key,
                                                   f'{name}.npy'))
        if 'wav' in out:
            file_io.save_wav(out['wav'],
                             os.path.join(out_dir, 'synth', f'{name}.wav'),
                             sample_rate=self.sample_rate)

    def stream_audio(self, item, chunk_frames=64, context=32, lookahead=16,
                     frame_period=5.0):
        """Streaming TTS from labels: predicts durations (phone-level, one
        cheap dispatch), then streams the acoustic model chunk by chunk all
        the way to waveform — constant time-to-first-audio regardless of
        utterance length. Yields ``(feature_chunk, wav_chunk)`` pairs
        (:meth:`InferenceEngine.stream_item_audio`); requires an acoustic
        model with streaming hooks emitting the full WORLD parameter set.

        Returns ``(dur, generator)`` so callers know the planned frame
        clock before the first chunk arrives."""
        name = str(item.get('name', 0))
        dur = self.predict_durations([item])[name]
        valid = dur[dur > 0]
        n_frames = int(valid.sum())
        built = {
            'name': name,
            'lab': np.asarray(item['lab'], np.float32),
            'dur': dur.astype(np.float32)[:, None],
            'counters': self.counter_fn(n_frames, valid),
            'n_frames': np.asarray([[float(n_frames)]], np.float32),
        }
        gen = self.acoustic_engine.stream_item_audio(
            built, chunk_frames=chunk_frames, context=context,
            lookahead=lookahead, sample_rate=self.sample_rate,
            frame_period=frame_period,
            sources=self._stage_sources(self.acoustic_engine,
                                        self.ACOUSTIC_INPUTS))
        return dur, gen

    def synthesize_ids(self, file_ids, data_dir='test', out_dir=None):
        """Full pipeline for on-disk utterances: loads each id's phone-level
        labels with the duration model's own 'lab' source, then delegates to
        :meth:`synthesize_items`."""
        lab_source = self._stage_sources(self.duration_engine, ('lab',))['lab']
        root_dir = os.path.join(self.duration_engine.data_root, data_dir)
        items = [{'name': utt, 'lab': lab_source.load_file(utt, root_dir)}
                 for utt in file_ids]
        return self.synthesize_items(items, out_dir=out_dir)

    # ------------------------------------------------------------- vocoder

    def _synthesize_wavs_device(self, results):
        """Adds ``'wav'`` to every result carrying the full WORLD parameter
        set, via ONE batched on-device synthesis program
        (``vocoder.jax_world.synthesize_batch``). f0 smoothing (a tiny (T,)
        host filter) stays on host, matching the host recipe."""
        from morgana_tpu import vocoder
        from morgana_tpu.vocoder import jax_world
        from morgana_tpu.data.dataset import bucket_size

        names = [n for n, out in results.items()
                 if all(k in out for k in ('lf0', 'vuv', 'mcep', 'bap'))]
        if not names:
            return
        f0s, vuvs, lens = [], [], []
        for name in names:
            out = results[name]
            lf0 = np.asarray(out['lf0'], np.float64).reshape(-1)
            f0s.append(vocoder.smooth_f0(np.exp(lf0)))
            vuvs.append((np.asarray(out['vuv']).reshape(-1) > 0.5)
                        .astype(np.float32))
            # Host semantics (synthesize_world_feats): streams of unequal
            # frame counts trim to the common length.
            lens.append(min(lf0.shape[0], vuvs[-1].shape[0],
                            np.asarray(out['mcep']).shape[0],
                            np.asarray(out['bap']).shape[0]))
        T = bucket_size(max(lens))
        mcep_dim = np.asarray(results[names[0]]['mcep']).shape[-1]
        bap_dim = np.asarray(results[names[0]]['bap']).shape[-1]
        batch = len(names)
        f0_b = np.zeros((batch, T), np.float32)
        vuv_b = np.zeros((batch, T), np.float32)
        mcep_b = np.zeros((batch, T, mcep_dim), np.float32)
        bap_b = np.zeros((batch, T, bap_dim), np.float32)
        for i, name in enumerate(names):
            l = lens[i]
            f0_b[i, :l] = f0s[i][:l]
            vuv_b[i, :l] = vuvs[i][:l]
            mcep_b[i, :l] = np.asarray(results[name]['mcep'],
                                       np.float32)[:l]
            bap_b[i, :l] = np.asarray(results[name]['bap'], np.float32)[:l]
        waves, wave_lens = jax_world.synthesize_batch(
            f0_b, vuv_b, mcep_b, bap_b, np.asarray(lens), self.sample_rate)
        waves = np.asarray(waves)
        wave_lens = np.asarray(wave_lens)
        for i, name in enumerate(names):
            results[name]['wav'] = waves[i, :int(wave_lens[i])]

    def _synthesize_wav(self, outputs):
        """WORLD synthesis when the full parameter set is present — the same
        recipe as ``models/rnn_spss.py``'s analysis hook."""
        if not all(k in outputs for k in ('lf0', 'vuv', 'mcep', 'bap')):
            return None
        from morgana_tpu import vocoder

        lf0 = np.asarray(outputs['lf0'], np.float64).reshape(-1)
        vuv = np.asarray(outputs['vuv']).reshape(-1) > 0.5
        f0 = vocoder.smooth_f0(np.exp(lf0))
        return vocoder.synthesize_world_feats(
            f0, vuv, np.asarray(outputs['mcep'], np.float64),
            np.asarray(outputs['bap'], np.float64), self.sample_rate)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Two-stage TTS generation: duration model -> acoustic '
                    'model -> WORLD vocoder, from phone-level label files.')
    parser.add_argument('--duration_model', required=True,
                        help="'pkg.module:Class' or 'file.py:Class'.")
    parser.add_argument('--duration_checkpoint', required=True)
    parser.add_argument('--acoustic_model', required=True)
    parser.add_argument('--acoustic_checkpoint', required=True)
    parser.add_argument('--data_root', default='.')
    parser.add_argument('--normalisation_dir', default='train')
    parser.add_argument('--data_dir', default='test')
    parser.add_argument('--id_list', default=None,
                        help='Id-list file (relative to --data_root); '
                             'defaults to the conventional '
                             '{data_dir}/{data_dir}_file_id_list.scp.')
    parser.add_argument('--out_dir', default='tts_generated')
    parser.add_argument('--sample_rate', type=int, default=16000)
    parser.add_argument('--min_frames_per_phone', type=int, default=1)
    parser.add_argument('--max_total_frames', type=int, default=None)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--device', default=None)
    parser.add_argument('--compute_dtype', default=None)
    parser.add_argument('--quantize', default=None,
                        choices=['int8', 'int4'],
                        help='Serve both stages with weight-only quantized '
                             'parameters (int8, or packed group-wise int4).')
    parser.add_argument('--data_parallel', action='store_true', default=False,
                        help='Shard both stages\' prediction batches over '
                             'all local devices.')
    parser.add_argument('--device_vocoder', action='store_true',
                        default=False,
                        help='Synthesise all waveforms as one batched XLA '
                             'program on the accelerator instead of the '
                             'per-utterance host vocoder (bulk-generation '
                             'throughput; see benchmarks/bench_vocoder.py).')
    parser.add_argument('--duration_model_kwargs', default='{}')
    parser.add_argument('--acoustic_model_kwargs', default='{}')
    parser.add_argument('--evaluate_against', default=None,
                        help='Reference feature directory (e.g. the data '
                             'split itself): after generation, score the '
                             'dumped features with morgana_tpu.evaluate and '
                             'include the metrics in the stats line.')
    args = parser.parse_args(argv)

    import ast

    from morgana_tpu.data import file_io
    from morgana_tpu.serve import InferenceEngine, load_model_class

    if args.id_list is None:
        base = os.path.basename(os.path.normpath(args.data_dir))
        args.id_list = os.path.join(args.data_dir,
                                    f'{base}_file_id_list.scp')
    ids = file_io.get_file_ids(os.path.join(args.data_root, args.id_list))

    common = dict(data_root=args.data_root,
                  normalisation_dir=args.normalisation_dir,
                  device=args.device, compute_dtype=args.compute_dtype,
                  batch_size=args.batch_size, quantize=args.quantize,
                  data_parallel=args.data_parallel)
    duration_engine = InferenceEngine(
        load_model_class(args.duration_model), args.duration_checkpoint,
        model_kwargs=ast.literal_eval(args.duration_model_kwargs), **common)
    # The first engine owns platform/dtype selection for the process.
    common.update(device=None, compute_dtype=None)
    acoustic_engine = InferenceEngine(
        load_model_class(args.acoustic_model), args.acoustic_checkpoint,
        model_kwargs=ast.literal_eval(args.acoustic_model_kwargs), **common)

    pipeline = TTSPipeline(duration_engine, acoustic_engine,
                           min_frames_per_phone=args.min_frames_per_phone,
                           max_total_frames=args.max_total_frames,
                           sample_rate=args.sample_rate,
                           device_vocoder=args.device_vocoder)
    start = time.perf_counter()
    results = pipeline.synthesize_ids(ids, data_dir=args.data_dir,
                                      out_dir=args.out_dir)
    elapsed = time.perf_counter() - start
    frames = sum(r['n_frames'] for r in results.values())
    wavs = sum(1 for r in results.values() if 'wav' in r)
    stats = {
        'utterances': len(results), 'frames': int(frames), 'wavs': wavs,
        'seconds': round(elapsed, 3),
        'frames_per_sec': round(frames / elapsed, 1) if elapsed else 0.0,
        'out_dir': args.out_dir}
    if args.evaluate_against:
        from morgana_tpu.evaluate import evaluate_dirs
        try:
            stats['evaluation'] = evaluate_dirs(
                args.evaluate_against, os.path.join(args.out_dir, 'feats'),
                ids)
        except Exception as exc:  # noqa: BLE001 - generation already succeeded
            # The generated artifacts are on disk either way; a scoring
            # problem must not discard the run's stats line.
            stats['evaluation_error'] = f'{type(exc).__name__}: {exc}'
    print(json.dumps(stats))


if __name__ == '__main__':
    main()
