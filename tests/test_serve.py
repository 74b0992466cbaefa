"""InferenceEngine: serving a checkpoint without the experiment scaffolding
(predict + unpadding + analysis-hook synthesis + the CLI)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import builder_args
from tiny_models import TinyF0Model

from morgana_tpu import nn
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu.serve import InferenceEngine, load_model_class


@pytest.fixture(scope='module')
def trained(voice_data, tmp_path_factory):
    """One quickly-trained TinyF0Model checkpoint shared by the tests."""
    exp_base = str(tmp_path_factory.mktemp('serve') / 'experiments')
    args = builder_args(voice_data['data_root'], exp_base,
                        end_epoch=1, valid=False)
    nn.manual_seed(args['seed'])
    exp = ExperimentBuilder(TinyF0Model, experiment_name='srv', **args)
    exp.run_experiment()
    ckpt = os.path.join(exp_base, 'srv', 'checkpoints', 'epoch_1.npz')
    assert os.path.exists(ckpt)
    return {'checkpoint': ckpt, 'builder': exp}


class TestInferenceEngine:
    def test_predict_ids_unpadded_and_matches_training_params(self, voice_data, trained):
        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'], batch_size=2)
        # The engine serves exactly the trained parameters.
        trained['builder'].loop.sync_model()
        for k, v in nn.parameters(engine.model).items():
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(nn.parameters(trained['builder'].model)[k]))

        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            ids = [l.strip() for l in f if l.strip()]
        results = engine.predict_ids(ids, data_dir='test')
        assert set(results) == set(ids)
        for name in ids:
            pred = results[name]['normalised_lf0_deltas']
            n_frames = int(np.loadtxt(os.path.join(
                voice_data['data_root'], 'test', 'n_frames', f'{name}.txt')))
            assert pred.shape == (n_frames, 3)
            assert np.isfinite(pred).all()
        # No stray temp id-list files left in data_root.
        assert not [f for f in os.listdir(voice_data['data_root'])
                    if f.startswith('.serve_ids_')]

    def test_predict_items_matches_file_path(self, voice_data, trained):
        """The in-memory API (raw features, no files) produces exactly the
        file pipeline's outputs."""
        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'], batch_size=2)
        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            ids = [l.strip() for l in f if l.strip()]
        from_files = engine.predict_ids(ids, data_dir='test')

        data_dir = os.path.join(voice_data['data_root'], 'test')
        sources = engine.model.test_data_sources()
        items = [dict({name: src.load_file(utt, data_dir)
                       for name, src in sources.items()}, name=utt)
                 for utt in ids]
        from_memory = engine.predict_items(items)

        assert set(from_memory) == set(ids)
        for utt in ids:
            np.testing.assert_array_equal(
                from_memory[utt]['normalised_lf0_deltas'],
                from_files[utt]['normalised_lf0_deltas'])

    def test_generate_reports_stats(self, voice_data, trained, tmp_path):
        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'], batch_size=2)
        out_dir = str(tmp_path / 'gen')
        stats = engine.generate(out_dir, data_dir='test',
                                id_list='test/test_file_id_list.scp')
        assert stats['utterances'] == 2
        assert stats['frames'] > 0 and stats['frames_per_sec'] > 0
        assert os.path.isdir(out_dir)

    def test_generate_synthesises_wavs_with_real_hooks(self, voice_data, tmp_path):
        """F0Model's analysis hooks run WORLD synthesis through the engine."""
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'models'))
        try:
            from f0_test_model import F0Model
        finally:
            sys.path.pop(0)
        exp_base = str(tmp_path / 'experiments')
        args = builder_args(voice_data['data_root'], exp_base,
                            end_epoch=1, valid=False)
        nn.manual_seed(args['seed'])
        ExperimentBuilder(F0Model, experiment_name='srv_f0', **args).run_experiment()

        engine = InferenceEngine(
            F0Model, os.path.join(exp_base, 'srv_f0', 'checkpoints', 'epoch_1.npz'),
            data_root=voice_data['data_root'], batch_size=2,
            analysis_kwargs={'sample_rate': 16000})
        out_dir = str(tmp_path / 'gen_f0')
        stats = engine.generate(out_dir, data_dir='test',
                                id_list='test/test_file_id_list.scp')
        wavs = [f for f in os.listdir(os.path.join(out_dir, 'synth'))
                if f.endswith('.wav')]
        assert len(wavs) == stats['utterances'] == 2

    def test_load_model_class_forms(self):
        cls = load_model_class(
            os.path.join(os.path.dirname(__file__), 'tiny_models.py') + ':TinyF0Model')
        assert cls.__name__ == 'TinyF0Model'
        with pytest.raises(ValueError):
            load_model_class('no_colon_here')

    def test_unpad_keeps_utterance_level_outputs(self):
        """(B, D) outputs (e.g. embeddings) must pass through intact: only
        (B, T_pad, D) arrays are cut at each utterance's n_frames."""
        import numpy as np
        features = {'n_frames': np.array([3., 2.])}
        outputs = {
            'frames': np.arange(2 * 4 * 1, dtype=np.float32).reshape(2, 4, 1),
            'embedding': np.arange(2 * 16, dtype=np.float32).reshape(2, 16),
        }
        out = InferenceEngine._unpad(None, features, outputs)
        assert [a.shape for a in out['frames']] == [(3, 1), (2, 1)]
        assert out['embedding'].shape == (2, 16)


class TestServeCLI:
    def test_missing_id_list_fails_cleanly(self, tmp_path):
        """Without --id_list and without the conventional
        {data_dir}/{data_dir}_file_id_list.scp, the CLI errors at parse time
        (not with an API-internal message mid-run)."""
        from morgana_tpu import serve
        with pytest.raises(SystemExit):
            serve.main(['--model', 'x.py:M', '--checkpoint_path', 'c.npz',
                        '--data_root', str(tmp_path), '--data_dir', 'test'])

    def test_default_id_list_resolution(self, voice_data, trained, tmp_path):
        """--id_list defaults to the conventional id list when present."""
        engine_kwargs = {}

        from morgana_tpu import serve

        class FakeEngine:
            def __init__(self, *a, **kw):
                pass

            def generate(self, out_dir, data_dir='test', id_list=None):
                engine_kwargs['id_list'] = id_list
                return {'utterances': 0}

        orig = serve.InferenceEngine
        serve.InferenceEngine = FakeEngine
        try:
            model_spec = os.path.join(os.path.dirname(__file__),
                                      'tiny_models.py') + ':TinyF0Model'
            serve.main(['--model', model_spec,
                        '--checkpoint_path', trained['checkpoint'],
                        '--data_root', voice_data['data_root'],
                        '--data_dir', 'test',
                        '--out_dir', str(tmp_path / 'g')])
        finally:
            serve.InferenceEngine = orig
        assert engine_kwargs['id_list'] == os.path.join(
            'test', 'test_file_id_list.scp')

    def test_cli_end_to_end(self, voice_data, trained, tmp_path):
        out_dir = str(tmp_path / 'cli_gen')
        model_spec = os.path.join(os.path.dirname(__file__), 'tiny_models.py') \
            + ':TinyF0Model'
        env = dict(os.environ)
        env['PYTHONPATH'] = os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             os.path.dirname(__file__), env.get('PYTHONPATH', '')])
        proc = subprocess.run(
            [sys.executable, '-m', 'morgana_tpu.serve',
             '--model', model_spec,
             '--checkpoint_path', trained['checkpoint'],
             '--data_root', voice_data['data_root'],
             '--data_dir', 'test', '--id_list', 'test/test_file_id_list.scp',
             '--out_dir', out_dir, '--batch_size', '2', '--device', 'cpu'],
            capture_output=True, text=True, timeout=240, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        stats = json.loads(proc.stdout.strip().splitlines()[-1])
        assert stats['utterances'] == 2


class TestServeRobustness:
    def test_predict_ids_leaves_no_tempfiles_in_data_root(self, voice_data,
                                                          trained):
        engine = InferenceEngine(
            TinyF0Model, trained['checkpoint'],
            data_root=voice_data['data_root'], batch_size=2)
        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            file_ids = [l.strip() for l in f if l.strip()]
        ids = list(engine.predict_ids(file_ids))
        assert len(ids) == 2
        leftovers = [f for f in os.listdir(voice_data['data_root'])
                     if 'serve_ids' in f]
        assert leftovers == []

    def test_predict_items_chunks_by_batch_size(self, voice_data, trained):
        """More items than batch_size must chunk (one giant padded batch
        would OOM/pad everything to the longest utterance)."""
        import numpy as np
        engine = InferenceEngine(
            TinyF0Model, trained['checkpoint'],
            data_root=voice_data['data_root'], batch_size=2)
        rng = np.random.default_rng(0)
        items = [{'name': f'u{i}',
                  'lab': rng.random((8 + i, 600)).astype(np.float32),
                  'counters': rng.random((20 + i, 9)).astype(np.float32),
                  'lf0': rng.normal(size=(20 + i, 1)).astype(np.float32),
                  'vuv': (rng.random((20 + i, 1)) > 0.3).astype(np.float32),
                  'dur': np.full((8 + i, 1), (20 + i) // (8 + i), np.int64),
                  'n_frames': np.array([20. + i], np.float32)}
                 for i in range(5)]
        out = engine.predict_items(items)
        assert set(out) == {f'u{i}' for i in range(5)}

    def test_duplicate_ids_raise(self, voice_data, trained):
        """Results key by utterance name; the Python API refuses duplicates
        (mirroring the HTTP layer's 400) instead of silently overwriting."""
        engine = InferenceEngine(
            TinyF0Model, trained['checkpoint'],
            data_root=voice_data['data_root'], batch_size=2)
        with pytest.raises(ValueError, match='duplicate'):
            engine.predict_ids(['utt_a', 'utt_a'])
        rng = np.random.default_rng(0)
        item = {'name': 'same',
                'lab': rng.random((6, 600)).astype(np.float32),
                'counters': rng.random((18, 9)).astype(np.float32),
                'lf0': rng.normal(size=(18, 1)).astype(np.float32),
                'vuv': (rng.random((18, 1)) > 0.3).astype(np.float32),
                'dur': np.full((6, 1), 3, np.int64),
                'n_frames': np.array([18.0], np.float32)}
        with pytest.raises(ValueError, match='duplicate'):
            engine.predict_items([item, dict(item)])


class TestHTTPServing:
    def test_healthz_and_predict_roundtrip(self, voice_data, trained):
        """The HTTP front end serves the same results as predict_items."""
        import threading
        import urllib.request

        from morgana_tpu.http_serve import make_server

        engine = InferenceEngine(
            TinyF0Model, trained['checkpoint'],
            data_root=voice_data['data_root'], batch_size=2)
        server = make_server(engine, port=0)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            with urllib.request.urlopen(
                    f'http://127.0.0.1:{port}/healthz', timeout=30) as r:
                health = json.loads(r.read())
            assert health['status'] == 'ok'
            assert health['model'] == 'TinyF0Model'

            rng = np.random.default_rng(0)
            item = {'name': 'u0',
                    'lab': rng.random((6, 600)).tolist(),
                    'counters': rng.random((18, 9)).tolist(),
                    'lf0': rng.normal(size=(18, 1)).tolist(),
                    'vuv': (rng.random((18, 1)) > 0.3).astype(float).tolist(),
                    'dur': np.full((6, 1), 3).tolist(),
                    'n_frames': [18.0]}
            body = json.dumps({'items': [item]}).encode()
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/predict', data=body,
                headers={'Content-Type': 'application/json'})
            with urllib.request.urlopen(req, timeout=120) as r:
                reply = json.loads(r.read())
            pred = np.asarray(reply['results']['u0']['normalised_lf0_deltas'])
            assert pred.shape == (18, 3) and np.isfinite(pred).all()

            # Malformed request -> 400 with an error payload, server stays up.
            bad = urllib.request.Request(
                f'http://127.0.0.1:{port}/predict', data=b'{"items": [{}]}',
                headers={'Content-Type': 'application/json'})
            try:
                urllib.request.urlopen(bad, timeout=60)
                raise AssertionError('expected HTTP 400')
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert 'error' in json.loads(e.read())

            # Duplicate names would silently overwrite results -> 400.
            dup = urllib.request.Request(
                f'http://127.0.0.1:{port}/predict',
                data=json.dumps({'items': [item, item]}).encode(),
                headers={'Content-Type': 'application/json'})
            try:
                urllib.request.urlopen(dup, timeout=60)
                raise AssertionError('expected HTTP 400')
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert 'duplicate' in json.loads(e.read())['error']
        finally:
            server.shutdown()
            server.server_close()

    def test_concurrent_requests_are_safe(self, voice_data, trained):
        """Simultaneous POSTs from many client threads all succeed with each
        client's own results: the ThreadingHTTPServer handles connections
        concurrently and the engine lock serialises device dispatches."""
        import threading
        import urllib.request

        from morgana_tpu.http_serve import make_server

        engine = InferenceEngine(
            TinyF0Model, trained['checkpoint'],
            data_root=voice_data['data_root'], batch_size=2)
        server = make_server(engine, port=0)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        rng = np.random.default_rng(1)

        def make_item(name, frames):
            phones = max(2, frames // 3)
            return {'name': name,
                    'lab': rng.random((phones, 600)).tolist(),
                    'counters': rng.random((frames, 9)).tolist(),
                    'lf0': rng.normal(size=(frames, 1)).tolist(),
                    'vuv': (rng.random((frames, 1)) > 0.3).astype(float).tolist(),
                    'dur': np.full((phones, 1), frames // phones).tolist(),
                    'n_frames': [float(frames)]}

        results = {}
        errors = []

        def client(i):
            frames = 12 + 3 * i
            body = json.dumps({'items': [make_item(f'c{i}', frames)]}).encode()
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/predict', data=body,
                headers={'Content-Type': 'application/json'})
            try:
                with urllib.request.urlopen(req, timeout=300) as r:
                    reply = json.loads(r.read())
                results[i] = np.asarray(
                    reply['results'][f'c{i}']['normalised_lf0_deltas'])
            except Exception as exc:  # noqa: BLE001 - collected for assert
                errors.append((i, exc))

        try:
            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(6)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            assert not errors, errors
            assert set(results) == set(range(6))
            for i, pred in results.items():
                assert pred.shape == (12 + 3 * i, 3)
                assert np.isfinite(pred).all()
        finally:
            server.shutdown()
            server.server_close()


class TestDynamicBatching:
    """DynamicBatcher: concurrent requests coalesce into shared device
    batches with per-caller results and fault isolation."""

    @staticmethod
    def _item(rng, name, frames):
        phones = max(2, frames // 3)
        return {'name': name,
                'lab': rng.random((phones, 600)),
                'counters': rng.random((frames, 9)),
                'lf0': rng.normal(size=(frames, 1)),
                'vuv': (rng.random((frames, 1)) > 0.3).astype(float),
                'dur': np.full((phones, 1), frames // phones),
                'n_frames': np.asarray([float(frames)])}

    def test_coalesces_and_matches_individual_results(self, voice_data,
                                                      trained):
        import threading

        from morgana_tpu.serve import DynamicBatcher

        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'],
                                 batch_size=8)
        rng = np.random.default_rng(7)
        items = [self._item(rng, f'u{i}', 12 + 3 * i) for i in range(6)]
        # Two requests deliberately REUSE a name: results are per-caller, so
        # cross-request duplicates must not collide.
        items[5] = dict(items[5], name='u0')
        expected = [engine.predict_items([item]) for item in items]

        batcher = DynamicBatcher(engine, max_wait_ms=200.0)
        got = [None] * len(items)

        def client(i):
            got[i] = batcher.predict_items([items[i]])

        # Pre-load the queue before the worker can grab a lone first request
        # (its max_wait window makes coalescing deterministic from there).
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(items))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        batcher.close()

        assert batcher.batches_run < len(items), \
            f'no coalescing happened ({batcher.batches_run} dispatch groups)'
        assert batcher.requests_coalesced == len(items)
        for i, (exp, out) in enumerate(zip(expected, got)):
            assert set(out) == set(exp)
            for name in exp:
                for key in exp[name]:
                    np.testing.assert_allclose(
                        np.asarray(out[name][key], np.float32),
                        np.asarray(exp[name][key], np.float32),
                        rtol=2e-4, atol=2e-5,
                        err_msg=f'request {i} key {key}')

    def test_fault_isolation_and_per_request_duplicates(self, voice_data,
                                                        trained):
        import threading

        from morgana_tpu.serve import DynamicBatcher

        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'],
                                 batch_size=4)
        batcher = DynamicBatcher(engine, max_wait_ms=200.0)
        rng = np.random.default_rng(8)

        good_item = self._item(rng, 'ok', 15)
        bad_item = {'name': 'bad', 'lab': rng.random((4, 600))}  # missing keys
        outcome = {}

        def run(tag, items):
            try:
                outcome[tag] = batcher.predict_items(items)
            except Exception as exc:  # noqa: BLE001 - asserted below
                outcome[tag] = exc

        threads = [threading.Thread(target=run, args=('good', [good_item])),
                   threading.Thread(target=run, args=('bad', [bad_item]))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert isinstance(outcome['bad'], Exception)
        assert not isinstance(outcome['good'], Exception), outcome['good']
        assert 'ok' in outcome['good']

        # Duplicate names WITHIN one request still fail fast.
        with pytest.raises(ValueError, match='duplicate'):
            batcher.predict_items([good_item, dict(good_item)])
        batcher.close()
        with pytest.raises(RuntimeError, match='closed'):
            batcher.predict_items([good_item])

    def test_lone_request_never_waits(self, voice_data, trained):
        """Default-on dynamic batching must add ZERO latency to sequential
        traffic: a lone request dispatches immediately — the max_wait
        gather window only opens with >= 2 requests pending. Asserted with
        a wait far above any plausible dispatch time."""
        import time as _time

        from morgana_tpu.serve import DynamicBatcher

        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'],
                                 batch_size=4)
        rng = np.random.default_rng(13)
        batcher = DynamicBatcher(engine, max_wait_ms=10_000.0)
        try:
            batcher.predict_items([self._item(rng, 'warm', 12)])  # compile
            t0 = _time.perf_counter()
            out = batcher.predict_items([self._item(rng, 'solo', 12)])
            elapsed = _time.perf_counter() - t0
            assert 'solo' in out
            assert elapsed < 5.0, \
                f'lone request waited the batch window ({elapsed:.1f}s)'
            assert batcher.batches_run == 2
        finally:
            batcher.close()

    def test_backpressure_raises_overloaded(self, voice_data, trained):
        """A full pending queue rejects with Overloaded instead of queueing
        without bound.

        Staged deterministically (an earlier version raced: two of four
        concurrent requests could be rejected while the first two were still
        queued, after which the worker drained both at once and the queue
        never refilled): (1) one request is enqueued and the worker provably
        picks it up and blocks on the held device gate — the gate lock
        signals an Event on the worker's acquire attempt; (2) exactly
        max_queue requests fill the queue behind the blocked worker, which
        cannot drain them; (3) the probe must then be rejected, not enqueued
        (enqueueing would block this test forever behind the gate)."""
        import threading
        import time as _time

        from morgana_tpu.serve import DynamicBatcher, Overloaded

        class SignallingGate:
            """Lock whose acquire() signals before (possibly) blocking."""

            def __init__(self):
                self._inner = threading.Lock()
                self.acquire_attempted = threading.Event()

            def __enter__(self):
                self.acquire_attempted.set()
                self._inner.acquire()

            def __exit__(self, *exc):
                self._inner.release()

        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'],
                                 batch_size=2)
        rng = np.random.default_rng(11)
        gate = SignallingGate()
        gate._inner.acquire()  # held: the worker blocks inside _execute
        batcher = DynamicBatcher(engine, max_wait_ms=0.0, max_batch=2,
                                 max_queue=2, lock=gate)
        # Items are prebuilt on this thread (numpy Generators are not
        # thread-safe) and the probe item is ready before any blocking.
        queued_items = [[self._item(rng, f'q{i}', 12)] for i in range(3)]
        probe_item = [self._item(rng, 'rejected', 12)]
        results = [None] * 3
        threads = []
        try:
            def enqueue(i):
                results[i] = batcher.predict_items(queued_items[i])

            # Stage 1: the worker pops request 0 (emptying the queue) and
            # blocks on the gate — proven by the acquire signal.
            t0 = threading.Thread(target=enqueue, args=(0,), daemon=True)
            t0.start()
            threads.append(t0)
            assert gate.acquire_attempted.wait(timeout=120), \
                'worker never reached the device gate'
            with batcher._cv:
                assert not batcher._pending  # request 0 is in-flight

            # Stage 2: fill the queue to exactly max_queue behind the
            # blocked worker; both admissions see queued + 1 <= max_queue,
            # so neither can be rejected.
            for i in (1, 2):
                t = threading.Thread(target=enqueue, args=(i,), daemon=True)
                t.start()
                threads.append(t)
            deadline = _time.monotonic() + 120
            pending = 0
            while _time.monotonic() < deadline:
                with batcher._cv:
                    pending = sum(len(r['items']) for r in batcher._pending)
                if pending >= batcher.max_queue:
                    break
                _time.sleep(0.005)
            assert pending == batcher.max_queue, \
                f'queue never filled ({pending} pending)'

            # Stage 3: full queue -> immediate rejection.
            with pytest.raises(Overloaded, match='pending'):
                batcher.predict_items(probe_item)
        finally:
            gate._inner.release()
            for t in threads:
                t.join(timeout=600)
            batcher.close()
        # Once the gate opened, every admitted request was served.
        assert all(isinstance(r, dict) and r for r in results)

    def test_http_stats_and_503(self, voice_data, trained):
        """GET /stats reports counters/latency; Overloaded maps to 503 with
        Retry-After."""
        import threading
        import urllib.error
        import urllib.request

        from morgana_tpu.http_serve import make_server
        from morgana_tpu.serve import Overloaded

        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'],
                                 batch_size=2)
        server = make_server(engine, port=0, dynamic_batch_ms=1.0)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        rng = np.random.default_rng(12)
        item = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k, v in self._item(rng, 'u', 12).items()}
        try:
            body = json.dumps({'items': [item]}).encode()
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/predict', data=body,
                headers={'Content-Type': 'application/json'})
            with urllib.request.urlopen(req, timeout=300):
                pass
            with urllib.request.urlopen(
                    f'http://127.0.0.1:{port}/stats', timeout=60) as r:
                stats = json.loads(r.read())
            assert stats['requests'] == 1 and stats['errors'] == 0
            assert stats['latency_ms']['n'] == 1
            assert stats['dynamic_batching']['requests_coalesced'] == 1
            assert stats['engine'] == {
                'model': 'TinyF0Model', 'batch_size': 2, 'quantized': False,
                'data_parallel': False,
                # Batcher capacity is per-voice (max_batch defaults to the
                # engine's batch_size), so it reports per engine.
                'dynamic_batching': {'max_wait_ms': 1.0, 'max_batch': 2,
                                     'max_queue': 64}}  # 32 * max_batch

            # Force the overload path deterministically.
            original = server.batcher.predict_items
            server.batcher.predict_items = lambda items: (_ for _ in ()).throw(
                Overloaded('99 utterances already pending'))
            try:
                urllib.request.urlopen(req, timeout=60)
                raise AssertionError('expected HTTP 503')
            except urllib.error.HTTPError as e:
                assert e.code == 503
                assert e.headers['Retry-After'] == '1'
                assert 'pending' in json.loads(e.read())['error']
            finally:
                server.batcher.predict_items = original
            with urllib.request.urlopen(
                    f'http://127.0.0.1:{port}/stats', timeout=60) as r:
                stats = json.loads(r.read())
            assert stats['requests'] == 2 and stats['errors'] == 1
        finally:
            server.shutdown()
            server.server_close()

    def test_http_predict_through_batcher(self, voice_data, trained):
        """The HTTP endpoint with dynamic_batch_ms serves concurrent clients
        correctly and actually coalesces their device work."""
        import threading
        import urllib.request

        from morgana_tpu.http_serve import make_server

        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'],
                                 batch_size=8)
        server = make_server(engine, port=0, dynamic_batch_ms=150.0)
        assert server.batcher is not None
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        rng = np.random.default_rng(9)
        payloads = [json.dumps(
            {'items': [{k: (v.tolist() if isinstance(v, np.ndarray) else v)
                        for k, v in self._item(rng, f'c{i}', 12 + 3 * i).items()}]}
            ).encode() for i in range(5)]
        results, errors = {}, []

        def client(i):
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/predict', data=payloads[i],
                headers={'Content-Type': 'application/json'})
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    results[i] = json.loads(r.read())
            except Exception as exc:  # noqa: BLE001 - collected for assert
                errors.append((i, exc))

        try:
            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(5)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            assert not errors, errors
            assert set(results) == set(range(5))
            for i in range(5):
                pred = np.asarray(
                    results[i]['results'][f'c{i}']['normalised_lf0_deltas'])
                assert pred.shape == (12 + 3 * i, 3)
                assert np.isfinite(pred).all()
            assert server.batcher.requests_coalesced == 5
            assert server.batcher.batches_run < 5, \
                'HTTP requests were not coalesced'
        finally:
            server.shutdown()
            server.server_close()


class TestExportAndCompileCache:
    """AOT deployment artifacts (jax.export) + persistent compile cache."""

    def test_export_program_roundtrip(self, voice_data, trained, tmp_path):
        """The serialized StableHLO artifact reproduces the live engine's
        predict program exactly, without the model class or normalisers."""
        import jax
        from morgana_tpu.serve import load_exported_program
        from morgana_tpu.training import numeric_features

        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'],
                                 batch_size=2)
        loader = engine._loader('test', id_list='test/test_file_id_list.scp')
        features = next(iter(loader))
        path = str(tmp_path / 'predict.jaxexport')
        assert engine.export_program(features, path) == path
        assert os.path.getsize(path) > 0

        fn = load_exported_program(path)
        rng = jax.random.PRNGKey(7)
        batch = numeric_features(features)
        from_artifact = fn(engine._params, batch, rng)
        from_engine = engine._predict_step(engine._params, batch, rng)
        leaves_a = jax.tree_util.tree_leaves(from_artifact)
        leaves_e = jax.tree_util.tree_leaves(from_engine)
        assert len(leaves_a) == len(leaves_e) > 0
        for a, e in zip(leaves_a, leaves_e):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(e))

    def test_compilation_cache_dir_populates(self, voice_data, trained,
                                             tmp_path):
        """An engine pointed at a cache dir persists its compiled predict
        programs to disk (restart = cache hit, no recompile)."""
        cache = str(tmp_path / 'jit_cache')
        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'],
                                 batch_size=2,
                                 compilation_cache_dir=cache)
        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            ids = [l.strip() for l in f if l.strip()]
        results = engine.predict_ids(ids, data_dir='test')
        assert set(results) == set(ids)
        assert os.path.isdir(cache) and os.listdir(cache)


class TestDataParallelServing:
    """data_parallel=True: batches sharded over the 8 virtual devices,
    params replicated — outputs identical to single-device serving."""

    def test_predict_items_matches_single_device_incl_ragged_chunk(
            self, voice_data, trained):
        rng = np.random.default_rng(7)
        # 11 items with batch_size 8: one sharded chunk of 8 (divisible by
        # the 8-device 'data' axis) + one ragged chunk of 3 (fallback to
        # single-device placement).
        items = [TestDynamicBatching._item(rng, f'dp{i}', 24 + 4 * (i % 3))
                 for i in range(11)]
        plain = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                data_root=voice_data['data_root'],
                                batch_size=8)
        dp = InferenceEngine(TinyF0Model, trained['checkpoint'],
                             data_root=voice_data['data_root'],
                             batch_size=8, data_parallel=True)
        assert dp._mesh is not None and dp._mesh.shape['data'] == 8
        ref = plain.predict_items(items)
        out = dp.predict_items(items)
        assert set(out) == set(ref)
        for name in ref:
            np.testing.assert_array_equal(
                out[name]['normalised_lf0_deltas'],
                ref[name]['normalised_lf0_deltas'])

    def test_params_are_replicated(self, voice_data, trained):
        dp = InferenceEngine(TinyF0Model, trained['checkpoint'],
                             data_root=voice_data['data_root'],
                             data_parallel=True)
        leaf = next(iter(dp._params.values()))
        assert leaf.sharding.is_fully_replicated

    def test_generate_through_sharded_loader(self, voice_data, trained,
                                             tmp_path):
        dp = InferenceEngine(TinyF0Model, trained['checkpoint'],
                             data_root=voice_data['data_root'], batch_size=2,
                             data_parallel=True)
        stats = dp.generate(str(tmp_path / 'gen_dp'), data_dir='test',
                            id_list='test/test_file_id_list.scp')
        assert stats['utterances'] == 2 and stats['frames'] > 0


class TestMultiVoiceServing:
    """make_server with a {name: engine} dict: per-request voice routing,
    shared device lock, per-voice dynamic batchers."""

    def _post(self, port, payload, expect=200):
        import urllib.error
        import urllib.request
        body = json.dumps(payload).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict', data=body,
            headers={'Content-Type': 'application/json'})
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def test_routing_healthz_stats_and_unknown_model(self, voice_data,
                                                     trained):
        import threading
        import urllib.request

        from morgana_tpu.http_serve import make_server

        root = voice_data['data_root']
        engines = {
            'plain': InferenceEngine(TinyF0Model, trained['checkpoint'],
                                     data_root=root, batch_size=4),
            'quant': InferenceEngine(TinyF0Model, trained['checkpoint'],
                                     data_root=root, batch_size=4,
                                     quantize='int8'),
        }
        server = make_server(engines, port=0, dynamic_batch_ms=1.0)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        rng = np.random.default_rng(3)
        item = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k, v in TestDynamicBatching._item(rng, 'u', 16).items()}
        try:
            with urllib.request.urlopen(
                    f'http://127.0.0.1:{port}/healthz', timeout=60) as r:
                health = json.loads(r.read())
            assert set(health['models']) == {'plain', 'quant'}
            assert health['default'] == 'plain'

            # Default (no "model" key) routes to the first engine.
            code, res = self._post(port, {'items': [item]})
            assert code == 200
            default_pred = np.asarray(
                res['results']['u']['normalised_lf0_deltas'])

            code, res_q = self._post(port, {'items': [item],
                                            'model': 'quant'})
            assert code == 200
            quant_pred = np.asarray(
                res_q['results']['u']['normalised_lf0_deltas'])
            # Different voices genuinely serve different parameters.
            assert not np.array_equal(default_pred, quant_pred)
            assert np.allclose(default_pred, quant_pred, atol=0.05)

            code, err = self._post(port, {'items': [item], 'model': 'nope'})
            assert code == 404 and 'plain' in err['error']

            with urllib.request.urlopen(
                    f'http://127.0.0.1:{port}/stats', timeout=60) as r:
                stats = json.loads(r.read())
            assert stats['engines']['quant']['quantized'] is True
            assert stats['engines']['plain']['quantized'] is False
            assert stats['dynamic_batching']['requests_coalesced'] >= 2
        finally:
            server.shutdown()
            server.server_close()

    def test_single_engine_backcompat(self, voice_data, trained):
        from morgana_tpu.http_serve import make_server
        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'])
        server = make_server(engine, port=0)
        try:
            assert server.engines == {'default': engine}
            assert server.batcher is None and server.batchers == {}
        finally:
            server.server_close()


class TestFleetCLIContract:
    def test_model_and_checkpoint_required_without_fleet(self):
        from morgana_tpu import serve
        with pytest.raises(SystemExit):
            serve.main(['--data_root', '.'])

    def test_fleet_requires_http_port(self, tmp_path):
        from morgana_tpu import serve
        fleet = tmp_path / 'fleet.json'
        fleet.write_text(json.dumps(
            {'v': {'model': 'm.py:C', 'checkpoint_path': 'c.npz'}}))
        with pytest.raises(SystemExit):
            serve.main(['--fleet', str(fleet)])

    def test_fleet_entry_must_be_object(self, tmp_path):
        from morgana_tpu import serve
        fleet = tmp_path / 'fleet.json'
        fleet.write_text(json.dumps({'v': 'ckpt.npz'}))
        with pytest.raises(SystemExit):
            serve.main(['--fleet', str(fleet), '--http_port', '1'])

    def test_fleet_entry_needs_checkpoint(self, tmp_path):
        from morgana_tpu import serve
        fleet = tmp_path / 'fleet.json'
        fleet.write_text(json.dumps({'v': {'model': 'm.py:C'}}))
        with pytest.raises(SystemExit):
            serve.main(['--fleet', str(fleet), '--http_port', '1'])


class TestCheckpointHotReload:
    """reload_checkpoint / maybe_reload_newer_checkpoint: rolling model
    updates without restart or recompile."""

    def _second_epoch(self, trained):
        ckpt_dir = os.path.dirname(trained['checkpoint'])
        path2 = os.path.join(ckpt_dir, 'epoch_2.npz')
        if not os.path.exists(path2):
            # A genuinely different checkpoint: perturb epoch_1's params.
            with np.load(trained['checkpoint']) as data:
                params = {k: data[k] + 0.1 for k in data.files}
            np.savez(path2, **params)
        return path2

    def test_reload_swaps_predictions_without_recompile(self, voice_data,
                                                        trained):
        rng = np.random.default_rng(11)
        item = TestDynamicBatching._item(rng, 'u', 24)
        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'],
                                 batch_size=4)
        before = engine.predict_items([item])['u']['normalised_lf0_deltas']
        path2 = self._second_epoch(trained)
        assert engine.reload_checkpoint(path2) == path2
        assert engine.checkpoint_path == path2
        after = engine.predict_items([item])['u']['normalised_lf0_deltas']
        assert not np.array_equal(before, after)

        # Matches a fresh engine on the new checkpoint exactly.
        fresh = InferenceEngine(TinyF0Model, path2,
                                data_root=voice_data['data_root'],
                                batch_size=4)
        np.testing.assert_array_equal(
            after, fresh.predict_items([item])['u']['normalised_lf0_deltas'])

    def test_reload_preserves_quantization(self, voice_data, trained):
        from morgana_tpu.quantize import QuantizedArray
        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'],
                                 quantize='int8')
        engine.reload_checkpoint(self._second_epoch(trained))
        assert any(isinstance(v, QuantizedArray)
                   for v in engine._params.values())

    def test_maybe_reload_finds_higher_epoch_only(self, voice_data, trained):
        engine = InferenceEngine(TinyF0Model, trained['checkpoint'],
                                 data_root=voice_data['data_root'])
        path2 = self._second_epoch(trained)
        assert engine.maybe_reload_newer_checkpoint() == path2
        # Already current: nothing newer.
        assert engine.maybe_reload_newer_checkpoint() is None
        # EMA twins (epoch_1_ema.npz) must NOT match a plain pattern.
        ema = os.path.join(os.path.dirname(path2), 'epoch_9_ema.npz')
        with np.load(path2) as data:
            np.savez(ema, **{k: data[k] for k in data.files})
        assert engine.maybe_reload_newer_checkpoint() is None

    def test_http_watcher_hot_reloads(self, voice_data, trained, tmp_path):
        import threading
        import time
        import urllib.request

        from morgana_tpu.http_serve import make_server

        # An isolated checkpoint dir so other tests' epoch_2 doesn't race.
        ckpt1 = str(tmp_path / 'epoch_1.npz')
        with np.load(trained['checkpoint']) as data:
            np.savez(ckpt1, **{k: data[k] for k in data.files})
        engine = InferenceEngine(TinyF0Model, ckpt1,
                                 data_root=voice_data['data_root'])
        server = make_server(engine, port=0, watch_checkpoints=0.1)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            with np.load(ckpt1) as data:
                np.savez(str(tmp_path / 'epoch_5.npz'),
                         **{k: data[k] + 0.1 for k in data.files})
            deadline = time.time() + 20
            while time.time() < deadline \
                    and not engine.checkpoint_path.endswith('epoch_5.npz'):
                time.sleep(0.1)
            assert engine.checkpoint_path.endswith('epoch_5.npz')
            port = server.server_address[1]
            with urllib.request.urlopen(
                    f'http://127.0.0.1:{port}/healthz', timeout=60) as r:
                health = json.loads(r.read())
            assert health['checkpoint'].endswith('epoch_5.npz')
        finally:
            server.shutdown()
            server.server_close()
