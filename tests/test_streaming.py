"""Streaming inference: StreamingMLPG windowed solves, chunked recurrent
state carry, and the end-to-end StreamingSession (streamed == batch)."""
import os

import numpy as np
import pytest

from conftest import builder_args
from tiny_models import TinyF0Model, TinyStreamModel

from morgana_tpu import nn
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu.serve import InferenceEngine
from morgana_tpu.streaming import StreamingMLPG
from morgana_tpu.viz.synthesis import MLPG


def _smooth_means(rng, batch, frames, dim, offset=5.0):
    return (np.cumsum(rng.normal(0, 0.05, (batch, frames, dim)), axis=1)
            + offset).astype(np.float32)


class TestStreamingMLPG:
    def test_matches_full_solve(self):
        """Windowed emission with modest context/lookahead reproduces the
        whole-utterance solve (exponential decay of the banded precision
        matrix's inverse)."""
        rng = np.random.default_rng(0)
        means = _smooth_means(rng, 2, 257, 6)
        gv = rng.random(6).astype(np.float32) * 0.5 + 0.1
        full = np.asarray(MLPG(means, gv, padding_size=100))

        sm = StreamingMLPG(gv, chunk_size=48, context=16, lookahead=16,
                           padding_size=100)
        parts = []
        # Push sizes deliberately unrelated to chunk_size.
        for s in range(0, means.shape[1], 30):
            parts.append(sm.push(means[:, s:s + 30]))
        parts.append(sm.flush())
        streamed = np.concatenate(parts, axis=1)

        assert streamed.shape == full.shape
        np.testing.assert_allclose(streamed, full, atol=1e-4)

    def test_short_utterance_flush_only(self):
        """Utterances shorter than chunk + lookahead emit entirely at
        flush and still match the full solve."""
        rng = np.random.default_rng(1)
        means = _smooth_means(rng, 1, 9, 3)
        gv = np.ones(3, np.float32) * 0.3
        full = np.asarray(MLPG(means, gv, padding_size=10))

        sm = StreamingMLPG(gv, chunk_size=32, context=16, lookahead=16,
                           padding_size=10)
        assert sm.push(means).shape == (1, 0, 1)
        streamed = sm.flush()
        np.testing.assert_allclose(streamed, full, atol=1e-4)

    def test_emission_schedule_and_delay(self):
        gv = np.ones(3, np.float32)
        sm = StreamingMLPG(gv, chunk_size=4, context=8, lookahead=2)
        assert sm.delay_frames == 2 + 4 - 1
        rng = np.random.default_rng(2)
        means = _smooth_means(rng, 1, 6, 3)
        # 6 pushed >= 4 + 2: exactly one chunk emits.
        assert sm.push(means).shape == (1, 4, 1)
        assert sm.push(means[:, :0]).shape == (1, 0, 1)

    def test_api_misuse_raises(self):
        sm = StreamingMLPG(np.ones(3, np.float32), chunk_size=4)
        with pytest.raises(ValueError):
            sm.push(np.zeros((4, 3), np.float32))  # missing batch dim
        sm.flush()
        with pytest.raises(RuntimeError):
            sm.push(np.zeros((1, 2, 3), np.float32))
        with pytest.raises(RuntimeError):
            sm.flush()


class TestChunkedStateCarry:
    def test_sequential_chunked_equals_full(self):
        """return_hiddens threads GRU and LSTM states so chunked execution
        reproduces the full run exactly."""
        import jax.numpy as jnp

        nn.manual_seed(7)
        stack = nn.SequentialWithRecurrent(
            nn.Linear(5, 8),
            nn.Sigmoid(),
            nn.Recurrent('gru', 8, 8),
            nn.Recurrent('lstm', 8, 8),
            nn.Linear(8, 2),
        )
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 30, 5)).astype(np.float32))

        full = np.asarray(stack(x))
        state = None
        parts = []
        for s in range(0, 30, 7):  # ragged final chunk
            out, state = stack(x[:, s:s + 7], hiddens=state,
                               return_hiddens=True)
            parts.append(np.asarray(out))
        chunked = np.concatenate(parts, axis=1)
        np.testing.assert_allclose(chunked, full, atol=1e-6)


@pytest.fixture(scope='module')
def stream_trained(voice_data, tmp_path_factory):
    exp_base = str(tmp_path_factory.mktemp('stream') / 'experiments')
    args = builder_args(voice_data['data_root'], exp_base,
                        end_epoch=1, valid=False)
    nn.manual_seed(args['seed'])
    exp = ExperimentBuilder(TinyStreamModel, experiment_name='st', **args)
    exp.run_experiment()
    return os.path.join(exp_base, 'st', 'checkpoints', 'epoch_1.npz')


class TestStreamingSession:
    def test_streamed_equals_batch_predict(self, voice_data, stream_trained):
        engine = InferenceEngine(TinyStreamModel, stream_trained,
                                 data_root=voice_data['data_root'],
                                 batch_size=2)
        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            ids = [l.strip() for l in f if l.strip()]
        batch_out = engine.predict_ids(ids, data_dir='test')

        for utt in ids:
            chunks = list(engine.stream_id(utt, data_dir='test',
                                           chunk_frames=16, context=32,
                                           lookahead=32))
            assert len(chunks) > 1  # genuinely incremental
            streamed = {k: np.concatenate([c[k] for c in chunks], axis=0)
                        for k in chunks[0]}
            # The network outputs are exact (state carry); the MLPG stream is
            # a windowed approximation — 1e-4 on lf0 values of ~5 log-Hz is
            # ~2e-5 relative, orders below any perceptual threshold.
            for key, atol in (('normalised_lf0_deltas', 1e-5), ('lf0', 1e-4)):
                ref = np.asarray(batch_out[utt][key])
                got = streamed[key]
                assert got.shape == ref.shape
                np.testing.assert_allclose(got, ref, atol=atol)

    def test_yields_are_aligned_across_outputs(self, voice_data,
                                               stream_trained):
        """Every yielded dict covers the same frame range for every
        declared output (pass-through outputs wait for the MLPG
        lookahead)."""
        engine = InferenceEngine(TinyStreamModel, stream_trained,
                                 data_root=voice_data['data_root'],
                                 batch_size=2)
        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            utt = [l.strip() for l in f if l.strip()][0]
        for chunk in engine.stream_id(utt, data_dir='test', chunk_frames=16):
            lengths = {k: v.shape[0] for k, v in chunk.items()}
            assert len(set(lengths.values())) == 1, lengths

    def test_in_flight_stream_pins_its_parameters(self, voice_data,
                                                  stream_trained):
        """A checkpoint hot-reload (serve --watch_checkpoints) between
        chunks must not splice two models into one utterance: the stream
        snapshots engine._params at start and finishes on them."""
        import jax
        engine = InferenceEngine(TinyStreamModel, stream_trained,
                                 data_root=voice_data['data_root'],
                                 batch_size=2)
        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            utt = [l.strip() for l in f if l.strip()][0]

        ref = list(engine.stream_id(utt, data_dir='test', chunk_frames=16))

        stream = engine.stream_id(utt, data_dir='test', chunk_frames=16)
        got = [next(stream)]
        # Simulate the watcher swapping in new weights mid-stream.
        old_params = engine._params
        engine._params = jax.tree_util.tree_map(lambda p: p * 0.0 + 1.0,
                                                old_params)
        try:
            got.extend(stream)
        finally:
            engine._params = old_params
        assert len(got) == len(ref)
        for chunk_ref, chunk_got in zip(ref, got):
            for key in chunk_ref:
                np.testing.assert_array_equal(chunk_got[key], chunk_ref[key],
                                              err_msg=key)

    def test_stream_item_in_memory(self, voice_data, stream_trained):
        """The in-memory item API streams identically to the file path."""
        engine = InferenceEngine(TinyStreamModel, stream_trained,
                                 data_root=voice_data['data_root'],
                                 batch_size=2)
        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            utt = [l.strip() for l in f if l.strip()][0]
        data_dir = os.path.join(voice_data['data_root'], 'test')
        sources = engine.model.test_data_sources()
        item = dict({name: src.load_file(utt, data_dir)
                     for name, src in sources.items()}, name=utt)

        from_file = np.concatenate(
            [c['lf0'] for c in engine.stream_id(utt, data_dir='test')], axis=0)
        from_memory = np.concatenate(
            [c['lf0'] for c in engine.stream_item(item)], axis=0)
        np.testing.assert_array_equal(from_file, from_memory)

    def test_non_streaming_model_raises(self, voice_data, tmp_path):
        exp_base = str(tmp_path / 'experiments')
        args = builder_args(voice_data['data_root'], exp_base,
                            end_epoch=1, valid=False)
        nn.manual_seed(args['seed'])
        ExperimentBuilder(TinyF0Model, experiment_name='ns',
                          **args).run_experiment()
        engine = InferenceEngine(
            TinyF0Model,
            os.path.join(exp_base, 'ns', 'checkpoints', 'epoch_1.npz'),
            data_root=voice_data['data_root'], batch_size=2)
        with pytest.raises(NotImplementedError):
            next(iter(engine.stream_id('test_0000', data_dir='test')))


class TestStreamingSynthesizer:
    """Incremental vocoder: streamed waveform == batch synthesis exactly."""

    def _features(self, rng, frames, bins=513):
        f0 = np.where(rng.random(frames) > 0.3,
                      120 + 30 * np.sin(np.arange(frames) / 10), 0.0)
        sp = np.exp(rng.normal(-8, 0.5, (frames, bins)))
        ap = np.clip(rng.random((frames, bins)) * 0.8, 1e-6, 1.0)
        return f0, sp, ap

    def test_streamed_equals_batch_numpy_path(self):
        from morgana_tpu.vocoder.world import (_synthesize_numpy,
                                               StreamingSynthesizer)
        rng = np.random.default_rng(0)
        f0, sp, ap = self._features(rng, 120)
        batch = _synthesize_numpy(f0, sp, ap, 16000, 80, seed=0)

        ss = StreamingSynthesizer(16000, seed=0)
        parts = []
        for s in range(0, 120, 17):  # push sizes unrelated to any window
            parts.append(ss.push(f0[s:s + 17], sp[s:s + 17], ap[s:s + 17]))
        parts.append(ss.flush())
        streamed = np.concatenate(parts)

        assert streamed.shape == batch.shape
        np.testing.assert_array_equal(streamed, batch)
        assert ss.delay_frames == 4  # min(1024, 4*80)/80

    def test_push_world_feats_matches_batch(self):
        """Model-space chunks (f0/vuv/mcep/bap) through the streaming path
        equal synthesize_world_feats on the concatenated features (numpy
        path; batch clip-protection is identity at these amplitudes)."""
        from morgana_tpu.vocoder import world

        rng = np.random.default_rng(1)
        frames = 90
        f0 = 100 + 20 * rng.random(frames)
        vuv = (rng.random(frames) > 0.3).astype(np.float64)
        # Realistic cepstra: energy in c0, higher coefficients near zero
        # (keeps the waveform small so the batch path's global peak
        # clip-protection is the identity, as in real use).
        mcep = rng.normal(0.0, 0.05, (frames, 60))
        mcep[:, 0] = -6.0
        bap = rng.normal(-2.0, 0.3, (frames, 5))

        # Force the numpy batch path so both sides share one implementation.
        sp = world.mcep_to_spectrum(mcep, fft_size=1024, fs=16000)
        ap = world.bap_to_aperiodicity(bap, fft_size=1024, fs=16000)
        gated = np.where(vuv > 0.5, f0, 0.0)
        batch = world._synthesize_numpy(gated, sp, ap, 16000, 80, seed=0)

        ss = world.StreamingSynthesizer(16000, seed=0)
        parts = []
        for s in range(0, frames, 25):
            parts.append(ss.push_world_feats(
                f0[s:s + 25], vuv[s:s + 25], mcep[s:s + 25], bap[s:s + 25]))
        parts.append(ss.flush())
        np.testing.assert_allclose(np.concatenate(parts), batch, atol=1e-12)

    def test_misuse_raises(self):
        from morgana_tpu.vocoder.world import StreamingSynthesizer
        ss = StreamingSynthesizer(16000)
        with pytest.raises(ValueError):
            ss.push(np.ones(3), np.ones((2, 513)), np.ones((2, 513)))
        with pytest.raises(ValueError):
            ss.push(np.ones(2), np.ones((2, 100)), np.ones((2, 100)))
        ss.flush()
        with pytest.raises(RuntimeError):
            ss.push(np.ones(1), np.ones((1, 513)), np.ones((1, 513)))
        with pytest.raises(RuntimeError):
            ss.flush()

    def test_empty_pushes_and_short_stream(self):
        from morgana_tpu.vocoder.world import (_synthesize_numpy,
                                               StreamingSynthesizer)
        rng = np.random.default_rng(2)
        f0, sp, ap = self._features(rng, 3)
        batch = _synthesize_numpy(f0, sp, ap, 16000, 80, seed=0)
        ss = StreamingSynthesizer(16000, seed=0)
        assert ss.push(f0[:0], sp[:0], ap[:0]).shape == (0,)
        out = [ss.push(f0, sp, ap), ss.flush()]
        np.testing.assert_array_equal(np.concatenate(out), batch)


class TestHTTPStreaming:
    """POST /stream: chunked NDJSON over the stdlib server."""

    def _server(self, engine):
        import threading
        from morgana_tpu.http_serve import make_server
        server = make_server(engine, port=0)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server, server.server_address[1]

    def _item(self, voice_data, engine, utt):
        data_dir = os.path.join(voice_data['data_root'], 'test')
        sources = engine.model.test_data_sources()
        return dict({name: src.load_file(utt, data_dir).tolist()
                     for name, src in sources.items()}, name=utt)

    def test_stream_endpoint_ndjson(self, voice_data, stream_trained):
        import json
        import urllib.request

        engine = InferenceEngine(TinyStreamModel, stream_trained,
                                 data_root=voice_data['data_root'],
                                 batch_size=2,
                                 stream_configs=[(16, 32, 16)])
        server, port = self._server(engine)
        try:
            with open(os.path.join(voice_data['data_root'],
                                   'test/test_file_id_list.scp')) as f:
                utt = [l.strip() for l in f if l.strip()][0]
            item = self._item(voice_data, engine, utt)

            # A config outside the operator's allowlist is refused (every
            # new combination would compile fresh programs).
            import urllib.error
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/stream',
                data=json.dumps({'item': item, 'chunk_frames': 7}).encode(),
                headers={'Content-Type': 'application/json'})
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=60)
            assert exc.value.code == 400

            body = json.dumps({'item': item, 'chunk_frames': 16}).encode()
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/stream', data=body,
                headers={'Content-Type': 'application/json'})
            lines = []
            with urllib.request.urlopen(req, timeout=600) as r:
                assert r.status == 200
                assert 'ndjson' in r.headers['Content-Type']
                for raw in r:
                    lines.append(json.loads(raw))
            assert lines[-1].get('done') is True
            chunks = [l['chunk'] for l in lines[:-1]]
            assert len(chunks) > 1
            streamed = np.concatenate(
                [np.asarray(c['lf0']) for c in chunks], axis=0)
            assert streamed.shape[0] == lines[-1]['frames']

            # Chunked HTTP reproduces the in-process streaming exactly.
            direct = np.concatenate(
                [c['lf0'] for c in engine.stream_item(
                    {k: np.asarray(v) if k != 'name' else v
                     for k, v in item.items()}, chunk_frames=16)], axis=0)
            np.testing.assert_allclose(streamed, direct, atol=1e-6)
        finally:
            server.shutdown()
            server.server_close()

    def test_http10_client_refused(self, voice_data, stream_trained):
        """/stream replies over chunked transfer-encoding, which HTTP/1.0
        clients cannot parse — they must get a clean 505, not hex-framed
        garbage interleaved with their NDJSON."""
        import socket

        engine = InferenceEngine(TinyStreamModel, stream_trained,
                                 data_root=voice_data['data_root'],
                                 batch_size=2,
                                 stream_configs=[(16, 32, 16)])
        server, port = self._server(engine)
        try:
            body = b'{}'
            request = (b'POST /stream HTTP/1.0\r\n'
                       b'Host: localhost\r\n'
                       b'Content-Type: application/json\r\n'
                       b'Content-Length: ' + str(len(body)).encode()
                       + b'\r\n\r\n' + body)
            with socket.create_connection(('127.0.0.1', port),
                                          timeout=60) as sock:
                sock.sendall(request)
                data = b''
                while True:
                    chunk = sock.recv(4096)
                    if not chunk:
                        break
                    data += chunk
            status = data.split(b'\r\n', 1)[0]
            assert b'505' in status, status
            assert b'HTTP/1.1' in data  # the error body names the fix
        finally:
            server.shutdown()
            server.server_close()

    def test_stream_endpoint_bad_request_and_midstream_error(
            self, voice_data, tmp_path):
        import json
        import urllib.request
        import urllib.error

        exp_base = str(tmp_path / 'experiments')
        args = builder_args(voice_data['data_root'], exp_base,
                            end_epoch=1, valid=False)
        nn.manual_seed(args['seed'])
        ExperimentBuilder(TinyF0Model, experiment_name='hs',
                          **args).run_experiment()
        engine = InferenceEngine(
            TinyF0Model,
            os.path.join(exp_base, 'hs', 'checkpoints', 'epoch_1.npz'),
            data_root=voice_data['data_root'], batch_size=2)
        server, port = self._server(engine)
        try:
            # Malformed body -> 400 before any streaming starts.
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/stream', data=b'not json',
                headers={'Content-Type': 'application/json'})
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=60)
            assert exc.value.code == 400

            # Model without streaming hooks -> clean 400 BEFORE any stream
            # starts (session creation validates the hooks up front; only
            # mid-stream faults travel as error lines).
            item = self._item(voice_data, engine, 'test_0000')
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/stream',
                data=json.dumps({'item': item}).encode(),
                headers={'Content-Type': 'application/json'})
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=600)
            assert exc.value.code == 400
            assert 'NotImplementedError' in json.loads(
                exc.value.read())['error']
        finally:
            server.shutdown()
            server.server_close()


class TestAcousticModelStreaming:
    """Multi-stream fusion: LSTMAcousticModel's lf0+mcep+bap solve in ONE
    windowed MLPG per chunk must match batch predict (which fuses them the
    same way via MLPG_streams)."""

    def test_acoustic_streamed_equals_batch(self, voice_data, tmp_path):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                        'models'))
        try:
            from rnn_spss import LSTMAcousticModel
        finally:
            sys.path.pop(0)

        kwargs = {'num_layers': 1, 'hidden_size': 32}
        exp_base = str(tmp_path / 'experiments')
        args = builder_args(voice_data['data_root'], exp_base,
                            end_epoch=1, valid=False, model_kwargs=kwargs)
        nn.manual_seed(args['seed'])
        ExperimentBuilder(LSTMAcousticModel, experiment_name='ac',
                          **args).run_experiment()

        engine = InferenceEngine(
            LSTMAcousticModel,
            os.path.join(exp_base, 'ac', 'checkpoints', 'epoch_1.npz'),
            data_root=voice_data['data_root'], batch_size=2,
            model_kwargs=kwargs)
        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            utt = [l.strip() for l in f if l.strip()][0]
        batch_out = engine.predict_ids([utt], data_dir='test')[utt]

        chunks = list(engine.stream_id(utt, data_dir='test', chunk_frames=16,
                                       context=32, lookahead=32))
        streamed = {k: np.concatenate([c[k] for c in chunks], axis=0)
                    for k in chunks[0]}
        assert set(streamed) == {'lf0', 'vuv', 'mcep', 'bap'}
        for key, atol in (('vuv', 1e-6), ('lf0', 1e-4), ('mcep', 1e-3),
                          ('bap', 1e-3)):
            ref = np.asarray(batch_out[key])
            assert streamed[key].shape == ref.shape, key
            np.testing.assert_allclose(streamed[key], ref, atol=atol,
                                       err_msg=key)

    def test_hop_larger_than_window_keeps_gap_zeros(self):
        """hop > fft window: batch leaves the inter-frame gap samples zero;
        streaming must emit those zeros, not drop them (48 kHz, 25 ms
        frames: hop 1200 > win 1024)."""
        from morgana_tpu.vocoder.world import (_synthesize_numpy,
                                               StreamingSynthesizer)
        rng = np.random.default_rng(3)
        frames, bins = 12, 513
        f0 = np.full(frames, 100.0)
        sp = np.exp(rng.normal(-8, 0.5, (frames, bins)))
        ap = np.clip(rng.random((frames, bins)) * 0.8, 1e-6, 1.0)
        batch = _synthesize_numpy(f0, sp, ap, 48000, 1200, seed=0)

        ss = StreamingSynthesizer(48000, frame_period=25.0, seed=0)
        parts = [ss.push(f0[s:s + 5], sp[s:s + 5], ap[s:s + 5])
                 for s in range(0, frames, 5)]
        parts.append(ss.flush())
        streamed = np.concatenate(parts)
        assert streamed.shape == batch.shape
        np.testing.assert_array_equal(streamed, batch)


class TestTransformerStreaming:
    """The causal (sliding-window attention) transformer streams through the
    same engine as the LSTM: KV caches ride the hidden slots, so streamed
    trajectories must match batch predict."""

    def test_causal_transformer_streamed_equals_batch(self, voice_data,
                                                      tmp_path):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                        'models'))
        try:
            from transformer_spss import TransformerAcousticModel
        finally:
            sys.path.pop(0)

        kwargs = {'num_layers': 2, 'd_model': 32, 'num_heads': 4,
                  'causal': True, 'attention_window': 24}
        exp_base = str(tmp_path / 'experiments')
        args = builder_args(voice_data['data_root'], exp_base,
                            end_epoch=1, valid=False, model_kwargs=kwargs)
        nn.manual_seed(args['seed'])
        ExperimentBuilder(TransformerAcousticModel, experiment_name='tac',
                          **args).run_experiment()

        engine = InferenceEngine(
            TransformerAcousticModel,
            os.path.join(exp_base, 'tac', 'checkpoints', 'epoch_1.npz'),
            data_root=voice_data['data_root'], batch_size=2,
            model_kwargs=kwargs)
        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            utt = [l.strip() for l in f if l.strip()][0]
        batch_out = engine.predict_ids([utt], data_dir='test')[utt]

        chunks = list(engine.stream_id(utt, data_dir='test', chunk_frames=16,
                                       context=32, lookahead=32))
        streamed = {k: np.concatenate([c[k] for c in chunks], axis=0)
                    for k in chunks[0]}
        assert set(streamed) == {'lf0', 'vuv', 'mcep', 'bap'}
        for key, atol in (('vuv', 1e-5), ('lf0', 1e-4), ('mcep', 1e-3),
                          ('bap', 1e-3)):
            ref = np.asarray(batch_out[key])
            assert streamed[key].shape == ref.shape, key
            np.testing.assert_allclose(streamed[key], ref, atol=atol,
                                       err_msg=key)

    def test_bidirectional_transformer_stream_raises(self, voice_data,
                                                     tmp_path):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                        'models'))
        try:
            from transformer_spss import TransformerAcousticModel
        finally:
            sys.path.pop(0)
        import jax

        nn.manual_seed(5)
        model = TransformerAcousticModel(num_layers=1, d_model=16,
                                         num_heads=2)
        with pytest.raises(NotImplementedError, match='causal'):
            with nn.bind(model):
                model.stream_step(np.zeros((1, 4, 609), np.float32), None)


@pytest.fixture(scope='module')
def acoustic_stream_engine(voice_data, tmp_path_factory):
    """A trained full-WORLD-stream acoustic engine (1x32 LSTM) for the
    audio-streaming tests."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'models'))
    try:
        from rnn_spss import LSTMAcousticModel
    finally:
        sys.path.pop(0)
    kwargs = {'num_layers': 1, 'hidden_size': 32}
    exp_base = str(tmp_path_factory.mktemp('audio') / 'experiments')
    args = builder_args(voice_data['data_root'], exp_base,
                        end_epoch=1, valid=False, model_kwargs=kwargs)
    nn.manual_seed(args['seed'])
    ExperimentBuilder(LSTMAcousticModel, experiment_name='aud',
                      **args).run_experiment()
    return InferenceEngine(
        LSTMAcousticModel,
        os.path.join(exp_base, 'aud', 'checkpoints', 'epoch_1.npz'),
        data_root=voice_data['data_root'], batch_size=2,
        model_kwargs=kwargs, stream_configs=[(16, 32, 16)])


class TestAudioStreaming:
    """stream_item_audio + the HTTP ``audio: true`` option: streamed
    features flow through StreamingSynthesizer to incremental waveform."""

    def _utt_item(self, voice_data, engine):
        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            utt = [l.strip() for l in f if l.strip()][0]
        data_dir = os.path.join(voice_data['data_root'], 'test')
        sources = engine.model.test_data_sources()
        return utt, dict({name: src.load_file(utt, data_dir)
                          for name, src in sources.items()}, name=utt)

    def test_stream_item_audio_is_exact_and_incremental(
            self, voice_data, acoustic_stream_engine):
        from morgana_tpu.vocoder import world

        engine = acoustic_stream_engine
        utt, item = self._utt_item(voice_data, engine)
        pairs = list(engine.stream_item_audio(item, chunk_frames=16,
                                              context=32, lookahead=16))
        feats = {}
        for key in ('lf0', 'vuv', 'mcep', 'bap'):
            feats[key] = np.concatenate(
                [c[key] for c, _ in pairs if c], axis=0)
        audio = np.concatenate([w for _, w in pairs])
        n_frames = feats['lf0'].shape[0]
        assert audio.shape[0] == n_frames * 80  # 5 ms frames at 16 kHz
        # Some audio must arrive before the final pair (incrementality).
        assert any(w.shape[0] for _, w in pairs[:-1])

        # Bitwise up to the batch path's global clip-protection rescale
        # (a scalar that needs the WHOLE signal's peak, so streaming
        # deliberately skips it — StreamingSynthesizer docstring): the
        # streamed waveform IS batch numpy synthesis of the streamed
        # features (same recipe as push_world_feats, same noise seed).
        f0 = np.exp(np.clip(feats['lf0'][:, 0], None, 8.0))
        sp = world.mcep_to_spectrum(feats['mcep'], fft_size=1024, fs=16000)
        ap = world.bap_to_aperiodicity(feats['bap'], fft_size=1024, fs=16000)
        f0 = np.where(feats['vuv'][:, 0] > 0.5, f0, 0.0)
        ref = world._synthesize_numpy(f0, sp, ap, 16000, 80, seed=0)
        scale = max(1.0, float(np.abs(audio).max()) / 0.9)
        np.testing.assert_array_equal(audio / scale, ref)

    def test_feature_only_model_rejected(self, voice_data, stream_trained):
        engine = InferenceEngine(TinyStreamModel, stream_trained,
                                 data_root=voice_data['data_root'],
                                 batch_size=2)
        utt, item = self._utt_item(voice_data, engine)
        with pytest.raises(ValueError, match='audio streaming needs'):
            engine.stream_item_audio(item)

    def test_http_audio_stream(self, voice_data, acoustic_stream_engine):
        import base64
        import json
        import threading
        import urllib.request

        from morgana_tpu.http_serve import make_server

        engine = acoustic_stream_engine
        server = make_server(engine, port=0)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        port = server.server_address[1]
        try:
            utt, item = self._utt_item(voice_data, engine)
            body = json.dumps({'item': {k: (v.tolist()
                                            if isinstance(v, np.ndarray)
                                            else v)
                                        for k, v in item.items()},
                               'chunk_frames': 16, 'audio': True}).encode()
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/stream', data=body,
                headers={'Content-Type': 'application/json'})
            lines = []
            with urllib.request.urlopen(req, timeout=600) as r:
                for raw in r:
                    lines.append(json.loads(raw))
            done = lines[-1]
            assert done['done'] is True and done['sample_rate'] == 16000
            pcm = b''.join(base64.b64decode(l['wav_int16_b64'])
                           for l in lines[:-1] if 'wav_int16_b64' in l)
            audio = np.frombuffer(pcm, '<i2')
            assert audio.shape[0] == done['samples'] == done['frames'] * 80
            assert np.abs(audio).max() > 0  # actual signal, not silence

            # In-process equality: HTTP PCM == quantised stream_item_audio.
            direct = np.concatenate(
                [w for _, w in engine.stream_item_audio(
                    item, chunk_frames=16)])
            expect = np.clip(direct * 32767.0, -32768, 32767).astype('<i2')
            np.testing.assert_array_equal(audio, expect)
        finally:
            server.shutdown()
            server.server_close()


class TestStreamErrorContract:
    def test_missing_feature_gets_400(self, voice_data, stream_trained):
        """An item missing a required data-source key fails with a clean
        400 'missing feature' BEFORE the stream starts (review finding:
        the KeyError previously escaped the handler with no response)."""
        import json
        import threading
        import urllib.error
        import urllib.request

        from morgana_tpu.http_serve import make_server

        engine = InferenceEngine(TinyStreamModel, stream_trained,
                                 data_root=voice_data['data_root'],
                                 batch_size=2)
        server = make_server(engine, port=0)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        port = server.server_address[1]
        try:
            body = json.dumps({'item': {'name': 'x',
                                        'lab': [[0.0] * 600] * 4}}).encode()
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/stream', data=body,
                headers={'Content-Type': 'application/json'})
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=120)
            assert exc.value.code == 400
            assert 'missing feature' in json.loads(exc.value.read())['error']
        finally:
            server.shutdown()
            server.server_close()
