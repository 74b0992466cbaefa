"""Two-stage TTS pipeline: duration engine -> acoustic engine -> vocoder
(``morgana_tpu/pipeline.py``)."""
import os
import sys

import numpy as np
import pytest

from conftest import builder_args
from tiny_models import TinyF0Model, TinyStreamModel

from morgana_tpu import nn
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu.pipeline import TTSPipeline, durations_to_int
from morgana_tpu.serve import InferenceEngine

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'models'))
from duration_model import DurationModel  # noqa: E402
from rnn_spss import LSTMAcousticModel  # noqa: E402


class TestDurationsToInt:
    def test_rounds_clamps_and_drops_padded_tail(self):
        pred = np.asarray([[3.4], [0.2], [-1.0], [9.6], [7.0]], np.float32)
        out = durations_to_int(pred, n_phones=4)
        np.testing.assert_array_equal(out, [3, 1, 1, 10])
        assert out.dtype == np.int64

    def test_max_total_frames_rescales_and_caps_exactly(self):
        pred = np.asarray([10.0, 30.0], np.float32)
        out = durations_to_int(pred, n_phones=2, max_total_frames=20)
        np.testing.assert_array_equal(out, [5, 15])
        # Rounding + min clamping can overshoot the rescale; the trim pass
        # enforces the cap exactly, longest phones first.
        pred = np.full(7, 9.9, np.float32)
        out = durations_to_int(pred, n_phones=7, max_total_frames=32)
        assert out.sum() == 32 and (out >= 1).all()
        # ...unless the per-phone floor makes the cap infeasible.
        out = durations_to_int(np.ones(10), n_phones=10,
                               min_frames_per_phone=2, max_total_frames=5)
        assert out.sum() == 20

    def test_non_finite_durations_fail_loudly(self):
        with pytest.raises(ValueError, match='non-finite'):
            durations_to_int(np.asarray([3.0, np.nan, 2.0]), n_phones=3)

    def test_min_frames_per_phone(self):
        out = durations_to_int(np.zeros(3), n_phones=3, min_frames_per_phone=2)
        np.testing.assert_array_equal(out, [2, 2, 2])


@pytest.fixture(scope='module')
def engines(voice_data, tmp_path_factory):
    """One trained duration engine + two acoustic engines (full WORLD-stream
    model and an lf0-only model), shared across the pipeline tests."""
    exp_base = str(tmp_path_factory.mktemp('tts') / 'experiments')
    args = builder_args(voice_data['data_root'], exp_base,
                        end_epoch=1, valid=False)

    nn.manual_seed(args['seed'])
    ExperimentBuilder(DurationModel, experiment_name='dur',
                      **dict(args, model_kwargs={'hidden_size': 16})
                      ).run_experiment()
    nn.manual_seed(args['seed'])
    ExperimentBuilder(LSTMAcousticModel, experiment_name='ac',
                      **dict(args, model_kwargs={'num_layers': 1,
                                                 'hidden_size': 32})
                      ).run_experiment()
    nn.manual_seed(args['seed'])
    ExperimentBuilder(TinyStreamModel, experiment_name='lf0',
                      **args).run_experiment()

    root = voice_data['data_root']
    ckpt = lambda name: os.path.join(exp_base, name, 'checkpoints',
                                     'epoch_1.npz')
    return {
        'duration': InferenceEngine(
            DurationModel, ckpt('dur'), data_root=root, batch_size=2,
            model_kwargs={'hidden_size': 16}),
        'acoustic': InferenceEngine(
            LSTMAcousticModel, ckpt('ac'), data_root=root, batch_size=2,
            model_kwargs={'num_layers': 1, 'hidden_size': 32}),
        'lf0_only': InferenceEngine(
            TinyStreamModel, ckpt('lf0'), data_root=root, batch_size=2),
        'root': root,
    }


def _test_ids(root):
    with open(os.path.join(root, 'test/test_file_id_list.scp')) as f:
        return [l.strip() for l in f if l.strip()]


class TestTTSPipeline:
    def test_predict_durations_are_valid_frame_counts(self, engines):
        pipe = TTSPipeline(engines['duration'], engines['acoustic'])
        root = engines['root']
        ids = _test_ids(root)
        items = [{'name': utt,
                  'lab': np.load(os.path.join(root, 'test', 'lab',
                                              f'{utt}.npy'))}
                 for utt in ids]
        durs = pipe.predict_durations(items)
        assert set(durs) == set(ids)
        for utt, item in zip(ids, items):
            n_phones = np.asarray(item['lab']).shape[0]
            dur = durs[utt]
            assert dur.dtype == np.int64 and dur.shape == (n_phones,)
            assert (dur >= 1).all()  # within n_phones — all phones valid here

    def test_synthesize_ids_writes_wavs_and_consistent_frames(
            self, engines, tmp_path):
        pipe = TTSPipeline(engines['duration'], engines['acoustic'])
        ids = _test_ids(engines['root'])
        out_dir = str(tmp_path / 'tts')
        results = pipe.synthesize_ids(ids, data_dir='test', out_dir=out_dir)
        assert set(results) == set(ids)
        for utt, out in results.items():
            n_frames = out['n_frames']
            assert n_frames == int(out['dur'].sum())
            # Frame-level acoustic outputs are unpadded to the PREDICTED
            # length (which came from stage 1, not from any file on disk).
            assert out['lf0'].shape[0] == n_frames
            assert out['mcep'].shape == (n_frames, 60)
            assert np.isfinite(out['wav']).all() and len(out['wav']) > 0
            assert os.path.exists(os.path.join(out_dir, 'synth',
                                               f'{utt}.wav'))

    def test_device_vocoder_matches_host_structure(self, engines, tmp_path):
        """device_vocoder=True: the SAME pipeline synthesises every wav as
        one batched on-device program. Lengths match the host vocoder
        exactly; the waveform differs only in the excitation noise draw, so
        energies agree to within a small factor."""
        ids = _test_ids(engines['root'])
        host = TTSPipeline(engines['duration'],
                           engines['acoustic']).synthesize_ids(
            ids, data_dir='test')
        out_dir = str(tmp_path / 'tts_dev')
        dev = TTSPipeline(engines['duration'], engines['acoustic'],
                          device_vocoder=True).synthesize_ids(
            ids, data_dir='test', out_dir=out_dir)
        assert set(dev) == set(ids)
        for utt in ids:
            h, d = host[utt]['wav'], dev[utt]['wav']
            assert len(d) == len(h)
            assert np.isfinite(d).all()
            h_rms = np.sqrt(np.mean(np.asarray(h) ** 2))
            d_rms = np.sqrt(np.mean(np.asarray(d, np.float64) ** 2))
            assert 0.3 < d_rms / h_rms < 3.0, (utt, d_rms, h_rms)
            assert os.path.exists(os.path.join(out_dir, 'synth',
                                               f'{utt}.wav'))

    def test_device_vocoder_trims_unequal_streams_like_host(self, engines):
        """Host semantics: synthesize_world_feats trims WORLD streams to the
        common frame count; the batched device path must do the same
        instead of crashing on the fill."""
        pipe = TTSPipeline(engines['duration'], engines['acoustic'],
                           device_vocoder=True)
        T = 40
        rng = np.random.default_rng(0)
        results = {'utt': {
            'lf0': np.log(np.full((T, 1), 140.0, np.float32)),
            'vuv': np.ones((T, 1), np.float32),
            'mcep': rng.normal(scale=0.01, size=(T - 3, 60)).astype(
                np.float32),
            'bap': np.full((T, 5), -8.0, np.float32),
        }}
        pipe._synthesize_wavs_device(results)
        wav = results['utt']['wav']
        hop = int(16000 * 5.0 / 1000.0)
        assert len(wav) == (T - 3) * hop
        assert np.isfinite(wav).all()

    def test_counters_match_data_prep_definition(self, engines):
        """The pipeline rebuilds 'counters' with data/prepare.py's exact
        function, keeping the train/serve feature definition identical."""
        from morgana_tpu.data.prepare import _frame_counters
        pipe = TTSPipeline(engines['duration'], engines['acoustic'])
        root = engines['root']
        utt = _test_ids(root)[0]
        lab = np.load(os.path.join(root, 'test', 'lab', f'{utt}.npy'))
        dur = pipe.predict_durations([{'name': utt, 'lab': lab}])[utt]
        expected = _frame_counters(int(dur.sum()), dur[dur > 0])
        assert expected.shape == (int(dur.sum()), 9)

    def test_features_only_model_returns_no_wav(self, engines, tmp_path):
        """An acoustic model emitting only lf0 (no vuv/mcep/bap) flows
        through the pipeline but produces features, not audio."""
        pipe = TTSPipeline(engines['duration'], engines['lf0_only'])
        ids = _test_ids(engines['root'])
        results = pipe.synthesize_ids(ids, data_dir='test',
                                      out_dir=str(tmp_path / 'nowav'))
        for out in results.values():
            assert 'wav' not in out
            assert out['lf0'].shape[0] == out['n_frames']
        assert not os.path.exists(str(tmp_path / 'nowav' / 'synth'))
        # ...but the predicted features (and durations) are still dumped.
        for utt in results:
            for key in ('lf0', 'dur'):
                assert os.path.exists(str(tmp_path / 'nowav' / 'feats' / key
                                          / f'{utt}.npy'))

    def test_incompatible_duration_model_fails_loudly(self, engines,
                                                      voice_data):
        """A model without the pipeline's stage inputs is rejected with a
        clear error, not a KeyError mid-batch."""
        bad = engines['lf0_only']  # TinyStreamModel has no 'n_phones' source
        pipe = TTSPipeline(bad, engines['acoustic'])
        with pytest.raises(ValueError, match='n_phones'):
            pipe.predict_durations([{'name': 'x',
                                     'lab': np.zeros((4, 600), np.float32)}])

    def test_quantized_engines_compose(self, engines, tmp_path):
        """Both stages served int8-quantized still synthesise (the pipeline
        is engine-agnostic)."""
        root = engines['root']
        q_dur = InferenceEngine(
            DurationModel, engines['duration'].checkpoint_path,
            data_root=root, batch_size=2, model_kwargs={'hidden_size': 16},
            quantize='int8')
        q_ac = InferenceEngine(
            LSTMAcousticModel, engines['acoustic'].checkpoint_path,
            data_root=root, batch_size=2,
            model_kwargs={'num_layers': 1, 'hidden_size': 32},
            quantize='int8')
        pipe = TTSPipeline(q_dur, q_ac)
        results = pipe.synthesize_ids(_test_ids(root)[:1], data_dir='test')
        out = next(iter(results.values()))
        assert 'wav' in out and np.isfinite(out['wav']).all()

    def test_max_total_frames_caps_utterance_length(self, engines):
        pipe = TTSPipeline(engines['duration'], engines['acoustic'],
                           max_total_frames=32)
        root = engines['root']
        utt = _test_ids(root)[0]
        lab = np.load(os.path.join(root, 'test', 'lab', f'{utt}.npy'))
        results = pipe.synthesize_items([{'name': utt, 'lab': lab}])
        # phones << 32 here, so the cap is feasible and binds exactly.
        assert results[utt]['n_frames'] <= 32


class TestStreamingTTS:
    def test_stream_audio_from_labels(self, engines):
        """Labels -> predicted durations -> chunked acoustic streaming ->
        incremental waveform, with the sample count set by the PREDICTED
        frame clock."""
        root = engines['root']
        utt = _test_ids(root)[0]
        lab = np.load(os.path.join(root, 'test', 'lab', f'{utt}.npy'))
        # The acoustic engine must serve the streaming chunk config.
        ac = InferenceEngine(
            LSTMAcousticModel, engines['acoustic'].checkpoint_path,
            data_root=root, batch_size=2,
            model_kwargs={'num_layers': 1, 'hidden_size': 32},
            stream_configs=[(16, 32, 16)])
        pipe = TTSPipeline(engines['duration'], ac)
        dur, gen = pipe.stream_audio({'name': utt, 'lab': lab},
                                     chunk_frames=16)
        pairs = list(gen)
        audio = np.concatenate([w for _, w in pairs])
        assert audio.shape[0] == int(dur.sum()) * 80  # 5 ms frames @ 16 kHz
        assert np.isfinite(audio).all() and np.abs(audio).max() > 0
        # Incremental: audio arrives before the final flush pair.
        assert any(w.shape[0] for _, w in pairs[:-1])

    def test_stream_audio_rejects_feature_only_model(self, engines):
        pipe = TTSPipeline(engines['duration'], engines['lf0_only'])
        root = engines['root']
        utt = _test_ids(root)[0]
        lab = np.load(os.path.join(root, 'test', 'lab', f'{utt}.npy'))
        with pytest.raises(ValueError, match='audio streaming needs'):
            pipe.stream_audio({'name': utt, 'lab': lab})
