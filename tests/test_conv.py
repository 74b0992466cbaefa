"""nn.Conv1d (MXU-native sequence mixer) and the ConvAcousticModel family:
torch parity, padding-invariance masking, causal/streaming semantics, and
end-to-end training."""
import json
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import builder_args
from morgana_tpu import nn
from morgana_tpu.experiment_builder import ExperimentBuilder

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'models'))


def _torch_conv(w, b, x, padding, dilation=1, groups=1):
    """Reference torch conv on the same weights: our (k, in/g, out) weight
    maps to torch's (out, in/g, k); our (B, T, C) input to (B, C, T)."""
    import torch
    import torch.nn.functional as F
    tw = torch.tensor(np.transpose(np.asarray(w), (2, 1, 0)))
    tb = torch.tensor(np.asarray(b)) if b is not None else None
    tx = torch.tensor(np.transpose(np.asarray(x), (0, 2, 1)))
    if padding == 'causal':
        tx = F.pad(tx, (dilation * (tw.shape[-1] - 1), 0))
        y = F.conv1d(tx, tw, tb, dilation=dilation, groups=groups)
    else:
        y = F.conv1d(tx, tw, tb, padding='same', dilation=dilation,
                     groups=groups)
    return np.transpose(y.numpy(), (0, 2, 1))


class TestConv1dTorchParity:
    @pytest.mark.parametrize('kernel,dilation,groups', [
        (5, 1, 1),   # odd kernel, the model default
        (4, 1, 1),   # even kernel: asymmetric 'same' padding split
        (3, 4, 1),   # dilated
        (3, 1, 4),   # grouped
    ])
    def test_same_padding(self, rng, kernel, dilation, groups):
        nn.manual_seed(0)
        conv = nn.Conv1d(8, 12, kernel, dilation=dilation, groups=groups)
        x = rng.normal(size=(2, 21, 8)).astype(np.float32)
        got = np.asarray(conv(jnp.asarray(x)))
        want = _torch_conv(conv.weight.value, conv.bias.value, x, 'same',
                           dilation, groups)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_causal_padding(self, rng):
        nn.manual_seed(1)
        conv = nn.Conv1d(6, 6, 3, dilation=2, padding='causal')
        x = rng.normal(size=(2, 17, 6)).astype(np.float32)
        got = np.asarray(conv(jnp.asarray(x)))
        want = _torch_conv(conv.weight.value, conv.bias.value, x, 'causal',
                           dilation=2)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_causal_sees_no_future(self, rng):
        nn.manual_seed(2)
        conv = nn.Conv1d(4, 4, 5, padding='causal')
        x = rng.normal(size=(1, 12, 4)).astype(np.float32)
        y1 = np.asarray(conv(jnp.asarray(x)))
        x2 = x.copy()
        x2[:, 7:] += 100.0
        y2 = np.asarray(conv(jnp.asarray(x2)))
        np.testing.assert_array_equal(y1[:, :7], y2[:, :7])
        assert not np.allclose(y1[:, 7:], y2[:, 7:])


class TestConv1dMaskingAndStreaming:
    def test_seq_len_masks_out_bucket_dependence(self, rng):
        """The same utterance collated into two different length buckets
        must produce identical outputs at its valid frames."""
        nn.manual_seed(3)
        conv = nn.Conv1d(4, 4, 5)
        x = rng.normal(size=(1, 10, 4)).astype(np.float32)
        pad_a = np.concatenate([x, rng.normal(  # garbage padding
            size=(1, 4, 4)).astype(np.float32)], axis=1)
        pad_b = np.concatenate([x, rng.normal(
            size=(1, 9, 4)).astype(np.float32)], axis=1)
        seq = jnp.asarray([10.])
        ya = np.asarray(conv(jnp.asarray(pad_a), seq_len=seq))
        yb = np.asarray(conv(jnp.asarray(pad_b), seq_len=seq))
        np.testing.assert_allclose(ya[:, :10], yb[:, :10], atol=1e-6)

    def test_causal_step_matches_batch(self, rng):
        nn.manual_seed(4)
        conv = nn.Conv1d(6, 8, 3, dilation=2, padding='causal')
        x = rng.normal(size=(2, 24, 6)).astype(np.float32)
        batch = np.asarray(conv(jnp.asarray(x)))
        state, outs = None, []
        for start in range(0, 24, 8):
            y, state = conv.step(jnp.asarray(x[:, start:start + 8]), state)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs, axis=1), batch,
                                   atol=1e-6)

    def test_same_padding_cannot_stream(self):
        nn.manual_seed(5)
        conv = nn.Conv1d(4, 4, 3)
        with pytest.raises(NotImplementedError, match='causal'):
            conv.step(jnp.zeros((1, 4, 4)), None)

    def test_container_threads_conv_state(self, rng):
        """A causal conv inside SequentialWithRecurrent streams chunk by
        chunk exactly like the batch forward."""
        nn.manual_seed(6)
        stack = nn.SequentialWithRecurrent(
            nn.Linear(4, 8),
            nn.Conv1d(8, 8, 3, padding='causal'),
            nn.GELU(),
            nn.Conv1d(8, 5, 3, dilation=2, padding='causal'),
        )
        x = rng.normal(size=(1, 16, 4)).astype(np.float32)
        batch = np.asarray(stack(jnp.asarray(x)))
        state, outs = None, []
        for start in range(0, 16, 4):
            y, state = stack(jnp.asarray(x[:, start:start + 4]),
                             hiddens=state, return_hiddens=True)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs, axis=1), batch,
                                   atol=1e-6)


class TestConvEngineStreaming:
    def test_engine_stream_matches_batch_predict(self, voice_data, tmp_path):
        """A causal ConvAcousticModel streams through the SAME serving
        engine as the LSTM/transformer flagships, streamed == batch."""
        from conv_spss import ConvAcousticModel
        from morgana_tpu.serve import InferenceEngine

        exp_base = str(tmp_path / 'experiments')
        args = builder_args(voice_data['data_root'], exp_base, end_epoch=1,
                            valid=False,
                            model_kwargs={'num_layers': 2, 'hidden_size': 16,
                                          'kernel_size': 3, 'causal': True})
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(ConvAcousticModel, experiment_name='cstream',
                                **args)
        exp.run_experiment()
        ckpt = os.path.join(exp_base, 'cstream', 'checkpoints', 'epoch_1.npz')

        engine = InferenceEngine(
            ConvAcousticModel, ckpt, data_root=voice_data['data_root'],
            batch_size=2,
            model_kwargs={'num_layers': 2, 'hidden_size': 16,
                          'kernel_size': 3, 'causal': True})
        with open(os.path.join(voice_data['data_root'],
                               'test/test_file_id_list.scp')) as f:
            ids = [l.strip() for l in f if l.strip()]
        batch_out = engine.predict_ids(ids, data_dir='test')
        utt = ids[0]
        chunks = list(engine.stream_id(utt, data_dir='test', chunk_frames=16,
                                       context=32, lookahead=32))
        assert len(chunks) > 1
        # The stream spec exposes vuv + the MLPG trajectories: vuv is exact
        # (pure state carry), lf0 is the windowed-MLPG approximation.
        for key, atol in (('vuv', 1e-6), ('lf0', 1e-4)):
            streamed = np.concatenate([c[key] for c in chunks], axis=0)
            ref = np.asarray(batch_out[utt][key])
            assert streamed.shape == ref.shape, key
            np.testing.assert_allclose(streamed, ref, atol=atol)


class TestConvAcousticModel:
    def test_trains_and_generates(self, voice_data, tmp_path):
        from conv_spss import ConvAcousticModel
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'), end_epoch=2,
                            model_kwargs={'num_layers': 2, 'hidden_size': 32,
                                          'kernel_size': 3})
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(ConvAcousticModel, experiment_name='conv',
                                **args)
        exp.run_experiment()
        expdir = os.path.join(str(tmp_path / 'experiments'), 'conv')
        m1 = json.load(open(os.path.join(expdir, 'train', 'epoch_1',
                                         'metrics.json')))
        m2 = json.load(open(os.path.join(expdir, 'train', 'epoch_2',
                                         'metrics.json')))
        assert m2['loss'] < m1['loss']
        for key in ('LF0_RMSE_Hz', 'VUV_accuracy', 'MCEP_distortion',
                    'BAP_distortion'):
            assert np.isfinite(m1[key])
        assert os.path.isfile(os.path.join(expdir, 'checkpoints',
                                           'epoch_2.npz'))

    def test_causal_model_stream_step_matches_batch(self, voice_data,
                                                    tmp_path, rng):
        from conv_spss import ConvAcousticModel
        nn.manual_seed(7)
        model = ConvAcousticModel(num_layers=2, hidden_size=16,
                                  kernel_size=3, causal=True)
        for name, norm in model.normaliser_sources().items():
            if norm.use_deltas:
                dim = {'lf0': 1, 'mcep': 60, 'bap': 5}[name]
                norm.params = {'mean': np.zeros(dim, np.float32),
                               'std_dev': np.ones(dim, np.float32)}
                norm.delta_params = {'mean': np.zeros(3 * dim, np.float32),
                                     'std_dev': np.ones(3 * dim, np.float32)}
            model.normalisers[name] = norm
        x = rng.normal(size=(1, 12, 609)).astype(np.float32)
        batch = np.asarray(model.layers(jnp.asarray(x),
                                        seq_len=jnp.asarray([12.])))
        state, outs = None, []
        for start in range(0, 12, 4):
            out, state = model.stream_step(jnp.asarray(x[:, start:start + 4]),
                                           state)
            outs.append(np.asarray(out['normalised_lf0_deltas']))
        streamed = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(streamed, batch[..., :3], atol=1e-5)
