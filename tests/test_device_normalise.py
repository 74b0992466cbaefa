"""Device-side normalisation / delta expansion (`--device_normalise`).

The host path (reference semantics, ``morgana/data.py:106-154``) computes
``normalised_{name}`` (+ delta keys) per utterance on the CPU and ships every
stream across the host->device link up to four times; the device path ships
only the raw stream and reconstructs the same keys inside XLA
(``morgana_tpu/data/device_normalise.py``). These tests pin the two paths
to each other: identical key sets, bitwise-equal deltas, normalised values
within float ulps, and equal training behaviour — single-device and sharded.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import builder_args
from tiny_models import TinyF0Model

from morgana_tpu import data, nn
from morgana_tpu.data.device_normalise import (eligible_names,
                                               make_device_transform,
                                               seq_len_key)
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu.ops.deltas import compute_deltas, compute_deltas_jax


class TestSeqLenAwareDeltas:
    def test_matches_host_per_item_bitwise(self, rng):
        """Ragged batch: per-item edge replication must reproduce the host's
        per-utterance delta computation exactly in the valid region."""
        lens = [13, 7, 1, 10]
        feats = [rng.normal(size=(l, 4)).astype(np.float32) for l in lens]
        batch = np.zeros((4, 13, 4), np.float32)
        for i, f in enumerate(feats):
            batch[i, :lens[i]] = f
        dev = np.asarray(compute_deltas_jax(jnp.array(batch),
                                            seq_len=jnp.array(lens)))
        for i, l in enumerate(lens):
            np.testing.assert_array_equal(dev[i, :l], compute_deltas(feats[i]))

    def test_no_seq_len_keeps_old_behaviour(self, rng):
        x = rng.normal(size=(2, 9, 3)).astype(np.float32)
        out = np.asarray(compute_deltas_jax(jnp.array(x)))
        for i in range(2):
            np.testing.assert_array_equal(out[i], compute_deltas(x[i]))


def _f0_setup(voice_data):
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'models'))
    from f0_test_model import F0Model
    nn.manual_seed(0)
    model = F0Model()
    norms = model.normaliser_sources()
    for norm in norms.values():
        norm.load_params('train', voice_data['data_root'])
    return model, norms


def _loader(voice_data, sources, norms, device_normalise, **kwargs):
    dataset = data.FilesDataset(sources, 'valid',
                                'valid/valid_file_id_list.scp', norms,
                                voice_data['data_root'],
                                device_normalise=device_normalise)
    transform = None
    if device_normalise:
        transform, _ = make_device_transform(
            sources, norms, wire_dtype=kwargs.get('transfer_dtype'))
    return data.batch(dataset, batch_size=4, shuffle=False,
                      device_transform=transform, **kwargs)


class TestLoaderEquality:
    def test_same_keys_and_values(self, voice_data):
        model, norms = _f0_setup(voice_data)
        sources = model.valid_data_sources()
        host_batches = list(_loader(voice_data, sources, norms, False))
        dev_batches = list(_loader(voice_data, sources, norms, True))
        assert len(host_batches) == len(dev_batches) > 0
        for host, dev in zip(host_batches, dev_batches):
            assert set(host) == set(dev)  # incl. no leftover *_seq_len keys
            for key in host:
                h = host[key]
                if not (hasattr(h, 'dtype')
                        and np.asarray(h).dtype.kind in 'fiu'):
                    continue
                h, d = np.asarray(h), np.asarray(dev[key])
                assert h.shape == d.shape, key
                assert h.dtype == d.dtype, key
                if key.endswith('_deltas') and not key.startswith('normalised'):
                    # Raw deltas: same f32 ops in the same order -> bitwise.
                    np.testing.assert_array_equal(h, d, err_msg=key)
                else:
                    # Normalised keys: XLA may fuse the divide into a
                    # reciprocal multiply -> 1-2 ulp.
                    np.testing.assert_allclose(h, d, atol=1e-6, rtol=1e-6,
                                               err_msg=key)

    def test_padding_region_is_zero(self, voice_data):
        """Host semantics: collate zero-pads AFTER normalisation. The device
        path must mask its reconstruction back to zero there."""
        model, norms = _f0_setup(voice_data)
        sources = model.valid_data_sources()
        for batch_features in _loader(voice_data, sources, norms, True):
            n_frames = np.asarray(batch_features['n_frames']).astype(int)
            for key in ('normalised_lf0', 'normalised_lf0_deltas',
                        'lf0_deltas'):
                arr = np.asarray(batch_features[key])
                for i, l in enumerate(n_frames):
                    assert np.all(arr[i, l:] == 0), (key, i)

    def test_eligibility_excludes_speaker_dependent(self):
        from morgana_tpu.data.normalisers import (
            MeanVarianceNormaliser, SpeakerDependentMeanVarianceNormaliser)
        from morgana_tpu.data.sources import NumpyBinarySource, TextSource
        sources = {'a': NumpyBinarySource('a'), 'b': NumpyBinarySource('b'),
                   'speaker_id': TextSource('speaker_id')}
        norms = {'a': MeanVarianceNormaliser('a'),
                 'b': SpeakerDependentMeanVarianceNormaliser('b', ['s1']),
                 'c': MeanVarianceNormaliser('c')}  # no source named c
        assert eligible_names(sources, norms) == ['a']

    def test_source_deltas_without_normaliser_deltas_stay_on_host(self):
        """A source emitting deltas under a NON-delta normaliser must keep
        the host path: the device transform would never rebuild the
        ``{name}_deltas`` key it strips."""
        from morgana_tpu.data.normalisers import MeanVarianceNormaliser
        from morgana_tpu.data.sources import NumpyBinarySource
        sources = {'x': NumpyBinarySource('x', use_deltas=True)}
        norms = {'x': MeanVarianceNormaliser('x')}  # use_deltas=False
        assert eligible_names(sources, norms) == []
        transform, engaged = make_device_transform(sources, norms)
        assert transform is None and engaged == []

    def test_extra_trailing_dims_are_masked(self, rng):
        """(B, T, H, D) collates are legal; the padding mask must broadcast
        over the extra trailing dims instead of crashing at trace time."""
        from morgana_tpu.data.normalisers import MeanVarianceNormaliser
        from morgana_tpu.data.sources import NumpyBinarySource
        norm = MeanVarianceNormaliser('x')
        norm.params = {'mean': np.full(3, 2.0, np.float32),
                       'std_dev': np.full(3, 0.5, np.float32)}
        sources = {'x': NumpyBinarySource('x')}
        transform, engaged = make_device_transform(sources, {'x': norm})
        assert engaged == ['x']
        lens = np.array([5, 3], np.int32)
        x = np.zeros((2, 5, 4, 3), np.float32)
        for i, l in enumerate(lens):
            x[i, :l] = rng.normal(size=(l, 4, 3)).astype(np.float32)
        out = transform({'x': jnp.array(x), seq_len_key('x'): jnp.array(lens)})
        got = np.asarray(out['normalised_x'])
        assert got.shape == x.shape
        expect = (x - 2.0) / 0.5
        for i, l in enumerate(lens):
            np.testing.assert_allclose(got[i, :l], expect[i, :l],
                                       rtol=1e-6, atol=1e-6)
            assert np.all(got[i, l:] == 0)

    def test_bf16_wire_composition(self, voice_data):
        """--transfer_dtype bfloat16 + --device_normalise: every key arrives
        in bf16 and matches the host path to bf16 precision. Non-delta'd
        streams (lab) ship as CENTERED residuals (rounding ~ |x - center|,
        the host path's own magnitude); delta'd streams (lf0, |x| ~ 5,
        std ~ 0.2 — raw bf16 shipping would inject ~0.2 sigma of noise, and
        delta keys would amplify it by sigma_x/sigma_delta) ship raw f32
        with derived keys cast to bf16 on device."""
        model, norms = _f0_setup(voice_data)
        sources = model.valid_data_sources()
        host_batches = list(_loader(voice_data, sources, norms, False,
                                    transfer_dtype='bfloat16'))
        dev_batches = list(_loader(voice_data, sources, norms, True,
                                   transfer_dtype='bfloat16'))
        checked = 0
        for host, dev in zip(host_batches, dev_batches):
            assert set(host) == set(dev)  # incl. no leftover *_wire keys
            for key in ('lf0', 'normalised_lf0', 'lf0_deltas',
                        'normalised_lf0_deltas', 'lab', 'normalised_lab'):
                h, d = np.asarray(host[key]), np.asarray(dev[key])
                assert d.dtype == jnp.bfloat16, key
                assert h.shape == d.shape
                np.testing.assert_allclose(
                    h.astype(np.float32), d.astype(np.float32),
                    atol=0.04, rtol=0.02, err_msg=key)
                checked += 1
        assert checked > 0

    def test_seq_len_key_emitted_then_consumed(self, voice_data):
        model, norms = _f0_setup(voice_data)
        sources = model.valid_data_sources()
        dataset = data.FilesDataset(sources, 'valid',
                                    'valid/valid_file_id_list.scp', norms,
                                    voice_data['data_root'],
                                    device_normalise=True)
        item = dataset[0]
        assert seq_len_key('lf0') in item
        assert 'normalised_lf0' not in item and 'lf0_deltas' not in item
        transform, _ = make_device_transform(sources, norms)
        batch_features = transform(
            data.FilesDataset.collate_fn([dataset[0], dataset[1]]))
        assert seq_len_key('lf0') not in batch_features
        assert 'normalised_lf0' in batch_features
        assert 'lf0_deltas' in batch_features


class TestTraining:
    def _losses(self, voice_data, tmp_path, name, **overrides):
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            end_epoch=2, valid=True, **overrides)
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name=name, **args)
        exp.run_experiment()
        import json
        import os
        losses = []
        for epoch in (1, 2):
            with open(os.path.join(exp.experiment_dir, 'valid',
                                   f'epoch_{epoch}', 'metrics.json')) as f:
                losses.append(json.load(f)['loss'])
        return losses

    def test_training_matches_host_path(self, voice_data, tmp_path):
        host = self._losses(voice_data, tmp_path, 'dn_off')
        dev = self._losses(voice_data, tmp_path, 'dn_on',
                           device_normalise=True)
        np.testing.assert_allclose(dev, host, rtol=1e-4)

    def test_training_matches_under_data_parallel(self, voice_data, tmp_path):
        host = self._losses(voice_data, tmp_path, 'dn_dp_off',
                            data_parallel=True, batch_size=8)
        dev = self._losses(voice_data, tmp_path, 'dn_dp_on',
                           data_parallel=True, batch_size=8,
                           device_normalise=True)
        np.testing.assert_allclose(dev, host, rtol=1e-4)

    def test_flag_default_auto(self):
        # Default is AUTO (None): resolved against the backend at init —
        # on for accelerator backends, off on CPU.
        args = ExperimentBuilder.get_experiment_args(
            ['--experiment_name', 'x'])
        assert args['device_normalise'] is None
        args = ExperimentBuilder.get_experiment_args(
            ['--experiment_name', 'x', '--device_normalise'])
        assert args['device_normalise'] is True
        args = ExperimentBuilder.get_experiment_args(
            ['--experiment_name', 'x', '--no-device_normalise'])
        assert args['device_normalise'] is False
