"""AOT deployment bundles (`morgana_tpu.export`): per-bucket StableHLO
programs + parameter pytree + manifest, runnable without model code."""
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
from morgana_tpu.export import ExportedVoice, export_bundle
from morgana_tpu.serve import InferenceEngine
from morgana_tpu.training import numeric_features

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module')
def trained(voice_data, tmp_path_factory):
    exp_base = str(tmp_path_factory.mktemp('export') / 'experiments')
    args = builder_args(voice_data['data_root'], exp_base,
                        end_epoch=1, valid=False)
    nn.manual_seed(args['seed'])
    exp = ExperimentBuilder(TinyF0Model, experiment_name='exp', **args)
    exp.run_experiment()
    return os.path.join(exp_base, 'exp', 'checkpoints', 'epoch_1.npz')


@pytest.fixture(scope='module')
def bundle(voice_data, trained, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp('bundle'))
    engine = InferenceEngine(TinyF0Model, trained,
                             data_root=voice_data['data_root'], batch_size=2)
    manifest = export_bundle(engine, out_dir, data_dir='test',
                             id_list='test/test_file_id_list.scp',
                             model_spec='tiny:TinyF0Model')
    return {'dir': out_dir, 'manifest': manifest, 'engine': engine}


class TestExportBundle:
    def test_manifest_and_files(self, bundle):
        manifest = bundle['manifest']
        assert manifest['programs'], manifest
        for prog in manifest['programs']:
            assert os.path.isfile(os.path.join(bundle['dir'], prog['file']))
            assert prog['batch'] >= 1 and prog['max_frames'] > 0
            names = {e['name'] for e in prog['inputs']}
            assert 'normalised_lab' in names and 'n_frames' in names
        assert os.path.isfile(os.path.join(bundle['dir'], 'params.pkl'))
        on_disk = json.load(open(os.path.join(bundle['dir'],
                                              'manifest.json')))
        assert on_disk['programs'] == manifest['programs']

    def test_bundle_matches_engine(self, voice_data, bundle):
        """ExportedVoice (no model class involved) reproduces the engine's
        predict outputs exactly on an exported shape."""
        engine = bundle['engine']
        voice = ExportedVoice(bundle['dir'])

        for features in engine._loader('test',
                                       id_list='test/test_file_id_list.scp'):
            batch = numeric_features(features)
            staged_e, out_e = engine._predict_step(
                engine._params, batch, engine._rng)
            staged_b, out_b = voice.run(batch, rng=engine._rng)
            for key in out_e:
                np.testing.assert_array_equal(np.asarray(out_e[key]),
                                              np.asarray(out_b[key]))
            assert set(staged_e) == set(staged_b)
            break

    def test_unknown_shape_reports_available(self, bundle, rng):
        voice = ExportedVoice(bundle['dir'])
        bad = {'normalised_lab': rng.random((1, 3, 600), np.float32),
               'n_frames': np.array([3.], np.float32)}
        with pytest.raises(ValueError, match='no exported program'):
            voice.run(bad)

    def test_empty_split_raises(self, voice_data, bundle, tmp_path):
        with pytest.raises(ValueError,
                           match='nothing to export|non-empty file_ids'):
            export_bundle(bundle['engine'], str(tmp_path / 'b2'),
                          data_dir='test', file_ids=[])


class TestExportCLI:
    def test_cli_end_to_end(self, voice_data, trained, tmp_path):
        out_dir = str(tmp_path / 'bundle')
        env = dict(os.environ,
                   PYTHONPATH=REPO + os.pathsep + os.environ.get('PYTHONPATH', ''),
                   JAX_PLATFORMS='cpu')
        proc = subprocess.run(
            [sys.executable, '-m', 'morgana_tpu.export',
             '--model', os.path.join(REPO, 'tests', 'tiny_models.py')
             + ':TinyF0Model',
             '--checkpoint_path', trained,
             '--data_root', voice_data['data_root'],
             '--data_dir', 'test', '--out_dir', out_dir,
             '--batch_size', '2', '--device', 'cpu'],
            capture_output=True, text=True, env=env, timeout=600)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        stats = json.loads(proc.stdout.strip().splitlines()[-1])
        assert stats['programs'] >= 1
        voice = ExportedVoice(out_dir)
        assert voice.signatures()
        assert voice.manifest['model'].endswith('TinyF0Model')
