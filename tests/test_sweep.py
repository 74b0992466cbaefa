"""Hyperparameter sweep runner (`python -m morgana_tpu.sweep`)."""
import json
import os
import subprocess
import sys

import pytest

from conftest import builder_args
from tiny_models import TinyF0Model

from morgana_tpu.sweep import expand_grid, format_summary, run_sweep

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestExpandGrid:
    def test_grid_product(self):
        configs = expand_grid({'a': [1, 2], 'b': ['x', 'y', 'z']})
        assert len(configs) == 6
        assert {'a': 2, 'b': 'z'} in configs

    def test_zip_pairs(self):
        configs = expand_grid({'a': [1, 2], 'b': ['x', 'y']}, mode='zip')
        assert configs == [{'a': 1, 'b': 'x'}, {'a': 2, 'b': 'y'}]

    def test_zip_length_mismatch(self):
        with pytest.raises(ValueError, match='equal-length'):
            expand_grid({'a': [1, 2], 'b': ['x']}, mode='zip')

    def test_empty_and_scalar_rejected(self):
        with pytest.raises(ValueError, match='empty'):
            expand_grid({})
        with pytest.raises(ValueError, match='non-empty list'):
            expand_grid({'a': 3})


class TestRunSweep:
    def test_two_run_sweep_ranked(self, voice_data, tmp_path):
        exp_base = str(tmp_path / 'experiments')
        args = builder_args(voice_data['data_root'], exp_base,
                            end_epoch=2, experiment_name='swp')
        summary = run_sweep(TinyF0Model, args,
                            {'learning_rate': [0.005, 0.0001]})
        assert len(summary['runs']) == 2
        for run in summary['runs']:
            assert 'error' not in run, run
            assert run['epochs_trained'] == 2
            assert os.path.isdir(os.path.join(exp_base,
                                              run['experiment_name']))
        # Ranked by best valid loss, ascending.
        v = [r['best_valid_loss'] for r in summary['runs']]
        assert v == sorted(v)

        sweep_dir = os.path.join(exp_base, 'swp-sweep')
        assert os.path.isfile(os.path.join(sweep_dir, 'sweep_summary.json'))
        assert os.path.isfile(os.path.join(sweep_dir, 'sweep_summary.txt'))
        assert os.path.isfile(os.path.join(sweep_dir, 'comparison.pdf'))
        text = format_summary(summary)
        assert 'best_valid_loss' in text
        assert summary['runs'][0]['experiment_name'] in text

    def test_failed_run_recorded_and_sweep_continues(self, voice_data,
                                                     tmp_path):
        exp_base = str(tmp_path / 'experiments')
        args = builder_args(voice_data['data_root'], exp_base,
                            end_epoch=1, valid=False,
                            experiment_name='swpfail')
        summary = run_sweep(
            TinyF0Model, args,
            {'lr_schedule_name': ['constant', 'not_a_schedule']}, plot=False)
        by_cfg = {r['config']['lr_schedule_name']: r
                  for r in summary['runs']}
        assert 'error' not in by_cfg['constant']
        assert 'error' in by_cfg['not_a_schedule']
        # Failures rank last.
        assert 'error' in summary['runs'][-1]

    def test_unknown_sweep_key_raises(self, voice_data, tmp_path):
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            experiment_name='swp')
        with pytest.raises(ValueError, match='not in the flag surface'):
            run_sweep(TinyF0Model, args, {'learning_rat': [0.1]})

    def test_max_runs_guard(self, voice_data, tmp_path):
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            experiment_name='swp')
        with pytest.raises(ValueError, match='max_runs'):
            run_sweep(TinyF0Model, args,
                      {'learning_rate': [1, 2], 'batch_size': [1, 2]},
                      max_runs=3)


class TestCLI:
    def test_cli_end_to_end(self, voice_data, tmp_path):
        exp_base = str(tmp_path / 'experiments')
        env = dict(os.environ,
                   PYTHONPATH=REPO + os.pathsep + os.environ.get('PYTHONPATH', ''),
                   JAX_PLATFORMS='cpu')
        proc = subprocess.run(
            [sys.executable, '-m', 'morgana_tpu.sweep',
             '--model', os.path.join(REPO, 'tests', 'tiny_models.py')
             + ':TinyF0Model',
             '--sweep', "{'learning_rate': [0.005, 0.001]}",
             '--experiment_name', 'cli',
             '--data_root', voice_data['data_root'],
             '--train_id_list', 'train/train_file_id_list.scp',
             '--valid_id_list', 'valid/valid_file_id_list.scp',
             '--test_id_list', 'test/test_file_id_list.scp',
             '--experiments_base', exp_base,
             '--batch_size', '4', '--end_epoch', '1', '--no-valid',
             '--no_plot', '--device', 'cpu'],
            capture_output=True, text=True, env=env, timeout=600)
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
        summary = json.load(open(os.path.join(
            exp_base, 'cli-sweep', 'sweep_summary.json')))
        assert len(summary['runs']) == 2
        assert all('error' not in r for r in summary['runs'])
        assert 'final_train_loss' in proc.stdout
