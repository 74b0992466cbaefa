"""LR range test (`--find_lr`): exponential lr sweep over real fused steps,
divergence stop, steepest-descent suggestion."""
import json
import os

import numpy as np
import pytest

from conftest import builder_args
from tiny_models import TinyF0Model

from morgana_tpu import nn
from morgana_tpu.experiment_builder import ExperimentBuilder


def _build(voice_data, tmp_path, find_lr, name):
    args = builder_args(voice_data['data_root'],
                        str(tmp_path / 'experiments'),
                        valid=False, find_lr=find_lr)
    nn.manual_seed(args['seed'])
    return ExperimentBuilder(TinyF0Model, experiment_name=name, **args)


class TestFindLR:
    def test_full_sweep_and_artifacts(self, voice_data, tmp_path):
        exp = _build(voice_data, tmp_path, '1e-6,0.05,40', 'lrf')
        result = exp.run_experiment()
        assert result['steps_run'] >= 10
        assert result['steps_requested'] == 40
        # Geometric schedule spans the requested range.
        lrs = [r['lr'] for r in result['records']]
        assert lrs[0] == pytest.approx(1e-6)
        assert lrs == sorted(lrs)
        assert all(r['smoothed'] is None or np.isfinite(r['smoothed'])
                   for r in result['records'])
        if result['suggestion'] is not None:
            assert 1e-6 <= result['suggestion'] <= 0.05

        saved = json.load(open(os.path.join(exp.experiment_dir,
                                            'lr_find.json')))
        assert saved['stop_reason'] == result['stop_reason']
        assert os.path.isfile(os.path.join(exp.experiment_dir,
                                           'lr_find.png'))
        # Range-test mode trains nothing durable.
        ckpts = os.path.join(exp.experiment_dir, 'checkpoints')
        assert not os.path.isdir(ckpts) or not os.listdir(ckpts)

    def test_divergence_stops_early(self, voice_data, tmp_path):
        # Sweeping into lr=1e4 territory must trip the 4x-best stop (or hit
        # a non-finite loss) well before all 200 steps run.
        exp = _build(voice_data, tmp_path, '1e-5,1e4,200', 'lrdiv')
        result = exp.run_experiment()
        assert result['steps_run'] < 200, result['stop_reason']
        assert 'stopped at step' in result['stop_reason']

    def test_empty_loader_raises(self, voice_data, tmp_path):
        """A loader that never yields must fail loudly, not spin forever in
        the multi-pass sweep loop."""
        exp = _build(voice_data, tmp_path, '1e-5,1e-2,20', 'lrempty')
        exp.train_loader = []
        with pytest.raises(RuntimeError, match='no batches'):
            exp.run_experiment()

    def test_bad_spec_rejected(self, voice_data, tmp_path):
        for spec in ('0.1', '1e-3,1e-4', '1e-6,1,5', 'a,b'):
            exp = _build(voice_data, tmp_path, spec, f'bad{hash(spec) % 100}')
            with pytest.raises(ValueError):
                exp.run_experiment()
