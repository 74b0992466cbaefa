"""Offline objective evaluation (``morgana_tpu/evaluate.py``): directory
scoring with the training-time metric definitions."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from morgana_tpu.evaluate import evaluate_dirs


@pytest.fixture(scope='module')
def eval_dirs(voice_data, tmp_path_factory):
    """A reference split + a perturbed/shortened 'generated' copy."""
    root = voice_data['data_root']
    ref = os.path.join(root, 'test')
    with open(os.path.join(root, 'test/test_file_id_list.scp')) as f:
        ids = [l.strip() for l in f if l.strip()]
    gen = str(tmp_path_factory.mktemp('gen'))
    for feat in ('lf0', 'mcep', 'bap', 'vuv'):
        os.makedirs(os.path.join(gen, feat))
        for utt in ids:
            arr = np.load(os.path.join(ref, feat, f'{utt}.npy'))
            arr = arr[:int(arr.shape[0] * 0.9)]          # predicted-length gap
            if feat != 'vuv':
                arr = arr + 0.01
            np.save(os.path.join(gen, feat, f'{utt}.npy'), arr)
    return {'ref': ref, 'gen': gen, 'ids': ids}


class TestEvaluateDirs:
    def test_identity_scores_zero(self, eval_dirs):
        res = evaluate_dirs(eval_dirs['ref'], eval_dirs['ref'],
                            eval_dirs['ids'])
        assert res['LF0_RMSE_Hz'] == 0.0
        assert res['MCEP_distortion'] == 0.0
        assert res['BAP_distortion_dB'] == 0.0
        assert res['VUV_agreement_pct'] == 100.0
        assert res['mean_length_ratio'] == 1.0
        assert res['utterances'] == len(eval_dirs['ids'])

    def test_perturbation_registers_and_lengths_truncate(self, eval_dirs):
        res = evaluate_dirs(eval_dirs['ref'], eval_dirs['gen'],
                            eval_dirs['ids'])
        # +0.01 on lf0 ~ 1% f0 error: strictly positive, plausibly small.
        assert 0 < res['LF0_RMSE_Hz'] < 20
        assert res['MCEP_distortion'] == pytest.approx(0.01, rel=1e-3)
        assert res['BAP_distortion_dB'] > 0
        assert res['VUV_agreement_pct'] == 100.0
        assert 0.85 < res['mean_length_ratio'] < 0.95

    def test_explicit_feats_and_generic_rmse(self, eval_dirs, tmp_path):
        # Score a non-standard feature name with plain RMSE when asked.
        for d in (eval_dirs['ref'], str(tmp_path)):
            os.makedirs(os.path.join(d, 'energy'), exist_ok=True)
        for utt in eval_dirs['ids']:
            np.save(os.path.join(eval_dirs['ref'], 'energy', f'{utt}.npy'),
                    np.ones((10, 1), np.float32))
            np.save(os.path.join(tmp_path, 'energy', f'{utt}.npy'),
                    np.ones((10, 1), np.float32) + 0.5)
        res = evaluate_dirs(eval_dirs['ref'], str(tmp_path),
                            eval_dirs['ids'], feats=['energy'])
        assert res['energy_RMSE'] == pytest.approx(0.5, rel=1e-5)

    def test_no_comparable_features_raises(self, eval_dirs, tmp_path):
        with pytest.raises(ValueError, match='scoreable'):
            evaluate_dirs(eval_dirs['ref'], str(tmp_path), eval_dirs['ids'])

    def test_cli(self, eval_dirs):
        # A 'dur' dir exists on both sides but holds .txt files in the ref
        # (data-split layout) — default id discovery must skip it and find
        # ids in a scoreable .npy-bearing dir instead of yielding zero ids.
        os.makedirs(os.path.join(eval_dirs['gen'], 'dur'), exist_ok=True)
        for utt in eval_dirs['ids']:
            np.save(os.path.join(eval_dirs['gen'], 'dur', f'{utt}.npy'),
                    np.ones((4,), np.float32))
        assert os.path.exists(os.path.join(eval_dirs['ref'], 'dur',
                                           f"{eval_dirs['ids'][0]}.txt"))
        proc = subprocess.run(
            [sys.executable, '-m', 'morgana_tpu.evaluate',
             '--ref_dir', eval_dirs['ref'], '--gen_dir', eval_dirs['gen']],
            capture_output=True, text=True, timeout=240,
            cwd=os.path.join(os.path.dirname(__file__), '..'))
        assert proc.returncode == 0, proc.stderr
        res = json.loads(proc.stdout.strip().splitlines()[-1])
        assert res['utterances'] == len(eval_dirs['ids'])
        assert 'LF0_RMSE_Hz' in res
