"""Corpus validation CLI (`python -m morgana_tpu.data.validate`): the lint
that catches data mistakes before they become mid-epoch crashes."""
import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from tiny_models import TinyF0Model

from morgana_tpu.data.validate import validate_corpus, format_report

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    from morgana_tpu.data.synthetic import generate_voice_data
    root = str(tmp_path_factory.mktemp('validate_corpus') / 'data')
    generate_voice_data(root, num_train=6, num_valid=2, num_test=2, seed=5)
    return root


@pytest.fixture()
def broken(corpus, tmp_path):
    """A per-test mutable copy of the corpus."""
    dst = str(tmp_path / 'data')
    shutil.copytree(corpus, dst)
    return dst


def _first_id(data_root, split='train'):
    path = os.path.join(data_root, split, f'{split}_file_id_list.scp')
    return open(path).read().split()[0]


class TestCleanCorpus:
    def test_no_errors_or_warnings(self, corpus):
        result = validate_corpus(TinyF0Model(), corpus, 'train')
        assert result['num_errors'] == 0, result['errors']
        assert result['num_warnings'] == 0, result['warnings']
        assert any('id list' in c for c in result['checks'])
        assert any('files' in c for c in result['checks'])
        assert any('normalisers' in c for c in result['checks'])

    def test_valid_and_test_splits(self, corpus):
        for split in ('valid', 'test'):
            result = validate_corpus(TinyF0Model(), corpus, split,
                                     sources=split)
            assert result['num_errors'] == 0, (split, result['errors'])

    def test_format_report_summary(self, corpus):
        text = format_report(validate_corpus(TinyF0Model(), corpus, 'train'))
        assert 'Summary: 0 error(s), 0 warning(s)' in text


class TestDetection:
    def test_missing_file(self, broken):
        uid = _first_id(broken)
        os.remove(os.path.join(broken, 'train', 'lf0', f'{uid}.npy'))
        result = validate_corpus(TinyF0Model(), broken, 'train')
        assert any('lf0' in e and 'missing' in e and uid in e
                   for e in result['errors']), result['errors']

    def test_non_finite_values(self, broken):
        uid = _first_id(broken)
        path = os.path.join(broken, 'train', 'counters', f'{uid}.npy')
        arr = np.load(path)
        arr[0, 0] = np.nan
        np.save(path, arr)
        result = validate_corpus(TinyF0Model(), broken, 'train')
        assert any('counters' in e and 'non-finite' in e
                   for e in result['errors']), result['errors']

    def test_frame_length_mismatch(self, broken):
        # Truncate a frame-level source: its rows no longer match n_frames.
        uid = _first_id(broken)
        path = os.path.join(broken, 'train', 'lf0', f'{uid}.npy')
        np.save(path, np.load(path)[:-3])
        result = validate_corpus(TinyF0Model(), broken, 'train')
        assert any('length mismatch' in e and 'lf0' in e
                   for e in result['errors']), result['errors']

    def test_duration_sum_mismatch(self, broken):
        uid = _first_id(broken)
        path = os.path.join(broken, 'train', 'dur', f'{uid}.txt')
        dur = np.loadtxt(path).astype(int)
        dur[0] += 2  # sum no longer equals n_frames
        np.savetxt(path, dur, fmt='%d')
        result = validate_corpus(TinyF0Model(), broken, 'train')
        assert any('duration mismatch' in e for e in result['errors']), \
            result['errors']

    def test_inconsistent_feature_dim(self, broken):
        uid = _first_id(broken)
        path = os.path.join(broken, 'train', 'lab', f'{uid}.npy')
        arr = np.load(path)
        np.save(path, arr[:, :-1])  # one utterance with a different lab dim
        result = validate_corpus(TinyF0Model(), broken, 'train')
        assert any('inconsistent feature dim' in e and 'lab' in e
                   for e in result['errors']), result['errors']

    def test_missing_normaliser_params(self, broken):
        os.remove(os.path.join(broken, 'train', 'lf0_mvn.json'))
        result = validate_corpus(TinyF0Model(), broken, 'train')
        assert any('lf0' in e and 'params file not found' in e
                   for e in result['errors']), result['errors']

    def test_stale_normaliser_params_warn(self, broken):
        # Shift the fitted mean far away: the sampled-stats drift check
        # should flag it as a warning (not an error).
        path = os.path.join(broken, 'train', 'lf0_mvn.json')
        params = json.load(open(path))
        params['mean'] = [m + 100.0 for m in np.atleast_1d(params['mean'])]
        json.dump(params, open(path, 'w'))
        result = validate_corpus(TinyF0Model(), broken, 'train')
        assert result['num_errors'] == 0, result['errors']
        assert any('drifts' in w for w in result['warnings']), \
            result['warnings']

    def test_duplicate_ids(self, broken):
        path = os.path.join(broken, 'train', 'train_file_id_list.scp')
        ids = open(path).read().split()
        open(path, 'w').write('\n'.join(ids + [ids[0]]) + '\n')
        result = validate_corpus(TinyF0Model(), broken, 'train')
        assert any('duplicate' in e for e in result['errors']), \
            result['errors']

    def test_delta_flag_mismatch(self, corpus):
        class BadModel(TinyF0Model):
            def train_data_sources(self):
                sources = super().train_data_sources()
                sources['lf0'].use_deltas = False
                return sources
        result = validate_corpus(BadModel(), corpus, 'train')
        assert any('use_deltas' in e for e in result['errors']), \
            result['errors']


class TestCLI:
    def _run(self, data_root, *extra):
        env = dict(os.environ,
                   PYTHONPATH=REPO + os.pathsep + os.environ.get('PYTHONPATH', ''),
                   JAX_PLATFORMS='cpu')
        return subprocess.run(
            [sys.executable, '-m', 'morgana_tpu.data.validate',
             '--model', os.path.join(REPO, 'tests', 'tiny_models.py')
             + ':TinyF0Model',
             '--data_root', data_root, '--data_dir', 'train', *extra],
            capture_output=True, text=True, env=env, timeout=300)

    def test_clean_exit_zero(self, corpus, tmp_path):
        out_json = str(tmp_path / 'report.json')
        proc = self._run(corpus, '--json', out_json)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert 'Summary: 0 error(s)' in proc.stdout
        report = json.load(open(out_json))
        assert report['num_errors'] == 0

    def test_broken_exit_one(self, broken):
        uid = _first_id(broken)
        os.remove(os.path.join(broken, 'train', 'lf0', f'{uid}.npy'))
        proc = self._run(broken)
        assert proc.returncode == 1, proc.stdout + proc.stderr
        assert '[error]' in proc.stdout
