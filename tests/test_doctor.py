"""Environment self-check CLI (`python -m morgana_tpu.doctor`)."""
import json
import os
import subprocess
import sys

from morgana_tpu import doctor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestDoctor:
    def test_all_checks_pass_in_process(self):
        results = doctor.run_checks()
        by_name = {r['name']: r for r in results}
        assert set(by_name) == {
            'environment', 'device', 'transfer', 'native_libs', 'train_step',
            'sharding', 'data_pipeline', 'vocoder', 'checkpoint'}
        failed = [r for r in results if r['status'] == 'FAIL']
        assert not failed, failed
        # On the 8-virtual-device test backend the sharding check RUNS.
        assert by_name['sharding']['status'] == 'PASS'
        assert 'loss' in by_name['train_step']['detail']

    def test_cli_json_report(self):
        env = dict(os.environ,
                   PYTHONPATH=REPO + os.pathsep + os.environ.get(
                       'PYTHONPATH', ''))
        proc = subprocess.run(
            [sys.executable, '-m', 'morgana_tpu.doctor', '--device', 'cpu',
             '--json'],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=560)
        assert proc.returncode == 0, proc.stderr
        report = json.loads(proc.stdout.strip().splitlines()[-1])
        assert report['ok'] is True
        assert len(report['checks']) == 9

    def test_failures_set_exit_code(self, monkeypatch):
        def boom():
            raise RuntimeError('nope')
        results = []
        doctor._check('broken', boom, results)
        assert results[0]['status'] == 'FAIL'
        assert 'nope' in results[0]['detail']
