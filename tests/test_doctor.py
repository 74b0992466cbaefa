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
        # --device cpu adds the contained 'platform' (force-cpu) check.
        assert len(report['checks']) == 10
        by_name = {r['name']: r for r in report['checks']}
        assert by_name['platform']['status'] == 'PASS'
        assert 'readback' in by_name['transfer']['detail']

    def test_failed_cpu_force_skips_backend_checks(self, monkeypatch):
        """--device cpu with a backend already owning the process must
        report a contained FAIL and SKIP every backend-touching check."""
        from morgana_tpu import platform as platform_mod

        def boom():
            raise platform_mod.PlatformError('backend already initialised')
        monkeypatch.setattr(platform_mod, 'force_cpu', boom)
        results = doctor.run_checks(device='cpu')
        by_name = {r['name']: r for r in results}
        assert by_name['platform']['status'] == 'FAIL'
        for name in ('device', 'transfer', 'train_step', 'sharding',
                     'data_pipeline'):
            assert by_name[name]['status'] == 'SKIP', by_name[name]
        # Host-only checks still run.
        assert by_name['checkpoint']['status'] == 'PASS'

    def test_failures_set_exit_code(self, monkeypatch):
        def boom():
            raise RuntimeError('nope')
        results = []
        doctor._check('broken', boom, results)
        assert results[0]['status'] == 'FAIL'
        assert 'nope' in results[0]['detail']
