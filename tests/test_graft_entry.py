"""Driver entry points: single-chip forward compile + multichip dryrun on the
8-device virtual CPU mesh."""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert set(out) >= {'lf0', 'vuv', 'mcep', 'bap'}
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_driver_environment():
    """The driver invokes dryrun_multichip in a fresh process with NO
    platform/env preparation — the dryrun itself must force the virtual-CPU
    platform before any backend initialises (round-1 red gate)."""
    import subprocess
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    repo = os.path.join(os.path.dirname(__file__), '..')
    proc = subprocess.run(
        [sys.executable, '-c',
         'from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)'],
        cwd=repo, env=env, capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'dryrun_multichip ok' in proc.stdout
