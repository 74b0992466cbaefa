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
