"""Checkpointing tests: state-dict npz roundtrip, training-state sidecars,
optional orbax path."""
import os

import numpy as np
import pytest

from morgana_tpu import checkpointing as cp


class TestStateDicts:
    def test_npz_roundtrip(self, tmp_path, rng):
        sd = {'layers.0.weight': rng.normal(size=(4, 8)).astype(np.float32),
              'layers.0.bias': rng.normal(size=(8,)).astype(np.float32)}
        path = str(tmp_path / 'checkpoints' / 'epoch_3.npz')
        cp.save_state_dict(sd, path)
        out = cp.load_state_dict(path)
        assert set(out) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(out[k], sd[k])

    def test_load_adds_npz_extension(self, tmp_path, rng):
        sd = {'w': rng.normal(size=(2,)).astype(np.float32)}
        cp.save_state_dict(sd, str(tmp_path / 'epoch_1.npz'))
        out = cp.load_state_dict(str(tmp_path / 'epoch_1'))
        np.testing.assert_array_equal(out['w'], sd['w'])

    def test_extensionless_path_same_file_both_modes(self, tmp_path, rng):
        """np.savez appends '.npz' to extensionless paths; atomic and
        non-atomic saves must agree on the written file AND return the path
        that actually exists (divergence let a stale atomic file shadow a
        newer non-atomic one through load's extensionless fallback)."""
        sd = {'w': rng.normal(size=(2,)).astype(np.float32)}
        p1 = cp.save_state_dict(sd, str(tmp_path / 'a'))
        p2 = cp.save_state_dict({'w': sd['w'] * 2}, str(tmp_path / 'a'),
                                atomic=True)
        assert p1 == p2 == str(tmp_path / 'a.npz')
        assert os.path.isfile(p1)
        assert sorted(os.listdir(tmp_path)) == ['a.npz']
        np.testing.assert_array_equal(
            cp.load_state_dict(str(tmp_path / 'a'))['w'], sd['w'] * 2)

    def test_orbax_latest_step_probe_has_no_side_effects(self, tmp_path):
        missing = str(tmp_path / 'typo')
        assert cp.orbax_latest_step(missing) is None
        assert not os.path.exists(missing)

    def test_training_state_roundtrip(self, tmp_path, rng):
        import jax.numpy as jnp
        params = {'w': jnp.ones((3,))}
        opt_state = {'mu': {'w': jnp.zeros((3,))}, 'count': jnp.int32(7)}
        path = cp.training_state_path_for(str(tmp_path / 'epoch_2.npz'))
        assert path.endswith('epoch_2.train.pkl')
        cp.save_training_state(path, params, opt_state=opt_state,
                               ema_params=None, step=42)
        state = cp.load_training_state(path)
        assert state['step'] == 42
        np.testing.assert_array_equal(state['params']['w'], 1.0)
        assert state['opt_state']['count'] == 7


@pytest.mark.skipif(not cp.orbax_available(), reason='orbax not installed')
class TestOrbax:
    def test_orbax_roundtrip(self, tmp_path):
        state = {'params': {'w': np.arange(6, dtype=np.float32).reshape(2, 3)},
                 'step': np.int32(5)}
        cp.orbax_save(str(tmp_path / 'orbax'), 1, state, async_save=False)
        out = cp.orbax_restore(str(tmp_path / 'orbax'))
        np.testing.assert_array_equal(out['params']['w'], state['params']['w'])
        assert int(out['step']) == 5

    def test_orbax_async_then_wait(self, tmp_path):
        d = str(tmp_path / 'orbax_async')
        state = {'w': np.ones(4, np.float32)}
        cp.orbax_save(d, 1, state, async_save=True)
        cp.orbax_wait(d)
        out = cp.orbax_restore(d, step=1)
        np.testing.assert_array_equal(out['w'], 1.0)
