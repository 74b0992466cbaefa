"""TrainLoop plumbing details: batch filtering and step-scheduled losses."""
import jax.numpy as jnp
import numpy as np

from morgana_tpu import metrics, nn
from morgana_tpu.base_models import BaseSPSS
from morgana_tpu.training import TrainLoop, build_optimizer, numeric_features


def test_numeric_features_keeps_bfloat16():
    """numpy's issubdtype treats extension dtypes (bfloat16) as non-numeric;
    the filter must not silently drop them from the jit batch."""
    import ml_dtypes
    feats = {
        'a': np.ones((2, 3), np.float32),
        'b': np.ones((2, 3), ml_dtypes.bfloat16),
        'c': np.ones((2,), np.bool_),
        'name': ['x', 'y'],
    }
    out = numeric_features(feats)
    assert set(out) == {'a', 'b', 'c'}


class _Scheduled(BaseSPSS):
    """Loss directly reads the traced global_step (the KL-annealing
    pattern)."""

    def __init__(self):
        super().__init__()
        self.lin = nn.Linear(3, 1)
        self.metrics.add_metrics('all', m=metrics.Mean())

    def normaliser_sources(self):
        return {}

    def train_data_sources(self):
        return {}

    def predict(self, features):
        return {'y': self.lin(features['x'])}

    def loss(self, features, output_features):
        frac = jnp.minimum(features['global_step'] / 100.0, 1.0)
        self.metrics.accumulate(self.mode, m=(jnp.ones((1, 1, 1)),))
        return jnp.mean(output_features['y'] ** 2) * frac


def _make_loop():
    nn.manual_seed(0)
    model = _Scheduled()
    model.mode = 'train'
    return model, TrainLoop(model, build_optimizer(), seed=0)


def test_use_ema_without_ema_params_raises():
    """Silently falling back to raw params would report raw-parameter
    metrics as EMA numbers."""
    import pytest
    model, loop = _make_loop()  # ema_decay defaults to 0 -> no EMA tracked
    batch = {'x': np.ones((2, 4, 3), np.float32),
             'n_frames': np.array([4., 4.], np.float32)}
    with pytest.raises(ValueError, match='EMA'):
        loop.eval_step(batch, use_ema=True)
    with pytest.raises(ValueError, match='EMA'):
        loop.predict_step(batch, use_ema=True)


def test_global_step_is_integer_precise():
    """global_step rides as an integer: an f32 scalar collides past 2^24
    steps ((1<<24) + 1 rounds to 1<<24) and step schedules would stall."""
    model, loop = _make_loop()
    batch = {'x': np.ones((2, 4, 3), np.float32),
             'n_frames': np.array([4., 4.], np.float32)}
    model.mode = 'valid'
    captured = {}
    orig = loop._eval_step

    def spy(params, b, global_step, rng):
        captured['gs'] = global_step
        return orig(params, b, global_step, rng)

    loop._eval_step = spy
    loop.step_count = (1 << 24) + 1  # not representable in f32
    loss, _, _ = loop.eval_step(batch)
    assert int(captured['gs']) == (1 << 24) + 1
    assert np.isfinite(float(loss))


def test_eval_step_receives_global_step():
    """Validation must weight step-scheduled losses (KL annealing) exactly
    as the current training step does — not at the fully-annealed value."""
    model, loop = _make_loop()
    batch = {'x': np.ones((2, 4, 3), np.float32),
             'n_frames': np.array([4., 4.], np.float32)}

    model.mode = 'valid'
    loss_step0, _, _ = loop.eval_step(batch)
    loop.step_count = 50
    loss_step50, _, _ = loop.eval_step(batch)
    assert float(loss_step0) == 0.0  # frac = 0 at step 0
    assert float(loss_step50) > 0.0
    np.testing.assert_allclose(float(loss_step50) * 2,
                               float(loss_step50) / 50 * 100, rtol=1e-6)
