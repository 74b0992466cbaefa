"""Explicit shard_map DP step: numerically identical to the GSPMD jit path."""
import jax
import numpy as np
import pytest

from morgana_tpu import nn, parallel
from morgana_tpu.parallel.shard_map_step import build_shard_map_train_step
from morgana_tpu.training import TrainLoop, build_optimizer, numeric_features
from tiny_models import TinyF0Model
from test_parallel import _synthetic_batch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def _make_model(seed):
    nn.manual_seed(seed)
    model = TinyF0Model()
    norm = model.normaliser_sources()['lf0']
    norm.params = {'mean': np.zeros(1, np.float32), 'std_dev': np.ones(1, np.float32)}
    norm.delta_params = {'mean': np.zeros(3, np.float32), 'std_dev': np.ones(3, np.float32)}
    model.normalisers = {'lf0': norm}
    model.mode = 'train'
    return model


def test_shard_map_matches_gspmd(rng):
    mesh = parallel.make_mesh()
    batches = [_synthetic_batch(rng) for _ in range(2)]

    # GSPMD path (TrainLoop with sharded inputs).
    model_a = _make_model(3)
    loop = TrainLoop(model_a, build_optimizer(), seed=0)
    loop.params = parallel.shard_params(loop.params, mesh)
    losses_a = []
    for i in range(3):
        batch = parallel.shard_batch(batches[i % 2], mesh)
        loss, _, _ = loop.train_step(batch, lr=0.01)
        losses_a.append(float(loss))
    params_a = {k: np.asarray(v) for k, v in loop.params.items()}

    # Explicit shard_map path.
    model_b = _make_model(3)
    optimizer = build_optimizer()
    params = parallel.shard_params(nn.parameters(model_b), mesh)
    opt_state = optimizer.init(params)
    step = build_shard_map_train_step(model_b, optimizer, mesh)
    import jax.numpy as jnp
    losses_b = []
    rng_key = jax.random.PRNGKey(0)
    for i in range(3):
        rng_key, key = jax.random.split(rng_key)
        batch = parallel.shard_batch(
            dict(numeric_features(batches[i % 2]),
                 global_step=np.zeros((8,), np.float32)), mesh)
        params, opt_state, _, loss, staged = step(
            params, opt_state, None, batch, jnp.float32(0.01), key)
        losses_b.append(float(loss))
    params_b = {k: np.asarray(v) for k, v in params.items()}

    np.testing.assert_allclose(losses_b, losses_a, rtol=2e-4)
    for k in params_a:
        np.testing.assert_allclose(params_b[k], params_a[k], atol=3e-5)
