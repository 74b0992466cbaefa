"""Explicit shard_map DP step: numerically identical to the GSPMD jit path."""
import jax
import jax.numpy as jnp
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


def _run_gspmd(mesh, batches, steps=3):
    model = _make_model(3)
    loop = TrainLoop(model, build_optimizer(), seed=0)
    loop.params = parallel.shard_params(loop.params, mesh)
    losses = []
    for i in range(steps):
        batch = parallel.shard_batch(batches[i % 2], mesh)
        loss, _, _ = loop.train_step(batch, lr=0.01)
        losses.append(float(loss))
    return losses, {k: np.asarray(v) for k, v in loop.params.items()}


def test_shard_map_matches_gspmd(rng):
    mesh = parallel.make_mesh()
    batches = [_synthetic_batch(rng) for _ in range(2)]
    losses_a, params_a = _run_gspmd(mesh, batches)

    # Explicit shard_map path (raw step function).
    model_b = _make_model(3)
    optimizer = build_optimizer()
    params = parallel.shard_params(nn.parameters(model_b), mesh)
    opt_state = optimizer.init(params)
    step = build_shard_map_train_step(model_b, optimizer, mesh)
    losses_b = []
    rng_key = jax.random.PRNGKey(0)
    for i in range(3):
        rng_key, key = jax.random.split(rng_key)
        batch = parallel.shard_batch(numeric_features(batches[i % 2]), mesh)
        params, opt_state, _, loss, staged, outputs = step(
            params, opt_state, None, batch, jnp.float32(0.01),
            jnp.float32(i), key)
        losses_b.append(float(loss))
    params_b = {k: np.asarray(v) for k, v in params.items()}

    np.testing.assert_allclose(losses_b, losses_a, rtol=2e-4)
    for k in params_a:
        np.testing.assert_allclose(params_b[k], params_a[k], atol=3e-5)
    # Forward outputs come back batch-sharded but globally correct.
    assert all(np.asarray(v).shape[0] == 8 for v in outputs.values()
               if hasattr(v, 'shape') and np.asarray(v).ndim)


def test_trainloop_shard_map_mesh_matches_gspmd(rng):
    """TrainLoop(shard_map_mesh=...) — the builder's --shard_map_step path —
    is numerically identical to the GSPMD TrainLoop."""
    mesh = parallel.make_mesh()
    batches = [_synthetic_batch(rng) for _ in range(2)]
    losses_a, params_a = _run_gspmd(mesh, batches)

    model = _make_model(3)
    loop = TrainLoop(model, build_optimizer(), seed=0, shard_map_mesh=mesh)
    loop.params = parallel.shard_params(loop.params, mesh)
    losses_b = []
    for i in range(3):
        batch = parallel.shard_batch(batches[i % 2], mesh)
        loss, _, _ = loop.train_step(batch, lr=0.01)
        losses_b.append(float(loss))

    np.testing.assert_allclose(losses_b, losses_a, rtol=2e-4)
    for k, v in loop.params.items():
        np.testing.assert_allclose(np.asarray(v), params_a[k], atol=3e-5)


def test_dropout_decorrelated_across_shards(rng):
    """Stochastic layers must draw DIFFERENT noise per data shard: the rng
    arrives replicated, so without an axis-index fold-in every device would
    apply identical dropout masks to its shard."""
    mesh = parallel.make_mesh()
    nn.manual_seed(3)
    model = TinyF0Model(dropout_prob=0.5)
    norm = model.normaliser_sources()['lf0']
    norm.params = {'mean': np.zeros(1, np.float32), 'std_dev': np.ones(1, np.float32)}
    norm.delta_params = {'mean': np.zeros(3, np.float32),
                         'std_dev': np.ones(3, np.float32)}
    model.normalisers = {'lf0': norm}
    model.mode = 'train'

    # Identical rows: any cross-shard output difference must come from rng.
    batch = _synthetic_batch(rng)
    one = {k: np.repeat(v[:1], v.shape[0], axis=0) for k, v in batch.items()}

    loop = TrainLoop(model, build_optimizer(), seed=0, shard_map_mesh=mesh)
    loop.params = parallel.shard_params(loop.params, mesh)
    _, _, outputs = loop.train_step(parallel.shard_batch(one, mesh), lr=0.0)
    pred = np.asarray(outputs['normalised_lf0_deltas'])
    num_data = mesh.shape['data']
    per_shard = pred.reshape(num_data, -1, *pred.shape[1:])
    assert np.abs(per_shard[0] - per_shard[1]).max() > 1e-6, \
        'shards drew identical dropout masks'
