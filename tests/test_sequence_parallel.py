"""Sequence parallelism: GSPMD activation sharding of the transformer's time
axis over a ('data', 'seq') mesh — sharded == unsharded forward and
gradients (XLA inserts the attention K/V all-gather)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from morgana_tpu import nn
from morgana_tpu.parallel.mesh import make_seq_mesh

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'models'))


def _batch(batch=4, frames=16, d=24, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(batch, frames, d)).astype(np.float32))
    seq_len = jnp.asarray(rng.integers(6, frames + 1, size=(batch,)), jnp.int32)
    return x, seq_len


class TestSequenceParallel:
    def test_encoder_sharded_matches_unsharded(self):
        mesh = make_seq_mesh(4)
        assert dict(mesh.shape) == {'data': 2, 'seq': 4}
        sharding = NamedSharding(mesh, P('data', 'seq'))
        nn.manual_seed(9)
        enc = nn.TransformerEncoder(2, 24, 2, 48)
        x, seq_len = _batch()
        ref = jax.jit(lambda x, s: enc(x, seq_len=s))(x, seq_len)
        enc.activation_sharding = sharding
        out = jax.jit(lambda x, s: enc(x, seq_len=s))(x, seq_len)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match(self):
        mesh = make_seq_mesh(4)
        sharding = NamedSharding(mesh, P('data', 'seq'))
        nn.manual_seed(10)
        enc = nn.TransformerEncoder(2, 24, 2, 48)
        x, seq_len = _batch()
        params = nn.parameters(enc)

        def loss_fn(p):
            with nn.bind(enc, p, train=True):
                y = enc(x, seq_len=seq_len)
            return jnp.mean(y ** 2)

        ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        enc.activation_sharding = sharding
        sp_loss, sp_grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=1e-6)
        for name in ref_grads:
            np.testing.assert_allclose(np.asarray(sp_grads[name]),
                                       np.asarray(ref_grads[name]),
                                       rtol=5e-4, atol=1e-6, err_msg=name)

    def test_seq_axis_guard(self):
        """A 'seq' axis larger than the device count raises clearly instead
        of building a zero-device mesh."""
        import pytest
        from morgana_tpu.parallel.mesh import make_seq_mesh
        with pytest.raises(ValueError, match='seq'):
            make_seq_mesh(1000)

    def test_model_kwarg(self):
        from transformer_spss import TransformerAcousticModel
        kwargs = dict(num_layers=2, d_model=24, num_heads=2, d_ff=48)
        nn.manual_seed(11)
        base = TransformerAcousticModel(**kwargs)
        nn.manual_seed(11)
        sp = TransformerAcousticModel(sequence_parallel=4, **kwargs)
        x, seq_len = _batch(batch=4, frames=16, d=609, seed=2)
        ref = jax.jit(lambda x, s: base.layers(x, seq_len=s))(x, seq_len)
        out = jax.jit(lambda x, s: sp.layers(x, seq_len=s))(x, seq_len)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
