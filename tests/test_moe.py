"""Mixture-of-experts FFN (`nn.MoEFeedForward`) and expert parallelism:
single-expert equivalence to the dense FFN, capacity/overflow semantics,
padding exclusion, load-balancing aux loss plumbing, expert-sharded
execution on the 8-virtual-device CPU mesh, and encoder/model integration."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morgana_tpu import nn
from morgana_tpu.parallel.mesh import make_moe_mesh

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'models'))


def _x(batch=4, frames=10, d_model=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(batch, frames, d_model)).astype(np.float32))


class TestMoEFeedForward:
    def test_single_expert_equals_dense_ffn(self):
        """E=1: the router's softmax over one logit is exactly 1 and
        capacity covers every frame, so the layer IS the dense FFN."""
        d, ff = 16, 32
        nn.manual_seed(5)
        moe = nn.MoEFeedForward(d, ff, num_experts=1, capacity_factor=1.0)
        dense_in, dense_out = nn.Linear(d, ff), nn.Linear(ff, d)
        dense_in.weight.value = moe.w_in.value[0]
        dense_in.bias.value = moe.b_in.value[0]
        dense_out.weight.value = moe.w_out.value[0]
        dense_out.bias.value = moe.b_out.value[0]

        x = _x(d_model=d)
        got = jax.jit(lambda x: moe(x))(x)
        want = jax.jit(lambda x: dense_out(jax.nn.gelu(
            dense_in(x), approximate=False)))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_capacity_overflow_drops_to_zero(self):
        """Tokens beyond an expert's capacity contribute zero (they ride the
        residual path in a transformer block)."""
        d, ff, frames = 8, 16, 6
        nn.manual_seed(1)
        # One expert takes every token deterministically; capacity
        # ceil(0.34 * 6 / 1) = 3 < 6 forces overflow on frames 3..5.
        moe = nn.MoEFeedForward(d, ff, num_experts=1, capacity_factor=0.34)
        assert moe.capacity(frames) == 3
        x = _x(batch=2, frames=frames, d_model=d)
        y = jax.jit(lambda x: moe(x))(x)
        y = np.asarray(y)
        # First 3 frames per row processed, remaining 3 dropped (zeros).
        assert np.abs(y[:, :3]).min() > 0
        np.testing.assert_array_equal(y[:, 3:], 0)

    def test_padded_frames_excluded(self):
        """Padded frames route nowhere: zero output, and they must not
        consume capacity that valid frames need."""
        d, ff = 8, 16
        nn.manual_seed(2)
        moe = nn.MoEFeedForward(d, ff, num_experts=2, capacity_factor=2.0)
        x = _x(batch=2, frames=10, d_model=d)
        seq_len = jnp.asarray([4, 10], jnp.int32)
        y = np.asarray(jax.jit(lambda x, s: moe(x, seq_len=s))(x, seq_len))
        np.testing.assert_array_equal(y[0, 4:], 0)
        # Same prefix without padding present -> identical valid rows.
        y_trim = np.asarray(jax.jit(lambda x: moe(x))(x[:1, :4]))
        np.testing.assert_allclose(y[0, :4], y_trim[0], rtol=1e-5, atol=1e-6)

    def test_aux_loss_registered_only_in_training(self):
        d, ff = 8, 16
        nn.manual_seed(3)
        moe = nn.MoEFeedForward(d, ff, num_experts=4, aux_weight=0.1)
        x = _x(d_model=d)
        with nn.bind(moe, train=True):
            moe(x)
            aux = nn.collected_aux_loss()
            # Switch LB loss is ~aux_weight at balance, >= aux_weight always.
            assert float(aux) >= 0.1 * 0.999
        with nn.bind(moe, train=False):
            moe(x)
            assert nn.collected_aux_loss() == 0.0

    def test_router_receives_gradients_through_aux(self):
        d, ff = 8, 16
        nn.manual_seed(4)
        moe = nn.MoEFeedForward(d, ff, num_experts=2, aux_weight=0.1)
        x = _x(d_model=d)
        params = nn.parameters(moe)

        def loss_fn(p):
            with nn.bind(moe, p, train=True):
                y = moe(x)
                return jnp.mean(y ** 2) + nn.collected_aux_loss()

        grads = jax.jit(jax.grad(loss_fn))(params)
        assert float(jnp.abs(grads['router.weight']).max()) > 0
        assert float(jnp.abs(grads['w_in']).max()) > 0

    def test_expert_parallel_matches_unsharded(self):
        """Expert-sharded execution over the ('data', 'expert') mesh computes
        the same outputs as the unconstrained layer."""
        d, ff = 16, 32
        mesh = make_moe_mesh(4)
        assert mesh.shape['expert'] == 4
        nn.manual_seed(6)
        moe = nn.MoEFeedForward(d, ff, num_experts=4, capacity_factor=2.0)
        x = _x(batch=8, frames=12, d_model=d)
        ref = jax.jit(lambda x: moe(x))(x)
        moe._mesh = mesh
        got = jax.jit(lambda x: moe(x))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_expert_param_storage_sharding(self):
        """expert_param_shardings places each device's slice of the stacked
        (E, ...) expert weights — the per-device parameter memory actually
        scales as E / mesh.shape['expert'] — and the sharded layer still
        reproduces the replicated outputs."""
        from morgana_tpu.parallel.mesh import expert_param_shardings
        d, ff, E = 16, 32, 4
        mesh = make_moe_mesh(E)
        nn.manual_seed(9)
        moe = nn.MoEFeedForward(d, ff, num_experts=E, capacity_factor=2.0)
        x = _x(batch=8, frames=12, d_model=d)
        ref = np.asarray(jax.jit(lambda x: moe(x))(x))

        params = nn.parameters(moe)
        shardings = expert_param_shardings(params, mesh)
        stacked = {name for name, s in shardings.items() if 'expert' in s.spec}
        assert stacked == {'w_in', 'b_in', 'w_out', 'b_out'}
        assert 'expert' not in shardings['router.weight'].spec
        placed = {name: jax.device_put(value, shardings[name])
                  for name, value in params.items()}
        per_device = E // mesh.shape['expert']
        for name in stacked:
            assert placed[name].addressable_shards[0].data.shape[0] == per_device

        moe._mesh = mesh

        def apply(p, x):
            with nn.bind(moe, p):
                return moe(x)

        got = np.asarray(jax.jit(apply)(placed, x))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_moe_mesh_axis_guard(self):
        """An expert axis larger than the device count is a clear error, not
        a zero-device mesh that fails deep inside jax."""
        with pytest.raises(ValueError, match='expert'):
            make_moe_mesh(64, num_expert_axis=64)


class TestEncoderIntegration:
    def test_moe_every_placement(self):
        enc = nn.TransformerEncoder(4, 16, 2, 32,
                                    moe={'num_experts': 2}, moe_every=2)
        assert enc.blocks[0].moe is None
        assert enc.blocks[1].moe is not None
        assert enc.blocks[2].moe is None
        assert enc.blocks[3].moe is not None

    def test_moe_with_remat_matches_unrematted(self):
        """MoE aux losses registered inside jax.checkpoint'ed blocks must
        flow out as real outputs (a leaked inner-trace tracer crashes the
        step), and rematerialisation must not change loss or gradients."""
        nn.manual_seed(11)
        enc = nn.TransformerEncoder(2, 16, 2, 32,
                                    moe={'num_experts': 2}, moe_every=2)
        x = _x(d_model=16)
        seq_len = jnp.asarray([10, 10, 7, 5], jnp.int32)
        params = nn.parameters(enc)

        def loss_fn(p, remat):
            enc.remat = remat
            with nn.bind(enc, p, train=True):
                y = enc(x, seq_len=seq_len)
                return jnp.mean(y ** 2) + nn.collected_aux_loss()

        loss_plain, grads_plain = jax.jit(
            jax.value_and_grad(lambda p: loss_fn(p, False)))(params)
        loss_remat, grads_remat = jax.jit(
            jax.value_and_grad(lambda p: loss_fn(p, True)))(params)
        enc.remat = None
        np.testing.assert_allclose(float(loss_remat), float(loss_plain),
                                   rtol=1e-6)
        for name in grads_plain:
            np.testing.assert_allclose(
                np.asarray(grads_remat[name]), np.asarray(grads_plain[name]),
                rtol=1e-5, atol=1e-7, err_msg=name)

    def test_encoder_forward_and_grad(self):
        nn.manual_seed(7)
        enc = nn.TransformerEncoder(2, 16, 2, 32,
                                    moe={'num_experts': 2}, moe_every=2)
        x = _x(d_model=16)
        seq_len = jnp.asarray([10, 10, 7, 5], jnp.int32)
        params = nn.parameters(enc)

        def loss_fn(p):
            with nn.bind(enc, p, train=True):
                y = enc(x, seq_len=seq_len)
                return jnp.mean(y ** 2) + nn.collected_aux_loss()

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        assert np.isfinite(float(loss))
        name = 'blocks.items.1.moe.router.weight'
        assert name in grads and float(jnp.abs(grads[name]).max()) > 0


class TestModelIntegration:
    def test_transformer_model_moe_trains_one_step(self):
        from transformer_spss import TransformerAcousticModel
        from morgana_tpu.training import TrainLoop, build_optimizer
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

        nn.manual_seed(8)
        model = TransformerAcousticModel(num_layers=2, d_model=16,
                                         num_heads=2, d_ff=32, moe_experts=2)
        import __graft_entry__ as graft
        graft.install_unit_normalisers(model)
        model.mode = 'train'
        loop = TrainLoop(model, build_optimizer(), ema_decay=0., seed=0)
        batch = graft._make_batch(batch=2, frames=16)
        loss, _, _ = loop.train_step(batch, lr=1e-3)
        assert np.isfinite(float(loss))

    def test_transformer_model_moe_remat_trains_one_step(self):
        """The --remat + moe_experts combination (remat wraps each block in
        jax.checkpoint) must train — the aux loss crosses the checkpoint
        boundary as a real output, not a leaked tracer."""
        from transformer_spss import TransformerAcousticModel
        from morgana_tpu.training import TrainLoop, build_optimizer

        nn.manual_seed(12)
        model = TransformerAcousticModel(num_layers=2, d_model=16,
                                         num_heads=2, d_ff=32, moe_experts=2,
                                         remat=True)
        import __graft_entry__ as graft
        graft.install_unit_normalisers(model)
        model.mode = 'train'
        loop = TrainLoop(model, build_optimizer(), ema_decay=0., seed=0)
        batch = graft._make_batch(batch=2, frames=16)
        loss, _, _ = loop.train_step(batch, lr=1e-3)
        assert np.isfinite(float(loss))

    def test_moe_rejects_pipeline_combination(self):
        from transformer_spss import TransformerAcousticModel
        with pytest.raises(ValueError, match='pipeline'):
            TransformerAcousticModel(num_layers=2, d_model=16, num_heads=2,
                                     d_ff=32, moe_experts=2,
                                     pipeline_stages=2)

    def test_moe_streaming_rejected(self):
        from transformer_spss import TransformerAcousticModel
        model = TransformerAcousticModel(num_layers=2, d_model=16,
                                         num_heads=2, d_ff=32, moe_experts=2,
                                         causal=True)
        with pytest.raises(NotImplementedError, match='capacity'):
            model.stream_step(None, None)
