"""Pipeline parallelism: GPipe-style stage pipelining of the transformer
encoder (`parallel/pipeline.py`) — forward/gradient parity vs the sequential
encoder, dp x pp composition, divisibility guards. Runs on the 8-virtual-
device CPU mesh (conftest)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morgana_tpu import nn
from morgana_tpu.parallel import pipeline as pp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'models'))


def _encoders(num_layers=4, d_model=32, num_heads=2, d_ff=64, seed=7,
              causal=False, window=None, **pp_kwargs):
    nn.manual_seed(seed)
    seq = nn.TransformerEncoder(num_layers, d_model, num_heads, d_ff,
                                causal=causal, window=window)
    nn.manual_seed(seed)
    piped = pp.PipelinedTransformerEncoder(
        num_layers, d_model, num_heads, d_ff, causal=causal, window=window,
        **pp_kwargs)
    # Same init RNG consumption -> identical parameters.
    for (n1, p1), (n2, p2) in zip(seq.named_parameters(),
                                  piped.named_parameters()):
        assert n1 == n2
        np.testing.assert_array_equal(p1.value, p2.value)
    return seq, piped


def _batch(batch=8, frames=12, d_model=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(batch, frames, d_model)).astype(np.float32))
    seq_len = jnp.asarray(rng.integers(4, frames + 1, size=(batch,)), jnp.int32)
    return x, seq_len


class TestPipelineParity:
    def test_forward_matches_sequential(self):
        mesh = pp.make_pipeline_mesh(4)
        seq, piped = _encoders(mesh=mesh, num_stages=4, num_microbatches=4)
        x, seq_len = _batch()
        ref = jax.jit(lambda x, s: seq(x, seq_len=s))(x, seq_len)
        out = jax.jit(lambda x, s: piped(x, seq_len=s))(x, seq_len)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # Valid frames only need matching; but padded frames should match
        # too (same math on garbage) — the assert above covers all.

    def test_forward_matches_with_dp_axis(self):
        mesh = pp.make_pipeline_mesh(4, num_data=2)
        assert dict(mesh.shape) == {'data': 2, 'stage': 4}
        seq, piped = _encoders(mesh=mesh, num_stages=4, num_microbatches=2)
        x, seq_len = _batch()
        ref = jax.jit(lambda x, s: seq(x, seq_len=s))(x, seq_len)
        out = jax.jit(lambda x, s: piped(x, seq_len=s))(x, seq_len)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_causal_windowed_matches(self):
        mesh = pp.make_pipeline_mesh(2)
        seq, piped = _encoders(num_layers=2, causal=True, window=6,
                               mesh=mesh, num_stages=2, num_microbatches=4)
        x, seq_len = _batch()
        ref = jax.jit(lambda x, s: seq(x, seq_len=s))(x, seq_len)
        out = jax.jit(lambda x, s: piped(x, seq_len=s))(x, seq_len)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match_sequential(self):
        """The transposed pipeline (reverse ppermute scan) must produce the
        same parameter gradients as sequential backprop."""
        mesh = pp.make_pipeline_mesh(4, num_data=2)
        seq, piped = _encoders(mesh=mesh, num_stages=4, num_microbatches=2)
        x, seq_len = _batch()
        target = jnp.ones_like(x)

        def loss_for(model):
            def fn(params):
                with nn.bind(model, params):
                    y = model(x, seq_len=seq_len)
                return jnp.mean((y - target) ** 2)
            return fn

        params_seq = {n: p.value for n, p in seq.named_parameters()}
        params_pp = {n: p.value for n, p in piped.named_parameters()}
        loss_ref, grads_ref = jax.jit(
            jax.value_and_grad(loss_for(seq)))(params_seq)
        loss_pp, grads_pp = jax.jit(
            jax.value_and_grad(loss_for(piped)))(params_pp)

        np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-6)
        assert set(grads_pp) == set(grads_ref)
        for name in grads_ref:
            np.testing.assert_allclose(
                np.asarray(grads_pp[name]), np.asarray(grads_ref[name]),
                rtol=5e-4, atol=1e-6, err_msg=name)

    def test_microbatch_count_rounds_to_divisor(self):
        mesh = pp.make_pipeline_mesh(2, num_data=1)
        _, piped = _encoders(num_layers=2, mesh=mesh, num_stages=2,
                             num_microbatches=8)
        x, seq_len = _batch(batch=6)  # 8 does not divide 6 -> rounds to 6
        out = jax.jit(lambda x, s: piped(x, seq_len=s))(x, seq_len)
        assert out.shape == x.shape

    def test_round_microbatches_picks_largest_divisor(self):
        """The LARGEST divisor <= requested (gcd(8, 6) = 2 would inflate
        the GPipe bubble: 2 in-flight microbatches instead of 6)."""
        assert pp.round_microbatches(8, 6) == 6
        assert pp.round_microbatches(8, 8) == 8
        assert pp.round_microbatches(4, 6) == 3
        assert pp.round_microbatches(8, 7) == 7
        assert pp.round_microbatches(3, 7) == 1
        assert pp.round_microbatches(8, 12) == 6
        assert pp.round_microbatches(1, 5) == 1

    def test_stage_axis_guard(self):
        with pytest.raises(ValueError, match='stage'):
            pp.make_pipeline_mesh(1000)

    def test_odd_layer_count_rejected(self):
        with pytest.raises(ValueError, match='divide'):
            pp.PipelinedTransformerEncoder(3, 32, 2, 64, num_stages=2)

    def test_dropout_rejected(self):
        with pytest.raises(ValueError, match='dropout'):
            pp.PipelinedTransformerEncoder(2, 32, 2, 64, dropout=0.1,
                                           num_stages=2)


class TestPipelineTraining:
    def test_two_train_steps_match_sequential(self):
        """A realistic training check: two SGD steps through the pipelined
        encoder equal two through the sequential one."""
        mesh = pp.make_pipeline_mesh(4)
        seq, piped = _encoders(num_layers=4, mesh=mesh, num_stages=4,
                               num_microbatches=4)
        x, seq_len = _batch()
        target = jnp.zeros_like(x)

        def make_step(model):
            def loss_fn(params):
                with nn.bind(model, params):
                    y = model(x, seq_len=seq_len)
                return jnp.mean((y - target) ** 2)

            @jax.jit
            def step(params):
                loss, grads = jax.value_and_grad(loss_fn)(params)
                return loss, jax.tree_util.tree_map(
                    lambda p, g: p - 0.1 * g, params, grads)
            return step

        p_ref = {n: p.value for n, p in seq.named_parameters()}
        p_pp = dict(p_ref)
        step_ref, step_pp = make_step(seq), make_step(piped)
        for _ in range(2):
            loss_ref, p_ref = step_ref(p_ref)
            loss_pp, p_pp = step_pp(p_pp)
            np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                                       rtol=1e-5)
        for name in p_ref:
            np.testing.assert_allclose(np.asarray(p_pp[name]),
                                       np.asarray(p_ref[name]),
                                       rtol=1e-4, atol=1e-6, err_msg=name)


class TestModelIntegration:
    def test_transformer_model_pipeline_kwarg_matches_sequential(self):
        """model_kwargs {'pipeline_stages': 4}: identical checkpoints, same
        network output through the full SequentialWithRecurrent stack."""
        from transformer_spss import TransformerAcousticModel

        kwargs = dict(num_layers=4, d_model=32, num_heads=2, d_ff=64)
        nn.manual_seed(11)
        base = TransformerAcousticModel(**kwargs)
        nn.manual_seed(11)
        piped = TransformerAcousticModel(pipeline_stages=4,
                                         pipeline_microbatches=4, **kwargs)
        sd_base = nn.state_dict(base)
        sd_pp = nn.state_dict(piped)
        assert set(sd_base) == set(sd_pp)
        for key in sd_base:
            np.testing.assert_array_equal(sd_base[key], sd_pp[key])

        x, seq_len = _batch(batch=8, frames=10, d_model=609, seed=3)
        ref = jax.jit(lambda x, s: base.layers(x, seq_len=s))(x, seq_len)
        out = jax.jit(lambda x, s: piped.layers(x, seq_len=s))(x, seq_len)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_pipeline_rejects_dropout_config(self):
        from transformer_spss import TransformerAcousticModel
        with pytest.raises(ValueError, match='dropout'):
            TransformerAcousticModel(num_layers=4, d_model=32, num_heads=2,
                                     d_ff=64, dropout_prob=0.1,
                                     pipeline_stages=2)
