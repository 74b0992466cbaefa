"""Module-system tests: parameter traversal, state dicts, bind semantics,
dropout/RNG behaviour, EMA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morgana_tpu import nn


class TwoLayer(nn.Module):
    def __init__(self):
        self.fc1 = nn.Linear(4, 8)
        self.act = nn.Sigmoid()
        self.drop = nn.Dropout(0.5)
        self.fc2 = nn.Linear(8, 2)

    def forward(self, x):
        return self.fc2(self.drop(self.act(self.fc1(x))))


class TestParams:
    def test_named_parameters(self):
        nn.manual_seed(0)
        m = TwoLayer()
        names = set(dict(m.named_parameters()))
        assert names == {'fc1.weight', 'fc1.bias', 'fc2.weight', 'fc2.bias'}

    def test_state_dict_roundtrip(self):
        nn.manual_seed(0)
        m1 = TwoLayer()
        nn.manual_seed(99)
        m2 = TwoLayer()
        sd = nn.state_dict(m1)
        nn.load_state_dict(m2, sd)
        x = jnp.ones((2, 4))
        np.testing.assert_allclose(np.asarray(m1(x)), np.asarray(m2(x)), atol=1e-7)

    def test_strict_load_errors(self):
        nn.manual_seed(0)
        m = TwoLayer()
        with pytest.raises(KeyError):
            nn.load_state_dict(m, {'bogus': np.zeros(3)})

    def test_manual_seed_reproducible(self):
        nn.manual_seed(42)
        m1 = TwoLayer()
        nn.manual_seed(42)
        m2 = TwoLayer()
        np.testing.assert_array_equal(nn.state_dict(m1)['fc1.weight'],
                                      nn.state_dict(m2)['fc1.weight'])

    def test_torch_like_init_range(self):
        nn.manual_seed(0)
        lin = nn.Linear(100, 50)
        w = np.asarray(lin.weight.value)
        assert np.abs(w).max() <= 0.1 + 1e-6  # 1/sqrt(100)

    def test_container_held_params_are_traversed(self):
        """Bare Params inside list/dict attributes must be discovered —
        silently skipping them would leave weights untrained, unsaved and
        un-bound with no error."""
        class Containers(nn.Module):
            def __init__(self):
                self.scales = [nn.Param(jnp.ones(3)), nn.Param(jnp.zeros(3))]
                self.table = {'gain': nn.Param(jnp.full(2, 2.0))}

            def forward(self, x):
                return x * self.scales[0].value

        m = Containers()
        names = set(dict(m.named_parameters()))
        assert names == {'scales.0', 'scales.1', 'table.gain'}
        sd = nn.state_dict(m)
        assert set(sd) == names

    def test_dropout_probability_validated(self):
        with pytest.raises(ValueError, match='0, 1'):
            nn.Dropout(p=1.5)
        with pytest.raises(ValueError, match='0, 1'):
            nn.Dropout(p=-0.1)

    def test_attention_window_requires_causal(self):
        nn.manual_seed(0)
        mha = nn.MultiHeadAttention(8, 2)
        x = jnp.ones((1, 4, 8))
        with pytest.raises(ValueError, match='causal'):
            mha(x, window=2)

    def test_sequential_does_not_mutate_caller_hiddens(self):
        """A streaming client keeping the previous chunk's state for
        retry/rollback must not find it overwritten in place."""
        nn.manual_seed(1)
        model = nn.SequentialWithRecurrent(
            nn.Linear(3, 4), nn.Recurrent('gru', 4, 4))
        x = jnp.ones((1, 2, 3))
        prev = [None] * 2
        _, new = model(x, hiddens=list(prev), seq_len=jnp.asarray([2]),
                       return_hiddens=True)
        before = [None] * 2
        _, after = model(x, hiddens=before, seq_len=jnp.asarray([2]),
                         return_hiddens=True)
        assert after is not before
        assert before == [None, None]  # caller's list untouched
        np.testing.assert_allclose(np.asarray(after[1]), np.asarray(new[1]))


class TestBind:
    def test_bind_installs_and_restores(self):
        nn.manual_seed(0)
        m = TwoLayer()
        orig = nn.parameters(m)
        zeros = {k: jnp.zeros_like(v) for k, v in orig.items()}
        x = jnp.ones((1, 4))
        with nn.bind(m, zeros):
            out = m(x)
        np.testing.assert_allclose(np.asarray(out), 0.)
        # Restored after exit.
        np.testing.assert_allclose(np.asarray(m(x)), np.asarray(
            m.fc2(m.act(m.fc1(x)))), atol=1e-7)

    def test_bind_unknown_param_leaves_module_intact(self):
        """An unknown name must error BEFORE any install: a mid-install
        KeyError used to leave the module half-overwritten (and the saved
        values unrestored)."""
        nn.manual_seed(0)
        m = TwoLayer()
        before = {k: np.asarray(v) for k, v in nn.parameters(m).items()}
        bad = {'fc1.weight': jnp.zeros_like(nn.parameters(m)['fc1.weight']),
               'oops': jnp.zeros(())}
        with pytest.raises(KeyError, match='oops'):
            with nn.bind(m, bad):
                pass
        for k, v in nn.parameters(m).items():
            np.testing.assert_array_equal(np.asarray(v), before[k])

    def test_grad_through_bind(self):
        nn.manual_seed(0)
        m = TwoLayer()
        params = nn.parameters(m)
        x = jnp.ones((2, 4))

        def loss_fn(p):
            with nn.bind(m, p):
                return jnp.sum(m(x) ** 2)

        grads = jax.grad(loss_fn)(params)
        assert set(grads) == set(params)
        assert all(np.isfinite(np.asarray(g)).all() for g in grads.values())
        assert float(jnp.abs(grads['fc1.weight']).sum()) > 0


class TestDropoutRng:
    def test_dropout_off_outside_training(self):
        nn.manual_seed(0)
        m = TwoLayer()
        x = jnp.ones((2, 4))
        out1 = m(x)
        out2 = m(x)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_dropout_on_in_training(self):
        nn.manual_seed(0)
        drop = nn.Dropout(0.5)
        x = jnp.ones((4, 100))
        with nn.bind(drop, rng=jax.random.PRNGKey(0), train=True):
            out = np.asarray(drop(x))
        assert (out == 0).sum() > 100  # roughly half dropped
        assert np.allclose(out[out != 0], 2.0)  # inverted scaling

    def test_rng_deterministic_per_key(self):
        drop = nn.Dropout(0.5)
        x = jnp.ones((4, 100))
        with nn.bind(drop, rng=jax.random.PRNGKey(7), train=True):
            a = np.asarray(drop(x))
        with nn.bind(drop, rng=jax.random.PRNGKey(7), train=True):
            b = np.asarray(drop(x))
        np.testing.assert_array_equal(a, b)

    def test_next_rng_requires_context(self):
        with pytest.raises(RuntimeError, match='No RNG bound'):
            nn.next_rng()


class TestEMA:
    def test_ema_update_formula(self):
        shadow = {'w': jnp.ones((2,)) * 2.0}
        current = {'w': jnp.zeros((2,))}
        out = nn.ema_update(shadow, current, decay=0.9)
        np.testing.assert_allclose(np.asarray(out['w']), 1.8)

    def test_ema_object_api(self):
        nn.manual_seed(0)
        m1 = TwoLayer()
        nn.manual_seed(0)
        m2 = TwoLayer()  # identical start
        ema = nn.ExponentialMovingAverage(m2, decay=0.5)
        # Perturb m1 and update.
        nn.load_parameters(m1, {k: v + 1.0 for k, v in nn.parameters(m1).items()})
        ema.update_params(m1)
        w_ema = nn.parameters(m2)['fc1.weight']
        w_m1 = nn.parameters(m1)['fc1.weight']
        np.testing.assert_allclose(np.asarray(w_ema), np.asarray(w_m1) - 0.5, atol=1e-6)


class TestComputeOptions:
    def test_pallas_fallback_ignores_bf16_default(self, rng):
        """Off-TPU the pallas backend demotes to the 'numerically
        equivalent' scan path; the kernels are f32-only, so the fallback
        must not inherit a global bf16 compute default — it must match the
        f32 scan exactly."""
        import jax.numpy as jnp
        nn.manual_seed(3)
        r_pallas = nn.Recurrent('lstm', 4, 4, backend='pallas')
        nn.manual_seed(3)
        r_scan = nn.Recurrent('lstm', 4, 4)
        x = jnp.array(rng.normal(size=(2, 6, 4)).astype(np.float32))
        seq_len = jnp.asarray([6, 4])
        nn.set_default_compute_dtype('bfloat16')
        try:
            y_pallas, _ = r_pallas(x, seq_len=seq_len)
        finally:
            nn.set_default_compute_dtype(None)
        y_scan, _ = r_scan(x, seq_len=seq_len)
        np.testing.assert_array_equal(np.asarray(y_pallas),
                                      np.asarray(y_scan))

    def test_bf16_compute_close_to_f32(self, rng):
        import jax.numpy as jnp
        nn.manual_seed(3)
        rec = nn.Recurrent('lstm', 8, 16)
        x = jnp.array(rng.normal(size=(2, 10, 8)).astype(np.float32))
        y32, _ = rec(x)
        rec.compute_dtype = jnp.bfloat16
        y16, _ = rec(x)
        assert y16.dtype == jnp.float32  # state/accumulation stay f32
        np.testing.assert_allclose(np.asarray(y16), np.asarray(y32), atol=2e-2)

    def test_global_compute_dtype_toggle(self):
        import jax.numpy as jnp
        nn.set_default_compute_dtype('bfloat16')
        assert nn.default_compute_dtype() == jnp.bfloat16
        nn.set_default_compute_dtype('float32')
        assert nn.default_compute_dtype() is None

    def test_bf16_applies_to_bidirectional(self, rng):
        """compute_dtype must reach BOTH directions of a bidirectional layer
        (regression: it was silently dropped, leaving f32 matmuls)."""
        import jax.numpy as jnp
        nn.manual_seed(11)
        rec = nn.Recurrent('gru', 6, 8, bidirectional=True)
        x = jnp.array(rng.normal(size=(2, 12, 6)).astype(np.float32))
        y32, _ = rec(x)
        rec.compute_dtype = jnp.bfloat16
        y16, _ = rec(x)
        assert np.abs(np.asarray(y16) - np.asarray(y32)).max() > 0  # applied
        np.testing.assert_allclose(np.asarray(y16), np.asarray(y32), atol=2e-2)

    def test_unroll_is_exact(self, rng):
        """Scan unroll amortises loop overhead on TPU (bench uses 64); it
        must not change outputs, final states or gradients — even when the
        unroll factor exceeds the sequence length or leaves a remainder.
        (Equality is up to XLA fusion/reassociation order, ~1e-7.)"""
        import jax.numpy as jnp
        x = jnp.array(rng.normal(size=(2, 11, 6)).astype(np.float32))
        sl = jnp.array([11, 7])
        outs = []
        for unroll in (1, 8, 64):
            nn.manual_seed(7)
            rec = nn.Recurrent('lstm', 6, 12, unroll=unroll)
            y, state = rec(x, seq_len=sl)
            g = jax.grad(lambda x: jnp.sum(rec(x, seq_len=sl)[0] ** 2))(x)
            outs.append((np.asarray(y), np.asarray(state[0]), np.asarray(g)))
        for y, h, g in outs[1:]:
            np.testing.assert_allclose(y, outs[0][0], atol=1e-6)
            np.testing.assert_allclose(h, outs[0][1], atol=1e-6)
            np.testing.assert_allclose(g, outs[0][2], atol=1e-5)

    def test_remat_grads_match(self, rng):
        import jax.numpy as jnp
        nn.manual_seed(4)
        base = nn.Recurrent('gru', 6, 12)
        nn.manual_seed(4)
        rm = nn.Recurrent('gru', 6, 12, remat=True)
        x = jnp.array(rng.normal(size=(2, 9, 6)).astype(np.float32))
        sl = jnp.array([9, 5])
        g1 = jax.grad(lambda x: jnp.sum(base(x, seq_len=sl)[0] ** 2))(x)
        g2 = jax.grad(lambda x: jnp.sum(rm(x, seq_len=sl)[0] ** 2))(x)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)


class TestLayerNormEmbedding:
    def test_layernorm_matches_torch(self, rng):
        import torch
        x = rng.normal(size=(2, 5, 8)).astype(np.float32)
        t_ln = torch.nn.LayerNorm(8)
        with torch.no_grad():
            t_ln.weight.copy_(torch.arange(8, dtype=torch.float32) * 0.1 + 1)
            t_ln.bias.copy_(torch.ones(8) * 0.3)
            y_ref = t_ln(torch.tensor(x)).numpy()
        ln = nn.LayerNorm(8)
        ln.weight.value = jnp.arange(8, dtype=jnp.float32) * 0.1 + 1
        ln.bias.value = jnp.ones(8) * 0.3
        np.testing.assert_allclose(np.asarray(ln(jnp.array(x))), y_ref, atol=1e-5)

    def test_embedding_lookup(self):
        nn.manual_seed(0)
        emb = nn.Embedding(10, 4)
        out = emb(jnp.array([[1, 3], [0, 9]]))
        assert out.shape == (2, 2, 4)
        np.testing.assert_array_equal(np.asarray(out[0, 0]),
                                      np.asarray(emb.weight.value[1]))
