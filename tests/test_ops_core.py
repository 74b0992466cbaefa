"""Unit tests for the core sequence/masking kernels against reference semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morgana_tpu import ops
from morgana_tpu.ops import losses


class TestSequenceMask:
    def test_shape_and_values(self):
        mask = np.asarray(ops.sequence_mask(jnp.array([3, 1, 0]), max_len=4))
        assert mask.shape == (3, 4, 1)
        np.testing.assert_array_equal(mask[:, :, 0],
                                      [[1, 1, 1, 0], [1, 0, 0, 0], [0, 0, 0, 0]])

    def test_infers_max_len_eagerly(self):
        mask = np.asarray(ops.sequence_mask(jnp.array([2, 3])))
        assert mask.shape == (2, 3, 1)

    def test_requires_static_max_len_in_jit(self):
        @jax.jit
        def f(sl):
            return ops.sequence_mask(sl)

        with pytest.raises(ValueError, match='static'):
            f(jnp.array([2, 3]))

    def test_accepts_batch_column_lengths(self):
        mask = np.asarray(ops.sequence_mask(jnp.array([[2], [3]]), max_len=3))
        assert mask.shape == (2, 3, 1)


class TestBatchedMaskedSelect:
    def test_matches_manual_concat(self, rng):
        x = rng.normal(size=(3, 5, 2)).astype(np.float32)
        lens = np.array([5, 2, 0])
        out = ops.batched_masked_select(x, lens)
        expected = np.concatenate([x[0, :5], x[1, :2]], axis=0)
        np.testing.assert_allclose(out, expected)
        assert out.shape == (7, 2)


class TestBothVoiced:
    def test_product_of_nonzero(self):
        a = jnp.array([[1., 0., 2.]])
        b = jnp.array([[1., 1., 0.]])
        out = np.asarray(ops.both_voiced_mask(a, b))
        np.testing.assert_array_equal(out, [[1., 0., 0.]])


class TestUpsampleToRepetitions:
    def test_matches_np_repeat(self, rng):
        batch, max_seq, dim = 3, 6, 4
        x = rng.normal(size=(batch, max_seq, dim)).astype(np.float32)
        lens = np.array([6, 3, 4])
        reps = rng.integers(0, 4, size=(batch, max_seq, 1))
        for b in range(batch):
            reps[b, lens[b]:] = 0

        out = np.asarray(ops.upsample_to_repetitions(jnp.array(x), jnp.array(reps)))
        for b in range(batch):
            ref = np.repeat(x[b, :lens[b]], reps[b, :lens[b], 0], axis=0)
            np.testing.assert_allclose(out[b, :len(ref)], ref)
            np.testing.assert_allclose(out[b, len(ref):], 0.)

    def test_jit_with_static_max_len(self, rng):
        x = jnp.array(rng.normal(size=(2, 3, 2)).astype(np.float32))
        reps = jnp.array([[2, 1, 0], [1, 1, 1]])[..., None]

        @jax.jit
        def f(x, reps):
            return ops.upsample_to_repetitions(x, reps, max_len=5)

        out = np.asarray(f(x, reps))
        assert out.shape == (2, 5, 2)
        np.testing.assert_allclose(out[0, :3],
                                   np.repeat(np.asarray(x)[0, :2], [2, 1], axis=0))

    def test_gradients_flow(self, rng):
        x = jnp.array(rng.normal(size=(1, 3, 2)).astype(np.float32))
        reps = jnp.array([[2, 2, 1]])[..., None]

        def f(x):
            return jnp.sum(ops.upsample_to_repetitions(x, reps, max_len=5))

        g = np.asarray(jax.grad(f)(x))
        # Each item's gradient equals its repeat count.
        np.testing.assert_allclose(g[0, :, 0], [2., 2., 1.])


class TestSegments:
    def test_split_to_segments(self, rng):
        x = rng.normal(size=(2, 6, 3)).astype(np.float32)
        seg_lens = np.array([[2, 3, 0], [4, 1, 1]])
        out = np.asarray(ops.split_to_segments(jnp.array(x), jnp.array(seg_lens)))
        assert out.shape == (2, 3, 4, 3)
        np.testing.assert_allclose(out[0, 0, :2], x[0, :2])
        np.testing.assert_allclose(out[0, 1, :3], x[0, 2:5])
        np.testing.assert_allclose(out[0, 1, 3:], 0.)
        np.testing.assert_allclose(out[0, 2], 0.)
        np.testing.assert_allclose(out[1, 0, :4], x[1, :4])
        np.testing.assert_allclose(out[1, 2, 0], x[1, 5])

    def test_get_segment_ends(self, rng):
        x = rng.normal(size=(2, 6, 3)).astype(np.float32)
        seg_lens = np.array([[2, 3, 0], [4, 1, 1]])
        out = np.asarray(ops.get_segment_ends(jnp.array(x), jnp.array(seg_lens)))
        assert out.shape == (2, 3, 3)
        np.testing.assert_allclose(out[0, 0], x[0, 1])
        np.testing.assert_allclose(out[0, 1], x[0, 4])
        np.testing.assert_allclose(out[0, 2], 0.)
        np.testing.assert_allclose(out[1, 2], x[1, 5])


class TestLosses:
    def test_masked_mse_matches_manual(self, rng):
        p = rng.normal(size=(2, 4, 3)).astype(np.float32)
        t = rng.normal(size=(2, 4, 3)).astype(np.float32)
        seq_len = np.array([4, 2])

        mask = np.zeros((2, 4, 1), np.float32)
        mask[0, :4] = 1
        mask[1, :2] = 1
        el = (p - t) ** 2
        expected = ((el * mask).sum(1) / mask.sum(1)).mean()

        got = float(losses.mse(jnp.array(p), jnp.array(t), jnp.array(seq_len)))
        assert abs(got - expected) < 1e-6

    def test_unmasked_divides_by_max_len(self, rng):
        p = rng.normal(size=(2, 4, 3)).astype(np.float32)
        t = rng.normal(size=(2, 4, 3)).astype(np.float32)
        expected = ((p - t) ** 2).sum(1).mean() / 4
        got = float(losses.mse(jnp.array(p), jnp.array(t)))
        assert abs(got - expected) < 1e-6

    def test_bce_matches_formula(self, rng):
        logits = rng.normal(size=(2, 3, 1)).astype(np.float32)
        probs = 1 / (1 + np.exp(-logits))
        targets = (rng.random((2, 3, 1)) > 0.5).astype(np.float32)
        el = -(targets * np.log(probs) + (1 - targets) * np.log(1 - probs))
        expected = (el.sum(1) / 3).mean()
        got = float(losses.bce(jnp.array(probs), jnp.array(targets)))
        assert abs(got - expected) < 1e-5

    def test_ce_matches_log_softmax(self, rng):
        logits = rng.normal(size=(2, 3, 5)).astype(np.float32)
        labels = rng.integers(0, 5, size=(2, 3))
        ls = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        nll = -np.take_along_axis(ls, labels[..., None], axis=-1)
        expected = (nll.sum(1) / 3).mean()
        got = float(losses.ce(jnp.array(logits), jnp.array(labels)))
        assert abs(got - expected) < 1e-5

    def test_kld_standard_normal(self, rng):
        mean = rng.normal(size=(4, 8)).astype(np.float32)
        logvar = rng.normal(size=(4, 8)).astype(np.float32) * 0.1
        expected = np.mean(-0.5 * np.sum(1 + logvar - mean ** 2 - np.exp(logvar), axis=-1))
        got = float(losses.kld_standard_normal(jnp.array(mean), jnp.array(logvar)))
        assert abs(got - expected) < 1e-5

    def test_losses_jit_and_grad(self, rng):
        p = jnp.array(rng.normal(size=(2, 4, 3)).astype(np.float32))
        t = jnp.array(rng.normal(size=(2, 4, 3)).astype(np.float32))
        sl = jnp.array([4, 2])
        g = jax.grad(lambda p: losses.mse(p, t, sl))(p)
        assert np.isfinite(np.asarray(g)).all()
        # Padded frames get zero gradient.
        np.testing.assert_allclose(np.asarray(g)[1, 2:], 0.)


class TestDeltas:
    def test_numpy_jax_agree(self, rng):
        from morgana_tpu.ops.deltas import compute_deltas, compute_deltas_jax
        x = rng.normal(size=(10, 3)).astype(np.float32)
        d_np = compute_deltas(x)
        d_jax = np.asarray(compute_deltas_jax(jnp.array(x)[None]))[0]
        np.testing.assert_allclose(d_np, d_jax, atol=1e-6)
        assert d_np.shape == (10, 9)

    def test_delta_values(self):
        from morgana_tpu.ops.deltas import compute_deltas
        x = np.arange(5, dtype=np.float32)[:, None]
        d = compute_deltas(x)
        # static = x
        np.testing.assert_allclose(d[:, 0], x[:, 0])
        # delta of a line is 0.5*(x[t+1]-x[t-1]) = 1 in the interior.
        np.testing.assert_allclose(d[1:-1, 1], 1.0)
        # delta-delta of a line is 0 in the interior.
        np.testing.assert_allclose(d[1:-1, 2], 0.0, atol=1e-6)
