"""Metric accumulator tests: hand-computed values, masked counting semantics,
and the jit staging path (partials out of a jitted function, merged on host)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morgana_tpu import metrics


class TestMean:
    def test_unmasked(self, rng):
        m = metrics.Mean()
        x1 = rng.normal(size=(2, 3, 2)).astype(np.float32)
        x2 = rng.normal(size=(2, 3, 2)).astype(np.float32)
        m.accumulate(jnp.array(x1))
        m.accumulate(jnp.array(x2))
        expected = np.concatenate([x1.ravel(), x2.ravel()]).mean()
        assert abs(m.result() - expected) < 1e-6

    def test_masked_counts_frames(self, rng):
        # Reference semantics: masked count is in frames, not elements.
        m = metrics.Mean()
        x = np.ones((1, 4, 2), np.float32) * 2
        m.accumulate(jnp.array(x), jnp.array([2]))
        # sum = 2*2*2 = 8, count = 2 frames -> mean 4.
        assert abs(m.result() - 4.0) < 1e-6


class TestVarianceFamily:
    def test_variance(self, rng):
        v = metrics.Variance()
        x = rng.normal(size=(2, 5, 1)).astype(np.float32)
        v.accumulate(jnp.array(x))
        assert abs(v.result() - x.var()) < 1e-5

    def test_std(self, rng):
        s = metrics.StandardDeviation()
        x = rng.normal(size=(2, 5, 1)).astype(np.float32)
        s.accumulate(jnp.array(x))
        assert abs(s.result() - x.std()) < 1e-5


class TestErrorMetrics:
    def test_rmse(self, rng):
        m = metrics.RMSE()
        t = rng.normal(size=(2, 4, 1)).astype(np.float32)
        p = rng.normal(size=(2, 4, 1)).astype(np.float32)
        m.accumulate(jnp.array(t), jnp.array(p))
        assert abs(m.result() - np.sqrt(((t - p) ** 2).mean())) < 1e-6

    def test_accuracy_and_error(self):
        a, e = metrics.Accuracy(), metrics.Error()
        t = jnp.array([[[1], [1], [0], [1]]], dtype=jnp.float32)
        p = jnp.array([[[1], [0], [0], [1]]], dtype=jnp.float32)
        a.accumulate(t, p)
        e.accumulate(t, p)
        # Accuracy counts t AND p (reference semantics): 2/4.
        assert abs(a.result() - 50.0) < 1e-6
        # Error counts t XOR p: 1/4.
        assert abs(e.result() - 25.0) < 1e-6

    def test_mae(self, rng):
        m = metrics.MAE()
        t = rng.normal(size=(1, 4, 2)).astype(np.float32)
        p = rng.normal(size=(1, 4, 2)).astype(np.float32)
        m.accumulate(jnp.array(t), jnp.array(p))
        # Unmasked count is in elements (reference Mean.accumulate numel path).
        expected = np.abs(t - p).mean()
        assert abs(m.result() - expected) < 1e-5

    def test_mae_masked_counts_frames(self, rng):
        m = metrics.MAE()
        t = np.zeros((1, 4, 2), np.float32)
        p = np.ones((1, 4, 2), np.float32)
        m.accumulate(jnp.array(t), jnp.array(p), seq_len=jnp.array([2]))
        # Masked count is frames: sum(|diff|) = 4 over 2 valid frames.
        assert abs(m.result() - 2.0) < 1e-6


class TestSpeechMetrics:
    def test_f0_distortion_voiced_only(self):
        m = metrics.F0Distortion()
        t = jnp.array([[[100.], [200.], [300.]]])
        p = jnp.array([[[110.], [190.], [999.]]])
        voiced = jnp.array([[[1.], [1.], [0.]]])
        m.accumulate(t, p, voiced)
        assert abs(m.result() - 10.0) < 1e-4

    def test_lf0_distortion_is_hz(self):
        m = metrics.LF0Distortion()
        t = jnp.log(jnp.array([[[100.], [200.]]]))
        p = jnp.log(jnp.array([[[110.], [210.]]]))
        voiced = jnp.ones((1, 2, 1))
        m.accumulate(t, p, voiced)
        assert abs(m.result() - 10.0) < 1e-3

    def test_distortion_constant(self, rng):
        m = metrics.Distortion()
        t = rng.normal(size=(1, 3, 4)).astype(np.float32)
        p = rng.normal(size=(1, 3, 4)).astype(np.float32)
        m.accumulate(jnp.array(t), jnp.array(p))
        per_frame = np.sqrt(((t - p) ** 2).sum(-1))
        expected = per_frame.mean() * 10. / np.log(10.) * np.sqrt(2.)
        assert abs(m.result() - expected) < 1e-4

    def test_melcep_excludes_c0(self, rng):
        m = metrics.MelCepDistortion()
        t = rng.normal(size=(1, 3, 4)).astype(np.float32)
        p = t.copy()
        p[..., 0] += 100.  # only C0 differs -> zero distortion
        m.accumulate(jnp.array(t), jnp.array(p))
        assert m.result() < 1e-6


class TestHistory:
    def test_tensor_history_masked(self, rng):
        th = metrics.TensorHistory(feat_dim=2)
        x = rng.normal(size=(2, 4, 2)).astype(np.float32)
        th.accumulate(jnp.array(x), jnp.array([4, 1]))
        assert th.result().shape == (5, 2)

    def test_history_max_len(self):
        h = metrics.History(max_len=3)
        h.accumulate([1, 2, 3, 4])
        assert h.result() == [2, 3, 4]

    def test_print(self):
        p = metrics.Print()
        p.accumulate(jnp.array(5.0))
        assert float(p.result()) == 5.0


class TestHandler:
    def test_collections_and_json(self):
        h = metrics.Handler(loss=metrics.Mean())
        h.add_metrics('all', rmse=metrics.RMSE())
        h.accumulate('train', loss=jnp.ones((1, 2, 1)))
        d = h.results_as_json_dict('train')
        assert 'loss' in d and 'rmse' not in d  # rmse hidden until accumulated
        assert abs(d['loss'] - 1.0) < 1e-6

    def test_reset_state(self):
        h = metrics.Handler(loss=metrics.Mean())
        h.accumulate('train', loss=jnp.ones((1, 2, 1)))
        h.reset_state('train')
        assert h['train']['loss'].count == 0.

    def test_add_collection(self):
        h = metrics.Handler(loss=metrics.Mean())
        h.add_collection('extra', from_collections='all')
        assert 'loss' in h['extra']

    def test_kwargs_dict_unpacking(self, rng):
        h = metrics.Handler(m=metrics.Mean())
        x = jnp.ones((1, 4, 1))
        h.accumulate('train', m=(x, {'seq_len': jnp.array([2])}))
        assert abs(h['train']['m'].result() - 1.0) < 1e-6

    def test_staging_through_jit(self):
        h = metrics.Handler(loss=metrics.Mean(), rmse=metrics.RMSE())

        @jax.jit
        def step(x, y):
            h.begin_staging('train')
            h.accumulate('train', loss=x, rmse=(x, y))
            return h.drain_staged_values()

        x = jnp.ones((1, 2, 1)) * 3
        y = jnp.ones((1, 2, 1))
        staged = step(x, y)
        h.apply_staged(staged, tag='train')
        assert abs(h['train']['loss'].result() - 3.0) < 1e-6
        assert abs(h['train']['rmse'].result() - 2.0) < 1e-6

        # Second call (cache hit: python body does NOT rerun) still works.
        staged = step(x, y)
        h.apply_staged(staged, tag='train')
        assert abs(h['train']['loss'].result() - 3.0) < 1e-6

    def test_metric_instances_shared_across_collections(self):
        # Reference semantics: 'train'/'valid' collections hold the SAME
        # metric instances as 'all' (morgana/metrics.py:66-79); the builder
        # resets per mode before each epoch.
        h = metrics.Handler(loss=metrics.Mean())
        assert h['train']['loss'] is h['valid']['loss'] is h['all']['loss']

    def test_staging_tags_do_not_clobber(self):
        h = metrics.Handler(loss=metrics.Mean())
        h.add_metrics(('valid',), vloss=metrics.Mean())

        @jax.jit
        def train(x):
            h.begin_staging('train')
            h.accumulate('train', loss=x)
            return h.drain_staged_values()

        @jax.jit
        def valid(x):
            h.begin_staging('eval')
            h.accumulate('valid', vloss=x)
            return h.drain_staged_values()

        s1 = train(jnp.ones((1, 2, 1)))
        s2 = valid(jnp.ones((1, 2, 1)) * 7)   # traces AFTER train
        h.apply_staged(s1, tag='train')       # must still hit 'train' keys
        h.apply_staged(s2, tag='eval')
        assert abs(h['train']['loss'].result() - 1.0) < 1e-6
        assert abs(h['valid']['vloss'].result() - 7.0) < 1e-6


def test_std_near_constant_stays_real():
    """FP cancellation can drive the online variance a hair negative; the
    std must clamp at 0 instead of returning a COMPLEX number (which crashed
    printing and the metrics.json write)."""
    import jax.numpy as jnp
    m = metrics.StandardDeviation()
    m.reset_state()
    for _ in range(13):
        m.merge(m.partials(jnp.full((1, 7, 3), 0.1)))
    out = m.result()
    assert isinstance(out, float) and out >= 0.0


def test_apply_staged_length_mismatch_raises():
    """The legacy LIST form has no per-value identity: a truncated list
    would zip-mispair values into the wrong accumulators; the handler must
    reject the mismatch."""
    import jax.numpy as jnp
    handler = metrics.Handler()
    handler.add_metrics('train', a=metrics.Mean(), b=metrics.Mean())
    handler.begin_staging('t')
    handler.accumulate('train', a=(jnp.ones((1, 2, 1)),),
                       b=(jnp.ones((1, 2, 1)),))
    staged = handler.drain_staged_values()
    with pytest.raises(ValueError, match='staged-metric mismatch'):
        handler.apply_staged(list(staged.values())[:1], tag='t')


def test_staged_keys_travel_with_each_executable():
    """Two executables of one step can stage the same NUMBER of metrics but
    different keys (conditional accumulation on a static batch property);
    the dict form carries each value's identity, so neither executable can
    merge into the other's accumulators."""
    import jax
    import jax.numpy as jnp
    handler = metrics.Handler()
    handler.add_metrics('train', a=metrics.Mean(), b=metrics.Mean())

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def step(x, use_a):
        handler.begin_staging('train')
        if use_a:  # static python bool -> one executable per branch
            handler.accumulate('train', a=x)
        else:
            handler.accumulate('train', b=x)
        return handler.drain_staged_values()

    staged_a = step(jnp.full((1, 2, 1), 3.0), True)
    staged_b = step(jnp.full((1, 2, 1), 7.0), False)  # retraces; same length
    handler.apply_staged(staged_a, tag='train')
    handler.apply_staged(staged_b, tag='train')
    assert abs(handler['train']['a'].result() - 3.0) < 1e-6
    assert abs(handler['train']['b'].result() - 7.0) < 1e-6


def test_mean_accumulates_exactly_under_bf16_partials():
    """Running sums accumulate as exact host floats: carrying them in the
    partials' dtype would make bf16 counts saturate (ulp > batch frame
    count past ~2^15) and epoch means silently drift."""
    import jax.numpy as jnp
    m = metrics.Mean()
    m.reset_state()
    batch = jnp.full((1, 256, 1), 2.0, jnp.bfloat16)
    for _ in range(200):
        m.merge(m.partials(batch))
    assert m.count == 200 * 256  # bf16 accumulation stalls at 32768
    assert abs(m.result() - 2.0) < 1e-6


def test_history_merges_scalars_and_0d_arrays():
    import jax.numpy as jnp
    h = metrics.History()
    h.reset_state()
    h.merge(3.25)                      # python scalar
    h.merge(jnp.asarray(4.5))          # 0-d array (scalar staged via jit)
    h.merge(np.asarray([5.0, 6.0]))    # 1-d still extends
    assert h.result() == [3.25, 4.5, 5.0, 6.0]
