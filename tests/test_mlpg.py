"""MLPG tests: the on-device banded Cholesky kernel against the exact float64
host solve, plus the reference API behaviours (global variance broadcast,
unbatched input, padding burn-in, seq_len masking)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morgana_tpu.ops.deltas import DEFAULT_WINDOWS, compute_deltas
from morgana_tpu.viz.synthesis import MLPG, mlpg_numpy, _mlpg_dense


def _random_problem(rng, batch=2, time=40, dim=3):
    means = rng.normal(size=(batch, time, 3 * dim)).astype(np.float32)
    variances = (0.5 + rng.random((3 * dim,))).astype(np.float32)
    return means, variances


class TestKernelVsExact:
    def test_banded_numpy_matches_dense_oracle(self, rng):
        """The fast banded host construction equals the literal dense
        window-matrix formulation."""
        means, variances = _random_problem(rng, batch=2, time=25, dim=2)
        seq_len = [25, 14]
        ref = _mlpg_dense(means, variances, DEFAULT_WINDOWS, 5, seq_len)
        got = mlpg_numpy(means, variances, DEFAULT_WINDOWS, 5, seq_len)
        np.testing.assert_allclose(got, ref, atol=1e-9)

    def test_exact_length(self, rng):
        means, variances = _random_problem(rng)
        ref = mlpg_numpy(means, variances)
        got = MLPG(means, variances)
        np.testing.assert_allclose(got, ref, atol=5e-5)

    def test_variable_length_with_padding(self, rng):
        means, variances = _random_problem(rng, batch=3, time=50)
        seq_len = np.array([50, 30, 17])
        ref = mlpg_numpy(means, variances, padding_size=100, seq_len=seq_len)
        got = MLPG(means, variances, padding_size=100, seq_len=seq_len)
        np.testing.assert_allclose(got, ref, atol=5e-5)
        # Out-of-sequence frames are zero.
        np.testing.assert_allclose(got[1, 30:], 0.)
        np.testing.assert_allclose(got[2, 17:], 0.)

    @pytest.mark.parametrize('pad', [0, 2, 10])
    def test_short_sequence_tails_exact(self, rng, pad):
        """Shorter-than-buffer sequences must match the reference's
        crop-to-length solve at their TAILS: the buffer slots beyond
        seq_len + pad carry no precision (regression: they used to keep
        full-precision replicas of the last frame, dragging the final
        ~bandwidth valid frames by O(0.1-1) absolute error)."""
        means, variances = _random_problem(rng, batch=2, time=40)
        seq_len = np.array([40, 20])
        ref = mlpg_numpy(means, variances, padding_size=pad, seq_len=seq_len)
        got = MLPG(means, variances, padding_size=pad, seq_len=seq_len)
        np.testing.assert_allclose(got[1, :20], ref[1, :20], atol=5e-5)
        np.testing.assert_allclose(got[0], ref[0], atol=5e-5)

    def test_unknown_backend_raises(self, rng):
        means, variances = _random_problem(rng)
        with pytest.raises(ValueError, match='backend'):
            MLPG(means, variances, backend='np')

    def test_per_frame_variances(self, rng):
        means, _ = _random_problem(rng, batch=2, time=20, dim=2)
        variances = (0.5 + rng.random(means.shape)).astype(np.float32)
        ref = mlpg_numpy(means, variances)
        got = MLPG(means, variances)
        np.testing.assert_allclose(got, ref, atol=5e-5)


class TestReferenceAPI:
    def test_unbatched_input(self, rng):
        means, variances = _random_problem(rng, batch=1)
        got = MLPG(means[0], variances)
        assert got.shape == (means.shape[1], 3)

    def test_jnp_in_jnp_out(self, rng):
        means, variances = _random_problem(rng)
        got = MLPG(jnp.array(means), variances)
        assert isinstance(got, jax.Array)

    def test_inside_jit(self, rng):
        means, variances = _random_problem(rng)

        @jax.jit
        def f(m):
            return MLPG(m, variances, padding_size=10, seq_len=jnp.array([40, 25]))

        out = np.asarray(f(jnp.array(means)))
        ref = mlpg_numpy(means, variances, padding_size=10, seq_len=[40, 25])
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_recovers_smooth_trajectory(self, rng):
        """MLPG on deltas of a smooth signal should reconstruct the signal:
        with consistent (static, delta, delta2) means and tight variances, the
        solution equals the static track."""
        t = np.linspace(0, 4 * np.pi, 80)
        signal = np.sin(t).astype(np.float32)[:, None]
        deltas = compute_deltas(signal)  # (T, 3)
        variances = np.full((3,), 0.01, np.float32)
        out = MLPG(deltas[None], variances)
        np.testing.assert_allclose(out[0, 5:-5, 0], signal[5:-5, 0], atol=1e-2)

    def test_numpy_backend_matches(self, rng):
        means, variances = _random_problem(rng)
        a = MLPG(means, variances, backend='numpy')
        b = MLPG(means, variances, backend='jax')
        np.testing.assert_allclose(a, b, atol=5e-5)


class TestFusedStreams:
    def test_streams_match_separate_calls(self, rng):
        from morgana_tpu.viz.synthesis import MLPG_streams
        streams = {
            'lf0': (rng.normal(size=(2, 30, 3)).astype(np.float32),
                    (0.5 + rng.random(3)).astype(np.float32)),
            'mcep': (rng.normal(size=(2, 30, 12)).astype(np.float32),
                     (0.5 + rng.random(12)).astype(np.float32)),
        }
        seq_len = np.array([30, 22])
        fused = MLPG_streams(streams, padding_size=10, seq_len=seq_len)
        for name, (means, variances) in streams.items():
            separate = MLPG(means, variances, padding_size=10, seq_len=seq_len)
            np.testing.assert_allclose(np.asarray(fused[name]),
                                       np.asarray(separate), atol=1e-5)


class TestAPIEdges:
    def test_numpy_backend_accepts_scalar_seq_len(self, rng):
        """Both backends accept a scalar/0-d seq_len for unbatched input —
        the numpy path used to crash indexing a 0-d array."""
        from morgana_tpu.viz.synthesis import MLPG
        means = rng.normal(size=(20, 3)).astype(np.float32)
        var = np.abs(rng.normal(size=(3,))).astype(np.float32) + 0.5
        got_np = MLPG(means, var, seq_len=16, backend='numpy')
        got_jax = MLPG(means, var, seq_len=16, backend='jax')
        np.testing.assert_allclose(np.asarray(got_jax)[:16], got_np[:16],
                                   atol=2e-4)

    def test_streams_empty_dict(self):
        from morgana_tpu.viz.synthesis import MLPG_streams
        assert MLPG_streams({}) == {}


class TestGeneralBandwidth:
    def test_bandwidth_three_windows(self, rng):
        """The banded solver generalises beyond the default bandwidth-2
        windows: a 4-window set with extents up to (2,1) (bandwidth 3)."""
        windows = (
            (0, 0, (1.0,)),
            (1, 1, (-0.5, 0.0, 0.5)),
            (1, 1, (1.0, -2.0, 1.0)),
            (2, 1, (0.25, -0.5, 0.0, 0.25)),
        )
        batch, time, dim = 2, 20, 2
        means = rng.normal(size=(batch, time, 4 * dim)).astype(np.float32)
        variances = (0.5 + rng.random(4 * dim)).astype(np.float32)

        # Exact-length: the solver itself is exact at any bandwidth.
        ref = _mlpg_dense(means, variances, windows)
        got = MLPG(means, variances, windows=windows)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

        # Variable length needs burn-in padding proportional to the bandwidth
        # (the static-shape formulation replicates edge frames past seq_len;
        # the models use padding_size=100).
        seq_len = [20, 13]
        ref2 = _mlpg_dense(means, variances, windows, padding_size=30, seq_len=seq_len)
        got2 = MLPG(means, variances, windows=windows, padding_size=30,
                    seq_len=np.array(seq_len))
        np.testing.assert_allclose(np.asarray(got2), ref2, atol=1e-5)

    def test_static_only_window(self, rng):
        """Bandwidth 0 (static window only): MLPG reduces to the means."""
        windows = ((0, 0, (1.0,)),)
        means = rng.normal(size=(1, 10, 2)).astype(np.float32)
        variances = np.ones(2, np.float32)
        got = MLPG(means, variances, windows=windows)
        np.testing.assert_allclose(np.asarray(got), means, atol=1e-5)


class TestBandedSolverFuzz:
    @pytest.mark.parametrize('bandwidth', [1, 2, 3, 4])
    def test_random_spd_banded_systems(self, bandwidth, rng):
        """The scan-based banded Cholesky matches scipy on random SPD banded
        systems across bandwidths."""
        from scipy.linalg import solveh_banded
        from morgana_tpu.ops.mlpg import _banded_cholesky_solve
        T = 40
        # Build a random SPD banded matrix: A = B^T B + diag boost with B banded.
        dense = np.zeros((T, T))
        for off in range(bandwidth + 1):
            vals = rng.normal(size=T - off) * (0.5 ** off)
            dense += np.diag(vals, off)
        spd = dense.T @ dense + np.eye(T) * (bandwidth + 1.0)
        # Upper-banded storage (T, bw+1): p_band[i, m] = A[i, i+m].
        p_band = np.zeros((T, bandwidth + 1), np.float32)
        for m in range(bandwidth + 1):
            p_band[:T - m, m] = np.diag(spd, m)
        b = rng.normal(size=T).astype(np.float32)

        ab = np.zeros((bandwidth + 1, T))
        for m in range(bandwidth + 1):
            ab[bandwidth - m, m:] = np.diag(spd, m)
        x_ref = solveh_banded(ab, b.astype(np.float64))

        x = np.asarray(_banded_cholesky_solve(
            jnp.array(b), jnp.array(p_band), bandwidth))
        np.testing.assert_allclose(x, x_ref, atol=5e-4)


class TestUpsampleFuzz:
    def test_random_shapes_match_np_repeat(self, rng):
        import jax
        from morgana_tpu.ops.sequence import upsample_to_repetitions
        for _ in range(20):
            batch = int(rng.integers(1, 5))
            max_seq = int(rng.integers(1, 12))
            dim = int(rng.integers(1, 6))
            x = rng.normal(size=(batch, max_seq, dim)).astype(np.float32)
            reps = rng.integers(0, 5, size=(batch, max_seq, 1))
            out = np.asarray(upsample_to_repetitions(jnp.array(x), jnp.array(reps)))
            for b in range(batch):
                ref = np.repeat(x[b], reps[b, :, 0], axis=0)
                np.testing.assert_allclose(out[b, :len(ref)], ref)
                np.testing.assert_allclose(out[b, len(ref):], 0.)

    def test_all_zero_repeats(self):
        from morgana_tpu.ops.sequence import upsample_to_repetitions
        x = jnp.ones((2, 3, 2))
        out = upsample_to_repetitions(x, jnp.zeros((2, 3, 1), jnp.int32), max_len=4)
        np.testing.assert_allclose(np.asarray(out), 0.)
