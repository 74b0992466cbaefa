"""Fused Pallas LSTM layer: forward and VJP parity vs the scan path
(interpret mode on CPU; the compiled path is exercised on TPU by bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morgana_tpu.ops import rnn as rnn_ops
from morgana_tpu.ops.pallas_rnn import lstm_layer, _pick_chunk


def _weights(rng, in_dim, hidden):
    return (jnp.array(rng.normal(size=(in_dim, 4 * hidden)).astype(np.float32)) * 0.1,
            jnp.array(rng.normal(size=(hidden, 4 * hidden)).astype(np.float32)) * 0.1,
            jnp.array(rng.normal(size=(4 * hidden,)).astype(np.float32)) * 0.1,
            jnp.array(rng.normal(size=(4 * hidden,)).astype(np.float32)) * 0.1)


class TestPallasLSTM:
    def test_forward_matches_scan(self, rng):
        B, T, I, H = 4, 32, 8, 128
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        w_ih, w_hh, b_ih, b_hh = _weights(rng, I, H)

        y_ref, (h_ref, c_ref) = rnn_ops.lstm(x, w_ih, w_hh, b_ih, b_hh)
        y_pl, (h_pl, c_pl) = lstm_layer(x, w_ih, w_hh, b_ih, b_hh, interpret=True)

        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref), atol=1e-5)

    def test_vjp_matches_scan(self, rng):
        B, T, I, H = 4, 32, 8, 128
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        w_ih, w_hh, b_ih, b_hh = _weights(rng, I, H)

        def loss_scan(w_ih, w_hh, b_ih, b_hh, x):
            y, (h, c) = rnn_ops.lstm(x, w_ih, w_hh, b_ih, b_hh)
            return jnp.sum(y ** 2) + jnp.sum(h * 0.5) + jnp.sum(c * 0.25)

        def loss_pl(w_ih, w_hh, b_ih, b_hh, x):
            y, (h, c) = lstm_layer(x, w_ih, w_hh, b_ih, b_hh, interpret=True)
            return jnp.sum(y ** 2) + jnp.sum(h * 0.5) + jnp.sum(c * 0.25)

        g_ref = jax.grad(loss_scan, argnums=(0, 1, 2, 3, 4))(w_ih, w_hh, b_ih, b_hh, x)
        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3, 4))(w_ih, w_hh, b_ih, b_hh, x)
        for a, b in zip(g_ref, g_pl):
            scale = float(jnp.abs(a).max()) + 1e-9
            np.testing.assert_allclose(np.asarray(b) / scale, np.asarray(a) / scale,
                                       atol=2e-5)

    def test_masked_outputs_zeroed(self, rng):
        B, T, I, H = 3, 16, 8, 128
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        w_ih, w_hh, b_ih, b_hh = _weights(rng, I, H)
        seq_len = jnp.array([16, 7, 1])

        y_pl, _ = lstm_layer(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len, interpret=True)
        y_ref, _ = rnn_ops.lstm(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len)
        # Valid positions match the masked scan exactly (causality).
        np.testing.assert_allclose(np.asarray(y_pl)[1, :7], np.asarray(y_ref)[1, :7],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(y_pl)[1, 7:], 0.)

    def test_final_state_at_seq_len_matches_scan(self, rng):
        """Ragged batches: final (h, c) must be the state at seq_len, exactly
        as the masked-scan (pack/unpack) path returns it."""
        B, T, I, H = 4, 16, 8, 128
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        w_ih, w_hh, b_ih, b_hh = _weights(rng, I, H)
        seq_len = jnp.array([16, 7, 1, 0])

        _, (h_ref, c_ref) = rnn_ops.lstm(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len)
        _, (h_pl, c_pl) = lstm_layer(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref), atol=1e-5)

    def test_final_state_grads_ragged(self, rng):
        """Gradients through a consumed final state on a ragged batch match
        the scan path (the VAE-encoder usage pattern)."""
        B, T, I, H = 3, 16, 8, 128
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        w_ih, w_hh, b_ih, b_hh = _weights(rng, I, H)
        seq_len = jnp.array([16, 9, 4])

        def loss(layer_fn, w_ih, w_hh, b_ih, b_hh, x):
            y, (h, c) = layer_fn(x, w_ih, w_hh, b_ih, b_hh)
            return jnp.sum(h ** 2) + jnp.sum(c * 0.5) + jnp.sum(y ** 2) * 0.1

        scan_fn = lambda x, *w: rnn_ops.lstm(x, *w, seq_len=seq_len)
        pl_fn = lambda x, *w: lstm_layer(x, *w, seq_len=seq_len, interpret=True)
        g_ref = jax.grad(loss, argnums=(1, 2, 3, 4, 5))(scan_fn, w_ih, w_hh, b_ih, b_hh, x)
        g_pl = jax.grad(loss, argnums=(1, 2, 3, 4, 5))(pl_fn, w_ih, w_hh, b_ih, b_hh, x)
        for a, b in zip(g_ref, g_pl):
            scale = float(jnp.abs(a).max()) + 1e-9
            np.testing.assert_allclose(np.asarray(b) / scale, np.asarray(a) / scale,
                                       atol=2e-5)

    def test_chunk_picking(self):
        assert _pick_chunk(640, 8) == 8
        assert _pick_chunk(16, 16) == 16
        assert _pick_chunk(30, 16) == 15
        assert _pick_chunk(7, 8) == 7
        assert _pick_chunk(13, 8) == 1


class TestPallasGRU:
    def test_forward_matches_scan(self, rng):
        from morgana_tpu.ops.pallas_gru import gru_layer
        B, T, I, H = 4, 32, 8, 128
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        w_ih = jnp.array(rng.normal(size=(I, 3 * H)).astype(np.float32)) * 0.1
        w_hh = jnp.array(rng.normal(size=(H, 3 * H)).astype(np.float32)) * 0.1
        b_ih = jnp.array(rng.normal(size=(3 * H,)).astype(np.float32)) * 0.1
        b_hh = jnp.array(rng.normal(size=(3 * H,)).astype(np.float32)) * 0.1

        y_ref, h_ref = rnn_ops.gru(x, w_ih, w_hh, b_ih, b_hh)
        y_pl, h_pl = gru_layer(x, w_ih, w_hh, b_ih, b_hh, interpret=True)
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=1e-5)

    def test_vjp_matches_scan(self, rng):
        from morgana_tpu.ops.pallas_gru import gru_layer
        B, T, I, H = 4, 32, 8, 128
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        w_ih = jnp.array(rng.normal(size=(I, 3 * H)).astype(np.float32)) * 0.1
        w_hh = jnp.array(rng.normal(size=(H, 3 * H)).astype(np.float32)) * 0.1
        b_ih = jnp.array(rng.normal(size=(3 * H,)).astype(np.float32)) * 0.1
        b_hh = jnp.array(rng.normal(size=(3 * H,)).astype(np.float32)) * 0.1

        def loss_ref(*args):
            y, h = rnn_ops.gru(args[4], *args[:4])
            return jnp.sum(y ** 2) + jnp.sum(h * 0.5)

        def loss_pl(*args):
            y, h = gru_layer(args[4], *args[:4], interpret=True)
            return jnp.sum(y ** 2) + jnp.sum(h * 0.5)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(w_ih, w_hh, b_ih, b_hh, x)
        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3, 4))(w_ih, w_hh, b_ih, b_hh, x)
        for a, b in zip(g_ref, g_pl):
            scale = float(jnp.abs(a).max()) + 1e-9
            np.testing.assert_allclose(np.asarray(b) / scale, np.asarray(a) / scale,
                                       atol=2e-5)

    def test_final_state_at_seq_len_matches_scan(self, rng):
        from morgana_tpu.ops.pallas_gru import gru_layer
        B, T, I, H = 4, 16, 8, 128
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        w_ih = jnp.array(rng.normal(size=(I, 3 * H)).astype(np.float32)) * 0.1
        w_hh = jnp.array(rng.normal(size=(H, 3 * H)).astype(np.float32)) * 0.1
        b_ih = jnp.array(rng.normal(size=(3 * H,)).astype(np.float32)) * 0.1
        b_hh = jnp.array(rng.normal(size=(3 * H,)).astype(np.float32)) * 0.1
        seq_len = jnp.array([16, 7, 1, 0])

        _, h_ref = rnn_ops.gru(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len)
        _, h_pl = gru_layer(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len, interpret=True)
        np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=1e-5)

        def loss(fn):
            _, h = fn()
            return jnp.sum(h ** 2)

        g_ref = jax.grad(lambda w: loss(lambda: rnn_ops.gru(
            x, w_ih, w, b_ih, b_hh, seq_len=seq_len)))(w_hh)
        g_pl = jax.grad(lambda w: loss(lambda: gru_layer(
            x, w_ih, w, b_ih, b_hh, seq_len=seq_len, interpret=True)))(w_hh)
        scale = float(jnp.abs(g_ref).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(g_pl) / scale, np.asarray(g_ref) / scale,
                                   atol=2e-5)


class TestRecurrentPallasBackend:
    def test_backend_flag(self, rng):
        from morgana_tpu import nn
        nn.manual_seed(0)
        rec = nn.Recurrent('lstm', 8, 128, backend='pallas', interpret=True)
        nn.manual_seed(0)
        ref = nn.Recurrent('lstm', 8, 128)
        x = jnp.array(rng.normal(size=(2, 16, 8)).astype(np.float32))
        y_pl, _ = rec(x, seq_len=jnp.array([16, 9]))
        y_ref, _ = ref(x, seq_len=jnp.array([16, 9]))
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=1e-5)


class TestOddShapes:
    @pytest.mark.parametrize('time', [7, 30, 13])
    def test_odd_time_lengths(self, time, rng):
        """Chunk picking handles T not divisible by the preferred chunk."""
        B, I, H = 2, 8, 128
        x = jnp.array(rng.normal(size=(B, time, I)).astype(np.float32))
        w_ih = jnp.array(rng.normal(size=(I, 4 * H)).astype(np.float32)) * 0.1
        w_hh = jnp.array(rng.normal(size=(H, 4 * H)).astype(np.float32)) * 0.1
        b = jnp.zeros(4 * H)
        y_ref, _ = rnn_ops.lstm(x, w_ih, w_hh, b, b)
        y_pl, _ = lstm_layer(x, w_ih, w_hh, b, b, interpret=True)
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=1e-5)


class TestRecurrentWavefrontBackend:
    def test_backend_matches_scan(self, rng):
        from morgana_tpu import nn
        nn.manual_seed(0)
        wf = nn.Recurrent('lstm', 8, 128, num_layers=3, backend='wavefront')
        nn.manual_seed(0)
        ref = nn.Recurrent('lstm', 8, 128, num_layers=3)
        x = jnp.array(rng.normal(size=(2, 16, 8)).astype(np.float32))
        seq_len = jnp.array([16, 9])
        y_wf, h_wf = wf(x, seq_len=seq_len)
        y_ref, h_ref = ref(x, seq_len=seq_len)
        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(y_ref), atol=1e-6)
        for (hw, cw), (hr, cr) in zip(h_wf, h_ref):
            np.testing.assert_allclose(np.asarray(hw), np.asarray(hr), atol=1e-6)
            np.testing.assert_allclose(np.asarray(cw), np.asarray(cr), atol=1e-6)

    def test_accepts_dropout(self):
        """Inter-layer dropout is supported since round 3 (exact parity with
        the scan backend: tests/test_ops_rnn.py::TestWavefrontDropout)."""
        from morgana_tpu import nn
        nn.Recurrent('lstm', 8, 16, num_layers=2, dropout=0.5,
                     backend='wavefront')
        nn.Recurrent('gru', 8, 16, backend='wavefront')

    def test_partial_hidden_matches_scan(self, rng):
        """A partially-provided hidden list uses zeros for absent layers,
        exactly like the scan backend."""
        from morgana_tpu import nn
        nn.manual_seed(0)
        wf = nn.Recurrent('lstm', 8, 128, num_layers=2, backend='wavefront')
        nn.manual_seed(0)
        ref = nn.Recurrent('lstm', 8, 128, num_layers=2)
        x = jnp.array(rng.normal(size=(2, 8, 8)).astype(np.float32))
        h0 = (jnp.array(rng.normal(size=(2, 128)).astype(np.float32)),
              jnp.array(rng.normal(size=(2, 128)).astype(np.float32)))
        hidden = [h0, None]
        y_wf, _ = wf(x, hidden=list(hidden))
        y_ref, _ = ref(x, hidden=list(hidden))
        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(y_ref), atol=1e-6)
