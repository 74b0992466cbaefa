"""Attention / Transformer tests: torch parity, masking semantics, remat.

Model: SURVEY §4 test strategy — golden parity against torch for every
layer with a torch counterpart, plus mask-semantics properties the static-
shape TPU design must honour (padded frames must never influence valid
outputs).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from morgana_tpu import nn
from morgana_tpu.ops import attention as attention_ops


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def _lengths(batch, max_len):
    # Ragged on purpose; includes a full-length row.
    lens = np.linspace(max_len // 2, max_len, batch).astype(np.int32)
    lens[-1] = max_len
    return lens


class TestOps:
    def test_padding_bias_shape_and_values(self):
        bias = attention_ops.padding_bias(np.array([2, 4]), 4)
        assert bias.shape == (2, 1, 1, 4)
        np.testing.assert_array_equal(np.asarray(bias[0, 0, 0]) < -1e8,
                                      [False, False, True, True])
        assert np.all(np.asarray(bias[1]) == 0.0)

    def test_causal_bias(self):
        bias = np.asarray(attention_ops.causal_bias(3))[0, 0]
        assert np.all(bias[np.tril_indices(3)] == 0.0)
        assert np.all(bias[np.triu_indices(3, k=1)] < -1e8)

    def test_sinusoidal_positions_canonical(self):
        table = np.asarray(attention_ops.sinusoidal_positions(50, 16))
        assert table.shape == (50, 16)
        # (sin, cos) interleave: position 0 is (0, 1, 0, 1, ...).
        np.testing.assert_allclose(table[0, 0::2], 0.0, atol=1e-7)
        np.testing.assert_allclose(table[0, 1::2], 1.0, atol=1e-7)
        # First pair oscillates with angular frequency 1 (pos in radians).
        np.testing.assert_allclose(table[:, 0], np.sin(np.arange(50)),
                                   rtol=1e-5, atol=1e-5)

    def test_fully_padded_rows_are_finite(self):
        rng = np.random.default_rng(0)
        q = k = v = jnp.asarray(_rand(rng, 2, 2, 6, 8))
        bias = attention_ops.padding_bias(np.array([3, 0]), 6)
        out = attention_ops.scaled_dot_product_attention(q, k, v, bias=bias)
        assert np.all(np.isfinite(np.asarray(out)))


class TestTorchParity:
    def test_multi_head_attention_matches_torch(self):
        rng = np.random.default_rng(1)
        batch, max_len, embed, heads = 3, 12, 32, 4
        x = _rand(rng, batch, max_len, embed)
        lens = _lengths(batch, max_len)

        nn.manual_seed(7)
        mha = nn.MultiHeadAttention(embed, heads)

        ref = torch.nn.MultiheadAttention(embed, heads, batch_first=True)
        with torch.no_grad():
            ref.in_proj_weight.copy_(
                torch.from_numpy(np.asarray(mha.in_proj.weight.value).T))
            ref.in_proj_bias.copy_(
                torch.from_numpy(np.asarray(mha.in_proj.bias.value)))
            ref.out_proj.weight.copy_(
                torch.from_numpy(np.asarray(mha.out_proj.weight.value).T))
            ref.out_proj.bias.copy_(
                torch.from_numpy(np.asarray(mha.out_proj.bias.value)))

        with nn.bind(mha):
            got = np.asarray(mha(jnp.asarray(x), seq_len=lens))

        pad_mask = torch.arange(max_len)[None, :] >= torch.from_numpy(lens)[:, None]
        want, _ = ref(torch.from_numpy(x), torch.from_numpy(x),
                      torch.from_numpy(x), key_padding_mask=pad_mask,
                      need_weights=False)
        want = want.detach().numpy()

        # Compare valid frames only (torch NaNs fully-masked query rows).
        for b in range(batch):
            np.testing.assert_allclose(got[b, :lens[b]], want[b, :lens[b]],
                                       rtol=2e-5, atol=2e-5)

    def test_causal_matches_torch(self):
        rng = np.random.default_rng(2)
        batch, max_len, embed, heads = 2, 10, 16, 2
        x = _rand(rng, batch, max_len, embed)

        nn.manual_seed(11)
        mha = nn.MultiHeadAttention(embed, heads)
        ref = torch.nn.MultiheadAttention(embed, heads, batch_first=True)
        with torch.no_grad():
            ref.in_proj_weight.copy_(
                torch.from_numpy(np.asarray(mha.in_proj.weight.value).T))
            ref.in_proj_bias.copy_(
                torch.from_numpy(np.asarray(mha.in_proj.bias.value)))
            ref.out_proj.weight.copy_(
                torch.from_numpy(np.asarray(mha.out_proj.weight.value).T))
            ref.out_proj.bias.copy_(
                torch.from_numpy(np.asarray(mha.out_proj.bias.value)))

        with nn.bind(mha):
            got = np.asarray(mha(jnp.asarray(x), causal=True))
        mask = torch.nn.Transformer.generate_square_subsequent_mask(max_len)
        want, _ = ref(torch.from_numpy(x), torch.from_numpy(x),
                      torch.from_numpy(x), attn_mask=mask, need_weights=False)
        np.testing.assert_allclose(got, want.detach().numpy(),
                                   rtol=2e-5, atol=2e-5)

    def test_encoder_layer_matches_torch(self):
        rng = np.random.default_rng(3)
        batch, max_len, d_model, heads, d_ff = 2, 9, 24, 3, 48
        x = _rand(rng, batch, max_len, d_model)
        lens = _lengths(batch, max_len)

        nn.manual_seed(13)
        layer = nn.TransformerEncoderLayer(d_model, heads, d_ff)

        ref = torch.nn.TransformerEncoderLayer(
            d_model, heads, dim_feedforward=d_ff, dropout=0.0,
            activation='gelu', batch_first=True, norm_first=True)
        with torch.no_grad():
            ref.self_attn.in_proj_weight.copy_(
                torch.from_numpy(np.asarray(layer.attn.in_proj.weight.value).T))
            ref.self_attn.in_proj_bias.copy_(
                torch.from_numpy(np.asarray(layer.attn.in_proj.bias.value)))
            ref.self_attn.out_proj.weight.copy_(
                torch.from_numpy(np.asarray(layer.attn.out_proj.weight.value).T))
            ref.self_attn.out_proj.bias.copy_(
                torch.from_numpy(np.asarray(layer.attn.out_proj.bias.value)))
            ref.linear1.weight.copy_(
                torch.from_numpy(np.asarray(layer.ffn_in.weight.value).T))
            ref.linear1.bias.copy_(
                torch.from_numpy(np.asarray(layer.ffn_in.bias.value)))
            ref.linear2.weight.copy_(
                torch.from_numpy(np.asarray(layer.ffn_out.weight.value).T))
            ref.linear2.bias.copy_(
                torch.from_numpy(np.asarray(layer.ffn_out.bias.value)))
            ref.norm1.weight.copy_(
                torch.from_numpy(np.asarray(layer.attn_norm.weight.value)))
            ref.norm1.bias.copy_(
                torch.from_numpy(np.asarray(layer.attn_norm.bias.value)))
            ref.norm2.weight.copy_(
                torch.from_numpy(np.asarray(layer.ffn_norm.weight.value)))
            ref.norm2.bias.copy_(
                torch.from_numpy(np.asarray(layer.ffn_norm.bias.value)))

        with nn.bind(layer):
            got = np.asarray(layer(jnp.asarray(x), seq_len=lens))
        pad_mask = torch.arange(max_len)[None, :] >= torch.from_numpy(lens)[:, None]
        want = ref(torch.from_numpy(x),
                   src_key_padding_mask=pad_mask).detach().numpy()
        for b in range(batch):
            np.testing.assert_allclose(got[b, :lens[b]], want[b, :lens[b]],
                                       rtol=3e-5, atol=3e-5)


class TestMaskSemantics:
    def test_padding_never_leaks_into_valid_frames(self):
        rng = np.random.default_rng(4)
        batch, max_len = 3, 14
        nn.manual_seed(17)
        enc = nn.TransformerEncoder(2, 16, 4, 32)
        lens = _lengths(batch, max_len)

        x = _rand(rng, batch, max_len, 16)
        x_garbage = x.copy()
        for b in range(batch):
            x_garbage[b, lens[b]:] = 1e3 * rng.normal(
                size=(max_len - lens[b], 16))

        with nn.bind(enc):
            a = np.asarray(enc(jnp.asarray(x), seq_len=lens))
            b_ = np.asarray(enc(jnp.asarray(x_garbage), seq_len=lens))
        for b in range(batch):
            np.testing.assert_allclose(a[b, :lens[b]], b_[b, :lens[b]],
                                       rtol=1e-5, atol=1e-5)

    def test_causal_future_never_leaks(self):
        rng = np.random.default_rng(5)
        nn.manual_seed(19)
        enc = nn.TransformerEncoder(2, 16, 2, 32, causal=True,
                                    add_positions=False)
        x = _rand(rng, 1, 8, 16)
        y = x.copy()
        # Perturb the future only — with non-uniform noise (a constant shift
        # would sit in LayerNorm's null space and vanish).
        y[0, 5:] += rng.normal(size=y[0, 5:].shape).astype(np.float32)
        with nn.bind(enc):
            a = np.asarray(enc(jnp.asarray(x)))
            b = np.asarray(enc(jnp.asarray(y)))
        np.testing.assert_allclose(a[0, :5], b[0, :5], rtol=1e-5, atol=1e-5)
        assert not np.allclose(a[0, 5:], b[0, 5:])


class TestTraining:
    def _loss_fn(self, enc, lens, x):
        def fn(params):
            with nn.bind(enc, params):
                out = enc(x, seq_len=lens)
            mask = np.zeros(x.shape[:2] + (1,), np.float32)
            for b, n in enumerate(lens):
                mask[b, :n] = 1.0
            return jnp.sum((out * mask) ** 2)
        return fn

    def test_remat_gradients_match(self):
        rng = np.random.default_rng(6)
        lens = _lengths(2, 10)
        x = jnp.asarray(_rand(rng, 2, 10, 16))

        nn.manual_seed(23)
        enc = nn.TransformerEncoder(2, 16, 4, 32)
        params = nn.parameters(enc)
        g_plain = jax.grad(self._loss_fn(enc, lens, x))(params)
        enc.remat = True
        g_remat = jax.grad(self._loss_fn(enc, lens, x))(params)
        for name in g_plain:
            np.testing.assert_allclose(np.asarray(g_plain[name]),
                                       np.asarray(g_remat[name]),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=name)
        # Gradients reach every parameter (positions/masking don't cut flow).
        for name, g in g_plain.items():
            assert np.any(np.asarray(g) != 0.0), name

    def test_dropout_train_vs_eval(self):
        rng = np.random.default_rng(7)
        nn.manual_seed(29)
        enc = nn.TransformerEncoder(1, 8, 2, 16, dropout=0.5)
        x = jnp.asarray(_rand(rng, 2, 6, 8))
        key = jax.random.PRNGKey(0)
        with nn.bind(enc, rng=key, train=True):
            t1 = np.asarray(enc(x))
        with nn.bind(enc, rng=key, train=True):
            t2 = np.asarray(enc(x))
        with nn.bind(enc):
            e1 = np.asarray(enc(x))
        with nn.bind(enc):
            e2 = np.asarray(enc(x))
        np.testing.assert_allclose(t1, t2)  # Same key -> deterministic.
        np.testing.assert_allclose(e1, e2)
        assert not np.allclose(t1, e1)      # Dropout active in train mode.

    def test_jit_matches_eager(self):
        rng = np.random.default_rng(8)
        nn.manual_seed(31)
        enc = nn.TransformerEncoder(2, 16, 4, 32)
        lens = _lengths(3, 12)
        x = jnp.asarray(_rand(rng, 3, 12, 16))
        params = nn.parameters(enc)

        def apply(p, x):
            with nn.bind(enc, p):
                return enc(x, seq_len=lens)

        eager = np.asarray(apply(params, x))
        jitted = np.asarray(jax.jit(apply)(params, x))
        np.testing.assert_allclose(eager, jitted, rtol=1e-5, atol=1e-6)

    def test_cross_attention_shapes(self):
        rng = np.random.default_rng(9)
        nn.manual_seed(37)
        mha = nn.MultiHeadAttention(16, 4)
        q = jnp.asarray(_rand(rng, 2, 5, 16))
        kv = jnp.asarray(_rand(rng, 2, 9, 16))
        with nn.bind(mha):
            out = mha(q, kv=kv, kv_seq_len=np.array([9, 4]))
        assert out.shape == (2, 5, 16)
        # kv padding must not leak: perturb kv beyond its length.
        kv2 = np.asarray(kv).copy()
        kv2[1, 4:] += 100.0
        with nn.bind(mha):
            out2 = mha(q, kv=jnp.asarray(kv2), kv_seq_len=np.array([9, 4]))
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]),
                                   rtol=1e-5, atol=1e-5)


if __name__ == '__main__':
    pytest.main([__file__, '-q'])


class TestSlidingWindowStreaming:
    def test_local_causal_bias_semantics(self):
        bias = np.asarray(attention_ops.local_causal_bias(5, 2))[0, 0]
        for i in range(5):
            for j in range(5):
                visible = bias[i, j] == 0.0
                assert visible == (0 <= i - j < 2), (i, j)

    def test_streaming_bias_matches_local_at_offset(self):
        """The chunk bias over [cache | chunk] keys must agree with the
        full-sequence local-causal bias restricted to those rows/cols."""
        T, W, C = 17, 4, 5
        full = np.asarray(attention_ops.local_causal_bias(T, W))[0, 0]
        for pos in (0, 3, W, 12):
            got = np.asarray(attention_ops.streaming_bias(pos, C, W))[0, 0]
            for i in range(C):          # query absolute pos + i
                for j in range(W + C):  # key absolute pos - W + j
                    k_abs = pos - W + j
                    want = (full[pos + i, k_abs] if 0 <= k_abs < T
                            and pos + i < T else attention_ops._MASK_BIAS)
                    if pos + i < T:
                        assert got[i, j] == want, (pos, i, j)

    @pytest.mark.parametrize('chunk,window', [(4, 8), (8, 8), (16, 6), (1, 3)])
    def test_encoder_step_chain_equals_batch_forward(self, chunk, window):
        rng = np.random.default_rng(10)
        nn.manual_seed(41)
        enc = nn.TransformerEncoder(2, 16, 4, 32, causal=True, window=window)
        T = 24
        x = _rand(rng, 2, T, 16)

        with nn.bind(enc):
            batch_out = np.asarray(enc(jnp.asarray(x)))

        state = None
        outs = []
        with nn.bind(enc):
            for s in range(0, T, chunk):
                y, state = enc.step(jnp.asarray(x[:, s:s + chunk]), state)
                outs.append(np.asarray(y))
        streamed = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(streamed, batch_out, rtol=1e-5, atol=1e-5)

    def test_step_requires_streamable_config(self):
        nn.manual_seed(43)
        enc = nn.TransformerEncoder(1, 8, 2, 16)  # bidirectional
        with pytest.raises(ValueError, match='causal'):
            enc.init_stream_state(1)
        with pytest.raises(ValueError, match='causal'):
            nn.TransformerEncoder(1, 8, 2, 16, window=4)

    def test_window_actually_limits_context(self):
        """Frames beyond the window must not influence the output (the
        guarantee that makes the KV cache exact)."""
        rng = np.random.default_rng(11)
        nn.manual_seed(47)
        W = 4
        enc = nn.TransformerEncoder(1, 16, 2, 32, causal=True, window=W,
                                    add_positions=False)
        T = 12
        x = _rand(rng, 1, T, 16)
        y = x.copy()
        y[0, :T - W] += rng.normal(size=(T - W, 16)).astype(np.float32)
        with nn.bind(enc):
            a = np.asarray(enc(jnp.asarray(x)))
            b = np.asarray(enc(jnp.asarray(y)))
        # With 1 layer, the last frame sees only the last W frames.
        np.testing.assert_allclose(a[0, -1], b[0, -1], rtol=1e-5, atol=1e-5)
        assert not np.allclose(a[0, 0], b[0, 0])


class TestFlashBackend:
    def test_flash_backend_falls_back_off_tpu(self):
        """backend='flash' is exact attention via a fused TPU kernel; off
        TPU it must use the XLA path — identical outputs, not an error."""
        rng = np.random.default_rng(12)
        x = _rand(rng, 2, 16, 32)
        lens = np.array([16, 9], np.int32)
        nn.manual_seed(53)
        a = nn.MultiHeadAttention(32, 4)
        nn.manual_seed(53)
        b = nn.MultiHeadAttention(32, 4, backend='flash')
        with nn.bind(a):
            ya = np.asarray(a(jnp.asarray(x), seq_len=lens))
        with nn.bind(b):
            yb = np.asarray(b(jnp.asarray(x), seq_len=lens))
        np.testing.assert_allclose(ya, yb)

    def test_unknown_backend_rejected(self):
        with pytest.raises(ValueError, match='backend'):
            nn.MultiHeadAttention(32, 4, backend='cudnn')

    @pytest.mark.skipif(jax.default_backend() != 'tpu',
                        reason='fused kernel needs a TPU')
    def test_flash_matches_xla_on_tpu(self):
        rng = np.random.default_rng(13)
        x = _rand(rng, 2, 256, 64)
        lens = np.array([256, 170], np.int32)
        nn.manual_seed(59)
        a = nn.MultiHeadAttention(64, 4)
        nn.manual_seed(59)
        b = nn.MultiHeadAttention(64, 4, backend='flash')
        for causal in (False, True):
            with nn.bind(a):
                ya = np.asarray(a(jnp.asarray(x), seq_len=lens,
                                  causal=causal))
            with nn.bind(b):
                yb = np.asarray(b(jnp.asarray(x), seq_len=lens,
                                  causal=causal))
            for i, n in enumerate(lens):
                np.testing.assert_allclose(ya[i, :n], yb[i, :n],
                                           rtol=2e-2, atol=2e-3)


class TestSplashBackend:
    """backend='auto' (the default) selects the fused splash kernel on TPU
    when eligible and the exact XLA path everywhere else (BASELINE.md
    round-4 A/B: splash with whole-sequence blocks + fused backward is
    1.3-1.4x faster fwd+bwd at flagship shapes; the XLA path is HBM-bound
    on the materialised T x T tensors)."""

    def test_auto_uses_xla_off_tpu(self):
        rng = np.random.default_rng(21)
        x = _rand(rng, 2, 128, 32)
        lens = np.array([128, 70], np.int32)
        nn.manual_seed(53)
        a = nn.MultiHeadAttention(32, 4, backend='xla')
        nn.manual_seed(53)
        b = nn.MultiHeadAttention(32, 4, backend='auto')
        nn.manual_seed(53)
        c = nn.MultiHeadAttention(32, 4, backend='splash')
        outs = []
        for m in (a, b, c):
            with nn.bind(m):
                outs.append(np.asarray(m(jnp.asarray(x), seq_len=lens)))
        np.testing.assert_array_equal(outs[0], outs[1])
        np.testing.assert_array_equal(outs[0], outs[2])

    def test_ineligible_length_falls_back(self, monkeypatch):
        """Padded lengths under the 256-frame floor must use the XLA path
        even when the backend claims TPU — running splash here (CPU) would
        fail, so bitwise equality proves the fallback fired. (Lengths >=
        256 that are not 128-multiples are padded inside _splash instead
        of falling back — see test_splash_pad_alignment.)"""
        monkeypatch.setattr(nn, '_on_tpu', lambda: True)
        rng = np.random.default_rng(22)
        x = _rand(rng, 2, 100, 32)
        lens = np.array([100, 60], np.int32)
        nn.manual_seed(53)
        a = nn.MultiHeadAttention(32, 4, backend='xla')
        nn.manual_seed(53)
        b = nn.MultiHeadAttention(32, 4, backend='splash')
        with nn.bind(a):
            ya = np.asarray(a(jnp.asarray(x), seq_len=lens))
        with nn.bind(b):
            yb = np.asarray(b(jnp.asarray(x), seq_len=lens))
        np.testing.assert_array_equal(ya, yb)

    def test_prob_dropout_falls_back(self, monkeypatch):
        """Attention-probability dropout has no splash hook: training-mode
        dropout must take the XLA path (same RNG stream as backend='xla')."""
        monkeypatch.setattr(nn, '_on_tpu', lambda: True)
        rng = np.random.default_rng(23)
        x = _rand(rng, 2, 128, 32)
        nn.manual_seed(53)
        a = nn.MultiHeadAttention(32, 4, dropout=0.5, backend='xla')
        nn.manual_seed(53)
        b = nn.MultiHeadAttention(32, 4, dropout=0.5, backend='splash')
        key = jax.random.PRNGKey(7)
        with nn.bind(a, rng=key, train=True):
            ya = np.asarray(a(jnp.asarray(x)))
        with nn.bind(b, rng=key, train=True):
            yb = np.asarray(b(jnp.asarray(x)))
        np.testing.assert_array_equal(ya, yb)

    def test_kernel_cache_and_block_policy(self):
        m = nn.MultiHeadAttention(32, 4, backend='splash')
        k1 = m._splash_kernel(128, 128, causal=False, window=None)
        assert m._splash_kernel(128, 128, causal=False, window=None) is k1
        k2 = m._splash_kernel(128, 128, causal=True, window=None)
        k3 = m._splash_kernel(128, 128, causal=True, window=64)
        assert len({id(k1), id(k2), id(k3)}) == 3
        # Layout policy: whole-sequence blocks at acoustic lengths (pad to
        # the next 128 multiple); past 1024, pad to the next 512 multiple
        # so the block never degrades to the measured-slow 128-wide
        # configuration (e.g. 1408 -> 1536/768, not 1408/128).
        layout = nn.MultiHeadAttention._splash_layout
        assert layout(640) == (640, 640)
        assert layout(320) == (384, 384)   # blocks must be 128-multiples
        assert layout(200) == (256, 256)
        assert layout(1024) == (1024, 1024)
        assert layout(2048) == (2048, 1024)
        assert layout(1280) == (1280, 640)   # 640 divides: no extra pad
        assert layout(1408) == (1536, 768)   # 11*128: pad to 512-multiple
        assert layout(1152) == (1536, 768)   # 9*128: likewise
        assert layout(2560) == (2560, 640)

    def test_splash_pad_alignment(self, monkeypatch):
        """Non-128-multiple lengths (real bucket_size outputs: 320, 576,
        ...) are padded to the next multiple before the kernel and sliced
        back after; the pad frames are invalid segment positions."""
        m = nn.MultiHeadAttention(32, 4, backend='splash')
        seen = {}

        def fake_kernel(q1, k1, v1, segment_ids=None):
            seen['shape'] = tuple(q1.shape)
            seen['seg'] = segment_ids is not None
            return q1

        monkeypatch.setattr(m, '_splash_kernel',
                            lambda q_len, block, causal, window: fake_kernel)
        rng = np.random.default_rng(25)
        q = jnp.asarray(rng.standard_normal((2, 4, 320, 8)), jnp.float32)
        out = m._splash(q, q, q, seq_len=np.array([320, 200], np.int32),
                        causal=False, window=None, compute_dtype=None)
        assert out.shape == (2, 4, 320, 8)
        assert seen['shape'] == (4, 384, 8) and seen['seg']
        # The fake kernel is identity, so the output must be the
        # pre-scaled q with the pad frames sliced off.
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(q) / np.sqrt(8), rtol=1e-6)
        # Aligned lengths pass through unpadded (and a missing seq_len
        # still gets segment ids once padding would be needed).
        out = m._splash(q[:, :, :256], q[:, :, :256], q[:, :, :256],
                        seq_len=None, causal=False, window=None,
                        compute_dtype=None)
        assert seen['shape'] == (4, 256, 8)
        assert out.shape == (2, 4, 256, 8)

    @pytest.mark.skipif(not nn._on_tpu(), reason='splash kernel needs TPU')
    def test_splash_matches_xla_on_tpu(self):
        rng = np.random.default_rng(24)
        # 256 = aligned; 320 = a real bucket_size output that exercises
        # the internal pad-to-128-multiple path.
        for T in (256, 320):
            x = _rand(rng, 2, T, 64)
            lens = np.array([T, int(0.66 * T)], np.int32)
            nn.manual_seed(59)
            a = nn.MultiHeadAttention(64, 4, backend='xla')
            nn.manual_seed(59)
            b = nn.MultiHeadAttention(64, 4, backend='splash')
            # window=64 pins the subtlest splash mapping — LocalMask's
            # window_size=(window-1, 0) — against local_causal_bias.
            for causal, window in ((False, None), (True, None), (True, 64)):
                with nn.bind(a):
                    ya = np.asarray(a(jnp.asarray(x), seq_len=lens,
                                      causal=causal, window=window))
                with nn.bind(b):
                    yb = np.asarray(b(jnp.asarray(x), seq_len=lens,
                                      causal=causal, window=window))
                for i, n in enumerate(lens):
                    np.testing.assert_allclose(
                        ya[i, :n], yb[i, :n], rtol=2e-2, atol=2e-3,
                        err_msg=f'T={T} causal={causal} '
                                f'window={window} row {i}')


class TestMigrateTransformer:
    def test_torch_transformer_encoder_migrates(self):
        """A torch nn.TransformerEncoder state dict loads through
        migrate.load_torch_state_dict and reproduces torch's outputs."""
        from morgana_tpu import migrate

        d_model, heads, d_ff, depth = 24, 3, 48, 2
        rng = np.random.default_rng(14)
        x = _rand(rng, 2, 10, d_model)
        lens = np.array([10, 7], np.int32)

        torch.manual_seed(0)
        ref_layer = torch.nn.TransformerEncoderLayer(
            d_model, heads, dim_feedforward=d_ff, dropout=0.0,
            activation='gelu', batch_first=True, norm_first=True)
        ref = torch.nn.TransformerEncoder(
            ref_layer, depth, norm=torch.nn.LayerNorm(d_model))

        nn.manual_seed(61)
        enc = nn.TransformerEncoder(depth, d_model, heads, d_ff,
                                    add_positions=False)
        nn.load_state_dict(
            enc, migrate.convert_torch_state_dict(enc, ref.state_dict()))

        with nn.bind(enc):
            got = np.asarray(enc(jnp.asarray(x), seq_len=lens))
        pad = torch.arange(10)[None, :] >= torch.from_numpy(lens)[:, None]
        want = ref(torch.from_numpy(x),
                   src_key_padding_mask=pad).detach().numpy()
        for b, n in enumerate(lens):
            np.testing.assert_allclose(got[b, :n], want[b, :n],
                                       rtol=3e-5, atol=3e-5)


def test_bare_attention_block_cannot_stream():
    """SequentialWithRecurrent streams only members with the full contract
    (init_stream_state); a bare encoder layer gets a clear error, not a
    TypeError from a mismatched step signature."""
    nn.manual_seed(67)
    seq = nn.SequentialWithRecurrent(
        nn.Linear(8, 16),
        nn.TransformerEncoderLayer(16, 2, 32),
        nn.Linear(16, 4),
    )
    x = jnp.zeros((1, 4, 8))
    with nn.bind(seq):
        seq(x)  # batch path fine
        with pytest.raises(NotImplementedError, match='TransformerEncoder'):
            seq(x, return_hiddens=True)
