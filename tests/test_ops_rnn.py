"""RNN parity tests: the masked-scan LSTM/GRU must match torch's cuDNN-style
cells bit-for-bit (within float32 tolerance) when loaded with the same
weights, including pack/unpack semantics at sequence tails."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from morgana_tpu import nn
from morgana_tpu.ops import rnn as rnn_ops


def _copy_torch_rnn_weights(torch_rnn, layer=0):
    w_ih = torch_rnn.weight_ih_l0.detach().numpy().T  # (in, gates*H)
    w_hh = torch_rnn.weight_hh_l0.detach().numpy().T
    b_ih = torch_rnn.bias_ih_l0.detach().numpy()
    b_hh = torch_rnn.bias_hh_l0.detach().numpy()
    return w_ih, w_hh, b_ih, b_hh


@pytest.mark.parametrize('mode', ['lstm', 'gru'])
def test_cell_matches_torch_full_length(mode, rng):
    torch.manual_seed(7)
    batch, time, in_dim, hidden = 3, 11, 5, 8
    x = rng.normal(size=(batch, time, in_dim)).astype(np.float32)

    t_rnn = (torch.nn.LSTM if mode == 'lstm' else torch.nn.GRU)(
        in_dim, hidden, batch_first=True)
    with torch.no_grad():
        t_out, t_hidden = t_rnn(torch.tensor(x))
    w_ih, w_hh, b_ih, b_hh = _copy_torch_rnn_weights(t_rnn)

    fn = rnn_ops.lstm if mode == 'lstm' else rnn_ops.gru
    j_out, j_hidden = fn(jnp.array(x), jnp.array(w_ih), jnp.array(w_hh),
                         jnp.array(b_ih), jnp.array(b_hh))

    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-5)
    if mode == 'lstm':
        np.testing.assert_allclose(np.asarray(j_hidden[0]), t_hidden[0][0].numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(j_hidden[1]), t_hidden[1][0].numpy(), atol=2e-5)
    else:
        np.testing.assert_allclose(np.asarray(j_hidden), t_hidden[0].numpy(), atol=2e-5)


@pytest.mark.parametrize('mode', ['lstm', 'gru'])
def test_masked_matches_torch_packed(mode, rng):
    """Variable-length semantics must equal torch pack/unpack: zero outputs at
    padding, final hidden at each sequence's end."""
    torch.manual_seed(3)
    batch, time, in_dim, hidden = 4, 9, 6, 5
    x = rng.normal(size=(batch, time, in_dim)).astype(np.float32)
    seq_len = np.array([9, 5, 1, 7])

    t_rnn = (torch.nn.LSTM if mode == 'lstm' else torch.nn.GRU)(
        in_dim, hidden, batch_first=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(seq_len), batch_first=True, enforce_sorted=False)
    with torch.no_grad():
        packed_out, t_hidden = t_rnn(packed)
    t_out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        packed_out, batch_first=True, total_length=time)

    w_ih, w_hh, b_ih, b_hh = _copy_torch_rnn_weights(t_rnn)
    fn = rnn_ops.lstm if mode == 'lstm' else rnn_ops.gru
    j_out, j_hidden = fn(jnp.array(x), jnp.array(w_ih), jnp.array(w_hh),
                         jnp.array(b_ih), jnp.array(b_hh), seq_len=jnp.array(seq_len))

    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-5)
    h_final = t_hidden[0][0].numpy() if mode == 'lstm' else t_hidden[0].numpy()
    j_h = np.asarray(j_hidden[0] if mode == 'lstm' else j_hidden)
    np.testing.assert_allclose(j_h, h_final, atol=2e-5)


@pytest.mark.parametrize('mode', ['lstm', 'gru'])
def test_multilayer_stack_matches_torch(mode, rng):
    """2-layer stacks (torch num_layers=2) match our Recurrent(num_layers=2)
    with migrated weights."""
    from morgana_tpu import migrate, nn

    torch.manual_seed(21)
    in_dim, hidden = 6, 8
    t_rnn = (torch.nn.LSTM if mode == 'lstm' else torch.nn.GRU)(
        in_dim, hidden, num_layers=2, batch_first=True)

    class Holder(nn.Module):
        def __init__(self):
            self.rnn = nn.Recurrent(mode, in_dim, hidden, num_layers=2)

    nn.manual_seed(0)
    holder = Holder()
    # torch names: rnn.weight_ih_l0 ... — our map adds '.layer' only for the
    # reference's wrapper; plain torch RNN attrs live directly on the module.
    sd = {}
    for name, value in t_rnn.state_dict().items():
        arr = value.numpy()
        sd[f'rnn.{name.replace("weight_ih", "w_ih").replace("weight_hh", "w_hh").replace("bias_ih", "b_ih").replace("bias_hh", "b_hh")}'] = \
            arr.T if name.startswith('weight') else arr
    nn.load_state_dict(holder, sd)

    x = rng.normal(size=(2, 9, in_dim)).astype(np.float32)
    with torch.no_grad():
        y_ref, _ = t_rnn(torch.tensor(x))
    y_ours, _ = holder.rnn(jnp.array(x))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref.numpy(), atol=2e-5)


def test_recurrent_module_stack(rng):
    """Stacked Recurrent module runs and masks correctly."""
    nn.manual_seed(11)
    rec = nn.Recurrent('lstm', 4, 6, num_layers=2)
    x = jnp.array(rng.normal(size=(2, 7, 4)).astype(np.float32))
    y, hidden = rec(x, seq_len=jnp.array([7, 3]))
    assert y.shape == (2, 7, 6)
    np.testing.assert_allclose(np.asarray(y)[1, 3:], 0.)
    assert len(hidden) == 2  # per-layer states

    # Single-timestep (2-d) input path.
    y1, _ = rec(x[:, 0])
    assert y1.shape == (2, 6)


def test_sequential_with_recurrent_threads_seq_len(rng):
    nn.manual_seed(5)
    net = nn.SequentialWithRecurrent(
        nn.Linear(4, 8), nn.Sigmoid(), nn.Recurrent('gru', 8, 8), nn.Linear(8, 2))
    x = jnp.array(rng.normal(size=(2, 5, 4)).astype(np.float32))
    out = net(x, seq_len=jnp.array([5, 2]))
    assert out.shape == (2, 5, 2)

    names = dict(net.named_parameters())
    assert '0.weight' in names and '2.w_ih_l0' in names and '3.bias' in names


@pytest.mark.parametrize('mode', ['lstm', 'gru'])
def test_bidirectional_matches_torch_packed(mode, rng):
    """Bidirectional stacks with variable lengths match torch pack/unpack:
    the backward direction starts at each sequence's last valid frame."""
    from morgana_tpu import nn

    torch.manual_seed(5)
    B, T, I, H = 3, 9, 6, 8
    t_rnn = (torch.nn.LSTM if mode == 'lstm' else torch.nn.GRU)(
        I, H, batch_first=True, bidirectional=True)
    nn.manual_seed(0)
    rec = nn.Recurrent(mode, I, H, bidirectional=True)

    sd = {}
    for name, v in t_rnn.state_dict().items():
        arr = v.numpy()
        ours = name.replace('weight_ih', 'w_ih').replace('weight_hh', 'w_hh') \
                   .replace('bias_ih', 'b_ih').replace('bias_hh', 'b_hh')
        sd[ours] = arr.T if name.startswith('weight') else arr
    nn.load_state_dict(rec, sd)

    x = rng.normal(size=(B, T, I)).astype(np.float32)
    seq_len = np.array([9, 5, 2])
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(seq_len), batch_first=True, enforce_sorted=False)
    with torch.no_grad():
        po, _ = t_rnn(packed)
    y_ref, _ = torch.nn.utils.rnn.pad_packed_sequence(po, batch_first=True, total_length=T)

    y_ours, hidden = rec(jnp.array(x), seq_len=jnp.array(seq_len))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref.numpy(), atol=3e-5)

    # A user-supplied initial state must be honoured per direction
    # (regression: it used to be silently ignored).
    rng2 = np.random.default_rng(7)
    h0 = rng2.normal(size=(2, B, H)).astype(np.float32)  # (fwd/bwd, B, H)
    if mode == 'lstm':
        c0 = rng2.normal(size=(2, B, H)).astype(np.float32)
        t_init = (torch.tensor(h0), torch.tensor(c0))
        ours_init = [((jnp.array(h0[0]), jnp.array(c0[0])),
                      (jnp.array(h0[1]), jnp.array(c0[1])))]
    else:
        t_init = torch.tensor(h0)
        ours_init = [(jnp.array(h0[0]), jnp.array(h0[1]))]
    with torch.no_grad():
        po, _ = t_rnn(packed, t_init)
    y_ref2, _ = torch.nn.utils.rnn.pad_packed_sequence(
        po, batch_first=True, total_length=T)
    y_ours2, _ = rec(jnp.array(x), seq_len=jnp.array(seq_len),
                     hidden=ours_init)
    assert np.abs(np.asarray(y_ours2) - np.asarray(y_ours)).max() > 1e-4
    np.testing.assert_allclose(np.asarray(y_ours2), y_ref2.numpy(), atol=3e-5)
    assert y_ours.shape == (B, T, 2 * H)


def test_reverse_sequences(rng):
    from morgana_tpu.ops.rnn import reverse_sequences
    x = jnp.array(rng.normal(size=(2, 5, 3)).astype(np.float32))
    out = np.asarray(reverse_sequences(x, jnp.array([5, 2])))
    np.testing.assert_allclose(out[0], np.asarray(x)[0, ::-1])
    np.testing.assert_allclose(out[1, :2], np.asarray(x)[1, 1::-1])
    np.testing.assert_allclose(out[1, 2:], np.asarray(x)[1, 2:])  # padding in place


def test_reverse_sequences_clamps_overlong_lengths(rng):
    """seq_len > time must degrade gracefully (clamped), not poison valid
    frames with take_along_axis's out-of-bounds NaN fill."""
    from morgana_tpu.ops.rnn import reverse_sequences
    x = jnp.array(rng.normal(size=(2, 4, 3)).astype(np.float32))
    out = np.asarray(reverse_sequences(x, jnp.array([5, 4])))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], np.asarray(x)[0, ::-1])  # clamped to 4
    np.testing.assert_allclose(out[1], np.asarray(x)[1, ::-1])


class TestWavefrontStack:
    """lstm_stack (diagonal wavefront) must match the sequential per-layer
    scan exactly: outputs, final states, and gradients, on ragged batches."""

    def _random_layers(self, rng, in_dim, hidden, num_layers):
        layers = []
        dims = [in_dim] + [hidden] * (num_layers - 1)
        for d in dims:
            layers.append(tuple(
                jnp.array(rng.normal(size=s).astype(np.float32)) * 0.1
                for s in ((d, 4 * hidden), (hidden, 4 * hidden),
                          (4 * hidden,), (4 * hidden,))))
        return layers

    def _sequential(self, x, layers, seq_len):
        finals = []
        for w_ih, w_hh, b_ih, b_hh in layers:
            x, hc = rnn_ops.lstm(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len)
            finals.append(hc)
        return x, finals

    @pytest.mark.parametrize('num_layers', [2, 4])
    def test_matches_sequential(self, num_layers, rng):
        B, T, I, H = 3, 17, 5, 8
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        seq_len = jnp.array([17, 9, 1])
        layers = self._random_layers(rng, I, H, num_layers)

        y_ref, fin_ref = self._sequential(x, layers, seq_len)
        y_wf, fin_wf = rnn_ops.lstm_stack(x, layers, seq_len=seq_len)

        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(y_ref), atol=1e-6)
        for (h_r, c_r), (h_w, c_w) in zip(fin_ref, fin_wf):
            np.testing.assert_allclose(np.asarray(h_w), np.asarray(h_r), atol=1e-6)
            np.testing.assert_allclose(np.asarray(c_w), np.asarray(c_r), atol=1e-6)

    def test_no_seq_len(self, rng):
        B, T, I, H = 2, 9, 4, 8
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        layers = self._random_layers(rng, I, H, 3)
        y_ref, _ = self._sequential(x, layers, None)
        y_wf, _ = rnn_ops.lstm_stack(x, layers)
        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(y_ref), atol=1e-6)

    def test_initial_states(self, rng):
        B, T, I, H = 2, 7, 4, 8
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        layers = self._random_layers(rng, I, H, 2)
        h0s = [(jnp.array(rng.normal(size=(B, H)).astype(np.float32)),
                jnp.array(rng.normal(size=(B, H)).astype(np.float32)))
               for _ in range(2)]
        seq_len = jnp.array([7, 3])

        x_ref, fin_ref = x, []
        for (w_ih, w_hh, b_ih, b_hh), (h0, c0) in zip(layers, h0s):
            x_ref, hc = rnn_ops.lstm(x_ref, w_ih, w_hh, b_ih, b_hh,
                                     seq_len=seq_len, h0=h0, c0=c0)
            fin_ref.append(hc)
        y_wf, fin_wf = rnn_ops.lstm_stack(x, layers, seq_len=seq_len, h0s=h0s)
        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(x_ref), atol=1e-6)
        for (h_r, c_r), (h_w, c_w) in zip(fin_ref, fin_wf):
            np.testing.assert_allclose(np.asarray(h_w), np.asarray(h_r), atol=1e-6)

    def test_gradients_match_sequential(self, rng):
        import jax
        B, T, I, H = 2, 11, 4, 8
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        seq_len = jnp.array([11, 6])
        layers = self._random_layers(rng, I, H, 3)

        def loss_seq(layers, x):
            y, finals = self._sequential(x, layers, seq_len)
            return jnp.sum(y ** 2) + sum(jnp.sum(h) + 0.5 * jnp.sum(c)
                                         for h, c in finals)

        def loss_wf(layers, x):
            y, finals = rnn_ops.lstm_stack(x, layers, seq_len=seq_len)
            return jnp.sum(y ** 2) + sum(jnp.sum(h) + 0.5 * jnp.sum(c)
                                         for h, c in finals)

        g_ref = jax.grad(loss_seq, argnums=(0, 1))(layers, x)
        g_wf = jax.grad(loss_wf, argnums=(0, 1))(layers, x)
        flat_ref = jax.tree_util.tree_leaves(g_ref)
        flat_wf = jax.tree_util.tree_leaves(g_wf)
        for a, b in zip(flat_ref, flat_wf):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-5, rtol=1e-4)

    def test_single_layer_falls_back(self, rng):
        B, T, I, H = 2, 6, 4, 8
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        layers = self._random_layers(rng, I, H, 1)
        y_ref, _ = self._sequential(x, layers, None)
        y_wf, finals = rnn_ops.lstm_stack(x, layers)
        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(y_ref), atol=1e-6)
        assert len(finals) == 1


class TestGRUWavefrontStack:
    def _random_layers(self, rng, in_dim, hidden, num_layers):
        layers = []
        dims = [in_dim] + [hidden] * (num_layers - 1)
        for d in dims:
            layers.append(tuple(
                jnp.array(rng.normal(size=s).astype(np.float32)) * 0.1
                for s in ((d, 3 * hidden), (hidden, 3 * hidden),
                          (3 * hidden,), (3 * hidden,))))
        return layers

    def _sequential(self, x, layers, seq_len, h0s=None):
        finals = []
        for i, (w_ih, w_hh, b_ih, b_hh) in enumerate(layers):
            h0 = h0s[i] if h0s else None
            x, h = rnn_ops.gru(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len, h0=h0)
            finals.append(h)
        return x, finals

    @pytest.mark.parametrize('num_layers', [2, 3])
    def test_matches_sequential(self, num_layers, rng):
        B, T, I, H = 3, 13, 5, 8
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        seq_len = jnp.array([13, 7, 1])
        layers = self._random_layers(rng, I, H, num_layers)

        y_ref, fin_ref = self._sequential(x, layers, seq_len)
        y_wf, fin_wf = rnn_ops.gru_stack(x, layers, seq_len=seq_len)
        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(y_ref), atol=1e-6)
        for h_r, h_w in zip(fin_ref, fin_wf):
            np.testing.assert_allclose(np.asarray(h_w), np.asarray(h_r), atol=1e-6)

    def test_gradients_and_h0(self, rng):
        import jax
        B, T, I, H = 2, 9, 4, 8
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        seq_len = jnp.array([9, 4])
        layers = self._random_layers(rng, I, H, 2)
        h0s = [jnp.array(rng.normal(size=(B, H)).astype(np.float32))
               for _ in range(2)]

        def loss(stack_fn, layers, x):
            y, finals = stack_fn(layers, x)
            return jnp.sum(y ** 2) + sum(jnp.sum(h) for h in finals)

        seq_fn = lambda layers, x: self._sequential(x, layers, seq_len, h0s)
        wf_fn = lambda layers, x: rnn_ops.gru_stack(x, layers, seq_len=seq_len, h0s=h0s)
        g_ref = jax.grad(loss, argnums=(1, 2))(seq_fn, layers, x)
        g_wf = jax.grad(loss, argnums=(1, 2))(wf_fn, layers, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_wf)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-5, rtol=1e-4)

    def test_recurrent_module_gru_wavefront(self, rng):
        nn.manual_seed(0)
        wf = nn.Recurrent('gru', 6, 16, num_layers=3, backend='wavefront')
        nn.manual_seed(0)
        ref = nn.Recurrent('gru', 6, 16, num_layers=3)
        x = jnp.array(rng.normal(size=(2, 12, 6)).astype(np.float32))
        seq_len = jnp.array([12, 5])
        y_wf, h_wf = wf(x, seq_len=seq_len)
        y_ref, h_ref = ref(x, seq_len=seq_len)
        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(y_ref), atol=1e-6)
        for hw, hr in zip(h_wf, h_ref):
            np.testing.assert_allclose(np.asarray(hw), np.asarray(hr), atol=1e-6)


class TestWavefrontDropout:
    """Inter-layer dropout under the wavefront backend: masks applied inside
    the diagonal scan must equal masking between sequential layers."""

    def test_ops_masks_match_sequential(self, rng):
        B, T, I, H, L = 3, 11, 5, 8, 3
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        seq_len = jnp.array([11, 6, 2])
        layers = TestWavefrontStack()._random_layers(rng, I, H, L)
        keep = 0.6
        masks = [jnp.array((rng.random((B, T, H)) < keep).astype(np.float32)) / keep
                 for _ in range(L - 1)]

        x_ref, fin_ref = x, []
        for i, (w_ih, w_hh, b_ih, b_hh) in enumerate(layers):
            x_ref, hc = rnn_ops.lstm(x_ref, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len)
            fin_ref.append(hc)
            if i < L - 1:
                x_ref = x_ref * masks[i]
        y_wf, fin_wf = rnn_ops.lstm_stack(x, layers, seq_len=seq_len,
                                          dropout_masks=masks)
        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(x_ref), atol=1e-6)
        for (h_r, c_r), (h_w, c_w) in zip(fin_ref, fin_wf):
            np.testing.assert_allclose(np.asarray(h_w), np.asarray(h_r), atol=1e-6)
            np.testing.assert_allclose(np.asarray(c_w), np.asarray(c_r), atol=1e-6)

    def test_module_training_matches_scan_backend(self, rng):
        """Same bound rng => identical mask draws => identical training-mode
        outputs from the wavefront and sequential backends (the flagship
        config has dropout > 0, so this is the config that must work)."""
        import jax
        nn.manual_seed(0)
        wf = nn.Recurrent('lstm', 6, 16, num_layers=3, dropout=0.4,
                          backend='wavefront')
        nn.manual_seed(0)
        ref = nn.Recurrent('lstm', 6, 16, num_layers=3, dropout=0.4)
        x = jnp.array(rng.normal(size=(3, 12, 6)).astype(np.float32))
        seq_len = jnp.array([12, 7, 3])
        key = jax.random.PRNGKey(42)

        with nn.bind(wf, nn.parameters(wf), rng=key, train=True):
            y_wf, h_wf = wf(x, seq_len=seq_len)
        with nn.bind(ref, nn.parameters(ref), rng=key, train=True):
            y_ref, h_ref = ref(x, seq_len=seq_len)
        with nn.bind(ref, nn.parameters(ref), rng=key, train=False):
            y_eval, _ = ref(x, seq_len=seq_len)

        # Dropout was actually live (train != eval), and the backends agree.
        assert not np.allclose(np.asarray(y_ref), np.asarray(y_eval))
        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(y_ref), atol=1e-6)
        for (h_w, c_w), (h_r, c_r) in zip(h_wf, h_ref):
            np.testing.assert_allclose(np.asarray(h_w), np.asarray(h_r), atol=1e-6)
            np.testing.assert_allclose(np.asarray(c_w), np.asarray(c_r), atol=1e-6)

    def test_gradients_match_sequential_with_masks(self, rng):
        """Training with wavefront dropout is exact end-to-end: gradients
        through the diagonal-rearranged masks equal the sequential stack's
        gradients through per-boundary masking."""
        import jax
        B, T, I, H, L = 2, 9, 4, 8, 3
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        seq_len = jnp.array([9, 5])
        layers = TestWavefrontStack()._random_layers(rng, I, H, L)
        masks = [jnp.array((rng.random((B, T, H)) < 0.6).astype(np.float32)) / 0.6
                 for _ in range(L - 1)]

        def loss_seq(layers, x):
            h = x
            for i, (w_ih, w_hh, b_ih, b_hh) in enumerate(layers):
                h, _ = rnn_ops.lstm(h, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len)
                if i < L - 1:
                    h = h * masks[i]
            return jnp.sum(h ** 2)

        def loss_wf(layers, x):
            y, _ = rnn_ops.lstm_stack(x, layers, seq_len=seq_len,
                                      dropout_masks=masks)
            return jnp.sum(y ** 2)

        g_ref = jax.grad(loss_seq, argnums=(0, 1))(layers, x)
        g_wf = jax.grad(loss_wf, argnums=(0, 1))(layers, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_wf)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-5, rtol=1e-4)

    def test_eval_mode_draws_no_masks(self, rng):
        """Outside training, the wavefront backend must not consume rng or
        apply masks — identical to the no-dropout stack."""
        nn.manual_seed(0)
        wf = nn.Recurrent('gru', 6, 16, num_layers=2, dropout=0.5,
                          backend='wavefront')
        nn.manual_seed(0)
        plain = nn.Recurrent('gru', 6, 16, num_layers=2, backend='wavefront')
        x = jnp.array(rng.normal(size=(2, 9, 6)).astype(np.float32))
        with nn.bind(wf, nn.parameters(wf), train=False):
            y_do, _ = wf(x)
        with nn.bind(plain, nn.parameters(plain), train=False):
            y_plain, _ = plain(x)
        np.testing.assert_allclose(np.asarray(y_do), np.asarray(y_plain), atol=0)


class TestWavefrontEdgeCases:
    def test_eight_layers_bf16_compute(self, rng):
        """Bench-like depth with the bf16 compute path: wavefront stays close
        to the sequential stack (bf16 matmul rounding differs slightly)."""
        B, T, I, H = 2, 12, 8, 16
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        seq_len = jnp.array([12, 5])
        layers = []
        dims = [I] + [H] * 7
        for d in dims:
            layers.append(tuple(
                jnp.array(rng.normal(size=s).astype(np.float32)) * 0.1
                for s in ((d, 4 * H), (H, 4 * H), (4 * H,), (4 * H,))))

        x_ref = x
        for w_ih, w_hh, b_ih, b_hh in layers:
            x_ref, _ = rnn_ops.lstm(x_ref, w_ih, w_hh, b_ih, b_hh,
                                    seq_len=seq_len, compute_dtype='bfloat16')
        y_wf, _ = rnn_ops.lstm_stack(x, layers, seq_len=seq_len,
                                     compute_dtype='bfloat16')
        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(x_ref),
                                   atol=5e-3)

    def test_time_one(self, rng):
        B, T, I, H = 2, 1, 4, 8
        x = jnp.array(rng.normal(size=(B, T, I)).astype(np.float32))
        layers = [tuple(jnp.array(rng.normal(size=s).astype(np.float32)) * 0.1
                        for s in ((d, 4 * H), (H, 4 * H), (4 * H,), (4 * H,)))
                  for d in (I, H, H)]
        x_ref = x
        for w_ih, w_hh, b_ih, b_hh in layers:
            x_ref, _ = rnn_ops.lstm(x_ref, w_ih, w_hh, b_ih, b_hh)
        y_wf, _ = rnn_ops.lstm_stack(x, layers)
        np.testing.assert_allclose(np.asarray(y_wf), np.asarray(x_ref), atol=1e-6)
