"""Explicit tensor-parallel recurrence (parallel/tp_rnn.py) on the 8-device
virtual CPU mesh: the Megatron-style sharded stack must match the
single-device ops.rnn kernels exactly — outputs, final states, and the
gradients that flow back through the per-timestep all_gather."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morgana_tpu import parallel
from morgana_tpu.ops import rnn as rnn_ops
from morgana_tpu.parallel import tp_rnn

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def _torch_layout_layers(rng, mode, num_layers, in_dim, hidden):
    gates = 4 if mode == 'lstm' else 3
    layers = []
    for i in range(num_layers):
        d = in_dim if i == 0 else hidden
        layers.append(tuple(
            jnp.asarray(rng.normal(scale=0.3, size=shape).astype(np.float32))
            for shape in [(d, gates * hidden), (hidden, gates * hidden),
                          (gates * hidden,), (gates * hidden,)]))
    return layers


def _to_tp_layers(layers, mode):
    if mode == 'lstm':
        # LSTM folds both biases input-side (ops.rnn.lstm does the same).
        return [(tp_rnn.gate_major(w_ih, 4), tp_rnn.gate_major(w_hh, 4),
                 tp_rnn.gate_major(b_ih + b_hh, 4))
                for w_ih, w_hh, b_ih, b_hh in layers]
    return [(tp_rnn.gate_major(w_ih, 3), tp_rnn.gate_major(w_hh, 3),
             tp_rnn.gate_major(b_ih, 3), tp_rnn.gate_major(b_hh, 3))
            for w_ih, w_hh, b_ih, b_hh in layers]


def _reference_stack(x, layers, mode, seq_len):
    states = []
    for w_ih, w_hh, b_ih, b_hh in layers:
        if mode == 'lstm':
            x, hc = rnn_ops.lstm(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len)
        else:
            x, hc = rnn_ops.gru(x, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len)
        states.append(hc)
    return x, states


@pytest.mark.parametrize('mode', ['lstm', 'gru'])
@pytest.mark.parametrize('num_model', [2, 4, 8])
def test_tp_stack_matches_single_device(mode, num_model, rng):
    batch, time, in_dim, hidden, num_layers = 4, 12, 10, 16, 2
    x = jnp.asarray(rng.normal(size=(batch, time, in_dim)).astype(np.float32))
    seq_len = jnp.asarray([12, 7, 1, 9], jnp.int32)
    layers = _torch_layout_layers(rng, mode, num_layers, in_dim, hidden)

    y_ref, states_ref = _reference_stack(x, layers, mode, seq_len)

    mesh = parallel.make_mesh(num_data=1, num_model=num_model)
    run = tp_rnn.build_tp_stack(mesh, mode=mode)
    y_tp, states_tp = run(x, _to_tp_layers(layers, mode), seq_len)

    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    for s_tp, s_ref in zip(jax.tree_util.tree_leaves(states_tp),
                           jax.tree_util.tree_leaves(states_ref)):
        np.testing.assert_allclose(np.asarray(s_tp), np.asarray(s_ref),
                                   rtol=1e-5, atol=1e-6)


def test_tp_stack_dp_x_tp(rng):
    """Batch over 'data' AND hidden over 'model' at once (4 x 2 mesh)."""
    batch, time, in_dim, hidden = 8, 10, 6, 8
    x = jnp.asarray(rng.normal(size=(batch, time, in_dim)).astype(np.float32))
    seq_len = jnp.asarray([10, 3, 8, 1, 10, 5, 2, 7], jnp.int32)
    layers = _torch_layout_layers(rng, 'lstm', 2, in_dim, hidden)

    y_ref, _ = _reference_stack(x, layers, 'lstm', seq_len)

    mesh = parallel.make_mesh(num_data=4, num_model=2)
    run = tp_rnn.build_tp_stack(mesh, mode='lstm', data_axis='data')
    y_tp, _ = run(x, _to_tp_layers(layers, 'lstm'), seq_len)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_tp_gradients_match_single_device(rng):
    """A full TP training objective — stack + head + masked MSE — must give
    the same loss AND the same weight gradients as the unsharded program
    (the all_gather's transpose, a reduce-scatter, carries each device's
    cross-shard gradient contributions)."""
    batch, time, in_dim, hidden = 4, 8, 6, 8
    x = jnp.asarray(rng.normal(size=(batch, time, in_dim)).astype(np.float32))
    seq_len = jnp.asarray([8, 5, 2, 6], jnp.int32)
    target = jnp.asarray(rng.normal(size=(batch, time, 1)).astype(np.float32))
    w_head = jnp.asarray(rng.normal(scale=0.3, size=(hidden, 1)).astype(np.float32))
    layers = _torch_layout_layers(rng, 'lstm', 2, in_dim, hidden)
    frame_mask = (jnp.arange(time)[None, :] < seq_len[:, None]
                  ).astype(jnp.float32)[:, :, None]

    def ref_loss(params):
        layer_params, head = params
        y, _ = _reference_stack(x, layer_params, 'lstm', seq_len)
        pred = y @ head
        return jnp.sum(((pred - target) ** 2) * frame_mask) / jnp.sum(frame_mask)

    loss_ref, grads_ref = jax.value_and_grad(ref_loss)((layers, w_head))

    mesh = parallel.make_mesh(num_data=1, num_model=4)
    from jax.sharding import PartitionSpec as P
    wspec, bspec = P(None, None, 'model'), P(None, 'model')
    layer_spec = [(wspec, wspec, bspec)] * 2

    def tp_loss(params):
        layer_params, head = params
        y, _ = tp_rnn.tp_lstm_stack(x, layer_params, seq_len=seq_len)
        pred = y @ head              # head replicated; y gathered-full
        return jnp.sum(((pred - target) ** 2) * frame_mask) / jnp.sum(frame_mask)

    # TP weights are sharded leaves; the head is replicated — the gradient
    # rule (tp_value_and_grad docstring) treats the two differently.
    sharded = ([(True, True, True)] * 2, False)
    per_device = tp_rnn.tp_value_and_grad(tp_loss, sharded)

    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=((layer_spec, P()),),
        out_specs=(P(), (layer_spec, P())),
        check_vma=False)
    loss_tp, grads_tp = jax.jit(fn)((_to_tp_layers(layers, 'lstm'), w_head))

    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=1e-6)

    (layer_grads_ref, head_grad_ref) = grads_ref
    (layer_grads_tp, head_grad_tp) = grads_tp
    np.testing.assert_allclose(np.asarray(head_grad_tp),
                               np.asarray(head_grad_ref), rtol=1e-4, atol=1e-6)
    for (gw_ih, gw_hh, gb), (rw_ih, rw_hh, rb_ih, rb_hh) in zip(
            layer_grads_tp, layer_grads_ref):
        np.testing.assert_allclose(np.asarray(tp_rnn.gate_flat(gw_ih)),
                                   np.asarray(rw_ih), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(tp_rnn.gate_flat(gw_hh)),
                                   np.asarray(rw_hh), rtol=1e-4, atol=1e-6)
        # The folded bias's gradient equals each torch bias's gradient
        # (b_ih and b_hh enter as a sum for LSTM).
        np.testing.assert_allclose(np.asarray(tp_rnn.gate_flat(gb)),
                                   np.asarray(rb_ih), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rb_ih), np.asarray(rb_hh),
                                   rtol=1e-6, atol=0)


def test_gate_major_round_trip(rng):
    w = jnp.asarray(rng.normal(size=(10, 12)).astype(np.float32))
    gm = tp_rnn.gate_major(w, 4)
    assert gm.shape == (10, 4, 3)
    np.testing.assert_array_equal(np.asarray(tp_rnn.gate_flat(gm)),
                                  np.asarray(w))
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    assert tp_rnn.gate_major(b, 3).shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(tp_rnn.gate_flat(tp_rnn.gate_major(b, 3))),
                                  np.asarray(b))


def test_sharding_layout_is_gate_blocked():
    """The gate-major layout + NamedSharding gives each device ALL gates for
    its own hidden block — the property the flat torch layout cannot express
    (a contiguous split of 4H puts whole gates on single devices)."""
    mesh = parallel.make_mesh(num_data=1, num_model=4)
    hidden = 8
    w = jnp.arange(5 * 4 * hidden, dtype=jnp.float32).reshape(5, 4 * hidden)
    gm = tp_rnn.gate_major(w, 4)
    sharding, _, _ = tp_rnn.recurrent_tp_shardings(mesh, mode='lstm')
    placed = jax.device_put(gm, sharding)
    shard0 = np.asarray(placed.addressable_shards[0].data)
    assert shard0.shape == (5, 4, 2)
    # Device 0's block must equal hidden units 0..1 of EVERY gate.
    np.testing.assert_array_equal(shard0, np.asarray(gm[:, :, :2]))
