"""The north-star parity test: a torch model with the reference F0Model
architecture and a morgana_tpu F0Model loaded with ITS weights must produce
matching lf0 outputs (BASELINE.json target: lf0 RMSE parity within 1e-3)."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp

from morgana_tpu import migrate, nn
from morgana_tpu.viz.synthesis import MLPG

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'models'))


def _build_torch_f0_net():
    """The reference F0Model network (models/f0_test_model.py:28-45) in torch,
    with RecurrentCuDNNWrapper-style naming (submodule 'layer')."""

    class Wrapper(torch.nn.Module):
        def __init__(self, layer):
            super().__init__()
            self.layer = layer

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = torch.nn.ModuleList([
                torch.nn.Linear(609, 256),
                torch.nn.Sigmoid(),
                torch.nn.Dropout(0.),
                Wrapper(torch.nn.GRU(256, 64, batch_first=True)),
                torch.nn.Dropout(0.),
                Wrapper(torch.nn.GRU(64, 64, batch_first=True)),
                torch.nn.Dropout(0.),
                Wrapper(torch.nn.GRU(64, 64, batch_first=True)),
                torch.nn.Dropout(0.),
                torch.nn.Linear(64, 64),
                torch.nn.Sigmoid(),
                torch.nn.Dropout(0.),
                torch.nn.Linear(64, 3),
            ])

        def forward(self, x):
            h = x
            for m in self.layers:
                if isinstance(m, Wrapper):
                    h, _ = m.layer(h)
                else:
                    h = m(h)
            return h

    return RefNet()


class TestTorchMigration:
    def test_name_map(self):
        from f0_test_model import F0Model
        nn.manual_seed(0)
        model = F0Model()
        mapping = migrate.torch_name_map(model)
        assert mapping['layers.0.weight'] == 'layers.0.weight'
        assert mapping['layers.3.w_ih_l0'] == 'layers.3.layer.weight_ih_l0'
        assert mapping['layers.12.bias'] == 'layers.12.bias'

    def test_f0_network_forward_parity(self, rng):
        """Torch-trained weights -> identical network outputs (<=2e-5)."""
        from f0_test_model import F0Model

        torch.manual_seed(1234567890)
        ref = _build_torch_f0_net()
        nn.manual_seed(0)
        model = F0Model()
        migrate.load_torch_state_dict(model, ref.state_dict())

        x = rng.normal(size=(3, 50, 609)).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.tensor(x)).numpy()
        y_ours = np.asarray(model.layers(jnp.array(x),
                                         seq_len=jnp.array([50, 50, 50])))
        np.testing.assert_allclose(y_ours, y_ref, atol=2e-5)

    def test_acoustic_model_network_parity(self, rng):
        """LSTMAcousticModel (mcep/bap streams) network parity with torch."""
        from rnn_spss import LSTMAcousticModel

        class Wrapper(torch.nn.Module):
            def __init__(self, layer):
                super().__init__()
                self.layer = layer

        class RefNet(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = torch.nn.ModuleList([
                    torch.nn.Linear(609, 64),
                    torch.nn.Sigmoid(),
                    torch.nn.Dropout(0.),
                    Wrapper(torch.nn.LSTM(64, 64, batch_first=True)),
                    Wrapper(torch.nn.LSTM(64, 64, batch_first=True)),
                    torch.nn.Linear(64, 256),
                    torch.nn.Sigmoid(),
                    torch.nn.Dropout(0.),
                    torch.nn.Linear(256, 199),
                ])

            def forward(self, x):
                h = x
                for m in self.layers:
                    if isinstance(m, Wrapper):
                        h, _ = m.layer(h)
                    else:
                        h = m(h)
                return h

        torch.manual_seed(9)
        ref = RefNet()
        nn.manual_seed(0)
        model = LSTMAcousticModel(num_layers=2, hidden_size=64)
        migrate.load_torch_state_dict(model, ref.state_dict())

        x = rng.normal(size=(2, 40, 609)).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.tensor(x)).numpy()
        y_ours = np.asarray(model.layers(jnp.array(x), seq_len=jnp.array([40, 40])))
        np.testing.assert_allclose(y_ours, y_ref, atol=3e-5)

    def test_lf0_rmse_parity_north_star(self, rng):
        """End-to-end lf0 parity incl. denormalisation and MLPG: RMSE of our
        lf0 trajectory vs the torch-reference pipeline <= 1e-3."""
        from f0_test_model import F0Model

        torch.manual_seed(42)
        ref = _build_torch_f0_net()
        nn.manual_seed(0)
        model = F0Model()
        migrate.load_torch_state_dict(model, ref.state_dict())

        # Shared normaliser parameters.
        mean = np.float32([5.0, 0.0, 0.0])
        std = np.float32([0.2, 0.05, 0.02])
        model.normalisers = {}
        lf0_norm = model.normaliser_sources()['lf0']
        lf0_norm.params = {'mean': mean[:1], 'std_dev': std[:1]}
        lf0_norm.delta_params = {'mean': mean, 'std_dev': std}
        model.normalisers['lf0'] = lf0_norm

        batch, frames = 2, 60
        x = rng.normal(size=(batch, frames, 609)).astype(np.float32)
        seq_len = np.array([60, 45])

        # Torch reference pipeline: network -> denorm -> float64 MLPG.
        with torch.no_grad():
            pred_norm = ref(torch.tensor(x)).numpy()
        # Zero padded region like the masked scan does.
        pred_norm[1, 45:] = 0.
        pred_deltas = pred_norm * std + mean
        gv = (std ** 2).astype(np.float32)
        lf0_ref = MLPG(pred_deltas, gv, padding_size=100, seq_len=seq_len,
                       backend='numpy')[:, :, 0]

        # Our pipeline (network + denorm + on-device MLPG), driven with the
        # same network inputs to isolate the compute path.
        pred_norm_ours = np.asarray(model.layers(jnp.array(x),
                                                 seq_len=jnp.array(seq_len)))
        pred_deltas_ours = np.asarray(
            model.normalisers['lf0'].denormalise(jnp.array(pred_norm_ours), deltas=True))
        lf0_ours = np.asarray(MLPG(jnp.array(pred_deltas_ours), gv,
                                   padding_size=100,
                                   seq_len=jnp.array(seq_len)))[:, :, 0]

        # Masked RMSE in lf0 domain.
        mask = np.zeros((batch, frames))
        mask[0, :60] = 1
        mask[1, :45] = 1
        rmse = np.sqrt((((lf0_ours - lf0_ref) ** 2) * mask).sum() / mask.sum())
        assert rmse <= 1e-3, f'lf0 RMSE parity {rmse} exceeds 1e-3'


class TestTrainingTrajectoryParity:
    """Training itself (not just inference on migrated weights) matches the
    torch reference: same init (via migrate), same data, same Adam/lr, f32,
    no dropout -> per-epoch losses agree and the final nets agree to the lf0
    north-star tolerance (VERDICT r2 item 4).

    The torch side reproduces the reference train loop semantics
    (``morgana/experiment_builder.py:464-484``): per-batch Adam on the masked
    sequence loss, packing for the recurrent layer
    (``morgana/utils.py:333-393``).
    """

    LR = 0.005
    EPOCHS = 5
    BATCHES = 6
    B, T, IN_DIM = 4, 30, 10

    def _build_torch_net(self):
        class Wrapper(torch.nn.Module):
            def __init__(self, layer):
                super().__init__()
                self.layer = layer

        class RefNet(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = torch.nn.ModuleList([
                    torch.nn.Linear(10, 16),
                    torch.nn.Sigmoid(),
                    Wrapper(torch.nn.GRU(16, 16, batch_first=True)),
                    torch.nn.Linear(16, 3),
                ])

            def forward(self, x, seq_len):
                h = x
                for m in self.layers:
                    if isinstance(m, Wrapper):
                        packed = torch.nn.utils.rnn.pack_padded_sequence(
                            h, seq_len, batch_first=True, enforce_sorted=False)
                        out, _ = m.layer(packed)
                        h, _ = torch.nn.utils.rnn.pad_packed_sequence(
                            out, batch_first=True, total_length=h.shape[1])
                    else:
                        h = m(h)
                return h

        return RefNet()

    def _build_jax_net(self):
        class Net(nn.Module):
            def __init__(self):
                self.layers = nn.SequentialWithRecurrent(
                    nn.Linear(10, 16), nn.Sigmoid(),
                    nn.GRU(16, 16), nn.Linear(16, 3))

            def forward(self, x, seq_len):
                return self.layers(x, seq_len=seq_len)

        nn.manual_seed(0)
        return Net()

    @staticmethod
    def _torch_masked_mse(pred, target, seq_len):
        # Identical math to ops.losses.mse (reference morgana/losses.py:9-51).
        loss = (pred - target) ** 2
        t = torch.arange(pred.shape[1])[None, :]
        mask = (t < torch.as_tensor(seq_len)[:, None]).float()[:, :, None]
        per_seq = (loss * mask).sum(dim=1) / mask.sum(dim=1).clamp(min=1.)
        return per_seq.mean()

    def _make_data(self, rng):
        batches = []
        for _ in range(self.BATCHES):
            x = rng.normal(size=(self.B, self.T, self.IN_DIM)).astype(np.float32)
            y = rng.normal(size=(self.B, self.T, 3)).astype(np.float32) * 0.1 + 5.0
            seq_len = rng.integers(self.T // 2, self.T + 1, size=self.B)
            for b, n in enumerate(seq_len):   # zero padding like collate
                x[b, n:] = 0.
                y[b, n:] = 0.
            batches.append((x, y, seq_len.astype(np.int64)))
        return batches

    def run_trajectories(self):
        import jax
        from morgana_tpu import losses
        from morgana_tpu.training import apply_updates, build_optimizer

        torch.manual_seed(7)
        ref = self._build_torch_net()
        model = self._build_jax_net()
        migrate.load_torch_state_dict(model, ref.state_dict())

        data = self._make_data(np.random.default_rng(123))

        # Torch: the reference per-batch loop (Adam defaults, no schedules).
        opt_t = torch.optim.Adam(ref.parameters(), lr=self.LR)
        torch_epoch_losses = []
        for _ in range(self.EPOCHS):
            total = 0.
            for x, y, seq_len in data:
                opt_t.zero_grad()
                loss = self._torch_masked_mse(
                    ref(torch.tensor(x), torch.as_tensor(seq_len)),
                    torch.tensor(y), seq_len)
                loss.backward()
                opt_t.step()
                total += float(loss)
            torch_epoch_losses.append(total / len(data))

        # morgana_tpu: the fused jit step (same Adam math via optax).
        params = nn.parameters(model)
        optimizer = build_optimizer()
        opt_state = optimizer.init(params)

        def step(params, opt_state, x, y, seq_len):
            def loss_fn(p):
                with nn.bind(model, p, train=True):
                    pred = model(x, seq_len)
                return losses.mse(pred, y, seq_len=seq_len)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, opt_state, _, _u = apply_updates(
                optimizer, 0., params, opt_state, None, grads,
                jnp.float32(self.LR))
            return params, opt_state, loss

        step = jax.jit(step)
        jax_epoch_losses = []
        for _ in range(self.EPOCHS):
            total = 0.
            for x, y, seq_len in data:
                params, opt_state, loss = step(
                    params, opt_state, jnp.array(x), jnp.array(y),
                    jnp.array(seq_len))
                total += float(loss)
            jax_epoch_losses.append(total / len(data))

        # Final-net agreement on a held-out batch, through the lf0 pipeline
        # (denormalise + MLPG) — the north-star metric.
        x, _, seq_len = self._make_data(np.random.default_rng(99))[0]
        with torch.no_grad():
            out_ref = ref(torch.tensor(x), torch.as_tensor(seq_len)).numpy()
        with nn.bind(model, params, train=False):
            out_ours = np.asarray(model(jnp.array(x), jnp.array(seq_len)))

        mean = np.float32([5.0, 0.0, 0.0])
        std = np.float32([0.2, 0.05, 0.02])
        gv = (std ** 2).astype(np.float32)
        lf0_ref = MLPG(out_ref * std + mean, gv, padding_size=100,
                       seq_len=seq_len, backend='numpy')[:, :, 0]
        lf0_ours = np.asarray(MLPG(jnp.array(out_ours * std + mean), gv,
                                   padding_size=100,
                                   seq_len=jnp.array(seq_len)))[:, :, 0]
        mask = (np.arange(self.T)[None, :] < seq_len[:, None])
        lf0_rmse = float(np.sqrt((((lf0_ours - lf0_ref) ** 2) * mask).sum()
                                 / mask.sum()))
        return torch_epoch_losses, jax_epoch_losses, lf0_rmse

    def test_five_epoch_trajectory_matches(self):
        torch_losses, jax_losses, lf0_rmse = self.run_trajectories()
        # Losses must DECREASE (both frameworks actually learn) ...
        assert torch_losses[-1] < torch_losses[0]
        assert jax_losses[-1] < jax_losses[0]
        # ... along the SAME trajectory. f32 + identical Adam math keeps the
        # divergence to accumulated rounding (empirically ~1e-6 rel by epoch
        # 5); 1e-3 rel would catch any semantic difference in loss, masking,
        # packing or optimiser behaviour.
        np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3)
        # North star: trained-net lf0 agreement within 1e-3 (BASELINE.json).
        assert lf0_rmse <= 1e-3, f'post-training lf0 RMSE {lf0_rmse}'


class TestTransformerTrajectoryParity:
    """Same claim as TestTrainingTrajectoryParity for the SECOND flagship
    family: training the attention path (pre-LN transformer encoder) from a
    migrated torch init follows the torch trajectory — masking, GELU FFN,
    LayerNorm grads and Adam semantics all agree, not just the forward."""

    LR = 0.003
    EPOCHS = 5
    BATCHES = 6
    B, T, IN_DIM, D, HEADS, FF = 4, 18, 10, 24, 3, 48

    def _build_torch_net(self):
        class RefNet(torch.nn.Module):
            def __init__(self, cfg):
                super().__init__()
                self.inp = torch.nn.Linear(cfg.IN_DIM, cfg.D)
                layer = torch.nn.TransformerEncoderLayer(
                    cfg.D, cfg.HEADS, dim_feedforward=cfg.FF, dropout=0.0,
                    activation='gelu', batch_first=True, norm_first=True)
                self.encoder = torch.nn.TransformerEncoder(
                    layer, 2, norm=torch.nn.LayerNorm(cfg.D))
                self.out = torch.nn.Linear(cfg.D, 3)

            def forward(self, x, seq_len):
                h = self.inp(x)
                pad = torch.arange(x.shape[1])[None, :] \
                    >= torch.as_tensor(seq_len)[:, None]
                h = self.encoder(h, src_key_padding_mask=pad)
                return self.out(h)

        return RefNet(self)

    def _build_jax_net(self):
        cfg = self

        class Net(nn.Module):
            def __init__(self):
                self.inp = nn.Linear(cfg.IN_DIM, cfg.D)
                # add_positions=False: the torch reference net has no
                # positional table, and the trajectory claim is about
                # training semantics, not the (constant) position encoding.
                self.encoder = nn.TransformerEncoder(
                    2, cfg.D, cfg.HEADS, cfg.FF, add_positions=False)
                self.out = nn.Linear(cfg.D, 3)

            def forward(self, x, seq_len):
                return self.out(self.encoder(self.inp(x), seq_len=seq_len))

        nn.manual_seed(0)
        return Net()

    def test_five_epoch_trajectory_matches(self):
        import jax
        from morgana_tpu import losses
        from morgana_tpu.training import apply_updates, build_optimizer

        torch.manual_seed(11)
        ref = self._build_torch_net()
        model = self._build_jax_net()
        migrate.load_torch_state_dict(model, ref.state_dict())

        maker = TestTrainingTrajectoryParity()
        maker.BATCHES, maker.B, maker.T, maker.IN_DIM = \
            self.BATCHES, self.B, self.T, self.IN_DIM
        data = maker._make_data(np.random.default_rng(321))

        opt_t = torch.optim.Adam(ref.parameters(), lr=self.LR)
        torch_epoch_losses = []
        for _ in range(self.EPOCHS):
            total = 0.
            for x, y, seq_len in data:
                opt_t.zero_grad()
                loss = TestTrainingTrajectoryParity._torch_masked_mse(
                    ref(torch.tensor(x), torch.as_tensor(seq_len)),
                    torch.tensor(y), seq_len)
                loss.backward()
                opt_t.step()
                total += float(loss)
            torch_epoch_losses.append(total / len(data))

        params = nn.parameters(model)
        optimizer = build_optimizer()
        opt_state = optimizer.init(params)

        def step(params, opt_state, x, y, seq_len):
            def loss_fn(p):
                with nn.bind(model, p, train=True):
                    pred = model(x, seq_len)
                return losses.mse(pred, y, seq_len=seq_len)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, opt_state, _, _u = apply_updates(
                optimizer, 0., params, opt_state, None, grads,
                jnp.float32(self.LR))
            return params, opt_state, loss

        step = jax.jit(step)
        jax_epoch_losses = []
        for _ in range(self.EPOCHS):
            total = 0.
            for x, y, seq_len in data:
                params, opt_state, loss = step(
                    params, opt_state, jnp.array(x), jnp.array(y),
                    jnp.array(seq_len))
                total += float(loss)
            jax_epoch_losses.append(total / len(data))

        assert torch_epoch_losses[-1] < torch_epoch_losses[0]
        assert jax_epoch_losses[-1] < jax_epoch_losses[0]
        np.testing.assert_allclose(jax_epoch_losses, torch_epoch_losses,
                                   rtol=1e-3)

        # Final-net agreement on held-out data (valid regions).
        x, _, seq_len = maker._make_data(np.random.default_rng(77))[0]
        with torch.no_grad():
            out_ref = ref(torch.tensor(x), torch.as_tensor(seq_len)).numpy()
        with nn.bind(model, params, train=False):
            out_ours = np.asarray(model(jnp.array(x), jnp.array(seq_len)))
        for b, n in enumerate(seq_len):
            np.testing.assert_allclose(out_ours[b, :n], out_ref[b, :n],
                                       rtol=2e-3, atol=2e-3)


class TestMigrationEdgeCases:
    def test_square_embedding_not_transposed(self):
        """Embeddings share torch's (num_embeddings, dim) orientation; the
        square-matrix name heuristic must not transpose them."""
        class Emb(nn.Module):
            def __init__(self):
                self.table = nn.Embedding(8, 8)
                self.head = nn.Linear(8, 8)

            def forward(self, ids):
                return self.head(self.table(ids))

        nn.manual_seed(0)
        model = Emb()
        table = np.arange(64, dtype=np.float32).reshape(8, 8)
        head_w = np.arange(64, dtype=np.float32).reshape(8, 8) * 2
        sd = {'table.weight': table, 'head.weight': head_w,
              'head.bias': np.zeros(8, np.float32)}
        out = migrate.convert_torch_state_dict(model, sd)
        np.testing.assert_array_equal(out['table.weight'], table)   # untouched
        np.testing.assert_array_equal(out['head.weight'], head_w.T)  # Linear: transposed

    def test_plain_list_submodules(self):
        """Submodules held in a plain list attribute (supported by
        named_parameters) must migrate too."""
        class Listy(nn.Module):
            def __init__(self):
                self.blocks = [nn.Linear(4, 4), nn.Linear(4, 4)]

            def forward(self, x):
                for b in self.blocks:
                    x = b(x)
                return x

        nn.manual_seed(0)
        model = Listy()
        mapping = migrate.torch_name_map(model)
        assert mapping['blocks.0.weight'] == 'blocks.0.weight'
        sd = {f'blocks.{i}.{leaf}': np.zeros((4, 4) if leaf == 'weight' else 4,
                                             np.float32)
              for i in range(2) for leaf in ('weight', 'bias')}
        out = migrate.convert_torch_state_dict(model, sd)
        assert set(out) == set(mapping)

    def test_shape_mismatch_raises_at_migration(self):
        """A checkpoint from a different architecture must fail AT THE LOAD
        with both names and shapes, not as a confusing matmul error (or
        silent broadcast garbage) later."""
        nn.manual_seed(0)
        model = nn.Linear(4, 6)
        sd = {'weight': np.zeros((8, 3), np.float32),
              'bias': np.zeros(6, np.float32)}
        with pytest.raises(ValueError, match='weight'):
            migrate.convert_torch_state_dict(model, sd)

    def test_pathlib_path_loads(self, tmp_path):
        import pathlib

        import torch

        nn.manual_seed(0)
        model = nn.Linear(3, 2)
        sd = {'weight': torch.arange(6, dtype=torch.float32).reshape(2, 3),
              'bias': torch.zeros(2)}
        path = pathlib.Path(tmp_path) / 'ckpt.pt'
        torch.save(sd, path)
        out = migrate.load_torch_state_dict(model, path)
        np.testing.assert_array_equal(out['weight'],
                                      np.arange(6).reshape(2, 3).T)

    def test_cli_converts_checkpoint(self, rng, tmp_path):
        """python -m morgana_tpu.migrate: .pt in, loadable epoch_{N}.npz out,
        with forward parity against the torch source network."""
        import json
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        torch.manual_seed(7)
        ref = _build_torch_f0_net()
        pt = str(tmp_path / 'epoch_5.pt')
        torch.save(ref.state_dict(), pt)
        out = str(tmp_path / 'epoch_5.npz')
        proc = subprocess.run(
            [sys.executable, '-m', 'morgana_tpu.migrate',
             '--model', os.path.join(repo, 'models', 'f0_test_model.py')
             + ':F0Model',
             '--torch_checkpoint', pt, '--out', out],
            capture_output=True, text=True, cwd=repo)
        assert proc.returncode == 0, proc.stderr
        stats = json.loads(proc.stdout.strip().splitlines()[-1])
        assert stats['parameters_converted'] == stats['parameters_total']
        assert stats['out'] == out

        from f0_test_model import F0Model
        nn.manual_seed(0)
        model = F0Model()
        model.load_parameters(out)
        x = rng.normal(size=(2, 30, 609)).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.tensor(x)).numpy()
        y_ours = np.asarray(model.layers(jnp.array(x),
                                         seq_len=jnp.array([30, 30])))
        np.testing.assert_allclose(y_ours, y_ref, atol=2e-5)

    def test_cli_print_map(self):
        import json
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [sys.executable, '-m', 'morgana_tpu.migrate',
             '--model', os.path.join(repo, 'models', 'f0_test_model.py')
             + ':F0Model', '--print_map'],
            capture_output=True, text=True, cwd=repo)
        assert proc.returncode == 0, proc.stderr
        mapping = json.loads(proc.stdout)
        assert mapping['layers.3.w_ih_l0'] == 'layers.3.layer.weight_ih_l0'

    def test_strict_false_allows_missing(self):
        from f0_test_model import F0Model
        nn.manual_seed(0)
        model = F0Model()
        mapping = migrate.torch_name_map(model)
        full = {tname: np.zeros(model_shape(model, name), np.float32)
                for name, tname in mapping.items()}
        partial = dict(full)
        partial.pop(mapping['layers.0.weight'])
        with pytest.raises(KeyError):
            migrate.convert_torch_state_dict(model, partial)  # strict default
        out = migrate.convert_torch_state_dict(model, partial, strict=False)
        assert 'layers.0.weight' not in out and len(out) == len(full) - 1


def model_shape(model, name):
    shape = tuple(dict(model.named_parameters())[name].value.shape)
    # Produce the torch-side orientation for 2-d matrices.
    return shape[::-1] if len(shape) == 2 else shape
