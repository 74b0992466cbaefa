"""Optimizer registry (--optimizer): torch-parity for adam/adamw/sgd and the
LAMB trust-ratio math.

The reference hard-codes ``torch.optim.Adam`` (morgana/experiment_builder.py:516);
``build_optimizer('adam')`` reproduces it and is covered by
test_migrate_parity's trajectory test. Here the beyond-reference members are
held to the same standard: identical parameter trajectories to their torch
counterparts under the fused-step update convention (``p - lr * u``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from morgana_tpu import nn
from morgana_tpu.training import (SUPPORTED_OPTIMIZERS, apply_updates,
                                  build_optimizer)

LR = 0.05
STEPS = 12
IN_DIM, OUT_DIM, B = 5, 3, 8


def _data():
    rng = np.random.default_rng(42)
    x = rng.normal(size=(STEPS, B, IN_DIM)).astype(np.float32)
    y = rng.normal(size=(STEPS, B, OUT_DIM)).astype(np.float32)
    return x, y


def _torch_net():
    torch.manual_seed(11)
    return torch.nn.Linear(IN_DIM, OUT_DIM)


def _jax_net_like(ref):
    nn.manual_seed(0)
    model = nn.Linear(IN_DIM, OUT_DIM)
    params = nn.parameters(model)
    params['weight'] = jnp.asarray(ref.weight.detach().numpy().T)
    params['bias'] = jnp.asarray(ref.bias.detach().numpy())
    nn.load_parameters(model, params)
    return model


def _run_torch(opt_factory):
    ref = _torch_net()
    opt = opt_factory(ref.parameters())
    x, y = _data()
    for i in range(STEPS):
        opt.zero_grad()
        loss = torch.nn.functional.mse_loss(
            ref(torch.tensor(x[i])), torch.tensor(y[i]))
        loss.backward()
        opt.step()
    return (ref.weight.detach().numpy().T.copy(),
            ref.bias.detach().numpy().copy())


def _run_jax(optimizer):
    model = _jax_net_like(_torch_net())
    params = nn.parameters(model)
    opt_state = optimizer.init(params)
    x, y = _data()

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            with nn.bind(model, p, train=True):
                pred = model(xb)
            return jnp.mean((pred - yb) ** 2)
        grads = jax.grad(loss_fn)(params)
        params, opt_state, _, _u = apply_updates(
            optimizer, 0., params, opt_state, None, grads, jnp.float32(LR))
        return params, opt_state

    for i in range(STEPS):
        params, opt_state = step(params, opt_state, x[i], y[i])
    return np.asarray(params['weight']), np.asarray(params['bias'])


def _assert_matches_torch(opt_factory, optimizer, atol=1e-5):
    w_t, b_t = _run_torch(opt_factory)
    w_j, b_j = _run_jax(optimizer)
    np.testing.assert_allclose(w_j, w_t, rtol=1e-4, atol=atol)
    np.testing.assert_allclose(b_j, b_t, rtol=1e-4, atol=atol)


class TestTorchParity:
    def test_adamw(self):
        _assert_matches_torch(
            lambda p: torch.optim.AdamW(p, lr=LR, weight_decay=0.03),
            build_optimizer('adamw', weight_decay=0.03))

    def test_adamw_custom_betas(self):
        _assert_matches_torch(
            lambda p: torch.optim.AdamW(p, lr=LR, betas=(0.8, 0.95),
                                        eps=1e-6, weight_decay=0.01),
            build_optimizer('adamw', weight_decay=0.01, b1=0.8, b2=0.95,
                            eps=1e-6))

    def test_sgd_plain(self):
        _assert_matches_torch(lambda p: torch.optim.SGD(p, lr=LR),
                              build_optimizer('sgd'))

    def test_sgd_momentum_weight_decay(self):
        _assert_matches_torch(
            lambda p: torch.optim.SGD(p, lr=LR, momentum=0.9,
                                      weight_decay=0.02),
            build_optimizer('sgd', momentum=0.9, weight_decay=0.02))

    def test_sgd_nesterov(self):
        _assert_matches_torch(
            lambda p: torch.optim.SGD(p, lr=LR, momentum=0.9, nesterov=True),
            build_optimizer('sgd', momentum=0.9, nesterov=True))

    def test_sgd_nesterov_requires_momentum(self):
        """torch parity: nesterov without momentum is a config error, not
        silent plain SGD."""
        with pytest.raises(ValueError, match='momentum'):
            build_optimizer('sgd', nesterov=True)


class TestLamb:
    def test_trust_ratio_rescales_adamw_update(self):
        """One step: the LAMB update equals the AdamW update rescaled
        per-leaf by ||p|| / ||u|| (the You et al. 2020 trust ratio)."""
        model = _jax_net_like(_torch_net())
        params = nn.parameters(model)
        x, y = _data()

        def loss_fn(p):
            with nn.bind(model, p, train=True):
                pred = model(x[0])
            return jnp.mean((pred - y[0]) ** 2)

        grads = jax.grad(loss_fn)(params)
        adamw = build_optimizer('adamw', weight_decay=0.01)
        lamb = build_optimizer('lamb', weight_decay=0.01)
        u_adamw, _ = adamw.update(grads, adamw.init(params), params)
        u_lamb, _ = lamb.update(grads, lamb.init(params), params)
        for key in params:
            p_norm = float(jnp.linalg.norm(params[key]))
            u_norm = float(jnp.linalg.norm(u_adamw[key]))
            expected = np.asarray(u_adamw[key]) * (p_norm / u_norm)
            np.testing.assert_allclose(np.asarray(u_lamb[key]), expected,
                                       rtol=1e-5)

    def test_training_decreases_loss(self):
        model = _jax_net_like(_torch_net())
        params = nn.parameters(model)
        optimizer = build_optimizer('lamb', weight_decay=0.01)
        opt_state = optimizer.init(params)
        x, y = _data()

        def loss_fn(p, xb, yb):
            with nn.bind(model, p, train=True):
                pred = model(xb)
            return jnp.mean((pred - yb) ** 2)

        first = float(loss_fn(params, x[0], y[0]))
        for i in range(STEPS):
            grads = jax.grad(loss_fn)(params, x[i % STEPS], y[i % STEPS])
            params, opt_state, _, _u = apply_updates(
                optimizer, 0., params, opt_state, None, grads,
                jnp.float32(LR))
        assert float(loss_fn(params, x[0], y[0])) < first


class TestRegistry:
    def test_unknown_name_raises(self):
        with pytest.raises(ValueError, match='Unknown optimizer'):
            build_optimizer('adagrad')

    def test_all_supported_build(self):
        for name in SUPPORTED_OPTIMIZERS:
            build_optimizer(name, weight_decay=0.01, momentum=0.9)


class TestBuilderFlag:
    def test_optimizer_flag_trains(self, voice_data, tmp_path):
        from conftest import builder_args
        from tiny_models import TinyF0Model

        from morgana_tpu.experiment_builder import ExperimentBuilder
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            end_epoch=1, valid=False,
                            optimizer='adamw',
                            optimizer_kwargs={'b1': 0.85},
                            weight_decay=0.01)
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='opt_adamw',
                                **args)
        exp.run_experiment()
        # The chosen optimiser is persisted in config.json for reproduction.
        import json
        import os
        with open(os.path.join(exp.experiment_dir, 'config.json')) as f:
            config = json.load(f)
        assert config['optimizer'] == 'adamw'
        assert config['optimizer_kwargs'] == {'b1': 0.85}

    def test_cli_parses(self):
        import argparse

        from morgana_tpu.experiment_builder import ExperimentBuilder
        parser = argparse.ArgumentParser()
        ExperimentBuilder.add_args(parser)
        args = parser.parse_args(
            ['--experiment_name', 'x',
             '--optimizer', 'sgd',
             '--optimizer_kwargs', "{'momentum': 0.9, 'nesterov': True}"])
        assert args.optimizer == 'sgd'
        assert args.optimizer_kwargs == {'momentum': 0.9, 'nesterov': True}
