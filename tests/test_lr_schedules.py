"""LR schedule tests: golden values against torch.optim.lr_scheduler where a
torch equivalent exists, plus Noam/CyclicNoam/plateau behaviours."""
import numpy as np
import pytest

from morgana_tpu import lr_schedules

torch = pytest.importorskip('torch')


def _torch_lrs(schedule_ctor, base_lr, steps):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = schedule_ctor(opt)
    lrs = []
    for _ in range(steps):
        lrs.append(opt.param_groups[0]['lr'])
        opt.step()
        sched.step()
    return lrs


def _ours_lrs(name, base_lr, steps, **kwargs):
    sched = lr_schedules.init_lr_schedule(name, **kwargs)(base_lr)
    lrs = []
    for _ in range(steps):
        lrs.append(sched.lr)
        sched.step()
    return lrs


@pytest.mark.parametrize('name,torch_ctor,kwargs', [
    ('constant', lambda o: torch.optim.lr_scheduler.LambdaLR(o, lambda e: 1.0), {}),
    ('step', lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=3, gamma=0.5),
     {'step_size': 3, 'gamma': 0.5}),
    ('multi_step', lambda o: torch.optim.lr_scheduler.MultiStepLR(o, milestones=[2, 5], gamma=0.1),
     {'milestones': [2, 5], 'gamma': 0.1}),
    ('exponential', lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.9),
     {'gamma': 0.9}),
    ('cosine_annealing', lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(o, T_max=10),
     {'T_max': 10}),
])
def test_matches_torch(name, torch_ctor, kwargs):
    base_lr = 0.01
    expected = _torch_lrs(torch_ctor, base_lr, 10)
    got = _ours_lrs(name, base_lr, 10, **kwargs)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_registry_and_split():
    assert set(lr_schedules.EPOCH_LR_SCHEDULES) <= set(lr_schedules.SUPPORTED)
    assert set(lr_schedules.BATCH_LR_SCHEDULES) <= set(lr_schedules.SUPPORTED)
    assert 'plateau' in lr_schedules.SUPPORTED


def test_noam_shape():
    sched = lr_schedules.NoamLR(1.0, warmup_steps=100)
    lrs = []
    for _ in range(300):
        sched.step()
        lrs.append(sched.lr)
    peak = int(np.argmax(lrs))
    assert 95 <= peak + 1 <= 101  # peak at warmup_steps
    # scale at warmup = 1.0
    assert abs(max(lrs) - 1.0) < 1e-6
    # decay after warmup ~ sqrt
    assert abs(lrs[299] - (100 ** 0.5) * (300 ** -0.5)) < 1e-6


def test_cyclic_noam_repeats():
    sched = lr_schedules.CyclicNoamLR(1.0, warmup_steps=10, cycle_steps=50)
    lrs = [sched.compute(i) for i in range(1, 151)]
    np.testing.assert_allclose(lrs[:49], lrs[50:99], rtol=1e-6)


def test_plateau_reduces_on_stall():
    sched = lr_schedules.ReduceLROnPlateau(1.0, factor=0.5, patience=2)
    for _ in range(3):
        sched.step(metrics=1.0)  # first sets best, then 2 bad epochs
    assert sched.lr == 1.0
    sched.step(metrics=1.0)  # 3rd bad epoch > patience -> reduce
    assert sched.lr == 0.5
    sched.step(metrics=0.1)  # improvement resets
    sched.step(metrics=0.5)
    assert sched.lr == 0.5


def test_cyclic_triangular():
    sched = lr_schedules.CyclicLR(0.1, max_lr=1.0, step_size_up=10)
    lrs = [sched.compute(i) for i in range(41)]
    assert abs(lrs[0] - 0.1) < 1e-9
    assert abs(lrs[10] - 1.0) < 1e-9
    assert abs(lrs[20] - 0.1) < 1e-9
    np.testing.assert_allclose(lrs[:20], lrs[20:40], rtol=1e-9)


def test_resume_honours_new_base_lr():
    """Resuming with a different --learning_rate must keep the NEW base:
    load_state_dict restores progress (step position, plateau reductions),
    not construction-time config."""
    old = lr_schedules.NoamLR(0.01, warmup_steps=10)
    for _ in range(25):
        old.step()
    state = old.state_dict()

    new = lr_schedules.NoamLR(0.001, warmup_steps=10)
    new.load_state_dict(state)
    assert new.base_lr == 0.001
    assert new.last_epoch == old.last_epoch
    np.testing.assert_allclose(new.lr, old.lr * 0.1, rtol=1e-9)
    # Deterministic consistency: equals a fresh schedule stepped as far.
    fresh = lr_schedules.NoamLR(0.001, warmup_steps=10)
    for _ in range(25):
        fresh.step()
    np.testing.assert_allclose(new.lr, fresh.lr, rtol=1e-9)

    # Plateau: multiplicative reductions carry across the base change.
    plat = lr_schedules.ReduceLROnPlateau(1.0, factor=0.5, patience=0)
    plat.step(metrics=1.0)
    plat.step(metrics=2.0)  # worse -> reduce
    state = plat.state_dict()
    resumed = lr_schedules.ReduceLROnPlateau(0.1, factor=0.5, patience=0)
    resumed.load_state_dict(state)
    np.testing.assert_allclose(resumed.lr, plat.lr * 0.1, rtol=1e-9)
