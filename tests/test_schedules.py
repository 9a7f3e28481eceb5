"""Schedule parity tests: beta ramp, gamma two-phase, plateau LR vs torch."""

import math

import numpy as np
import pytest

from blurry_edges_tpu.train import schedules

from . import oracle

GAMMAS = {
    "color": (1.0, 0.1, 0.1),
    "color_cons": (0.2, 0.1, 0.05),
    "bndry_cons": (0.05, 0.05, 0.02),
    "smthns": (0.005, 0.1, 0.002),
    "smthns_cons": (0.005, 0.1, 0.002),
    "bndry_loc": (0.0001, 0.05, 0.0001),
    "depth": (0.0001, 0.05, 0.5),
}


def test_beta_ramp():
    # reference local_training.py:18-30: rate = idx/(de-1) below de, else 1
    de, b1, b2 = 200, 0.001, 0.0005
    assert schedules.beta_schedule(0, de, b1, b2) == (0.0, 0.0)
    bl, bs = schedules.beta_schedule(199, de, b1, b2)
    assert math.isclose(bl, b1) and math.isclose(bs, b2)
    bl, _ = schedules.beta_schedule(100, de, b1, b2)
    assert math.isclose(bl, 100 / 199 * b1)
    assert schedules.beta_schedule(500, de, b1, b2) == (b1, b2)


def test_gamma_two_phase():
    # reference global_training.py:28-51 with dynamic_epoch=[30,100,200]
    de = [30, 100, 200]
    g0 = schedules.gamma_schedule(0, de, GAMMAS)
    assert math.isclose(g0["color"], 1.0)
    g29 = schedules.gamma_schedule(29, de, GAMMAS)
    assert math.isclose(g29["color"], 0.1)  # fully ramped at e0-1
    g50 = schedules.gamma_schedule(50, de, GAMMAS)
    assert math.isclose(g50["color"], 0.1)  # hold phase
    g100 = schedules.gamma_schedule(100, de, GAMMAS)
    assert math.isclose(g100["depth"], 0.05)  # start of phase 1
    g199 = schedules.gamma_schedule(199, de, GAMMAS)
    assert math.isclose(g199["depth"], 0.5)  # fully ramped at e2-1
    g150 = schedules.gamma_schedule(150, de, GAMMAS)
    assert math.isclose(g150["depth"], 0.05 + 50 / 99 * (0.5 - 0.05))
    g300 = schedules.gamma_schedule(300, de, GAMMAS)
    assert math.isclose(g300["depth"], 0.5)
    fin = schedules.final_gamma(GAMMAS)
    assert fin["color"] == 0.1 and fin["depth"] == 0.5


def test_local_patience_growth():
    # reference local_training.py:112: 2 + int(log2(epoch+1)) * 3
    assert schedules.local_patience(0) == 2
    assert schedules.local_patience(1) == 5
    assert schedules.local_patience(7) == 11
    assert schedules.local_patience(999) == 2 + 9 * 3


@pytest.mark.skipif(not oracle.available(), reason="torch unavailable")
def test_plateau_matches_torch():
    import torch

    rng = np.random.default_rng(5)
    metrics = np.abs(rng.normal(size=60)).cumsum()[::-1] / 30 + rng.normal(size=60) * 0.05

    lr0 = 6e-5
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr0)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, "min", factor=0.9, patience=2, min_lr=lr0 * 0.1)
    ours = schedules.PlateauScheduler(lr=lr0, factor=0.9, patience=2, min_lr=lr0 * 0.1)

    for epoch, m in enumerate(metrics):
        tsched.step(float(m))
        lr_ours = ours.step(float(m))
        # mimic the reference's per-epoch patience mutation (local_training.py:111-112)
        tsched.patience = schedules.local_patience(epoch)
        ours.patience = schedules.local_patience(epoch)
        assert math.isclose(lr_ours, opt.param_groups[0]["lr"], rel_tol=1e-9), epoch
