"""HDV (human-driven / manual vehicle) tests.

Reference: config/ManualControlConfig.m, scenarios/ManualVehicle.m,
HighLevelController HDV handling (:394-447).
"""

import numpy as np
import pytest

from pdmpc_tpu.config import Config, ManualControlConfig, ScenarioType
from pdmpc_tpu.experiment import run_experiment
from tests.test_controller import pairwise_vehicle_collisions


@pytest.fixture(scope="module")
def result():
    cfg = Config(
        scenario_type=ScenarioType.circle,
        amount=3,
        T_end=3.0,
        beam_width=96,
        manual_control_config=ManualControlConfig(
            is_active=True, amount=1, hdv_ids=(1,)
        ),
    )
    return run_experiment(cfg)


def test_hdv_follows_its_path(result):
    poses = np.asarray(result.infos.poses)[:, :, 0]
    # HDV (vehicle 1) drives its full reference path unimpeded
    d = np.linalg.norm(poses[-1, 1, :2] - poses[0, 1, :2])
    assert d > 2.0


def test_hdv_outside_coupling_graph(result):
    adj = np.asarray(result.infos.adjacency)
    assert not adj[:, 1, :].any()
    assert not adj[:, :, 1].any()


def test_cavs_avoid_hdv(result):
    assert pairwise_vehicle_collisions(result) == []


def test_hdv_never_falls_back(result):
    fb = np.asarray(result.infos.needs_fallback)
    assert not fb[:, 1].any()


def test_nonrecursive_reachability_is_larger():
    from pdmpc_tpu.models.mpa import build_mpa

    mpa = build_mpa(Config(scenario_type=ScenarioType.circle))

    def area(p):
        x, y = p[:, 0], p[:, 1]
        return 0.5 * abs(
            np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        )

    # HDVs need not reach the equilibrium: their late-horizon reachable
    # sets must be at least as large as the recursive-feasible ones
    a_recursive = area(mpa.local_reachable_sets_conv[6, -1])
    a_hdv = area(mpa.local_reachable_sets_nonrecursive[6, -1])
    assert a_hdv >= a_recursive
