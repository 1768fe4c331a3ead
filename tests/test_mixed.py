"""Mixed road-network/free-space fleet system tests (BASELINE config 4).

The mixed scenario is a TPU extension (no reference analogue): one fleet
where road vehicles keep full lanelet semantics (boundary constraints,
corridor clipping, lanelet-prefiltered coupling) while free-space
vehicles run circle-crossing clusters with those constraints inert
(pdmpc_tpu/scenarios/mixed.py). CPU CI runs the 16-vehicle point; the
full 64-vehicle configuration is run on the TPU by bench.py
(extra.mixed_64veh) and asserted collision-free and deadlock-free.
"""

import numpy as np
import pytest

from pdmpc_tpu.config import ScenarioType
from pdmpc_tpu.experiment import create_scenario, run_experiment
from pdmpc_tpu.models.mpa import build_mpa
from pdmpc_tpu.scenarios.mixed import create_mixed_scenario
from tests.golden import compare_golden, vehicle_centers_offroad
from tests.test_controller import pairwise_vehicle_collisions
from tests.test_system_commonroad import GOLDEN_CONFIGS

CFG = GOLDEN_CONFIGS["mixed_16veh"]


@pytest.fixture(scope="module")
def result():
    return run_experiment(CFG)


@pytest.fixture(scope="module")
def scenario():
    cfg = CFG.validate()
    return create_scenario(cfg, build_mpa(cfg))


def n_road_vehicles(scenario):
    # free-space vehicles carry the single dummy lanelet 0
    return sum(
        1 for ids in scenario.lanelet_indices
        if any(int(i) != 0 for i in ids)
    )


def test_split(scenario):
    n_road = n_road_vehicles(scenario)
    assert n_road == 10               # 5/8 of 16
    assert len(scenario.lanelet_indices) - n_road == 6


def test_no_collisions(result):
    assert pairwise_vehicle_collisions(result) == []


def test_road_vehicles_on_road(result, scenario):
    n_road = n_road_vehicles(scenario)
    bad = vehicle_centers_offroad(result, scenario)
    assert [p for p in bad if p[1] < n_road] == []


def test_free_space_vehicles_progress(result, scenario):
    """Free-space crossers must actually cross (constraints inert for
    them, so nothing but mutual avoidance should slow them down)."""
    n_road = n_road_vehicles(scenario)
    poses = np.asarray(result.infos.poses)[:, :, 0]
    d = np.linalg.norm(poses[-1, n_road:, :2] - poses[0, n_road:, :2],
                       axis=-1)
    assert (d > 0.3).all(), f"free-space vehicles moved {d}"


def test_cross_group_coupling_possible(result, scenario):
    """Coupling spans the whole fleet: free-space crossers heading
    through a shared center must couple with each other."""
    adj = np.asarray(result.infos.adjacency)
    n_road = n_road_vehicles(scenario)
    assert adj[:, n_road:, n_road:].any(), (
        "no free-space vehicle ever coupled with another"
    )


def test_matches_golden(result):
    compare_golden("mixed_16veh", result)
