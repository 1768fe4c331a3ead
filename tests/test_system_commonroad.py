"""Commonroad end-to-end system tests with golden trajectories.

Reference: tests/systemtests/systemtests.m:3-14 — full main() runs
compared against stored golden results — plus the 20-vehicle CPM scenario
(the headline correctness target, BASELINE.md) asserted collision-free,
on-road, deadlock-free, and deterministic.
"""

import numpy as np
import pytest

from pdmpc_tpu.config import (
    Config,
    MpaType,
    PriorityStrategies,
    ScenarioType,
)
from pdmpc_tpu.experiment import create_scenario, run_experiment
from pdmpc_tpu.models.mpa import build_mpa
from tests.golden import compare_golden, vehicle_centers_offroad
from tests.test_controller import pairwise_vehicle_collisions

# the 3-vehicle config mirrors the reference CI scale
# (Config_systemtests_prioritized.json: 3 vehicles, T_end = 4 s)
GOLDEN_CONFIGS = {
    "commonroad_03veh": Config(
        scenario_type=ScenarioType.commonroad, amount=3, T_end=4.0,
        beam_width=64,
    ),
    # headline scenario at the reference CI horizon (T_end = 4 s,
    # Config_systemtests_prioritized.json)
    "commonroad_20veh": Config(
        scenario_type=ScenarioType.commonroad, amount=20, T_end=4.0,
        beam_width=64,
    ),
    # long-horizon operating point: Hp=10 MPA built by the DP reachability
    # composition (eval_phd's circle arms use Hp=10, eval/phd.py)
    "circle_03veh_hp10": Config(
        scenario_type=ScenarioType.circle, amount=3, T_end=2.0, Hp=10,
        beam_width=128,
    ),
    # the other two MPA families end-to-end (systemtests.m:3-14 spans
    # mpa_type; choose_trims.m:37,85) — see tests/test_mpa_families.py
    "commonroad_03veh_triple": Config(
        scenario_type=ScenarioType.commonroad, amount=3, T_end=2.0,
        beam_width=128, mpa_type=MpaType.triple_speed,
    ),
    "circle_03veh_realistic": Config(
        scenario_type=ScenarioType.circle, amount=3, T_end=2.0,
        beam_width=128, mpa_type=MpaType.realistic,
    ),
    # the mixed road/free-space fleet (BASELINE.json config 4) at CPU-CI
    # scale: 10 road vehicles + 6 free-space circle-crossers; the full
    # 64-vehicle configuration runs on the TPU in bench.py
    "mixed_16veh": Config(
        scenario_type=ScenarioType.mixed, amount=16, T_end=1.0,
        beam_width=64,
    ),
}

# TPU-only goldens (generated with `python -m tests.replace_expected_results
# --tpu`, checked by bench._golden_crosscheck on the device): the bench
# HEADLINE configuration — cr20 with coloring priorities at beam 256 — so a
# numeric drift on the coloring path cannot reach the published headline
# unflagged (the reference gates every mode through the same goldens,
# tests/systemtests/systemtests.m:3-14). The cr3 constant-priority TPU
# golden lives in GOLDEN_CONFIGS["commonroad_03veh"].
TPU_GOLDEN_CONFIGS = {
    "commonroad_20veh_coloring": Config(
        scenario_type=ScenarioType.commonroad, amount=20, T_end=4.0,
        beam_width=256, priority=PriorityStrategies.coloring_priority,
    ),
}


@pytest.fixture(scope="module")
def result_3veh():
    return run_experiment(GOLDEN_CONFIGS["commonroad_03veh"])


@pytest.fixture(scope="module")
def result_20veh():
    return run_experiment(GOLDEN_CONFIGS["commonroad_20veh"])


class TestThreeVehicles:
    def test_no_collisions(self, result_3veh):
        assert pairwise_vehicle_collisions(result_3veh) == []

    def test_on_road(self, result_3veh):
        cfg = GOLDEN_CONFIGS["commonroad_03veh"].validate()
        scenario = create_scenario(cfg, build_mpa(cfg))
        assert vehicle_centers_offroad(result_3veh, scenario) == []

    def test_no_deadlock(self, result_3veh):
        poses = np.asarray(result_3veh.infos.poses)[:, :, 0]
        d = np.linalg.norm(poses[-1, :, :2] - poses[0, :, :2], axis=-1)
        assert (d > 0.5).all(), f"stuck vehicles: moved {d}"

    def test_deterministic(self, result_3veh):
        r2 = run_experiment(GOLDEN_CONFIGS["commonroad_03veh"])
        np.testing.assert_array_equal(
            np.asarray(result_3veh.infos.poses),
            np.asarray(r2.infos.poses),
        )

    def test_matches_golden(self, result_3veh):
        compare_golden("commonroad_03veh", result_3veh)


class TestTwentyVehicles:
    """The headline 20-vehicle CPM scenario (BASELINE.md correctness
    target)."""

    def test_no_collisions(self, result_20veh):
        assert pairwise_vehicle_collisions(result_20veh) == []

    def test_on_road(self, result_20veh):
        cfg = GOLDEN_CONFIGS["commonroad_20veh"].validate()
        scenario = create_scenario(cfg, build_mpa(cfg))
        assert vehicle_centers_offroad(result_20veh, scenario) == []

    def test_no_deadlock(self, result_20veh):
        poses = np.asarray(result_20veh.infos.poses)[:, :, 0]
        d = np.linalg.norm(poses[-1, :, :2] - poses[0, :, :2], axis=-1)
        assert (d > 0.3).all(), f"stuck vehicles: moved {d}"

    def test_fallbacks_bounded(self, result_20veh):
        # fallback propagation may fire under congestion, but a majority
        # falling back every step would mean the planner is broken
        fb = np.asarray(result_20veh.infos.needs_fallback)
        assert fb.mean() < 0.5

    def test_matches_golden(self, result_20veh):
        compare_golden("commonroad_20veh", result_20veh)
