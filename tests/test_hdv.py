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


class TestHdvDirectionalCoupling:
    """is_hdv_behind.m: a CAV only avoids an HDV that is not behind it."""

    @pytest.fixture(scope="class")
    def road_tensors(self):
        from pdmpc_tpu.scenarios.road import get_road_data
        from pdmpc_tpu.scenarios.scenario import road_to_tensors

        return get_road_data(), road_to_tensors(get_road_data())

    def test_predecessor_matrix(self, road_tensors):
        road, rt = road_tensors
        pred = np.asarray(rt.hdv_predecessor)
        # every direct predecessor relation is geometrically consecutive
        found = 0
        for ll in road.lanelets:
            for p in ll.predecessors:
                assert pred[ll.lanelet_id, p], (
                    f"lanelet {p} should precede {ll.lanelet_id}"
                )
                found += 1
        assert found > 50
        # predecessor is directional
        some = np.argwhere(pred)
        assert len(some) > 0
        # no self loops
        assert not pred.diagonal().any()

    def test_overlap_matrix(self, road_tensors):
        from pdmpc_tpu.scenarios.road import RelationshipType

        road, rt = road_tensors
        over = np.asarray(rt.hdv_overlap)
        rel = np.maximum(road.relationship_type, road.relationship_type.T)
        np.testing.assert_array_equal(
            over,
            (rel == RelationshipType.merging)
            | (rel == RelationshipType.forking),
        )

    def test_commonroad_hdv_run(self):
        """System test on the road network: CAVs coexist with an HDV
        without collisions and without deadlock (VERDICT item 6)."""
        cfg = Config(
            scenario_type=ScenarioType.commonroad,
            amount=3,
            T_end=2.0,
            beam_width=64,
            manual_control_config=ManualControlConfig(
                is_active=True, amount=1, hdv_ids=(1,)
            ),
        )
        result = run_experiment(cfg)
        assert pairwise_vehicle_collisions(result) == []
        poses = np.asarray(result.infos.poses)[:, :, 0]
        # HDV keeps moving along its path
        d_hdv = np.linalg.norm(poses[-1, 0, :2] - poses[0, 0, :2])
        assert d_hdv > 0.5
        # CAVs are not frozen (no over-conservative deadlock)
        for v in (1, 2):
            d = np.linalg.norm(poses[-1, v, :2] - poses[0, v, :2])
            assert d > 0.3, f"CAV {v} is stuck (moved {d:.3f} m)"


def test_vehicles_at_intersection():
    """Reference: hlc/controller/common/vehicles_at_intersection.m."""
    import jax.numpy as jnp

    from pdmpc_tpu.controller import vehicles_at_intersection

    center = jnp.array([2.25, 2.0])
    times = jnp.full((3,), jnp.inf)
    pos_in = jnp.array([[2.3, 2.0], [0.0, 0.0], [2.2, 2.1]])
    at, times = vehicles_at_intersection(5, times, pos_in, center, 0.5)
    np.testing.assert_array_equal(np.asarray(at), [True, False, True])
    np.testing.assert_array_equal(np.asarray(times), [5.0, np.inf, 5.0])
    # vehicle 0 leaves, vehicle 1 enters; vehicle 2 keeps its entry step
    pos_next = jnp.array([[4.0, 4.0], [2.25, 2.0], [2.2, 2.1]])
    at, times = vehicles_at_intersection(6, times, pos_next, center, 0.5)
    np.testing.assert_array_equal(np.asarray(at), [False, True, True])
    np.testing.assert_array_equal(np.asarray(times), [np.inf, 6.0, 5.0])


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
