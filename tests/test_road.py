"""Road-network layer tests (reference: RoadDataCommonRoad.m pipeline)."""

import numpy as np
import pytest

from pdmpc_tpu.scenarios.loops import (
    PATH_ID_TABLE,
    REFERENCE_LANELET_LOOPS,
    get_reference_lanelets_loop,
)
from pdmpc_tpu.scenarios.road import RelationshipType, get_road_data


@pytest.fixture(scope="module")
def road():
    return get_road_data()


class TestRoadData:
    def test_lanelet_count(self, road):
        assert road.n_lanelets == 104

    def test_lanelet_geometry(self, road):
        ll = road.lanelet(1)
        assert ll.left.shape == ll.right.shape == ll.center.shape
        np.testing.assert_allclose(
            ll.center, (ll.left + ll.right) / 2.0, atol=1e-12
        )
        # map fits the 4.5 x 4.0 lab table
        assert ll.center[:, 0].max() <= 4.6 and ll.center[:, 1].max() <= 4.1

    def test_intersection_lanelets(self, road):
        # 32 lanelets at the central intersection
        assert len(road.intersection_lanelets) == 32
        assert 17 in road.intersection_lanelets

    def test_longitudinal_relationship(self, road):
        # lanelet 1 has successor 3 -> longitudinal
        assert (
            road.relationship_type[1, 3] == RelationshipType.longitudinal
        )

    def test_side_relationship(self, road):
        # lanelet 1 has adjacentLeft 2 (same direction) -> side
        assert road.relationship_type[1, 2] == RelationshipType.side

    def test_adjacency_symmetric_with_diagonal(self, road):
        a = road.adjacency_lanelets[1:, 1:]
        assert (a == a.T).all()
        assert a.diagonal().all()

    def test_boundary_extension_same_direction(self, road):
        # lanelet 1 (adjacentLeft 2, same dir): its drivable corridor's left
        # boundary is lanelet 2's left bound (RoadDataCommonRoad.m:282-285)
        np.testing.assert_allclose(
            road.boundary_left[0], road.lanelet(2).left
        )
        assert 2 in road.share_boundary_with[0]

    def test_crossing_at_intersection(self, road):
        rel = road.relationship_type
        crossing_pairs = np.argwhere(rel == RelationshipType.crossing)
        assert len(crossing_pairs) > 0
        inter = set(road.intersection_lanelets.tolist())
        # crossing relationships concentrate at the intersection
        in_inter = sum(
            1 for i, j in crossing_pairs if i in inter and j in inter
        )
        assert in_inter >= len(crossing_pairs) * 0.8


class TestLoops:
    def test_all_path_ids_resolve(self):
        for path_id in PATH_ID_TABLE:
            loop = get_reference_lanelets_loop(path_id)
            assert loop[0] == PATH_ID_TABLE[path_id][1]
            assert sorted(loop) == sorted(
                REFERENCE_LANELET_LOOPS[PATH_ID_TABLE[path_id][0]]
            )

    def test_loops_are_longitudinally_connected(self, road):
        # consecutive lanelets in each loop must be related (path continuity)
        for loop_id, loop in REFERENCE_LANELET_LOOPS.items():
            for a, b in zip(loop, loop[1:] + loop[:1]):
                lo, hi = min(a, b), max(a, b)
                rel = road.relationship_type[lo, hi]
                assert rel != RelationshipType.none, (
                    f"loop {loop_id}: lanelets {a}->{b} unrelated"
                )

    def test_path_geometric_continuity(self, road):
        from pdmpc_tpu.scenarios.commonroad import (
            generate_reference_path_loop,
        )

        for path_id in (1, 9, 18, 20, 41):
            ids = get_reference_lanelets_loop(path_id)
            path, points_index = generate_reference_path_loop(ids, road)
            gaps = np.linalg.norm(np.diff(path, axis=0), axis=-1)
            # no duplicate successive points, no jumps
            assert gaps.min() > 1e-5
            assert gaps.max() < 0.2
            assert points_index[-1] == path.shape[0]


class TestCommonroadScenario:
    def test_build(self):
        from pdmpc_tpu.config import Config, ScenarioType
        from pdmpc_tpu.models.mpa import build_mpa
        from pdmpc_tpu.scenarios.commonroad import create_commonroad_scenario

        cfg = Config(
            scenario_type=ScenarioType.commonroad, amount=3
        ).validate()
        mpa = build_mpa(cfg)
        sc = create_commonroad_scenario(cfg, mpa)
        assert sc.n_vehicles == 3
        # reproducible speeds (seeded by path-id sum)
        sc2 = create_commonroad_scenario(cfg, mpa)
        np.testing.assert_array_equal(sc.reference_speeds,
                                      sc2.reference_speeds)
        t = sc.to_tensors()
        assert t.road is not None
        assert t.segment_lanelet.shape[0] == 3
        # every segment has a valid lanelet id
        assert (np.asarray(t.segment_lanelet) >= 1).all()

    def test_two_vehicle_run_makes_progress(self):
        import jax

        from pdmpc_tpu.config import Config, ScenarioType
        from pdmpc_tpu.experiment import run_experiment

        cfg = Config(
            scenario_type=ScenarioType.commonroad,
            amount=2,
            T_end=2.0,
            beam_width=128,
        )
        res = run_experiment(cfg)
        poses = np.asarray(res.infos.poses)[:, :, 0]
        d = np.linalg.norm(poses[-1, :, :2] - poses[0, :, :2], axis=-1)
        assert (d > 0.5).all()
        assert not np.asarray(res.infos.needs_fallback).any()
        # vehicles stay on the lab table
        assert poses[..., 0].min() > -0.1 and poses[..., 0].max() < 4.6
        assert poses[..., 1].min() > -0.1 and poses[..., 1].max() < 4.1


class TestMapPositionToClosestLanelets:
    """map_position_to_closest_lanelets.m:1-25 capability (HDV current
    lanelet from a measured, possibly off-path pose)."""

    def test_center_vertex_maps_to_own_lanelet(self, road):
        import jax.numpy as jnp

        from pdmpc_tpu.scenarios.scenario import (
            map_position_to_closest_lanelets,
            road_to_tensors,
        )

        rt = road_to_tensors(road)
        for lid in (1, 17, 50, 104):
            xy = jnp.asarray(road.lanelet(lid).center[2], dtype=jnp.float32)
            best, within = map_position_to_closest_lanelets(rt, xy)
            # the lanelet owning the vertex is always within the offset set
            assert bool(within[lid]), lid
            assert bool(within[int(best)])
            assert int(best) >= 1  # dummy row never wins

    def test_off_path_pose_maps_to_nearest(self, road):
        import jax.numpy as jnp

        from pdmpc_tpu.scenarios.scenario import (
            map_position_to_closest_lanelets,
            road_to_tensors,
        )

        rt = road_to_tensors(road)
        # displace a centerline vertex slightly sideways: still nearest
        base = road.lanelet(7).center[3]
        xy = jnp.asarray(base + np.array([0.02, -0.02]), dtype=jnp.float32)
        best, within = map_position_to_closest_lanelets(rt, xy)
        assert bool(within[7])
        # brute-force oracle over all lanelets
        dmins = np.array([
            np.linalg.norm(road.lanelet(i).center - np.asarray(xy),
                           axis=-1).min()
            for i in range(1, road.n_lanelets + 1)
        ])
        assert int(best) == int(np.argmin(dmins)) + 1
        # reference offset semantics: all lanelets within min + 0.1
        expect = set((np.where(dmins <= dmins.min() + 0.1)[0] + 1).tolist())
        got = set(np.where(np.asarray(within))[0].tolist())
        assert got == expect
