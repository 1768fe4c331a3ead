"""Scenario container: fixed-shape tensors describing vehicles and roads.

Re-design of scenarios/Scenario.m + scenarios/Vehicle.m: a scenario is a set
of padded tensors (reference paths, speeds, start poses) ready to be closed
over by the jitted control step, plus optional road-network data for
commonroad scenarios.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple

import numpy as np

from pdmpc_tpu.models.bicycle import VEHICLE_LENGTH, VEHICLE_WIDTH


class RoadTensors(NamedTuple):
    """Device-side road-network constants (jnp arrays).

    Boundary segments are indexed by 1-based lanelet id; row 0 is a dummy
    all-masked entry so id 0 means "no lanelet".
    """

    boundary_segments: Any  # [L+1, S_max, 2, 2] f32
    boundary_seg_mask: Any  # [L+1, S_max] bool
    # drivable-corridor ring per lanelet (left bound + reversed right bound,
    # pad-by-repeat; row 0 = degenerate dummy). Used by the reachable-set
    # bounding kernel (bound_reachable_sets.m capability).
    corridor_rings: Any = None  # [L+1, R_max, 2] f32
    # lanelet adjacency (scenarios/road_network/get_adjacent_lanelets
    # capability): used by DistanceCoupler.m:28-31's prefilter — vehicles
    # whose current+predicted lanelets are not adjacent are never coupled
    adjacency_lanelets: Any = None  # [L+1, L+1] bool
    # directional CAV-HDV coupling matrices (is_hdv_behind.m):
    # hdv_predecessor[c, h]: lanelet h is a longitudinal predecessor of c
    # (geometrically consecutive incl. diagonal, is_hdv_behind.m:36-56);
    # hdv_overlap[c, h]: merging/forking relationship (:28-32)
    hdv_predecessor: Any = None  # [L+1, L+1] bool
    hdv_overlap: Any = None      # [L+1, L+1] bool
    # lanelet centerlines, pad-by-repeat; row 0 is a far-away sentinel so
    # the dummy lanelet never wins a closest-lanelet query
    # (map_position_to_closest_lanelets.m capability)
    centerlines: Any = None      # [L+1, C_max, 2] f32


class ScenarioTensors(NamedTuple):
    """Device-side scenario constants (jnp arrays)."""

    reference_paths: Any   # [N, P, 2] f32, padded by repeating the last point
    path_cumlen: Any       # [N, P] f32 cumulative arc length
    is_loop: Any           # [N] bool
    reference_speed: Any   # [N] f32
    start_poses: Any       # [N, 3] f32
    start_trims: Any       # [N] i32
    is_hdv: Any = None     # [N] bool (human-driven vehicles; ManualControlConfig)
    # static scenario obstacles (Scenario.m:75-88 obstacles list,
    # get_all_obstacles.m:17): fixed polygons every vehicle must avoid
    static_obstacles: Any = None      # [O, VO, 2] f32 (pad-by-repeat)
    static_obstacle_mask: Any = None  # [O] bool
    # road scenarios only (None for free-space scenarios):
    segment_lanelet: Any = None  # [N, P-1] i32: 1-based lanelet id per path
    #                              segment (0 = none)
    road: Any = None             # RoadTensors

    @property
    def n_vehicles(self) -> int:
        return self.start_poses.shape[0]


@dataclass
class Scenario:
    """Host-side scenario description (numpy)."""

    reference_paths: list[np.ndarray]   # per vehicle [P_i, 2]
    reference_speeds: np.ndarray        # [N]
    start_poses: np.ndarray             # [N, 3]
    start_trims: np.ndarray             # [N] int
    vehicle_length: float = VEHICLE_LENGTH
    vehicle_width: float = VEHICLE_WIDTH
    plot_limits: np.ndarray = field(
        default_factory=lambda: np.array([[0.0, 4.5], [0.0, 4.0]])
    )
    road: Any = None  # RoadData for commonroad scenarios
    is_hdv: Any = None  # [N] bool; HDV vehicles (ManualControlConfig.hdv_ids)
    # static obstacle polygons (Scenario.m obstacles property): list of
    # [V_i, 2] arrays every vehicle must avoid
    obstacles: list[np.ndarray] = field(default_factory=list)

    # road scenarios attach these (commonroad.py):
    lanelet_indices: Any = None   # per vehicle: list of 1-based lanelet ids
    points_indices: Any = None    # per vehicle: last-point count per lanelet

    @property
    def n_vehicles(self) -> int:
        return self.start_poses.shape[0]

    def to_tensors(self) -> ScenarioTensors:
        import jax.numpy as jnp

        n = self.n_vehicles
        p_max = max(p.shape[0] for p in self.reference_paths)
        paths = np.zeros((n, p_max, 2), dtype=np.float32)
        is_loop = np.zeros(n, dtype=bool)
        for i, p in enumerate(self.reference_paths):
            paths[i, : p.shape[0]] = p
            paths[i, p.shape[0]:] = p[-1]
            # loop iff first and last points coincide
            # (sample_reference_trajectory.m:40)
            is_loop[i] = np.linalg.norm(p[0] - p[-1]) < 1e-8
        seg = np.linalg.norm(np.diff(paths, axis=1), axis=-1)
        cumlen = np.concatenate(
            [np.zeros((n, 1), dtype=np.float32), np.cumsum(seg, axis=1)],
            axis=1,
        )

        segment_lanelet = None
        road_tensors = None
        if self.road is not None and self.lanelet_indices is not None:
            segment_lanelet = jnp.asarray(
                self._segment_lanelet_array(p_max), dtype=jnp.int32
            )
            road_tensors = road_to_tensors(self.road)

        is_hdv = (
            np.asarray(self.is_hdv, dtype=bool)
            if self.is_hdv is not None
            else np.zeros(n, dtype=bool)
        )

        static_obstacles = static_obstacle_mask = None
        if self.obstacles:
            from pdmpc_tpu.ops.search import VO

            o = len(self.obstacles)
            obs = np.zeros((o, VO, 2), dtype=np.float32)
            for i, poly in enumerate(self.obstacles):
                poly = np.asarray(poly, dtype=np.float32)
                assert poly.shape[0] <= VO, (
                    f"obstacle polygon has {poly.shape[0]} > {VO} vertices"
                )
                obs[i, : poly.shape[0]] = poly
                obs[i, poly.shape[0]:] = poly[-1]
            static_obstacles = jnp.asarray(obs)
            static_obstacle_mask = jnp.ones((o,), dtype=bool)
        return ScenarioTensors(
            reference_paths=jnp.asarray(paths),
            path_cumlen=jnp.asarray(cumlen, dtype=jnp.float32),
            is_loop=jnp.asarray(is_loop),
            reference_speed=jnp.asarray(
                self.reference_speeds, dtype=jnp.float32
            ),
            start_poses=jnp.asarray(self.start_poses, dtype=jnp.float32),
            start_trims=jnp.asarray(self.start_trims, dtype=jnp.int32),
            is_hdv=jnp.asarray(is_hdv),
            static_obstacles=static_obstacles,
            static_obstacle_mask=static_obstacle_mask,
            segment_lanelet=segment_lanelet,
            road=road_tensors,
        )

    def _segment_lanelet_array(self, p_max: int) -> np.ndarray:
        """1-based lanelet id of each path segment, padded to [N, p_max-1].

        Segment s spans points s -> s+1; its lanelet is the lanelet of its
        end point (the lanelet being entered at junctions).
        """
        n = self.n_vehicles
        out = np.zeros((n, p_max - 1), dtype=np.int64)
        for v in range(n):
            ids = np.asarray(self.lanelet_indices[v], dtype=np.int64)
            points_index = np.asarray(self.points_indices[v])
            n_points = self.reference_paths[v].shape[0]
            for s in range(p_max - 1):
                p_end = min(s + 1, n_points - 1)
                # lanelet j covers points [points_index[j-1], points_index[j])
                j = int(np.searchsorted(points_index, p_end, side="right"))
                j = min(j, len(ids) - 1)
                out[v, s] = ids[j]
        return out


def road_to_tensors(road) -> RoadTensors:
    """Pack per-lanelet extended boundaries into fixed-shape segment
    tensors (row 0 = dummy for 'no lanelet')."""
    import jax.numpy as jnp

    n_lanelets = road.n_lanelets
    seg_counts = [
        (road.boundary_left[i].shape[0] - 1)
        + (road.boundary_right[i].shape[0] - 1)
        for i in range(n_lanelets)
    ]
    s_max = max(seg_counts)
    segs = np.zeros((n_lanelets + 1, s_max, 2, 2), dtype=np.float32)
    mask = np.zeros((n_lanelets + 1, s_max), dtype=bool)
    for i in range(n_lanelets):
        left = road.boundary_left[i]
        right = road.boundary_right[i]
        parts = []
        for b in (left, right):
            parts.append(np.stack([b[:-1], b[1:]], axis=1))  # [P-1, 2, 2]
        all_segs = np.concatenate(parts, axis=0)
        segs[i + 1, : all_segs.shape[0]] = all_segs
        mask[i + 1, : all_segs.shape[0]] = True

    # corridor rings: left bound followed by reversed right bound closes the
    # drivable band of each lanelet (get_lanelets_boundary.m's polyshape)
    ring_counts = [
        road.boundary_left[i].shape[0] + road.boundary_right[i].shape[0]
        for i in range(n_lanelets)
    ]
    r_max = max(ring_counts)
    rings = np.zeros((n_lanelets + 1, r_max, 2), dtype=np.float32)
    for i in range(n_lanelets):
        ring = np.concatenate(
            [road.boundary_left[i], road.boundary_right[i][::-1]], axis=0
        )
        rings[i + 1, : ring.shape[0]] = ring
        rings[i + 1, ring.shape[0]:] = ring[-1]
    # directional CAV-HDV matrices (is_hdv_behind.m): lanelet h precedes c
    # if their relationship is longitudinal and h's end meets c's start
    # (center-center or diagonal left-right / right-left, tol 1e-6,
    # is_hdv_behind.m:36-56); overlap = merging/forking (:28-32)
    from pdmpc_tpu.scenarios.road import RelationshipType

    rel = road.relationship_type
    rel_sym = np.maximum(rel, rel.T)  # rel is upper-triangular by (min,max)
    tol = 1e-6
    pred = np.zeros((n_lanelets + 1, n_lanelets + 1), dtype=bool)
    for c in range(1, n_lanelets + 1):
        lc = road.lanelets[c - 1]
        for h in range(1, n_lanelets + 1):
            if h == c or rel_sym[c, h] != RelationshipType.longitudinal:
                continue
            lh = road.lanelets[h - 1]
            consecutive = (
                np.linalg.norm(lc.center[0] - lh.center[-1]) <= tol
                or np.linalg.norm(lc.left[0] - lh.right[-1]) <= tol
                or np.linalg.norm(lc.right[0] - lh.left[-1]) <= tol
            )
            pred[c, h] = consecutive
    overlap = (rel_sym == RelationshipType.merging) | (
        rel_sym == RelationshipType.forking
    )
    overlap[0, :] = overlap[:, 0] = False
    c_max = max(road.lanelets[i].center.shape[0] for i in range(n_lanelets))
    centers = np.full((n_lanelets + 1, c_max, 2), 1e6, dtype=np.float32)
    for i in range(n_lanelets):
        c = road.lanelets[i].center
        centers[i + 1, : c.shape[0]] = c
        centers[i + 1, c.shape[0]:] = c[-1]
    return RoadTensors(
        boundary_segments=jnp.asarray(segs),
        boundary_seg_mask=jnp.asarray(mask),
        corridor_rings=jnp.asarray(rings),
        adjacency_lanelets=jnp.asarray(
            np.asarray(road.adjacency_lanelets, dtype=bool)
        ),
        hdv_predecessor=jnp.asarray(pred),
        hdv_overlap=jnp.asarray(overlap),
        centerlines=jnp.asarray(centers),
    )


def map_position_to_closest_lanelets(road: RoadTensors, xy):
    """1-based id of the lanelet whose centerline is closest to ``xy``,
    plus the mask of all lanelets within 0.1 m of that minimum.

    Jittable re-design of
    hlc/controller/common/map_position_to_closest_lanelets.m:1-25 (the
    reference's HDV current-lanelet mapping, HighLevelController.m:402):
    distance = min over centerline vertices of the Euclidean distance; the
    result set keeps every lanelet within ``offset = 0.1`` of the best.
    """
    import jax.numpy as jnp

    d = jnp.linalg.norm(road.centerlines - xy[None, None, :], axis=-1)
    d_min = jnp.min(d, axis=-1)                         # [L+1]
    best = jnp.argmin(d_min).astype(jnp.int32)
    within = d_min <= d_min[best] + 0.1
    return best, within
