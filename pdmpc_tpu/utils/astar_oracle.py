"""Host-side A* oracle — numpy re-implementation of the reference search.

Replicates hlc/optimizer/graph_search/GraphSearch.m (A* over the trim
lattice with a binary-heap priority queue, lazy exact edge evaluation on
pop, goal test at depth Hp) and expand_node.m (successor poses, cost-to-come
g, admissible cost-to-go h). Used to validate that the batched TPU beam
search (ops/search.py) returns the reference optimum, and as the
behavioral reference for golden tests — the role the MATLAB implementation
plays for the reference's system tests.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

from pdmpc_tpu.models.mpa import Mpa


def _sat_collide_np(a: np.ndarray, b: np.ndarray) -> bool:
    """SAT for convex polygons [V, 2] (intersect_sat.m semantics)."""

    def separated(p, q):
        e = np.roll(p, -1, axis=0) - p
        axes = np.stack([-e[:, 1], e[:, 0]], axis=-1)
        n = np.linalg.norm(axes, axis=-1, keepdims=True)
        axes = axes / np.maximum(n, 1e-9)
        pa = axes @ p.T
        pb = axes @ q.T
        d1 = pa.min(axis=1) - pb.max(axis=1)
        d2 = pb.min(axis=1) - pa.max(axis=1)
        return bool(np.any(d1 > 0) or np.any(d2 > 0))

    return not (separated(a, b) or separated(b, a))


@dataclass
class OraclePlan:
    trims: np.ndarray      # [Hp]
    poses: np.ndarray      # [Hp, 3]
    cost: float
    is_exhausted: bool
    n_expanded: int


def astar_plan(
    mpa: Mpa,
    x0: np.ndarray,
    trim0: int,
    ref_points: np.ndarray,
    v_ref: np.ndarray,
    obs_polys: np.ndarray,   # [n_obs, Hp, V, 2]
    obs_mask: np.ndarray,    # [n_obs, Hp]
    dt: float,
) -> OraclePlan:
    hp = mpa.Hp
    # node: (x, y, yaw, trim, k, g)
    nodes = [(float(x0[0]), float(x0[1]), float(x0[2]), int(trim0), 0, 0.0)]
    parents = [-1]
    checked: list[bool] = [True]

    counter = 0
    pq: list[tuple[float, int, int]] = [(0.0, counter, 0)]
    n_expanded = 0

    def edge_collides(node_id: int) -> bool:
        p = parents[node_id]
        if p < 0:
            return False
        px, py, pyaw, ptrim, _, _ = nodes[p]
        _, _, _, ctrim, ck, _ = nodes[node_id]
        area = (
            mpa.area_conv[ptrim, ctrim]
            if mpa.area_conv is not None
            else None
        )
        c, s = np.cos(pyaw), np.sin(pyaw)
        world = np.stack(
            [
                c * area[:, 0] - s * area[:, 1] + px,
                s * area[:, 0] + c * area[:, 1] + py,
            ],
            axis=-1,
        )
        k = ck - 1  # 0-based prediction step of this edge
        for o in range(obs_polys.shape[0]):
            if not obs_mask[o, k]:
                continue
            if _sat_collide_np(world, obs_polys[o, k]):
                return True
        return False

    while pq:
        _, _, cur = heapq.heappop(pq)
        if edge_collides(cur):
            continue
        x, y, yaw, trim, k, g = nodes[cur]
        if k == hp:
            # goal: backtrack
            trims = np.zeros(hp, dtype=np.int64)
            poses = np.zeros((hp, 3))
            node_id = cur
            while parents[node_id] >= 0:
                nx, ny, nyaw, ntrim, nk, _ = nodes[node_id]
                trims[nk - 1] = ntrim
                poses[nk - 1] = (nx, ny, nyaw)
                node_id = parents[node_id]
            return OraclePlan(trims, poses, g, False, n_expanded)

        # expand (expand_node.m)
        n_expanded += 1
        c, s = np.cos(yaw), np.sin(yaw)
        for j in np.nonzero(mpa.transition[k][trim])[0]:
            dx, dy, dyaw = mpa.dx[trim, j], mpa.dy[trim, j], mpa.dyaw[trim, j]
            nx2 = c * dx - s * dy + x
            ny2 = s * dx + c * dy + y
            nyaw2 = yaw + dyaw
            gg = g + float(
                (nx2 - ref_points[k, 0]) ** 2 + (ny2 - ref_points[k, 1]) ** 2
            )
            h = 0.0
            d_max = 0.0
            for i_t in range(k + 1, hp):
                d_max += dt * float(v_ref[i_t])
                dist = float(
                    np.hypot(nx2 - ref_points[i_t, 0], ny2 - ref_points[i_t, 1])
                )
                h += max(0.0, dist - d_max) ** 2
            nodes.append((nx2, ny2, nyaw2, int(j), k + 1, gg))
            parents.append(cur)
            checked.append(False)
            counter += 1
            heapq.heappush(pq, (gg + h, counter, len(nodes) - 1))

    return OraclePlan(
        np.zeros(hp, dtype=np.int64), np.zeros((hp, 3)), np.inf, True,
        n_expanded,
    )
