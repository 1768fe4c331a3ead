"""Reachable-set bounding by lanelet corridors.

Reference semantics: /root/reference/hlc/controller/common/
bound_reachable_sets.m:1-50 — intersect each reachable set with the
drivable corridor, keep the largest region, restore the original when the
intersection is empty; followed by the convhull of
HighLevelController.m:252-257 for convex-only configs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.ops import geometry as geo


def square(cx, cy, half):
    return jnp.array(
        [[cx - half, cy - half], [cx + half, cy - half],
         [cx + half, cy + half], [cx - half, cy + half]],
        dtype=jnp.float32,
    )


def ring_of(poly, r_max=12):
    """Pad a ring polygon by repeating the last vertex."""
    p = np.asarray(poly, dtype=np.float32)
    out = np.concatenate([p, np.repeat(p[-1:], r_max - p.shape[0], axis=0)])
    return jnp.asarray(out)


def segs_of(poly):
    p = np.asarray(poly, dtype=np.float32)
    closed = np.concatenate([p, p[:1]], axis=0)
    s = np.stack([closed[:-1], closed[1:]], axis=1)
    return jnp.asarray(s), jnp.ones(s.shape[0], dtype=bool)


class TestPointInRing:
    def test_inside_outside(self):
        ring = ring_of(square(0.0, 0.0, 1.0))
        assert bool(geo.point_in_ring(jnp.array([0.0, 0.0]), ring))
        assert bool(geo.point_in_ring(jnp.array([0.9, -0.9]), ring))
        assert not bool(geo.point_in_ring(jnp.array([1.5, 0.0]), ring))
        assert not bool(geo.point_in_ring(jnp.array([0.0, -2.0]), ring))

    def test_dummy_ring_is_empty(self):
        ring = jnp.zeros((12, 2))
        assert not bool(geo.point_in_ring(jnp.array([0.0, 0.0]), ring))

    def test_nonconvex_ring(self):
        # L-shaped corridor
        pts = [[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3]]
        ring = ring_of(jnp.array(pts, dtype=jnp.float32))
        assert bool(geo.point_in_ring(jnp.array([0.5, 2.5]), ring))
        assert bool(geo.point_in_ring(jnp.array([2.5, 0.5]), ring))
        assert not bool(geo.point_in_ring(jnp.array([2.5, 2.5]), ring))


class TestBoundConvexToCorridor:
    def test_clip_half_outside(self):
        # corridor = band x in [0, 1], y in [-5, 5]; reachable set square
        # centered at x=1 half-width 0.5 -> half sticks out
        corridor = jnp.array(
            [[0, -5], [1, -5], [1, 5], [0, 5]], dtype=jnp.float32
        )
        rings = ring_of(corridor)[None]
        segs, mask = segs_of(corridor)
        rs = square(1.0, 0.0, 0.5)
        bounded = geo.bound_convex_to_corridor(rs, rings, segs, mask)
        area = float(geo.polygon_area(bounded))
        # exact intersection area = 0.5; outer approx adds a little
        assert area == pytest.approx(0.5, rel=0.15)
        assert float(jnp.max(bounded[:, 0])) <= 1.0 + 1e-4
        # untouched directions preserved
        assert float(jnp.min(bounded[:, 1])) == pytest.approx(-0.5, abs=1e-4)
        assert float(jnp.max(bounded[:, 1])) == pytest.approx(0.5, abs=1e-4)

    def test_fully_inside_unchanged(self):
        corridor = square(0.0, 0.0, 2.0)
        rings = ring_of(corridor)[None]
        segs, mask = segs_of(corridor)
        rs = square(0.0, 0.0, 0.5)
        bounded = geo.bound_convex_to_corridor(rs, rings, segs, mask)
        assert float(geo.polygon_area(bounded)) == pytest.approx(
            1.0, rel=0.05
        )

    def test_empty_intersection_restores_original(self):
        # reference :41-46 — wrong-lanelet intersection restores the set
        corridor = square(10.0, 10.0, 1.0)
        rings = ring_of(corridor)[None]
        segs, mask = segs_of(corridor)
        rs = square(0.0, 0.0, 0.5)
        bounded = geo.bound_convex_to_corridor(rs, rings, segs, mask)
        np.testing.assert_allclose(np.asarray(bounded), np.asarray(rs))

    def test_union_of_two_lanelets(self):
        # two adjacent lanelet rings: the corridor is their union; a set
        # straddling the shared edge survives on both sides
        lane1 = jnp.array([[0, 0], [1, 0], [1, 4], [0, 4]], dtype=jnp.float32)
        lane2 = jnp.array([[1, 0], [2, 0], [2, 4], [1, 4]], dtype=jnp.float32)
        rings = jnp.stack([ring_of(lane1), ring_of(lane2)])
        s1, m1 = segs_of(lane1)
        s2, m2 = segs_of(lane2)
        segs = jnp.concatenate([s1, s2])
        mask = jnp.concatenate([m1, m2])
        rs = square(1.0, 2.0, 0.4)
        bounded = geo.bound_convex_to_corridor(rs, rings, segs, mask)
        area = float(geo.polygon_area(bounded))
        assert area == pytest.approx(0.64, rel=0.15)


def test_commonroad_reachable_sets_stay_in_corridor():
    """System-level: on the road network, bounded reachable sets no longer
    bleed across non-drivable space (the over-coupling the unbounded sets
    caused)."""
    import jax

    from pdmpc_tpu.config import Config, ScenarioType
    from pdmpc_tpu.controller import initial_state, make_prioritized_step
    from pdmpc_tpu.models.mpa import build_mpa
    from pdmpc_tpu.scenarios.commonroad import create_commonroad_scenario

    cfg = Config(
        scenario_type=ScenarioType.commonroad, amount=4, T_end=1.0
    ).validate()
    mpa = build_mpa(cfg)
    scenario = create_commonroad_scenario(cfg, mpa)
    tensors = scenario.to_tensors()
    mpa_t = mpa.to_tensors()
    step = jax.jit(make_prioritized_step(cfg, mpa_t, tensors))
    state = initial_state(tensors, cfg.Hp)
    state, info = step(state, jnp.array(0, dtype=jnp.int32))
    # the coupling graph must be sparse: on the CPM map with 4 spread
    # vehicles the unbounded sets (radius ~1 m at Hp=6) would couple
    # almost everyone; the bounded ones couple only corridor neighbors
    n_coupled = int(jnp.sum(info.adjacency))
    assert n_coupled <= 6, f"over-coupling: {n_coupled} edges"
