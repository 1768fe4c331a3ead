"""Non-convex (InterX-equivalent) obstacle path.

Reference: hlc/optimizer/OptimizerInterface.m:36-46 dispatches road
scenarios to segment-intersection checking of the non-convex maneuver /
reachable areas; config/Config.m:71-87 documents why (reachable sets in
road scenarios are always non-convex; the containment error InterX makes
is negligible). Here the dispatch is `Config.use_non_convex_obstacles`,
the XLA check is `candidate_outline_collisions`, and the TPU kernel path
reuses the boundary kernel on exploded obstacle edges.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.config import Config, ScenarioType
from pdmpc_tpu.ops.search import (
    candidate_collisions,
    candidate_outline_collisions,
    polys_to_edge_segments,
)

SQ = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]],
              dtype=np.float32)


def pad16(p):
    return np.concatenate([p, np.tile(p[-1:], (16 - p.shape[0], 1))])


class TestOutlineCollisions:
    def test_crossing_and_disjoint(self):
        man = jnp.asarray(np.stack([SQ, SQ + 10.0]))
        obs = jnp.asarray(pad16(SQ + 0.5)[None])
        mask = jnp.ones((1,), dtype=bool)
        hit = np.asarray(candidate_outline_collisions(man, obs, mask))
        assert hit.tolist() == [True, False]

    def test_containment_not_detected(self):
        # documented InterX semantics: a polygon fully inside another has
        # no outline crossing (Config.m:71-87 calls this error negligible)
        inner = jnp.asarray((SQ * 0.2 + 0.4)[None])
        obs = jnp.asarray(pad16(SQ)[None])
        mask = jnp.ones((1,), dtype=bool)
        assert not np.asarray(
            candidate_outline_collisions(inner, obs, mask)
        ).any()

    def test_concave_notch_less_conservative_than_sat(self):
        # U-shape whose notch contains a small candidate square: the true
        # (non-convex) outlines do not touch, while SAT on the convex hull
        # of the U would report a collision — the conservatism the
        # reference avoids by dispatching road scenarios to InterX
        u_shape = np.array(
            [[0, 0], [3, 0], [3, 3], [2, 3], [2, 1], [1, 1], [1, 3], [0, 3]],
            dtype=np.float32,
        )
        cand = jnp.asarray((SQ * 0.5 + np.array([1.25, 1.75]))[None])
        obs = jnp.asarray(
            np.concatenate([u_shape, np.tile(u_shape[-1:], (8, 1))])[None]
        )
        mask = jnp.ones((1,), dtype=bool)
        assert not np.asarray(
            candidate_outline_collisions(cand, obs, mask)
        ).any()
        hull = jnp.asarray(
            pad16(np.array([[0, 0], [3, 0], [3, 3], [0, 3]],
                           dtype=np.float32))[None]
        )
        assert np.asarray(candidate_collisions(cand, hull, mask)).all()

    def test_masked_and_padded_edges_inert(self):
        man = jnp.asarray(SQ[None])
        obs = jnp.asarray(pad16(SQ + 0.5)[None])
        assert not np.asarray(
            candidate_outline_collisions(
                man, obs, jnp.zeros((1,), dtype=bool)
            )
        ).any()

    @pytest.mark.slow
    def test_agrees_with_sat_on_convex_crossings(self):
        # on convex polygon pairs whose outlines cross, InterX == SAT
        rng = np.random.default_rng(7)
        for _ in range(20):
            off = rng.uniform(-1.5, 1.5, size=2).astype(np.float32)
            man = jnp.asarray((SQ + off)[None])
            obs = jnp.asarray(pad16(SQ)[None])
            mask = jnp.ones((1,), dtype=bool)
            sat = bool(np.asarray(candidate_collisions(
                jnp.asarray(pad16(SQ + off))[None], obs, mask))[0])
            out = bool(np.asarray(
                candidate_outline_collisions(man, obs, mask))[0])
            contained = (np.abs(off) < 1e-6).all()
            if not contained:
                assert sat == out, f"offset {off}: sat={sat} outline={out}"


class TestPallasOutlineParity:
    def rand_polys(self, rng, n, v, scale=1.0):
        centers = rng.uniform(-3, 3, size=(n, 1, 2))
        ang = np.sort(rng.uniform(0, 2 * np.pi, size=(n, v)), axis=1)
        r = rng.uniform(0.2, 0.6, size=(n, 1)) * scale
        return centers + np.stack(
            [r * np.cos(ang), r * np.sin(ang)], axis=-1
        )

    @pytest.mark.parametrize("c,n_obs", [(64, 4), (300, 9)])
    def test_outline_kernel_matches_xla_outline(self, c, n_obs):
        from pdmpc_tpu.ops.pallas_collision import (
            outline_hits_pre,
            precompute_outline,
        )

        rng = np.random.default_rng(c * 31 + n_obs)
        man = jnp.asarray(self.rand_polys(rng, c, 6), dtype=jnp.float32)
        obs = jnp.asarray(self.rand_polys(rng, n_obs, 16, 1.5),
                          dtype=jnp.float32)
        mask = jnp.asarray(rng.random(n_obs) < 0.7)
        ref = np.asarray(candidate_outline_collisions(man, obs, mask))
        pre = precompute_outline(obs, mask)
        cand = jnp.moveaxis(man, 0, -1)
        got = np.asarray(
            outline_hits_pre(cand[:, 0], cand[:, 1], pre, interpret=True)
        )
        assert (ref == got).all()

    def test_outline_kernel_skips_degenerate_padded_edges(self):
        # polys padded by repeating the last vertex: the padded edges must
        # neither hit nor be computed (edge_ok masks them out)
        from pdmpc_tpu.ops.pallas_collision import (
            outline_hits_pre,
            precompute_outline,
        )

        obs = jnp.asarray(pad16(SQ + 0.5)[None], dtype=jnp.float32)
        mask = jnp.ones((1,), dtype=bool)
        pre = precompute_outline(obs, mask)
        assert int(np.asarray(pre.edge_ok).sum()) == 4  # only real edges
        man = jnp.asarray(np.stack([SQ, SQ + 10.0]), dtype=jnp.float32)
        cand = jnp.moveaxis(man, 0, -1)
        got = np.asarray(
            outline_hits_pre(cand[:, 0], cand[:, 1], pre, interpret=True)
        )
        assert got.tolist() == [True, False]


class TestDispatch:
    def test_reference_rule(self):
        assert Config(scenario_type=ScenarioType.commonroad
                      ).use_non_convex_obstacles
        assert not Config(scenario_type=ScenarioType.circle
                          ).use_non_convex_obstacles
        assert not Config(scenario_type=ScenarioType.commonroad,
                          is_prioritized=False).use_non_convex_obstacles

    def test_override(self):
        assert not Config(scenario_type=ScenarioType.commonroad,
                          obstacle_geometry="convex"
                          ).use_non_convex_obstacles
        assert Config(scenario_type=ScenarioType.circle,
                      obstacle_geometry="non_convex"
                      ).use_non_convex_obstacles

    def test_mpa_family_follows_dispatch(self):
        from pdmpc_tpu.models.mpa import VM_NONCONVEX, build_mpa

        cfg = Config(scenario_type=ScenarioType.commonroad, amount=3,
                     T_end=2.0).validate()
        t = build_mpa(cfg).to_tensors_for(cfg)
        assert t.area.shape[-2] == VM_NONCONVEX


class TestEndToEnd:
    def test_cr3_both_geometries_collision_free(self):
        from pdmpc_tpu.experiment import run_experiment
        from tests.test_controller import pairwise_vehicle_collisions

        results = {}
        for geom in ("non_convex", "convex"):
            cfg = Config(scenario_type=ScenarioType.commonroad, amount=3,
                         T_end=2.0, beam_width=64, obstacle_geometry=geom)
            res = run_experiment(cfg)
            assert pairwise_vehicle_collisions(res) == []
            results[geom] = res
        # reduced conservatism must not increase fallbacks
        fb_nc = np.asarray(results["non_convex"].infos.needs_fallback).sum()
        fb_cv = np.asarray(results["convex"].infos.needs_fallback).sum()
        assert fb_nc <= fb_cv


def test_tolerance_lockstep():
    """The robust crossing predicate must be identical in the XLA path and
    the Pallas kernel (cross-backend determinism depends on it)."""
    from pdmpc_tpu.ops import pallas_collision as pk
    from pdmpc_tpu.ops import search as s

    assert s.SEG_CROSS_TOL == pk._TOL
