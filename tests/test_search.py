"""Trajectory-search tests: beam search vs the reference A* oracle.

The beam search with an exhaustive-width beam must return the same optimal
cost as A* run to completion (same g/h definitions, expand_node.m:61-73).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.config import Config, MpaType, ScenarioType
from pdmpc_tpu.models import mpa as mpa_mod
from pdmpc_tpu.ops import search
from pdmpc_tpu.utils.astar_oracle import astar_plan


@pytest.fixture(scope="module")
def mpa_np():
    cfg = Config(scenario_type=ScenarioType.circle, mpa_type=MpaType.single_speed)
    return mpa_mod.build_mpa(cfg)


@pytest.fixture(scope="module")
def mpa_t(mpa_np):
    return mpa_np.to_tensors(convex=True)


def straight_reference(x0, v, hp, dt):
    """Equidistant reference points along +x from x0."""
    d = np.cumsum(np.full(hp, v * dt))
    pts = np.stack([x0[0] + d, np.full(hp, x0[1])], axis=-1)
    return pts, np.full(hp, v)


def empty_obstacles(hp, n_obs=1):
    return search.Obstacles(
        polys=jnp.zeros((n_obs, hp, search.VO, 2), dtype=jnp.float32),
        mask=jnp.zeros((n_obs, hp), dtype=bool),
    )


def blocking_obstacle(hp, center, half=0.15):
    sq = jnp.array(
        [
            [center[0] - half, center[1] - half],
            [center[0] + half, center[1] - half],
            [center[0] + half, center[1] + half],
            [center[0] - half, center[1] + half],
        ],
        dtype=jnp.float32,
    )
    polys = jnp.tile(
        search.pad_polys_to_vo(sq[None])[:, None], (1, hp, 1, 1)
    )
    return search.Obstacles(polys=polys, mask=jnp.ones((1, hp), dtype=bool))


def run_beam(mpa_t, x0, trim0, ref, v_ref, obs, dt, beam=1024):
    fn = jax.jit(
        lambda x0, t0, r, v, o: search.plan_trajectory(
            mpa_t, x0, t0, r, v, o, dt, beam
        )
    )
    return fn(
        jnp.asarray(x0, dtype=jnp.float32),
        jnp.asarray(trim0, dtype=jnp.int32),
        jnp.asarray(ref, dtype=jnp.float32),
        jnp.asarray(v_ref, dtype=jnp.float32),
        obs,
    )


class TestBeamVsOracle:
    def test_free_space_matches_astar(self, mpa_np, mpa_t):
        dt = 0.2
        x0 = np.array([0.0, 0.0, 0.0])
        trim0 = 6  # straight, max speed
        ref, v_ref = straight_reference(x0, 0.8, 6, dt)
        obs = empty_obstacles(6)

        res = run_beam(mpa_t, x0, trim0, ref, v_ref, obs, dt)
        oracle = astar_plan(
            mpa_np, x0, trim0, ref, v_ref,
            np.zeros((1, 6, 4, 2)), np.zeros((1, 6), dtype=bool), dt,
        )
        assert not bool(res.is_exhausted)
        assert float(res.cost) == pytest.approx(oracle.cost, rel=1e-5, abs=1e-6)
        np.testing.assert_array_equal(np.asarray(res.trims), oracle.trims)

    def test_with_obstacle_matches_astar(self, mpa_np, mpa_t):
        dt = 0.2
        x0 = np.array([0.0, 0.0, 0.0])
        trim0 = 6
        ref, v_ref = straight_reference(x0, 0.8, 6, dt)
        # obstacle on the reference path at x ~ 0.5
        obs = blocking_obstacle(6, (0.5, 0.0))
        obs_np = np.tile(
            np.array(
                [[[0.35, -0.15], [0.65, -0.15], [0.65, 0.15], [0.35, 0.15]]]
            )[:, None],
            (1, 6, 1, 1),
        )
        res = run_beam(mpa_t, x0, trim0, ref, v_ref, obs, dt)
        oracle = astar_plan(
            mpa_np, x0, trim0, ref, v_ref, obs_np,
            np.ones((1, 6), dtype=bool), dt,
        )
        assert not bool(res.is_exhausted)
        assert not oracle.is_exhausted
        assert float(res.cost) == pytest.approx(oracle.cost, rel=1e-4, abs=1e-5)
        # plan must avoid the obstacle (brake short of it or swerve)
        poses = np.asarray(res.poses)
        inside = (
            (poses[:, 0] > 0.35) & (poses[:, 0] < 0.65)
            & (np.abs(poses[:, 1]) < 0.15)
        )
        assert not inside.any()

    def test_random_starts_match_astar(self, mpa_np, mpa_t):
        dt = 0.2
        rng = np.random.default_rng(42)
        for case in range(4):
            x0 = np.array(
                [rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-np.pi, np.pi)]
            )
            trim0 = int(rng.integers(0, mpa_np.n_trims))
            v = float(mpa_np.trim_speed.max())
            d = np.cumsum(np.full(6, v * dt))
            ref = np.stack(
                [
                    x0[0] + d * np.cos(x0[2]),
                    x0[1] + d * np.sin(x0[2]),
                ],
                axis=-1,
            )
            v_ref = np.full(6, v)
            obs = empty_obstacles(6)
            res = run_beam(mpa_t, x0, trim0, ref, v_ref, obs, dt)
            oracle = astar_plan(
                mpa_np, x0, trim0, ref, v_ref,
                np.zeros((1, 6, 4, 2)), np.zeros((1, 6), dtype=bool), dt,
            )
            assert float(res.cost) == pytest.approx(
                oracle.cost, rel=1e-4, abs=1e-5
            ), f"case {case}"

    def test_fully_blocked_is_exhausted(self, mpa_t):
        dt = 0.2
        x0 = np.array([0.0, 0.0, 0.0])
        trim0 = 6  # moving at 0.8: cannot stop instantly, cannot escape a box
        ref, v_ref = straight_reference(x0, 0.8, 6, dt)
        # giant obstacle covering everything
        obs = blocking_obstacle(6, (0.0, 0.0), half=50.0)
        res = run_beam(mpa_t, x0, trim0, ref, v_ref, obs, dt)
        assert bool(res.is_exhausted)

    def test_recursive_feasibility_final_trim(self, mpa_np, mpa_t):
        # with recursive feasibility the final trim must be the equilibrium
        dt = 0.2
        x0 = np.array([0.0, 0.0, 0.0])
        ref, v_ref = straight_reference(x0, 0.8, 6, dt)
        res = run_beam(mpa_t, x0, 6, ref, v_ref, empty_obstacles(6), dt)
        assert int(np.asarray(res.trims)[-1]) == 0
        assert bool(mpa_np.trim_speed[np.asarray(res.trims)[-1]] == 0)

    def test_shapes_along_path_contain_poses(self, mpa_t):
        import pdmpc_tpu.ops.geometry as geo

        dt = 0.2
        x0 = np.array([0.0, 0.0, 0.0])
        ref, v_ref = straight_reference(x0, 0.8, 6, dt)
        res = run_beam(mpa_t, x0, 6, ref, v_ref, empty_obstacles(6), dt)
        poses = np.asarray(res.poses)
        shapes = np.asarray(res.shapes)
        for k in range(6):
            assert bool(
                geo.point_in_convex(
                    jnp.asarray(poses[k, :2], dtype=jnp.float32),
                    jnp.asarray(shapes[k], dtype=jnp.float32),
                )
            )
