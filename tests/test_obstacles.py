"""Static scenario obstacles + centralized-search constraints.

Reference: scenarios/Scenario.m obstacles property,
hlc/optimizer/common/get_all_obstacles.m:1-64 (static polygons join the
obstacle set of every vehicle), and
hlc/optimizer/graph_search/are_constraints_satisfied_sat.m:1-68 (the joint
centralized search applies obstacle + boundary constraints too).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.config import Config, ScenarioType
from pdmpc_tpu.controller import (
    initial_state,
    make_centralized_step,
    make_prioritized_step,
)
from pdmpc_tpu.models.mpa import build_mpa
from pdmpc_tpu.ops import geometry as geo
from pdmpc_tpu.ops.search import VO, Obstacles
from pdmpc_tpu.scenarios.circle import create_circle_scenario


def square(cx, cy, half):
    return np.array(
        [[cx - half, cy - half], [cx + half, cy - half],
         [cx + half, cy + half], [cx - half, cy + half]],
        dtype=np.float32,
    )


def run_steps(step_fn, state, n_steps):
    infos = []
    step_fn = jax.jit(step_fn)
    for k in range(n_steps):
        state, info = step_fn(state, jnp.array(k, dtype=jnp.int32))
        infos.append(jax.tree.map(np.asarray, info))
    return state, infos


def shapes_hit_obstacle(infos, obstacle):
    obs = jnp.asarray(obstacle)
    hits = 0
    for info in infos:
        applied = info.shapes[:, 0]          # [N, VO, 2] applied-step areas
        for v in range(applied.shape[0]):
            if bool(geo.sat_collide(jnp.asarray(applied[v]), obs)):
                hits += 1
    return hits


class TestStaticObstaclesPrioritized:
    def test_vehicle_detours_around_obstacle(self):
        cfg = Config(
            scenario_type=ScenarioType.circle, amount=1, T_end=4.0,
            beam_width=96,
        ).validate()
        mpa = build_mpa(cfg)
        scenario = create_circle_scenario(cfg, mpa)
        # an obstacle square directly on the straight reference path
        obstacle = square(2.25, 2.0, 0.06)
        scenario.obstacles = [obstacle]
        tensors = scenario.to_tensors()
        assert tensors.static_obstacles.shape == (1, VO, 2)
        step = make_prioritized_step(cfg, mpa.to_tensors(), tensors)
        state, infos = run_steps(
            step, initial_state(tensors, cfg.Hp), cfg.k_end
        )
        assert shapes_hit_obstacle(infos, obstacle) == 0
        # the vehicle still makes progress (detours, not stalls)
        start = np.asarray(tensors.start_poses[0, :2])
        end = np.asarray(state.pose[0, :2])
        assert np.linalg.norm(end - start) > 2.0

    def test_without_obstacle_path_goes_through(self):
        """Sanity: the obstacle in the test above actually blocks the
        nominal path (otherwise the detour test proves nothing)."""
        cfg = Config(
            scenario_type=ScenarioType.circle, amount=1, T_end=4.0,
            beam_width=96,
        ).validate()
        mpa = build_mpa(cfg)
        scenario = create_circle_scenario(cfg, mpa)
        tensors = scenario.to_tensors()
        step = make_prioritized_step(cfg, mpa.to_tensors(), tensors)
        _, infos = run_steps(step, initial_state(tensors, cfg.Hp),
                             cfg.k_end)
        assert shapes_hit_obstacle(infos, square(2.25, 2.0, 0.06)) > 0


class TestCentralizedConstraints:
    def test_centralized_avoids_static_obstacle(self):
        cfg = Config(
            scenario_type=ScenarioType.circle, amount=2, T_end=4.0,
            beam_width=128, is_prioritized=False,
        ).validate()
        mpa = build_mpa(cfg)
        scenario = create_circle_scenario(cfg, mpa)
        # on vehicle 0's path, half-blocking the lane (the joint beam
        # splits its diversity across vehicles, so the detour must be
        # cheap enough to survive the f-ordered pruning; the reference's
        # exhaustive A* has no such limit)
        obstacle = square(1.5, 2.07, 0.06)
        scenario.obstacles = [obstacle]
        tensors = scenario.to_tensors()
        step = make_centralized_step(cfg, mpa.to_tensors(), tensors)
        state, infos = run_steps(
            step, initial_state(tensors, cfg.Hp), cfg.k_end
        )
        assert shapes_hit_obstacle(infos, obstacle) == 0
        for info in infos:
            assert not info.is_exhausted.any()

    def test_centralized_respects_boundary_wall(self):
        """A boundary wall ahead stops the joint plan from crossing it
        (are_constraints_satisfied_sat.m boundary branch)."""
        from pdmpc_tpu.ops.search_centralized import plan_centralized

        cfg = Config(scenario_type=ScenarioType.circle, amount=1).validate()
        mpa = build_mpa(cfg).to_tensors()
        x0 = jnp.array([[0.0, 0.0, 0.0]])
        trim0 = jnp.array([0], dtype=jnp.int32)
        hp = cfg.Hp
        ref = jnp.stack(
            [jnp.linspace(0.15, 0.15 * hp, hp), jnp.zeros(hp)], axis=-1
        )[None]
        v_ref = jnp.full((1, hp), 0.75)
        wall = jnp.array([[[0.4, -2.0], [0.4, 2.0]]])   # x = 0.4 wall
        # beam 128: wide enough to keep the slow-down path alive while the
        # faster candidates die at the wall (the reference's exhaustive A*
        # has no beam; a too-narrow beam prunes the survivors)
        res_free = plan_centralized(
            mpa, x0, trim0, ref, v_ref, cfg.dt_seconds, 128
        )
        res_wall = plan_centralized(
            mpa, x0, trim0, ref, v_ref, cfg.dt_seconds, 128,
            boundary_segments=wall[None],          # [N=1, S=1, 2, 2]
            boundary_mask=jnp.ones((1, 1), dtype=bool),
        )
        assert float(res_free.poses[-1, 0, 0]) > 0.45
        assert not bool(res_wall.is_exhausted)
        # no swept area crosses the wall: applied poses stay left of it
        assert float(jnp.max(res_wall.poses[:, 0, 0])) < 0.4

    def test_centralized_commonroad(self):
        """2-vehicle centralized run on the road network (VERDICT item 5):
        completes without exhaustion and stays within lanelet corridors."""
        from pdmpc_tpu.scenarios.commonroad import create_commonroad_scenario

        cfg = Config(
            scenario_type=ScenarioType.commonroad, amount=2, T_end=2.0,
            beam_width=64, is_prioritized=False,
        ).validate()
        mpa = build_mpa(cfg)
        scenario = create_commonroad_scenario(cfg, mpa)
        tensors = scenario.to_tensors()
        step = make_centralized_step(cfg, mpa.to_tensors(), tensors)
        state, infos = run_steps(
            step, initial_state(tensors, cfg.Hp), cfg.k_end
        )
        for info in infos:
            assert not info.is_exhausted.any()
        # both vehicles make progress along their loops
        start = np.asarray(tensors.start_poses[:, :2])
        end = np.asarray(state.pose[:, :2])
        for v in range(2):
            assert np.linalg.norm(end[v] - start[v]) > 0.5
