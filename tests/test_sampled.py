"""TpuSampled optimizer (the MCTS capability) tests.

Reference: hlc/optimizer/graph_search/MonteCarloTreeSearch.m — anytime
sampled search under a 250-expansion budget, seeded per (time step,
vehicle index) (:8,16-31). The TPU re-design spends the budget on parallel
cost-guided rollouts (ops/search.py:plan_trajectory_sampled); budget
equivalence is n_rollouts * Hp exact edge evaluations.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.config import Config, OptimizerType, ScenarioType
from pdmpc_tpu.experiment import run_experiment
from pdmpc_tpu.models.mpa import build_mpa
from pdmpc_tpu.ops.search import (
    VO,
    Obstacles,
    plan_trajectory,
    plan_trajectory_sampled,
)
from tests.test_controller import pairwise_vehicle_collisions

BASE = Config(
    scenario_type=ScenarioType.circle, amount=3, T_end=3.0,
    beam_width=96,
)
SAMPLED = dataclasses.replace(
    BASE, optimizer_type=OptimizerType.TpuSampled, mcts_n_rollouts=256
)


@pytest.fixture(scope="module")
def result():
    return run_experiment(SAMPLED)


def test_sampled_run_is_collision_free(result):
    assert pairwise_vehicle_collisions(result) == []


def test_sampled_run_makes_progress(result):
    poses = np.asarray(result.infos.poses)[:, :, 0]
    for v in range(3):
        d = np.linalg.norm(poses[-1, v, :2] - poses[0, v, :2])
        assert d > 1.5, f"vehicle {v} moved only {d:.2f} m"


def test_sampled_deterministic_per_seed(result):
    r2 = run_experiment(SAMPLED)
    np.testing.assert_array_equal(
        np.asarray(result.infos.poses), np.asarray(r2.infos.poses)
    )
    r3 = run_experiment(dataclasses.replace(SAMPLED, seed=1))
    assert not np.array_equal(
        np.asarray(result.infos.poses), np.asarray(r3.infos.poses)
    )


def test_sampled_quality_vs_optimal(result):
    """At the reference-equivalent budget the sampled cost stays within a
    modest factor of the exhaustive optimum (MCTS is anytime/approximate;
    the reference makes the same trade, MonteCarloTreeSearch.m:8)."""
    r_opt = run_experiment(BASE)
    c_opt = float(np.asarray(r_opt.infos.cost).sum())
    c_sam = float(np.asarray(result.infos.cost).sum())
    assert c_sam <= 1.25 * c_opt, (
        f"sampled cost {c_sam:.3f} vs optimal {c_opt:.3f}"
    )
    # and at the strict 250-expansion-equivalent budget (42 rollouts x
    # Hp=6 edges) it still completes within 2x of optimal (measured
    # 1.3-1.9x over seeds; the budget is 36x smaller than the default)
    r_250 = run_experiment(
        dataclasses.replace(SAMPLED, mcts_n_rollouts=42)
    )
    assert float(np.asarray(r_250.infos.cost).sum()) <= 2.0 * c_opt


class TestSampledFeasibility:
    """Property: every returned (non-exhausted) plan is feasible — it uses
    only allowed transitions and never hits an active obstacle."""

    def _setup(self):
        cfg = Config(scenario_type=ScenarioType.circle, amount=1).validate()
        mpa = build_mpa(cfg).to_tensors()
        hp = mpa.Hp
        x0 = jnp.array([0.25, 2.0, 0.0])
        eq = int(np.argwhere(np.asarray(mpa.trims_stop))[0][0])
        ref = jnp.stack(
            [0.25 + 0.16 * jnp.arange(1, hp + 1), jnp.full(hp, 2.0)],
            axis=-1,
        )
        return cfg, mpa, hp, x0, jnp.array(eq, dtype=jnp.int32), ref

    def test_transitions_and_obstacles(self):
        from pdmpc_tpu.ops import geometry as geo

        cfg, mpa, hp, x0, trim0, ref = self._setup()
        v_ref = jnp.full((hp,), 0.8)
        # an obstacle half-blocking the straight path
        sq = jnp.array(
            [[0.8, 1.99], [1.0, 1.99], [1.0, 2.2], [0.8, 2.2]]
        )
        polys = jnp.broadcast_to(
            jnp.concatenate([sq, jnp.broadcast_to(sq[-1:], (VO - 4, 2))])[
                None, None
            ],
            (1, hp, VO, 2),
        )
        obstacles = Obstacles(
            polys=polys, mask=jnp.ones((1, hp), dtype=bool)
        )
        trans = np.asarray(mpa.transition)
        for seed in range(8):
            res = plan_trajectory_sampled(
                mpa, x0, trim0, ref, v_ref, obstacles, cfg.dt_seconds,
                128, jax.random.PRNGKey(seed),
            )
            if bool(res.is_exhausted):
                continue
            trims = np.asarray(res.trims)
            prev = int(trim0)
            for k in range(hp):
                assert trans[k, prev, trims[k]], (
                    f"seed {seed}: disallowed transition at layer {k}"
                )
                prev = trims[k]
            for k in range(hp):
                assert not bool(
                    geo.sat_collide(jnp.asarray(res.shapes[k]), sq)
                ), f"seed {seed}: shape {k} hits the obstacle"

    def test_exhausts_when_fully_blocked(self):
        cfg, mpa, hp, x0, trim0, ref = self._setup()
        v_ref = jnp.full((hp,), 0.8)
        # a box enclosing the start pose: every move collides; the
        # standstill maneuver's swept area also overlaps the box edge
        sq = jnp.array(
            [[-0.1, 1.5], [0.6, 1.5], [0.6, 2.5], [-0.1, 2.5]]
        )
        polys = jnp.broadcast_to(
            jnp.concatenate([sq, jnp.broadcast_to(sq[-1:], (VO - 4, 2))])[
                None, None
            ],
            (1, hp, VO, 2),
        )
        obstacles = Obstacles(
            polys=polys, mask=jnp.ones((1, hp), dtype=bool)
        )
        res = plan_trajectory_sampled(
            mpa, x0, trim0, ref, v_ref, obstacles, cfg.dt_seconds,
            64, jax.random.PRNGKey(0),
        )
        assert bool(res.is_exhausted)

    def test_cost_guided_beats_uniform(self):
        cfg, mpa, hp, x0, trim0, ref = self._setup()
        v_ref = jnp.full((hp,), 0.8)
        obstacles = Obstacles(
            polys=jnp.full((1, hp, VO, 2), 100.0),
            mask=jnp.zeros((1, hp), dtype=bool),
        )
        costs = {}
        for name, temp in (("guided", 0.01), ("uniform", 0.0)):
            res = plan_trajectory_sampled(
                mpa, x0, trim0, ref, v_ref, obstacles, cfg.dt_seconds,
                128, jax.random.PRNGKey(0), temperature=temp,
            )
            costs[name] = float(res.cost)
        opt = plan_trajectory(
            mpa, x0, trim0, ref, v_ref, obstacles, cfg.dt_seconds, 128
        )
        assert costs["guided"] <= costs["uniform"] + 1e-9
        assert costs["guided"] <= 1.15 * float(opt.cost)
