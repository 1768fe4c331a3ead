"""MPA families (mpa_type) validated end-to-end.

VERDICT r2 #3: the reference's system-test matrix spans mpa_type
(tests/systemtests/systemtests.m:3-14, choose_trims.m:37,85); previously
only single_speed (12 trims) ever planned a step end-to-end. Here:

- triple_speed (34 trims): golden commonroad system run + a measured
  optimality statement. The growing-beam search is NOT provably
  exhaustive at 34 trims (layer-2 frontier 34^2 = 1156 > beam), so
  optimality is established empirically against the exact A* oracle:
  zero measured suboptimality (fp noise ~1e-7) over randomized free-space
  and obstacle instances at the default beam width (also measured at
  beam 256 during development — same result; see docs/PARITY.md).
- realistic (71 trims, accel-limited grid): golden circle system run.

Oracle admissibility note: v_ref must be >= the fastest trim speed —
the A* cost-to-go credits dt*v_ref of travel per step, so a smaller
v_ref makes h inadmissible and A* (which stops at the first popped goal)
can then return a WORSE plan than the beam search. The reference plans
against per-vehicle reference speeds bounded by the MPA's top speed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.config import Config, MpaType, ScenarioType
from pdmpc_tpu.experiment import run_experiment
from pdmpc_tpu.models import mpa as mpa_mod
from pdmpc_tpu.ops import search
from pdmpc_tpu.utils.astar_oracle import astar_plan
from tests.golden import compare_golden
from tests.test_controller import pairwise_vehicle_collisions
from tests.test_system_commonroad import GOLDEN_CONFIGS


@pytest.fixture(scope="module")
def mpa_triple():
    cfg = Config(scenario_type=ScenarioType.circle,
                 mpa_type=MpaType.triple_speed)
    return mpa_mod.build_mpa(cfg)


class TestTripleSpeedOracle:
    """Measured optimality of the beam search at 34 trims."""

    def test_random_instances_match_astar(self, mpa_triple):
        m = mpa_triple
        mt = m.to_tensors(convex=True)
        dt = 0.2
        vmax = float(m.trim_speed.max())
        beam = Config().beam_width  # the shipped default
        fn = jax.jit(
            lambda x0, t0, r, v, o: search.plan_trajectory(
                mt, x0, t0, r, v, o, dt, beam
            )
        )
        rng = np.random.default_rng(3)
        n_feasible = 0
        for case in range(12):
            x0 = np.array([
                rng.uniform(-1, 1), rng.uniform(-1, 1),
                rng.uniform(-np.pi, np.pi),
            ])
            trim0 = int(rng.integers(0, m.n_trims))
            d = np.cumsum(np.full(6, vmax * dt))
            ref = np.stack(
                [x0[0] + d * np.cos(x0[2]), x0[1] + d * np.sin(x0[2])], -1
            )
            vr = np.full(6, vmax)
            if case % 2:
                # obstacle ahead on the reference path: forces a swerve
                # or braking plan through the 3-speed-row lattice
                cx = x0[0] + 0.5 * np.cos(x0[2])
                cy = x0[1] + 0.5 * np.sin(x0[2])
                h = 0.08
                op = np.tile(
                    np.array([[[cx - h, cy - h], [cx + h, cy - h],
                               [cx + h, cy + h], [cx - h, cy + h]]])[:, None],
                    (1, 6, 1, 1),
                )
                om = np.ones((1, 6), bool)
            else:
                op = np.zeros((1, 6, 4, 2))
                om = np.zeros((1, 6), bool)
            obs = search.Obstacles(
                polys=search.pad_polys_to_vo(
                    jnp.asarray(op, dtype=jnp.float32)
                ),
                mask=jnp.asarray(om),
            )
            res = fn(
                jnp.asarray(x0, dtype=jnp.float32),
                jnp.asarray(trim0, dtype=jnp.int32),
                jnp.asarray(ref, dtype=jnp.float32),
                jnp.asarray(vr, dtype=jnp.float32),
                obs,
            )
            oracle = astar_plan(m, x0, trim0, ref, vr, op, om, dt)
            if oracle.is_exhausted:
                assert bool(res.is_exhausted), f"case {case}"
                continue
            n_feasible += 1
            assert float(res.cost) == pytest.approx(
                oracle.cost, rel=1e-4, abs=1e-5
            ), f"case {case}: beam {float(res.cost)} vs A* {oracle.cost}"
        assert n_feasible >= 6  # the sample must actually exercise planning


@pytest.fixture(scope="module")
def result_triple():
    return run_experiment(GOLDEN_CONFIGS["commonroad_03veh_triple"])


@pytest.fixture(scope="module")
def result_realistic():
    return run_experiment(GOLDEN_CONFIGS["circle_03veh_realistic"])


class TestTripleSpeedSystem:
    def test_no_collisions(self, result_triple):
        assert pairwise_vehicle_collisions(result_triple) == []

    def test_progress(self, result_triple):
        poses = np.asarray(result_triple.infos.poses)[:, :, 0]
        d = np.linalg.norm(poses[-1, :, :2] - poses[0, :, :2], axis=-1)
        assert (d > 0.3).all(), f"stuck vehicles: moved {d}"

    def test_uses_fast_rows(self, result_triple):
        # the point of triple_speed: trims beyond the first speed row
        # (indices > 11) must actually be chosen
        trims = np.asarray(result_triple.infos.trims)
        assert (trims > 11).any()

    def test_matches_golden(self, result_triple):
        compare_golden("commonroad_03veh_triple", result_triple)


class TestRealisticSystem:
    def test_no_collisions(self, result_realistic):
        assert pairwise_vehicle_collisions(result_realistic) == []

    def test_progress(self, result_realistic):
        poses = np.asarray(result_realistic.infos.poses)[:, :, 0]
        d = np.linalg.norm(poses[-1, :, :2] - poses[0, :, :2], axis=-1)
        assert (d > 0.3).all(), f"stuck vehicles: moved {d}"

    def test_accelerates_through_grid(self, result_realistic):
        # accel-limited grid: speeds must ramp up over consecutive steps
        cfg = GOLDEN_CONFIGS["circle_03veh_realistic"].validate()
        m = mpa_mod.build_mpa(cfg)
        trims = np.asarray(result_realistic.infos.trims)[:, :, 0]
        speeds = m.trim_speed[trims]
        assert speeds.max() > 0.5
        dv = np.abs(np.diff(speeds, axis=0))
        assert (dv.max()
                <= 1.05 * mpa_mod.MAX_ACCELERATION_M_S2 * cfg.dt_seconds
                + 1e-6)

    def test_matches_golden(self, result_realistic):
        compare_golden("circle_03veh_realistic", result_realistic)
