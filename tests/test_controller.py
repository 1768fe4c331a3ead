"""End-to-end controller tests on the circle scenario.

Mirrors the role of the reference's system tests
(tests/systemtests/systemtests.m): run the full receding-horizon loop on a
small scenario and check trajectory-level properties (progress, collision
freedom, determinism).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.config import Config, PriorityStrategies, ScenarioType
from pdmpc_tpu.experiment import is_deadlock, run_experiment
from pdmpc_tpu.models.bicycle import VEHICLE_LENGTH, VEHICLE_WIDTH
from pdmpc_tpu.ops import geometry as geo


def make_cfg(**kw):
    defaults = dict(
        scenario_type=ScenarioType.circle,
        amount=2,
        T_end=4.0,
        beam_width=128,
    )
    defaults.update(kw)
    return Config(**defaults)


def pairwise_vehicle_collisions(result):
    """Check occupied rectangles (no offset) of applied poses pairwise."""
    poses = np.asarray(result.infos.poses)[:, :, 0]   # [k, N, 3]
    k_end, n = poses.shape[:2]
    collisions = []
    for k in range(k_end):
        for i in range(n):
            for j in range(i + 1, n):
                if np.linalg.norm(poses[k, i, :2] - poses[k, j, :2]) > 0.5:
                    continue
                ri = geo.transformed_rectangle(
                    poses[k, i, 0], poses[k, i, 1], poses[k, i, 2],
                    VEHICLE_LENGTH, VEHICLE_WIDTH,
                )
                rj = geo.transformed_rectangle(
                    poses[k, j, 0], poses[k, j, 1], poses[k, j, 2],
                    VEHICLE_LENGTH, VEHICLE_WIDTH,
                )
                if bool(geo.sat_collide(ri, rj)):
                    collisions.append((k, i, j))
    return collisions


class TestSingleVehicle:
    def test_follows_reference(self):
        cfg = make_cfg(amount=1, T_end=2.0)
        res = run_experiment(cfg)
        poses = np.asarray(res.infos.poses)[:, 0, 0]   # [k, 3]
        # vehicle starts at (0.25, 2, 0) and drives toward +x
        assert poses[-1, 0] > poses[0, 0] + 0.5
        # stays on the straight path
        np.testing.assert_allclose(poses[:, 1], 2.0, atol=0.05)
        # never needs fallback in free space
        assert not np.asarray(res.infos.needs_fallback).any()
        # reaches max speed (travels ~0.16 m per step once up to speed)
        dx = np.diff(poses[:, 0])
        assert dx[-1] == pytest.approx(0.16, abs=0.02)


class TestTwoVehiclesHeadOn:
    @pytest.fixture(scope="class")
    def result(self):
        return run_experiment(make_cfg())

    def test_no_collisions(self, result):
        assert pairwise_vehicle_collisions(result) == []

    def test_coupling_appears(self, result):
        adjacency = np.asarray(result.infos.adjacency)
        # vehicles start 4 m apart -> uncoupled; they are coupled later
        assert not adjacency[0].any()
        assert adjacency.any()

    def test_progress(self, result):
        poses = np.asarray(result.infos.poses)[:, :, 0]
        # vehicle 0 heads +x from 0.25; vehicle 1 heads -x from 4.25
        assert poses[-1, 0, 0] > 1.0
        assert poses[-1, 1, 0] < 3.5

    def test_priorities_and_levels(self, result):
        levels = np.asarray(result.infos.levels)
        assert levels.min() >= 1
        # when coupled, two levels exist (constant priority -> sequential)
        adjacency = np.asarray(result.infos.adjacency)
        coupled_steps = adjacency.any(axis=(1, 2))
        assert (levels[coupled_steps].max(axis=-1) == 2).any()

    def test_determinism(self, result):
        res2 = run_experiment(make_cfg())
        np.testing.assert_array_equal(
            np.asarray(result.infos.poses), np.asarray(res2.infos.poses)
        )


class TestStrategies:
    @pytest.mark.parametrize(
        "priority",
        [PriorityStrategies.random_priority, PriorityStrategies.coloring_priority],
    )
    def test_alternative_priorities_no_collision(self, priority):
        res = run_experiment(make_cfg(priority=priority, T_end=3.0))
        assert pairwise_vehicle_collisions(res) == []

    def test_no_deadlock_two_vehicles(self):
        res = run_experiment(make_cfg(T_end=4.0))
        assert not is_deadlock(res.infos, res.options).any()


class TestResultPersistence:
    def test_save_load_roundtrip(self, tmp_path):
        res = run_experiment(make_cfg(amount=1, T_end=1.0))
        base = res.save(str(tmp_path))
        from pdmpc_tpu.experiment import ExperimentResult

        loaded = ExperimentResult.load(base)
        np.testing.assert_array_equal(
            np.asarray(loaded.infos.poses), np.asarray(res.infos.poses)
        )
        assert loaded.options.isequal(res.options)


class TestDistanceCouplerPrefilter:
    """DistanceCoupler.m:28-31,56-63 lanelet-adjacency prefilter."""

    def test_non_adjacent_lanelets_never_couple(self):
        import jax.numpy as jnp

        from pdmpc_tpu.config import Config, CouplingStrategies
        from pdmpc_tpu.controller import _couple

        cfg = Config(coupling=CouplingStrategies.distance_coupling)
        # two vehicles 0.1 m apart (well within max_distance)
        poses = jnp.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]])
        rs = jnp.zeros((2, cfg.Hp, 4, 2))
        # vehicle 0 on lanelet 1, vehicle 1 on lanelet 2; 1 and 2 NOT
        # adjacent
        pred = jnp.array([[1, 0, 0], [2, 0, 0]], dtype=jnp.int32)
        adj_ll = jnp.zeros((3, 3), dtype=bool).at[1, 1].set(True).at[
            2, 2].set(True)
        out = _couple(cfg, rs, poses, 1.0, pred_lanelets=pred,
                      adjacency_lanelets=adj_ll)
        assert not bool(out.any())
        # make lanelets 1 and 2 adjacent -> coupled again
        adj_ll2 = adj_ll.at[1, 2].set(True).at[2, 1].set(True)
        out2 = _couple(cfg, rs, poses, 1.0, pred_lanelets=pred,
                       adjacency_lanelets=adj_ll2)
        assert bool(out2[0, 1]) and bool(out2[1, 0])

    def test_padded_zero_ids_are_inert(self):
        import jax.numpy as jnp

        from pdmpc_tpu.config import Config, CouplingStrategies
        from pdmpc_tpu.controller import _couple

        cfg = Config(coupling=CouplingStrategies.distance_coupling)
        poses = jnp.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]])
        rs = jnp.zeros((2, cfg.Hp, 4, 2))
        # both vehicles only have padding ids -> no adjacency evidence
        pred = jnp.zeros((2, 3), dtype=jnp.int32)
        adj_ll = jnp.ones((3, 3), dtype=bool).at[0, :].set(False).at[
            :, 0].set(False)
        out = _couple(cfg, rs, poses, 1.0, pred_lanelets=pred,
                      adjacency_lanelets=adj_ll)
        assert not bool(out.any())

    def test_commonroad_distance_coupling_runs(self):
        from pdmpc_tpu.config import Config, CouplingStrategies, ScenarioType
        from pdmpc_tpu.experiment import run_experiment

        res = run_experiment(
            Config(scenario_type=ScenarioType.commonroad, amount=2,
                   T_end=1.0, beam_width=64,
                   coupling=CouplingStrategies.distance_coupling)
        )
        assert res.n_steps == 5


class TestExecutionKnobs:
    """Perf-only execution knobs must not change results
    (Config._EQUALITY_IRRELEVANT contract)."""

    def test_unroll_layers_bit_identical(self):
        import dataclasses

        import jax

        from pdmpc_tpu.config import Config, ScenarioType
        from pdmpc_tpu.experiment import run_experiment

        cfg = Config(scenario_type=ScenarioType.circle, amount=3,
                     T_end=1.0, beam_width=64).validate()
        r1 = run_experiment(cfg)
        r2 = run_experiment(
            dataclasses.replace(cfg, unroll_layers=False).validate()
        )
        for a, b in zip(jax.tree.leaves(r1.infos),
                        jax.tree.leaves(r2.infos)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCompactSchedule:
    """Property test of the compact-level planning schedule
    (controller.compact_schedule): every vehicle exactly once, chunks
    never mix levels, chunks emitted in level order."""

    # 50 random shapes = 50 jit compiles (~30 s each test); the default
    # run keeps a 10-trial version, CI runs the full sweep
    @pytest.mark.parametrize("n_trials", [
        6, pytest.param(50, marks=pytest.mark.slow),
    ])
    def test_random_levels(self, n_trials):
        import jax.numpy as jnp

        from pdmpc_tpu.controller import compact_schedule

        rng = np.random.default_rng(7)
        for trial in range(n_trials):
            n = int(rng.integers(1, 24))
            c = int(rng.integers(1, n + 1))
            # 1-based levels with arbitrary gaps and arbitrary assignment
            levels = rng.integers(1, max(2, n // 2 + 1), size=n)
            sched, n_chunks = compact_schedule(
                jnp.asarray(levels, dtype=jnp.int32), c
            )
            sched = np.asarray(sched)
            n_chunks = int(n_chunks)
            used = sched[:n_chunks]
            flat = used[used >= 0]
            # every vehicle exactly once
            assert sorted(flat.tolist()) == list(range(n)), (n, c, levels)
            # rows beyond n_chunks are all padding
            assert (sched[n_chunks:] == -1).all()
            prev_level = 0
            for row in used:
                row_v = row[row >= 0]
                assert len(row_v) >= 1
                row_levels = levels[row_v]
                # a chunk never mixes levels
                assert (row_levels == row_levels[0]).all(), (n, c, levels)
                # chunks in nondecreasing level order
                assert row_levels[0] >= prev_level
                prev_level = row_levels[0]

    @pytest.mark.parametrize("n_trials", [
        6, pytest.param(50, marks=pytest.mark.slow),
    ])
    def test_dataflow_schedule_random_dags(self, n_trials):
        import jax.numpy as jnp

        from pdmpc_tpu.controller import compact_schedule
        from pdmpc_tpu.parallel.graph import kahn_levels

        rng = np.random.default_rng(11)
        for trial in range(n_trials):
            n = int(rng.integers(2, 24))
            c = int(rng.integers(1, n + 1))
            # random DAG: edges only from lower to higher index
            dag = np.triu(rng.random((n, n)) < 0.25, k=1)
            levels, _ = kahn_levels(jnp.asarray(dag))
            levels = np.asarray(levels)
            sched, n_chunks = compact_schedule(
                jnp.asarray(levels, dtype=jnp.int32), c, jnp.asarray(dag)
            )
            sched = np.asarray(sched)
            n_chunks = int(n_chunks)
            used = sched[:n_chunks]
            flat = used[used >= 0]
            # every vehicle exactly once
            assert sorted(flat.tolist()) == list(range(n)), (n, c)
            assert (sched[n_chunks:] == -1).all()
            chunk_of = np.full(n, -1)
            for t, row in enumerate(used):
                for v in row[row >= 0]:
                    chunk_of[v] = t
            # every sequential predecessor planned strictly earlier
            for p, v in zip(*np.nonzero(dag)):
                assert chunk_of[p] < chunk_of[v], (n, c, p, v)
            # never more chunks than the level-grouped schedule
            _, n_level = compact_schedule(
                jnp.asarray(levels, dtype=jnp.int32), c
            )
            assert n_chunks <= int(n_level)
            # and never fewer than the work/width lower bound
            assert n_chunks >= -(-n // c)
