"""Optimal / explorative priority mode tests.

Reference behaviors: PrioritizedOptimalController.m (global-minimum
permutation voting) and PrioritizedExplorativeController.m (per-subgraph
level-permutation voting with kept priorities).
"""

import numpy as np
import pytest

from pdmpc_tpu.config import Config, PriorityStrategies, ScenarioType
from pdmpc_tpu.experiment import run_experiment
from tests.test_controller import pairwise_vehicle_collisions


def make_cfg(priority, **kw):
    defaults = dict(
        scenario_type=ScenarioType.circle,
        amount=3,
        T_end=3.0,
        beam_width=96,
        priority=priority,
        max_priority_permutations=8,
    )
    defaults.update(kw)
    return Config(**defaults)


class TestOptimalPriority:
    @pytest.fixture(scope="class")
    def result(self):
        return run_experiment(
            make_cfg(PriorityStrategies.optimal_priority)
        )

    def test_no_collisions(self, result):
        assert pairwise_vehicle_collisions(result) == []

    def test_progress_no_fallback(self, result):
        poses = np.asarray(result.infos.poses)[:, :, 0]
        d = np.linalg.norm(poses[-1, :, :2] - poses[0, :, :2], axis=-1)
        assert (d > 0.5).all()
        assert not np.asarray(result.infos.needs_fallback).any()

    def test_multiple_permutations_explored(self, result):
        # once coupled, the chosen permutation varies (not always 0)
        perms = np.asarray(result.infos.priority_permutation)
        assert perms.max() >= 1

    def test_cost_not_worse_than_constant(self, result):
        const = run_experiment(
            make_cfg(PriorityStrategies.constant_priority)
        )
        # optimal priority minimizes summed solution cost per step; over the
        # run it should not be meaningfully worse than the constant baseline
        cost_opt = np.asarray(result.infos.cost).sum()
        cost_const = np.asarray(const.infos.cost).sum()
        assert cost_opt <= cost_const * 1.05

    def test_rejects_large_fleets(self):
        with pytest.raises(ValueError, match="limited to 6"):
            run_experiment(
                make_cfg(PriorityStrategies.optimal_priority, amount=7,
                         T_end=0.4)
            )


class TestExplorativePriority:
    @pytest.fixture(scope="class")
    def result(self):
        return run_experiment(
            make_cfg(PriorityStrategies.explorative_priority)
        )

    def test_no_collisions(self, result):
        assert pairwise_vehicle_collisions(result) == []

    def test_progress_no_fallback(self, result):
        poses = np.asarray(result.infos.poses)[:, :, 0]
        d = np.linalg.norm(poses[-1, :, :2] - poses[0, :, :2], axis=-1)
        assert (d > 0.5).all()
        assert not np.asarray(result.infos.needs_fallback).any()

    def test_priorities_persist_across_steps(self, result):
        # the kept prioritization must remain a valid permutation of 1..N
        prios = np.asarray(result.infos.priorities)
        for k in range(prios.shape[0]):
            assert sorted(prios[k].tolist()) == [1, 2, 3]

    def test_scales_beyond_six_vehicles(self):
        res = run_experiment(
            make_cfg(
                PriorityStrategies.explorative_priority,
                amount=8,
                T_end=1.0,
                beam_width=64,
                max_num_CLs=3,
            )
        )
        assert np.asarray(res.infos.poses).shape[1] == 8


class TestExplorativeVoteNumerics:
    """The per-subgraph vote must stay finite when a permutation leaves a
    vehicle exhausted (cost = inf): inf * 0 in the one-hot vote matmul is
    NaN and argmin over NaN rows picks an arbitrary permutation."""

    def test_exhausted_cost_does_not_poison_other_subgraphs(self):
        import jax.numpy as jnp

        from pdmpc_tpu.config import Config, ScenarioType
        from pdmpc_tpu.controller import _solve_explorative
        from pdmpc_tpu.ops.search import PlanResult
        from pdmpc_tpu.parallel.comm import LocalComm

        n, hp, vo = 4, 1, 16
        cfg = Config(
            scenario_type=ScenarioType.circle, amount=n, max_num_CLs=2
        )
        comm = LocalComm(n)
        # two independent chains: 0 -> 1 and 2 -> 3
        sequential0 = jnp.zeros((n, n), dtype=bool
                                ).at[0, 1].set(True).at[2, 3].set(True)
        directed = sequential0
        levels0 = jnp.asarray([1, 2, 1, 2], dtype=jnp.int32)

        # solve is traced once inside the permutation scan, so the fake
        # costs are a traced function of the permutation's orientation:
        # permutation 1 flips 0->1 to 1->0. Permutation 0 leaves vehicle 1
        # EXHAUSTED (cost = inf).
        def solve(directed_p):
            is_p1 = directed_p[1, 0]
            cost = jnp.where(
                is_p1,
                jnp.asarray([2.0, 2.0, 1.0, 1.0]),
                jnp.asarray([1.0, jnp.inf, 5.0, 5.0]),
            )
            exh = jnp.where(
                is_p1,
                jnp.zeros((n,), dtype=bool),
                jnp.asarray([False, True, False, False]),
            )
            planned = PlanResult(
                trims=jnp.zeros((n, hp), dtype=jnp.int32),
                poses=jnp.zeros((n, hp, 3)),
                shapes=jnp.zeros((n, hp, 5, 2)),
                cost=cost,
                is_exhausted=exh,
                n_expanded=jnp.zeros((n,), dtype=jnp.int32),
            )
            shapes_g = jnp.zeros((n, hp, vo, 2))
            seq = directed_p
            levels = jnp.where(
                is_p1,
                jnp.asarray([2, 1, 2, 1], dtype=jnp.int32),
                jnp.asarray([1, 2, 1, 2], dtype=jnp.int32),
            )
            return planned, shapes_g, seq, levels

        (planned, shapes_g, sequential, levels, priorities, directed_comb,
         chosen) = _solve_explorative(
            cfg, comm, solve, directed, sequential0, levels0, 2
        )
        chosen = np.asarray(chosen)
        # both subgraphs prefer permutation 1 (finite, lower totals);
        # with NaN poisoning the argmin would land on permutation 0
        np.testing.assert_array_equal(chosen, [1, 1, 1, 1])
        assert np.isfinite(np.asarray(planned.cost)).all()
