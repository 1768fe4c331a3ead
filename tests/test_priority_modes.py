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

    def test_runs_beyond_six_vehicles(self):
        # the reference's envelope is bounded by coupling sparsity, not
        # fleet size (Prioritizer.unique_priorities enumerates 2^edges of
        # the runtime graph); per-subgraph orientation enumeration keeps
        # that property — an 8-vehicle commonroad fleet must run
        res = run_experiment(
            make_cfg(
                PriorityStrategies.optimal_priority,
                scenario_type=ScenarioType.commonroad,
                amount=8, T_end=1.0, beam_width=64,
            )
        )
        assert np.asarray(res.infos.poses).shape[1] == 8
        assert pairwise_vehicle_collisions(res) == []


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


class TestOptimalEquivalence:
    """_solve_optimal's per-subgraph edge-orientation vote must find the
    same global cost minimum as brute-force enumeration of all
    topologically-unique priority assignments (unique_priorities_np, the
    reference's Prioritizer.unique_priorities semantics)."""

    def _run_case(self, adj_np, seed):
        import jax.numpy as jnp

        from pdmpc_tpu.config import Config, ScenarioType
        from pdmpc_tpu.controller import _solve_optimal
        from pdmpc_tpu.ops.search import PlanResult
        from pdmpc_tpu.parallel import graph as g
        from pdmpc_tpu.parallel.comm import LocalComm

        n = adj_np.shape[0]
        rng = np.random.default_rng(seed)
        # per-ordered-edge cost of "i plans before j": additive over
        # vehicles and local to each component, like real solution costs
        w = rng.uniform(0.1, 2.0, size=(n, n))

        def cost_of_directed(d):
            return (np.asarray(d, dtype=float) * w).sum(axis=1)

        def solve(directed_p):
            cost = jnp.sum(
                directed_p.astype(jnp.float32) * jnp.asarray(w, jnp.float32),
                axis=1,
            )
            hp, vo = 1, 16
            planned = PlanResult(
                trims=jnp.zeros((n, hp), dtype=jnp.int32),
                poses=jnp.zeros((n, hp, 3)),
                shapes=jnp.zeros((n, hp, 5, 2)),
                cost=cost.astype(jnp.float64)
                if cost.dtype == jnp.float64 else cost,
                is_exhausted=jnp.zeros((n,), dtype=bool),
                n_expanded=jnp.zeros((n,), dtype=jnp.int32),
            )
            shapes_g = jnp.zeros((n, hp, vo, 2))
            levels, _ = g.kahn_levels(directed_p)
            return planned, shapes_g, directed_p, levels

        cfg = Config(scenario_type=ScenarioType.circle, amount=max(n, 2),
                     max_priority_permutations=16)
        comm = LocalComm(n)
        planned, _, _, _, priorities, directed_comb, _ = _solve_optimal(
            cfg, comm, solve, jnp.asarray(adj_np)
        )
        achieved = float(np.asarray(planned.cost).sum())

        # brute force over all topologically-unique priority assignments
        best = np.inf
        for prio in g.unique_priorities_np(adj_np):
            d = adj_np & (prio[:, None] < prio[None, :])
            best = min(best, cost_of_directed(d).sum())
        np.testing.assert_allclose(achieved, best, rtol=1e-5)
        # the adopted combined orientation must be acyclic and consistent
        # with the kept priorities
        pr = np.asarray(priorities)
        d = np.asarray(directed_comb)
        assert sorted(pr.tolist()) == list(range(1, n + 1))
        ii, jj = np.nonzero(d)
        assert (pr[ii] < pr[jj]).all()

    def test_two_components_with_cycle_candidates(self):
        # component {0,1,2} is a triangle (2 of 8 orientation bitmasks are
        # cyclic and must be masked from the vote); component {3,4,5,6} is
        # a path; vehicle 7 is isolated
        n = 8
        adj = np.zeros((n, n), dtype=bool)
        for i, j in [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (5, 6)]:
            adj[i, j] = adj[j, i] = True
        for seed in range(5):
            self._run_case(adj, seed)

    @pytest.mark.slow
    def test_random_sparse_graphs(self):
        rng = np.random.default_rng(0)
        for trial in range(8):
            n = int(rng.integers(2, 8))
            adj = np.zeros((n, n), dtype=bool)
            # sparse: ~n edges, keeps every component within the 4-bit cap
            for _ in range(n):
                i, j = rng.integers(0, n, size=2)
                if i != j:
                    adj[i, j] = adj[j, i] = True
            # skip graphs where some component exceeds the e_cap=4 budget
            # (partial enumeration is allowed to be suboptimal there)
            comp = _components_np(adj)
            edges = np.triu(adj, 1)
            ok = True
            for c in set(comp):
                members = comp == c
                if edges[np.ix_(members, members)].sum() > 4:
                    ok = False
            if not ok:
                continue
            self._run_case(adj, 100 + trial)


def _components_np(adj):
    n = adj.shape[0]
    labels = np.arange(n)
    for _ in range(n):
        for i in range(n):
            nb = np.nonzero(adj[i])[0]
            if nb.size:
                m = min(labels[i], labels[nb].min())
                labels[i] = m
                labels[nb] = np.minimum(labels[nb], m)
    return labels


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
