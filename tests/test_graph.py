"""Coupling-graph algebra tests.

Property test mirrors the reference's component test
(tests/componenttests/test_prioritizer.m): unique_priorities must return
exactly the set of topologically-unique priority assignments, cross-validated
against brute-force permutation enumeration.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.parallel import graph as g


def jarr(x):
    return jnp.asarray(np.asarray(x))


class TestKahn:
    def test_chain(self):
        # 0 -> 1 -> 2
        a = np.zeros((3, 3))
        a[0, 1] = a[1, 2] = 1
        levels, is_dag = g.kahn_levels(jarr(a))
        np.testing.assert_array_equal(np.asarray(levels), [1, 2, 3])
        assert bool(is_dag)

    def test_parallel(self):
        a = np.zeros((4, 4))
        a[0, 2] = a[1, 3] = 1
        levels, is_dag = g.kahn_levels(jarr(a))
        np.testing.assert_array_equal(np.asarray(levels), [1, 1, 2, 2])
        assert bool(is_dag)

    def test_cycle_detected(self):
        a = np.zeros((2, 2))
        a[0, 1] = a[1, 0] = 1
        _, is_dag = g.kahn_levels(jarr(a))
        assert not bool(is_dag)

    def test_empty(self):
        levels, is_dag = g.kahn_levels(jarr(np.zeros((3, 3))))
        np.testing.assert_array_equal(np.asarray(levels), [1, 1, 1])
        assert bool(is_dag)


class TestPriorities:
    def test_directed_from_priorities(self):
        adj = np.ones((3, 3)) - np.eye(3)
        prio = np.array([2, 1, 3])
        d = np.asarray(g.directed_coupling_from_priorities(jarr(adj), jarr(prio)))
        # vehicle 1 (priority 1) plans first: edges 1->0, 1->2, 0->2
        assert d[1, 0] and d[1, 2] and d[0, 2]
        assert not d[0, 1] and not d[2, 1] and not d[2, 0]

    def test_roundtrip(self):
        adj = np.zeros((4, 4))
        adj[0, 1] = adj[1, 0] = 1
        adj[2, 3] = adj[3, 2] = 1
        prio = np.array([2, 1, 1, 2])
        d = g.directed_coupling_from_priorities(jarr(adj), jarr(prio))
        p2 = np.asarray(g.priorities_from_directed_coupling(d))
        d2 = np.asarray(g.directed_coupling_from_priorities(jarr(adj), jarr(p2)))
        np.testing.assert_array_equal(np.asarray(d), d2)

    def test_random_priorities_deterministic(self):
        p1 = np.asarray(g.random_priorities(5, jnp.asarray(3)))
        p2 = np.asarray(g.random_priorities(5, jnp.asarray(3)))
        p3 = np.asarray(g.random_priorities(5, jnp.asarray(4)))
        np.testing.assert_array_equal(p1, p2)
        assert sorted(p1.tolist()) == [1, 2, 3, 4, 5]
        assert not np.array_equal(p1, p3) or True  # different step may differ


class TestColoring:
    def test_proper_coloring(self):
        rng = np.random.default_rng(7)
        for _ in range(5):
            n = 6
            adj = rng.random((n, n)) < 0.4
            adj = np.triu(adj, 1)
            adj = adj | adj.T
            prio = np.asarray(g.coloring_priorities(jarr(adj)))
            # adjacent vehicles never share a priority level
            for i in range(n):
                for j in range(n):
                    if adj[i, j]:
                        assert prio[i] != prio[j]

    def test_minimizes_levels_on_bipartite(self):
        # path graph 0-1-2-3 is 2-colorable -> 2 levels
        adj = np.zeros((4, 4))
        for i in range(3):
            adj[i, i + 1] = adj[i + 1, i] = 1
        prio = np.asarray(g.coloring_priorities(jarr(adj)))
        d = g.directed_coupling_from_priorities(jarr(adj), jarr(prio))
        levels, _ = g.kahn_levels(d)
        assert int(jnp.max(levels)) == 2


class TestWeights:
    def test_constant(self):
        d = np.zeros((3, 3))
        d[0, 1] = 1
        w = np.asarray(g.constant_weights(jarr(d)))
        assert w[0, 1] == 0.5 and w[1, 0] == 0

    def test_distance(self):
        d = np.zeros((2, 2))
        d[0, 1] = 1
        pos = np.array([[0.0, 0.0], [1.0, 0.0]])
        w = np.asarray(
            g.distance_weights(jarr(d), jarr(pos), 0.8, 0.2, 6)
        )
        # d_max = 2*0.8*0.2*6 = 1.92; w = 1 - 1/1.92
        assert w[0, 1] == pytest.approx(1 - 1 / 1.92, abs=1e-6)

    def test_random_seeded(self):
        d = np.ones((3, 3)) - np.eye(3)
        w1 = np.asarray(g.random_weights(jarr(d), jnp.asarray(5)))
        w2 = np.asarray(g.random_weights(jarr(d), jnp.asarray(5)))
        np.testing.assert_array_equal(w1, w2)
        assert (w1[d.astype(bool)] > 0).all()


class TestGreedyCut:
    def test_identity_when_unbounded(self):
        d = np.zeros((3, 3))
        d[0, 1] = d[1, 2] = 0.7
        seq = np.asarray(g.greedy_cut(jarr(d), 3, 3))
        np.testing.assert_array_equal(seq, d > 0)

    def test_no_edges_when_one_level(self):
        d = np.zeros((3, 3))
        d[0, 1] = 0.7
        seq = np.asarray(g.greedy_cut(jarr(d), 1, 3))
        assert not seq.any()

    def test_bounds_levels(self):
        # chain 0->1->2->3 with bound 2: at most 2 levels afterwards
        d = np.zeros((4, 4))
        weights = [0.9, 0.8, 0.7]
        for i, w in enumerate(weights):
            d[i, i + 1] = w
        seq = g.greedy_cut(jarr(d), 2, 4)
        levels, is_dag = g.kahn_levels(seq)
        assert bool(is_dag)
        assert int(jnp.max(levels)) <= 2
        # highest-weight edge is kept
        assert bool(seq[0, 1])

    def test_matches_per_edge_kahn_reference(self):
        """The incremental longest-path-matrix formulation must make
        EXACTLY the reference's greedy decisions (GreedyCutter.m:57-63:
        re-level per candidate edge, accept iff levels stay bounded)."""

        def kahn_max_level_np(directed):
            # numpy kahn (jitting g.kahn_levels per candidate would pay
            # a fresh compile for every graph size)
            n = directed.shape[0]
            a = directed.copy().astype(int)
            done = np.zeros(n, dtype=bool)
            level = 0
            while not done.all():
                sources = ~done & (a.sum(axis=0) == 0)
                if not sources.any():
                    return n + 1                    # cyclic
                level += 1
                a[sources, :] = 0
                done |= sources
            return level

        def reference_cut(weighted, max_num_cls):
            n = weighted.shape[0]
            if max_num_cls >= n:
                return weighted != 0.0
            if max_num_cls <= 1:
                return np.zeros_like(weighted, dtype=bool)
            flat = weighted.reshape(-1)
            order = np.argsort(-flat, kind="stable")
            seq = np.zeros((n, n), dtype=bool)
            for e in order:
                r, c = divmod(int(e), n)
                if flat[e] == 0.0:
                    continue
                cand = seq.copy()
                cand[r, c] = True
                if kahn_max_level_np(cand) <= max_num_cls:
                    seq = cand
            return seq

        rng = np.random.default_rng(5)
        for trial in range(12):
            n = int(rng.integers(3, 9))
            # priorities orient all edges consistently (a DAG, like the
            # prioritized coupling graphs the cutter receives); weights
            # include NEGATIVE values (distance weigher beyond d_max)
            prio = rng.permutation(n)
            w = np.zeros((n, n))
            for i in range(n):
                for j in range(n):
                    if i != j and prio[i] < prio[j] and rng.random() < 0.5:
                        w[i, j] = rng.uniform(-1, 1)
            for bound in (2, 3, n // 2 + 1):
                want = reference_cut(w, bound)
                got = np.asarray(g.greedy_cut(jarr(w), bound, n))
                np.testing.assert_array_equal(got, want, err_msg=(
                    f"trial {trial} bound {bound}\n{w}"
                ))


class TestFallbackClosure:
    def test_propagates_through_coupling(self):
        n = 4
        adj = np.zeros((n, n))
        adj[0, 1] = adj[1, 0] = 1
        adj[1, 2] = adj[2, 1] = 1
        fb = np.array([True, False, False, False])
        out = np.asarray(
            g.fallback_closure(jarr(fb), jarr(adj), jarr(np.zeros((n, n))))
        )
        np.testing.assert_array_equal(out, [True, True, True, False])

    def test_sequential_edges_already_considered(self):
        # 0 falls back; 1 planned after 0 sequentially (edge 0->1 considered)
        n = 2
        adj = np.zeros((n, n))
        adj[0, 1] = adj[1, 0] = 1
        seq = np.zeros((n, n))
        seq[0, 1] = 1
        fb = np.array([True, False])
        out = np.asarray(g.fallback_closure(jarr(fb), jarr(adj), jarr(seq)))
        np.testing.assert_array_equal(out, [True, False])


class TestUniquePriorities:
    def test_matches_bruteforce(self):
        # reference componenttest: random 5-agent graph vs perms enumeration
        rng = np.random.default_rng(123)
        for _ in range(3):
            n = 5
            adj = rng.random((n, n)) < 0.5
            adj = np.triu(adj, 1)
            adj = (adj | adj.T).astype(float)

            perms = g.unique_priorities_np(adj)

            # brute force: all priority permutations -> induced DAG -> dedupe
            def induced(prio):
                keep = prio[:, None] < prio[None, :]
                return (adj.astype(bool) & keep).tobytes()

            brute = {
                induced(np.array(p))
                for p in itertools.permutations(range(1, n + 1))
            }
            ours = {induced(p) for p in perms}
            assert ours == brute
            # and each returned priority vector is unique
            assert len({tuple(p) for p in perms}) == perms.shape[0]
