"""Coupling-graph algebra: leveling, prioritization, weighting, cutting.

TPU-native re-design of the reference's graph strategy components as
device-side integer/boolean matrix algebra (all jittable, batched with vmap):

- ``kahn_levels``        <- utility/kahn.m (topological leveling)
- ``directed_coupling_from_priorities`` / ``priorities_from_directed_coupling``
                         <- hlc/controller/prioritized/priority/Prioritizer.m
- ``coloring_priorities`` <- ColoringPrioritizer.m (greedy SDO/LDO coloring,
                         level reordering to minimize incoming edges;
                         minimizes #computation levels, arXiv:2501.10812)
- ``random_priorities`` / ``constant_priorities`` <- RandomPrioritizer.m /
                         ConstantPrioritizer.m
- ``greedy_cut``         <- cut/GreedyCutter.m (bound computation levels,
                         ECC 2024 "Limiting computation levels")
- weighers               <- weight/{Constant,Random,Distance}Weigher.m
- ``unique_priorities``  <- Prioritizer.unique_priorities (host-side numpy
                         enumeration; the reference enumerates 2^edges
                         orientations and is likewise only tractable for
                         small coupling graphs)
- ``fallback_closure``   <- PrioritizedController.check_others_fallback
                         (:623-676): transitive fallback propagation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INT = jnp.int32


def kahn_levels(directed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Computation level (1-based) of each vehicle from a sequential DAG.

    directed: [N, N] bool/0-1, entry (i, j) = edge i -> j.
    Returns (levels [N] int32, is_dag bool). Vertices stuck in a cycle keep
    level 0 and is_dag is False. Reference: utility/kahn.m:1-24.
    """
    n = directed.shape[0]
    a0 = directed.astype(_INT)

    def body(_, carry):
        a, levels, sorted_mask, current = carry
        in_deg = jnp.sum(a, axis=0)
        sources = (~sorted_mask) & (in_deg == 0)
        levels = jnp.where(sources, current, levels)
        a = jnp.where(sources[:, None], 0, a)
        sorted_mask = sorted_mask | sources
        return (a, levels, sorted_mask, current + 1)

    _, levels, sorted_mask, _ = jax.lax.fori_loop(
        0,
        n,
        body,
        (
            a0,
            jnp.zeros((n,), dtype=_INT),
            jnp.zeros((n,), dtype=bool),
            jnp.array(1, dtype=_INT),
        ),
    )
    return levels, jnp.all(sorted_mask)


def number_of_computation_levels(directed: jax.Array) -> jax.Array:
    """Reference: IterationData.m:87-89."""
    levels, _ = kahn_levels(directed)
    return jnp.max(levels)


def directed_coupling_from_priorities(
    adjacency: jax.Array, priorities: jax.Array
) -> jax.Array:
    """Edge i -> j kept iff coupled and priorities[i] < priorities[j]
    (smaller value = higher priority = plans first).

    Reference: Prioritizer.directed_coupling_from_priorities (:64-77).
    """
    keep = priorities[:, None] < priorities[None, :]
    return (adjacency.astype(bool) & keep)


def priorities_from_directed_coupling(directed: jax.Array) -> jax.Array:
    """Priorities (1..N) from a DAG via a deterministic topological order.

    Order is (kahn level, vehicle index) — a valid stable topological order
    (if i -> j then level_i < level_j). Reference:
    Prioritizer.priorities_from_directed_coupling (:79-95) uses MATLAB's
    stable toposort; any deterministic topological order yields an
    equivalent prioritization.
    """
    n = directed.shape[0]
    levels, _ = kahn_levels(directed)
    order = jnp.argsort(levels * n + jnp.arange(n))
    priorities = jnp.zeros((n,), dtype=_INT).at[order].set(
        jnp.arange(1, n + 1, dtype=_INT)
    )
    return priorities


def constant_priorities(n: int) -> jax.Array:
    """priority = vehicle index. Reference: ConstantPrioritizer.m."""
    return jnp.arange(1, n + 1, dtype=_INT)


def random_priorities(n: int, time_step: jax.Array, seed: int = 0) -> jax.Array:
    """Random permutation seeded by the time step.

    Reference: RandomPrioritizer.m (mt19937ar seeded by time step; any
    deterministic per-step permutation satisfies the capability).
    """
    key = jax.random.fold_in(jax.random.PRNGKey(seed), time_step)
    return jax.random.permutation(key, jnp.arange(1, n + 1, dtype=_INT))


def coloring_priorities(adjacency: jax.Array) -> jax.Array:
    """Graph-coloring priorities minimizing #computation levels.

    Greedy coloring in SDO/LDO vertex order, then level reordering by
    descending maximum vertex degree. Returns per-vehicle priority values
    (the level index each vehicle ends up in; ties impossible between
    adjacent vehicles by coloring validity).
    Reference: ColoringPrioritizer.m:31-151.
    """
    n = adjacency.shape[0]
    adj = adjacency.astype(bool)
    degree = jnp.sum(adj, axis=0).astype(_INT)

    # color 0 = uncolored; isolated vertices get color 1 immediately
    color0 = jnp.where(degree == 0, 1, 0).astype(_INT)

    def body(_, color):
        uncolored = color == 0
        # saturation degree: number of distinct colors among neighbors
        neigh_colors = jnp.where(adj, color[None, :], 0)  # [N, N]
        has_color = (
            neigh_colors[:, :, None]
            == jnp.arange(1, n + 1, dtype=_INT)[None, None, :]
        )
        sat = jnp.sum(jnp.any(has_color, axis=1), axis=-1).astype(_INT)
        # pick: max saturation, tie-break max degree, then min index
        score = jnp.where(uncolored, sat * (n + 1) + degree, -1)
        v = jnp.argmax(score)
        # smallest color not used by neighbors of v
        used = jnp.any(
            has_color[v], axis=0
        )  # [n] colors 1..n used by neighbors
        c = jnp.argmin(used) + 1  # first False
        new_color = jnp.where(
            jnp.arange(n) == v, c.astype(_INT), color
        )
        return jnp.where(jnp.any(uncolored), new_color, color)

    color = jax.lax.fori_loop(0, n, body, color0)

    # order levels by descending max member degree (order_topo capability)
    level_ids = jnp.arange(1, n + 1, dtype=_INT)
    member = color[None, :] == level_ids[:, None]          # [n_levels, N]
    level_used = jnp.any(member, axis=1)
    level_max_deg = jnp.max(
        jnp.where(member, degree[None, :], -1), axis=1
    )
    # sort used levels by descending max degree (stable)
    sort_key = jnp.where(level_used, -level_max_deg, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(sort_key, stable=True)             # level ids (0-based)
    # rank of each level after reordering
    rank = jnp.zeros((n,), dtype=_INT).at[order].set(
        jnp.arange(1, n + 1, dtype=_INT)
    )
    return rank[color - 1]


def constant_weights(directed: jax.Array) -> jax.Array:
    """Reference: ConstantWeigher.m (weight 0.5 on every edge)."""
    return directed.astype(jnp.float32) * 0.5


def random_weights(directed: jax.Array, time_step: jax.Array,
                   seed: int = 0) -> jax.Array:
    """Reference: RandomWeigher.m (uniform weights seeded by time step)."""
    key = jax.random.fold_in(jax.random.PRNGKey(seed ^ 0x5EED), time_step)
    w = jax.random.uniform(key, directed.shape)
    return jnp.where(directed.astype(bool), w, 0.0)


def distance_weights(directed: jax.Array, positions: jax.Array,
                     max_mpa_speed: float, dt: float, hp: int) -> jax.Array:
    """weight = 1 - d / d_max with d_max = 2 * v_max * dt * Hp.

    Reference: DistanceWeigher.m.
    """
    d = jnp.linalg.norm(
        positions[:, None, :] - positions[None, :, :], axis=-1
    )
    max_distance = 2.0 * max_mpa_speed * dt * hp
    w = 1.0 - d / max_distance
    return jnp.where(directed.astype(bool), w, 0.0)


def greedy_cut(weighted_directed: jax.Array, max_num_cls: int,
               n_vehicles: int) -> jax.Array:
    """Partition into <= max_num_cls computation levels.

    Greedily sequentializes edges in descending weight order whenever the
    resulting leveling stays within the bound. ``max_num_cls`` is static:
    with max_num_cls >= n_vehicles every edge is always accepted (any DAG
    on N vertices has <= N levels), so the cut is the identity; with
    max_num_cls == 1 no edge is sequentialized.
    Reference: cut/GreedyCutter.m:25-90.

    Returns directed_coupling_sequential [N, N] bool.
    """
    # edge existence is weight != 0, like the reference's find() on the
    # weighted matrix (GreedyCutter.m:47): distance weights go NEGATIVE
    # for coupled pairs beyond d_max (full coupling), and those edges
    # must stay sequentializable — only exact-zero weights are non-edges
    # (also reference behavior; the weighers emit 0 only for non-edges
    # up to a measure-zero random draw)
    directed = weighted_directed != 0.0
    if max_num_cls >= n_vehicles:
        return directed
    n = weighted_directed.shape[0]
    if max_num_cls <= 1:
        return jnp.zeros_like(directed)

    # edges in descending weight order, non-edges (exactly 0) last: the
    # loop then runs only over the actual edge count instead of all n^2
    # slots. Edge-relative order is identical to sorting by -weight with
    # zero slots interleaved (both argsorts are stable).
    flat_w = weighted_directed.reshape(-1)
    is_edge = flat_w != 0.0
    m = jnp.sum(is_edge)
    order = jnp.argsort(jnp.where(is_edge, -flat_w, jnp.inf), stable=True)

    # Incremental longest-path matrix instead of a kahn() call per
    # candidate edge (the reference re-levels per edge,
    # GreedyCutter.m:57-63; a nested kahn fori_loop was ~8k dispatched
    # inner iterations per cr20 step): R[u, v] = #edges on the longest
    # path u -> v in the accepted graph (0 on the diagonal, "none"
    # otherwise). All edges orient high -> low priority, so any subset
    # is a DAG and max kahn level = longest chain + 1. Adding (r, c)
    # can only lengthen chains THROUGH (r, c): the new longest chain is
    # max_u R[u, r] + 1 + max_v R[c, v], an O(1) check, and acceptance
    # updates R with one outer max — no inner loop.
    none = jnp.int32(-n * 4)
    r0 = jnp.where(jnp.eye(n, dtype=bool), 0, none).astype(_INT)

    def body(i, carry):
        reach, seq = carry
        e = order[i]
        r, c = e // n, e % n
        up = jnp.max(reach[:, r])                    # >= 0 (diagonal)
        down = jnp.max(reach[c, :])
        ok = (up + 1 + down + 1) <= max_num_cls      # levels = edges + 1
        via = reach[:, r][:, None] + 1 + reach[c, :][None, :]
        reach = jnp.where(ok, jnp.maximum(reach, via), reach)
        seq = jnp.where(ok, seq.at[r, c].set(True), seq)
        return reach, seq

    _, seq = jax.lax.fori_loop(0, m, body, (r0, jnp.zeros_like(directed)))
    return seq


def weak_components(directed: jax.Array) -> jax.Array:
    """Weakly-connected component labels via min-label propagation.

    directed: [N, N]; returns [N] int32 where each vertex carries the
    smallest vertex index of its component (the conncomp capability used by
    the explorative controller, PrioritizedExplorativeController.m:206).
    """
    n = directed.shape[0]
    sym = directed.astype(bool) | directed.astype(bool).T
    labels0 = jnp.arange(n, dtype=_INT)

    def body(_, labels):
        neigh = jnp.where(sym, labels[None, :], n)
        return jnp.minimum(labels, jnp.min(neigh, axis=1).astype(_INT))

    return jax.lax.fori_loop(0, n, body, labels0)


def fallback_closure(fallbacks: jax.Array, adjacency: jax.Array,
                     sequential: jax.Array) -> jax.Array:
    """Propagate fallbacks through the coupling graph.

    A vehicle must fall back if a falling-back vehicle reaches it in the
    coupling graph minus the already-considered sequential edges out of
    fallback vehicles (those predictions were consumed during planning).
    Reference: PrioritizedController.check_others_fallback (:650-674).

    fallbacks: [N] bool; adjacency, sequential: [N, N].
    Returns the closed fallback vector [N] bool.
    """
    n = adjacency.shape[0]
    adj = adjacency.astype(bool)
    seq = sequential.astype(bool)
    # remove outgoing sequential edges of fallback vehicles (both directions)
    outgoing = seq & fallbacks[:, None]
    fb_matrix = adj & ~(outgoing | outgoing.T)

    def body(_, reach):
        step = jnp.any(fb_matrix & reach[:, None], axis=0)
        return reach | step

    return jax.lax.fori_loop(0, n, body, fallbacks)


# ---------------------------------------------------------------------------
# Host-side (non-jittable) enumeration for optimal-priority mode.
# ---------------------------------------------------------------------------


def unique_priorities_np(adjacency: np.ndarray,
                         max_edges: int = 16) -> np.ndarray:
    """All topologically-unique priority permutations of a coupling graph.

    Enumerates the 2^n_edges orientations of the undirected coupling edges,
    keeps the acyclic ones, and dedupes by topological order. Returns
    [n_perms, N] priority vectors. Host-side numpy: like the reference
    (Prioritizer.unique_priorities, :97-140) this is exponential and only
    used for small graphs (the reference skips optimal priority beyond a
    handful of vehicles, eval_experiments.m:60-66).
    """
    n = adjacency.shape[0]
    base = np.triu(np.asarray(adjacency, dtype=bool), 1)
    rows, cols = np.nonzero(base)
    n_edges = rows.size
    if n_edges > max_edges:
        raise ValueError(
            f"unique_priorities: {n_edges} edges exceeds cap {max_edges}"
        )

    seen: set[tuple[int, ...]] = set()
    result = []
    for perm_bits in range(1 << n_edges):
        directed = base.copy()
        for e in range(n_edges):
            if perm_bits >> e & 1:
                directed[rows[e], cols[e]] = False
                directed[cols[e], rows[e]] = True
        prio = _toposort_priorities_np(directed)
        if prio is None:
            continue
        key = tuple(prio.tolist())
        if key not in seen:
            seen.add(key)
            result.append(prio)
    return np.stack(result) if result else np.zeros((0, n), dtype=np.int64)


def _toposort_priorities_np(directed: np.ndarray) -> np.ndarray | None:
    """Stable Kahn toposort -> priorities, or None if cyclic."""
    n = directed.shape[0]
    in_deg = directed.sum(axis=0)
    removed = np.zeros(n, dtype=bool)
    order = []
    for _ in range(n):
        ready = np.nonzero(~removed & (in_deg == 0))[0]
        if ready.size == 0:
            return None
        v = ready[0]
        order.append(v)
        removed[v] = True
        in_deg = in_deg - directed[v]
        in_deg[removed] = 1
    prio = np.zeros(n, dtype=np.int64)
    prio[np.array(order)] = np.arange(1, n + 1)
    return prio
