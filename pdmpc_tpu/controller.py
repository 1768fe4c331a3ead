"""Prioritized multi-vehicle control step — the HLC layer.

TPU-native re-design of the reference's controller stack
(hlc/controller/HighLevelController.m, PrioritizedController.m,
PrioritizedSequentialController.m): one control period is a single batched,
fixed-shape, jittable program over all vehicles:

measure -> traffic info (reference trajectory, occupied areas, reachable
sets) -> couple -> prioritize -> weigh -> cut -> level-by-level planning
(sequential predecessors' just-published predictions as obstacles, parallel
higher-priority vehicles' reachable sets or delayed trajectories) ->
fallback handling with transitive propagation -> apply.

The level loop realizes the PrioritizedSequentialController semantics
(deterministic in-process simulation of the distributed schedule,
PrioritizedSequentialController.m:77-94); the distributed execution shards
the same program over a device mesh (see parallel/sharded.py), where the
reference's blocking ROS 2 reads become collectives.

Everything is vmappable over a scenario batch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pdmpc_tpu.config import (
    Config,
    ConstraintFromSuccessor,
    CouplingStrategies,
    PriorityStrategies,
    WeightStrategies,
)
from pdmpc_tpu.models.bicycle import VEHICLE_LENGTH, VEHICLE_WIDTH
from pdmpc_tpu.models.mpa import MpaTensors
from pdmpc_tpu.ops import geometry as geo
from pdmpc_tpu.ops import search
from pdmpc_tpu.ops.search import VO, Obstacles, pad_polys_to_vo
from pdmpc_tpu.parallel import graph as graph_ops
from pdmpc_tpu.scenarios.scenario import (
    ScenarioTensors,
    map_position_to_closest_lanelets,
)

# Reference: PrioritizedController.consider_successors (:536)
STANDSTILL_SPEED = 0.01
# Reference: ReachableSetCoupler.m:45
COUPLING_AREA_THRESHOLD = 1e-3
# Cap on predicted lanelets per vehicle per step (get_predicted_lanelets.m
# yields ~2-4 lanelets at Hp=6 on the CPM map; 8 is a safe static bound
# for the default horizon). The `ids` fed to the unique-compaction have
# Hp+1 entries, so long horizons must WIDEN the cap — jnp.unique would
# silently drop the largest lanelet ids and their boundary segments
# would never constrain the search. Use _n_predicted_lanelets(hp).
N_PREDICTED_LANELETS = 8


def _n_predicted_lanelets(hp: int) -> int:
    return max(N_PREDICTED_LANELETS, hp + 1)


class StepState(NamedTuple):
    """Carry of the receding-horizon loop (one scenario).

    ``prev_*`` hold the previous step's chosen plan — the information the
    reference keeps in ``info_old`` for fallback (plan_fallback,
    PrioritizedController.m:678-718) and for the one-step-delayed
    trajectory mode (parallel_coupling_previous_trajectory, :409-447).
    """

    pose: jax.Array         # [N, 3]
    trim: jax.Array         # [N] i32
    prev_poses: jax.Array   # [N, Hp, 3]
    prev_trims: jax.Array   # [N, Hp] i32
    prev_shapes: jax.Array  # [N, Hp, VO, 2]
    prev_valid: jax.Array   # [N] bool
    # priorities kept from the previous step (explorative mode keeps the
    # winning prioritization, PrioritizedExplorativeController.m:146-176)
    priorities_prev: jax.Array  # [N] i32


class StepInfo(NamedTuple):
    """Per-step record (the ControlResultsInfo / IterationData capability)."""

    poses: jax.Array          # [N, Hp, 3]
    trims: jax.Array          # [N, Hp] i32
    shapes: jax.Array         # [N, Hp, VO, 2]
    cost: jax.Array           # [N]
    needs_fallback: jax.Array  # [N] bool
    is_exhausted: jax.Array   # [N] bool
    n_expanded: jax.Array     # [N] i32
    adjacency: jax.Array      # [N, N] bool
    directed_coupling: jax.Array    # [N, N] bool
    directed_sequential: jax.Array  # [N, N] bool
    levels: jax.Array         # [N] i32
    priorities: jax.Array     # [N] i32
    reference_points: jax.Array  # [N, Hp, 2]
    priority_permutation: jax.Array  # [N] i32 (chosen permutation; 0 = base)


def initial_state(scenario: ScenarioTensors, hp: int) -> StepState:
    n = scenario.n_vehicles
    return StepState(
        pose=scenario.start_poses,
        trim=scenario.start_trims,
        prev_poses=jnp.zeros((n, hp, 3)),
        prev_trims=jnp.zeros((n, hp), dtype=jnp.int32),
        prev_shapes=jnp.zeros((n, hp, VO, 2)),
        prev_valid=jnp.zeros((n,), dtype=bool),
        priorities_prev=jnp.arange(1, n + 1, dtype=jnp.int32),
    )


# ---------------------------------------------------------------------------
# Traffic info (HighLevelController.update_controlled_vehicles_traffic_info,
# :167-270)
# ---------------------------------------------------------------------------


def _reference_trajectory_single(mpa: MpaTensors, scenario: ScenarioTensors,
                                 i, pose, trim, dt):
    """Hp reference points + v_ref for one vehicle.

    Reference: get_reference_trajectory.m + sample_reference_trajectory.m,
    reformulated as arc-length sampling.
    """
    hp = mpa.Hp
    v_ref = jnp.full((hp,), scenario.reference_speed[i])
    v_current = mpa.trim_speed[trim]
    v_intermediate = (
        jnp.concatenate([v_current[None], v_ref[:-1]]) + v_ref
    ) / 2.0
    step_distances = v_intermediate * dt

    path = scenario.reference_paths[i]
    cumlen = scenario.path_cumlen[i]
    s0, _, proj_seg = geo.project_to_polyline(pose[:2], path, cumlen)
    arcs = s0 + jnp.cumsum(step_distances)
    ref_points, seg_idx = geo.sample_path_at_arclength(
        path, arcs, cumlen, scenario.is_loop[i], return_indices=True
    )
    return ref_points, v_ref, seg_idx, proj_seg


def _occupied_area(pose, offset):
    """Vehicle rectangle at pose. Reference: get_occupied_areas.m."""
    return geo.transformed_rectangle(
        pose[0], pose[1], pose[2],
        VEHICLE_LENGTH + 2 * offset, VEHICLE_WIDTH + 2 * offset,
    )


def _reachable_sets_at_pose(mpa: MpaTensors, pose, trim):
    """Transform cached local reachable sets to the vehicle pose.

    Reference: MotionPrimitiveAutomaton.reachable_sets_at_pose (:649-687).
    Returns [Hp, K, 2].
    """
    local = mpa.local_reachable_sets[trim]    # [Hp, K, 2]
    return geo.transform_polygon(local, pose[0], pose[1], pose[2])


# ---------------------------------------------------------------------------
# Coupling (hlc/controller/common/couple/)
# ---------------------------------------------------------------------------


def _couple(cfg: Config, reachable_sets, poses, max_mpa_speed,
            pred_lanelets=None, adjacency_lanelets=None):
    """Adjacency [N, N] bool from the configured coupling strategy.

    ``pred_lanelets`` [N, Lp] (1-based ids, 0 = none) and
    ``adjacency_lanelets`` [L+1, L+1] enable DistanceCoupler.m:28-31's
    lanelet-adjacency prefilter on road scenarios: vehicles whose
    current+predicted lanelets are not adjacent are skipped regardless of
    Euclidean distance.
    """
    n = reachable_sets.shape[0]
    eye = jnp.eye(n, dtype=bool)
    if cfg.coupling == CouplingStrategies.no_coupling:
        return jnp.zeros((n, n), dtype=bool)
    if cfg.coupling == CouplingStrategies.full_coupling:
        return ~eye
    if cfg.coupling == CouplingStrategies.distance_coupling:
        # DistanceCoupler.m: coupled iff distance <= 2 * v_max * dt * Hp
        d = jnp.linalg.norm(
            poses[:, None, :2] - poses[None, :, :2], axis=-1
        )
        max_distance = 2.0 * max_mpa_speed * cfg.dt_seconds * cfg.Hp
        coupled = (d <= max_distance) & ~eye
        if pred_lanelets is not None and adjacency_lanelets is not None:
            # is_any_lanelet_adjacent (DistanceCoupler.m:56-63): any pair of
            # (current+predicted) lanelets adjacent. Row/col 0 of the
            # adjacency matrix is all-False, so padded id 0 is inert.
            pair_adj = adjacency_lanelets[
                pred_lanelets[:, None, :, None],
                pred_lanelets[None, :, None, :],
            ]                                      # [N, N, Lp, Lp]
            coupled &= jnp.any(pair_adj, axis=(-1, -2))
        return coupled
    # reachable_set_coupling (default): overlap area of last-step reachable
    # sets > threshold (ReachableSetCoupler.m:39-48). The sort-free clip
    # kernel replaces the angle-sorted construction: the 288-candidate
    # multi-operand sort per pair was ~2 ms/step of the cr20 profile.
    # Only the upper triangle is computed and mirrored: overlap is
    # symmetric (the reference computes each unordered pair once too,
    # ReachableSetCoupler.m:29-37), which halves the pair work AND makes
    # the adjacency exactly symmetric by construction (the two evaluation
    # orders of the clip integral agree only to ulps).
    last = reachable_sets[:, -1]              # [N, K, 2]
    iu, ju = np.triu_indices(n, 1)
    iu = jnp.asarray(iu, dtype=jnp.int32)
    ju = jnp.asarray(ju, dtype=jnp.int32)
    pair_area = jax.vmap(geo.convex_intersection_area_clip)(
        last[iu], last[ju]
    )                                         # [N*(N-1)/2]
    coupled_pair = pair_area > COUPLING_AREA_THRESHOLD
    adj = jnp.zeros((n, n), dtype=bool)
    adj = adj.at[iu, ju].set(coupled_pair)
    return adj | adj.T


# ---------------------------------------------------------------------------
# Prioritization (hlc/controller/prioritized/priority/)
# ---------------------------------------------------------------------------


def _calculate_yaw(points):
    """Yaw along a point sequence via forward/central differences.

    Reference: utility/calculate_yaw.m. points: [Hp, 2] -> [Hp].
    """
    nxt = jnp.roll(points, -1, axis=0)
    prv = jnp.roll(points, 1, axis=0)
    d_central = nxt - prv
    d_fwd = nxt - points
    d_bwd = points - prv
    hp = points.shape[0]
    idx = jnp.arange(hp)
    d = jnp.where(
        (idx == 0)[:, None], d_fwd,
        jnp.where((idx == hp - 1)[:, None], d_bwd, d_central),
    )
    return jnp.arctan2(d[:, 1], d[:, 0])


def _fca_priorities(cfg: Config, adjacency, ref_points):
    """Future-Collision-Assessment priorities: more predicted collisions
    along the reference -> higher priority (plans earlier).

    Reference: FcaPrioritizer.m:24-93. (The reference passes MATLAB sort
    *indices* as priority values, FcaPrioritizer.m:91; here the intended
    rank semantics is implemented: rank in descending-collision order,
    ties by vehicle index.)
    """
    n = adjacency.shape[0]
    yaws = jax.vmap(_calculate_yaw)(ref_points)       # [N, Hp]

    def shape_at(i, k):
        return geo.transformed_rectangle(
            ref_points[i, k, 0], ref_points[i, k, 1], yaws[i, k],
            VEHICLE_LENGTH + 2 * cfg.offset, VEHICLE_WIDTH + 2 * cfg.offset,
        )

    shapes = jax.vmap(
        lambda i: jax.vmap(lambda k: shape_at(i, k))(jnp.arange(cfg.Hp))
    )(jnp.arange(n))                                   # [N, Hp, 4, 2]

    def pair_collisions(i, j):
        hits = jax.vmap(
            lambda k: geo.sat_collide(shapes[i, k], shapes[j, k])
        )(jnp.arange(cfg.Hp))
        return jnp.sum(hits)

    counts = jax.vmap(
        lambda i: jax.vmap(lambda j: pair_collisions(i, j))(jnp.arange(n))
    )(jnp.arange(n))
    counts = jnp.where(adjacency, counts, 0)
    collisions = jnp.sum(counts, axis=1)
    order = jnp.argsort(-collisions, stable=True)
    return jnp.zeros((n,), dtype=jnp.int32).at[order].set(
        jnp.arange(1, n + 1, dtype=jnp.int32)
    )


def _prioritize(cfg: Config, adjacency, ref_points, k):
    n = adjacency.shape[0]
    if cfg.priority in (
        PriorityStrategies.constant_priority,
        PriorityStrategies.optimal_priority,
        PriorityStrategies.explorative_priority,
    ):
        # optimal/explorative use constant as base (Prioritizer.m:26-29)
        priorities = graph_ops.constant_priorities(n)
    elif cfg.priority == PriorityStrategies.random_priority:
        priorities = graph_ops.random_priorities(n, k, cfg.seed)
    elif cfg.priority == PriorityStrategies.FCA_priority:
        priorities = _fca_priorities(cfg, adjacency, ref_points)
    elif cfg.priority == PriorityStrategies.coloring_priority:
        priorities = graph_ops.coloring_priorities(adjacency)
    else:
        raise ValueError(f"unknown priority strategy {cfg.priority}")
    directed = graph_ops.directed_coupling_from_priorities(
        adjacency, priorities
    )
    return priorities, directed


def _weigh(cfg: Config, directed, poses, k, max_mpa_speed):
    if cfg.weight == WeightStrategies.constant_weight:
        return graph_ops.constant_weights(directed)
    if cfg.weight == WeightStrategies.random_weight:
        return graph_ops.random_weights(directed, k, cfg.seed)
    return graph_ops.distance_weights(
        directed, poses[:, :2], max_mpa_speed, cfg.dt_seconds, cfg.Hp
    )


# ---------------------------------------------------------------------------
# Multi-permutation solvers (optimal / explorative priority modes)
# ---------------------------------------------------------------------------

# Cost penalty charged per exhausted vehicle when voting between
# permutations (the reference has no cost for an infeasible permutation's
# vehicle; a large penalty makes the vote avoid such permutations).
_EXHAUSTED_PENALTY = 1e9


def _solve_optimal(cfg: Config, comm, solve, adjacency):
    """optimal_priority: enumerate the acyclic edge orientations of each
    connected coupling subgraph and adopt the per-subgraph cost minimizer.

    Reference: PrioritizedOptimalController.m + Prioritizer.unique_priorities
    (:97-140). The reference enumerates the 2^edges orientations of the
    runtime coupling graph; tractability therefore depends on coupling
    SPARSITY, not fleet size (eval_experiments.m:60-66 skips only dense
    configurations). This implementation keeps that envelope under static
    shapes: every unordered coupled pair gets a bit index equal to its edge
    rank WITHIN its weakly-connected component (components share bit
    positions — they are independent), and candidate row ``p`` of the
    static [P, N, N] stack orients each edge by the corresponding bit of
    ``p``. P = 2^e_cap with e_cap = floor(log2(max_priority_permutations)),
    so a component with up to e_cap coupling edges has ALL of its
    orientations present in the stack. Cyclic orientations are masked out
    of the vote per component (the all-forward row p = 0 is always
    acyclic, so every component has a valid candidate).

    The vote is the SolutionCost all-reduce, per weakly-connected
    component: costs are additive over vehicles and components share no
    coupling edges, so the per-component argmin equals the reference's
    global argmin (PrioritizedOptimalController.m:104) while needing only
    max-per-component enumeration instead of the full product.
    """
    n = adjacency.shape[0]
    e_cap = max(1, int(cfg.max_priority_permutations).bit_length() - 1)
    # never more candidate rows than the static pair count can produce
    # distinct orientations for (amount=2 has 1 pair slot -> 2 rows, not
    # 2^e_cap wasted solves)
    e_cap = max(1, min(e_cap, n * (n - 1) // 2))
    p_cnt = 1 << e_cap

    belonging = graph_ops.weak_components(adjacency)     # [N]
    iu, ju = np.triu_indices(n, 1)                       # static pair slots
    iu = jnp.asarray(iu, dtype=jnp.int32)
    ju = jnp.asarray(ju, dtype=jnp.int32)
    edge_present = adjacency[iu, ju]                     # [S] traced
    edge_comp = belonging[iu]                            # [S]
    s = iu.shape[0]
    # rank of each present edge within its component (earlier slots first)
    same_comp = edge_comp[None, :] == edge_comp[:, None]
    before = jnp.tril(jnp.ones((s, s), dtype=bool), -1) if s else (
        jnp.zeros((0, 0), dtype=bool))
    rank = jnp.sum(same_comp & before & edge_present[None, :], axis=1)
    bit = (rank % e_cap).astype(jnp.uint32)
    p_idx = jnp.arange(p_cnt, dtype=jnp.uint32)
    # bit 0 = forward (i < j): row p = 0 is the all-forward orientation —
    # the reference's first enumerated candidate (perm_bits = 0 flips no
    # edge, Prioritizer.unique_priorities:97-140) — so cost TIES resolve
    # to the same orientation the reference picks, and row 0 is always
    # acyclic (consistent with the vertex order)
    forward = (
        (p_idx[:, None] >> bit[None, :]) & 1
    ).astype(bool) ^ True                               # [P, S]
    fwd = forward & edge_present[None, :]
    bwd = ~forward & edge_present[None, :]
    directed_stack = jnp.zeros((p_cnt, n, n), dtype=bool)
    if s:
        directed_stack = directed_stack.at[:, iu, ju].set(fwd)
        directed_stack = directed_stack.at[:, ju, iu].set(bwd)

    # a component is invalid in row p iff the orientation leaves a cycle
    # (kahn keeps cycle members at level 0)
    lv_s, _ = jax.vmap(graph_ops.kahn_levels)(directed_stack)
    stuck = lv_s == 0                                    # [P, N]
    labels = jnp.arange(n, dtype=jnp.int32)
    onehot_b = belonging[:, None] == labels[None, :]     # [N, labels]
    invalid_pc = jnp.any(stuck[:, :, None] & onehot_b[None], axis=1)

    if jax.default_backend() == "cpu":
        # a component with more than e_cap edges shares bit positions and
        # is explored only partially — surface it (the reference
        # enumerates all 2^edges orientations). debug.print lowers to a
        # host callback, which the tunneled TPU runtime rejects
        # (axon_pjrt: no send/recv callbacks) — the warning is a dev/CI
        # aid; semantics are identical on every backend.
        edges_per_comp = jnp.sum(
            edge_present[:, None]
            & (edge_comp[:, None] == labels[None, :]), axis=0
        )
        max_edges = jnp.max(edges_per_comp) if s else jnp.asarray(0)
        jax.lax.cond(
            max_edges > e_cap,
            lambda: jax.debug.print(
                "WARNING optimal_priority: a coupling subgraph has {m} "
                "edges > e_cap={c}; orientation enumeration is partial "
                "(raise max_priority_permutations)",
                m=max_edges, c=e_cap, ordered=False,
            ),
            lambda: None,
        )

    return _vote_per_subgraph(comm, solve, directed_stack, belonging,
                              invalid_pc)


def _vote_per_subgraph(comm, solve, directed_stack, belonging, invalid_pc):
    """Solve every candidate directed coupling and adopt, per
    weakly-connected subgraph, the cost-minimal candidate.

    The shared voting tail of the optimal and explorative priority modes:
    the SolutionCost exchange (sum over member vehicles = all-reduce,
    rounded to 8 decimals like PrioritizedOptimalController.m:104) +
    per-subgraph winner selection and kept-priority reconstruction
    (PrioritizedExplorativeController.choose_solution:146-176).

    invalid_pc: [P, n-labels] bool — candidate p is ineligible for the
    subgraph with that label (cyclic orientation / padding row).
    """
    n = directed_stack.shape[1]
    _, stacked = jax.lax.scan(
        lambda carry, d: (carry, solve(d)), None, directed_stack
    )
    planned_s, shapes_s, seq_s, levels_s = stacked
    del levels_s

    # exhausted plans carry cost = inf; clamp to the finite penalty BEFORE
    # the vote — inf would turn the subgraph matmul into NaN (inf * 0 in
    # the one-hot contraction) and poison every OTHER subgraph's argmin
    cost_l = jnp.where(
        planned_s.is_exhausted, _EXHAUSTED_PENALTY, planned_s.cost
    )
    cost_g = comm.gather_veh(jnp.swapaxes(cost_l, 0, 1))  # [N, P]
    onehot = (
        belonging[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
    ).astype(cost_g.dtype)                              # [N, N-labels]
    # f32 accumulation: the TPU bf16 matmul default would round the vote
    # sums to ~3 decimal digits and can flip the per-subgraph argmin winner
    totals = jnp.round(
        jnp.matmul(cost_g.T, onehot,
                   precision=jax.lax.Precision.HIGHEST), 8
    )                                                   # [P, N-labels]
    totals = jnp.where(invalid_pc, jnp.inf, totals)
    chosen_per_label = jnp.argmin(totals, axis=0)       # [N-labels]
    chosen_g = chosen_per_label[belonging]              # [N]
    chosen_l = comm.local_slice(chosen_g)

    nl = comm.n_local
    planned = jax.tree.map(
        lambda x: x[chosen_l, jnp.arange(nl)], planned_s
    )
    rows = jnp.arange(n)
    shapes_g = shapes_s[chosen_g, rows]
    sequential = seq_s[chosen_g, rows]
    directed_comb = directed_stack[chosen_g, rows]
    levels, _ = graph_ops.kahn_levels(sequential)

    # winning priorities kept for the next step: rank vehicles by
    # (subgraph label, level within subgraph, index) — per-subgraph
    # priorities with offsets (choose_solution, :165-172)
    key = (
        belonging.astype(jnp.int32) * (n * n)
        + levels.astype(jnp.int32) * n
        + rows
    )
    order = jnp.argsort(key)
    priorities = jnp.zeros((n,), dtype=jnp.int32).at[order].set(
        jnp.arange(1, n + 1, dtype=jnp.int32)
    )
    return (planned, shapes_g, sequential, levels, priorities,
            directed_comb, chosen_l)


def _solve_explorative(cfg: Config, comm, solve, directed, sequential0,
                       levels0, max_num_cls: int):
    """explorative_priority: simultaneously evaluate one prioritization per
    computation level (arXiv:2501.10781) and vote per coupling subgraph.

    A Latin square of level permutations guarantees each vehicle occupies
    every computation level exactly once across the permutations
    (computation_level_permutations,
    PrioritizedExplorativeController.m:241-309 — the reference randomizes
    the square per step; cyclic shifts satisfy the same property
    deterministically). Coupling edges whose permuted levels invert are
    swapped (:311-319); every permutation is solved; each weakly-connected
    subgraph of the sequential graph adopts its own cost-minimal
    permutation (:146-176), and the winning priorities are kept for the
    next step.
    """
    n = directed.shape[0]
    l_max = max(max_num_cls, 1)
    n_levels = jnp.maximum(jnp.max(levels0), 1)
    belonging = graph_ops.weak_components(sequential0)  # [N]
    coupled = directed | directed.T

    def directed_for(p):
        lv = ((levels0 - 1 + p) % n_levels) + 1
        lower = lv[:, None] < lv[None, :]
        equal = lv[:, None] == lv[None, :]
        return (coupled & lower) | (directed & equal)

    directed_stack = jax.vmap(directed_for)(
        jnp.arange(l_max, dtype=jnp.int32)
    )                                                   # [P, N, N]
    valid_p = jnp.arange(l_max) < n_levels

    # per-subgraph cost voting (the SolutionCost exchange per subgraph);
    # like the reference, subgraphs are the weak components of the CUT
    # sequential graph (PrioritizedExplorativeController.m:206), so
    # coupled-but-cut pairs across components rely on reachable-set
    # avoidance, not on a shared permutation
    invalid_pc = jnp.broadcast_to((~valid_p)[:, None], (l_max, n))
    return _vote_per_subgraph(comm, solve, directed_stack, belonging,
                              invalid_pc)


# ---------------------------------------------------------------------------
# The prioritized step
# ---------------------------------------------------------------------------


def compact_schedule(levels: jax.Array, c_chunk: int,
                     sequential: jax.Array | None = None):
    """Compact planning schedule: rows of up-to-``c_chunk`` vehicle
    indices; planning rows in order respects the DAG while planning each
    vehicle exactly once (vs the dense N*L sweep).

    levels [N] (1-based Kahn levels) -> (schedule [N, c_chunk] i32 with
    -1 padding, n_chunks scalar).

    Without ``sequential``: level-grouped — a chunk never mixes levels.
    With ``sequential`` [N, N] (the cut DAG): DATAFLOW list scheduling —
    each vehicle, visited in (level, index) order, lands in the earliest
    chunk after all its sequential predecessors with a free slot. Chunks
    may then mix levels, which shrinks the chunk count toward
    ceil(N / c_chunk) (level grouping pads every odd-sized level).
    Results are identical either way: a vehicle's obstacle masks select
    exactly its predecessors' rows, all planned in earlier chunks, and
    masked rows never contribute regardless of content. Fewer chunks
    matter twice — directly in step latency, and under ``vmap`` where
    every rollout lane executes the WORST lane's chunk count.
    """
    n = levels.shape[0]
    order = jnp.argsort(
        levels * jnp.int32(n + 1) + jnp.arange(n, dtype=jnp.int32)
    )                                                # (level, index)
    if sequential is None:
        lev_sorted = levels[order]
        pos = jnp.arange(n, dtype=jnp.int32)
        is_start = jnp.concatenate([
            jnp.ones((1,), dtype=bool),
            lev_sorted[1:] != lev_sorted[:-1],
        ])
        level_start = jax.lax.cummax(jnp.where(is_start, pos, 0), axis=0)
        r = pos - level_start
        new_chunk = is_start | (r % c_chunk == 0)
        chunk_id = jnp.cumsum(new_chunk.astype(jnp.int32)) - 1
        n_chunks = chunk_id[-1] + 1
        slot = r % c_chunk
        schedule = jnp.full((n, c_chunk), -1, dtype=jnp.int32
                            ).at[chunk_id, slot].set(order)
        return schedule, n_chunks

    cand = jnp.arange(n, dtype=jnp.int32)

    def body(i, carry):
        chunk_of, slots_used, slot_of = carry
        v = order[i]
        # sequential predecessors have strictly lower level, hence are
        # already placed when v is visited (order is by level)
        preds = sequential[:, v]
        earliest = jnp.max(jnp.where(preds, chunk_of + 1, 0))
        ok = (cand >= earliest) & (slots_used < c_chunk)
        t = jnp.argmax(ok)                           # first free chunk
        chunk_of = chunk_of.at[v].set(t)
        slot_of = slot_of.at[v].set(slots_used[t])
        slots_used = slots_used.at[t].add(1)
        return chunk_of, slots_used, slot_of

    chunk_of, _, slot_of = jax.lax.fori_loop(
        0, n, body,
        (jnp.full((n,), -1, dtype=jnp.int32),
         jnp.zeros((n,), dtype=jnp.int32),
         jnp.zeros((n,), dtype=jnp.int32)),
    )
    n_chunks = jnp.max(chunk_of) + 1
    schedule = jnp.full((n, c_chunk), -1, dtype=jnp.int32
                        ).at[chunk_of, slot_of].set(cand)
    return schedule, n_chunks


def make_prioritized_step(cfg: Config, mpa: MpaTensors,
                          scenario: ScenarioTensors, comm_factory=None,
                          debug_capture: bool = False):
    """Build the jittable per-step function ``step(state, k) -> (state, info)``.

    Strategy selectors are static (baked at trace time), mirroring how the
    reference wires strategy objects once in the factory (HlcFactory.m).

    ``comm_factory`` selects the communication backend (parallel/comm.py):
    the default :class:`LocalComm` runs all vehicles in one program (the
    PrioritizedSequentialController semantics); a :class:`MeshComm` factory
    makes the same step run vehicle-sharded inside ``shard_map``, where the
    traffic broadcast and per-level prediction exchange become
    ``all_gather`` collectives over ICI (the reference's ROS 2 topics,
    SURVEY §2.7). State arrays then hold only the local vehicle block.

    ``debug_capture`` (LocalComm constant-priority path only) makes the
    step return ``(state, info, capture)`` where ``capture`` holds the
    exact per-vehicle planning inputs (obstacle snapshot at plan time,
    obstacle mask, boundary segments, reference samples) so an external
    oracle can re-derive every plan — the system-level cross-validation
    harness (tests/test_oracle_replay.py).
    """
    from pdmpc_tpu.parallel.comm import LocalComm

    n = scenario.n_vehicles
    hp = mpa.Hp
    dt = cfg.dt_seconds
    # traced (mpa is a jit argument, not an embedded constant)
    max_mpa_speed = jnp.max(mpa.trim_speed)
    max_num_cls = min(cfg.max_num_CLs, n)
    use_reachability = cfg.isDealPredictionInconsistency
    successor_mode = cfg.constraint_from_successor
    # obstacle-geometry dispatch (OptimizerInterface.m:36-46): road
    # scenarios check non-convex outlines by segment intersection; circle
    # and centralized use convex SAT
    non_convex = cfg.use_non_convex_obstacles
    use_pallas = (
        cfg.use_pallas_collision
        if cfg.use_pallas_collision is not None
        else jax.default_backend() not in ("cpu",)
    )
    if comm_factory is None:
        comm_factory = lambda: LocalComm(n)  # noqa: E731
    elif debug_capture:
        raise AssertionError(
            "debug_capture supports the LocalComm single-program path "
            "only (the mesh level loop records no obstacle snapshots)"
        )

    if debug_capture:
        assert cfg.priority not in (
            PriorityStrategies.optimal_priority,
            PriorityStrategies.explorative_priority,
        ), "debug_capture supports the single-prioritization path only"

    def step(state: StepState, k: jax.Array):
        comm = comm_factory()
        nl = comm.n_local
        gidx = comm.global_indices()
        capture_out: dict = {}

        # ---- local traffic info ------------------------------------------
        ref_points, v_ref, seg_idx, proj_seg = jax.vmap(
            lambda i, p, t: _reference_trajectory_single(
                mpa, scenario, i, p, t, dt
            )
        )(gidx, state.pose, state.trim)

        # predicted lanelets -> boundary segments (road scenarios;
        # get_predicted_lanelets.m + get_lanelets_boundary.m capability)
        if scenario.road is not None:
            def boundary_for(i, seg_i, proj_i, pose, hdv):
                lane_of = scenario.segment_lanelet[i]
                cur = lane_of[proj_i]
                if cfg.manual_control_config.is_active:
                    # HDV poses are measured, not planned — they may stray
                    # off the reference path (external plant), so their
                    # current lanelet comes from the closest-centerline
                    # mapping, like the reference
                    # (HighLevelController.m:402,
                    # map_position_to_closest_lanelets.m). Static gate:
                    # HDV-free configs keep an unchanged program.
                    closest, _ = map_position_to_closest_lanelets(
                        scenario.road, pose[:2]
                    )
                    cur = jnp.where(hdv, closest, cur)
                ids = jnp.concatenate([cur[None], lane_of[seg_i]])
                uids = jnp.unique(ids, size=_n_predicted_lanelets(hp),
                                  fill_value=0)
                segs = scenario.road.boundary_segments[uids]
                mask = scenario.road.boundary_seg_mask[uids]
                rings = scenario.road.corridor_rings[uids]
                return (segs.reshape(-1, 2, 2), mask.reshape(-1), rings,
                        cur, uids)

            (bnd_segs, bnd_mask, corridor_rings,
             current_lanelet, pred_lanelets) = jax.vmap(boundary_for)(
                gidx, seg_idx, proj_seg, state.pose,
                comm.local_slice(scenario.is_hdv),
            )
            if use_pallas:
                from pdmpc_tpu.ops import pallas_collision as pk

                # segment geometry is level- and layer-invariant: one
                # precompute per step feeds every planning pass
                seg_pre = jax.vmap(pk.precompute_segments)(
                    bnd_segs, bnd_mask
                )
            else:
                seg_pre = None
        else:
            bnd_segs = bnd_mask = seg_pre = corridor_rings = None
            current_lanelet = pred_lanelets = None

        occupied_offset = jax.vmap(
            lambda p: _occupied_area(p, cfg.offset)
        )(state.pose)                                    # [nl, 4, 2]
        occupied_no_offset = jax.vmap(
            lambda p: _occupied_area(p, 0.0)
        )(state.pose)

        reachable_sets = jax.vmap(
            lambda p, t: _reachable_sets_at_pose(mpa, p, t)
        )(state.pose, state.trim)                        # [nl, Hp, K, 2]

        # bound reachable sets by the drivable corridor of the predicted
        # lanelets BEFORE they feed coupling and parallel avoidance
        # (bound_reachable_sets.m:1-50, called from
        # HighLevelController.m:241-257)
        if corridor_rings is not None:
            def bound_vehicle(rs_hp, rings, segs, mask):
                return jax.vmap(
                    lambda rs: geo.bound_convex_to_corridor(
                        rs, rings, segs, mask
                    )
                )(rs_hp)

            reachable_sets = jax.vmap(bound_vehicle)(
                reachable_sets, corridor_rings, bnd_segs, bnd_mask
            )

        # ---- HDV reachability (computed locally before the exchange) ----
        # human-driven vehicles do not plan; CAVs avoid their
        # (non-recursive) reachable sets (HighLevelController.m:394-447).
        # Statically gated: the hdv_rs family is only consumed when
        # manual control is active, and an HDV-free run must not pay the
        # per-vehicle corridor clipping nor the extra collective payload.
        use_hdv = cfg.manual_control_config.is_active
        is_hdv_g = scenario.is_hdv
        is_hdv_l = comm.local_slice(is_hdv_g)
        if use_hdv:
            hdv_rs = jax.vmap(
                lambda p, t: geo.transform_polygon(
                    mpa.local_reachable_sets_hdv[t], p[0], p[1], p[2]
                )
            )(state.pose, state.trim)                    # [nl, Hp, K, 2]
            if corridor_rings is not None:
                # lane-bounded HDV reachability: the HDV's reachable sets
                # are clipped to its predicted-lanelet corridor
                # (ManualVehicle.compute_reachable_lane,
                # ManualVehicle.m:30-49)
                hdv_rs = jax.vmap(bound_vehicle)(
                    hdv_rs, corridor_rings, bnd_segs, bnd_mask
                )
        else:
            hdv_rs = jnp.zeros((nl, 0, 0, 2))

        # ---- traffic exchange (the Traffic-topic message + barrier) ------
        # every per-vehicle field rides ONE fused all_gather, like the
        # reference's single Traffic message (InterHlcCommunication.m:140)
        (pose_g, trim_g, rs_g, ref_points_g, occupied_offset_g,
         prev_shapes_g, prev_valid_g, hdv_rs_g, pred_lanelets_g) = \
            comm.gather_tree((
                state.pose, state.trim, reachable_sets, ref_points,
                occupied_offset, state.prev_shapes, state.prev_valid,
                hdv_rs,
                (pred_lanelets if pred_lanelets is not None
                 else jnp.zeros((nl, 0), dtype=jnp.int32)),
            ))
        hdv_rs_g = pad_polys_to_vo(hdv_rs_g) if use_hdv else None

        # ---- coupling graph (replicated: same inputs on every shard) -----
        adjacency = _couple(
            cfg, rs_g, pose_g, max_mpa_speed,
            pred_lanelets=(pred_lanelets_g
                           if pred_lanelets is not None else None),
            adjacency_lanelets=(scenario.road.adjacency_lanelets
                                if scenario.road is not None else None),
        )
        adjacency = adjacency & ~is_hdv_g[:, None] & ~is_hdv_g[None, :]
        if cfg.priority == PriorityStrategies.explorative_priority:
            # explorative mode keeps the winning prioritization of the
            # previous step (choose_solution,
            # PrioritizedExplorativeController.m:146-176)
            priorities = comm.gather_veh(state.priorities_prev)
            directed = graph_ops.directed_coupling_from_priorities(
                adjacency, priorities
            )
        else:
            priorities, directed = _prioritize(
                cfg, adjacency, ref_points_g, k
            )

        # ---- obstacle families (global, shared across vehicles) ----------
        # family 0: this step's already-planned predicted areas [N, Hp, VO, 2]
        # family 1: parallel-coupling avoidance: reachable sets OR delayed
        #           previous trajectories
        # family 2: successors' standstill areas (broadcast over Hp)
        # family 3: delayed previous trajectories (successor mode)
        rs_padded = pad_polys_to_vo(rs_g)                # [N, Hp, VO, 2]
        prev_shifted = _del_first_rpt_last(prev_shapes_g, axis=1)
        parallel_polys = (
            rs_padded if use_reachability else prev_shifted
        )
        standstill = jnp.broadcast_to(
            pad_polys_to_vo(occupied_offset_g)[:, None], (n, hp, VO, 2)
        )
        not_self = ~jnp.eye(n, dtype=bool)

        # directional CAV-HDV coupling (update_hdv_traffic_info,
        # HighLevelController.m:428-443): a CAV avoids an HDV only when the
        # HDV is NOT behind it — an HDV behind would contain the CAV in its
        # reachable set and make the search infeasible (is_hdv_behind.m).
        # On road scenarios the current-lanelet relationship matrices
        # decide; free-space scenarios keep all-pairs avoidance.
        if (scenario.road is not None
                and cfg.manual_control_config.is_active):
            cl_g = comm.gather_veh(current_lanelet)      # [N]
            pred_m = scenario.road.hdv_predecessor[
                cl_g[:, None], cl_g[None, :]
            ]
            over_m = scenario.road.hdv_overlap[cl_g[:, None], cl_g[None, :]]
            same = cl_g[:, None] == cl_g[None, :]
            vec_cav_hdv = pose_g[None, :, :2] - pose_g[:, None, :2]
            hdv_heading = jnp.stack(
                [jnp.cos(pose_g[:, 2]), jnp.sin(pose_g[:, 2])], axis=-1
            )
            scal = jnp.sum(hdv_heading[None, :, :] * vec_cav_hdv, axis=-1)
            hdv_behind = pred_m | ((same | over_m) & (scal < 0.0))
        else:
            hdv_behind = jnp.zeros((n, n), dtype=bool)

        def solve(directed_p):
            """One full prioritized solve for a given directed coupling.

            weigh -> cut -> levels -> level-by-level planning with per-level
            prediction exchange. Returns (planned [local], planned_shapes
            [global], sequential, levels).
            """
            weighted = _weigh(cfg, directed_p, pose_g, k, max_mpa_speed)
            sequential = graph_ops.greedy_cut(weighted, max_num_cls, n)
            levels, _ = graph_ops.kahn_levels(sequential)
            levels_l = comm.local_slice(levels)

            # masks [N(planning vehicle), N(obstacle vehicle)]
            seq_pred = sequential.T & not_self
            par_pred = (directed_p.T & ~sequential.T) & not_self
            if not use_reachability:
                par_pred = par_pred & prev_valid_g[None, :]
            # obstacle families are assembled statically: families whose
            # mask is identically False for this config (the unused
            # successor-constraint variant, HDV when no HDVs exist) are
            # dropped from the tensors entirely instead of carried as
            # always-masked slots
            hdv_family = (is_hdv_g[None, :] & ~is_hdv_g[:, None] & not_self
                          & ~hdv_behind)
            family_masks = [seq_pred, par_pred]
            if successor_mode == ConstraintFromSuccessor.area_of_standstill:
                family_masks.append(
                    directed_p
                    & (mpa.trim_speed[trim_g] < STANDSTILL_SPEED)[None, :]
                    & not_self
                )
            if (successor_mode
                    == ConstraintFromSuccessor.area_of_previous_trajectory):
                family_masks.append(
                    directed_p & prev_valid_g[None, :] & not_self
                )
            if cfg.manual_control_config.is_active:
                family_masks.append(hdv_family)
            n_families = len(family_masks)
            # static scenario obstacles (get_all_obstacles.m:17
            # current_occupied_areas = iter.obstacles): every vehicle
            # avoids them at every step
            if scenario.static_obstacles is not None:
                n_static = scenario.static_obstacles.shape[0]
                static_cols = jnp.broadcast_to(
                    scenario.static_obstacle_mask[None], (n, n_static)
                )
                family_masks = family_masks + [static_cols]
            else:
                n_static = 0
            n_obs_total = n_families * n + n_static
            obs_mask_all = jnp.concatenate(family_masks, axis=1)
            obs_mask_l = comm.local_slice(obs_mask_all)  # [nl, F*N(+O)]

            planned0 = search.PlanResult(
                trims=jnp.zeros((nl, hp), dtype=jnp.int32),
                poses=jnp.zeros((nl, hp, 3)),
                shapes=jnp.zeros((nl, hp, mpa.area.shape[-2], 2)),
                cost=jnp.zeros((nl,)),
                is_exhausted=jnp.zeros((nl,), dtype=bool),
                n_expanded=jnp.zeros((nl,), dtype=jnp.int32),
            )
            planned_shapes0 = jnp.zeros((n, hp, VO, 2))
            max_level = jnp.max(levels)

            def build_obs_polys(planned_shapes):
                family_polys = [planned_shapes, parallel_polys]
                if successor_mode == ConstraintFromSuccessor.area_of_standstill:
                    family_polys.append(standstill)
                if (successor_mode
                        == ConstraintFromSuccessor.area_of_previous_trajectory):
                    family_polys.append(prev_shifted)
                if cfg.manual_control_config.is_active:
                    family_polys.append(hdv_rs_g)
                if scenario.static_obstacles is not None:
                    family_polys.append(
                        jnp.broadcast_to(
                            scenario.static_obstacles[:, None],
                            (n_static, hp, VO, 2),
                        )
                    )
                return jnp.concatenate(
                    family_polys, axis=0
                )                                        # [F*N(+O), Hp, VO, 2]

            def make_plan_v(obs_polys):
                def plan_v(i, pose, trim, ref_p, vr, mask, bs, bm, sp,
                           al):
                    obstacles = Obstacles(
                        polys=obs_polys,
                        mask=jnp.broadcast_to(
                            mask[:, None], (n_obs_total, hp)
                        ),
                    )
                    if cfg.optimizer_type.is_optimal:
                        return search.plan_trajectory(
                            mpa, pose, trim, ref_p, vr, obstacles, dt,
                            cfg.beam_width,
                            boundary_segments=bs, boundary_mask=bm,
                            use_pallas=use_pallas, segments_pre=sp,
                            active=al, non_convex=non_convex,
                            unroll_tail=(cfg.unroll_layers is not False),
                        )
                    # sampled search, seeded per (seed, step, vehicle) like
                    # MonteCarloTreeSearch.m:31
                    key = jax.random.fold_in(
                        jax.random.fold_in(jax.random.PRNGKey(cfg.seed), k),
                        i,
                    )
                    return search.plan_trajectory_sampled(
                        mpa, pose, trim, ref_p, vr, obstacles, dt,
                        cfg.mcts_n_rollouts, key,
                        boundary_segments=bs, boundary_mask=bm,
                        temperature=cfg.mcts_temperature,
                        non_convex=non_convex,
                    )
                return plan_v

            if isinstance(comm, LocalComm):
                # ---- compact level execution (single-program path) ------
                # Each vehicle is planned exactly ONCE: every while
                # iteration gathers up to C same-level vehicles (priority
                # order) into a compact batch, plans them, and scatters
                # the results back. Leveling is pure scheduling — the
                # obstacle sets are driven by the DAG masks, not by level
                # numbers — so results are identical to the dense sweep
                # that planned all N vehicles at every level (N*L plans
                # instead of ~N), and the reported `levels` are untouched.
                # chunk width 2 measured fastest on cr20/v5e (median step
                # 9.4 ms vs 14.8 at ceil(n/2)=10, batch-32 throughput
                # 2568 vs 2105 solves/s): padded slots burn a full
                # planning pass, so narrow chunks waste at most one slot
                # per iteration while wide ones plan mostly padding
                # whenever level sizes run below the chunk width
                c_chunk = min(n, cfg.level_chunk or 2)
                schedule, n_chunks = compact_schedule(
                    levels, c_chunk, sequential
                )

                def chunk_body(carry):
                    ci, planned, planned_shapes, obs_seen = carry
                    idx = schedule[ci]                   # [C]
                    valid = idx >= 0
                    safe = jnp.maximum(idx, 0)
                    obs_snapshot = build_obs_polys(planned_shapes)
                    plan_v = make_plan_v(obs_snapshot)
                    args = (safe, state.pose[safe], state.trim[safe],
                            ref_points[safe], v_ref[safe],
                            obs_mask_l[safe])
                    if bnd_segs is not None:
                        result = jax.vmap(plan_v)(
                            *args, bnd_segs[safe], bnd_mask[safe],
                            jax.tree.map(lambda x: x[safe], seg_pre),
                            valid,
                        )
                    else:
                        result = jax.vmap(
                            lambda i, pose, trim, ref_p, vr, mask, al:
                            plan_v(i, pose, trim, ref_p, vr, mask, None,
                                   None, None, al)
                        )(*args, valid)

                    # duplicate-safe scatter: padded slots alias vehicle 0,
                    # so membership and slot lookup go through add-scatters
                    # (adds of 0 for invalid slots are deterministic)
                    planned_now = (
                        jnp.zeros((n,), jnp.int32)
                        .at[safe].add(valid.astype(jnp.int32)) > 0
                    )
                    slot_of = jnp.zeros((n,), jnp.int32).at[safe].add(
                        jnp.where(valid,
                                  jnp.arange(c_chunk, dtype=jnp.int32), 0)
                    )

                    def sel(new, old):
                        picked = new[slot_of]
                        m = planned_now.reshape(
                            (n,) + (1,) * (picked.ndim - 1)
                        )
                        return jnp.where(m, picked, old)

                    planned = jax.tree.map(sel, result, planned)
                    planned_shapes = jnp.where(
                        planned_now[:, None, None, None],
                        pad_polys_to_vo(result.shapes)[slot_of],
                        planned_shapes,
                    )
                    if obs_seen is not None:
                        # record the obstacle snapshot each vehicle
                        # actually planned against (oracle replay)
                        obs_seen = jnp.where(
                            planned_now[:, None, None, None, None],
                            obs_snapshot[None],
                            obs_seen,
                        )
                    return (ci + 1, planned, planned_shapes, obs_seen)

                obs_seen0 = (
                    jnp.zeros((n, n_obs_total, hp, VO, 2))
                    if debug_capture else None
                )
                _, planned, planned_shapes_g, obs_seen_f = \
                    jax.lax.while_loop(
                        lambda c: c[0] < n_chunks,
                        chunk_body,
                        (jnp.array(0, dtype=jnp.int32), planned0,
                         planned_shapes0, obs_seen0),
                    )
                if debug_capture:
                    capture_out["obs_polys"] = obs_seen_f  # [N, O, Hp, VO, 2]
                    capture_out["obs_mask"] = obs_mask_l   # [N, O]
                return planned, planned_shapes_g, sequential, levels

            def level_body(carry):
                level, planned, planned_shapes = carry
                at_level = levels_l == level

                def do_plan(planned):
                    plan_v = make_plan_v(build_obs_polys(planned_shapes))
                    if bnd_segs is not None:
                        result = jax.vmap(plan_v)(
                            gidx, state.pose, state.trim, ref_points,
                            v_ref, obs_mask_l, bnd_segs, bnd_mask, seg_pre,
                            at_level,
                        )
                    else:
                        result = jax.vmap(
                            lambda i, pose, trim, ref_p, vr, mask, al:
                            plan_v(i, pose, trim, ref_p, vr, mask, None,
                                   None, None, al)
                        )(gidx, state.pose, state.trim, ref_points, v_ref,
                          obs_mask_l, at_level)

                    def sel(new, old):
                        m = at_level.reshape((nl,) + (1,) * (new.ndim - 1))
                        return jnp.where(m, new, old)

                    planned = jax.tree.map(sel, result, planned)
                    local_shapes = jnp.where(
                        at_level[:, None, None, None],
                        pad_polys_to_vo(result.shapes),
                        comm.local_slice(planned_shapes),
                    )
                    return planned, local_shapes

                def skip(planned):
                    return planned, comm.local_slice(planned_shapes)

                # a shard with no vehicle at this level skips the whole
                # planning pass (scalar cond: real branch, not a select) —
                # the SPMD analogue of a reference NUC idling while other
                # computation levels plan. On shared-core virtual meshes
                # this converts idle masking work into freed cores;
                # results are bit-identical (the masked pass never
                # contributed rows). The collective stays OUTSIDE the
                # cond: every shard joins the per-level Predictions
                # all_gather (PrioritizedController.plan's blocking reads).
                planned, local_shapes = jax.lax.cond(
                    jnp.any(at_level), do_plan, skip, planned
                )
                planned_shapes = comm.gather_veh(local_shapes)
                return (level + 1, planned, planned_shapes)

            def level_cond(carry):
                return carry[0] <= max_level

            _, planned, planned_shapes_g = jax.lax.while_loop(
                level_cond,
                level_body,
                (jnp.array(1, dtype=jnp.int32), planned0, planned_shapes0),
            )
            return planned, planned_shapes_g, sequential, levels

        if cfg.priority == PriorityStrategies.optimal_priority:
            (planned, planned_shapes_g, sequential, levels,
             priorities, directed, perm_chosen) = _solve_optimal(
                cfg, comm, solve, adjacency
            )
        elif cfg.priority == PriorityStrategies.explorative_priority:
            weighted0 = _weigh(cfg, directed, pose_g, k, max_mpa_speed)
            sequential0 = graph_ops.greedy_cut(weighted0, max_num_cls, n)
            levels0, _ = graph_ops.kahn_levels(sequential0)
            (planned, planned_shapes_g, sequential, levels,
             priorities, directed, perm_chosen) = _solve_explorative(
                cfg, comm, solve, directed, sequential0, levels0,
                max_num_cls
            )
        else:
            planned, planned_shapes_g, sequential, levels = solve(directed)
            perm_chosen = jnp.zeros((nl,), dtype=jnp.int32)
        planned_shapes = comm.local_slice(planned_shapes_g)

        # ---- exhaustion handling -----------------------------------------
        # A standstill vehicle whose search exhausts stays put without
        # fallback (handle_graph_search_exhaustion,
        # PrioritizedController.m:568-621).
        at_standstill = mpa.trim_speed[state.trim] == 0.0
        stay_still_ok = (
            planned.is_exhausted
            & at_standstill
            & (successor_mode != ConstraintFromSuccessor.none)
        )
        ss_poses = jnp.broadcast_to(state.pose[:, None, :], (nl, hp, 3))
        ss_trims = jnp.broadcast_to(state.trim[:, None], (nl, hp))
        ss_shapes = jnp.broadcast_to(
            pad_polys_to_vo(occupied_no_offset)[:, None], (nl, hp, VO, 2)
        )
        ss_cost = jnp.sum(
            jnp.sum((ss_poses[..., :2] - ref_points) ** 2, axis=-1), axis=-1
        )

        # fallback propagation needs the global fallback flags (the
        # Predictions needs_fallback field + graph reachability)
        needs_fallback_own = (
            planned.is_exhausted & ~stay_still_ok & ~is_hdv_l
        )
        fallbacks_g = graph_ops.fallback_closure(
            comm.gather_veh(needs_fallback_own), adjacency, sequential
        )
        fallbacks = comm.local_slice(fallbacks_g)

        # fallback plan: previous plan shifted by one, last repeated
        # (plan_fallback, :678-718); without a previous plan: stand still
        fb_poses = _del_first_rpt_last(state.prev_poses, axis=1)
        fb_trims = _del_first_rpt_last(state.prev_trims, axis=1)
        fb_shapes = _del_first_rpt_last(state.prev_shapes, axis=1)
        fb_cost = jnp.sum(
            jnp.sum((fb_poses[..., :2] - ref_points) ** 2, axis=-1), axis=-1
        )
        use_prev = state.prev_valid
        fb_poses = jnp.where(use_prev[:, None, None], fb_poses, ss_poses)
        fb_trims = jnp.where(use_prev[:, None], fb_trims, ss_trims)
        fb_shapes = jnp.where(
            use_prev[:, None, None, None], fb_shapes, ss_shapes
        )
        fb_cost = jnp.where(use_prev, fb_cost, ss_cost)

        def choose(planned_v, ss_v, fb_v, extra_dims):
            shape = (nl,) + (1,) * extra_dims
            use_fb = fallbacks.reshape(shape)
            use_ss = (stay_still_ok & ~fallbacks).reshape(shape)
            return jnp.where(
                use_fb, fb_v, jnp.where(use_ss, ss_v, planned_v)
            )

        final_poses = choose(planned.poses, ss_poses, fb_poses, 2)
        final_trims = choose(planned.trims, ss_trims, fb_trims, 1)
        final_shapes = choose(planned_shapes, ss_shapes, fb_shapes, 3)
        final_cost = choose(planned.cost, ss_cost, fb_cost, 0)

        # HDVs follow their reference path (the lab's human input; in
        # simulation the scripted path stands in, ManualVehicle.m) —
        # statically gated like the rest of the HDV machinery
        if use_hdv:
            hdv_yaws = jax.vmap(_calculate_yaw)(ref_points)  # [nl, Hp]
            hdv_poses = jnp.concatenate(
                [ref_points, hdv_yaws[..., None]], axis=-1
            )
            # trim with the closest straight speed to the reference speed
            ref_speed_l = scenario.reference_speed[gidx]
            speed_dist = jnp.where(
                (jnp.abs(mpa.trim_steering) < 1e-9)[None, :],
                jnp.abs(mpa.trim_speed[None, :] - ref_speed_l[:, None]),
                jnp.inf,
            )
            hdv_trim = jnp.argmin(speed_dist, axis=-1).astype(jnp.int32)
            hdv_shapes = jax.vmap(
                jax.vmap(lambda p: _occupied_area(p, cfg.offset))
            )(hdv_poses)                                 # [nl, Hp, 4, 2]
            final_poses = jnp.where(
                is_hdv_l[:, None, None], hdv_poses, final_poses
            )
            final_trims = jnp.where(
                is_hdv_l[:, None],
                jnp.broadcast_to(hdv_trim[:, None], (nl, hp)),
                final_trims,
            )
            final_shapes = jnp.where(
                is_hdv_l[:, None, None, None],
                jnp.broadcast_to(
                    pad_polys_to_vo(hdv_shapes), (nl, hp, VO, 2)
                ),
                final_shapes,
            )
            fallbacks = fallbacks & ~is_hdv_l

        # ---- apply (Simulation.apply, plant/Simulation.m:86-117) ----------
        new_state = StepState(
            pose=final_poses[:, 0],
            trim=final_trims[:, 0].astype(jnp.int32),
            prev_poses=final_poses,
            prev_trims=final_trims.astype(jnp.int32),
            prev_shapes=final_shapes,
            prev_valid=jnp.ones((nl,), dtype=bool),
            priorities_prev=comm.local_slice(priorities),
        )
        info = StepInfo(
            poses=final_poses,
            trims=final_trims.astype(jnp.int32),
            shapes=final_shapes,
            cost=final_cost,
            needs_fallback=fallbacks,
            is_exhausted=planned.is_exhausted,
            n_expanded=planned.n_expanded,
            adjacency=adjacency,
            directed_coupling=directed,
            directed_sequential=sequential,
            levels=levels,
            priorities=priorities,
            reference_points=ref_points,
            priority_permutation=perm_chosen,
        )
        if debug_capture:
            capture_out["ref_points"] = ref_points       # [N, Hp, 2]
            capture_out["v_ref"] = v_ref                 # [N, Hp]
            capture_out["pose0"] = state.pose            # [N, 3]
            capture_out["trim0"] = state.trim            # [N]
            if bnd_segs is not None:
                capture_out["bnd_segs"] = bnd_segs       # [N, S, 2, 2]
                capture_out["bnd_mask"] = bnd_mask       # [N, S]
            return new_state, info, capture_out
        return new_state, info

    return step


def vehicles_at_intersection(time_step, times, positions,
                             intersection_center, threshold):
    """Track which vehicles are inside the intersection and since when.

    Vehicles within ``threshold`` of the intersection center are "at the
    intersection"; ``times`` records the entry step (inf when outside).
    Reference: hlc/controller/common/vehicles_at_intersection.m.

    positions: [N, 2]; times: [N] (inf-initialized). Returns (at [N] bool,
    times [N]).
    """
    d = jnp.linalg.norm(
        positions - jnp.asarray(intersection_center)[None, :], axis=-1
    )
    at = d < threshold
    entering = at & ~jnp.isfinite(times)
    times = jnp.where(entering, time_step, times)
    times = jnp.where(~at, jnp.inf, times)
    return at, times


def _del_first_rpt_last(arr: jax.Array, axis: int) -> jax.Array:
    """Shift along ``axis`` dropping the first entry and repeating the last.

    Reference: utility/del_first_rpt_last.m (used by fallback and delayed
    trajectories).
    """
    first = jax.lax.slice_in_dim(arr, 1, arr.shape[axis], axis=axis)
    last = jax.lax.slice_in_dim(
        arr, arr.shape[axis] - 1, arr.shape[axis], axis=axis
    )
    return jnp.concatenate([first, last], axis=axis)


def make_centralized_step(cfg: Config, mpa: MpaTensors,
                          scenario: ScenarioTensors):
    """Centralized control step: one joint optimization over all vehicles.

    Reference: hlc/controller/centralized/CentralizedController.m — no
    coupling graph and no fallback (the reference errors out on an
    infeasible joint search, :61-70; here the fleet holds its poses and the
    step is flagged exhausted).
    """
    from pdmpc_tpu.ops.search_centralized import plan_centralized

    n = scenario.n_vehicles
    hp = mpa.Hp
    dt = cfg.dt_seconds

    def step(state: StepState, k: jax.Array):
        del k
        ref_points, v_ref, seg_idx, proj_seg = jax.vmap(
            lambda i, p, t: _reference_trajectory_single(
                mpa, scenario, i, p, t, dt
            )
        )(jnp.arange(n), state.pose, state.trim)

        # the joint search applies the same obstacle + boundary constraints
        # as the prioritized one (are_constraints_satisfied_sat.m:1-68)
        if scenario.road is not None:
            def boundary_for(i, seg_i, proj_i):
                lane_of = scenario.segment_lanelet[i]
                ids = jnp.concatenate(
                    [lane_of[proj_i][None], lane_of[seg_i]]
                )
                uids = jnp.unique(ids, size=_n_predicted_lanelets(hp),
                                  fill_value=0)
                segs = scenario.road.boundary_segments[uids]
                mask = scenario.road.boundary_seg_mask[uids]
                return segs.reshape(-1, 2, 2), mask.reshape(-1)

            bnd_segs, bnd_mask = jax.vmap(boundary_for)(
                jnp.arange(n), seg_idx, proj_seg
            )
        else:
            bnd_segs = bnd_mask = None

        if scenario.static_obstacles is not None:
            n_static = scenario.static_obstacles.shape[0]
            obstacles = Obstacles(
                polys=jnp.broadcast_to(
                    scenario.static_obstacles[:, None],
                    (n_static, hp, VO, 2),
                ),
                mask=jnp.broadcast_to(
                    scenario.static_obstacle_mask[:, None], (n_static, hp)
                ),
            )
        else:
            obstacles = None

        res = plan_centralized(
            mpa, state.pose, state.trim, ref_points, v_ref, dt,
            cfg.beam_width,
            obstacles=obstacles,
            boundary_segments=bnd_segs, boundary_mask=bnd_mask,
        )
        poses = jnp.swapaxes(res.poses, 0, 1)            # [N, Hp, 3]
        trims = jnp.swapaxes(res.trims, 0, 1)            # [N, Hp]
        shapes = pad_polys_to_vo(jnp.swapaxes(res.shapes, 0, 1))

        keep = res.is_exhausted
        new_pose = jnp.where(keep, state.pose, poses[:, 0])
        new_trim = jnp.where(keep, state.trim, trims[:, 0])

        new_state = StepState(
            pose=new_pose,
            trim=new_trim.astype(jnp.int32),
            prev_poses=poses,
            prev_trims=trims.astype(jnp.int32),
            prev_shapes=shapes,
            prev_valid=jnp.ones((n,), dtype=bool),
            priorities_prev=state.priorities_prev,
        )
        zeros_nn = jnp.zeros((n, n), dtype=bool)
        info = StepInfo(
            poses=poses,
            trims=trims.astype(jnp.int32),
            shapes=shapes,
            cost=jnp.full((n,), res.cost / n),
            needs_fallback=jnp.full((n,), res.is_exhausted),
            is_exhausted=jnp.full((n,), res.is_exhausted),
            n_expanded=jnp.full((n,), res.n_expanded, dtype=jnp.int32),
            adjacency=~jnp.eye(n, dtype=bool),
            directed_coupling=zeros_nn,
            directed_sequential=zeros_nn,
            levels=jnp.ones((n,), dtype=jnp.int32),
            priorities=jnp.arange(1, n + 1, dtype=jnp.int32),
            reference_points=ref_points,
            priority_permutation=jnp.zeros((n,), dtype=jnp.int32),
        )
        return new_state, info

    return step


def make_run(cfg: Config):
    """Receding-horizon experiment:
    ``run(state0, mpa, scenario) -> (final_state, infos)``.

    The reference's main_control_loop (HighLevelController.m:334-373) as a
    ``lax.scan`` over k_end steps; infos are stacked per step (the
    ExperimentResult capability).

    The MPA and scenario tensor bundles are *arguments* of the returned
    function (to be traced by jit), NOT closure constants: embedded array
    literals make TPU compilation pathologically slow.
    """

    def run(state: StepState, mpa: MpaTensors, scenario: ScenarioTensors):
        if cfg.is_prioritized:
            step = make_prioritized_step(cfg, mpa, scenario)
        else:
            step = make_centralized_step(cfg, mpa, scenario)
        return jax.lax.scan(
            step, state, jnp.arange(cfg.k_end, dtype=jnp.int32)
        )

    return run
