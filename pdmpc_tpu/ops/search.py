"""Batched trim-lattice trajectory search — the optimizer layer.

TPU-native re-design of the reference's A* graph search
(hlc/optimizer/graph_search/GraphSearch.m + expand_node.m + the C++ MEX
priority queue, priority_queue_interface_mex.cpp): instead of popping one
node at a time from a heap and lazily evaluating its edge, the whole frontier
is expanded **layer by layer** over the horizon. At each layer every
(beam-node x successor-trim) candidate is cost-evaluated and collision-masked
in one batched computation, then the best ``beam_width`` candidates survive
(``lax.top_k``). With a beam at least as wide as the reachable frontier the
search is exhaustive and returns the same optimum as A* run to completion
(identical g/h definitions, expand_node.m:61-73); a narrower beam prunes by
the same f = g + h ordering A* uses.

The ordered-expansion capability of the MEX heap is subsumed by dense top-k
over the frontier — a shape the MXU/VPU execute at full rate, with no
data-dependent control flow.

All functions are jittable and vmap over vehicles/scenarios.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pdmpc_tpu.models.mpa import MpaTensors

# Obstacle polygons are padded to a common vertex count.
VO = 16


class Obstacles(NamedTuple):
    """Per-step dynamic obstacles for one planning vehicle.

    ``polys``: [n_obs, Hp, VO, 2] — polygon of obstacle o at prediction step
    k (static obstacles are broadcast over Hp by the caller).
    ``mask``: [n_obs, Hp] — False entries are ignored.
    Assembled by the controller from predecessors' predicted areas, parallel
    vehicles' reachable sets, and successors' standstill areas (the
    capability of get_all_obstacles.m / vectorize_all_obstacles.m).
    """

    polys: jax.Array
    mask: jax.Array


def pad_polys_to_vo(polys: jax.Array) -> jax.Array:
    """Pad polygons [..., V, 2] to [..., VO, 2] by repeating the last vertex."""
    v = polys.shape[-2]
    if v == VO:
        return polys
    assert v < VO, f"polygon vertex count {v} exceeds VO={VO}"
    last = polys[..., -1:, :]
    reps = jnp.broadcast_to(
        last, (*polys.shape[:-2], VO - v, 2)
    )
    return jnp.concatenate([polys, reps], axis=-2)


class PlanResult(NamedTuple):
    trims: jax.Array        # [Hp] i32 — predicted trims (first entry = step 1)
    poses: jax.Array        # [Hp, 3] f32 — predicted poses (x, y, yaw)
    shapes: jax.Array       # [Hp, V, 2] f32 — swept occupied areas (offset)
    cost: jax.Array         # [] f32 — accumulated g of the chosen leaf
    is_exhausted: jax.Array  # [] bool — no feasible leaf found
    n_expanded: jax.Array   # [] i32 — feasible candidates over all layers


def _sat_separates_batch(man_polys, obs_polys):
    """SAT separation test for batched candidate/obstacle polygon pairs.

    man_polys: [..., VA, 2]; obs_polys: [..., VB, 2] (broadcastable batch
    dims). Returns [...] bool, True where the polygons are separated.
    Axes come from both polygons; degenerate (repeated-vertex) edges produce
    zero axes which never separate. Reference: intersect_sat.m.
    """
    def axes_of(p):
        e = jnp.roll(p, -1, axis=-2) - p
        ax = jnp.stack([-e[..., 1], e[..., 0]], axis=-1)
        n = jnp.linalg.norm(ax, axis=-1, keepdims=True)
        return ax / jnp.maximum(n, 1e-9)

    def separated_on(axes, a, b):
        # d=2 contraction; force f32 accumulation — the MXU's default bf16
        # inputs flip marginal separations (observed vs the f32 Pallas
        # kernel and the CPU backend on touching polygons)
        pa = jnp.einsum("...kd,...vd->...kv", axes, a,
                        precision=jax.lax.Precision.HIGHEST)
        pb = jnp.einsum("...kd,...vd->...kv", axes, b,
                        precision=jax.lax.Precision.HIGHEST)
        d1 = jnp.min(pa, axis=-1) - jnp.max(pb, axis=-1)
        d2 = jnp.min(pb, axis=-1) - jnp.max(pa, axis=-1)
        return jnp.any((d1 > 0) | (d2 > 0), axis=-1)

    return separated_on(axes_of(man_polys), man_polys, obs_polys) | (
        separated_on(axes_of(obs_polys), man_polys, obs_polys)
    )


# Obstacles are processed in chunks of this size: bounds the materialized
# SAT projection tensor to [C, OBS_CHUNK, VA+VB, max(VA,VB)] regardless of
# the obstacle count (a single fused [C, n_obs, ...] tensor OOMs HBM for
# large vehicle counts x scenario batches). Candidates and boundary
# segments stay FUSED: chunking them (lax.map over candidate tiles /
# per-segment-chunk scans) was measured to cost >1000x throughput on TPU —
# the scan carries force HBM round-trips between tiny kernels. Peak memory
# for very large Monte-Carlo sweeps is bounded at the host level by
# splitting the scenario batch, not inside the kernel.
OBS_CHUNK = 8


def candidate_collisions(man_polys, obs_polys, obs_mask):
    """Collision mask of candidate swept areas against masked obstacles.

    man_polys: [C, VA, 2] candidate polygons (already in world frame)
    obs_polys: [n_obs, VB, 2]; obs_mask: [n_obs]
    Returns [C] bool — True where the candidate hits any active obstacle.

    This is the hot inner loop of the framework (the eval_edge_exact
    capability, GraphSearch.m:111-196). Obstacles are scanned in
    fixed-size chunks to bound peak memory.
    """
    c = man_polys.shape[0]
    n_obs, vb = obs_polys.shape[0], obs_polys.shape[1]
    n_chunks = -(-n_obs // OBS_CHUNK)
    pad = n_chunks * OBS_CHUNK - n_obs
    if pad:
        obs_polys = jnp.concatenate(
            [obs_polys, jnp.zeros((pad, vb, 2), obs_polys.dtype)], axis=0
        )
        obs_mask = jnp.concatenate(
            [obs_mask, jnp.zeros((pad,), dtype=bool)], axis=0
        )
    obs_polys = obs_polys.reshape(n_chunks, OBS_CHUNK, vb, 2)
    obs_mask = obs_mask.reshape(n_chunks, OBS_CHUNK)

    def body(hit, chunk):
        polys, mask = chunk
        sep = _sat_separates_batch(
            man_polys[:, None, :, :], polys[None, :, :, :]
        )  # [C, OBS_CHUNK]
        return hit | jnp.any((~sep) & mask[None, :], axis=-1), None

    hit, _ = jax.lax.scan(
        body, jnp.zeros((c,), dtype=bool), (obs_polys, obs_mask)
    )
    return hit


def polys_to_edge_segments(polys, mask):
    """Explode polygon outlines into their edge segments.

    polys: [..., NO, VO, 2]; mask: [..., NO] ->
    segments [..., NO*VO, 2, 2], segment mask [..., NO*VO].

    Degenerate padded edges (repeated last vertex) are zero-length and
    inert in every segment-intersection predicate (cross products with a
    zero direction never satisfy the crossing test).
    """
    *lead, no, vo, _ = polys.shape
    p2 = jnp.roll(polys, -1, axis=-2)
    segs = jnp.stack([polys, p2], axis=-2).reshape(*lead, no * vo, 2, 2)
    m = jnp.repeat(mask, vo, axis=-1)
    return segs, m


def candidate_outline_collisions(man_polys, obs_polys, obs_mask):
    """Non-convex collision mask: candidate outline crosses obstacle outline.

    The InterX-equivalent path (hlc/optimizer/OptimizerInterface.m:36-46):
    in road scenarios maneuver/reachable areas are non-convex, SAT does not
    apply, and polygons are declared colliding iff their OUTLINES intersect.
    Like the reference (Config.m:71-87: "the error we make with InterX is
    negligible"), full containment without an edge crossing is not detected
    — practically impossible for similar-size vehicle shapes moving
    continuously.

    man_polys: [C, VA, 2]; obs_polys: [n_obs, VB, 2]; obs_mask: [n_obs].
    Returns [C] bool. Obstacles scan in fixed chunks to bound peak memory
    (same scheme as candidate_collisions).
    """
    c = man_polys.shape[0]
    n_obs, vb = obs_polys.shape[0], obs_polys.shape[1]
    n_chunks = -(-n_obs // OBS_CHUNK)
    pad = n_chunks * OBS_CHUNK - n_obs
    if pad:
        obs_polys = jnp.concatenate(
            [obs_polys, jnp.zeros((pad, vb, 2), obs_polys.dtype)], axis=0
        )
        obs_mask = jnp.concatenate(
            [obs_mask, jnp.zeros((pad,), dtype=bool)], axis=0
        )
    obs_polys = obs_polys.reshape(n_chunks, OBS_CHUNK, vb, 2)
    obs_mask = obs_mask.reshape(n_chunks, OBS_CHUNK)

    def body(hit, chunk):
        polys, mask = chunk
        segs, m = polys_to_edge_segments(polys, mask)
        return hit | candidate_boundary_violations(man_polys, segs, m), None

    hit, _ = jax.lax.scan(
        body, jnp.zeros((c,), dtype=bool), (obs_polys, obs_mask)
    )
    return hit


def candidate_boundary_violations(man_polys, boundary_segments,
                                  boundary_mask):
    """True where a candidate polygon crosses any lanelet-boundary segment.

    man_polys: [C, VA, 2] (closed implicitly: last->first edge included);
    boundary_segments: [S, 2, 2]; boundary_mask: [S].
    The segment-intersection capability of intersect_lanelet_boundary.m /
    InterX.m used by the boundary constraint in eval_edge_exact
    (are_constraints_satisfied_*.m). A vehicle that starts inside the
    drivable corridor and never crosses its boundary stays inside.
    """
    a1 = man_polys                                   # [C, VA, 2]
    a2 = jnp.roll(man_polys, -1, axis=-2)
    b1 = boundary_segments[:, 0]                     # [S, 2]
    b2 = boundary_segments[:, 1]

    r = (a2 - a1)[:, :, None, :]                     # [C, VA, 1, 2]
    s = (b2 - b1)[None, None, :, :]                  # [1, 1, S, 2]
    qp = b1[None, None, :, :] - a1[:, :, None, :]    # [C, VA, S, 2]
    d = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    a_num = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    b_num = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    hit = _segment_cross_predicate(d, a_num, b_num) \
        & boundary_mask[None, None, :]
    return jnp.any(hit, axis=(-1, -2))               # [C]


# Parameter-space tolerance of the segment-crossing predicate: crossings
# are accepted for t, u in [-TOL, 1+TOL]. Exact endpoint/edge touches are
# THE common case on a shared trim lattice (vehicles reuse identical
# maneuver geometry), and f32 fusion/FMA differences between the CPU and
# TPU backends flip an exact-boundary comparison — one flipped collision
# cascades into a diverged trajectory (observed on the cr3 golden, 21.8%
# drift). The band is ~TOL x segment length (~30 um) wide — physically
# negligible against the 1 cm safety offset, and conservative (a near
# touch counts as a hit on every backend).
SEG_CROSS_TOL = 1e-4


def _segment_cross_predicate(d, a_num, b_num):
    """Division-free robust crossing test given d = r x s, A = qp x s,
    B = qp x r: crossing iff |d| >= eps and A/d, B/d within [-TOL, 1+TOL].

    The identical formulation runs in the Pallas boundary kernel
    (pallas_collision._boundary_kernel) — keep the two in lockstep.
    """
    ad = jnp.abs(d)
    t_lim = SEG_CROSS_TOL * d * d
    m_lim = ad * (1.0 + SEG_CROSS_TOL)
    return (
        (ad >= 1e-9)
        & (a_num * d >= -t_lim) & (jnp.abs(a_num) <= m_lim)
        & (b_num * d >= -t_lim) & (jnp.abs(b_num) <= m_lim)
    )


def _cost_to_go(pos, ref_points, v_ref, k_child, dt):
    """Admissible cost-to-go. Reference: expand_node.m:63-73.

    pos: [..., 2] candidate positions after step ``k_child`` (0-based).
    For each future step i > k_child: h += max(0, |pos - ref_i| - d_max_i)^2
    with d_max_i the maximum distance travelable until step i.
    """
    hp = ref_points.shape[0]
    steps = jnp.arange(hp)
    future = steps > k_child                                  # [Hp]
    # d_max at future step i: sum_{t=k_child+1..i} dt * v_ref[t]
    dv = jnp.where(future, dt * v_ref, 0.0)
    d_max = jnp.cumsum(dv)                                    # [Hp]
    dist = jnp.linalg.norm(
        pos[..., None, :] - ref_points, axis=-1
    )                                                         # [..., Hp]
    short = jnp.maximum(0.0, dist - d_max)
    return jnp.sum(jnp.where(future, short**2, 0.0), axis=-1)


def plan_trajectory(
    mpa: MpaTensors,
    x0: jax.Array,            # [3] pose (x, y, yaw)
    trim0: jax.Array,         # [] i32
    ref_points: jax.Array,    # [Hp, 2]
    v_ref: jax.Array,         # [Hp]
    obstacles: Obstacles,
    dt: float,
    beam_width: int,
    boundary_segments: jax.Array | None = None,   # [S, 2, 2]
    boundary_mask: jax.Array | None = None,       # [S]
    use_pallas: bool = False,
    segments_pre=None,        # precomputed SegmentsPre (pallas path only)
    active=None,              # scalar bool: False -> kernels skip all work
    non_convex: bool = False,
    unroll_tail: bool = True,
) -> PlanResult:
    """Plan one vehicle's Hp-step trajectory through the trim lattice.

    When boundary segments are given (road scenarios), every candidate
    maneuver must additionally not cross the lanelet boundary; the
    without-offset swept area is checked (the larger-offset area at the
    final step), matching eval_edge_exact's shapes_for_boundary_check
    (GraphSearch.m:166-174).

    ``non_convex`` selects the InterX-equivalent obstacle check (outline
    crossing via segment intersection) instead of SAT — the reference's
    dispatch for road scenarios (OptimizerInterface.m:36-46); the caller
    must pass MpaTensors built from the non-convex area family.
    """
    n = mpa.n_trims
    hp = mpa.Hp
    b = beam_width
    va = mpa.area.shape[-2]
    check_boundary = boundary_segments is not None

    obs_polys_by_step = jnp.moveaxis(obstacles.polys, 1, 0)   # [Hp, n_obs, VO, 2]
    obs_mask_by_step = jnp.moveaxis(obstacles.mask, 1, 0)     # [Hp, n_obs]

    if use_pallas:
        from pdmpc_tpu.ops import pallas_collision as pk

        # candidate-independent obstacle geometry, once per planning pass
        # for all Hp layers (was: recomputed inside every layer)
        if non_convex:
            # outline semantics on the natural polygon rings: the dedicated
            # outline kernel keeps obstacle-granular bbox skipping and
            # SAT-kernel-shaped staging (exploding polys into segments was
            # measured to collapse batched throughput: 5 [S_pad,1]-shaped
            # staged arrays + a 16x wider SMEM fine mask per instance)
            obs_pre = pk.precompute_outline(obs_polys_by_step,
                                            obs_mask_by_step)
        else:
            obs_pre = pk.precompute_obstacles(obs_polys_by_step,
                                              obs_mask_by_step)
        if check_boundary and segments_pre is None:
            segments_pre = pk.precompute_segments(boundary_segments,
                                                  boundary_mask)
        if active is not None:
            # level predication: a vehicle whose plan will be discarded
            # this level (dense level loop) zeroes its skip masks, so its
            # kernel grid steps do no work at all
            act = active.astype(jnp.int32)
            obs_pre = obs_pre._replace(mask=obs_pre.mask * act)
            if check_boundary:
                segments_pre = segments_pre._replace(
                    mask=segments_pre.mask * act
                )
        # Packed maneuver-area tables [VA*n*2, n_parent]: the per-layer
        # candidate polygons are produced by a ONE-HOT MATMUL on the MXU
        # (table @ one_hot(parent_trim)) with the beam on the lane
        # dimension — a gather `mpa.area[trim]` emits a [B, VA, n, 2]
        # layout whose 24-element minor dims waste 97% of every (8, 128)
        # tile and was measured at 12 ms/step on v5e.
        def _pack(table):                # [n, n, VA, 2] -> [VA*n*2, n]
            return jnp.transpose(table, (2, 1, 3, 0)).reshape(
                va * n * 2, n
            )

        sat_pack = _pack(mpa.area)
        if check_boundary:
            # offset select hoisted to the (tiny) table: without-offset
            # areas except the large-offset area at the final layer
            no_pack = _pack(mpa.area_no_offset)
            lg_pack = _pack(mpa.area_large_offset)
            bnd_only = jnp.where(
                (jnp.arange(hp) == hp - 1)[:, None, None], lg_pack, no_pack
            )                                            # [Hp, VA*n*2, n]
            # fuse the obstacle- and boundary-geometry tables so each
            # layer runs ONE one-hot matmul + ONE transform chain for
            # both candidate sets (the hot loop is dispatch-gap bound)
            bnd_pack = jnp.concatenate(
                [jnp.broadcast_to(sat_pack[None], (hp, *sat_pack.shape)),
                 bnd_only], axis=1
            )                                            # [Hp, 2*VA*n*2, n]
        else:
            bnd_pack = jnp.zeros((hp, 1, 1))
    else:
        obs_pre = None
        bnd_pack = None

    def layer(carry, xs, b_in, b_out):
        """One search layer; ``k`` may be static (unrolled prefix) or
        traced (scanned uniform tail).

        The horizon loop runs a GROWING-BEAM prefix: layer k can hold at
        most n^k reachable nodes, so early layers evaluate 12/144/...
        candidates instead of beam_width*n, and when the full candidate
        set fits in b_out no pruning happens and the top_k is skipped.
        Once the width saturates at beam_width the remaining layers share
        one lax.scan body (keeps compile time flat in Hp).
        """
        pose, trim, g, valid, n_expanded = carry
        k, trans_k, obs_polys, obs_mask, obs_pre_k, bnd_pack_k = xs
        b = b_in

        # --- expansion: every (beam node, successor trim) pair -----------
        allowed = trans_k[trim]                               # [B, n]
        c = jnp.cos(pose[:, 2])[:, None]                      # [B, 1]
        s = jnp.sin(pose[:, 2])[:, None]
        mdx = mpa.dx[trim]                                    # [B, n]
        mdy = mpa.dy[trim]
        child_x = c * mdx - s * mdy + pose[:, 0:1]
        child_y = s * mdx + c * mdy + pose[:, 1:2]
        child_yaw = pose[:, 2:3] + mpa.dyaw[trim]
        child_pos = jnp.stack([child_x, child_y], axis=-1)    # [B, n, 2]

        # --- costs (expand_node.m:61-73) ---------------------------------
        g_child = g[:, None] + jnp.sum(
            (child_pos - ref_points[k]) ** 2, axis=-1
        )
        h_child = _cost_to_go(child_pos, ref_points, v_ref, k, dt)

        # --- collision mask (eval_edge_exact capability) ------------------
        # natural vertex count (VA=4-6): SAT handles VA != VO; padding the
        # candidates to VO=16 would triple the axis/vertex work
        if use_pallas:
            # one-hot matmul expansion: exact copy of table rows (single
            # nonzero per column), output [VA, n, 2, B] with the beam on
            # lanes — directly kernel-consumable, no gather, no transpose
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (n, b), 0) == trim[None]
            ).astype(jnp.float32)                             # [n, B]
            ct = c.reshape(1, 1, b)                           # cos(parent yaw)
            st = s.reshape(1, 1, b)
            pxb = pose[:, 0].reshape(1, 1, b)
            pyb = pose[:, 1].reshape(1, 1, b)
            if check_boundary:
                # fused table: obstacle + boundary candidate geometries
                # from ONE matmul and ONE transform chain (each one-hot
                # column copies the same table rows, so results equal
                # the two separate matmuls bit-for-bit)
                g2 = jax.lax.dot_general(
                    bnd_pack_k, onehot, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                ).reshape(2, va, n, 2, b)
                gx = (ct[None] * g2[:, :, :, 0]
                      - st[None] * g2[:, :, :, 1] + pxb[None])
                gy = (st[None] * g2[:, :, :, 0]
                      + ct[None] * g2[:, :, :, 1] + pyb[None])
                cxk = gx[0].reshape(va, n * b)
                cyk = gy[0].reshape(va, n * b)
                bxk = gx[1].reshape(va, n * b)
                byk = gy[1].reshape(va, n * b)
            else:
                satg = jax.lax.dot_general(
                    sat_pack, onehot, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                ).reshape(va, n, 2, b)
                cxk = (ct * satg[:, :, 0] - st * satg[:, :, 1]
                       + pxb).reshape(va, n * b)
                cyk = (st * satg[:, :, 0] + ct * satg[:, :, 1]
                       + pyb).reshape(va, n * b)
            if non_convex:
                collide = pk.outline_hits_pre(
                    cxk, cyk, obs_pre_k
                ).reshape(n, b).T
            else:
                collide = pk.sat_hits_pre(
                    cxk, cyk, obs_pre_k
                ).reshape(n, b).T
        else:
            areas = mpa.area[trim]                            # [B, n, VA, 2]
            ax = (
                c[:, :, None] * areas[..., 0]
                - s[:, :, None] * areas[..., 1] + pose[:, 0:1, None]
            )
            ay = (
                s[:, :, None] * areas[..., 0]
                + c[:, :, None] * areas[..., 1] + pose[:, 1:2, None]
            )
            man_world = jnp.stack([ax, ay], axis=-1)          # [B, n, VA, 2]
            man_flat = man_world.reshape(b * n, va, 2)
            check = (candidate_outline_collisions if non_convex
                     else candidate_collisions)
            collide = check(man_flat, obs_polys, obs_mask).reshape(b, n)

        if check_boundary:
            # boundary areas: without offset; larger offset at final step
            if use_pallas:
                # bxk/byk already produced by the fused matmul above
                crosses = pk.boundary_hits_pre(
                    bxk, byk, segments_pre
                ).reshape(n, b).T
            else:
                # offset select on the (tiny) table, then gather
                bnd_table = jnp.where(
                    jnp.equal(k, hp - 1)[..., None, None, None, None],
                    mpa.area_large_offset,
                    mpa.area_no_offset,
                )
                bnd_areas = bnd_table[trim]                   # [B, n, VA, 2]
                bx = (
                    c[:, :, None] * bnd_areas[..., 0]
                    - s[:, :, None] * bnd_areas[..., 1] + pose[:, 0:1, None]
                )
                by = (
                    s[:, :, None] * bnd_areas[..., 0]
                    + c[:, :, None] * bnd_areas[..., 1] + pose[:, 1:2, None]
                )
                bnd_world = jnp.stack([bx, by], axis=-1).reshape(
                    b * n, va, 2
                )
                crosses = candidate_boundary_violations(
                    bnd_world, boundary_segments, boundary_mask
                ).reshape(b, n)
            collide = collide | crosses

        feasible = valid[:, None] & allowed & ~collide        # [B, n]
        n_expanded = n_expanded + jnp.sum(feasible)
        score = jnp.where(feasible, g_child + h_child, jnp.inf)

        if b_out >= b * n:
            # exhaustive layer: every candidate survives, no pruning
            child_trim = jnp.tile(jnp.arange(n, dtype=jnp.int32), b)
            parent = jnp.repeat(
                jnp.arange(b, dtype=jnp.int32), n, total_repeat_length=b * n
            )
            new_valid = feasible.reshape(-1)
            new_pose = jnp.stack(
                [child_x.reshape(-1), child_y.reshape(-1),
                 child_yaw.reshape(-1)],
                axis=-1,
            )
            new_g = g_child.reshape(-1)
        else:
            # --- top-k pruning (replaces the MEX priority queue) ---------
            flat_score = score.reshape(b * n)
            neg_top, flat_idx = jax.lax.top_k(-flat_score, b_out)
            parent = flat_idx // n                            # [B_out]
            child_trim = (flat_idx % n).astype(jnp.int32)
            new_valid = neg_top > -jnp.inf
            # single packed payload gather (x, y, yaw, g): four separate
            # 1-D gathers are scalar-core bound and cost 4x
            payload = jnp.stack(
                [child_x, child_y, child_yaw, g_child], axis=-1
            ).reshape(b * n, 4)
            sel = payload[flat_idx]                           # [B_out, 4]
            new_pose = sel[:, :3]
            new_g = sel[:, 3]

        out = (new_pose, child_trim, parent, new_valid)
        return (new_pose, child_trim, new_g, new_valid, n_expanded), out

    # beam widths per layer: layer k holds at most (prev width) * n nodes
    widths = []
    w = 1
    for _ in range(hp):
        w = min(b, w * n)
        widths.append(w)

    carry = (
        x0[None, :],                                  # [1, 3] root pose
        trim0[None].astype(jnp.int32),                # [1]
        jnp.zeros((1,)),                              # g
        jnp.ones((1,), dtype=bool),                   # valid
        jnp.array(0, dtype=jnp.int32),
    )

    def xs_at(k):
        return (
            jnp.asarray(k, dtype=jnp.int32),
            mpa.transition[k],
            obs_polys_by_step[k],
            obs_mask_by_step[k],
            jax.tree.map(lambda x: x[k], obs_pre) if use_pallas else None,
            bnd_pack[k] if use_pallas else None,
        )

    # growing-beam prefix (shapes differ per layer), unrolled
    k0 = 0
    while k0 < hp and (k0 == 0 or widths[k0 - 1] < b):
        k0 += 1
    poses_l, trims_l, parents_l = [], [], []
    b_in = 1
    for k in range(k0):
        carry, (p_k, t_k, par_k, v_k) = layer(
            carry, xs_at(k), b_in, widths[k]
        )
        poses_l.append(p_k)
        trims_l.append(t_k)
        parents_l.append(par_k)
        b_in = widths[k]

    # uniform tail (width saturated at b): single scan body
    if k0 < hp:
        ks_tail = jnp.arange(k0, hp)
        tail_xs = (
            ks_tail,
            mpa.transition[k0:],
            obs_polys_by_step[k0:],
            obs_mask_by_step[k0:],
            (jax.tree.map(lambda x: x[k0:], obs_pre)
             if use_pallas else None),
            bnd_pack[k0:] if use_pallas else None,
        )
        # full unroll for short tails: the scan's while-op machinery
        # (carry staging per iteration) measures ~0.2 ms per chunk on
        # v5e — straight-line code removes it; compile time stays
        # bounded because the tail is at most a few layers. Callers
        # disable the unroll for LARGE batched rollouts: straight-line
        # layers keep all layers' candidate buffers live, and the temp
        # footprint (~10 MB/lane at beam 256) starves HBM headroom at
        # 512+ concurrent lanes (Config.unroll_layers).
        carry, (p_t, t_t, par_t, v_t) = jax.lax.scan(
            lambda cc, xx: layer(cc, xx, b, b), carry, tail_xs,
            unroll=unroll_tail and (hp - k0) <= 6,
        )
        for j in range(hp - k0):
            poses_l.append(p_t[j])
            trims_l.append(t_t[j])
            parents_l.append(par_t[j])
    _, _, g_f, valid_f, n_expanded = carry

    # --- leaf selection: min g among valid leaves (h = 0 at depth Hp) ----
    leaf_score = jnp.where(valid_f, g_f, jnp.inf)
    best_leaf = jnp.argmin(leaf_score)
    is_exhausted = ~jnp.any(valid_f)
    cost = leaf_score[best_leaf]

    # --- backtracking over per-layer parent pointers (static unroll) -----
    idx = best_leaf
    trims_rev, poses_rev = [], []
    for k in range(hp - 1, -1, -1):
        trims_rev.append(trims_l[k][idx])
        poses_rev.append(poses_l[k][idx])
        idx = parents_l[k][idx]
    trims_path = jnp.stack(trims_rev[::-1])
    poses_path = jnp.stack(poses_rev[::-1])

    # --- occupied swept areas along the chosen path ----------------------
    parent_poses = jnp.concatenate([x0[None, :], poses_path[:-1]], axis=0)
    parent_trims = jnp.concatenate(
        [trim0[None].astype(jnp.int32), trims_path[:-1]], axis=0
    )
    areas = mpa.area[parent_trims, trims_path]                # [Hp, VA, 2]
    c = jnp.cos(parent_poses[:, 2])[:, None]
    s = jnp.sin(parent_poses[:, 2])[:, None]
    sx = c * areas[..., 0] - s * areas[..., 1] + parent_poses[:, 0:1]
    sy = s * areas[..., 0] + c * areas[..., 1] + parent_poses[:, 1:2]
    shapes = jnp.stack([sx, sy], axis=-1)

    return PlanResult(
        trims=trims_path,
        poses=poses_path,
        shapes=shapes,
        cost=cost,
        is_exhausted=is_exhausted,
        n_expanded=n_expanded,
    )


def plan_trajectory_sampled(
    mpa: MpaTensors,
    x0: jax.Array,
    trim0: jax.Array,
    ref_points: jax.Array,
    v_ref: jax.Array,
    obstacles: Obstacles,
    dt: float,
    n_rollouts: int,
    key: jax.Array,
    boundary_segments: jax.Array | None = None,
    boundary_mask: jax.Array | None = None,
    temperature: float = 0.002,
    non_convex: bool = False,
) -> PlanResult:
    """Sampled anytime search: batched random rollouts through the lattice.

    TPU-native re-design of the reference's Monte-Carlo tree search
    (hlc/optimizer/graph_search/MonteCarloTreeSearch.m, "MatlabSampled"):
    instead of sequentially growing a tree under a 250-expansion budget with
    pre-drawn random numbers (seeded per time step + vehicle, :31), the
    budget is spent on ``n_rollouts`` independent root-to-Hp rollouts
    evaluated fully in parallel; infeasible edges kill a rollout, and the
    cheapest surviving complete rollout wins (the candidate-leaf priority
    queue's role, :8,16-27). Deterministic given ``key``.

    Budget equivalence: one rollout evaluates Hp edges exactly, so
    ``n_rollouts = ceil(250 / Hp)`` (~42 at Hp=6) matches the reference's
    250-expansion budget in exact edge evaluations; the default (256,
    config.mcts_n_rollouts) spends more because parallel rollouts are
    nearly free on TPU.

    The rollout policy is cost-guided: successor trims are drawn from a
    softmax over the negative one-step cost (squared distance to the
    reference point) at ``temperature`` (m^2 units; <= 0 for the uniform
    policy). This mirrors the reference MCTS's cost-focused candidate
    ordering (its priority queue keeps cheap partial paths first) while
    retaining exploration.
    """
    n = mpa.n_trims
    hp = mpa.Hp
    r = n_rollouts
    va = mpa.area.shape[-2]
    check_boundary = boundary_segments is not None

    obs_polys_by_step = jnp.moveaxis(obstacles.polys, 1, 0)
    obs_mask_by_step = jnp.moveaxis(obstacles.mask, 1, 0)

    pose0 = jnp.tile(x0[None, :], (r, 1))
    trim_r = jnp.full((r,), trim0, dtype=jnp.int32)
    g0 = jnp.zeros((r,))
    alive0 = jnp.ones((r,), dtype=bool)
    keys = jax.random.split(key, hp)

    def layer(carry, xs):
        pose, trim, g, alive = carry
        k, trans_k, obs_polys, obs_mask, key_k = xs

        allowed = trans_k[trim]                          # [R, n]
        c = jnp.cos(pose[:, 2])
        s = jnp.sin(pose[:, 2])
        # full successor fan (geometry of every candidate child) feeds the
        # cost-guided rollout policy
        fan_x = c[:, None] * mpa.dx[trim] - s[:, None] * mpa.dy[trim] \
            + pose[:, 0:1]                               # [R, n]
        fan_y = s[:, None] * mpa.dx[trim] + c[:, None] * mpa.dy[trim] \
            + pose[:, 1:2]
        fan_d2 = (fan_x - ref_points[k, 0]) ** 2 \
            + (fan_y - ref_points[k, 1]) ** 2            # [R, n]
        if temperature > 0.0:
            logits = jnp.where(allowed, -fan_d2 / temperature, -jnp.inf)
        else:
            logits = jnp.where(allowed, 0.0, -jnp.inf)
        child_trim = jax.random.categorical(
            key_k, logits, axis=-1
        ).astype(jnp.int32)                              # [R]
        any_allowed = jnp.any(allowed, axis=-1)

        rr = jnp.arange(r)
        child_x = fan_x[rr, child_trim]
        child_y = fan_y[rr, child_trim]
        child_yaw = pose[:, 2] + mpa.dyaw[trim, child_trim]

        g = g + fan_d2[rr, child_trim]

        areas = mpa.area[trim, child_trim]               # [R, VA, 2]
        ax = c[:, None] * areas[..., 0] - s[:, None] * areas[..., 1] \
            + pose[:, 0:1]
        ay = s[:, None] * areas[..., 0] + c[:, None] * areas[..., 1] \
            + pose[:, 1:2]
        man_world = jnp.stack([ax, ay], axis=-1)
        if non_convex:
            collide = candidate_outline_collisions(
                man_world, obs_polys, obs_mask
            )
        else:
            collide = candidate_collisions(
                pad_polys_to_vo(man_world), obs_polys, obs_mask
            )
        if check_boundary:
            bnd = jnp.where(
                k == hp - 1,
                mpa.area_large_offset[trim, child_trim],
                mpa.area_no_offset[trim, child_trim],
            )
            bx = c[:, None] * bnd[..., 0] - s[:, None] * bnd[..., 1] \
                + pose[:, 0:1]
            by = s[:, None] * bnd[..., 0] + c[:, None] * bnd[..., 1] \
                + pose[:, 1:2]
            collide = collide | candidate_boundary_violations(
                jnp.stack([bx, by], axis=-1), boundary_segments,
                boundary_mask,
            )

        alive = alive & any_allowed & ~collide
        new_pose = jnp.stack([child_x, child_y, child_yaw], axis=-1)
        # feasible edge evaluations this layer (PlanResult.n_expanded
        # semantics shared with the beam search: expansions over all
        # layers, not rollouts surviving to the leaf)
        n_exp_k = jnp.sum(alive.astype(jnp.int32))
        return (new_pose, child_trim, g, alive), (new_pose, child_trim,
                                                  n_exp_k)

    ks = jnp.arange(hp)
    (pose_f, trim_f, g_f, alive_f), (poses_l, trims_l, n_exp_l) = \
        jax.lax.scan(
            layer,
            (pose0, trim_r, g0, alive0),
            (ks, mpa.transition, obs_polys_by_step, obs_mask_by_step, keys),
        )
    del pose_f, trim_f, va

    leaf_score = jnp.where(alive_f, g_f, jnp.inf)
    best = jnp.argmin(leaf_score)
    is_exhausted = ~jnp.any(alive_f)
    cost = leaf_score[best]

    trims_path = trims_l[:, best]
    poses_path = poses_l[:, best]

    parent_poses = jnp.concatenate([x0[None, :], poses_path[:-1]], axis=0)
    parent_trims = jnp.concatenate(
        [trim0[None].astype(jnp.int32), trims_path[:-1]], axis=0
    )
    areas = mpa.area[parent_trims, trims_path]
    c = jnp.cos(parent_poses[:, 2])[:, None]
    s = jnp.sin(parent_poses[:, 2])[:, None]
    sx = c * areas[..., 0] - s * areas[..., 1] + parent_poses[:, 0:1]
    sy = s * areas[..., 0] + c * areas[..., 1] + parent_poses[:, 1:2]
    shapes = jnp.stack([sx, sy], axis=-1)

    return PlanResult(
        trims=trims_path,
        poses=poses_path,
        shapes=shapes,
        cost=cost,
        is_exhausted=is_exhausted,
        n_expanded=jnp.sum(n_exp_l).astype(jnp.int32),
    )
