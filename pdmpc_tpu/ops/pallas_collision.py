"""Pallas TPU kernels for the hot geometry ops: SAT collision mask and
lanelet-boundary crossing.

The framework's inner loop checks every (candidate swept area x obstacle)
pair with the separating-axis theorem and every candidate edge against the
lanelet boundary (the eval_edge_exact capability, GraphSearch.m:111-196 /
intersect_sat.m / intersect_lanelet_boundary.m). The XLA formulation
materializes huge intermediates in HBM ([C, n_obs, axes, verts] / [C, VA,
n_segments]) that multiply under the vehicle/scenario vmaps; the kernels
keep everything in VMEM and emit only a [C] mask.

Kernel design (both kernels share it):
- grid = (candidate tiles, obstacle/segment GROUPS). The output block for a
  tile is revisited across the group dimension (innermost), so it stays
  resident in VMEM and accumulates.
- candidate-tile geometry (axes / edges / self-extents) is hoisted into
  VMEM scratch at the first group step of each tile — computed once per
  tile instead of once per (tile, obstacle).
- obstacle self-geometry (edge axes + own-axis extents + bounding boxes) is
  precomputed OUTSIDE the per-layer call (`precompute_obstacles` /
  `precompute_segments`): it is candidate-independent, so the planner
  computes it once per planning pass instead of once per search layer.
- the planner-facing entry points (`sat_hits_pre`, `boundary_hits_pre`)
  take candidates in the kernel-native vertex-major [VA, C] layout, so the
  caller can produce them directly from its pose transforms — the naive
  [C, VA, 2] -> [VA, 2, C] transpose has a 2-wide minor dimension and was
  measured to dominate the whole call.
- data-dependent WORK SKIPPING: a per-(tile, group) skip scalar and a
  per-(tile, obstacle) fine mask live in SMEM; `pl.when` skips the entire
  group / individual obstacles whose mask is off or whose bounding box
  cannot overlap the candidate tile's bounding box. Compute is then
  proportional to the *active* pairs (the sparse work the reference's A*
  does lazily), at dense VPU throughput.
- every vector intermediate is 2D ([VA_PAD, T] or [1, T]); vertex loops are
  statically unrolled.

Axis normalization is dropped: scaling an axis never changes the sign of a
separation, so the boolean result matches intersect_sat.m exactly
(degenerate repeated-vertex edges give zero axes which never separate).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Candidates per kernel instance (lane dimension). Smaller tiles give
# tighter bounding boxes (better work-skipping) at more grid steps; the
# SAT kernel's active set is sparse (coupled neighbors only) while the
# boundary kernel's segments are dense near the vehicle, so they tune
# separately. VMEM stays < 1 MB per instance either way.
SAT_TILE = 1536
SEG_TILE = 1536
# Candidate polygon vertices are padded to this sublane count (the swept
# maneuver areas have 4-6 vertices; 8 = one VPU register row).
VA_PAD = 8
# Obstacles / boundary segments per grid step (amortizes grid overhead;
# within a group each item is individually `pl.when`-predicated).
OBS_GROUP = 32
SEG_GROUP = 32

_HIGH = jax.lax.Precision.HIGHEST

# keep in lockstep with ops.search.SEG_CROSS_TOL (imported lazily to avoid
# a circular import at module load)
_TOL = 1e-4


def _pad_axis(arr, n, axis, mode="zero"):
    pad = n - arr.shape[axis]
    if pad <= 0:
        return arr
    if mode == "edge":
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(-1, None)
        tail = jnp.broadcast_to(
            arr[tuple(idx)],
            arr.shape[:axis] + (pad,) + arr.shape[axis + 1:],
        )
    else:
        tail = jnp.zeros(
            arr.shape[:axis] + (pad,) + arr.shape[axis + 1:], arr.dtype
        )
    return jnp.concatenate([arr, tail], axis=axis)


def _tile_bboxes(cx, cy, n_tiles, tile):
    """[n_tiles, 4] (minx, maxx, miny, maxy) over each candidate tile."""
    cxt = cx.reshape(cx.shape[0], n_tiles, tile)
    cyt = cy.reshape(cy.shape[0], n_tiles, tile)
    return jnp.stack(
        [
            jnp.min(cxt, axis=(0, 2)),
            jnp.max(cxt, axis=(0, 2)),
            jnp.min(cyt, axis=(0, 2)),
            jnp.max(cyt, axis=(0, 2)),
        ],
        axis=-1,
    )


def _bbox_overlap(tiles, boxes):
    """tiles [n_tiles, 4] x boxes [M, 4] -> [n_tiles, M] bool."""
    return (
        (tiles[:, None, 0] <= boxes[None, :, 1])
        & (tiles[:, None, 1] >= boxes[None, :, 0])
        & (tiles[:, None, 2] <= boxes[None, :, 3])
        & (tiles[:, None, 3] >= boxes[None, :, 2])
    )


def _pad_candidates(cx, cy, tile):
    """Pad [VA, C] candidate coords to ([VA_PAD*], [tile*]) multiples.

    The vertex rows pad by repeating the last row (degenerate zero axes
    never separate); the candidate columns pad by repeating the last
    column (keeps tile bounding boxes tight).
    """
    va = cx.shape[0]
    va_pad = max(VA_PAD, -(-va // VA_PAD) * VA_PAD)
    n_tiles = -(-cx.shape[1] // tile)
    c_pad = n_tiles * tile
    cx = _pad_axis(_pad_axis(cx, va_pad, 0, "edge"), c_pad, 1, "edge")
    cy = _pad_axis(_pad_axis(cy, va_pad, 0, "edge"), c_pad, 1, "edge")
    return cx, cy, n_tiles


# ---------------------------------------------------------------------------
# Precomputed obstacle / segment bundles (candidate-independent geometry)
# ---------------------------------------------------------------------------


class ObstaclesPre(NamedTuple):
    """SAT obstacle bundle; all fields [..., NO_pad, VO] / [..., NO_pad, 4].

    Vectorizes over arbitrary leading batch dims (e.g. Hp).
    """

    ox: jax.Array
    oy: jax.Array
    oax: jax.Array
    oay: jax.Array
    omn: jax.Array
    omx: jax.Array
    bbox: jax.Array          # [..., NO_pad, 4]
    mask: jax.Array          # [..., NO_pad] int32


def precompute_obstacles(obs_polys: jax.Array,
                         obs_mask: jax.Array) -> ObstaclesPre:
    """obs_polys [..., NO, VO, 2], obs_mask [..., NO] -> ObstaclesPre."""
    n_obs = obs_polys.shape[-3]
    no_pad = -(-n_obs // OBS_GROUP) * OBS_GROUP
    obs = _pad_axis(obs_polys, no_pad, axis=obs_polys.ndim - 3)
    mask = _pad_axis(obs_mask.astype(jnp.int32), no_pad,
                     axis=obs_mask.ndim - 1)
    edge = jnp.roll(obs, -1, axis=-2) - obs
    oaxes = jnp.stack([-edge[..., 1], edge[..., 0]], axis=-1)
    proj = jnp.einsum("...oad,...ovd->...oav", oaxes, obs, precision=_HIGH)
    bbox = jnp.stack(
        [
            jnp.min(obs[..., 0], axis=-1),
            jnp.max(obs[..., 0], axis=-1),
            jnp.min(obs[..., 1], axis=-1),
            jnp.max(obs[..., 1], axis=-1),
        ],
        axis=-1,
    )
    return ObstaclesPre(
        ox=obs[..., 0], oy=obs[..., 1],
        oax=oaxes[..., 0], oay=oaxes[..., 1],
        omn=jnp.min(proj, axis=-1), omx=jnp.max(proj, axis=-1),
        bbox=bbox, mask=mask,
    )


class SegmentsPre(NamedTuple):
    """Boundary segment bundle.

    ``packed`` [..., 8, S_pad] holds the five per-segment scalars on the
    SUBLANE dimension (rows: sx, sy, b1x, b1y, cb = b1 x s; rows 5-7 pad
    to one VPU register row). One packed array instead of five
    [..., S_pad, 1]-shaped fields: a trailing lane dim of 1 forces
    (8, 128)-tile staging with 128x padding — profiled as serialized
    multi-ms `slice-start` copies feeding the kernel (21% of cr20 device
    step time in the round-2 trace).
    """

    packed: jax.Array        # [..., 8, S_pad]
    bbox: jax.Array          # [..., S_pad, 4]
    mask: jax.Array          # [..., S_pad] int32


def precompute_segments(segments: jax.Array,
                        seg_mask: jax.Array) -> SegmentsPre:
    """segments [..., S, 2, 2], seg_mask [..., S] -> SegmentsPre."""
    s = segments.shape[-3]
    s_pad = -(-s // SEG_GROUP) * SEG_GROUP
    segs = _pad_axis(segments, s_pad, axis=segments.ndim - 3)
    mask = _pad_axis(seg_mask.astype(jnp.int32), s_pad,
                     axis=seg_mask.ndim - 1)
    b1 = segs[..., 0, :]
    b2 = segs[..., 1, :]
    sdir = b2 - b1
    cb = b1[..., 0] * sdir[..., 1] - b1[..., 1] * sdir[..., 0]
    zero = jnp.zeros_like(cb)
    packed = jnp.stack(
        [sdir[..., 0], sdir[..., 1], b1[..., 0], b1[..., 1], cb,
         zero, zero, zero],
        axis=-2,
    )                                                    # [..., 8, S_pad]
    bbox = jnp.stack(
        [
            jnp.minimum(b1[..., 0], b2[..., 0]),
            jnp.maximum(b1[..., 0], b2[..., 0]),
            jnp.minimum(b1[..., 1], b2[..., 1]),
            jnp.maximum(b1[..., 1], b2[..., 1]),
        ],
        axis=-1,
    )
    return SegmentsPre(packed=packed, bbox=bbox, mask=mask)


# ---------------------------------------------------------------------------
# SAT collision kernel
# ---------------------------------------------------------------------------


def _sat_kernel(ox_ref, oy_ref, oax_ref, oay_ref, omn_ref, omx_ref,
                cx_ref, cy_ref, fine_ref, gskip_ref, out_ref,
                ax_s, ay_s, mn_s, mx_s):
    """Grid step: candidate tile (program 0) vs one obstacle group.

    ox/oy/oax/oay/omn/omx: [G, VO] — group's vertices, edge axes, own-axis
    extents. cx/cy: [VA_PAD, T]. fine: [n_tiles, NO_pad] SMEM (full);
    gskip: [n_tiles, n_groups] SMEM (full).
    out: [1, T] int32, revisited across the group grid dimension.
    """
    i = pl.program_id(0)
    og = pl.program_id(1)
    vo = ox_ref.shape[1]

    @pl.when(og == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        cx = cx_ref[:]                                    # [VA_PAD, T]
        cy = cy_ref[:]
        va = cx.shape[0]
        ex = pltpu.roll(cx, cx.shape[0] - 1, axis=0) - cx
        ey = pltpu.roll(cy, cy.shape[0] - 1, axis=0) - cy
        ax = -ey
        ay = ex
        ax_s[...] = ax
        ay_s[...] = ay
        mn = jnp.full_like(cx, jnp.inf)
        mx = jnp.full_like(cx, -jnp.inf)
        for v in range(va):
            p = ax * cx[v][None, :] + ay * cy[v][None, :]
            mn = jnp.minimum(mn, p)
            mx = jnp.maximum(mx, p)
        mn_s[...] = mn
        mx_s[...] = mx

    @pl.when(gskip_ref[i, og] == 0)
    def _():
        cx = cx_ref[:]
        cy = cy_ref[:]
        ax = ax_s[:]
        ay = ay_s[:]
        mn_cc = mn_s[:]
        mx_cc = mx_s[:]
        for j in range(ox_ref.shape[0]):
            @pl.when(fine_ref[i, og * ox_ref.shape[0] + j] > 0)
            def _(j=j):
                # obstacle verts on candidate axes
                mn_ob = jnp.full_like(cx, jnp.inf)
                mx_ob = jnp.full_like(cx, -jnp.inf)
                for v in range(vo):
                    p = ax * ox_ref[j, v] + ay * oy_ref[j, v]
                    mn_ob = jnp.minimum(mn_ob, p)
                    mx_ob = jnp.maximum(mx_ob, p)
                sep = jnp.any(
                    (mn_cc - mx_ob > 0.0) | (mn_ob - mx_cc > 0.0),
                    axis=0, keepdims=True,
                )                                        # [1, T]
                # candidate verts on obstacle axes (own extents precomputed)
                for e in range(vo):
                    q = oax_ref[j, e] * cx + oay_ref[j, e] * cy
                    mn_q = jnp.min(q, axis=0, keepdims=True)
                    mx_q = jnp.max(q, axis=0, keepdims=True)
                    sep = sep | (omn_ref[j, e] - mx_q > 0.0) | (
                        mn_q - omx_ref[j, e] > 0.0
                    )
                out_ref[...] = out_ref[...] | (~sep).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sat_hits_pre(cx: jax.Array, cy: jax.Array, pre: ObstaclesPre,
                 interpret: bool = False) -> jax.Array:
    """SAT collision mask for kernel-native candidates.

    cx/cy: [VA, C] candidate vertex coords (vertex-major); pre: obstacle
    bundle from `precompute_obstacles` (no leading batch dims here — vmap
    for batching). Returns [C] bool.
    """
    c = cx.shape[1]
    cx, cy, n_tiles = _pad_candidates(cx, cy, SAT_TILE)
    va_pad, c_pad = cx.shape
    no_pad = pre.ox.shape[0]
    vo = pre.ox.shape[1]
    n_groups = no_pad // OBS_GROUP

    tiles = _tile_bboxes(cx, cy, n_tiles, SAT_TILE)
    fine = (_bbox_overlap(tiles, pre.bbox) & (pre.mask > 0)[None, :]).astype(
        jnp.int32
    )                                                    # [n_tiles, NO_pad]
    gskip = (
        ~jnp.any(fine.reshape(n_tiles, n_groups, OBS_GROUP) > 0, axis=-1)
    ).astype(jnp.int32)                                  # [n_tiles, n_groups]

    obs_spec = pl.BlockSpec((OBS_GROUP, vo), lambda i, o: (o, 0),
                            memory_space=pltpu.VMEM)
    cand_spec = pl.BlockSpec((va_pad, SAT_TILE), lambda i, o: (0, i),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _sat_kernel,
        grid=(n_tiles, n_groups),
        in_specs=[obs_spec] * 6 + [
            cand_spec, cand_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),       # fine (full)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # gskip (full)
        ],
        out_specs=pl.BlockSpec((1, SAT_TILE), lambda i, o: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, c_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((va_pad, SAT_TILE), jnp.float32),  # ax
            pltpu.VMEM((va_pad, SAT_TILE), jnp.float32),  # ay
            pltpu.VMEM((va_pad, SAT_TILE), jnp.float32),  # mn_cc
            pltpu.VMEM((va_pad, SAT_TILE), jnp.float32),  # mx_cc
        ],
        interpret=interpret,
    )(pre.ox, pre.oy, pre.oax, pre.oay, pre.omn, pre.omx,
      cx, cy, fine, gskip)
    return out[0, :c].astype(bool)


@functools.partial(jax.jit, static_argnames=("interpret",))
def candidate_collisions_pallas(man_polys: jax.Array, obs_polys: jax.Array,
                                obs_mask: jax.Array,
                                interpret: bool = False) -> jax.Array:
    """Pallas drop-in for ops.search.candidate_collisions.

    man_polys: [C, VA, 2]; obs_polys: [n_obs, VO, 2]; obs_mask: [n_obs].
    Returns [C] bool. (Compatibility wrapper — the planner uses
    `sat_hits_pre` with candidates already in kernel-native layout.)
    """
    cand = jnp.moveaxis(man_polys, 0, -1)                # [VA, 2, C]
    pre = precompute_obstacles(obs_polys, obs_mask)
    return sat_hits_pre(cand[:, 0, :], cand[:, 1, :], pre,
                        interpret=interpret)


# ---------------------------------------------------------------------------
# Lanelet-boundary crossing kernel
# ---------------------------------------------------------------------------


def _boundary_kernel(pk_ref, cx_ref, cy_ref, fine_ref, gskip_ref, out_ref,
                     ex_s, ey_s):
    """Grid step: candidate tile (program 0) vs one segment group.

    pk: [8, S_pad] packed per-segment scalars in SMEM (rows: sx, sy,
    b1x, b1y, cb = b1 x s) — they are consumed as broadcast scalars, and
    SMEM natively supports the dynamic per-segment indexing (a VMEM
    block would need a 128-aligned lane index Mosaic cannot prove);
    cx/cy: [VA_PAD, T] candidate verts; fine: [n_tiles, S_pad] SMEM
    (full); gskip: [n_tiles, n_groups] SMEM (full); out: [1, T] int32.

    Division-free segment intersection: with d = r x s, A = (b1 - a1) x s,
    B = (b1 - a1) x r, the segments cross iff |d| >= eps and A/d, B/d are
    both in [-TOL, 1+TOL] — the SAME robust predicate as the XLA path
    (ops.search._segment_cross_predicate); the tolerance keeps exact-touch
    decisions identical across backends (see SEG_CROSS_TOL there).
    """
    i = pl.program_id(0)
    og = pl.program_id(1)
    g = pk_ref.shape[1] // gskip_ref.shape[1]

    @pl.when(og == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        cx = cx_ref[:]
        cy = cy_ref[:]
        ex_s[...] = pltpu.roll(cx, cx.shape[0] - 1, axis=0) - cx
        ey_s[...] = pltpu.roll(cy, cy.shape[0] - 1, axis=0) - cy

    @pl.when(gskip_ref[i, og] == 0)
    def _():
        a1x = cx_ref[:]                                  # [VA_PAD, T]
        a1y = cy_ref[:]
        ex = ex_s[:]
        ey = ey_s[:]
        for j in range(g):
            @pl.when(fine_ref[i, og * g + j] > 0)
            def _(j=j):
                sx = pk_ref[0, og * g + j]
                sy = pk_ref[1, og * g + j]
                d = ex * sy - ey * sx                    # r x s   [VA, T]
                a_num = pk_ref[4, og * g + j] - (
                    a1x * sy - a1y * sx
                )                                        # qp x s
                b_num = (pk_ref[2, og * g + j] - a1x) * ey - (
                    pk_ref[3, og * g + j] - a1y
                ) * ex                                   # qp x r
                ad = jnp.abs(d)
                t_lim = _TOL * d * d
                m_lim = ad * (1.0 + _TOL)
                crossed = (
                    (ad >= 1e-9)
                    & (a_num * d >= -t_lim) & (jnp.abs(a_num) <= m_lim)
                    & (b_num * d >= -t_lim) & (jnp.abs(b_num) <= m_lim)
                )
                hit = jnp.any(crossed, axis=0, keepdims=True)  # [1, T]
                out_ref[...] = out_ref[...] | hit.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def boundary_hits_pre(cx: jax.Array, cy: jax.Array, pre: SegmentsPre,
                      interpret: bool = False) -> jax.Array:
    """Boundary-crossing mask for kernel-native candidates.

    cx/cy: [VA, C] candidate vertex coords; pre: segment bundle from
    `precompute_segments` (unbatched — vmap for batching). Returns [C] bool.
    """
    c = cx.shape[1]
    cx, cy, n_tiles = _pad_candidates(cx, cy, SEG_TILE)
    va_pad, c_pad = cx.shape
    s_pad = pre.packed.shape[-1]
    n_groups = s_pad // SEG_GROUP

    tiles = _tile_bboxes(cx, cy, n_tiles, SEG_TILE)
    fine = (_bbox_overlap(tiles, pre.bbox) & (pre.mask > 0)[None, :]).astype(
        jnp.int32
    )
    gskip = (
        ~jnp.any(fine.reshape(n_tiles, n_groups, SEG_GROUP) > 0, axis=-1)
    ).astype(jnp.int32)

    seg_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    cand_spec = pl.BlockSpec((va_pad, SEG_TILE), lambda i, o: (0, i),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _boundary_kernel,
        grid=(n_tiles, n_groups),
        in_specs=[seg_spec] + [
            cand_spec, cand_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),       # fine (full)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # gskip (full)
        ],
        out_specs=pl.BlockSpec((1, SEG_TILE), lambda i, o: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, c_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((va_pad, SEG_TILE), jnp.float32),  # ex
            pltpu.VMEM((va_pad, SEG_TILE), jnp.float32),  # ey
        ],
        interpret=interpret,
    )(pre.packed, cx, cy, fine, gskip)
    return out[0, :c].astype(bool)


# ---------------------------------------------------------------------------
# Polygon-outline crossing kernel (the InterX-equivalent non-convex check)
# ---------------------------------------------------------------------------

# Obstacles per outline grid step: each obstacle unrolls VO edges, so the
# group is smaller than OBS_GROUP to keep the kernel body compact.
OUTLINE_GROUP = 8


class OutlinePre(NamedTuple):
    """Outline obstacle bundle for `outline_hits_pre`.

    ox/oy: [..., NO_pad, VO] vertex coords; edge_ok: [..., NO_pad, VO]
    int32, 1 where the edge (v -> v+1 cyclic) is non-degenerate AND the
    obstacle is active — padded repeated-vertex edges are skipped instead
    of computed (they are inert in the crossing predicate either way, but
    polygons padded to VO=16 carry ~10 degenerate edges each).
    """

    ox: jax.Array
    oy: jax.Array
    edge_ok: jax.Array
    bbox: jax.Array          # [..., NO_pad, 4]
    mask: jax.Array          # [..., NO_pad] int32


def precompute_outline(obs_polys: jax.Array,
                       obs_mask: jax.Array) -> OutlinePre:
    """obs_polys [..., NO, VO, 2], obs_mask [..., NO] -> OutlinePre."""
    n_obs = obs_polys.shape[-3]
    no_pad = -(-n_obs // OUTLINE_GROUP) * OUTLINE_GROUP
    obs = _pad_axis(obs_polys, no_pad, axis=obs_polys.ndim - 3)
    mask = _pad_axis(obs_mask.astype(jnp.int32), no_pad,
                     axis=obs_mask.ndim - 1)
    nxt = jnp.roll(obs, -1, axis=-2)
    edge_ok = (
        (jnp.abs(nxt - obs).sum(axis=-1) > 0.0)
        & (mask > 0)[..., None]
    ).astype(jnp.int32)
    bbox = jnp.stack(
        [
            jnp.min(obs[..., 0], axis=-1),
            jnp.max(obs[..., 0], axis=-1),
            jnp.min(obs[..., 1], axis=-1),
            jnp.max(obs[..., 1], axis=-1),
        ],
        axis=-1,
    )
    return OutlinePre(ox=obs[..., 0], oy=obs[..., 1], edge_ok=edge_ok,
                      bbox=bbox, mask=mask)


def _outline_kernel(ox_ref, oy_ref, cx_ref, cy_ref, eok_ref, fine_ref,
                    gskip_ref, out_ref, ex_s, ey_s):
    """Grid step: candidate tile (program 0) vs one obstacle group.

    ox/oy: [G, VO] obstacle vertices; cx/cy: [VA_PAD, T] candidate verts;
    eok: [NO_pad, VO] SMEM per-edge validity (full); fine: [n_tiles,
    NO_pad] SMEM; gskip: [n_tiles, n_groups] SMEM; out: [1, T] int32.

    A candidate collides iff any of its edges crosses any obstacle edge —
    InterX semantics on the natural polygon rings, with NO segment
    explosion: staging stays [G, VO]-shaped like the SAT kernel, and
    bbox/fine skipping is per OBSTACLE (sparse far-field work), not per
    exploded segment. The crossing predicate is the identical robust
    division-free form used by the XLA path and the boundary kernel
    (ops.search._segment_cross_predicate; see SEG_CROSS_TOL there).
    """
    i = pl.program_id(0)
    og = pl.program_id(1)
    vo = ox_ref.shape[1]

    @pl.when(og == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        cx = cx_ref[:]
        cy = cy_ref[:]
        ex_s[...] = pltpu.roll(cx, cx.shape[0] - 1, axis=0) - cx
        ey_s[...] = pltpu.roll(cy, cy.shape[0] - 1, axis=0) - cy

    @pl.when(gskip_ref[i, og] == 0)
    def _():
        a1x = cx_ref[:]                                  # [VA_PAD, T]
        a1y = cy_ref[:]
        ex = ex_s[:]
        ey = ey_s[:]
        for j in range(ox_ref.shape[0]):
            @pl.when(fine_ref[i, og * ox_ref.shape[0] + j] > 0)
            def _(j=j):
                hit = jnp.zeros_like(out_ref)
                for e in range(vo):
                    b1x = ox_ref[j, e]
                    b1y = oy_ref[j, e]
                    sx = ox_ref[j, (e + 1) % vo] - b1x
                    sy = oy_ref[j, (e + 1) % vo] - b1y
                    d = ex * sy - ey * sx                # r x s   [VA, T]
                    a_num = (b1x * sy - b1y * sx) - (a1x * sy - a1y * sx)
                    b_num = (b1x - a1x) * ey - (b1y - a1y) * ex
                    ad = jnp.abs(d)
                    t_lim = _TOL * d * d
                    m_lim = ad * (1.0 + _TOL)
                    crossed = (
                        (ad >= 1e-9)
                        & (a_num * d >= -t_lim) & (jnp.abs(a_num) <= m_lim)
                        & (b_num * d >= -t_lim) & (jnp.abs(b_num) <= m_lim)
                    ) & (eok_ref[og * ox_ref.shape[0] + j, e] > 0)
                    hit = hit | jnp.any(
                        crossed, axis=0, keepdims=True
                    ).astype(jnp.int32)                  # [1, T]
                out_ref[...] = out_ref[...] | hit


@functools.partial(jax.jit, static_argnames=("interpret",))
def outline_hits_pre(cx: jax.Array, cy: jax.Array, pre: OutlinePre,
                     interpret: bool = False) -> jax.Array:
    """Outline-crossing mask for kernel-native candidates.

    cx/cy: [VA, C] candidate vertex coords; pre: bundle from
    `precompute_outline` (unbatched — vmap for batching). Returns [C]
    bool: candidate outline crosses an active obstacle outline.
    """
    c = cx.shape[1]
    cx, cy, n_tiles = _pad_candidates(cx, cy, SEG_TILE)
    va_pad, c_pad = cx.shape
    no_pad = pre.ox.shape[0]
    vo = pre.ox.shape[1]
    n_groups = no_pad // OUTLINE_GROUP

    tiles = _tile_bboxes(cx, cy, n_tiles, SEG_TILE)
    fine = (_bbox_overlap(tiles, pre.bbox) & (pre.mask > 0)[None, :]).astype(
        jnp.int32
    )
    gskip = (
        ~jnp.any(fine.reshape(n_tiles, n_groups, OUTLINE_GROUP) > 0, axis=-1)
    ).astype(jnp.int32)

    obs_spec = pl.BlockSpec((OUTLINE_GROUP, vo), lambda i, o: (o, 0),
                            memory_space=pltpu.VMEM)
    cand_spec = pl.BlockSpec((va_pad, SEG_TILE), lambda i, o: (0, i),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _outline_kernel,
        grid=(n_tiles, n_groups),
        in_specs=[obs_spec, obs_spec] + [
            cand_spec, cand_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),       # edge_ok (full)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # fine (full)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # gskip (full)
        ],
        out_specs=pl.BlockSpec((1, SEG_TILE), lambda i, o: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, c_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((va_pad, SEG_TILE), jnp.float32),  # ex
            pltpu.VMEM((va_pad, SEG_TILE), jnp.float32),  # ey
        ],
        interpret=interpret,
    )(pre.ox, pre.oy, cx, cy, pre.edge_ok, fine, gskip)
    return out[0, :c].astype(bool)


@functools.partial(jax.jit, static_argnames=("interpret",))
def candidate_boundary_crossings_pallas(
    man_polys: jax.Array,           # [C, VA, 2]
    segments: jax.Array,            # [S, 2, 2]
    seg_mask: jax.Array,            # [S]
    interpret: bool = False,
) -> jax.Array:
    """Pallas drop-in for ops.search.candidate_boundary_violations.

    (Compatibility wrapper — the planner uses `boundary_hits_pre`.)
    """
    cand = jnp.moveaxis(man_polys, 0, -1)                # [VA, 2, C]
    pre = precompute_segments(segments, seg_mask)
    return boundary_hits_pre(cand[:, 0, :], cand[:, 1, :], pre,
                             interpret=interpret)
