"""Pallas TPU kernel for the batched SAT collision mask — the hot op.

The framework's inner loop checks every (candidate swept area x obstacle)
pair with the separating-axis theorem (the eval_edge_exact capability,
GraphSearch.m:111-196 / intersect_sat.m). The XLA formulation materializes
the projection tensor ``[candidates, obstacles, axes, vertices]`` in HBM —
15 GB for a 32-scenario x 20-vehicle batch — because the min/max reduction
cannot fuse into the dot_general.

Kernel design:
- grid = (candidate tiles, obstacles): the hit-mask output block for a tile
  is revisited across the obstacle dimension (innermost), so it stays
  resident in VMEM and accumulates; candidate coordinates are laid out
  vertex-major with the candidate index on the lane dimension.
- no dynamic indexing: each grid step's obstacle row is delivered by the
  BlockSpec index map.
- every vector intermediate is 2D ([VA, T] or [1, T]); vertex loops are
  statically unrolled (VA, VO <= 16).

HBM traffic: candidate polygons in, one int32 mask out.

Axis normalization is dropped: scaling an axis never changes the sign of a
separation, so the boolean result matches intersect_sat.m exactly
(degenerate padded edges give zero axes which never separate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Candidates per kernel instance (lane dimension).
TILE = 512


def _sat_hits_kernel(cx_ref, cy_ref, ox_ref, oy_ref, mask_ref, out_ref):
    """Grid step: candidate tile (program 0) vs one obstacle (program 1).

    cx/cy: [VA, T]; ox/oy: [1, VO]; mask: [1, 1] int32; out: [1, T] int32
    (revisited across the obstacle grid dimension).
    """
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    cx = cx_ref[:]                                   # [VA, T]
    cy = cy_ref[:]
    va = cx.shape[0]
    t = cx.shape[1]
    n_obs_pad, vo = ox_ref.shape

    # select this grid step's obstacle row by one-hot contraction (dynamic
    # VMEM indexing is fragile in Mosaic; this is a tiny [n_obs, VO] op)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (n_obs_pad, 1), 0) == o
    ).astype(cx.dtype)                               # [n_obs, 1]
    ox_row = jnp.sum(ox_ref[:] * sel, axis=0, keepdims=True)   # [1, VO]
    oy_row = jnp.sum(oy_ref[:] * sel, axis=0, keepdims=True)
    mask_val = jnp.sum(mask_ref[:].astype(cx.dtype) * sel) > 0.5

    # candidate edge axes (unnormalized): a = (-ey, ex)
    ex = jnp.roll(cx, -1, axis=0) - cx               # [VA, T]
    ey = jnp.roll(cy, -1, axis=0) - cy
    ax, ay = -ey, ex

    # candidate self-projections on own axes: min/max over VA verts
    min_cc = jnp.full((va, t), jnp.inf)
    max_cc = jnp.full((va, t), -jnp.inf)
    for v in range(va):
        p = ax * cx[v][None, :] + ay * cy[v][None, :]   # [VA, T]
        min_cc = jnp.minimum(min_cc, p)
        max_cc = jnp.maximum(max_cc, p)

    # --- obstacle verts on candidate axes -----------------------------
    min_ob = jnp.full((va, t), jnp.inf)
    max_ob = jnp.full((va, t), -jnp.inf)
    for v in range(vo):
        p = ax * ox_row[0, v] + ay * oy_row[0, v]    # [VA, T]
        min_ob = jnp.minimum(min_ob, p)
        max_ob = jnp.maximum(max_ob, p)
    sep = jnp.any(
        (min_cc - max_ob > 0.0) | (min_ob - max_cc > 0.0),
        axis=0, keepdims=True,
    )                                                # [1, T]

    # --- candidate verts on obstacle axes -----------------------------
    for e in range(vo):
        e2 = (e + 1) % vo
        oax = -(oy_row[0, e2] - oy_row[0, e])        # scalar
        oay = ox_row[0, e2] - ox_row[0, e]
        # obstacle self-projection extent on this axis (scalars)
        min_oo = jnp.inf
        max_oo = -jnp.inf
        for v in range(vo):
            pv = oax * ox_row[0, v] + oay * oy_row[0, v]
            min_oo = jnp.minimum(min_oo, pv)
            max_oo = jnp.maximum(max_oo, pv)
        # candidate extent on this axis
        q = oax * cx + oay * cy                      # [VA, T]
        min_co = jnp.min(q, axis=0, keepdims=True)   # [1, T]
        max_co = jnp.max(q, axis=0, keepdims=True)
        sep = sep | (min_oo - max_co > 0.0) | (min_co - max_oo > 0.0)

    collide = ~sep                                   # [1, T]
    out_ref[...] = out_ref[...] | (
        collide & mask_val
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def candidate_collisions_pallas(man_polys: jax.Array, obs_polys: jax.Array,
                                obs_mask: jax.Array,
                                interpret: bool = False) -> jax.Array:
    """Pallas drop-in for ops.search.candidate_collisions.

    man_polys: [C, VA, 2]; obs_polys: [n_obs, VO, 2]; obs_mask: [n_obs].
    Returns [C] bool.
    """
    c, va = man_polys.shape[0], man_polys.shape[1]
    n_obs, vo = obs_polys.shape[0], obs_polys.shape[1]

    n_tiles = -(-c // TILE)
    c_pad = n_tiles * TILE
    # vertex-major candidate layout: lane dim = candidate index
    cand = jnp.moveaxis(man_polys, 0, -1)            # [VA, 2, C]
    if c_pad != c:
        cand = jnp.pad(cand, ((0, 0), (0, 0), (0, c_pad - c)))
    cx = cand[:, 0, :]                               # [VA, C_pad]
    cy = cand[:, 1, :]

    # pad obstacles to a sublane-aligned count; whole-array blocks
    n_obs_pad = max(8, -(-n_obs // 8) * 8)
    ox = obs_polys[..., 0]                           # [n_obs, VO]
    oy = obs_polys[..., 1]
    if n_obs_pad != n_obs:
        ox = jnp.pad(ox, ((0, n_obs_pad - n_obs), (0, 0)))
        oy = jnp.pad(oy, ((0, n_obs_pad - n_obs), (0, 0)))
        obs_mask = jnp.pad(obs_mask, (0, n_obs_pad - n_obs))
    mask_i32 = obs_mask.astype(jnp.int32)[:, None]   # [n_obs_pad, 1]

    out = pl.pallas_call(
        _sat_hits_kernel,
        grid=(n_tiles, n_obs),
        in_specs=[
            pl.BlockSpec((va, TILE), lambda i, o: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((va, TILE), lambda i, o: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_obs_pad, vo), lambda i, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_obs_pad, vo), lambda i, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_obs_pad, 1), lambda i, o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i, o: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, c_pad), jnp.int32),
        interpret=interpret,
    )(cx, cy, ox, oy, mask_i32)
    return out[0, :c].astype(bool)
