"""Centralized joint trajectory search over the multi-vehicle trim product.

TPU-native re-design of the reference's centralized planning
(hlc/controller/centralized/CentralizedController.m + expand_node.m:15-27 +
MotionPrimitiveAutomaton.trim_tuple): one A* over the Cartesian product of
all vehicles' trim lattices, re-expressed as a layered beam search whose
expansion enumerates all ``n_trims^N`` joint successor tuples per beam node
(masked by per-vehicle transition feasibility and pairwise collision
checks). Exponential in N like the reference — the centralized mode is the
small-fleet baseline (the reference's eval only uses it for tiny N).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pdmpc_tpu.models.mpa import MpaTensors
from pdmpc_tpu.ops.search import (
    Obstacles,
    _sat_separates_batch,
    candidate_boundary_violations,
    pad_polys_to_vo,
)


class JointPlanResult(NamedTuple):
    trims: jax.Array        # [Hp, N] i32
    poses: jax.Array        # [Hp, N, 3] f32
    shapes: jax.Array       # [Hp, N, VA, 2] f32
    cost: jax.Array         # [] f32
    is_exhausted: jax.Array  # [] bool
    n_expanded: jax.Array   # [] i32


def plan_centralized(
    mpa: MpaTensors,
    x0: jax.Array,           # [N, 3]
    trim0: jax.Array,        # [N] i32
    ref_points: jax.Array,   # [N, Hp, 2]
    v_ref: jax.Array,        # [N, Hp]
    dt: float,
    beam_width: int,
    obstacles: Obstacles | None = None,
    boundary_segments: jax.Array | None = None,   # [N, S, 2, 2]
    boundary_mask: jax.Array | None = None,       # [N, S]
) -> JointPlanResult:
    """Joint plan for all vehicles (no coupling graph, no fallback).

    The joint search applies the same edge evaluation as the prioritized
    one (are_constraints_satisfied_sat.m:1-68): pairwise vehicle collisions
    within a candidate tuple, static/dynamic obstacle polygons
    (``obstacles``, shared by all vehicles), and per-vehicle lanelet
    boundary segments (``boundary_segments``) checked against the
    without-offset swept areas (large offset at the final step,
    GraphSearch.m:166-174).
    """
    n_veh = x0.shape[0]
    n = mpa.n_trims
    hp = mpa.Hp
    b = beam_width
    va = mpa.area.shape[-2]
    t_total = n**n_veh
    if t_total * beam_width > 8_000_000:
        raise ValueError(
            f"centralized product space too large: {n}^{n_veh} tuples x "
            f"beam {beam_width}"
        )

    # decode joint tuple index -> per-vehicle trims [T, N]
    tuple_idx = jnp.arange(t_total, dtype=jnp.int32)
    decode = jnp.stack(
        [(tuple_idx // (n**v)) % n for v in range(n_veh)], axis=-1
    )                                                   # [T, N]

    pose0 = jnp.tile(x0[None], (b, 1, 1))               # [B, N, 3]
    trims0 = jnp.tile(trim0[None], (b, 1)).astype(jnp.int32)
    g0 = jnp.zeros((b,))
    valid0 = jnp.zeros((b,), dtype=bool).at[0].set(True)

    check_obstacles = obstacles is not None
    check_boundary = boundary_segments is not None
    if check_obstacles:
        obs_polys_by_step = jnp.moveaxis(obstacles.polys, 1, 0)
        obs_mask_by_step = jnp.moveaxis(obstacles.mask, 1, 0)
    else:  # dummy scan inputs with a unit obstacle axis
        obs_polys_by_step = jnp.zeros((hp, 1, 1, 2))
        obs_mask_by_step = jnp.zeros((hp, 1), dtype=bool)

    def layer(carry, xs):
        pose, trim, g, valid, n_expanded = carry
        k, trans_k, obs_k, obs_mask_k = xs

        # per-vehicle successor feasibility for all tuples
        allowed_vt = trans_k[trim]                      # [B, N, n]
        allowed = jnp.all(
            _gather_allowed(allowed_vt, decode), axis=-1
        )                                               # [B, T]

        c = jnp.cos(pose[..., 2])                       # [B, N]
        s = jnp.sin(pose[..., 2])
        mdx = _gather_maneuver(mpa.dx, trim, decode)    # [B, T, N]
        mdy = _gather_maneuver(mpa.dy, trim, decode)
        mdyaw = _gather_maneuver(mpa.dyaw, trim, decode)
        child_x = c[:, None] * mdx - s[:, None] * mdy + pose[:, None, :, 0]
        child_y = s[:, None] * mdx + c[:, None] * mdy + pose[:, None, :, 1]
        child_yaw = pose[:, None, :, 2] + mdyaw         # [B, T, N]

        # cost: sum over vehicles (expand_node.m:61-73)
        dxr = child_x - ref_points[None, None, :, k, 0]
        dyr = child_y - ref_points[None, None, :, k, 1]
        g_child = g[:, None] + jnp.sum(dxr**2 + dyr**2, axis=-1)

        steps = jnp.arange(hp)
        future = steps > k                              # [Hp]
        dvmax = jnp.where(future[None, :], dt * v_ref, 0.0)  # [N, Hp]
        d_max = jnp.cumsum(dvmax, axis=-1)              # [N, Hp]
        dist = jnp.sqrt(
            (child_x[..., None] - ref_points[None, None, :, :, 0]) ** 2
            + (child_y[..., None] - ref_points[None, None, :, :, 1]) ** 2
        )                                               # [B, T, N, Hp]
        short = jnp.maximum(0.0, dist - d_max[None, None])
        h_child = jnp.sum(
            jnp.where(future[None, None, None], short**2, 0.0),
            axis=(-1, -2),
        )

        # pairwise collision among vehicles' swept areas within a candidate
        areas = _gather_areas(mpa.area, trim, decode)   # [B, T, N, VA, 2]
        ax = (
            c[:, None, :, None] * areas[..., 0]
            - s[:, None, :, None] * areas[..., 1]
            + pose[:, None, :, None, 0]
        )
        ay = (
            s[:, None, :, None] * areas[..., 0]
            + c[:, None, :, None] * areas[..., 1]
            + pose[:, None, :, None, 1]
        )
        world = jnp.stack([ax, ay], axis=-1)            # [B, T, N, VA, 2]

        collide = jnp.zeros(allowed.shape, dtype=bool)
        for i in range(n_veh):
            for j in range(i + 1, n_veh):
                sep = _sat_separates_batch(world[:, :, i], world[:, :, j])
                collide = collide | ~sep

        if check_obstacles:
            # every vehicle's swept area vs every active obstacle polygon
            # at this step (are_constraints_satisfied_sat.m:15-35)
            sep_o = _sat_separates_batch(
                world[:, :, :, None], obs_k[None, None, None]
            )                                           # [B, T, N, n_obs]
            collide = collide | jnp.any(
                ~sep_o & obs_mask_k[None, None, None, :], axis=(-1, -2)
            )

        if check_boundary:
            # without-offset swept areas, large offset at the final step
            areas_b = jnp.where(
                k == hp - 1,
                _gather_areas(mpa.area_large_offset, trim, decode),
                _gather_areas(mpa.area_no_offset, trim, decode),
            )
            bx = (
                c[:, None, :, None] * areas_b[..., 0]
                - s[:, None, :, None] * areas_b[..., 1]
                + pose[:, None, :, None, 0]
            )
            by = (
                s[:, None, :, None] * areas_b[..., 0]
                + c[:, None, :, None] * areas_b[..., 1]
                + pose[:, None, :, None, 1]
            )
            world_b = jnp.stack([bx, by], axis=-1)      # [B, T, N, VA, 2]
            for i in range(n_veh):
                cross = candidate_boundary_violations(
                    world_b[:, :, i].reshape(b * t_total, va, 2),
                    boundary_segments[i], boundary_mask[i],
                )
                collide = collide | cross.reshape(b, t_total)

        feasible = valid[:, None] & allowed & ~collide  # [B, T]
        n_expanded = n_expanded + jnp.sum(feasible)

        score = jnp.where(feasible, g_child + h_child, jnp.inf)
        neg_top, flat_idx = jax.lax.top_k(
            -score.reshape(b * t_total), b
        )
        parent = flat_idx // t_total
        tup = flat_idx % t_total
        new_valid = neg_top > -jnp.inf
        new_trim = decode[tup]                          # [B, N]
        new_pose = jnp.stack(
            [
                child_x.reshape(b * t_total, n_veh)[flat_idx],
                child_y.reshape(b * t_total, n_veh)[flat_idx],
                child_yaw.reshape(b * t_total, n_veh)[flat_idx],
            ],
            axis=-1,
        )
        new_g = g_child.reshape(-1)[flat_idx]
        out = (new_pose, new_trim, parent, new_valid)
        return (new_pose, new_trim, new_g, new_valid, n_expanded), out

    ks = jnp.arange(hp)
    (pose_f, trim_f, g_f, valid_f, n_expanded), layers = jax.lax.scan(
        layer,
        (pose0, trims0, g0, valid0, jnp.array(0, dtype=jnp.int32)),
        (ks, mpa.transition, obs_polys_by_step, obs_mask_by_step),
    )
    del pose_f, trim_f
    poses_l, trims_l, parents_l, _ = layers

    leaf_score = jnp.where(valid_f, g_f, jnp.inf)
    best = jnp.argmin(leaf_score)
    is_exhausted = ~jnp.any(valid_f)
    cost = leaf_score[best]

    def back(i, carry):
        idx, trims, poses = carry
        layer_i = hp - 1 - i
        trims = trims.at[layer_i].set(trims_l[layer_i, idx])
        poses = poses.at[layer_i].set(poses_l[layer_i, idx])
        return (parents_l[layer_i, idx], trims, poses)

    _, trims_path, poses_path = jax.lax.fori_loop(
        0, hp, back,
        (best, jnp.zeros((hp, n_veh), dtype=jnp.int32),
         jnp.zeros((hp, n_veh, 3))),
    )

    parent_poses = jnp.concatenate([x0[None], poses_path[:-1]], axis=0)
    parent_trims = jnp.concatenate(
        [trim0[None].astype(jnp.int32), trims_path[:-1]], axis=0
    )
    areas = mpa.area[parent_trims, trims_path]          # [Hp, N, VA, 2]
    cps = jnp.cos(parent_poses[..., 2])[..., None]
    sps = jnp.sin(parent_poses[..., 2])[..., None]
    sx = cps * areas[..., 0] - sps * areas[..., 1] + parent_poses[..., 0:1]
    sy = sps * areas[..., 0] + cps * areas[..., 1] + parent_poses[..., 1:2]
    shapes = jnp.stack([sx, sy], axis=-1)

    return JointPlanResult(
        trims=trims_path,
        poses=poses_path,
        shapes=shapes,
        cost=cost,
        is_exhausted=is_exhausted,
        n_expanded=n_expanded,
    )


def _gather_allowed(allowed_vt, decode):
    """allowed_vt: [B, N, n]; decode: [T, N] -> [B, T, N] bool."""
    return jax.vmap(  # over B
        lambda av: jax.vmap(  # over T
            lambda tup: av[jnp.arange(av.shape[0]), tup]
        )(decode)
    )(allowed_vt)


def _gather_maneuver(table, trim, decode):
    """table: [n, n]; trim: [B, N]; decode: [T, N] -> [B, T, N]."""
    return jax.vmap(
        lambda tr: jax.vmap(lambda tup: table[tr, tup])(decode)
    )(trim)


def _gather_areas(table, trim, decode):
    """table: [n, n, VA, 2]; -> [B, T, N, VA, 2]."""
    return jax.vmap(
        lambda tr: jax.vmap(lambda tup: table[tr, tup])(decode)
    )(trim)
