"""Fixed-shape batched geometry kernels (JAX/jnp).

TPU-native re-design of the reference's polygon geometry:

- ``sat_collide``     <- hlc/optimizer/graph_search/intersect_sat.m (SAT for
                         convex polygons, vectorized over batch dims)
- ``segments_intersect_any`` <- hlc/optimizer/graph_search/InterX.m (vectorized
                         curve-curve intersection test)
- ``convex_intersection_area`` <- polyshape intersect + area as used by
                         ReachableSetCoupler.m:39-45
- ``outer_poly_approx`` <- replaces polyshape union/convhull of offline
                         reachability (MotionPrimitiveAutomaton.m:252-647) with
                         a K-direction outer (conservative) approximation
- ``rot_translate``   <- utility/translate_global.m
- ``transformed_rectangle`` <- visualization/transformed_rectangle.m /
                         hlc/controller/common/get_occupied_areas.m
- ``project_to_polyline`` / ``sample_path_at_arclength`` <-
                         hlc/controller/common/get_arc_distance_to_endpoint.m
                         and sample_reference_trajectory.m, reformulated as a
                         static-shape arc-length parameterization.

Conventions:
- A polygon is ``[V, 2]`` float32, convex, counter-clockwise, *padded by
  repeating the last valid vertex*. Repeated vertices create zero-length
  edges, which every kernel here treats as degenerate-safe (zero axes never
  separate in SAT; zero-length segments never intersect).
- Leading batch dimensions are handled with ``jax.vmap`` by callers; kernels
  are written for a single geometric object unless stated otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def rot_translate(dyaw, dx, dy, xs, ys):
    """Rotate by dyaw then translate by (dx, dy). Reference: translate_global.m."""
    c, s = jnp.cos(dyaw), jnp.sin(dyaw)
    return c * xs - s * ys + dx, s * xs + c * ys + dy


def transform_polygon(poly, x, y, yaw):
    """Rigid transform of polygon(s) ``[..., V, 2]`` by pose scalar(s)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    px, py = poly[..., 0], poly[..., 1]
    return jnp.stack(
        [c * px - s * py + x, s * px + c * py + y], axis=-1
    )


def transformed_rectangle(x, y, yaw, length, width):
    """Rectangle [4, 2] centered at (x, y) rotated by yaw (CCW order)."""
    hx, hy = length / 2.0, width / 2.0
    local = jnp.array(
        [[-hx, -hy], [hx, -hy], [hx, hy], [-hx, hy]], dtype=jnp.float32
    )
    return transform_polygon(local, x, y, yaw)


def polygon_area(poly, mask=None):
    """Shoelace area of polygon [V, 2]; ``mask`` [V] marks valid vertices.

    Invalid vertices must be duplicates of the last valid vertex (our padding
    convention), in which case they contribute zero to the sum and the result
    is exact without masking. ``mask`` is accepted for arbitrary padding.
    """
    if mask is not None:
        last_valid = jnp.argmax(
            jnp.where(mask, jnp.arange(poly.shape[0]), -1)
        )
        poly = jnp.where(mask[:, None], poly, poly[last_valid][None, :])
    x, y = poly[..., 0], poly[..., 1]
    xn, yn = jnp.roll(x, -1, axis=-1), jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.abs(jnp.sum(x * yn - xn * y, axis=-1))


def _sat_half(a, b):
    """Check separation of b from a using a's edge normals.

    a: [VA, 2], b: [VB, 2]. Returns True if some axis of ``a`` separates.
    Degenerate (zero) edges yield zero axes that never separate.
    Reference: intersect_sat.m:17-42.
    """
    edges = jnp.roll(a, -1, axis=0) - a              # [VA, 2]
    axes = jnp.stack([-edges[:, 1], edges[:, 0]], axis=-1)
    norm = jnp.linalg.norm(axes, axis=-1, keepdims=True)
    axes = axes / jnp.maximum(norm, _EPS)            # zero axes stay zero
    # f32 MXU accumulation: the TPU default feeds bf16 into the MXU, and
    # ~cm-scale projection error flips separation decisions (same class as
    # the search-side SAT einsum, ops/search.py:86-93)
    pa = jnp.matmul(axes, a.T,
                    precision=jax.lax.Precision.HIGHEST)  # [VA, VA]
    pb = jnp.matmul(axes, b.T,
                    precision=jax.lax.Precision.HIGHEST)  # [VA, VB]
    d1 = jnp.min(pa, axis=1) - jnp.max(pb, axis=1)
    d2 = jnp.min(pb, axis=1) - jnp.max(pa, axis=1)
    return jnp.any(d1 > 0) | jnp.any(d2 > 0)


def sat_collide(a, b):
    """True iff convex polygons a [VA,2] and b [VB,2] overlap (SAT).

    Matches the reference semantics (touching counts as collision since the
    separation test is strict). Reference: intersect_sat.m.
    """
    return ~(_sat_half(a, b) | _sat_half(b, a))


# Batched variant: many polygons vs many polygons -> [NA, NB] bool.
sat_collide_pairwise = jax.vmap(
    jax.vmap(sat_collide, in_axes=(None, 0)), in_axes=(0, None)
)


def point_in_convex(p, poly):
    """True if point ``p`` [2] is inside convex polygon [V, 2].

    Orientation-agnostic (the reference's maneuver polygons are clockwise,
    generate_maneuver.m:75, while our outer approximations are CCW).
    Degenerate repeated vertices give zero cross products and are harmless.
    """
    edges = jnp.roll(poly, -1, axis=0) - poly
    rel = p[None, :] - poly
    cross = edges[:, 0] * rel[:, 1] - edges[:, 1] * rel[:, 0]
    # boundary tolerance: points on the hull boundary (float32) count inside
    tol = 1e-6
    return jnp.all(cross >= -tol) | jnp.all(cross <= tol)


def _segment_intersection(p1, p2, q1, q2):
    """Intersection of segments p1-p2 and q1-q2.

    Returns (valid, point). Degenerate zero-length segments are invalid.
    """
    r = p2 - p1
    s = q2 - q1
    denom = r[0] * s[1] - r[1] * s[0]
    qp = q1 - p1
    t = (qp[0] * s[1] - qp[1] * s[0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom
    )
    u = (qp[0] * r[1] - qp[1] * r[0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom
    )
    valid = (
        (jnp.abs(denom) >= _EPS)
        & (t >= 0.0) & (t <= 1.0)
        & (u >= 0.0) & (u <= 1.0)
    )
    return valid, p1 + t * r


def segments_intersect_any(path_a, path_b, mask_a=None, mask_b=None):
    """True if any segment of polyline ``path_a`` [NA,2] intersects any of
    ``path_b`` [NB,2]. Masks mark valid *segments* (length N-1).

    This is the InterX capability (hlc/optimizer/graph_search/InterX.m):
    a vectorized curve-curve intersection test used for non-convex obstacle
    and lanelet-boundary checks.
    """
    a1, a2 = path_a[:-1], path_a[1:]
    b1, b2 = path_b[:-1], path_b[1:]

    def seg_vs_all(p1, p2):
        valid, _ = jax.vmap(
            lambda q1, q2: _segment_intersection(p1, p2, q1, q2)
        )(b1, b2)
        if mask_b is not None:
            valid = valid & mask_b
        return jnp.any(valid)

    hits = jax.vmap(seg_vs_all)(a1, a2)
    if mask_a is not None:
        hits = hits & mask_a
    return jnp.any(hits)


def convex_intersection_area(a, b):
    """Area of the intersection of convex polygons a [VA,2], b [VB,2].

    Candidate vertices of the (convex) intersection are: vertices of a inside
    b, vertices of b inside a, and all pairwise edge intersections. Valid
    candidates are sorted by angle around their centroid and measured with
    the shoelace formula. Replaces polyshape ``intersect``+``area`` in
    ReachableSetCoupler.m:39-45.
    """
    va, vb = a.shape[0], b.shape[0]

    in_b = jax.vmap(lambda p: point_in_convex(p, b))(a)          # [VA]
    in_a = jax.vmap(lambda p: point_in_convex(p, a))(b)          # [VB]

    a1, a2 = a, jnp.roll(a, -1, axis=0)
    b1, b2 = b, jnp.roll(b, -1, axis=0)

    def edge_vs_edges(p1, p2):
        return jax.vmap(lambda q1, q2: _segment_intersection(p1, p2, q1, q2))(
            b1, b2
        )

    xvalid, xpts = jax.vmap(edge_vs_edges)(a1, a2)               # [VA,VB]

    pts = jnp.concatenate([a, b, xpts.reshape(va * vb, 2)], axis=0)
    valid = jnp.concatenate([in_b, in_a, xvalid.reshape(va * vb)], axis=0)

    n_valid = jnp.sum(valid)
    w = valid.astype(jnp.float32)
    centroid = jnp.sum(pts * w[:, None], axis=0) / jnp.maximum(n_valid, 1)
    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid points sort last
    # sort the coordinates AS PAYLOAD of the angle sort: an argsort +
    # two [K,2] gathers is scalar-core bound on TPU (measured 2 ms/step
    # on the 20x20 coupling batch); the multi-operand sort network moves
    # the payload for free. lax.sort is stable, so ordering (and the
    # area) is identical to the argsort formulation.
    _, sx, sy, sv = jax.lax.sort(
        (ang, pts[:, 0], pts[:, 1], valid.astype(jnp.float32)),
        num_keys=1,
    )
    sorted_pts = jnp.stack([sx, sy], axis=-1)
    # Replace invalid slots with the first valid point -> zero contribution.
    first = sorted_pts[0]
    ring = jnp.where((sv > 0.5)[:, None], sorted_pts, first[None, :])
    area = polygon_area(ring)
    return jnp.where(n_valid >= 3, area, 0.0)


def _ccw(poly):
    """Canonicalize polygon orientation to CCW (reverse if clockwise)."""
    x, y = poly[:, 0], poly[:, 1]
    signed = jnp.sum(x * jnp.roll(y, -1) - jnp.roll(x, -1) * y)
    return jnp.where(signed >= 0.0, poly, poly[::-1])


def _edge_portions_integral(a, b, strict):
    """∮ x dy over the portions of CCW polygon ``a``'s edges inside CCW
    convex polygon ``b`` — every edge is clipped against all of ``b``'s
    half-planes as a t-interval (pure min/max, no sort, no gather).

    ``strict`` handles boundary-collinear portions (subject edge lying ON
    a non-degenerate b-edge line, num == 0): the non-strict pass always
    keeps them; the strict pass drops the SAME-direction case (a genuine
    shared boundary of the intersection — the other pass already counted
    it once) and keeps the opposite-direction case (external touching —
    the two passes' opposite-direction integrals cancel to zero area).
    """
    p1 = a
    d = jnp.roll(a, -1, axis=0) - a                       # [VA, 2]
    b1 = b
    eb = jnp.roll(b, -1, axis=0) - b                      # [VB, 2]
    nx, ny = -eb[:, 1], eb[:, 0]                          # inward normals
    # degenerate clip edges are judged RELATIVE to the polygon scale:
    # tangent polygons (outer_poly_approx) carry micro edges (~1e-7 of
    # the diameter) between numerically coincident vertices whose
    # direction is pure noise — used as half-planes they can empty the
    # whole intersection. Dropping them is conservative (a sliver
    # overestimate bounded by the min-area clamp in the caller).
    len_clip = jnp.abs(nx) + jnp.abs(ny)
    deg_clip = len_clip < jnp.maximum(1e-5 * jnp.max(len_clip), _EPS)
    num = (nx[None, :] * (p1[:, 0, None] - b1[None, :, 0])
           + ny[None, :] * (p1[:, 1, None] - b1[None, :, 1]))  # [VA, VB]
    den = (nx[None, :] * d[:, 0, None]
           + ny[None, :] * d[:, 1, None])                      # [VA, VB]
    par = jnp.abs(den) < _EPS                             # edge ∥ clip line
    tcross = -num / jnp.where(par, 1.0, den)
    inert = par | deg_clip[None, :]      # no t constraint from this pair
    lo = jnp.where((den > 0) & ~inert, tcross, 0.0)
    hi = jnp.where((den < 0) & ~inert, tcross, 1.0)
    # parallel-to-clip-line edges: no t constraint; the whole edge is out
    # when strictly on the wrong side, or (strict pass only) when exactly
    # on a same-direction clip line
    outside = num < -0.0                                  # strictly outside
    if strict:
        same_dir = (d[:, 0, None] * eb[None, :, 0]
                    + d[:, 1, None] * eb[None, :, 1]) > 0.0
        outside = outside | ((num <= 0.0) & same_dir)
    empty = jnp.any(par & ~deg_clip[None, :] & outside, axis=1)
    t0 = jnp.clip(jnp.max(lo, axis=1), 0.0, 1.0)
    t1 = jnp.clip(jnp.min(hi, axis=1), 0.0, 1.0)
    keep = (t1 > t0) & ~empty
    contrib = d[:, 1] * (p1[:, 0] * (t1 - t0)
                         + d[:, 0] * 0.5 * (t1 * t1 - t0 * t0))
    return jnp.sum(jnp.where(keep, contrib, 0.0))


def convex_intersection_area_clip(a, b):
    """Area of the intersection of convex polygons a [VA,2], b [VB,2] by
    Green's theorem over clipped edges — sort- and gather-free.

    area(A ∩ B) = ∮_{∂(A∩B)} x dy, and ∂(A∩B) is exactly (the portions of
    A's edges inside B) ∪ (the portions of B's edges inside A), so the
    area is the sum of closed-form line integrals over per-edge
    t-intervals obtained by half-plane interval clipping. Replaces the
    angle-sorted candidate-vertex construction of
    :func:`convex_intersection_area` on the hot coupling path
    (ReachableSetCoupler.m:39-45): the 288-candidate multi-operand sort
    per vehicle pair dominated the coupling cost on TPU; this version is
    pure vectorized min/max arithmetic. Shared boundary segments are
    counted once (A-pass keeps them, B-pass is strict).
    """
    a = _ccw(a)
    b = _ccw(b)
    area = (_edge_portions_integral(a, b, strict=False)
            + _edge_portions_integral(b, a, strict=True))
    # the intersection can never exceed either polygon (also caps the
    # sliver overestimate from dropped noise-edge constraints and zeroes
    # degenerate point/segment polygons)
    cap = jnp.minimum(polygon_area(a), polygon_area(b))
    return jnp.clip(area, 0.0, cap)


def point_in_ring(p, ring):
    """Crossing-number point-in-polygon for a (possibly non-convex) ring.

    ``ring`` [R, 2] is a closed polygon padded by repeating the last valid
    vertex (zero-length edges never cross the ray, so padding is harmless;
    an all-equal dummy ring tests False everywhere). Used for the drivable
    corridor of lanelet boundary rings (the polyshape region test inside
    bound_reachable_sets.m).
    """
    a = ring
    b = jnp.roll(ring, -1, axis=0)
    cond = (a[:, 1] > p[1]) != (b[:, 1] > p[1])
    dy = b[:, 1] - a[:, 1]
    t = (p[1] - a[:, 1]) / jnp.where(jnp.abs(dy) < _EPS, 1.0, dy)
    x_cross = a[:, 0] + t * (b[:, 0] - a[:, 0])
    crossings = jnp.sum(cond & (p[0] < x_cross))
    return (crossings % 2) == 1


def bound_convex_to_corridor(poly, rings, segs, seg_mask, k_dirs=None):
    """Clip convex polygon ``poly`` to a corridor (union of boundary rings).

    TPU-native equivalent of bound_reachable_sets.m (/root/reference/hlc/
    controller/common/bound_reachable_sets.m:1-50) followed by the convhull
    the reference applies for convex-only obstacle configs
    (HighLevelController.m:252-257): the candidate vertices of
    ``poly ∩ corridor`` — polygon vertices inside the corridor, corridor
    ring vertices inside the polygon, and polygon-edge x boundary-segment
    intersections — are support-fitted to a ``k_dirs``-vertex convex outer
    approximation. An empty intersection restores the original polygon
    (reference :41-46).

    poly: [K, 2] convex; rings: [M, R, 2] corridor rings (pad-by-repeat);
    segs: [S, 2, 2] boundary segments with validity mask ``seg_mask`` [S].
    Returns [k_dirs or K, 2].
    """
    k = poly.shape[0] if k_dirs is None else k_dirs

    in_corridor = jax.vmap(
        lambda p: jnp.any(jax.vmap(lambda r: point_in_ring(p, r))(rings))
    )(poly)                                                   # [K]

    ring_pts = rings.reshape(-1, 2)                           # [M*R, 2]
    ring_in = jax.vmap(lambda p: point_in_convex(p, poly))(ring_pts)

    e1, e2 = poly, jnp.roll(poly, -1, axis=0)

    def edge_hits(p1, p2):
        valid, pts = jax.vmap(
            lambda s: _segment_intersection(p1, p2, s[0], s[1])
        )(segs)
        return valid & seg_mask, pts

    xvalid, xpts = jax.vmap(edge_hits)(e1, e2)                # [K, S]

    pts = jnp.concatenate([poly, ring_pts, xpts.reshape(-1, 2)], axis=0)
    valid = jnp.concatenate(
        [in_corridor, ring_in, xvalid.reshape(-1)], axis=0
    )
    n_valid = jnp.sum(valid)
    safe_valid = jnp.where(n_valid >= 3, valid, jnp.ones_like(valid))
    bounded = outer_poly_approx(pts, safe_valid, k)
    original = outer_poly_approx(
        poly, jnp.ones(poly.shape[0], dtype=bool), k
    ) if k != poly.shape[0] else poly
    return jnp.where(n_valid >= 3, bounded, original)


def outer_poly_approx(points, mask, k_dirs: int):
    """Conservative convex outer approximation with ``k_dirs`` vertices.

    Computes the support of the valid point set in ``k_dirs`` evenly spaced
    directions and intersects the tangent halfplanes; the result is a convex
    polygon with exactly ``k_dirs`` vertices that contains the point set.
    Used to give offline reachable sets and swept unions a fixed vertex
    count (the reference unions polyshapes with unbounded vertex counts,
    MotionPrimitiveAutomaton.m:252-647 — here over-approximation is the
    safe direction for collision avoidance).

    points: [M, 2]; mask: [M] bool; returns [k_dirs, 2].
    """
    theta = 2.0 * jnp.pi * jnp.arange(k_dirs) / k_dirs
    dirs = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)  # [K, 2]
    # f32 MXU accumulation: bf16-default supports shift the fitted
    # halfplanes by up to ~3 cm at map scale, mangling clipped corridors
    # (observed on the TPU backend: couplings missed entirely at 64
    # vehicles -> colliding trajectories)
    proj = jnp.matmul(points, dirs.T,
                      precision=jax.lax.Precision.HIGHEST)        # [M, K]
    proj = jnp.where(mask[:, None], proj, -jnp.inf)
    h = jnp.max(proj, axis=0)                                     # [K]
    # Vertex k = intersection of halfplane boundaries k and k+1:
    #   d_k . x = h_k,  d_{k+1} . x = h_{k+1}
    d1, d2 = dirs, jnp.roll(dirs, -1, axis=0)
    h1, h2 = h, jnp.roll(h, -1)
    det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    x = (h1 * d2[:, 1] - h2 * d1[:, 1]) / det
    y = (d1[:, 0] * h2 - d2[:, 0] * h1) / det
    return jnp.stack([x, y], axis=-1)


def polygon_bbox(poly):
    """Axis-aligned bounding box of [V,2] -> (xmin, xmax, ymin, ymax)."""
    return (
        jnp.min(poly[:, 0]), jnp.max(poly[:, 0]),
        jnp.min(poly[:, 1]), jnp.max(poly[:, 1]),
    )


def bboxes_overlap(b1, b2):
    """Quick prefilter. Reference: ReachableSetCoupler.m:34.

    INCLUSIVE on touch (touching boxes overlap), matching
    pallas_collision._bbox_overlap and the SAT convention (touching
    polygons collide) — a prefilter that excluded exact touches would
    drop couplings the full test reports.
    """
    return ~(
        (b1[0] > b2[1]) | (b1[2] > b2[3]) | (b1[1] < b2[0]) | (b1[3] < b2[2])
    )


# ---------------------------------------------------------------------------
# Reference-path arc-length machinery (static-shape replacement for the
# point-walking loops in sample_reference_trajectory.m).
# ---------------------------------------------------------------------------


def path_cumlen(path):
    """Cumulative arc length [P] of polyline [P, 2] (first entry 0)."""
    seg = jnp.linalg.norm(jnp.diff(path, axis=0), axis=-1)
    return jnp.concatenate([jnp.zeros(1, dtype=path.dtype), jnp.cumsum(seg)])


def project_to_polyline(p, path, cumlen=None):
    """Project point ``p`` [2] onto polyline ``path`` [P, 2].

    Returns (arc_position, closest_point, segment_index). Static-shape
    equivalent of get_arc_distance_to_endpoint.m's projection step.
    """
    if cumlen is None:
        cumlen = path_cumlen(path)
    a = path[:-1]
    b = path[1:]
    ab = b - a
    ab_len2 = jnp.sum(ab * ab, axis=-1)
    t = jnp.sum((p[None, :] - a) * ab, axis=-1) / jnp.maximum(ab_len2, _EPS)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[:, None] * ab
    d2 = jnp.sum((proj - p[None, :]) ** 2, axis=-1)
    # Zero-length segments (duplicated junction points in lanelet paths,
    # sample_reference_trajectory.m:56) are valid candidates but equivalent
    # to their neighbors, so no special handling is required.
    i = jnp.argmin(d2)
    arc = cumlen[i] + t[i] * jnp.sqrt(jnp.maximum(ab_len2[i], 0.0))
    return arc, proj[i], i


def sample_path_at_arclength(path, arcs, cumlen=None, is_loop=True,
                             return_indices=False):
    """Points on polyline ``path`` [P,2] at arc positions ``arcs`` [H].

    Loops wrap modulo total length (reference treats paths whose first and
    last points coincide as loops, sample_reference_trajectory.m:40).
    With ``return_indices``, also returns the segment index of each sample
    (used to map reference points to lanelets).
    """
    if cumlen is None:
        cumlen = path_cumlen(path)
    total = cumlen[-1]
    # is_loop may be a traced bool (per-vehicle scenario data)
    s = jnp.where(
        jnp.asarray(is_loop),
        jnp.mod(arcs, total),
        jnp.clip(arcs, 0.0, total),
    )
    idx = jnp.clip(jnp.searchsorted(cumlen, s, side="right") - 1, 0,
                   path.shape[0] - 2)
    seg_start = cumlen[idx]
    seg_len = jnp.maximum(cumlen[idx + 1] - seg_start, _EPS)
    t = (s - seg_start) / seg_len
    points = path[idx] + t[:, None] * (path[idx + 1] - path[idx])
    if return_indices:
        return points, idx
    return points
