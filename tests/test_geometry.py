"""Geometry kernel tests (reference: tests/unittests/hlc/intersect_unittest.m)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.ops import geometry as geo


def square(cx, cy, half=1.0):
    return jnp.array(
        [
            [cx - half, cy - half],
            [cx + half, cy - half],
            [cx + half, cy + half],
            [cx - half, cy + half],
        ],
        dtype=jnp.float32,
    )


class TestSat:
    def test_overlapping(self):
        assert bool(geo.sat_collide(square(0, 0), square(1, 1)))

    def test_disjoint(self):
        assert not bool(geo.sat_collide(square(0, 0), square(5, 5)))

    def test_contained(self):
        assert bool(geo.sat_collide(square(0, 0, 3.0), square(0, 0, 0.5)))

    def test_diagonal_separation(self):
        # Squares separated only along a diagonal axis of a rotated polygon
        tri = jnp.array([[2.5, 0.0], [4.0, 1.5], [4.0, 0.0]], dtype=jnp.float32)
        assert not bool(geo.sat_collide(square(0, 0), tri))
        tri2 = jnp.array([[0.5, 0.0], [4.0, 1.5], [4.0, 0.0]], dtype=jnp.float32)
        assert bool(geo.sat_collide(square(0, 0), tri2))

    def test_padded_vertices_are_safe(self):
        # Pad by repeating last vertex (framework convention)
        a = jnp.concatenate([square(0, 0), jnp.tile(square(0, 0)[-1:], (4, 1))])
        b = jnp.concatenate([square(5, 5), jnp.tile(square(5, 5)[-1:], (4, 1))])
        assert not bool(geo.sat_collide(a, b))
        assert bool(geo.sat_collide(a, a))

    def test_pairwise(self):
        polys = jnp.stack([square(0, 0), square(1, 0), square(10, 10)])
        m = geo.sat_collide_pairwise(polys, polys)
        expected = np.array(
            [[1, 1, 0], [1, 1, 0], [0, 0, 1]], dtype=bool
        )
        np.testing.assert_array_equal(np.asarray(m), expected)


class TestSegments:
    def test_crossing_polylines(self):
        a = jnp.array([[0.0, 0.0], [2.0, 2.0]], dtype=jnp.float32)
        b = jnp.array([[0.0, 2.0], [2.0, 0.0]], dtype=jnp.float32)
        assert bool(geo.segments_intersect_any(a, b))

    def test_parallel_disjoint(self):
        a = jnp.array([[0.0, 0.0], [2.0, 0.0]], dtype=jnp.float32)
        b = jnp.array([[0.0, 1.0], [2.0, 1.0]], dtype=jnp.float32)
        assert not bool(geo.segments_intersect_any(a, b))

    def test_masked_segments(self):
        a = jnp.array([[0.0, 0.0], [2.0, 2.0], [0.0, 2.0]], dtype=jnp.float32)
        b = jnp.array([[0.2, 1.8], [1.8, 0.2]], dtype=jnp.float32)
        # Mask out the crossing first segment of a; the remaining segment
        # (horizontal at y=2) does not touch b
        mask_a = jnp.array([False, True])
        assert not bool(geo.segments_intersect_any(a, b, mask_a=mask_a))


class TestIntersectionArea:
    def test_half_overlap(self):
        a, b = square(0, 0), square(1, 0)
        area = float(geo.convex_intersection_area(a, b))
        assert area == pytest.approx(2.0, abs=1e-4)

    def test_disjoint_zero(self):
        area = float(geo.convex_intersection_area(square(0, 0), square(5, 5)))
        assert area == pytest.approx(0.0, abs=1e-6)

    def test_contained(self):
        area = float(
            geo.convex_intersection_area(square(0, 0, 2.0), square(0, 0, 0.5))
        )
        assert area == pytest.approx(1.0, abs=1e-4)

    def test_coupling_threshold_semantics(self):
        # ReachableSetCoupler.m:45 couples iff overlap area > 1e-3
        a, b = square(0, 0), square(1.999, 0)
        area = float(geo.convex_intersection_area(a, b))
        assert area < 1e-2


class TestOuterApprox:
    def test_contains_points(self):
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(50, 2)), dtype=jnp.float32)
        mask = jnp.ones(50, dtype=bool)
        poly = geo.outer_poly_approx(pts, mask, 16)
        # every point inside the outer approximation
        for p in np.asarray(pts):
            assert bool(geo.point_in_convex(jnp.asarray(p), poly))

    def test_tightness_square(self):
        pts = square(0, 0)
        mask = jnp.ones(4, dtype=bool)
        poly = geo.outer_poly_approx(pts, mask, 64)
        area = float(geo.polygon_area(poly))
        # K=64 outer approx of a unit-half square: area within ~1%
        assert area == pytest.approx(4.0, rel=0.02)


class TestPathSampling:
    def test_project_and_sample_straight(self):
        path = jnp.array([[0.0, 0.0], [10.0, 0.0]], dtype=jnp.float32)
        arc, pt, idx = geo.project_to_polyline(jnp.array([3.0, 1.0]), path)
        assert float(arc) == pytest.approx(3.0, abs=1e-5)
        np.testing.assert_allclose(np.asarray(pt), [3.0, 0.0], atol=1e-5)

        samples = geo.sample_path_at_arclength(
            path, jnp.array([1.0, 2.5, 9.0]), is_loop=False
        )
        np.testing.assert_allclose(
            np.asarray(samples[:, 0]), [1.0, 2.5, 9.0], atol=1e-5
        )

    def test_loop_wraparound(self):
        # closed unit square loop, perimeter 4
        path = jnp.array(
            [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=jnp.float32
        )
        samples = geo.sample_path_at_arclength(
            path, jnp.array([4.5, 8.25]), is_loop=True
        )
        np.testing.assert_allclose(np.asarray(samples[0]), [0.5, 0.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(samples[1]), [0.25, 0.0], atol=1e-5)

    def test_sample_with_overlapping_points(self):
        # duplicated junction points (lanelet concatenation artifact)
        path = jnp.array(
            [[0.0, 0.0], [1.0, 0.0], [1.0, 0.0], [2.0, 0.0]], dtype=jnp.float32
        )
        samples = geo.sample_path_at_arclength(
            path, jnp.array([1.5]), is_loop=False
        )
        np.testing.assert_allclose(np.asarray(samples[0]), [1.5, 0.0], atol=1e-5)

    def test_rigid_transform(self):
        rect = geo.transformed_rectangle(1.0, 2.0, jnp.pi / 2, 0.22, 0.1)
        # Rotating by 90deg: length along y
        ys = np.asarray(rect[:, 1])
        assert ys.max() - ys.min() == pytest.approx(0.22, abs=1e-6)
