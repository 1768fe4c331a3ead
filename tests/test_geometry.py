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


class TestIntersectionAreaClip:
    """The sort-free Green's-theorem clip kernel (the hot coupling path)
    must agree with the angle-sorted construction."""

    def _both(self, a, b):
        return (float(geo.convex_intersection_area(a, b)),
                float(geo.convex_intersection_area_clip(a, b)))

    def test_cases_match_sorted_version(self):
        cases = [
            (square(0, 0), square(1, 0)),          # half overlap
            (square(0, 0), square(5, 5)),          # disjoint
            (square(0, 0, 2.0), square(0, 0, 0.5)),  # contained
            (square(0, 0), square(1.999, 0)),      # sliver
        ]
        for a, b in cases:
            ref, clip = self._both(a, b)
            assert clip == pytest.approx(ref, abs=1e-4)

    def test_identical_polygons(self):
        a = square(0.3, -0.2, 1.7)
        _, clip = self._both(a, a)
        assert clip == pytest.approx(float(geo.polygon_area(a)), rel=1e-5)

    def test_touching_edge_zero_area(self):
        # externally touching along a shared edge: area must be ~0, not
        # a spurious line-integral contribution
        a, b = square(0, 0), square(2, 0)
        clip = float(geo.convex_intersection_area_clip(a, b))
        assert clip == pytest.approx(0.0, abs=1e-5)

    def test_orientation_agnostic(self):
        a, b = square(0, 0), square(0.7, 0.4)
        ref = float(geo.convex_intersection_area_clip(a, b))
        assert float(
            geo.convex_intersection_area_clip(a[::-1], b)
        ) == pytest.approx(ref, rel=1e-6)
        assert float(
            geo.convex_intersection_area_clip(a, b[::-1])
        ) == pytest.approx(ref, rel=1e-6)

    def test_padded_vertices(self):
        # our padding convention: repeat the last vertex
        a = jnp.concatenate([square(0, 0),
                             jnp.tile(square(0, 0)[-1:], (4, 1))])
        b = square(1, 0)
        ref, clip = self._both(a, b)
        assert clip == pytest.approx(2.0, abs=1e-4)

    def test_random_convex_pairs(self):
        import jax

        rng = np.random.default_rng(42)
        f = jax.jit(jax.vmap(geo.convex_intersection_area))
        g = jax.jit(jax.vmap(geo.convex_intersection_area_clip))

        def rand_convex(n_pts, k):
            pts = rng.uniform(-1.5, 1.5, size=(k, n_pts, 2))
            # convex hull via angle sort around the centroid of uniform
            # points is not a hull; instead build convex polys as
            # K-direction supports of the point cloud
            dirs = np.stack(
                [np.cos(np.linspace(0, 2 * np.pi, 8, endpoint=False)),
                 np.sin(np.linspace(0, 2 * np.pi, 8, endpoint=False))],
                axis=-1,
            )
            out = []
            for cloud in pts:
                sup = cloud[np.argmax(cloud @ dirs.T, axis=0)]
                out.append(sup)
            return np.asarray(out, dtype=np.float32)

        k = 256
        a = jnp.asarray(rand_convex(24, k))
        b = jnp.asarray(
            rand_convex(24, k) + rng.uniform(-1, 1, size=(k, 1, 2))
        )
        ref = np.asarray(f(a, b))
        clip = np.asarray(g(a, b))
        np.testing.assert_allclose(clip, ref, atol=2e-4)


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
