"""bench.py smoke: the driver runs it on TPU; this guards against rot."""

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class TestBench:
    def test_build_and_throughput_tiny(self):
        import bench

        cfg, mpa_t, sc_t = bench._build("circle", 2, 0.4, 16)
        solves, elapsed = bench._throughput(cfg, mpa_t, sc_t, batch=2,
                                            reps=1)
        assert solves > 0 and elapsed > 0

    def test_throughput_chunked_matches_shape(self):
        import bench

        cfg, mpa_t, sc_t = bench._build("circle", 2, 0.4, 16)
        solves, elapsed = bench._throughput_chunked(
            cfg, mpa_t, sc_t, batch=4, chunk=2, reps=1)
        assert solves > 0 and elapsed > 0

    def test_device_p95(self):
        import bench

        cfg, mpa_t, sc_t = bench._build("circle", 2, 0.4, 16)
        p95, med = bench._device_p95(cfg, mpa_t, sc_t, n_chains=2)
        assert p95 >= med > 0

    def test_host_loop_latency_small(self):
        import bench

        out = bench._host_loop_latency(amount=2, t_end=0.8, beam=32)
        assert "error" not in out, out
        assert out["n_steps"] == 4
        assert out["host_loop_p95_ms"] > 0
        assert out["host_loop_median_ms"] <= out["host_loop_p95_ms"]

    def test_mixed_fleet_small(self):
        import bench

        out = bench._mixed64(amount=8, t_end=0.6, beam=32)
        assert "error" not in out, out
        assert out["n_vehicles"] == 8
        assert out["collision_free"] is True
        assert "fallback_rate" in out and "wall_s_incl_compile" in out

    @pytest.mark.slow
    def test_family_mode_extras(self):
        import bench

        out = bench._family_mode_extras(batch=2)
        assert set(out) == {
            "triple_speed_circle4", "realistic_circle4",
            "optimal_priority_cr4", "explorative_priority_cr4",
        }
        for name, entry in out.items():
            assert "error" not in entry, (name, entry)
            assert entry["solves_per_s"] > 0
