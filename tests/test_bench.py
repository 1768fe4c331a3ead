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


class TestCompactSummary:
    """The LAST stdout line of bench.py is what the driver's ~4 KB tail
    capture parses (BENCH r3/r4 recorded parsed:null because only the
    giant full-record line was printed). It must stay small and carry
    the headline no matter how the full record grows."""

    def _fake_result(self, curve_len=4, pad=0):
        import bench

        curve = [
            {"batch": 2 ** (5 + i), "solves_per_s": 1000.0 + i,
             "rollouts": 2 ** (5 + i), "seconds": 1.0}
            for i in range(curve_len)
        ]
        return {
            "metric": "vehicle_mpc_solves_per_s_per_chip",
            "value": 9405.3, "unit": "solves/s", "vs_baseline": 94.05,
            "extra": {
                "headline_run": {"batch": 32},
                "device_step_p95_ms": 6.7,
                "device_step_median_ms": 6.61,
                "host_loop": {"host_loop_p95_ms": 37.07},
                "tpu_vs_golden": {"ok": True},
                "mixed_64veh": {"ok": True},
                "mesh_scaling_8dev_cpu": {
                    "vehicle_axis": {"efficiency_vs_physical": 0.8}
                },
                "monte_carlo_4096_rollouts": {"solves_per_s": 15705.2},
                "batch_scaling_curve": curve,
                "padding": "x" * pad,     # growth of the full record
            },
        }

    def test_under_one_kb_and_parseable(self):
        import json

        import bench

        line = json.dumps(bench._compact_summary(self._fake_result()))
        assert len(line) < 1024
        parsed = json.loads(line)
        assert parsed["value"] == 9405.3
        assert parsed["summary"]["tpu_golden_ok"] is True
        assert parsed["summary"]["device_step_p95_ms"] == 6.7

    def test_stays_small_as_record_grows(self):
        import json

        import bench

        big = self._fake_result(curve_len=40, pad=100_000)
        line = json.dumps(bench._compact_summary(big))
        assert len(line) < 1536          # curve capped, padding ignored

    def test_survives_missing_sections(self):
        import json

        import bench

        out = bench._compact_summary({
            "metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 0.01,
        })
        line = json.dumps(out)
        assert json.loads(line)["summary"]["tpu_golden_ok"] is False
