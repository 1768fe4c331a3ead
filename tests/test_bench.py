"""bench.py smoke: the driver runs it on TPU; this guards against rot."""

import sys
import os

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
