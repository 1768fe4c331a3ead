"""Scaling-efficiency measurement smoke tests (parallel/scaling.py).

Reference role: the 20-NUC deployment's scaling story
(nuc_control/deploy_nuc.sh); BASELINE.md asks for measured efficiency.
"""

from pdmpc_tpu.parallel.scaling import (
    measure_data_parallel,
    measure_vehicle_axis,
)


class TestScaling:
    def test_data_parallel_weak(self):
        out = measure_data_parallel(n_devices=2, amount=2, t_end=0.4,
                                    beam=16, batch_per_device=2)
        assert out["n_devices"] == 2
        assert out["t_1dev_s"] > 0 and out["t_ndev_s"] > 0
        assert 0 < out["efficiency_vs_physical"] <= 1.5

    def test_vehicle_axis_strong(self):
        out = measure_vehicle_axis(n_devices=2, amount=2, t_end=0.4,
                                   beam=16)
        assert out["n_devices"] == 2
        assert out["speedup"] > 0
        assert 0 < out["efficiency_vs_physical"] <= 1.5
