"""Eval pipeline + visualization tests (reference: eval/, visualization/)."""

import numpy as np
import pytest

from pdmpc_tpu.config import Config, PriorityStrategies, ScenarioType
from pdmpc_tpu.eval.processing import (
    compute_deadlock_free_runtime,
    compute_levels_data,
    data_cost_per_step,
    summarize,
)
from pdmpc_tpu.experiment import run_experiment


@pytest.fixture(scope="module")
def result():
    return run_experiment(
        Config(
            scenario_type=ScenarioType.circle, amount=2, T_end=2.0,
            beam_width=96,
        )
    )


class TestProcessing:
    def test_summary(self, result):
        s = summarize(result)
        assert s["n_steps"] == 10
        assert s["n_vehicles"] == 2
        assert s["deadlocked_vehicles"] == 0
        assert s["total_cost"] >= 0
        assert 1 <= s["max_levels"] <= 2

    def test_cost_per_step_shape(self, result):
        c = data_cost_per_step(result)
        assert c.shape == (10,)

    def test_deadlock_free_runtime_full(self, result):
        assert compute_deadlock_free_runtime(result) == pytest.approx(2.0)

    def test_levels_data(self, result):
        d = compute_levels_data(result)
        assert d["n_levels_per_step"].shape == (10,)


class TestEvalSweep:
    def test_small_sweep_with_memoization(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PDMPC_RESULTS_DIR", str(tmp_path))
        import pdmpc_tpu.utils.filenames as fn

        monkeypatch.setattr(fn, "RESULTS_ROOT", str(tmp_path))
        from pdmpc_tpu.eval.experiments import eval_experiments

        base = Config(
            scenario_type=ScenarioType.circle, T_end=1.0, beam_width=64
        )
        out = eval_experiments(
            base=base,
            n_vehicles_list=(2,),
            priorities=(PriorityStrategies.constant_priority,),
            seeds=(1,),
        )
        assert len(out) == 1
        key = (2, "constant_priority", 2, 1)
        assert key in out
        # second call hits the cache (no new result files)
        import glob

        n_files = len(glob.glob(str(tmp_path / "**" / "*.npz"),
                                recursive=True))
        out2 = eval_experiments(
            base=base,
            n_vehicles_list=(2,),
            priorities=(PriorityStrategies.constant_priority,),
            seeds=(1,),
        )
        n_files2 = len(glob.glob(str(tmp_path / "**" / "*.npz"),
                                 recursive=True))
        assert out2.keys() == out.keys()
        assert n_files2 == n_files


class TestVisualization:
    def test_export_frame(self, result, tmp_path):
        from pdmpc_tpu.visualization import PlotterOffline

        p = PlotterOffline(result)
        path = p.export_frame(3, str(tmp_path / "frame.png"))
        import os

        assert os.path.getsize(path) > 5000

    def test_export_frame_with_road(self, tmp_path):
        from pdmpc_tpu.scenarios.road import get_road_data
        from pdmpc_tpu.visualization import PlotterOffline

        res = run_experiment(
            Config(
                scenario_type=ScenarioType.commonroad, amount=2, T_end=1.0,
                beam_width=64,
            )
        )
        p = PlotterOffline(res, road=get_road_data())
        path = p.export_frame(2, str(tmp_path / "road.png"))
        import os

        assert os.path.getsize(path) > 10000
