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


@pytest.fixture(scope="module")
def hlc_result():
    """Host-driven loop result: has per-step measure/plan/apply spans."""
    from pdmpc_tpu.hlc import run_with_plant

    return run_with_plant(
        Config(scenario_type=ScenarioType.circle, amount=2, T_end=1.0,
               beam_width=64)
    )


class TestEvalPlotting:
    """eval/3-plotting parity (reference: eval/3-plotting/*.m)."""

    def test_computation_time_per_vehicle(self, result, tmp_path):
        from pdmpc_tpu.eval.plotting import plot_computation_time_per_vehicle

        path = str(tmp_path / "ct.png")
        plot_computation_time_per_vehicle(result, path=path)
        import os

        assert os.path.getsize(path) > 1000

    def test_computation_time_over_vehicle_number(self, result, hlc_result,
                                                  tmp_path):
        from pdmpc_tpu.eval.plotting import (
            plot_computation_time_over_vehicle_number,
        )

        n, med, mx = plot_computation_time_over_vehicle_number(
            [result, hlc_result], path=str(tmp_path / "box.png"))
        assert list(n) == [2, 2]
        assert (mx >= med).all() and (med > 0).all()

    def test_computation_time_for_step(self, hlc_result, tmp_path):
        from pdmpc_tpu.eval.plotting import plot_computation_time_for_step

        ax = plot_computation_time_for_step(
            hlc_result, 3, path=str(tmp_path / "gantt.png"))
        labels = [t.get_text() for t in ax.get_yticklabels()]
        assert "plan" in labels and "measure" in labels

    def test_for_step_requires_spans(self, result):
        from pdmpc_tpu.eval.plotting import plot_computation_time_for_step

        # fused-scan results carry no per-step spans
        if "plan" not in (result.timings or {}):
            with pytest.raises(ValueError):
                plot_computation_time_for_step(result, 0)

    def test_series_plot_med_max(self, tmp_path):
        from pdmpc_tpu.eval.plotting import series_plot_med_max

        ax = series_plot_med_max(
            [5, 10, 15], [[1.0, 2.0], [1.5, 2.5], [2.0, 3.0]],
            [[2.0, 4.0], [3.0, 5.0], [4.0, 6.0]],
            ["coloring", "fca"], path=str(tmp_path / "mm.png"))
        assert len(ax.get_legend().get_texts()) == 4

    def test_plot_mpa_family(self, tmp_path):
        from pdmpc_tpu.eval.plotting import (
            plot_mpa, plot_mpa_local_reachable_sets, plot_mpa_over_time,
        )
        from pdmpc_tpu.models.mpa import build_mpa

        cfg = Config(scenario_type=ScenarioType.circle, amount=2)
        mpa = build_mpa(cfg)
        plot_mpa(mpa, path=str(tmp_path / "mpa.png"))
        plot_mpa_over_time(mpa, path=str(tmp_path / "mpa_t.png"))
        plot_mpa_local_reachable_sets(mpa, trim=0,
                                      path=str(tmp_path / "mpa_rs.png"))
        import os

        for f in ("mpa.png", "mpa_t.png", "mpa_rs.png"):
            assert os.path.getsize(str(tmp_path / f)) > 1000

    def test_snapshots_and_partitioned_graph(self, result, tmp_path):
        from pdmpc_tpu.eval.plotting import (
            plot_experiment_snapshots, plot_partitioned_graph,
        )

        plot_experiment_snapshots(result, [0, 3, 6, 9],
                                  path=str(tmp_path / "snap.png"))
        plot_partitioned_graph(result, 0, path=str(tmp_path / "graph.png"))
        import os

        assert os.path.getsize(str(tmp_path / "snap.png")) > 5000

    def test_matrix_to_pgf_array(self, tmp_path):
        from pdmpc_tpu.eval.plotting import matrix_to_pgf_array

        path = matrix_to_pgf_array(
            np.array([[1.0, 2.5], [3.0, 4.0]]),
            str(tmp_path / "m.dat"), column_names=["a", "b"])
        lines = open(path).read().splitlines()
        assert lines[0] == "a b"
        assert [float(v) for v in lines[1].split()] == [1.0, 2.5]


class TestEvalPhd:
    """eval_phd values.txt reproduction (reference: eval_phd.m:41-66)."""

    def test_compute_values(self, hlc_result):
        from pdmpc_tpu.eval.phd import compute_values

        vals = compute_values(hlc_result, i_step_start=1)
        assert vals["max_ms"] >= vals["med_ms"] > 0
        assert vals["n_steps_used"] == hlc_result.n_steps - 1

    def test_write_values_txt(self, hlc_result, tmp_path):
        import re

        from pdmpc_tpu.eval.phd import write_values_txt

        path = write_values_txt(hlc_result, path=str(tmp_path / "values.txt"),
                                i_step_start=1)
        content = open(path).read()
        assert re.match(
            r"CPM Lab -- max: *[\d.]+ ms -- med: *[\d.]+ ms\n", content)


class TestPlotterOnline:
    """Live plotting hook (reference: visualization/PlotterOnline.m)."""

    def test_draws_each_step_and_aborts(self):
        from pdmpc_tpu.hlc import run_with_plant
        from pdmpc_tpu.visualization import PlotterOnline

        plotter = PlotterOnline()
        seen = []
        orig_call = plotter.__call__

        def hook(k, info):
            seen.append(k)
            if k == 2:
                plotter.stop_requested = True  # the ESC hotkey effect
            return orig_call(k, info)

        res = run_with_plant(
            Config(scenario_type=ScenarioType.circle, amount=2, T_end=1.0,
                   beam_width=64),
            on_step=hook,
        )
        assert seen == [0, 1, 2]
        assert res.n_steps == 3  # loop aborted after the hook returned True
        plotter.close()

    def test_hotkey_toggles(self):
        from pdmpc_tpu.visualization import PlotterOnline

        plotter = PlotterOnline()

        class _Ev:
            def __init__(self, key):
                self.key = key

        assert plotter.show_couplings
        plotter._on_key(_Ev("c"))
        assert not plotter.show_couplings
        plotter._on_key(_Ev("p"))
        assert not plotter.show_predictions
        plotter._on_key(_Ev("escape"))
        assert plotter.stop_requested
        plotter.close()
