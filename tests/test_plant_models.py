"""MuCar model, ExternalPlant ring buffer, timing normalization.

References: hlc/model/differential_equations/MuCar.m, plant/CpmLab.m
(apply ring buffer :230-284, is_veh_at_map_border :301-316),
eval/2-processing/normalize_timing_results.m.
"""

import numpy as np
import pytest

from pdmpc_tpu.config import Config, ScenarioType
from pdmpc_tpu.eval.processing import normalize_timing_results
from pdmpc_tpu.models.bicycle import (
    MUCAR_P,
    mucar_input_from_trim,
    mucar_ode,
)
from pdmpc_tpu.plant import ExternalPlant, PlantMeasurement


class TestMuCar:
    def test_straight_driving(self):
        # straight at delta_ref = -p8 (net delta = 0): heading change 0,
        # position advances along yaw + p9
        x = np.array([0.0, 0.0, 0.0, 1.0])
        u = np.array([0.0, -MUCAR_P[7]])
        dx = mucar_ode(x, u)
        assert dx[2] == pytest.approx(0.0)
        assert dx[0] == pytest.approx(
            MUCAR_P[0] * np.cos(MUCAR_P[8]), rel=1e-9
        )
        assert dx[1] == pytest.approx(
            MUCAR_P[0] * np.sin(MUCAR_P[8]), rel=1e-9
        )

    def test_yaw_rate_proportional_to_speed_and_steering(self):
        x = np.array([0.0, 0.0, 0.3, 0.8])
        u = np.array([0.2, 0.1])
        dx = mucar_ode(x, u)
        delta = 0.1 + MUCAR_P[7]
        assert dx[2] == pytest.approx(MUCAR_P[3] * 0.8 * delta)

    def test_input_from_trim_formula(self):
        # MuCar.m:40: f = sign(v) * nthroot(p5/p6 * v, p7)
        u = mucar_input_from_trim(speed=0.8, steering=0.05)
        f_expected = (MUCAR_P[4] / MUCAR_P[5] * 0.8) ** (1.0 / MUCAR_P[6])
        assert u[0] == pytest.approx(f_expected)
        assert u[1] == pytest.approx(0.05 - MUCAR_P[7])
        # zero speed -> zero motor command
        assert mucar_input_from_trim(0.0, 0.0)[0] == pytest.approx(0.0)


class TestExternalPlantBuffer:
    def make_plant(self, commands_log):
        cfg = Config(scenario_type=ScenarioType.circle, amount=1).validate()
        meas = PlantMeasurement(
            x=np.array([2.0]), y=np.array([2.0]), yaw=np.array([0.0]),
            speed=np.array([0.0]), steering=np.array([0.0]),
        )
        return ExternalPlant(
            cfg, measure_fn=lambda: meas,
            command_fn=commands_log.append,
        ), cfg

    def poses(self, xy, hp):
        p = np.zeros((1, hp, 3))
        p[0, :, 0] = xy[0]
        p[0, :, 1] = xy[1]
        return p

    def test_ring_buffer_delay(self):
        log = []
        plant, cfg = self.make_plant(log)
        hp = cfg.Hp
        plant.measure()
        for k in range(4):
            plant.apply(self.poses((2.0 + 0.1 * (k + 1), 2.0), hp),
                        np.zeros((1, hp)), k)
        cmd = log[-1][0]
        assert len(cmd["points"]) == hp + 1
        # the newest applied pose sits at the END of the buffer (the
        # vehicle receives it with an Hp-1-step delay, CpmLab.m:252-257)
        assert cmd["points"][-1]["px"] == pytest.approx(2.4)
        # buffer start still holds pre-fill / older points
        assert cmd["points"][0]["px"] < 2.4
        # stamps are strictly increasing, one period apart at the tail
        t = [p["t_ns"] for p in cmd["points"]]
        assert all(b >= a for a, b in zip(t, t[1:]))
        assert cmd["valid_after_ns"] == t[1]
        assert not plant.should_stop()

    def test_map_border_stop(self):
        log = []
        plant, cfg = self.make_plant(log)
        hp = cfg.Hp
        plant.measure()
        # drive the buffer's 4th point out of the map (x > 4.45)
        for k in range(8):
            plant.apply(self.poses((4.6, 2.0), hp), np.zeros((1, hp)), k)
        assert plant.out_of_map_limits[0]
        assert plant.should_stop()


class TestNormalizeTimings:
    def test_two_controller_alignment(self):
        rng = np.random.default_rng(0)
        n_steps = 10
        # true shared event times + per-controller clock offsets
        event = np.cumsum(rng.uniform(0.1, 0.2, n_steps))
        offsets = [0.0, 0.37]
        timings = []
        for off in offsets:
            spans = {
                "controller_start_time": 100.0 + off,
                # receive_from_others ends exactly at the shared event
                "receive_from_others": np.stack(
                    [event + off - 0.01, np.full(n_steps, 0.01)]
                ),
                "optimize": np.stack(
                    [event + off, np.full(n_steps, 0.05)]
                ),
            }
            timings.append(spans)
        norm = normalize_timing_results(timings)
        # aligned: optimize start times now agree across controllers
        np.testing.assert_allclose(
            norm[0]["optimize"][0], norm[1]["optimize"][0], atol=1e-9
        )
        assert norm[1]["offset"] == pytest.approx(0.37 - 0.185)
        assert norm[0]["controller_start_time"] == 100.0
        assert norm[1]["controller_start_time"] == 100.0

    def test_single_controller_passthrough(self):
        t = {"controller_start_time": 5.0}
        assert normalize_timing_results(t) is t


class TestSaveOnError:
    """A crash mid-run persists the partial result — the reference's
    onCleanup save path (hlc/controller/HighLevelController.m:508-555)."""

    def test_partial_result_saved_and_loadable(self, tmp_path, monkeypatch):
        from pdmpc_tpu import hlc
        from pdmpc_tpu.experiment import ExperimentResult
        from pdmpc_tpu.utils import filenames

        monkeypatch.setattr(filenames, "RESULTS_ROOT", str(tmp_path))
        cfg = Config(
            scenario_type=ScenarioType.circle,
            amount=2,
            T_end=2.0,
            beam_width=32,
        )

        crash_at = 4

        def on_step(k, info):
            if k == crash_at:
                raise RuntimeError("injected mid-run failure")

        with pytest.raises(RuntimeError, match="injected"):
            hlc.run_with_plant(cfg, on_step=on_step)

        import glob
        import json

        metas = glob.glob(
            filenames.results_directory(cfg.validate()) + "/*.json"
        )
        assert metas, "no partial result was persisted"
        meta = json.load(open(metas[0]))
        # partial saves are marked and therefore NEVER served by the
        # whole-experiment memoization (a truncated run must not shadow
        # or impersonate a complete cached result)
        assert meta.get("partial") is True
        assert filenames.load_latest(cfg.validate()) is None
        saved = ExperimentResult.load(metas[0][: -len(".json")])
        # steps 0..crash_at completed before the crash
        assert saved.n_steps == crash_at + 1
        assert np.isfinite(np.asarray(saved.infos.poses)).all()
