"""Loopback ExternalPlant integration: hlc.run_with_plant driven by a
SEPARATE plant process over a socket.

This closes the integration the reference's lab middleware provides
(plant/CpmLab.m:230-284 — an external process feeds vehicle states and
consumes stamped trajectory commands) without lab hardware, and exercises
normalize_timing_results (eval/2-processing/normalize_timing_results.m:28-60)
on two processes with genuinely skewed clocks.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from pdmpc_tpu.config import Config, ScenarioType
from pdmpc_tpu.experiment import create_scenario
from pdmpc_tpu.models.mpa import build_mpa
from pdmpc_tpu.plant import ExternalPlant
from pdmpc_tpu.plant_bridge import PlantBridgeClient

CLOCK_OFFSET_S = 37.5


@pytest.fixture(scope="module")
def bridge_run(tmp_path_factory):
    cfg = Config(
        scenario_type=ScenarioType.circle, amount=3, T_end=2.0,
        beam_width=64,
    ).validate()
    mpa = build_mpa(cfg)
    scenario = create_scenario(cfg, mpa)

    tmp = tmp_path_factory.mktemp("bridge")
    spec_path = tmp / "spec.json"
    spec_path.write_text(json.dumps({
        "start_poses": np.asarray(scenario.start_poses).tolist(),
        "start_speeds": [0.0] * cfg.amount,
        "clock_offset_s": CLOCK_OFFSET_S,
    }))

    proc = subprocess.Popen(
        [sys.executable, "-m", "pdmpc_tpu.plant_bridge",
         "--spec", str(spec_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        port_line = proc.stdout.readline().strip()
        assert port_line.startswith("PORT "), (
            f"server did not report a port: {port_line!r} "
            f"(stderr: {proc.stderr.read()[:500]})"
        )
        port = int(port_line.split()[1])

        client = PlantBridgeClient("127.0.0.1", port)
        plant = ExternalPlant(
            cfg,
            measure_fn=client.measure_fn,
            command_fn=client.command_fn,
        )
        from pdmpc_tpu import hlc

        result = hlc.run_with_plant(cfg, plant=plant)
        server_record = client.finish()
        proc.wait(timeout=30)
        return cfg, result, client, server_record
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


class TestLoopbackIntegration:
    def test_full_run_completes(self, bridge_run):
        cfg, result, _, _ = bridge_run
        assert result.n_steps == cfg.k_end

    def test_measurements_round_tripped(self, bridge_run):
        # every step's measured pose must equal the previous step's first
        # predicted pose (perfect execution through the external process)
        cfg, result, _, _ = bridge_run
        poses = np.asarray(result.infos.poses)        # [k, N, Hp, 3]
        measured = np.asarray(result.infos.measured_pose) \
            if hasattr(result.infos, "measured_pose") else None
        # fall back to trajectory continuity: first predicted pose of step
        # k becomes the plan start of step k+1
        first_pred = poses[:, :, 0, :2]
        if measured is not None:
            np.testing.assert_allclose(
                measured[1:, :, :2], first_pred[:-1], atol=1e-5
            )
        d = np.linalg.norm(first_pred[-1] - first_pred[0], axis=-1)
        assert (d > 0.3).all(), "vehicles did not move through the bridge"

    def test_one_command_per_step(self, bridge_run):
        cfg, _, client, server_record = bridge_run
        assert len(client.command_send_times) == cfg.k_end
        assert len(server_record["command_recv_times"]) == cfg.k_end

    def test_timing_normalization_on_skewed_clocks(self, bridge_run):
        """The command send (controller clock) and receive (plant clock,
        skewed by CLOCK_OFFSET_S) are the same nearly-simultaneous event;
        normalize_timing_results must align them."""
        from pdmpc_tpu.eval.processing import normalize_timing_results

        cfg, _, client, server_record = bridge_run
        send = np.asarray(client.command_send_times)
        recv = np.asarray(server_record["command_recv_times"])
        # raw clocks disagree by the configured offset
        raw_gap = float(np.mean(recv - send))
        assert abs(raw_gap - CLOCK_OFFSET_S) < 1.0

        def as_struct(end_times):
            # span [2, n_steps]: start = end (zero-duration event marker)
            arr = np.stack([end_times, np.zeros_like(end_times)])
            return {
                "receive_from_others": arr,
                "controller_start_time": float(end_times[0]),
            }

        normed = normalize_timing_results(
            [as_struct(send), as_struct(recv)]
        )
        e0 = np.sum(normed[0]["receive_from_others"], axis=0)
        e1 = np.sum(normed[1]["receive_from_others"], axis=0)
        # after alignment the two processes' event times agree to within
        # socket latency jitter
        assert float(np.max(np.abs(e0 - e1))) < 0.5
        # and the recovered per-process offsets differ by the true skew
        assert abs(
            (normed[1]["offset"] - normed[0]["offset"]) - CLOCK_OFFSET_S
        ) < 1.0
