"""Scaling-efficiency measurements over a device mesh.

BASELINE.md scaling target: >= 80% scaling efficiency to a multi-device
slice, 1000+ concurrent scenario rollouts, measured at 1 chip / 1 host /
N hosts. With one real TPU chip available, the mesh measurements run on a
virtual N-device CPU mesh (the same programs and shardings a pod slice
would run; the reference's analogue is the 20-NUC deployment,
/root/reference/nuc_control/deploy_nuc.sh:17).

Two axes, matching parallel/sharded.py's mesh:

- data-parallel (scenario axis): weak scaling — each device carries the
  same per-device rollout batch; efficiency = t(1 device) / t(N devices)
  at N x the total work.
- vehicle axis (shard_map): strong scaling — fixed fleet split across
  devices; efficiency = t(1) / (N * t(N)).

Run in a FRESH process (jax platform must be set before first device use):
``python -m pdmpc_tpu.parallel.scaling`` prints one JSON line.

Reading the numbers on the VIRTUAL mesh (r3 "regression" post-mortem):
the r2 -> r3 efficiency drop (data-parallel 0.81 -> 0.66) was NOT a
slowdown — absolute times improved on both axes (DP t_1dev 2.45 -> 1.82 s,
t_ndev 12.15 -> 11.10 s). The compact-level planning win lands fully in
the 1-device baseline (the denominator) while the 8-virtual-devices-on-
2-cores case is core-contention-bound, so the ratio fell. Two further
caveats bound what this metric can show: (a) XLA:CPU gives ONE device
intra-op threads across both physical cores, so t_1dev already uses the
whole machine and the "ideal" slowdown of n_dev/n_cores is unreachable
by construction; (b) run-to-run variance of the contended t_ndev is
~±8%. On real chips (each device owning its compute) neither applies —
the vehicle-axis strong-scaling number, which is stable here (0.84
after round 4's idle-shard cond skip, up from 0.63), is the
representative one.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _time_run(run, states, mpa_t, sc_t, reps: int = 2) -> float:
    import jax
    import jax.numpy as jnp

    out = run(states, mpa_t, sc_t)
    float(jnp.sum(out[0].pose))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(states, mpa_t, sc_t)
    float(jnp.sum(out[0].pose))
    return (time.perf_counter() - t0) / reps


def measure_data_parallel(n_devices: int = 8, amount: int = 4,
                          t_end: float = 1.0, beam: int = 64,
                          batch_per_device: int = 8,
                          scenario_type: str = "circle") -> dict:
    """Weak-scaling efficiency on the scenario (data-parallel) axis."""
    import jax

    from pdmpc_tpu.config import Config, ScenarioType
    from pdmpc_tpu.experiment import create_scenario
    from pdmpc_tpu.models.mpa import build_mpa
    from pdmpc_tpu.parallel import sharded

    cfg = Config(scenario_type=ScenarioType(scenario_type), amount=amount,
                 T_end=t_end, beam_width=beam).validate()
    mpa = build_mpa(cfg)
    scenario = create_scenario(cfg, mpa)
    mpa_t, sc_t = mpa.to_tensors_for(cfg), scenario.to_tensors()

    times = {}
    for d in (1, n_devices):
        mesh = sharded.make_mesh(d, 1, devices=jax.devices()[:d])
        run = sharded.make_data_parallel_run(cfg, mpa_t, sc_t, mesh)
        states = sharded.batched_initial_state(
            sc_t, cfg.Hp, batch_per_device * d)
        states = sharded.place_batched_state(states, mesh)
        times[d] = _time_run(run, states, mpa_t, sc_t)

    # weak scaling: same per-device work => ideal is equal times. Virtual
    # CPU devices SHARE the host's physical cores, so the per-device
    # slowdown is bounded below by n_devices / n_cores even for a perfect
    # program; efficiency_vs_physical normalizes by that bound (on real
    # chips, where each device owns its compute, the two numbers coincide).
    import os

    n_cores = os.cpu_count() or 1
    eff = times[1] / times[n_devices]
    ideal_slowdown = max(n_devices / min(n_devices, n_cores), 1.0)
    eff_physical = (times[1] * ideal_slowdown) / times[n_devices]
    return {
        "axis": "scenario(data_parallel)",
        "mode": "weak",
        "n_devices": n_devices,
        "n_physical_cores": n_cores,
        "batch_per_device": batch_per_device,
        "t_1dev_s": round(times[1], 4),
        "t_ndev_s": round(times[n_devices], 4),
        "efficiency": round(min(eff, 1.5), 4),
        "efficiency_vs_physical": round(min(eff_physical, 1.5), 4),
        "rollouts_per_s_1dev": round(batch_per_device / times[1], 2),
        "rollouts_per_s_ndev": round(
            batch_per_device * n_devices / times[n_devices], 2),
    }


def measure_vehicle_axis(n_devices: int = 8, amount: int = 8,
                         t_end: float = 1.0, beam: int = 64,
                         scenario_type: str = "circle") -> dict:
    """Strong-scaling efficiency on the vehicle (shard_map) axis."""
    import jax

    from pdmpc_tpu.config import Config, ScenarioType
    from pdmpc_tpu.experiment import create_scenario
    from pdmpc_tpu.models.mpa import build_mpa
    from pdmpc_tpu.parallel import sharded

    cfg = Config(scenario_type=ScenarioType(scenario_type), amount=amount,
                 T_end=t_end, beam_width=beam).validate()
    mpa = build_mpa(cfg)
    scenario = create_scenario(cfg, mpa)
    mpa_t, sc_t = mpa.to_tensors_for(cfg), scenario.to_tensors()

    times = {}
    for d in (1, n_devices):
        mesh = sharded.make_mesh(1, d, devices=jax.devices()[:d])
        run = sharded.make_sharded_run(cfg, mpa_t, sc_t, mesh)
        states = sharded.batched_initial_state(sc_t, cfg.Hp, 1)
        states = sharded.place_batched_state(states, mesh)
        times[d] = _time_run(run, states, mpa_t, sc_t)

    import os

    n_cores = os.cpu_count() or 1
    speedup = times[1] / times[n_devices]
    max_speedup = min(n_devices, n_cores)  # virtual devices share cores
    return {
        "axis": "vehicle(shard_map)",
        "mode": "strong",
        "n_devices": n_devices,
        "n_physical_cores": n_cores,
        "amount": amount,
        "t_1dev_s": round(times[1], 4),
        "t_ndev_s": round(times[n_devices], 4),
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / n_devices, 4),
        "efficiency_vs_physical": round(speedup / max_speedup, 4),
    }


def main() -> None:  # pragma: no cover - exercised via subprocess in bench
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--platform", default="cpu")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_num_cpu_devices", args.devices)

    out = {
        "data_parallel": measure_data_parallel(args.devices),
        "vehicle_axis": measure_vehicle_axis(args.devices),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
