"""Benchmark: vehicle MPC solves/s/chip + p95 per-step planning latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline normalization: the reference deployment must complete one planning
step for every vehicle within the 200 ms control period
(/root/reference/config/Config.m:32) on its 20-NUC cluster — i.e. the whole
reference system sustains 20 vehicles / 0.2 s = 100 vehicle-MPC solves/s.
``vs_baseline`` = our solves/s on ONE chip divided by that 100 solves/s
cluster rate.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SOLVES_PER_S = 100.0  # 20 vehicles / 0.2 s real-time budget


def main():
    from pdmpc_tpu.config import Config, ScenarioType
    from pdmpc_tpu.controller import (
        initial_state,
        make_prioritized_step,
        make_run,
    )
    from pdmpc_tpu.models.mpa import build_mpa
    from pdmpc_tpu.scenarios.circle import create_circle_scenario

    n_vehicles = 10
    batch = 16
    t_end = 4.0

    cfg = Config(
        scenario_type=ScenarioType.circle,
        amount=n_vehicles,
        T_end=t_end,
        beam_width=256,
    ).validate()
    mpa = build_mpa(cfg)
    scenario = create_circle_scenario(cfg, mpa)
    mpa_t = mpa.to_tensors(convex=True)
    sc_t = scenario.to_tensors()

    # ---- throughput: batched full rollouts --------------------------------
    run = jax.jit(jax.vmap(make_run(cfg), in_axes=(0, None, None)))
    state0 = initial_state(sc_t, cfg.Hp)
    states0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (batch, *x.shape)), state0
    )
    # warmup/compile
    jax.block_until_ready(run(states0, mpa_t, sc_t))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(states0, mpa_t, sc_t)
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / reps
    solves = batch * n_vehicles * cfg.k_end
    solves_per_s = solves / elapsed

    # ---- latency: single-scenario per-step p95 ----------------------------
    step = jax.jit(
        lambda st, kk, m, sc: make_prioritized_step(cfg, m, sc)(st, kk)
    )
    st = state0
    jax.block_until_ready(
        step(st, jnp.asarray(0, dtype=jnp.int32), mpa_t, sc_t)
    )
    lat = []
    for k in range(30):
        t0 = time.perf_counter()
        st, _ = step(st, jnp.asarray(k % cfg.k_end, dtype=jnp.int32),
                     mpa_t, sc_t)
        jax.block_until_ready(st)
        lat.append(time.perf_counter() - t0)
    p95_ms = float(np.percentile(np.array(lat) * 1e3, 95))

    result = {
        "metric": "vehicle_mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        "extra": {
            "n_vehicles": n_vehicles,
            "batch": batch,
            "k_end": cfg.k_end,
            "p95_step_latency_ms": round(p95_ms, 2),
            "realtime_budget_ms": 200.0,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
