"""Benchmark: vehicle MPC solves/s/chip + p95 per-step planning latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config mirrors BASELINE.json's headline scenario: the 20-vehicle CPM road
network (the reference's default fleet on its lab map), plus a batched
rollout throughput measurement (the 1000+-concurrent-scenarios capability).

Baseline normalization: the reference deployment must complete one planning
step for every vehicle within the 200 ms control period
(/root/reference/config/Config.m:32) on its 20-NUC cluster — i.e. the whole
reference system sustains 20 vehicles / 0.2 s = 100 vehicle-MPC solves/s.
``vs_baseline`` = our solves/s on ONE chip divided by that 100 solves/s
cluster rate.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the remote TPU compile service latency is
# highly variable; warm caches make bench startup predictable
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_SOLVES_PER_S = 100.0  # 20 vehicles / 0.2 s real-time budget


def _build(scenario_type, n_vehicles, t_end, beam, priority="coloring"):
    from pdmpc_tpu.config import Config, PriorityStrategies, ScenarioType

    cfg = Config(
        scenario_type=ScenarioType(scenario_type),
        amount=n_vehicles,
        T_end=t_end,
        beam_width=beam,
        priority=(
            PriorityStrategies.coloring_priority
            if priority == "coloring"
            else PriorityStrategies.constant_priority
        ),
    ).validate()
    from pdmpc_tpu.experiment import create_scenario
    from pdmpc_tpu.models.mpa import build_mpa

    mpa = build_mpa(cfg)
    scenario = create_scenario(cfg, mpa)
    return cfg, mpa.to_tensors(convex=True), scenario.to_tensors()


def _throughput(cfg, mpa_t, sc_t, batch, reps=3):
    """Chained rollouts between two host-value fetches.

    Each repetition feeds the previous final state back as input, so the
    executions form a true data-dependent chain; the closing ``float()``
    fetch forces everything to complete (``block_until_ready`` through the
    tunneled device is not a reliable sync point, and identical inputs can
    be served from caches).
    """
    from pdmpc_tpu.controller import initial_state, make_run

    run = jax.jit(jax.vmap(make_run(cfg), in_axes=(0, None, None)))
    state0 = initial_state(sc_t, cfg.Hp)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (batch, *x.shape)), state0
    )
    states, _ = run(states, mpa_t, sc_t)            # compile + warm
    float(jnp.sum(states.pose))                     # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        states, _ = run(states, mpa_t, sc_t)
    float(jnp.sum(states.pose))                     # sync
    elapsed = (time.perf_counter() - t0) / reps
    return batch * cfg.amount * cfg.k_end / elapsed, elapsed


def _latency(cfg, mpa_t, sc_t, n_steps=30):
    from pdmpc_tpu.controller import initial_state, make_prioritized_step

    step = jax.jit(
        lambda st, kk, m, sc: make_prioritized_step(cfg, m, sc)(st, kk)
    )
    st = initial_state(sc_t, cfg.Hp)
    st2, _ = step(st, jnp.asarray(0, dtype=jnp.int32), mpa_t, sc_t)
    float(jnp.sum(st2.pose))                        # compile + sync
    lat = []
    for k in range(n_steps):
        t0 = time.perf_counter()
        st, _ = step(st, jnp.asarray(k % cfg.k_end, dtype=jnp.int32),
                     mpa_t, sc_t)
        float(jnp.sum(st.pose))                     # forced host fetch
        lat.append(time.perf_counter() - t0)
    arr = np.array(lat) * 1e3
    return float(np.percentile(arr, 95)), float(np.median(arr))


def main():
    batch = int(os.environ.get("PDMPC_BENCH_BATCH", "32"))

    # headline: 20-vehicle CPM road network (BASELINE.json config 3)
    cfg, mpa_t, sc_t = _build("commonroad", 20, 4.0, 256)
    solves_per_s, elapsed = _throughput(cfg, mpa_t, sc_t, batch)
    p95_ms, med_ms = _latency(cfg, mpa_t, sc_t)
    # deployment latency: the control loop runs on-device (lax.scan); the
    # per-step host fetch in _latency adds a ~27 ms tunnel round trip that
    # a real deployment never pays
    _, dev_elapsed = _throughput(cfg, mpa_t, sc_t, batch=1, reps=3)
    device_step_ms = dev_elapsed / cfg.k_end * 1e3

    result = {
        "metric": "vehicle_mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        "extra": {
            "scenario": "commonroad_20veh",
            "batch": batch,
            "k_end": cfg.k_end,
            "rollout_batch_seconds": round(elapsed, 4),
            "p95_step_latency_ms": round(p95_ms, 2),
            "median_step_latency_ms": round(med_ms, 2),
            "device_step_latency_ms": round(device_step_ms, 2),
            "realtime_budget_ms": 200.0,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
