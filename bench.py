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


def _compile_with_retry(fn, *args):
    """First (compiling) invocation of a jitted fn with ONE retry.

    The tunnel's remote-compile service sporadically drops a request
    ("response body closed before all bytes were read"); a retry after a
    settle period rides that out — deterministic failures (shape errors,
    OOM) re-raise immediately. Used by every bench stage so a single
    dropped request cannot red the whole run.
    """
    for attempt in (0, 1):
        try:
            return fn(*args)
        except jax.errors.JaxRuntimeError as e:
            if attempt or "remote_compile" not in str(e):
                raise
            time.sleep(90)


def _build(scenario_type, n_vehicles, t_end, beam, priority="coloring",
           level_chunk=None, unroll_layers=None):
    """``level_chunk`` / ``unroll_layers``: execution knobs with
    bit-identical results (tests/test_sharded.py A/B,
    tests/test_controller.py). Chunk 2 + unrolled tail measures fastest
    for single-rollout latency; chunk 3 + scan tail for batched
    throughput (docs/PERF.md round-5 sweep)."""
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
        **({} if level_chunk is None else {"level_chunk": level_chunk}),
        **({} if unroll_layers is None
           else {"unroll_layers": unroll_layers}),
    ).validate()
    from pdmpc_tpu.experiment import create_scenario
    from pdmpc_tpu.models.mpa import build_mpa

    mpa = build_mpa(cfg)
    scenario = create_scenario(cfg, mpa)
    return cfg, mpa.to_tensors_for(cfg), scenario.to_tensors()


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
    states, _ = _compile_with_retry(run, states, mpa_t, sc_t)  # compile+warm
    float(jnp.sum(states.pose))                     # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        states, _ = run(states, mpa_t, sc_t)
    float(jnp.sum(states.pose))                     # sync
    elapsed = (time.perf_counter() - t0) / reps
    return batch * cfg.amount * cfg.k_end / elapsed, elapsed


def _throughput_chunked(cfg, mpa_t, sc_t, batch, chunk, reps=1):
    """Throughput at ``batch`` rollouts in ONE program, evaluated as
    ``batch/chunk`` sequential on-device chunks via ``lax.map``.

    Fallback only: since the sort-free coupling the fully concurrent
    cr20 program compiles through batch 1024; this path remains for
    rollout counts the remote-compile helper still rejects (2048+).
    Device-resident concurrency is ``chunk`` at a time — entries are
    labeled accordingly.
    """
    from pdmpc_tpu.controller import initial_state, make_run

    assert batch % chunk == 0, (
        f"batch={batch} must be a multiple of chunk={chunk} — a remainder "
        "would be silently dropped while still counted in throughput"
    )
    n_chunks = batch // chunk
    inner = jax.vmap(make_run(cfg), in_axes=(0, None, None))

    @jax.jit
    def run(states, m, sc):
        return jax.lax.map(lambda st: inner(st, m, sc), states)

    state0 = initial_state(sc_t, cfg.Hp)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None, None], (n_chunks, chunk, *x.shape)),
        state0,
    )
    states, _ = _compile_with_retry(run, states, mpa_t, sc_t)
    float(jnp.sum(states.pose))
    t0 = time.perf_counter()
    for _ in range(reps):
        states, _ = run(states, mpa_t, sc_t)
    float(jnp.sum(states.pose))
    elapsed = (time.perf_counter() - t0) / reps
    return batch * cfg.amount * cfg.k_end / elapsed, elapsed


def _batch_curve(cfg, mpa_t, sc_t, batches=(32, 128, 512, 1024)):
    """Throughput vs rollout batch — the 1000+-concurrent-rollouts story.

    Small batches run 3 chained reps: their ~0.3-1.5 s timing windows
    are jitter-dominated through the tunnel (measured spread at batch 32
    with reps=1: 3.6k-9.4k solves/s across bench runs). Large batches
    are long enough for one rep. OOM at a batch size is recorded and
    the curve stops there.
    """
    curve = []
    for b in batches:
        try:
            solves, elapsed = _throughput(cfg, mpa_t, sc_t, b,
                                          reps=3 if b <= 128 else 1)
            curve.append({
                "batch": b,
                "solves_per_s": round(solves, 1),
                "rollouts": b,
                "seconds": round(elapsed, 3),
            })
        except Exception as e:  # noqa: BLE001 — HBM OOM stops the sweep
            curve.append({"batch": b, "error": type(e).__name__})
            break
    return curve


def _device_p95(cfg, mpa_t, sc_t, n_chains=10):
    """Per-step device latency: p95 over chained-rollout samples.

    Each sample is one full k_end-step on-device rollout (lax.scan, no
    per-step host round trip — the deployment execution mode) divided by
    k_end. The host-fetch-per-step numbers are reported separately; they
    include the ~27 ms tunnel round trip a deployment never pays.
    """
    from pdmpc_tpu.controller import initial_state, make_run

    run = jax.jit(make_run(cfg))
    state = initial_state(sc_t, cfg.Hp)
    state, _ = _compile_with_retry(run, state, mpa_t, sc_t)
    float(jnp.sum(state.pose))                      # compile + sync
    samples = []
    for _ in range(n_chains):
        t0 = time.perf_counter()
        state, _ = run(state, mpa_t, sc_t)
        float(jnp.sum(state.pose))
        samples.append((time.perf_counter() - t0) / cfg.k_end * 1e3)
    arr = np.array(samples)
    return float(np.percentile(arr, 95)), float(np.median(arr))


def _host_loop_latency(amount=20, t_end=4.0, beam=256):
    """Deployment-shaped real-time demo: the HOST loop (hlc.run_with_plant,
    per-step measure -> jitted plan -> apply through the SimulationPlant)
    on cr20, wall-clock per step vs the 200 ms control budget
    (/root/reference/config/Config.m:32). Includes the ~27 ms tunnel round
    trip per step that a locally-attached deployment never pays."""
    from pdmpc_tpu import hlc
    from pdmpc_tpu.config import Config, PriorityStrategies, ScenarioType

    cfg = Config(
        scenario_type=ScenarioType.commonroad, amount=amount, T_end=t_end,
        beam_width=beam, priority=PriorityStrategies.coloring_priority,
    )
    try:
        res = hlc.run_with_plant(cfg)
        t = res.timings
        spans = []
        for name in ("measure", "plan", "apply"):
            arr = np.asarray(t[name], dtype=float)
            spans.append(arr[1])
        per_step = np.nansum(spans, axis=0) * 1e3          # ms
        warm = per_step[1:]                                # step 0 compiles
        return {
            "scenario": f"commonroad_{amount:02d}veh",
            "n_steps": int(len(per_step)),
            "host_loop_p95_ms": round(float(np.percentile(warm, 95)), 2),
            "host_loop_median_ms": round(float(np.median(warm)), 2),
            "first_step_ms_incl_compile": round(float(per_step[0]), 1),
            "realtime_budget_ms": 200.0,
            "note": "per-step host fetch includes ~27 ms tunnel round trip",
        }
    except Exception as e:  # noqa: BLE001 — bench must still print
        return {"error": type(e).__name__, "detail": str(e)[:200]}


def _mixed64(amount=64, t_end=2.0, beam=128):
    """64-vehicle mixed road/free-space fleet ON the TPU (BASELINE.json
    config 4; CPU CI covers the 16-vehicle point in tests/test_mixed.py),
    asserted collision-free and deadlock-free."""
    from pdmpc_tpu.experiment import run_experiment
    from tests.test_controller import pairwise_vehicle_collisions

    from pdmpc_tpu.config import Config, ScenarioType

    try:
        cfg = Config(
            scenario_type=ScenarioType.mixed, amount=amount, T_end=t_end,
            beam_width=beam,
        ).validate()
        t0 = time.perf_counter()
        res = _compile_with_retry(run_experiment, cfg)
        elapsed = time.perf_counter() - t0
        poses = np.asarray(res.infos.poses)[:, :, 0]
        moved = np.linalg.norm(poses[-1, :, :2] - poses[0, :, :2], axis=-1)
        collisions = pairwise_vehicle_collisions(res)
        out = {
            "scenario": f"mixed_{amount}veh", "n_vehicles": amount,
            "k_end": cfg.k_end,
            "collision_free": collisions == [],
            "n_collisions": len(collisions),
            "deadlock_free": bool((moved > 0.2).all()),
            "min_moved_m": round(float(moved.min()), 3),
            "fallback_rate": round(
                float(np.asarray(res.infos.needs_fallback).mean()), 4),
            "wall_s_incl_compile": round(elapsed, 1),
        }
        out["ok"] = out["collision_free"] and out["deadlock_free"]
        return out
    except Exception as e:  # noqa: BLE001 — bench must still print
        return {"error": type(e).__name__, "detail": str(e)[:200]}


def _family_mode_extras(batch=32):
    """Throughput spot-checks beyond the headline config: the other two
    MPA families (choose_trims.m:37,85) and the two priority-voting
    controllers (PrioritizedOptimal/ExplorativeController) — evidence the
    specialty modes carry the same perf character, not just the default
    path."""
    from pdmpc_tpu.config import (
        Config, MpaType, PriorityStrategies, ScenarioType,
    )
    from pdmpc_tpu.experiment import create_scenario
    from pdmpc_tpu.models.mpa import build_mpa

    cases = {
        "triple_speed_circle4": Config(
            scenario_type=ScenarioType.circle, amount=4, T_end=1.0,
            beam_width=128, mpa_type=MpaType.triple_speed,
        ),
        "realistic_circle4": Config(
            scenario_type=ScenarioType.circle, amount=4, T_end=1.0,
            beam_width=128, mpa_type=MpaType.realistic,
        ),
        "optimal_priority_cr4": Config(
            scenario_type=ScenarioType.commonroad, amount=4, T_end=1.0,
            beam_width=64, priority=PriorityStrategies.optimal_priority,
        ),
        "explorative_priority_cr4": Config(
            scenario_type=ScenarioType.commonroad, amount=4, T_end=1.0,
            beam_width=64,
            priority=PriorityStrategies.explorative_priority,
        ),
    }
    out = {}
    for name, cfg in cases.items():
        try:
            cfg = cfg.validate()
            mpa = build_mpa(cfg)
            sc = create_scenario(cfg, mpa)
            solves, elapsed = _throughput(
                cfg, mpa.to_tensors_for(cfg), sc.to_tensors(), batch=batch,
                reps=1,
            )
            out[name] = {
                "solves_per_s": round(solves, 1), "batch": batch,
                "k_end": cfg.k_end, "n_trims": mpa.n_trims,
            }
        except Exception as e:  # noqa: BLE001 — bench must still print
            out[name] = {"error": type(e).__name__, "detail": str(e)[:120]}
    return out


def _mesh_scaling(n_devices=8, timeout_s=600):
    """Scaling efficiency on a virtual CPU mesh (subprocess: the preloaded
    TPU backend in this process cannot be re-platformed)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pdmpc_tpu.parallel.scaling",
             "--devices", str(n_devices)],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = proc.stdout.strip().splitlines()[-1]
        return json.loads(line)
    except Exception as e:  # noqa: BLE001 — bench must still print its line
        return {"error": type(e).__name__}


def _golden_crosscheck():
    """Run the 3-vehicle commonroad golden scenario ON THIS DEVICE and
    check it (a) exactly matches the committed TPU golden and (b) is
    behaviorally equivalent to the CPU golden.

    The bench is the only TPU-executed surface, so this is where
    TPU-specific numeric drift (e.g. an MXU bf16 default flipping SAT
    margins, commit 37b76f5) must fail loudly. Two layers because f32
    XLA:CPU and XLA:TPU are NOT bit-stable through discrete decisions
    (trig/FMA ulps flip exact-touch SAT margins on the shared trim
    lattice — measured: one trim flip at step 4 of cr3 from a
    bit-identical state); per-backend trajectories ARE deterministic, so
    the TPU golden is exact while the CPU comparison asserts behavioral
    equivalence (fallback pattern, total cost within 1%).
    Regenerate the TPU golden with
    `python -m tests.replace_expected_results --tpu` after INTENDED
    behavior changes (docs in tests/golden.py).
    """
    import numpy as np

    from pdmpc_tpu.experiment import run_experiment
    from tests.golden import compare_golden, golden_path
    from tests.test_system_commonroad import (
        GOLDEN_CONFIGS,
        TPU_GOLDEN_CONFIGS,
    )

    out = {"scenario": "commonroad_03veh"}
    try:
        res = _compile_with_retry(
            run_experiment, GOLDEN_CONFIGS["commonroad_03veh"]
        )
        compare_golden("commonroad_03veh_tpu", res)
        out["tpu_golden_exact"] = True
        with np.load(golden_path("commonroad_03veh")) as g:  # CPU golden
            fb_cpu = g["needs_fallback"]
            cost_cpu = float(g["cost"].sum()) if "cost" in g else None
        fb_tpu = np.asarray(res.infos.needs_fallback)
        assert (fb_tpu == fb_cpu).all(), "fallback pattern differs from CPU"
        out["fallbacks_match_cpu"] = True
        from tests.test_controller import pairwise_vehicle_collisions

        assert pairwise_vehicle_collisions(res) == [], (
            "on-device run has vehicle collisions"
        )
        out["collision_free"] = True
        if cost_cpu is not None:
            # informational: near-tie flips legitimately change the chosen
            # plan and hence cost across backends (tests/golden.py policy)
            cost_tpu = float(np.asarray(res.infos.cost).sum())
            out["cost_vs_cpu_rel"] = round(
                abs(cost_tpu - cost_cpu) / max(abs(cost_cpu), 1e-9), 6
            )
        # the HEADLINE configuration (cr20 coloring, beam 256) gated by its
        # own TPU golden — a drift on the coloring path must fail the bench,
        # not just the easy cr3 constant-priority config (VERDICT r4 weak 2;
        # the reference gates every mode through the same goldens,
        # tests/systemtests/systemtests.m:3-14)
        res20 = _compile_with_retry(
            run_experiment,
            TPU_GOLDEN_CONFIGS["commonroad_20veh_coloring"],
        )
        compare_golden("commonroad_20veh_coloring_tpu", res20)
        out["coloring20_golden_exact"] = True
        assert pairwise_vehicle_collisions(res20) == [], (
            "headline coloring run has vehicle collisions on device"
        )
        out["coloring20_collision_free"] = True
        out["ok"] = True
        return out
    except Exception as e:  # noqa: BLE001 — bench must still print its
        # JSON lines even if the heavy golden runs die on a runtime error
        # (e.g. a repeated remote-compile drop); AssertionError means
        # drift, anything else is an execution failure — both red the
        # gate but neither may swallow the compact summary line
        out["ok"] = False
        out["error"] = type(e).__name__
        out["detail"] = str(e)[:500]
        return out


def _latency(cfg, mpa_t, sc_t, n_steps=30):
    from pdmpc_tpu.controller import initial_state, make_prioritized_step

    step = jax.jit(
        lambda st, kk, m, sc: make_prioritized_step(cfg, m, sc)(st, kk)
    )
    st = initial_state(sc_t, cfg.Hp)
    st2, _ = _compile_with_retry(
        step, st, jnp.asarray(0, dtype=jnp.int32), mpa_t, sc_t
    )
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


def _compact_summary(result: dict) -> dict:
    """Derive the <1 KB final summary line from the full bench record.

    The driver's stdout capture keeps only a ~4 KB tail; this line,
    printed LAST, is what it parses — it must stay small no matter how
    the full record grows (tested in tests/test_bench.py).
    """
    extra = result.get("extra", {})
    scaling = extra.get("mesh_scaling_8dev_cpu", {})
    curve = extra.get("batch_scaling_curve", [])
    return {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
        "summary": {
            "headline_batch": extra.get("headline_run", {}).get("batch"),
            "device_step_p95_ms": extra.get("device_step_p95_ms"),
            "device_step_median_ms": extra.get("device_step_median_ms"),
            "host_loop_p95_ms": extra.get("host_loop", {}).get(
                "host_loop_p95_ms"),
            "tpu_golden_ok": extra.get("tpu_vs_golden", {}).get(
                "ok", False),
            "mixed64_ok": extra.get("mixed_64veh", {}).get("ok", False),
            "mesh_vehicle_axis_eff": (
                scaling.get("vehicle_axis", {}).get(
                    "efficiency_vs_physical")
                if isinstance(scaling, dict) else None
            ),
            "monte_carlo_solves_per_s": extra.get(
                "monte_carlo_4096_rollouts", {}).get("solves_per_s"),
            "batch_curve": [
                {k: c[k] for k in ("batch", "solves_per_s", "error")
                 if k in c}
                for c in curve[:6]
            ],
            "full_record": "results/bench_full.json",
        },
    }


def main():
    batch = int(os.environ.get("PDMPC_BENCH_BATCH", "32"))
    max_curve_batch = int(os.environ.get("PDMPC_BENCH_MAX_BATCH", "1024"))

    # headline: 20-vehicle CPM road network (BASELINE.json config 3)
    cfg, mpa_t, sc_t = _build("commonroad", 20, 4.0, 256)
    solves_per_s, elapsed = _throughput(cfg, mpa_t, sc_t, batch)
    p95_ms, med_ms = _latency(cfg, mpa_t, sc_t)
    # deployment latency: the control loop runs on-device (lax.scan); the
    # per-step host fetch in _latency adds a ~27 ms tunnel round trip that
    # a real deployment never pays
    dev_p95_ms, dev_med_ms = _device_p95(cfg, mpa_t, sc_t)

    # throughput curve to 1024+ rollouts: shorter horizon (the per-step
    # cost is horizon-independent after warmup; 1024 x 20 steps would
    # dominate bench wall time). Chunk width 3 measures fastest for
    # batched rollouts (bit-identical results). Since the sort-free
    # coupling landed, the fully concurrent cr20 program compiles at
    # batch 1024 (the round-4 remote-compile rejection is gone); the
    # lax.map chunked mode remains as fallback only.
    curve_cfg, curve_mpa, curve_sc = _build("commonroad", 20, 1.0, 256,
                                            level_chunk=3,
                                            unroll_layers=False)
    batches = tuple(b for b in (32, 128, 512, 1024)
                    if b <= max_curve_batch)
    curve = _batch_curve(curve_cfg, curve_mpa, curve_sc, batches)
    if any(c.get("batch") == 1024 and "error" in c for c in curve):
        try:
            s1024, e1024 = _throughput_chunked(
                curve_cfg, curve_mpa, curve_sc, 1024, 512)
            curve[-1] = {
                "batch": 1024, "solves_per_s": round(s1024, 1),
                "rollouts": 1024, "seconds": round(e1024, 3),
                "mode": "one program, lax.map 2x512 chunks",
            }
        except Exception as e:  # noqa: BLE001 — replace the concurrent
            # failure entry rather than appending a second 1024 row
            curve[-1] = {"batch": 1024, "error": type(e).__name__,
                         "mode": "chunked fallback also failed"}
    try:
        mc_cfg, mc_mpa, mc_sc = _build("circle", 4, 1.0, 64)
        s_mc, e_mc = _throughput(mc_cfg, mc_mpa, mc_sc, 4096, reps=1)
        monte_carlo = {
            "scenario": "circle_4veh", "batch": 4096,
            "solves_per_s": round(s_mc, 1), "seconds": round(e_mc, 3),
            "mode": "fully concurrent rollouts",
        }
    except Exception as e:  # noqa: BLE001
        monte_carlo = {"error": type(e).__name__}
    scaling = _mesh_scaling()
    host_loop = _host_loop_latency()
    mixed64 = _mixed64()
    families = _family_mode_extras()
    golden_check = _golden_crosscheck()
    # speed-of-light: per-kernel achieved vs roofline on THIS device
    # (BASELINE.json "measure rollout+solve kernels at speed-of-light per
    # chip"); set PDMPC_BENCH_SOL=0 to skip
    if os.environ.get("PDMPC_BENCH_SOL", "1") != "0":
        try:
            from tools.speed_of_light import measure as _sol_measure

            sol = _sol_measure(device_step_seconds=dev_med_ms / 1e3)
        except Exception as e:  # noqa: BLE001 — bench must still print
            sol = {"error": type(e).__name__, "detail": str(e)[:200]}
    else:
        sol = {"skipped": True}

    # Headline candidates carry their own metadata so the published number
    # and its configuration always agree; lax.map-chunked entries (not
    # fully concurrent) are excluded from headline eligibility.
    candidates = [{
        "scenario": "commonroad_20veh", "batch": batch,
        "k_end": cfg.k_end, "T_end": cfg.T_end,
        "mode": "fully concurrent rollouts",
        "solves_per_s": round(solves_per_s, 1),
        "seconds": round(elapsed, 3),
    }]
    for c in curve:
        if "solves_per_s" in c and "mode" not in c:
            candidates.append({
                "scenario": "commonroad_20veh", "batch": c["batch"],
                "k_end": curve_cfg.k_end, "T_end": curve_cfg.T_end,
                "mode": "fully concurrent rollouts",
                "solves_per_s": c["solves_per_s"],
                "seconds": c["seconds"],
            })
    headline_run = max(candidates, key=lambda c: c["solves_per_s"])
    headline = headline_run["solves_per_s"]
    result = {
        "metric": "vehicle_mpc_solves_per_s_per_chip",
        "value": round(headline, 1),
        "unit": "solves/s",
        "vs_baseline": round(headline / BASELINE_SOLVES_PER_S, 2),
        "extra": {
            "headline_run": headline_run,
            "scenario": "commonroad_20veh",
            "batch": batch,
            "k_end": cfg.k_end,
            "rollout_batch_seconds": round(elapsed, 4),
            "p95_step_latency_ms_host_fetch": round(p95_ms, 2),
            "median_step_latency_ms_host_fetch": round(med_ms, 2),
            "device_step_p95_ms": round(dev_p95_ms, 2),
            "device_step_median_ms": round(dev_med_ms, 2),
            "realtime_budget_ms": 200.0,
            "batch_scaling_curve": curve,
            "monte_carlo_4096_rollouts": monte_carlo,
            "mesh_scaling_8dev_cpu": scaling,
            "host_loop": host_loop,
            "mixed_64veh": mixed64,
            "mpa_families_and_modes": families,
            "sol_utilization": sol,
            "tpu_vs_golden": golden_check,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    # Persist the full record as an artifact (cf. the reference's computed,
    # persisted result files, /root/reference/eval/eval_phd/eval_phd.m:51-66)
    try:
        os.makedirs("results", exist_ok=True)
        with open("results/bench_full.json", "w") as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass
    # The driver keeps only a ~4 KB tail of stdout; the full JSON line above
    # is far larger, so a truncated fragment is all that survives. Print a
    # compact (<1 KB) summary LAST so the captured tail always ends with a
    # parseable headline (BENCH_r03/r04 both recorded parsed:null).
    print(json.dumps(_compact_summary(result)))
    if not golden_check.get("ok", False):
        print("FAIL: on-device trajectories drifted from the stored golden",
              file=sys.stderr)
        return 1
    if not mixed64.get("ok", False):
        # behavioral TPU gate for the 64-vehicle mixed fleet: the bench is
        # red if the big fleet collides or deadlocks on device
        print("FAIL: 64-vehicle mixed run not collision/deadlock-free: "
              f"{json.dumps(mixed64)[:400]}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
