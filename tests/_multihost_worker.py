"""Worker process for the multi-process jax.distributed tests.

Run by tests/test_multihost.py:

    python -m tests._multihost_worker <coordinator> <num_procs> <pid> \
        [scenario] [local_devices]

Plays the role of one NUC in the reference's parallel_physically mode
(nuc_control/deploy_nuc.sh:17 launches main_distributed(i) per host);
here every host runs the same sharded program over the global mesh.
Per-collective timings (the ``receive_from_others`` span analogue,
ControllerTiming.m) are measured over the actual cross-process mesh and
saved into the per-worker result file.
"""

from __future__ import annotations

import sys
import time


def _time_collectives(mesh, local_devices: int, n_iters: int = 20) -> dict:
    """Time the two collectives the controller step rides on along the
    vehicle axis: the per-level Predictions all_gather and the
    SolutionCost psum. Reference: the receive_from_others /
    publish_predictions spans of ControllerTiming.

    Whether the vehicle axis actually crosses OS processes depends on
    the topology (devices are process-ordered and the mesh is reshaped
    row-major): with 4 local devices a (2, 4) vehicle row is one
    process's devices (intra-process timings); with 2 local devices per
    process each row spans 2 processes (the LAN-DDS analogue). The
    record carries ``vehicle_axis_spans_processes`` so readers never
    mistake one for the other.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from pdmpc_tpu.parallel.sharded import shard_map

    n_veh_shards = mesh.shape["vehicle"]

    @jax.jit
    def gather_once(x):
        def f(xl):
            return jax.lax.all_gather(xl, "vehicle", tiled=True)

        return shard_map(f, mesh=mesh, in_specs=P(None, "vehicle"),
                         out_specs=P(None, None), check_vma=False)(x)

    @jax.jit
    def psum_once(x):
        def f(xl):
            return jax.lax.psum(xl, "vehicle")

        return shard_map(f, mesh=mesh, in_specs=P(None, "vehicle"),
                         out_specs=P(None, None), check_vma=False)(x)

    x = jnp.ones((4, n_veh_shards * 16), dtype=jnp.float32)
    out = {"vehicle_axis_spans_processes": n_veh_shards > local_devices}
    for name, fn in (("all_gather_vehicle", gather_once),
                     ("psum_vehicle", psum_once)):
        r = fn(x)
        r.block_until_ready()                       # compile
        t0 = time.perf_counter()
        for _ in range(n_iters):
            r = fn(x)
        r.block_until_ready()
        out[f"{name}_ms"] = round(
            (time.perf_counter() - t0) / n_iters * 1e3, 4
        )
    return out


def main() -> int:
    coordinator, num_procs, pid = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    scenario_type = sys.argv[4] if len(sys.argv) > 4 else "circle"
    local_devices = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from pdmpc_tpu.parallel.multihost import initialize_distributed

    initialize_distributed(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == local_devices * num_procs, f"global: {n_global}"
    assert n_local == local_devices

    import numpy as np

    import jax.numpy as jnp

    from pdmpc_tpu.config import Config, ScenarioType
    from pdmpc_tpu.controller import make_run
    from pdmpc_tpu.experiment import create_scenario
    from pdmpc_tpu.models.mpa import build_mpa
    from pdmpc_tpu.parallel import sharded
    from pdmpc_tpu.utils.timing import ControllerTiming

    cfg = Config(
        scenario_type=ScenarioType(scenario_type), amount=4, T_end=1.0,
        beam_width=64,
    ).validate()
    timing = ControllerTiming()
    timing.start("hlc_init_all")
    mpa = build_mpa(cfg)
    scenario = create_scenario(cfg, mpa)
    # commonroad exercises the hard path across processes: non-convex
    # outline obstacles + lanelet-boundary segments ride the
    # cross-process per-level collective
    mpa_t = mpa.to_tensors_for(cfg)
    sc_t = scenario.to_tensors()

    # scenario axis x vehicle axis. Devices are process-ordered and the
    # mesh reshapes row-major, so a (.., 4)-vehicle row crosses process
    # boundaries only when local_devices < 4: the 4-proc x 2-local test
    # makes the per-level prediction exchange ride the cross-process
    # collective (the reference's LAN DDS between NUCs); the 2-proc x
    # 4-local cases keep it intra-process and their timing records say so
    n_veh_shards = 4
    n_scen_shards = n_global // n_veh_shards
    mesh = sharded.make_mesh(n_scen_shards, n_veh_shards)
    run = sharded.make_sharded_run(cfg, mpa_t, sc_t, mesh)
    states0 = sharded.place_batched_state(
        sharded.batched_initial_state(sc_t, cfg.Hp, n_scen_shards), mesh
    )
    timing.stop("hlc_init_all")

    collective_ms = _time_collectives(mesh, local_devices)

    timing.start("control_loop")
    final_state, infos = run(states0, mpa_t, sc_t)
    pose_sum = float(jnp.sum(infos.poses))          # forces completion
    timing.stop("control_loop")
    fallbacks = int(jnp.sum(infos.needs_fallback))

    # reference invariant: distributed == sequential (systemtests run the
    # same config in both modes); the scenario batch is identical rollouts
    seq_run = jax.jit(make_run(cfg))
    from pdmpc_tpu.controller import initial_state

    _, seq_infos = seq_run(initial_state(sc_t, cfg.Hp), mpa_t, sc_t)
    seq_pose_sum = float(jnp.sum(seq_infos.poses))
    seq_fallbacks = int(jnp.sum(seq_infos.needs_fallback))

    b = n_scen_shards
    ok = (
        abs(pose_sum - b * seq_pose_sum) < 1e-2 * abs(seq_pose_sum)
        and fallbacks == b * seq_fallbacks
    )

    # persist the per-worker result incl. collective timings (the saved
    # ExperimentResult timing struct of the reference's distributed runs)
    import json
    import os

    out_dir = os.environ.get("PDMPC_MULTIHOST_OUT", "")
    if out_dir:
        record = {
            "pid": pid,
            "num_procs": num_procs,
            "mesh": {"scenario": n_scen_shards, "vehicle": n_veh_shards},
            "collective_timings": collective_ms,
            "timings": {
                k: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k, v in timing.get_all_timings().items()
            },
            "pose_sum": pose_sum,
            "fallbacks": fallbacks,
            "ok": ok,
        }
        with open(os.path.join(out_dir, f"worker_{pid}.json"), "w") as f:
            json.dump(record, f, indent=1)

    print(
        f"RESULT pid={pid} ok={ok} pose_sum={pose_sum:.4f} "
        f"seq{b}x={b * seq_pose_sum:.4f} fallbacks={fallbacks} "
        f"collectives={collective_ms}",
        flush=True,
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
