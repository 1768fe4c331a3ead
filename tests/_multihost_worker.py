"""Worker process for the 2-process jax.distributed test.

Run by tests/test_multihost.py:

    python -m tests._multihost_worker <coordinator> <num_procs> <pid>

Plays the role of one NUC in the reference's parallel_physically mode
(nuc_control/deploy_nuc.sh:17 launches main_distributed(i) per host);
here every host runs the same sharded program over the global mesh.
"""

from __future__ import annotations

import sys


def main() -> int:
    coordinator, num_procs, pid = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    scenario_type = sys.argv[4] if len(sys.argv) > 4 else "circle"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from pdmpc_tpu.parallel.multihost import initialize_distributed

    initialize_distributed(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 4 * num_procs, f"global devices: {n_global}"
    assert n_local == 4

    import jax.numpy as jnp

    from pdmpc_tpu.config import Config, ScenarioType
    from pdmpc_tpu.controller import make_run
    from pdmpc_tpu.experiment import create_scenario
    from pdmpc_tpu.models.mpa import build_mpa
    from pdmpc_tpu.parallel import sharded

    cfg = Config(
        scenario_type=ScenarioType(scenario_type), amount=4, T_end=1.0,
        beam_width=64,
    ).validate()
    mpa = build_mpa(cfg)
    scenario = create_scenario(cfg, mpa)
    # commonroad exercises the hard path across processes: non-convex
    # outline obstacles + lanelet-boundary segments ride the
    # cross-process per-level collective
    mpa_t = mpa.to_tensors_for(cfg)
    sc_t = scenario.to_tensors()

    # 2 scenario shards x 4 vehicle shards across both hosts: the vehicle
    # axis spans processes, so per-level prediction exchange rides the
    # cross-process collective (the reference's LAN DDS)
    mesh = sharded.make_mesh(2, 4)
    run = sharded.make_sharded_run(cfg, mpa_t, sc_t, mesh)
    states0 = sharded.place_batched_state(
        sharded.batched_initial_state(sc_t, cfg.Hp, 2), mesh
    )
    final_state, infos = run(states0, mpa_t, sc_t)

    # replicated scalar summaries are safe to fetch on every process
    pose_sum = float(jnp.sum(infos.poses))
    fallbacks = int(jnp.sum(infos.needs_fallback))

    # reference invariant: distributed == sequential (systemtests run the
    # same config in both modes); scenario batch is 2 identical rollouts
    seq_run = jax.jit(make_run(cfg))
    from pdmpc_tpu.controller import initial_state

    _, seq_infos = seq_run(initial_state(sc_t, cfg.Hp), mpa_t, sc_t)
    seq_pose_sum = float(jnp.sum(seq_infos.poses))
    seq_fallbacks = int(jnp.sum(seq_infos.needs_fallback))

    ok = (
        abs(pose_sum - 2.0 * seq_pose_sum) < 1e-2 * abs(seq_pose_sum)
        and fallbacks == 2 * seq_fallbacks
    )
    print(
        f"RESULT pid={pid} ok={ok} pose_sum={pose_sum:.4f} "
        f"seq2x={2 * seq_pose_sum:.4f} fallbacks={fallbacks}",
        flush=True,
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
