"""Sharded execution: the distributed run modes.

Maps the reference's computation modes (config/enums/ComputationMode.m) onto
device meshes:

- ``sequential``            -> single-program level loop (controller.py)
- ``parallel_threads``      -> vehicles sharded over a mesh axis via
  ``shard_map``; the per-vehicle MATLAB processes + DDS topics become
  vehicle shards + ``all_gather`` collectives (parallel/comm.MeshComm)
- ``parallel_physically``   -> the same program on a multi-host mesh
  (``jax.distributed``); DCN replaces the lab's LAN

plus scenario-batch data parallelism (no reference analogue: thousands of
concurrent rollouts, BASELINE.json).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from pdmpc_tpu.config import Config
from pdmpc_tpu.controller import (
    StepInfo,
    StepState,
    initial_state,
    make_prioritized_step,
)
from pdmpc_tpu.models.mpa import MpaTensors
from pdmpc_tpu.parallel.comm import MeshComm
from pdmpc_tpu.scenarios.scenario import ScenarioTensors

try:  # JAX >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

SCENARIO_AXIS = "scenario"
VEHICLE_AXIS = "vehicle"


def make_mesh(n_scenario_shards: int, n_vehicle_shards: int,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    need = n_scenario_shards * n_vehicle_shards
    assert len(devices) >= need, (
        f"need {need} devices, have {len(devices)}"
    )
    dev = np.asarray(devices[:need]).reshape(
        n_scenario_shards, n_vehicle_shards
    )
    return Mesh(dev, (SCENARIO_AXIS, VEHICLE_AXIS))


def make_sharded_run(cfg: Config, mpa: MpaTensors, scenario: ScenarioTensors,
                     mesh: Mesh, n_steps: int | None = None):
    """Batched, fully sharded receding-horizon run.

    Input/output state is [B, N, ...] sharded as (scenario, vehicle);
    vehicles exchange per-level predictions via ``all_gather`` along the
    vehicle axis inside the step (controller.py with MeshComm).
    """
    n = scenario.n_vehicles
    steps = n_steps if n_steps is not None else cfg.k_end

    def run_block(states: StepState, mpa_t: MpaTensors,
                  sc_t: ScenarioTensors):
        # states leaves: [B_local, n_local, ...]; mpa/scenario replicated
        step = make_prioritized_step(
            cfg, mpa_t, sc_t,
            comm_factory=lambda: MeshComm(n, VEHICLE_AXIS),
        )

        def run_one(state: StepState):
            return jax.lax.scan(
                step, state, jnp.arange(steps, dtype=jnp.int32)
            )

        return jax.vmap(run_one)(states)

    state_spec = jax.tree.map(
        lambda _: P(SCENARIO_AXIS, VEHICLE_AXIS), initial_state(scenario, cfg.Hp)
    )
    per_vehicle = P(SCENARIO_AXIS, None, VEHICLE_AXIS)
    replicated = P(SCENARIO_AXIS)
    info_spec = StepInfo(
        poses=per_vehicle,
        trims=per_vehicle,
        shapes=per_vehicle,
        cost=per_vehicle,
        needs_fallback=per_vehicle,
        is_exhausted=per_vehicle,
        n_expanded=per_vehicle,
        adjacency=replicated,
        directed_coupling=replicated,
        directed_sequential=replicated,
        levels=replicated,
        priorities=replicated,
        reference_points=per_vehicle,
        priority_permutation=per_vehicle,
    )

    rep_mpa = jax.tree.map(lambda _: P(), mpa)
    rep_sc = jax.tree.map(lambda _: P(), scenario)
    sharded = shard_map(
        run_block,
        mesh=mesh,
        in_specs=(state_spec, rep_mpa, rep_sc),
        out_specs=(state_spec, info_spec),
        check_vma=False,
    )
    # returned callable takes the tensor bundles as arguments (embedding
    # them as constants would poison TPU compile time)
    return jax.jit(sharded)


def batched_initial_state(scenario: ScenarioTensors, hp: int,
                          batch: int) -> StepState:
    state0 = initial_state(scenario, hp)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (batch, *x.shape)), state0
    )


def place_batched_state(states: StepState, mesh: Mesh) -> StepState:
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS, VEHICLE_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), states)


def make_data_parallel_run(cfg: Config, mpa: MpaTensors,
                           scenario: ScenarioTensors, mesh: Mesh,
                           n_steps: int | None = None):
    """Scenario-only data parallelism: every device runs whole scenarios.

    The embarrassingly parallel axis (the main throughput lever,
    SURVEY §7): jit with sharding-annotated inputs, XLA partitions
    automatically.
    """
    from pdmpc_tpu.controller import make_run

    del n_steps
    run = make_run(cfg)
    batched = jax.vmap(run, in_axes=(0, None, None))
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    return jax.jit(
        batched,
        in_shardings=(
            jax.tree.map(lambda _: sharding, initial_state(scenario, cfg.Hp)),
            None,
            None,
        ),
    )
