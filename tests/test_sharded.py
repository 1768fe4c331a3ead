"""Distributed-execution tests on a virtual 8-device CPU mesh.

The reference's key invariant: distributed execution (parallel_threads /
parallel_physically) produces the same trajectories as the sequential
in-process schedule (tests/systemtests run both against the same goldens).
Here: the vehicle-sharded shard_map program must equal the single-program
run bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.config import Config, ScenarioType
from pdmpc_tpu.controller import initial_state, make_run
from pdmpc_tpu.models.mpa import build_mpa
from pdmpc_tpu.parallel import sharded
from pdmpc_tpu.scenarios.circle import create_circle_scenario

N_VEH = 4
BATCH = 2
STEPS = 3


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        scenario_type=ScenarioType.circle,
        amount=N_VEH,
        T_end=STEPS * 0.2,
        beam_width=64,
    ).validate()
    mpa = build_mpa(cfg)
    scenario = create_circle_scenario(cfg, mpa)
    return cfg, mpa.to_tensors(convex=True), scenario.to_tensors()


def test_sharded_equals_sequential(setup):
    cfg, mpa_t, sc_t = setup
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"

    # single-program reference
    run = jax.jit(jax.vmap(make_run(cfg), in_axes=(0, None, None)))
    states0 = sharded.batched_initial_state(sc_t, cfg.Hp, BATCH)
    final_ref, infos_ref = jax.block_until_ready(run(states0, mpa_t, sc_t))

    # vehicle+scenario sharded program
    mesh = sharded.make_mesh(2, 4)
    run_sh = sharded.make_sharded_run(cfg, mpa_t, sc_t, mesh)
    states0_sh = sharded.place_batched_state(states0, mesh)
    final_sh, infos_sh = jax.block_until_ready(
        run_sh(states0_sh, mpa_t, sc_t)
    )

    np.testing.assert_allclose(
        np.asarray(final_ref.pose), np.asarray(final_sh.pose),
        rtol=0, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(infos_ref.trims), np.asarray(infos_sh.trims)
    )
    np.testing.assert_allclose(
        np.asarray(infos_ref.poses), np.asarray(infos_sh.poses),
        rtol=0, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(infos_ref.levels), np.asarray(infos_sh.levels)
    )


def test_data_parallel_runs(setup):
    cfg, mpa_t, sc_t = setup
    mesh = sharded.make_mesh(8, 1)
    run_dp = sharded.make_data_parallel_run(cfg, mpa_t, sc_t, mesh)
    states0 = sharded.batched_initial_state(sc_t, cfg.Hp, 8)
    final, infos = jax.block_until_ready(run_dp(states0, mpa_t, sc_t))
    assert np.asarray(final.pose).shape == (8, N_VEH, 3)
    # all batch entries identical (same initial state)
    p = np.asarray(infos.poses)
    np.testing.assert_allclose(p[0], p[-1], atol=1e-6)
