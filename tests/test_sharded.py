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


class TestShardedHardPath:
    """distributed == sequential on the HARD path: commonroad (non-convex
    outlines + lanelet-boundary segments) with an HDV — the reference runs
    ALL computation modes against the same goldens
    (tests/systemtests/systemtests.m:8). Also the compact-level scheduler
    A/B: level_chunk in {1, 2, n} and the MeshComm dense sweep must all be
    bit-identical."""

    @pytest.fixture(scope="class")
    def setup_cr(self):
        from pdmpc_tpu.config import ManualControlConfig
        from pdmpc_tpu.experiment import create_scenario

        cfg = Config(
            scenario_type=ScenarioType.commonroad,
            amount=4,
            T_end=STEPS * 0.2,
            beam_width=96,
            manual_control_config=ManualControlConfig(
                is_active=True, amount=1, hdv_ids=(3,)
            ),
        ).validate()
        assert cfg.use_non_convex_obstacles
        mpa = build_mpa(cfg)
        scenario = create_scenario(cfg, mpa)
        return cfg, mpa.to_tensors_for(cfg), scenario.to_tensors()

    def test_mesh_and_compact_variants_bit_equal(self, setup_cr):
        import dataclasses

        cfg, mpa_t, sc_t = setup_cr
        assert len(jax.devices()) >= 8

        results = {}
        # compact-level single-program path at chunk widths 1 (pure
        # sequential), 3 (mixed fill), n (one chunk per level, maximal
        # padding), and None (the default, 2); plus the dense MeshComm
        # sweep — all must be bit-identical
        for chunk in (1, 3, cfg.amount, None):
            cfg_c = dataclasses.replace(cfg, level_chunk=chunk)
            run = jax.jit(jax.vmap(make_run(cfg_c), in_axes=(0, None, None)))
            states0 = sharded.batched_initial_state(sc_t, cfg.Hp, BATCH)
            results[f"chunk_{chunk}"] = jax.block_until_ready(
                run(states0, mpa_t, sc_t)
            )

        mesh = sharded.make_mesh(2, 4)
        run_sh = sharded.make_sharded_run(cfg, mpa_t, sc_t, mesh)
        states0_sh = sharded.place_batched_state(
            sharded.batched_initial_state(sc_t, cfg.Hp, BATCH), mesh
        )
        results["mesh_dense"] = jax.block_until_ready(
            run_sh(states0_sh, mpa_t, sc_t)
        )

        ref_final, ref_infos = results["chunk_None"]
        for name, (final, infos) in results.items():
            np.testing.assert_array_equal(
                np.asarray(ref_infos.trims), np.asarray(infos.trims),
                err_msg=f"trims differ: {name}",
            )
            np.testing.assert_allclose(
                np.asarray(ref_infos.poses), np.asarray(infos.poses),
                rtol=0, atol=1e-6, err_msg=f"poses differ: {name}",
            )
            np.testing.assert_array_equal(
                np.asarray(ref_infos.needs_fallback),
                np.asarray(infos.needs_fallback),
                err_msg=f"fallbacks differ: {name}",
            )
            np.testing.assert_array_equal(
                np.asarray(ref_infos.levels), np.asarray(infos.levels),
                err_msg=f"levels differ: {name}",
            )
            np.testing.assert_allclose(
                np.asarray(ref_final.pose), np.asarray(final.pose),
                rtol=0, atol=1e-6, err_msg=f"final pose differs: {name}",
            )
