"""Centralized (joint product-space) controller tests.

Reference: hlc/controller/centralized/CentralizedController.m — single
optimizer call over the joint multi-vehicle MPA product space.
"""

import numpy as np
import pytest

from pdmpc_tpu.config import Config, ScenarioType
from pdmpc_tpu.experiment import run_experiment
from tests.test_controller import pairwise_vehicle_collisions


@pytest.fixture(scope="module")
def result():
    cfg = Config(
        scenario_type=ScenarioType.circle,
        amount=2,
        T_end=3.0,
        beam_width=320,
        is_prioritized=False,
    )
    return run_experiment(cfg)


def test_head_on_passes(result):
    poses = np.asarray(result.infos.poses)[:, :, 0]
    d = np.linalg.norm(poses[-1, :, :2] - poses[0, :, :2], axis=-1)
    assert (d > 2.0).all()
    assert not np.asarray(result.infos.is_exhausted).any()


def test_no_collisions(result):
    assert pairwise_vehicle_collisions(result) == []


def test_no_coupling_graph(result):
    # centralized mode has no sequential couplings / levels
    assert not np.asarray(result.infos.directed_sequential).any()
    assert (np.asarray(result.infos.levels) == 1).all()


def test_product_space_guard():
    from pdmpc_tpu.ops.search_centralized import plan_centralized
    from pdmpc_tpu.models.mpa import build_mpa

    cfg = Config(
        scenario_type=ScenarioType.circle, amount=6, beam_width=512,
        is_prioritized=False,
    )
    mpa = build_mpa(cfg).to_tensors()
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="product space too large"):
        plan_centralized(
            mpa,
            jnp.zeros((6, 3)),
            jnp.zeros((6,), dtype=jnp.int32),
            jnp.zeros((6, 6, 2)),
            jnp.zeros((6, 6)),
            0.2,
            512,
        )
