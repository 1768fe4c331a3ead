"""Native C++ A* core tests: parity with the Python oracle and the TPU
beam search (reference CI compiles + exercises its MEX the same way,
.gitlab-ci.yml Build job)."""

import numpy as np
import pytest

from pdmpc_tpu.config import Config, MpaType, ScenarioType
from pdmpc_tpu.models import mpa as mpa_mod
from pdmpc_tpu.native import astar_plan_native, compile_native, native_available
from pdmpc_tpu.utils.astar_oracle import astar_plan


@pytest.fixture(scope="module")
def mpa_np():
    cfg = Config(scenario_type=ScenarioType.circle,
                 mpa_type=MpaType.single_speed)
    return mpa_mod.build_mpa(cfg)


def test_compiles():
    assert native_available()
    import os

    assert os.path.getsize(compile_native()) > 1000


def test_matches_python_oracle_free_space(mpa_np):
    dt = 0.2
    x0 = np.array([0.0, 0.0, 0.0])
    d = np.cumsum(np.full(6, 0.8 * dt))
    ref = np.stack([d, np.zeros(6)], axis=-1)
    v_ref = np.full(6, 0.8)
    obs = np.zeros((1, 6, 4, 2))
    mask = np.zeros((1, 6), dtype=bool)

    native = astar_plan_native(mpa_np, x0, 6, ref, v_ref, obs, mask, dt)
    oracle = astar_plan(mpa_np, x0, 6, ref, v_ref, obs, mask, dt)
    assert not native.is_exhausted
    assert native.cost == pytest.approx(oracle.cost, rel=1e-9)
    np.testing.assert_array_equal(native.trims, oracle.trims)
    np.testing.assert_allclose(native.poses, oracle.poses, atol=1e-12)


def test_matches_python_oracle_with_obstacle(mpa_np):
    dt = 0.2
    x0 = np.array([0.0, 0.0, 0.0])
    d = np.cumsum(np.full(6, 0.8 * dt))
    ref = np.stack([d, np.zeros(6)], axis=-1)
    v_ref = np.full(6, 0.8)
    obs = np.tile(
        np.array([[[0.35, -0.15], [0.65, -0.15], [0.65, 0.15],
                   [0.35, 0.15]]])[:, None],
        (1, 6, 1, 1),
    )
    mask = np.ones((1, 6), dtype=bool)

    native = astar_plan_native(mpa_np, x0, 6, ref, v_ref, obs, mask, dt)
    oracle = astar_plan(mpa_np, x0, 6, ref, v_ref, obs, mask, dt)
    assert native.cost == pytest.approx(oracle.cost, rel=1e-9)


def test_exhausted_when_boxed_in(mpa_np):
    dt = 0.2
    x0 = np.array([0.0, 0.0, 0.0])
    ref = np.stack([np.cumsum(np.full(6, 0.16)), np.zeros(6)], axis=-1)
    v_ref = np.full(6, 0.8)
    obs = np.tile(
        np.array([[[-60.0, -60.0], [60.0, -60.0], [60.0, 60.0],
                   [-60.0, 60.0]]])[:, None],
        (1, 6, 1, 1),
    )
    mask = np.ones((1, 6), dtype=bool)
    native = astar_plan_native(mpa_np, x0, 6, ref, v_ref, obs, mask, dt)
    assert native.is_exhausted


def test_native_is_fast(mpa_np):
    import time

    dt = 0.2
    x0 = np.array([0.0, 0.0, 0.0])
    d = np.cumsum(np.full(6, 0.8 * dt))
    ref = np.stack([d, np.zeros(6)], axis=-1)
    v_ref = np.full(6, 0.8)
    obs = np.zeros((1, 6, 4, 2))
    mask = np.zeros((1, 6), dtype=bool)
    astar_plan_native(mpa_np, x0, 6, ref, v_ref, obs, mask, dt)  # warm
    t0 = time.perf_counter()
    for _ in range(20):
        astar_plan_native(mpa_np, x0, 6, ref, v_ref, obs, mask, dt)
    per_solve = (time.perf_counter() - t0) / 20
    # native single-vehicle solve well under the reference's 200 ms budget
    assert per_solve < 0.05
