"""Pairwise parameter-matrix system tests with stored goldens.

The reference runs a pairwise combination matrix over scenario x mpa x
optimizer x computation_mode x coupling x priority x weight against golden
results (tests/systemtests/systemtests.m:3-14, ParameterCombination =
'pairwise'). This is that drift net scaled to CI budget: a hand-built
pairwise-ish covering sample (every axis value appears >= 2x; most value
pairs appear) at 3 vehicles / T_end = 1 s, each cell golden-compared and
asserted collision-free. computation_mode is covered separately by the
sharded==sequential and 2-process distributed tests (tests/test_sharded.py,
tests/test_multihost.py).

Regenerate goldens: ``python -m tests.replace_expected_results matrix``.
"""

import numpy as np
import pytest

from pdmpc_tpu.config import (
    Config,
    CouplingStrategies as Co,
    MpaType as M,
    OptimizerType as O,
    PriorityStrategies as P,
    ScenarioType as S,
    WeightStrategies as W,
)
from pdmpc_tpu.experiment import run_experiment
from tests.golden import compare_golden
from tests.test_controller import pairwise_vehicle_collisions

# (scenario, mpa, optimizer, coupling, priority, weight)
_CELLS = {
    "mx01": (S.commonroad, M.single_speed, O.TpuOptimal,
             Co.reachable_set_coupling, P.coloring_priority,
             W.constant_weight),
    "mx02": (S.circle, M.single_speed, O.TpuSampled,
             Co.full_coupling, P.constant_priority, W.random_weight),
    "mx03": (S.commonroad, M.triple_speed, O.TpuOptimal,
             Co.distance_coupling, P.random_priority, W.distance_weight),
    "mx04": (S.circle, M.triple_speed, O.TpuSampled,
             Co.no_coupling, P.coloring_priority, W.constant_weight),
    "mx05": (S.commonroad, M.realistic, O.TpuSampled,
             Co.reachable_set_coupling, P.FCA_priority, W.random_weight),
    "mx06": (S.circle, M.realistic, O.TpuOptimal,
             Co.full_coupling, P.optimal_priority, W.distance_weight),
    "mx07": (S.commonroad, M.single_speed, O.TpuOptimal,
             Co.no_coupling, P.explorative_priority, W.distance_weight),
    "mx08": (S.circle, M.single_speed, O.TpuOptimal,
             Co.distance_coupling, P.FCA_priority, W.constant_weight),
    "mx09": (S.commonroad, M.triple_speed, O.TpuSampled,
             Co.full_coupling, P.explorative_priority, W.constant_weight),
    "mx10": (S.circle, M.triple_speed, O.TpuOptimal,
             Co.reachable_set_coupling, P.optimal_priority, W.random_weight),
    "mx11": (S.commonroad, M.realistic, O.TpuOptimal,
             Co.full_coupling, P.random_priority, W.constant_weight),
    "mx12": (S.circle, M.realistic, O.TpuSampled,
             Co.distance_coupling, P.constant_priority, W.distance_weight),
    # the mixed road/free-space scenario (TPU extension, BASELINE config 4)
    # at CI scale: 1 road vehicle + 2 free-space circle-crossing vehicles
    "mx13": (S.mixed, M.single_speed, O.TpuOptimal,
             Co.reachable_set_coupling, P.random_priority,
             W.distance_weight),
    "mx14": (S.mixed, M.triple_speed, O.TpuSampled,
             Co.full_coupling, P.coloring_priority, W.constant_weight),
}

MATRIX_CONFIGS = {
    name: Config(
        scenario_type=sc, amount=3, T_end=1.0, beam_width=64,
        mpa_type=mpa, optimizer_type=opt, coupling=co, priority=pr,
        weight=w, mcts_n_rollouts=128,
    )
    for name, (sc, mpa, opt, co, pr, w) in _CELLS.items()
}


def _axis_coverage():
    rows = list(_CELLS.values())
    return [set(r[i] for r in rows) for i in range(6)]


def test_every_axis_value_covered():
    cov = _axis_coverage()
    assert cov[0] == set(S)
    assert cov[1] == set(M)
    assert cov[2] == {O.TpuOptimal, O.TpuSampled}
    assert cov[3] == set(Co)
    assert cov[4] == set(P)
    assert cov[5] == set(W)


@pytest.mark.parametrize("name", [
    # mx06 (realistic MPA + full coupling + optimal voting) is the one
    # ~35 s cell; optimal-voting golden coverage stays daily via mx10,
    # the full pairwise matrix runs in CI
    pytest.param(n, marks=pytest.mark.slow) if n == "mx06" else n
    for n in sorted(MATRIX_CONFIGS)
])
def test_matrix_cell(name):
    res = run_experiment(MATRIX_CONFIGS[name])
    assert pairwise_vehicle_collisions(res) == [], name
    # progress: nobody is frozen at step 0 (threshold accommodates the
    # realistic family, which starts at standstill under a 0.128 m/s-per-
    # step acceleration limit, driven by the sampled optimizer)
    poses = np.asarray(res.infos.poses)[:, :, 0]
    d = np.linalg.norm(poses[-1, :, :2] - poses[0, :, :2], axis=-1)
    assert (d > 0.01).all(), f"{name}: moved {d}"
    compare_golden(name, res)
