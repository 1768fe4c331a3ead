"""Long-horizon (Hp=10) operating point, end-to-end.

VERDICT r2 #4: the DP reachability composition must make Hp=10 actually
work — golden-tested — and the eval_phd sweep arm (eval/phd.py, which
builds Hp=10 circle configs) must execute. Reference:
MotionPrimitiveAutomaton.m:394-647 (DP) + eval/eval_phd/eval_phd.m:9-31.
"""

import numpy as np
import pytest

from pdmpc_tpu.config import Config, OptimizerType, ScenarioType
from pdmpc_tpu.experiment import run_experiment
from tests.golden import compare_golden
from tests.test_controller import pairwise_vehicle_collisions
from tests.test_system_commonroad import GOLDEN_CONFIGS


@pytest.fixture(scope="module")
def result_hp10():
    return run_experiment(GOLDEN_CONFIGS["circle_03veh_hp10"])


class TestHp10Circle:
    def test_no_collisions(self, result_hp10):
        assert pairwise_vehicle_collisions(result_hp10) == []

    def test_progress(self, result_hp10):
        poses = np.asarray(result_hp10.infos.poses)[:, :, 0]
        d = np.linalg.norm(poses[-1, :, :2] - poses[0, :, :2], axis=-1)
        assert (d > 0.3).all(), f"stuck vehicles: moved {d}"

    def test_matches_golden(self, result_hp10):
        compare_golden("circle_03veh_hp10", result_hp10)

    def test_horizon_shape(self, result_hp10):
        assert np.asarray(result_hp10.infos.poses).shape[2] == 10


class TestEvalPhdSweeps:
    @pytest.mark.slow
    def test_tiny_run_sweeps(self, tmp_path):
        """eval_phd(run_sweeps=True) executes end-to-end at CI scale —
        including the Hp=10 circle arms (eval/phd.py)."""
        from pdmpc_tpu.eval.phd import eval_phd

        base = Config(
            optimizer_type=OptimizerType.TpuSampled,
            scenario_type=ScenarioType.commonroad,
            T_end=0.6,
            mcts_n_rollouts=64,
        )
        out = eval_phd(
            run_sweeps=True,
            sweep_base=base,
            sweep_kw={
                "n_vehicles_list": (2,),
                "seeds": (1,),
                "use_cache": False,
                "save": False,
            },
            sweep_bounds=(1, 99),
        )
        # all four reference arms produced results
        for arm in (
            "prioritization_commonroad",
            "prioritization_circle",
            "bounding_commonroad",
            "bounding_circle",
        ):
            assert arm in out and len(out[arm]) >= 1, arm
        # every cell summarized without NaNs in the cost field
        for arm in out.values():
            for summary in arm.values():
                assert np.isfinite(summary["total_cost"])
