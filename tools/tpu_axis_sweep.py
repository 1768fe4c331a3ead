"""On-device smoke sweep over the distinctive config axes.

CI goldens run on the virtual CPU mesh, so a code path can pass every
test yet never have executed on the real TPU — exactly how the
optimal-priority host-callback bug (jax.debug.print -> axon_pjrt
rejection) stayed hidden through round 3. This sweep runs one short
rollout per distinctive axis value ON the attached device and reports
ok/error per case.

Usage (on the TPU machine): ``python -m tools.tpu_axis_sweep``
prints one JSON line per case plus a summary line.
"""

from __future__ import annotations

import json
import os


def main() -> int:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from pdmpc_tpu.config import (
        Config,
        ConstraintFromSuccessor,
        CouplingStrategies,
        ManualControlConfig,
        MpaType,
        OptimizerType,
        PriorityStrategies,
        ScenarioType,
        WeightStrategies,
    )
    from pdmpc_tpu.experiment import run_experiment

    cases = {
        "sampled_cr3": Config(
            scenario_type=ScenarioType.commonroad, amount=3, T_end=1.0,
            optimizer_type=OptimizerType.TpuSampled, mcts_n_rollouts=128,
        ),
        "hdv_cr4": Config(
            scenario_type=ScenarioType.commonroad, amount=4, T_end=1.0,
            beam_width=64,
            manual_control_config=ManualControlConfig(
                is_active=True, amount=1, hdv_ids=(3,)
            ),
        ),
        "distance_random_cr3": Config(
            scenario_type=ScenarioType.commonroad, amount=3, T_end=1.0,
            beam_width=64, coupling=CouplingStrategies.distance_coupling,
            priority=PriorityStrategies.random_priority,
            weight=WeightStrategies.random_weight,
        ),
        "fca_prevtraj_cr3": Config(
            scenario_type=ScenarioType.commonroad, amount=3, T_end=1.0,
            beam_width=64, priority=PriorityStrategies.FCA_priority,
            constraint_from_successor=(
                ConstraintFromSuccessor.area_of_previous_trajectory
            ),
        ),
        "optimal_priority_cr4": Config(
            scenario_type=ScenarioType.commonroad, amount=4, T_end=1.0,
            beam_width=64, priority=PriorityStrategies.optimal_priority,
        ),
        # round 5: per-subgraph edge-orientation enumeration beyond the
        # old 6-vehicle cap
        "optimal_priority_cr8": Config(
            scenario_type=ScenarioType.commonroad, amount=8, T_end=1.0,
            beam_width=64, priority=PriorityStrategies.optimal_priority,
        ),
        # round 5: scan-tail execution knob (the batched bench path)
        "scan_tail_cr4": Config(
            scenario_type=ScenarioType.commonroad, amount=4, T_end=1.0,
            beam_width=64, level_chunk=3, unroll_layers=False,
        ),
        "explorative_priority_cr4": Config(
            scenario_type=ScenarioType.commonroad, amount=4, T_end=1.0,
            beam_width=64,
            priority=PriorityStrategies.explorative_priority,
        ),
        "hp10_circle3": Config(
            scenario_type=ScenarioType.circle, amount=3, T_end=1.0, Hp=10,
            beam_width=128,
        ),
        "triple_cr3": Config(
            scenario_type=ScenarioType.commonroad, amount=3, T_end=1.0,
            beam_width=128, mpa_type=MpaType.triple_speed,
        ),
        "realistic_circle3": Config(
            scenario_type=ScenarioType.circle, amount=3, T_end=1.0,
            beam_width=128, mpa_type=MpaType.realistic,
        ),
        "centralized_circle3": Config(
            scenario_type=ScenarioType.circle, amount=3, T_end=1.0,
            is_prioritized=False, beam_width=64,
        ),
        "mixed8": Config(
            scenario_type=ScenarioType.mixed, amount=8, T_end=1.0,
            beam_width=64,
        ),
    }
    failures = 0
    for name, cfg in cases.items():
        try:
            res = run_experiment(cfg)
            entry = {
                "ok": True,
                "fallback_rate": round(
                    float(np.asarray(res.infos.needs_fallback).mean()), 3
                ),
            }
        except Exception as e:  # noqa: BLE001 — report and continue
            entry = {"ok": False, "error": type(e).__name__,
                     "detail": str(e)[:160]}
            failures += 1
        print(json.dumps({name: entry}), flush=True)
    print(json.dumps({
        "summary": {"cases": len(cases), "failures": failures,
                    "device": str(jax.devices()[0])}
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
