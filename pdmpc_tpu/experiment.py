"""Experiment orchestration — the ``main(options)`` capability.

Reference: main.m + hlc/HlcFactory.m + repeat.m. Builds the MPA and
scenario, assembles the jitted receding-horizon program, runs it (optionally
batched over many scenario rollouts), and returns an
:class:`ExperimentResult`.
"""

from __future__ import annotations

import json
import os
import subprocess
import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pdmpc_tpu.config import Config, ScenarioType
from pdmpc_tpu.controller import StepInfo, StepState, initial_state, make_run
from pdmpc_tpu.models.mpa import Mpa, build_mpa
from pdmpc_tpu.scenarios.circle import create_circle_scenario
from pdmpc_tpu.scenarios.scenario import Scenario


def create_scenario(options: Config, mpa: Mpa) -> Scenario:
    """Scenario factory. Reference: scenarios/Scenario.m:75-88."""
    import numpy as _np

    if options.scenario_type == ScenarioType.circle:
        scenario = create_circle_scenario(options, mpa)
    elif options.scenario_type == ScenarioType.mixed:
        from pdmpc_tpu.scenarios.mixed import create_mixed_scenario

        scenario = create_mixed_scenario(options, mpa)
    else:
        from pdmpc_tpu.scenarios.commonroad import create_commonroad_scenario

        scenario = create_commonroad_scenario(options, mpa)

    # mark human-driven vehicles (ManualControlConfig; hdv_ids are 0-based
    # indices into the fleet)
    mcc = options.manual_control_config
    if mcc.is_active and mcc.hdv_ids:
        is_hdv = _np.zeros(scenario.n_vehicles, dtype=bool)
        for i in mcc.hdv_ids:
            is_hdv[int(i)] = True
        scenario.is_hdv = is_hdv
    return scenario


@dataclass
class ExperimentResult:
    """Result object. Reference: hlc/controller/common/ExperimentResult.m.

    Holds the options, per-step stacked iteration/control data, timings,
    and the code revision for reproducibility.
    """

    options: Config
    infos: Any                      # StepInfo pytree, leaves [k_end, ...]
    final_state: Any                # StepState
    timings: dict[str, float] = field(default_factory=dict)
    git_hash: str = ""

    @property
    def n_steps(self) -> int:
        return int(np.asarray(self.infos.cost).shape[0])

    @property
    def t_total(self) -> float:
        return self.n_steps * self.options.dt_seconds

    @property
    def n_vehicles(self) -> int:
        return int(np.asarray(self.infos.cost).shape[-1])

    @property
    def max_number_of_computation_levels(self) -> int:
        return int(np.asarray(self.infos.levels).max())

    def save(self, directory: str, partial: bool = False) -> str:
        """Persist result (.npz + Config.json), like save_merged().

        ``partial`` marks a truncated save (save-on-error): marked
        results are skipped by ``utils.filenames.load_latest`` so a
        crash at step 90/100 never poisons the whole-experiment
        memoization with a truncated run.
        """
        os.makedirs(directory, exist_ok=True)
        stamp = time.strftime("%y%m%d-%H%M%S")
        base = os.path.join(directory, stamp)
        arrays = {
            f"info_{k}": np.asarray(v)
            for k, v in self.infos._asdict().items()
        }
        np.savez_compressed(base + ".npz", **arrays)
        meta = {
            "config": self.options.to_json_dict(),
            "timings": self.timings,
            "git_hash": self.git_hash,
        }
        if partial:
            meta["partial"] = True
        with open(base + ".json", "w") as f:
            json.dump(meta, f, indent=2)
        return base

    @staticmethod
    def load(base: str) -> "ExperimentResult":
        with open(base + ".json") as f:
            meta = json.load(f)
        with np.load(base + ".npz") as data:
            infos = StepInfo(
                **{
                    k[len("info_"):]: data[k]
                    for k in data.files
                    if k.startswith("info_")
                }
            )
        return ExperimentResult(
            options=Config.from_json_dict(meta["config"]),
            infos=infos,
            final_state=None,
            timings=meta["timings"],
            git_hash=meta["git_hash"],
        )


def _git_hash() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=5,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
    except Exception:
        return ""


def run_experiment(options: Config) -> ExperimentResult:
    """Run one experiment end-to-end (reference: main.m sequential mode)."""
    options = options.validate()
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    mpa = build_mpa(options)
    scenario = create_scenario(options, mpa)
    mpa_t = mpa.to_tensors_for(options)
    sc_t = scenario.to_tensors()
    timings["hlc_init_all"] = time.perf_counter() - t0

    run = jax.jit(make_run(options))
    state0 = initial_state(sc_t, options.Hp)

    t0 = time.perf_counter()
    final_state, infos = jax.block_until_ready(run(state0, mpa_t, sc_t))
    timings["control_loop"] = time.perf_counter() - t0
    timings["steps_per_second"] = options.k_end / timings["control_loop"]

    return ExperimentResult(
        options=options,
        infos=jax.tree.map(np.asarray, infos),
        final_state=jax.tree.map(np.asarray, final_state),
        timings=timings,
        git_hash=_git_hash(),
    )


def run_experiment_batch(options: Config,
                         n_scenarios: int | None = None) -> ExperimentResult:
    """Run a batch of scenario rollouts in one program (vmap over scenarios).

    The scenario batch replaces the reference's one-process-per-experiment
    eval sweeps (eval/1-experiment/eval_experiments.m) with a single
    batched TPU program; start poses are identical across the batch unless
    perturbed by the caller.
    """
    options = options.validate()
    b = n_scenarios if n_scenarios is not None else options.n_scenarios
    mpa = build_mpa(options)
    scenario = create_scenario(options, mpa)
    mpa_t = mpa.to_tensors_for(options)
    sc_t = scenario.to_tensors()

    run = make_run(options)
    batched = jax.jit(jax.vmap(run, in_axes=(0, None, None)))
    state0 = initial_state(sc_t, options.Hp)
    states0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (b, *x.shape)), state0
    )

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    final_state, infos = jax.block_until_ready(batched(states0, mpa_t, sc_t))
    timings["control_loop"] = time.perf_counter() - t0
    timings["vehicle_solves_per_second"] = (
        b * options.amount * options.k_end / timings["control_loop"]
    )

    return ExperimentResult(
        options=options,
        infos=jax.tree.map(np.asarray, infos),
        final_state=jax.tree.map(np.asarray, final_state),
        timings=timings,
        git_hash=_git_hash(),
    )


def is_deadlock(infos: StepInfo, options: Config) -> np.ndarray:
    """Deadlock metric: a vehicle stopped for more than 3*Hp consecutive
    steps. Reference: eval/2-processing/is_deadlock.m:22-34.

    Returns [N] bool.
    """
    poses = np.asarray(infos.poses)[:, :, 0, :2]     # [k_end, N, 2]
    moved = np.linalg.norm(np.diff(poses, axis=0), axis=-1) > 1e-6
    n = moved.shape[1]
    threshold = 3 * options.Hp
    deadlocked = np.zeros(n, dtype=bool)
    for v in range(n):
        run = 0
        for k in range(moved.shape[0]):
            run = 0 if moved[k, v] else run + 1
            if run >= threshold:
                deadlocked[v] = True
                break
    return deadlocked
