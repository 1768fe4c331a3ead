"""Top-level experiment runner + CLI.

Reference: main.m (experiment orchestration: build scenario, save Config,
dispatch on computation_mode, save results), main_distributed.m, repeat.m,
and the ui/config_gui.m front-end (replaced by a CLI + JSON configs — the
GUI's capability is assembling a Config; ``python -m pdmpc_tpu.main`` plus
``Config.json`` covers it headlessly).
"""

from __future__ import annotations

import argparse
import os
import sys

from pdmpc_tpu.config import (
    ComputationMode,
    Config,
    MpaType,
    OptimizerType,
    PriorityStrategies,
    ScenarioType,
)
from pdmpc_tpu.experiment import (
    ExperimentResult,
    run_experiment,
    run_experiment_batch,
)
from pdmpc_tpu.utils.filenames import results_directory

CONFIG_FILE = "Config.json"


def main(options: Config | None = None, save: bool = True,
         use_cached: bool = False) -> ExperimentResult:
    """Run one experiment. Reference: main.m:1-81.

    computation_mode dispatch: ``sequential`` runs the single-program jitted
    loop; ``parallel_threads`` runs the same program sharded over the local
    device mesh when more than one device is available (the reference's
    parpool-of-processes); ``parallel_physically`` expects
    ``jax.distributed`` to have been initialized (multi-host; the
    reference's 20-NUC SSH deployment).
    """
    if options is None:
        options = Config.load_from_file(CONFIG_FILE) if os.path.isfile(
            CONFIG_FILE
        ) else Config()
    options = options.validate()

    if use_cached:
        from pdmpc_tpu.utils.filenames import load_latest

        cached = load_latest(options)
        if cached is not None:
            return cached

    # persist the config for reproducibility / repeat()  (main.m:16)
    if save:
        options.save_to_file(CONFIG_FILE)

    if (options.computation_mode == ComputationMode.sequential
            or options.n_scenarios > 1):
        result = (
            run_experiment(options)
            if options.n_scenarios <= 1
            else run_experiment_batch(options)
        )
    else:
        result = _run_sharded(options)

    if save:
        result.save(results_directory(options))
    return result


def _run_sharded(options: Config) -> ExperimentResult:
    import jax
    import numpy as np

    from pdmpc_tpu.controller import initial_state
    from pdmpc_tpu.experiment import _git_hash, create_scenario
    from pdmpc_tpu.models.mpa import build_mpa
    from pdmpc_tpu.parallel import sharded

    n_dev = len(jax.devices())
    if n_dev < 2:
        # single chip: fall back to the sequential program
        return run_experiment(options)

    mpa = build_mpa(options)
    scenario = create_scenario(options, mpa)
    mpa_t = mpa.to_tensors_for(options)
    sc_t = scenario.to_tensors()

    vehicle_shards = 1
    for cand in range(min(n_dev, options.amount), 0, -1):
        if options.amount % cand == 0 and n_dev % cand == 0:
            vehicle_shards = cand
            break
    scenario_shards = n_dev // vehicle_shards
    mesh = sharded.make_mesh(scenario_shards, vehicle_shards)
    run = sharded.make_sharded_run(options, mpa_t, sc_t, mesh)
    states0 = sharded.place_batched_state(
        sharded.batched_initial_state(sc_t, options.Hp, scenario_shards),
        mesh,
    )
    import time

    t0 = time.perf_counter()
    final_state, infos = jax.block_until_ready(
        run(states0, mpa_t, sc_t)
    )
    elapsed = time.perf_counter() - t0

    # keep scenario batch index 0 as the canonical result
    take0 = lambda x: np.asarray(x)[:, 0] if x.ndim > 1 else np.asarray(x)
    del take0
    infos0 = jax.tree.map(lambda x: np.asarray(x[0]), infos)
    final0 = jax.tree.map(lambda x: np.asarray(x[0]), final_state)
    return ExperimentResult(
        options=options,
        infos=infos0,
        final_state=final0,
        timings={"control_loop": elapsed,
                 "n_devices": n_dev,
                 "mesh": [scenario_shards, vehicle_shards]},
        git_hash=_git_hash(),
    )


def repeat() -> ExperimentResult:
    """Re-run the last experiment from Config.json. Reference: repeat.m."""
    return main(Config.load_from_file(CONFIG_FILE))


def cli(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="pdmpc_tpu",
        description="TPU-native prioritized distributed MPC",
    )
    p.add_argument("--config", help="path to a Config.json")
    p.add_argument("--scenario", choices=[s.value for s in ScenarioType])
    p.add_argument("--amount", type=int)
    p.add_argument("--t-end", type=float, dest="t_end")
    p.add_argument("--hp", type=int)
    p.add_argument("--priority",
                   choices=[s.value for s in PriorityStrategies])
    p.add_argument("--optimizer", choices=[s.value for s in OptimizerType])
    p.add_argument("--mpa-type", choices=[s.value for s in MpaType])
    p.add_argument("--max-num-cls", type=int)
    p.add_argument("--beam-width", type=int)
    p.add_argument("--n-scenarios", type=int)
    p.add_argument("--computation-mode",
                   choices=[s.value for s in ComputationMode])
    p.add_argument("--repeat", action="store_true",
                   help="re-run the last experiment (repeat.m)")
    p.add_argument("--gui", action="store_true",
                   help="interactive config wizard (ui/config_gui.m)")
    p.add_argument("--no-save", action="store_true")
    args = p.parse_args(argv)

    if args.repeat:
        result = repeat()
    else:
        if args.gui:
            from pdmpc_tpu.config_gui import config_gui

            cfg = config_gui()
        elif args.config:
            cfg = Config.load_from_file(args.config)
        else:
            cfg = Config()
        overrides = {
            "scenario_type": ("scenario", ScenarioType),
            "amount": ("amount", int),
            "T_end": ("t_end", float),
            "Hp": ("hp", int),
            "priority": ("priority", PriorityStrategies),
            "optimizer_type": ("optimizer", OptimizerType),
            "mpa_type": ("mpa_type", MpaType),
            "max_num_CLs": ("max_num_cls", int),
            "beam_width": ("beam_width", int),
            "n_scenarios": ("n_scenarios", int),
            "computation_mode": ("computation_mode", ComputationMode),
        }
        import dataclasses

        updates = {}
        for field_name, (arg_name, typ) in overrides.items():
            v = getattr(args, arg_name, None)
            if v is not None:
                updates[field_name] = typ(v)
        cfg = dataclasses.replace(cfg, **updates)
        result = main(cfg, save=not args.no_save)

    n_fallbacks = int(result.infos.needs_fallback.sum())
    print(
        f"steps={result.n_steps} vehicles={result.n_vehicles} "
        f"fallbacks={n_fallbacks} "
        f"control_loop={result.timings.get('control_loop', 0):.3f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(cli())
