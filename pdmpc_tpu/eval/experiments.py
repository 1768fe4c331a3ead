"""Experiment sweeps — the eval/1-experiment capability.

Reference: eval/1-experiment/eval_experiments.m: sweep seeds x n_vehicles x
(priority strategies | max_num_CLs), skip infeasible optimal-priority
sizes, reuse cached results (FileNameConstructor.load_latest memoization).

TPU twist: within one (n_vehicles, strategy) cell the seed dimension runs
as one batched program (vmap over scenario rollouts) instead of repeated
single runs — the 1000+-concurrent-rollouts capability of BASELINE.json.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable

from pdmpc_tpu.config import Config, PriorityStrategies, ScenarioType
from pdmpc_tpu.eval.processing import summarize
from pdmpc_tpu.experiment import ExperimentResult, run_experiment
from pdmpc_tpu.utils.filenames import load_latest, results_directory

# Reference sweep defaults (eval_experiments.m:29-34)
DEFAULT_COMMONROAD_SIZES = tuple(range(5, 21))
DEFAULT_CIRCLE_SIZES = tuple(range(2, 11))
DEFAULT_SEEDS = (1, 2, 3)
# optimal priority is skipped beyond this size in sweeps
# (eval_experiments.m:60-66); the controller itself now scales with
# coupling sparsity (per-subgraph orientation enumeration) but dense
# sweep sizes stay skipped like the reference
OPTIMAL_PRIORITY_MAX_VEHICLES = 8


def eval_experiments(
    base: Config | None = None,
    n_vehicles_list: Iterable[int] | None = None,
    priorities: Iterable[PriorityStrategies] = (
        PriorityStrategies.constant_priority,
        PriorityStrategies.random_priority,
        PriorityStrategies.FCA_priority,
        PriorityStrategies.coloring_priority,
    ),
    seeds: Iterable[int] = DEFAULT_SEEDS,
    max_num_cls_list: Iterable[int] | None = None,
    use_cache: bool = True,
    save: bool = True,
) -> dict:
    """Sweep experiments; returns {(n, strategy/cls, seed): summary dict}."""
    base = base or Config(scenario_type=ScenarioType.circle, T_end=8.0)
    if n_vehicles_list is None:
        n_vehicles_list = (
            DEFAULT_CIRCLE_SIZES
            if base.scenario_type == ScenarioType.circle
            else DEFAULT_COMMONROAD_SIZES
        )

    cells: list[Config] = []
    for n in n_vehicles_list:
        if max_num_cls_list is not None:
            # bounding study (eval_bounding.m:12): cost vs max_num_CLs
            for cls_bound in max_num_cls_list:
                for seed in seeds:
                    cells.append(
                        dataclasses.replace(
                            base, amount=n, max_num_CLs=cls_bound, seed=seed,
                            path_ids=(),
                        )
                    )
        else:
            for strategy in priorities:
                if (strategy == PriorityStrategies.optimal_priority
                        and n > OPTIMAL_PRIORITY_MAX_VEHICLES):
                    continue  # eval_experiments.m:60-66
                for seed in seeds:
                    cells.append(
                        dataclasses.replace(
                            base, amount=n, priority=strategy, seed=seed,
                            path_ids=(),
                        )
                    )

    results: dict = {}
    for cfg in cells:
        cfg = cfg.validate()
        result = load_latest(cfg) if use_cache else None
        if result is None:
            result = run_experiment(cfg)
            if save:
                result.save(results_directory(cfg))
        key = (cfg.amount, cfg.priority.value, cfg.max_num_CLs, cfg.seed)
        results[key] = summarize(result)
    return results


def eval_bounding(base: Config | None = None,
                  bounds: Iterable[int] = (1, 2, 4, 6, 99),
                  **kw) -> dict:
    """Computation-level bounding study: solution cost vs max_num_CLs.

    Reference: eval/eval_phd/eval_bounding.m:12 (ECC 2024).
    """
    return eval_experiments(base=base, max_num_cls_list=bounds, **kw)


def eval_prioritization(base: Config | None = None, **kw) -> dict:
    """Prioritization-strategy study. Reference: eval_phd/eval_prioritization.m."""
    return eval_experiments(
        base=base,
        priorities=(
            PriorityStrategies.constant_priority,
            PriorityStrategies.random_priority,
            PriorityStrategies.FCA_priority,
            PriorityStrategies.coloring_priority,
            PriorityStrategies.explorative_priority,
        ),
        **kw,
    )


def monte_carlo_sweep(base: Config, n_scenarios: int,
                      perturb_start_arc: float = 0.0) -> ExperimentResult:
    """Batched Monte-Carlo rollouts in ONE program (BASELINE.json configs:
    '4096 randomized 20-vehicle scenarios sharded across hosts').

    Every rollout runs the same scenario; ``perturb_start_arc`` shifts each
    rollout's vehicles along their reference paths to decorrelate them.
    """
    import jax
    import jax.numpy as jnp

    from pdmpc_tpu.controller import initial_state, make_run
    from pdmpc_tpu.experiment import _git_hash, create_scenario
    from pdmpc_tpu.models.mpa import build_mpa
    from pdmpc_tpu.ops import geometry as geo

    base = base.validate()
    mpa = build_mpa(base)
    scenario = create_scenario(base, mpa)
    mpa_t = mpa.to_tensors_for(base)
    sc_t = scenario.to_tensors()

    state0 = initial_state(sc_t, base.Hp)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(
            x[None], (n_scenarios, *x.shape)
        ).copy(),
        state0,
    )
    if perturb_start_arc > 0.0:
        key = jax.random.PRNGKey(base.seed)
        shifts = jax.random.uniform(
            key, (n_scenarios, sc_t.n_vehicles), maxval=perturb_start_arc
        )

        def shift_pose(i, arc):
            path = sc_t.reference_paths[i]
            cumlen = sc_t.path_cumlen[i]
            s0, _, _ = geo.project_to_polyline(
                sc_t.start_poses[i, :2], path, cumlen
            )
            pts = geo.sample_path_at_arclength(
                path, jnp.stack([s0 + arc, s0 + arc + 1e-3]), cumlen,
                sc_t.is_loop[i],
            )
            d = pts[1] - pts[0]
            yaw = jnp.arctan2(d[1], d[0])
            return jnp.stack([pts[0, 0], pts[0, 1], yaw])

        new_poses = jax.vmap(
            jax.vmap(shift_pose, in_axes=(0, 0)), in_axes=(None, 0)
        )(jnp.arange(sc_t.n_vehicles), shifts)
        states = states._replace(pose=new_poses.astype(jnp.float32))

    run = jax.jit(jax.vmap(make_run(base), in_axes=(0, None, None)))
    import time

    t0 = time.perf_counter()
    final_state, infos = jax.block_until_ready(run(states, mpa_t, sc_t))
    elapsed = time.perf_counter() - t0

    import numpy as np

    return ExperimentResult(
        options=base,
        infos=jax.tree.map(np.asarray, infos),
        final_state=jax.tree.map(np.asarray, final_state),
        timings={
            "control_loop": elapsed,
            "n_scenarios": n_scenarios,
            "vehicle_solves_per_second": (
                n_scenarios * base.amount * base.k_end / elapsed
            ),
        },
        git_hash=_git_hash(),
    )
