"""Execute the dissertation evaluation at a feasible scale and persist
its artifacts under results/phd/.

Reference: eval/eval_phd/eval_phd.m:9-66 — eval_prioritization +
eval_bounding sweeps followed by the values.txt med/max step-time block.
The reference ran 20 vehicles on the 20-NUC lab; here the sweeps run a
10-vehicle commonroad fleet, 3 seeds, on one TPU chip (or the CPU mesh
with --cpu), and the values block comes from the headline cr20 coloring
host loop (hlc.run_with_plant, the deployment-shaped execution).

    python -m tools.run_eval_phd [--cpu] [--t-end 4.0] [--amount 10]

Artifacts written (and meant to be committed):
  results/phd/values.txt       med/max per-step time (eval_phd.m:54-66)
  results/phd/sweeps.json      per-cell summaries of both sweeps
  results/phd/prioritization_time.png   med/max step time per strategy
  results/phd/bounding_cost.png         cost + levels vs max_num_CLs
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "results", "phd")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true",
                        help="run on the virtual CPU mesh instead of TPU")
    parser.add_argument("--amount", type=int, default=10)
    parser.add_argument("--t-end", type=float, default=4.0)
    parser.add_argument("--beam", type=int, default=128)
    parser.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    parser.add_argument("--bounds", type=int, nargs="+",
                        default=[1, 2, 4, 99])
    parser.add_argument("--skip-values", action="store_true",
                        help="skip the cr20 host-loop values.txt block "
                             "(CI smoke)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pdmpc_tpu import hlc
    from pdmpc_tpu.config import Config, PriorityStrategies, ScenarioType
    from pdmpc_tpu.eval.experiments import (
        eval_bounding,
        eval_prioritization,
    )
    from pdmpc_tpu.eval.phd import write_values_txt

    os.makedirs(OUT_DIR, exist_ok=True)
    device = str(jax.devices()[0])
    base = Config(
        scenario_type=ScenarioType.commonroad, amount=args.amount,
        T_end=args.t_end, beam_width=args.beam,
    )

    print(f"[eval_phd] prioritization sweep on {device} ...", flush=True)
    prio = eval_prioritization(
        base, n_vehicles_list=(args.amount,), seeds=tuple(args.seeds),
        use_cache=True, save=True,
    )
    print(f"[eval_phd] bounding sweep ({args.bounds}) ...", flush=True)
    bounding = eval_bounding(
        base, bounds=tuple(args.bounds), n_vehicles_list=(args.amount,),
        seeds=tuple(args.seeds), use_cache=True, save=True,
    )

    # ---- values.txt from the headline deployment-shaped host loop -------
    if not args.skip_values:
        print("[eval_phd] cr20 coloring host loop for values.txt ...",
              flush=True)
        cr20 = Config(
            scenario_type=ScenarioType.commonroad, amount=20, T_end=4.0,
            beam_width=256, priority=PriorityStrategies.coloring_priority,
        )
        res20 = hlc.run_with_plant(cr20)
        # 20 steps at T_end=4 s: skip only the compile step (the reference
        # skips a 20-step JIT warm-up of a 1000+-step lab run, eval_phd.m:41)
        values_path = write_values_txt(
            res20, path=os.path.join(OUT_DIR, "values.txt"), i_step_start=1,
            label="TPU cr20 coloring (host loop)",
        )
        print(f"  -> {values_path}: {open(values_path).read().strip()}")

    # ---- persist sweep summaries ---------------------------------------
    sweeps = {
        "device": device,
        "base": {"scenario": "commonroad", "amount": args.amount,
                 "T_end": args.t_end, "beam_width": args.beam,
                 "seeds": args.seeds},
        "prioritization": {str(k): v for k, v in prio.items()},
        "bounding": {str(k): v for k, v in bounding.items()},
        "command": " ".join(sys.argv),
    }
    sweeps_path = os.path.join(OUT_DIR, "sweeps.json")

    def _np_safe(o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        raise TypeError(f"not JSON-serializable: {type(o)}")

    with open(sweeps_path, "w") as f:
        json.dump(sweeps, f, indent=1, default=_np_safe)
    print(f"  -> {sweeps_path}")

    # ---- figures (repo plotting idiom: eval/plotting.py) ---------------
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # mean step time + total cost per prioritization strategy
    # (the eval_phd computation-time figure, aggregated over seeds)
    strategies, times, costs = [], [], []
    for key, summ in prio.items():
        strat = key[1].replace("_priority", "")
        if strat not in strategies:
            strategies.append(strat)
            times.append([])
            costs.append([])
        i = strategies.index(strat)
        if "step_time_mean_ms" in summ:
            times[i].append(summ["step_time_mean_ms"])
        costs[i].append(summ["total_cost"])
    fig, ax = plt.subplots(figsize=(6, 3.2))
    ax2 = ax.twinx()
    x = np.arange(len(strategies))
    ax.bar(x, [np.mean(t) if t else np.nan for t in times],
           width=0.55, label="mean step time")
    ax2.plot(x, [np.mean(c) for c in costs], "o--", color="tab:orange",
             label="mean total cost")
    ax.set_xticks(x, strategies, rotation=15)
    ax.set_ylabel("mean step time [ms]")
    ax2.set_ylabel("mean total cost")
    ax.set_title(f"Prioritization strategies "
                 f"(cr{args.amount}, {len(args.seeds)} seeds)")
    fig.tight_layout()
    prio_fig = os.path.join(OUT_DIR, "prioritization_time.png")
    fig.savefig(prio_fig, dpi=150)
    plt.close(fig)
    print(f"  -> {prio_fig}")

    # cost + achieved levels vs max_num_CLs (eval_bounding.m:12 study)
    fig, ax = plt.subplots(figsize=(6, 3.2))
    ax2 = ax.twinx()
    bound_vals = sorted({k[2] for k in bounding})
    cost_by_bound = [
        np.mean([v["total_cost"] for k, v in bounding.items()
                 if k[2] == b])
        for b in bound_vals
    ]
    lvl_key = next(
        (c for c in ("levels_max", "max_levels", "mean_levels")
         if any(c in v for v in bounding.values())), None)
    labels = [("inf" if b >= 99 else str(b)) for b in bound_vals]
    ax.plot(range(len(bound_vals)), cost_by_bound, "o-", label="cost")
    ax.set_xticks(range(len(bound_vals)), labels)
    ax.set_xlabel("max_num_CLs")
    ax.set_ylabel("mean total cost")
    if lvl_key:
        lv = [np.mean([v.get(lvl_key, np.nan)
                       for k, v in bounding.items() if k[2] == b])
              for b in bound_vals]
        ax2.plot(range(len(bound_vals)), lv, "s--", color="tab:orange",
                 label=lvl_key)
        ax2.set_ylabel(lvl_key)
    ax.set_title(f"Computation-level bounding (cr{args.amount})")
    fig.tight_layout()
    bound_fig = os.path.join(OUT_DIR, "bounding_cost.png")
    fig.savefig(bound_fig, dpi=150)
    plt.close(fig)
    print(f"  -> {bound_fig}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
