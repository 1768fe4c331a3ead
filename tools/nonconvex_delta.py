"""Measure the convex-vs-non-convex conservatism delta on the 20-vehicle
CPM scenario (VERDICT r2 #2: keep whichever is better, by measurement).

Runs the headline commonroad scenario under both obstacle geometries and
reports couplings, fallback rate, mean cost, and distance traveled.
Results are recorded in docs/PARITY.md.

Usage: python tools/nonconvex_delta.py [--amount 20] [--t-end 2.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amount", type=int, default=20)
    ap.add_argument("--t-end", type=float, default=2.0)
    ap.add_argument("--beam-width", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pdmpc_tpu.config import Config, ScenarioType
    from pdmpc_tpu.experiment import run_experiment

    out = {}
    for geom in ("convex", "non_convex"):
        cfg = Config(
            scenario_type=ScenarioType.commonroad,
            amount=args.amount,
            T_end=args.t_end,
            beam_width=args.beam_width,
            obstacle_geometry=geom,
        )
        t0 = time.perf_counter()
        res = run_experiment(cfg)
        elapsed = time.perf_counter() - t0
        poses = np.asarray(res.infos.poses)[:, :, 0, :2]  # applied centers
        dist = float(
            np.linalg.norm(np.diff(poses, axis=0), axis=-1).sum(axis=0).mean()
        )
        out[geom] = {
            "couplings_mean_per_step": float(
                np.asarray(res.infos.adjacency).sum(axis=(1, 2)).mean()
            ),
            "fallback_rate": float(
                np.asarray(res.infos.needs_fallback).mean()
            ),
            "exhausted_rate": float(
                np.asarray(res.infos.is_exhausted).mean()
            ),
            "mean_cost": float(np.asarray(res.infos.cost).mean()),
            "mean_distance_traveled_m": dist,
            "wall_s_incl_compile": round(elapsed, 2),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
