"""Deterministic result paths + experiment memoization.

Reference: utility/FileNameConstructor.m: result paths
``results/<scenario>/<NN>/<priority>/yymmdd-HHMMSS.mat`` and
``load_latest(options)`` which finds the newest result whose embedded
options equal the requested ones (Config.isequal) — the whole-experiment
memoization used by the eval sweeps (eval_experiments.m:72-76).
"""

from __future__ import annotations

import glob
import json
import os

from pdmpc_tpu.config import Config

RESULTS_ROOT = os.environ.get("PDMPC_RESULTS_DIR", "results")


def results_directory(options: Config, root: str | None = None) -> str:
    """results/<scenario_type>_<amount>veh/<priority>/ (reference layout)."""
    root = root or RESULTS_ROOT
    return os.path.join(
        root,
        f"{options.scenario_type.value}_{options.amount:02d}veh",
        options.priority.value,
    )


def load_latest(options: Config, root: str | None = None):
    """Newest saved ExperimentResult with equal options, or None.

    Reference: FileNameConstructor.load_latest (:146-177).
    """
    from pdmpc_tpu.experiment import ExperimentResult

    directory = results_directory(options, root)
    candidates = sorted(glob.glob(os.path.join(directory, "*.json")),
                        reverse=True)
    for meta_path in candidates:
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            saved = Config.from_json_dict(meta["config"])
        except (json.JSONDecodeError, KeyError, ValueError):
            continue
        if meta.get("partial"):
            # truncated save-on-error result (hlc.run_with_plant): never
            # serve it as a memoized complete experiment
            continue
        if saved.isequal(options):
            return ExperimentResult.load(meta_path[: -len(".json")])
    return None


def mpa_library_dir() -> str:
    from pdmpc_tpu.models.mpa import _LIBRARY_DIR

    return _LIBRARY_DIR
