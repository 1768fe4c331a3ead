"""Regenerate golden trajectory files for the commonroad system tests.

Reference workflow: tests/systemtests/replace_expected_results.m
(docs/continuous-integration.md:30-39). Run after an INTENDED behavior
change:

    python -m tests.replace_expected_results

Goldens are recorded on the virtual CPU mesh (the test platform) so test
runs compare like for like.
"""

from __future__ import annotations


def main() -> None:
    import sys

    import jax

    tpu_mode = "--tpu" in sys.argv
    if tpu_mode:
        # regenerate the TPU-backend golden used by bench._golden_crosscheck
        # (run where the TPU is attached); per-backend goldens are required
        # because f32 CPU/TPU trajectories are not bit-stable (tests/golden.py)
        assert jax.default_backend() not in ("cpu",), (
            "--tpu requested but only the CPU backend is available"
        )
        # share bench.py's persistent compile cache: the golden config's
        # run program is exactly what bench._golden_crosscheck compiles, so
        # regeneration after a warm bench run is seconds, not many minutes
        # of remote-TPU compilation
        import os

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
    else:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    from pdmpc_tpu.experiment import run_experiment
    from tests.golden import save_golden
    from tests.test_matrix import MATRIX_CONFIGS
    from tests.test_system_commonroad import (
        GOLDEN_CONFIGS,
        TPU_GOLDEN_CONFIGS,
    )

    all_configs = {**GOLDEN_CONFIGS, **MATRIX_CONFIGS, **TPU_GOLDEN_CONFIGS}
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if "matrix" in only:
        only.remove("matrix")
        only.extend(MATRIX_CONFIGS)
    names = (
        (only or ["commonroad_03veh", *TPU_GOLDEN_CONFIGS]) if tpu_mode
        else (only or [n for n in all_configs
                       if n not in TPU_GOLDEN_CONFIGS])
    )
    for name in names:
        print(f"running {name} ...")
        result = run_experiment(all_configs[name])
        path = save_golden(name + ("_tpu" if tpu_mode else ""), result)
        print(f"  -> {path}")
    if not tpu_mode:
        print("NOTE: also run `python -m tests.replace_expected_results "
              "--tpu` on the TPU machine to refresh the TPU golden.")


if __name__ == "__main__":
    main()
