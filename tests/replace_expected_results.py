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
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    from pdmpc_tpu.experiment import run_experiment
    from tests.golden import save_golden
    from tests.test_system_commonroad import GOLDEN_CONFIGS

    for name, cfg in GOLDEN_CONFIGS.items():
        print(f"running {name} ...")
        result = run_experiment(cfg)
        path = save_golden(name, result)
        print(f"  -> {path}")


if __name__ == "__main__":
    main()
