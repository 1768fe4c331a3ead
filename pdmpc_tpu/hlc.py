"""Host-driven control loop for external plants.

The fully-jitted receding-horizon program (controller.make_run) is the fast
path for simulation; this module is the reference-shaped loop that
interleaves plant I/O with the jitted step — the HighLevelController.run
template (hlc/controller/HighLevelController.m:67-94,334-373):

  main_init -> synchronize_start_with_plant -> loop { measure ->
  jitted control step -> apply } -> end_run / save results

Used with :class:`pdmpc_tpu.plant.ExternalPlant` (CpmLab-shaped adapter) or
for live plotting with per-step host access.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pdmpc_tpu.config import Config
from pdmpc_tpu.controller import (
    initial_state,
    make_centralized_step,
    make_prioritized_step,
)
from pdmpc_tpu.experiment import ExperimentResult, _git_hash, create_scenario
from pdmpc_tpu.models.mpa import build_mpa
from pdmpc_tpu.plant import Plant, get_plant
from pdmpc_tpu.utils.timing import ControllerTiming


def run_with_plant(options: Config, plant: Plant | None = None,
                   on_step=None) -> ExperimentResult:
    """Run an experiment against a plant, one jitted step per period.

    ``on_step(k, info)`` is an optional observer hook (the live-plotting
    /plotting topic capability, visualization/PlotterOnline.m).
    """
    options = options.validate()
    timing = ControllerTiming()

    timing.start("hlc_init_all")
    mpa = build_mpa(options)
    scenario = create_scenario(options, mpa)
    mpa_t = mpa.to_tensors_for(options)
    sc_t = scenario.to_tensors()

    if plant is None:
        plant = get_plant(options, start_poses=scenario.start_poses)

    if options.is_prioritized:
        step_builder = make_prioritized_step
    else:
        step_builder = make_centralized_step

    @jax.jit
    def step(state, k, mpa_args, sc_args):
        return step_builder(options, mpa_args, sc_args)(state, k)

    state = initial_state(sc_t, options.Hp)
    timing.stop("hlc_init_all")

    plant.synchronize_start_with_plant()

    def build_result() -> ExperimentResult:
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *infos)
        return ExperimentResult(
            options=options,
            infos=stacked,
            final_state=jax.tree.map(np.asarray, state),
            timings={
                k2: v.tolist() if isinstance(v, np.ndarray) else v
                for k2, v in timing.get_all_timings().items()
            },
            git_hash=_git_hash(),
        )

    infos = []
    k = 0
    timing.start("control_loop")
    try:
        while not plant.should_stop() and k < options.k_end:
            with timing.span("measure", k):
                m = plant.measure()
                trims = np.array(
                    [
                        mpa.trim_from_values(m.speed[v], m.steering[v])
                        for v in range(scenario.n_vehicles)
                    ],
                    dtype=np.int32,
                )
                state = state._replace(
                    pose=jnp.asarray(m.poses, dtype=jnp.float32),
                    trim=jnp.asarray(trims),
                )

            with timing.span("plan", k):
                state, info = step(
                    state, jnp.asarray(k, dtype=jnp.int32), mpa_t, sc_t
                )
                jax.block_until_ready(state)

            info_np = jax.tree.map(np.asarray, info)
            infos.append(info_np)

            with timing.span("apply", k):
                applied_trims = info_np.trims[:, 0]
                try:
                    plant.apply(
                        info_np.poses, info_np.trims, k,
                        trim_speeds=mpa.trim_speed[applied_trims],
                        trim_steerings=mpa.trim_steering[applied_trims],
                    )
                except TypeError:
                    plant.apply(info_np.poses, info_np.trims, k)

            if on_step is not None:
                # truthy return requests abort (visualization.PlotterOnline's
                # ESC hotkey — the reference Plotter.m abort path)
                if on_step(k, info_np):
                    k += 1
                    break
            k += 1
    except BaseException:
        # Save-on-error: persist whatever completed before the crash so a
        # failure at step 90/100 loses nothing — the reference's onCleanup
        # path (hlc/controller/HighLevelController.m:508-555).
        timing.stop("control_loop")
        if infos:
            from pdmpc_tpu.utils.filenames import results_directory

            try:
                base = build_result().save(results_directory(options),
                                           partial=True)
                print(f"run aborted at step {k}; partial result saved to "
                      f"{base}.npz")
            except Exception as save_err:  # noqa: BLE001 — don't mask
                print(f"run aborted at step {k}; partial save failed: "
                      f"{save_err!r}")
        plant.end_run()
        raise

    timing.stop("control_loop")
    plant.end_run()
    return build_result()
