"""Plant layer: the environment abstraction.

Reference: plant/Plant.m (abstract measure / apply / should_stop / end_run /
synchronize_start_with_plant, :45-50), plant/Simulation.m,
plant/CpmLab.m, plant/PlantMeasurement.m.

Two backends:

- :class:`SimulationPlant` — perfect-execution simulator: ``apply``
  teleports the state to the first predicted pose/trim
  (Simulation.m:86-117); this is what the fully-jitted control loop fuses
  into the step, so the plant here exists for the host-driven loop used
  with external plants and plotting.
- :class:`ExternalPlant` — the CpmLab-shaped adapter: measurements come
  from outside (lab middleware / another simulator), commands go out as
  Hp-step trajectory points with timestamps (the VehicleCommandTrajectory
  capability, CpmLab.m:230-284). The DDS specifics of the physical lab are
  out of scope on TPU, but the interface contract is preserved so a lab
  bridge can be plugged in.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Protocol

import numpy as np

from pdmpc_tpu.config import Config


@dataclass
class PlantMeasurement:
    """Reference: plant/PlantMeasurement.m (x, y, yaw, speed, steering)."""

    x: np.ndarray          # [N]
    y: np.ndarray          # [N]
    yaw: np.ndarray        # [N]
    speed: np.ndarray      # [N]
    steering: np.ndarray   # [N]

    @property
    def poses(self) -> np.ndarray:
        return np.stack([self.x, self.y, self.yaw], axis=-1)


class Plant(Protocol):
    """Abstract plant interface (plant/Plant.m:45-50)."""

    def measure(self) -> PlantMeasurement: ...

    def apply(self, predicted_poses: np.ndarray,
              predicted_trims: np.ndarray, k: int) -> None: ...

    def should_stop(self) -> bool: ...

    def end_run(self) -> None: ...

    def synchronize_start_with_plant(self) -> None: ...

    def get_step_time(self) -> float: ...


def get_plant(options: Config, **kwargs) -> "Plant":
    """Plant factory. Reference: Plant.get_plant (plant/Plant.m:25-41)."""
    from pdmpc_tpu.config import Environment

    if options.environment == Environment.simulation:
        return SimulationPlant(options, **kwargs)
    return ExternalPlant(options, **kwargs)


class SimulationPlant:
    """Perfect-execution simulation. Reference: plant/Simulation.m.

    ``apply`` sets the state to the first predicted pose/trim — no online
    ODE integration; the dynamics live entirely in the MPA
    (Simulation.m:86-117).
    """

    def __init__(self, options: Config, start_poses: np.ndarray,
                 start_speeds: np.ndarray | None = None):
        self.options = options
        n = start_poses.shape[0]
        self._poses = np.asarray(start_poses, dtype=np.float64).copy()
        self._speeds = (
            np.zeros(n) if start_speeds is None
            else np.asarray(start_speeds, dtype=np.float64).copy()
        )
        self._steering = np.zeros(n)
        self.k = 0
        self._stopped = False

    def measure(self) -> PlantMeasurement:
        return PlantMeasurement(
            x=self._poses[:, 0].copy(),
            y=self._poses[:, 1].copy(),
            yaw=self._poses[:, 2].copy(),
            speed=self._speeds.copy(),
            steering=self._steering.copy(),
        )

    def apply(self, predicted_poses: np.ndarray,
              predicted_trims: np.ndarray, k: int,
              trim_speeds: np.ndarray | None = None,
              trim_steerings: np.ndarray | None = None) -> None:
        self._poses = np.asarray(predicted_poses)[:, 0, :].copy()
        if trim_speeds is not None:
            self._speeds = np.asarray(trim_speeds).copy()
        if trim_steerings is not None:
            self._steering = np.asarray(trim_steerings).copy()
        self.k = k + 1

    def should_stop(self) -> bool:
        # end-of-run sentinel semantics (Simulation.m:164-173)
        return self._stopped or self.k >= self.options.k_end

    def end_run(self) -> None:
        self._stopped = True

    def synchronize_start_with_plant(self) -> None:
        pass

    def get_step_time(self) -> float:
        return self.options.dt_seconds


class ExternalPlant:
    """CpmLab-shaped adapter for an external plant.

    The user supplies ``measure_fn`` and ``command_fn`` callbacks (the role
    of the lab's DDS readers/writers, CpmLab.m:318-332). ``apply``
    maintains an Hp-deep trajectory ring buffer with per-point validity
    times, like the reference's VehicleCommandTrajectory writer with
    nanosecond ``valid_after`` stamps (CpmLab.m:230-284); the middleware
    period may override ``dt_seconds`` (CpmLab.m:76).
    """

    def __init__(self, options: Config,
                 measure_fn: Callable[[], PlantMeasurement],
                 command_fn: Callable[[list[dict]], None] | None = None,
                 middleware_period_s: float | None = None,
                 stop_fn: Callable[[], bool] | None = None):
        self.options = options
        self._measure_fn = measure_fn
        self._command_fn = command_fn or (lambda cmds: None)
        self._stop_fn = stop_fn or (lambda: False)
        self._dt = (
            middleware_period_s
            if middleware_period_s is not None
            else options.dt_seconds
        )
        self.time_now_ns = 0
        self._stopped = False

    def measure(self) -> PlantMeasurement:
        self.time_now_ns += int(self._dt * 1e9)
        return self._measure_fn()

    def apply(self, predicted_poses: np.ndarray,
              predicted_trims: np.ndarray, k: int) -> None:
        # Hp trajectory points with valid_after stamps, one control period
        # apart (the reference delays by Hp-1 steps for consistency;
        # validity stamping is the transferable part of that contract)
        commands = []
        n, hp = predicted_poses.shape[:2]
        for v in range(n):
            points = [
                {
                    "t_ns": self.time_now_ns + int((i + 1) * self._dt * 1e9),
                    "px": float(predicted_poses[v, i, 0]),
                    "py": float(predicted_poses[v, i, 1]),
                    "yaw": float(predicted_poses[v, i, 2]),
                }
                for i in range(hp)
            ]
            commands.append({"vehicle": v, "points": points})
        self._command_fn(commands)

    def should_stop(self) -> bool:
        return self._stopped or self._stop_fn()

    def end_run(self) -> None:
        self._stopped = True

    def synchronize_start_with_plant(self) -> None:
        # ready/start handshake hook (CpmLab.synchronize_start_with_plant,
        # :137-162); external bridges override by waiting in measure_fn
        self.time_now_ns = int(time.time() * 1e9)

    def get_step_time(self) -> float:
        return self._dt
