"""Scenario container: fixed-shape tensors describing vehicles and roads.

Re-design of scenarios/Scenario.m + scenarios/Vehicle.m: a scenario is a set
of padded tensors (reference paths, speeds, start poses) ready to be closed
over by the jitted control step, plus optional road-network data for
commonroad scenarios.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple

import numpy as np

from pdmpc_tpu.models.bicycle import VEHICLE_LENGTH, VEHICLE_WIDTH


class ScenarioTensors(NamedTuple):
    """Device-side scenario constants (jnp arrays)."""

    reference_paths: Any   # [N, P, 2] f32, padded by repeating the last point
    path_cumlen: Any       # [N, P] f32 cumulative arc length
    is_loop: Any           # [N] bool
    reference_speed: Any   # [N] f32
    start_poses: Any       # [N, 3] f32
    start_trims: Any       # [N] i32

    @property
    def n_vehicles(self) -> int:
        return self.start_poses.shape[0]


@dataclass
class Scenario:
    """Host-side scenario description (numpy)."""

    reference_paths: list[np.ndarray]   # per vehicle [P_i, 2]
    reference_speeds: np.ndarray        # [N]
    start_poses: np.ndarray             # [N, 3]
    start_trims: np.ndarray             # [N] int
    vehicle_length: float = VEHICLE_LENGTH
    vehicle_width: float = VEHICLE_WIDTH
    plot_limits: np.ndarray = field(
        default_factory=lambda: np.array([[0.0, 4.5], [0.0, 4.0]])
    )
    road: Any = None  # RoadData for commonroad scenarios

    @property
    def n_vehicles(self) -> int:
        return self.start_poses.shape[0]

    def to_tensors(self) -> ScenarioTensors:
        import jax.numpy as jnp

        n = self.n_vehicles
        p_max = max(p.shape[0] for p in self.reference_paths)
        paths = np.zeros((n, p_max, 2), dtype=np.float32)
        is_loop = np.zeros(n, dtype=bool)
        for i, p in enumerate(self.reference_paths):
            paths[i, : p.shape[0]] = p
            paths[i, p.shape[0]:] = p[-1]
            # loop iff first and last points coincide
            # (sample_reference_trajectory.m:40)
            is_loop[i] = np.linalg.norm(p[0] - p[-1]) < 1e-8
        seg = np.linalg.norm(np.diff(paths, axis=1), axis=-1)
        cumlen = np.concatenate(
            [np.zeros((n, 1), dtype=np.float32), np.cumsum(seg, axis=1)],
            axis=1,
        )
        return ScenarioTensors(
            reference_paths=jnp.asarray(paths),
            path_cumlen=jnp.asarray(cumlen, dtype=jnp.float32),
            is_loop=jnp.asarray(is_loop),
            reference_speed=jnp.asarray(
                self.reference_speeds, dtype=jnp.float32
            ),
            start_poses=jnp.asarray(self.start_poses, dtype=jnp.float32),
            start_trims=jnp.asarray(self.start_trims, dtype=jnp.int32),
        )
