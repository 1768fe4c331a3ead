"""Native runtime components (C++), loaded via ctypes.

The reference's native component is a C++ MEX priority queue powering its
A* (priority_queue_interface_mex.cpp, built by compile_priority_queue.m and
the CI Build job). Here the entire A* search core is native
(``astar.cpp``), compiled on demand with g++ (the compile_priority_queue.m
role) and exposed through a C ABI — the host-side reference planner / CPU
fallback and the fast oracle that validates the TPU beam search.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "astar.cpp")
_LIB = os.path.join(_DIR, "libpdmpc_astar.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None


def compile_native(force: bool = False) -> str:
    """Build the shared library (compile_priority_queue.m role)."""
    with _lock:
        if (not force and os.path.isfile(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return _LIB
        tmp = _LIB + f".{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", tmp, _SRC],
            check=True, capture_output=True,
        )
        os.replace(tmp, _LIB)
        return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        path = compile_native()
        lib = ctypes.CDLL(path)
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f8p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i4p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.astar_plan.restype = ctypes.c_int
        lib.astar_plan.argtypes = [
            ctypes.c_int, ctypes.c_int,                  # n_trims, hp
            u8p, f8p, f8p, f8p,                          # transition, dx, dy, dyaw
            f8p, ctypes.c_int,                           # areas, va
            ctypes.c_double, ctypes.c_double,            # x0, y0
            ctypes.c_double, ctypes.c_int,               # yaw0, trim0
            f8p, f8p, ctypes.c_double,                   # ref, vref, dt
            f8p, u8p, ctypes.c_int, ctypes.c_int,        # obs, mask, n_obs, vo
            ctypes.c_int,                                # non_convex
            f8p, ctypes.c_int,                           # bnd, n_bnd
            f8p, f8p,                                    # areas_bnd_no/lg
            i4p, f8p,                                    # out trims, poses
            ctypes.POINTER(ctypes.c_double),             # out cost
            ctypes.POINTER(ctypes.c_int),                # out n_expanded
        ]
        _lib = lib
    return _lib


def native_available() -> bool:
    try:
        _load()
        return True
    except (subprocess.CalledProcessError, OSError):
        return False


def astar_plan_native(mpa, x0, trim0, ref_points, v_ref, obs_polys,
                      obs_mask, dt, boundary_segments=None,
                      boundary_mask=None, non_convex=False):
    """Native A* with the interface of utils.astar_oracle.astar_plan
    (incl. the road-path constraints: non-convex outline obstacles and
    lanelet-boundary segments)."""
    from pdmpc_tpu.utils.astar_oracle import OraclePlan

    lib = _load()
    hp = mpa.Hp
    n = mpa.n_trims
    if non_convex:
        area_obs = mpa.area_nc
        area_bnd_no = mpa.area_nc_no_offset
        area_bnd_lg = mpa.area_nc_large_offset
    else:
        area_obs = mpa.area_conv
        area_bnd_no = mpa.area_conv_no_offset
        area_bnd_lg = mpa.area_conv_large_offset
    va = area_obs.shape[2]
    obs_polys = np.ascontiguousarray(obs_polys, dtype=np.float64)
    n_obs, _, vo = obs_polys.shape[0], obs_polys.shape[1], obs_polys.shape[2]

    if boundary_segments is not None:
        bmask = np.asarray(boundary_mask, dtype=bool)
        bnd = np.ascontiguousarray(
            np.asarray(boundary_segments, dtype=np.float64)[bmask]
        )
        n_bnd = bnd.shape[0]
        if n_bnd == 0:
            bnd = np.zeros((1, 2, 2), dtype=np.float64)
    else:
        bnd = np.zeros((1, 2, 2), dtype=np.float64)
        n_bnd = 0

    out_trims = np.zeros(hp, dtype=np.int32)
    out_poses = np.zeros((hp, 3), dtype=np.float64)
    cost = ctypes.c_double()
    n_expanded = ctypes.c_int()

    rc = lib.astar_plan(
        n, hp,
        np.ascontiguousarray(mpa.transition, dtype=np.uint8),
        np.ascontiguousarray(mpa.dx, dtype=np.float64),
        np.ascontiguousarray(mpa.dy, dtype=np.float64),
        np.ascontiguousarray(mpa.dyaw, dtype=np.float64),
        np.ascontiguousarray(area_obs, dtype=np.float64),
        va,
        float(x0[0]), float(x0[1]), float(x0[2]), int(trim0),
        np.ascontiguousarray(ref_points, dtype=np.float64),
        np.ascontiguousarray(v_ref, dtype=np.float64),
        float(dt),
        obs_polys,
        np.ascontiguousarray(obs_mask, dtype=np.uint8),
        n_obs, vo,
        int(non_convex),
        bnd, n_bnd,
        np.ascontiguousarray(area_bnd_no, dtype=np.float64),
        np.ascontiguousarray(area_bnd_lg, dtype=np.float64),
        out_trims, out_poses,
        ctypes.byref(cost), ctypes.byref(n_expanded),
    )
    return OraclePlan(
        trims=out_trims.astype(np.int64),
        poses=out_poses,
        cost=float(cost.value),
        is_exhausted=rc != 0,
        n_expanded=int(n_expanded.value),
    )
