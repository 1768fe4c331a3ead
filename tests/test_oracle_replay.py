"""System-level oracle cross-validation on the road path.

Replays the cr3 golden scenario step by step and validates EVERY
per-vehicle plan against the independent A* oracle (numpy + native C++)
running the full road constraint set — non-convex outline obstacles and
lanelet-boundary segments. This anchors the road-scenario planner to an
independent implementation the way the reference's goldens anchor to
MATLAB (GraphSearch.m:111-196), closing the gap that the oracle formerly
covered only free-space/convex planning.

The controller exposes the exact planning inputs via
``make_prioritized_step(..., debug_capture=True)``: the obstacle tensor
snapshot each vehicle planned against, its obstacle mask, boundary
segments, and reference samples.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.controller import initial_state, make_prioritized_step
from pdmpc_tpu.experiment import create_scenario
from pdmpc_tpu.models.mpa import build_mpa
from pdmpc_tpu.native import astar_plan_native, native_available
from pdmpc_tpu.utils.astar_oracle import astar_plan
from tests.test_system_commonroad import GOLDEN_CONFIGS


@pytest.fixture(scope="module")
def replay():
    cfg = GOLDEN_CONFIGS["commonroad_03veh"].validate()
    mpa = build_mpa(cfg)
    scenario = create_scenario(cfg, mpa)
    mpa_t = mpa.to_tensors_for(cfg)
    sc_t = scenario.to_tensors()
    step = jax.jit(
        make_prioritized_step(cfg, mpa_t, sc_t, debug_capture=True)
    )
    state = initial_state(sc_t, cfg.Hp)
    steps = []
    for k in range(cfg.k_end):
        state, info, cap = step(state, jnp.asarray(k, dtype=jnp.int32))
        steps.append((
            jax.tree.map(np.asarray, info),
            {kk: np.asarray(v) for kk, v in cap.items()},
        ))
    return cfg, mpa, steps


def _oracle_inputs(cfg, cap, v):
    hp = cfg.Hp
    obs_polys = cap["obs_polys"][v]                  # [n_obs, Hp, VO, 2]
    obs_mask = np.broadcast_to(
        cap["obs_mask"][v][:, None], (obs_polys.shape[0], hp)
    )
    return dict(
        x0=cap["pose0"][v],
        trim0=int(cap["trim0"][v]),
        ref_points=cap["ref_points"][v],
        v_ref=cap["v_ref"][v],
        obs_polys=obs_polys,
        obs_mask=obs_mask,
        dt=cfg.dt_seconds,
        boundary_segments=cap["bnd_segs"][v],
        boundary_mask=cap["bnd_mask"][v],
        non_convex=True,
    )


def test_replay_matches_golden(replay):
    """The debug-capture step is the production step: its trajectory must
    equal the committed golden exactly."""
    from tests.golden import compare_golden
    from pdmpc_tpu.experiment import ExperimentResult

    cfg, _, steps = replay
    infos = jax.tree.map(lambda *xs: np.stack(xs), *[s[0] for s in steps])
    res = ExperimentResult(options=cfg, infos=infos, final_state=None)
    compare_golden("commonroad_03veh", res)


def test_every_plan_is_oracle_optimal(replay):
    """Per (step, vehicle): the beam plan's cost equals the independent
    A* optimum over the identical constraint set (or is within the
    documented beam gap)."""
    cfg, mpa, steps = replay
    checked = 0
    gaps = []
    for k, (info, cap) in enumerate(steps):
        for v in range(3):
            if info.needs_fallback[v] or info.is_exhausted[v]:
                continue
            kw = _oracle_inputs(cfg, cap, v)
            oracle = astar_plan(mpa, **kw)
            assert not oracle.is_exhausted, (
                f"step {k} vehicle {v}: oracle exhausted but beam planned"
            )
            beam_cost = float(info.cost[v])
            # the oracle (f64, exhaustive) can never be worse than the
            # f32 beam
            assert oracle.cost <= beam_cost * (1 + 1e-4) + 1e-6, (
                f"step {k} vehicle {v}: oracle {oracle.cost} > beam "
                f"{beam_cost} — constraint sets diverged"
            )
            rel_gap = (beam_cost - oracle.cost) / max(oracle.cost, 1e-9)
            gaps.append(rel_gap)
            if rel_gap <= 1e-3:
                np.testing.assert_array_equal(
                    info.trims[v], oracle.trims,
                    err_msg=f"step {k} vehicle {v}: same cost, "
                            "different plan",
                )
            checked += 1
    assert checked >= 40, f"only {checked} plans checked"
    gaps = np.array(gaps)
    # beam 64 on the 12-trim lattice: the search is near-exhaustive;
    # every cr3 plan must be exactly optimal (any future regression that
    # loses optimality shows up here as a nonzero gap)
    assert (gaps <= 1e-3).all(), (
        f"beam-suboptimal plans: {np.count_nonzero(gaps > 1e-3)} "
        f"(max gap {gaps.max():.4%})"
    )


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_oracle_agrees_on_road_path(replay):
    """The C++ oracle with boundary + outline constraints returns the
    same optimum as the numpy oracle on real cr3 planning inputs."""
    cfg, mpa, steps = replay
    info, cap = steps[5]
    for v in range(3):
        if info.needs_fallback[v] or info.is_exhausted[v]:
            continue
        kw = _oracle_inputs(cfg, cap, v)
        py = astar_plan(mpa, **kw)
        nat = astar_plan_native(mpa, **kw)
        assert nat.cost == pytest.approx(py.cost, rel=1e-9)
        np.testing.assert_array_equal(nat.trims, py.trims)
        np.testing.assert_allclose(nat.poses, py.poses, atol=1e-12)
