"""Speed-of-light accounting for the hot kernels (BASELINE.json: "measure
rollout+solve kernels at speed-of-light per chip").

Micro-benches the three device kernels that dominate the cr20 planning
step — the outline-crossing Pallas kernel (the InterX-equivalent obstacle
check), the boundary-crossing Pallas kernel, and the one-hot MXU maneuver
expansion — at their production shapes (20-vehicle commonroad, beam 256,
compact-level chunk of 10 vehicles), plus an analytic roofline for the
whole step.

Peaks (TPU v5e public specs): 197 TFLOP/s bf16 on the MXU, 819 GB/s HBM.
The predicate kernels run f32 compare/select work on the VPU, whose peak
is not publicly specified — they are therefore reported as achieved
flop-equivalents/s (mults+adds+compares actually issued, upper bound
before bbox work-skipping) with utilization quoted against the HBM
roofline, the resource that binds their staging. The MXU expansion is
quoted against the bf16 MXU peak (it runs f32 HIGHEST, i.e. multi-pass —
the quoted fraction is the conservative denominator).

Usage: ``python -m tools.speed_of_light`` (on the TPU) prints one JSON
object; bench.py embeds this measurement as the ``extra.sol_utilization``
key (disable with PDMPC_BENCH_SOL=0).
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_MXU_BF16 = 197e12          # FLOP/s, TPU v5e
PEAK_HBM = 819e9                # bytes/s, TPU v5e

# flop-equivalents (mult+add+compare) per [VA_PAD, T]-element issued by the
# predicate kernels per obstacle edge / boundary segment: d, a_num, b_num
# cross products + the robust-crossing comparisons
# (pallas_collision._boundary_kernel / _outline_kernel bodies)
OPS_PER_SEGMENT_TEST = 21


def _chain_time(step_fn, x0, reps: int = 20) -> float:
    """Median seconds per rep of ``step_fn`` chained ``reps`` times in ONE
    device program (no per-rep host round trip; the data feedback defeats
    result caching through the tunnel)."""

    @jax.jit
    def many(x):
        def body(x, _):
            return step_fn(x), ()

        x, _ = jax.lax.scan(body, x, None, length=reps)
        return x

    out = many(x0)
    jax.block_until_ready(out)              # compile + warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = many(x0)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / reps)
    return float(np.median(samples))


def _feedback(cx, scalar):
    # denormal-magnitude data dependency: forces sequential execution
    # without changing f32 values
    return cx + 1e-30 * scalar


def build_inputs(cfg=None):
    """Production-shape kernel inputs from the real cr20 scenario."""
    from pdmpc_tpu.config import Config, ScenarioType
    from pdmpc_tpu.experiment import create_scenario
    from pdmpc_tpu.models.mpa import build_mpa
    from pdmpc_tpu.ops import pallas_collision as pk
    from pdmpc_tpu import controller as C

    if cfg is None:
        cfg = Config(
            scenario_type=ScenarioType.commonroad, amount=20, T_end=4.0,
            beam_width=256,
        ).validate()
    mpa = build_mpa(cfg)
    sc = create_scenario(cfg, mpa)
    mpa_t = mpa.to_tensors_for(cfg)
    sc_t = sc.to_tensors()

    n = cfg.amount
    chunk = min(n, cfg.level_chunk or 2)             # compact-level batch
    n_trims = mpa_t.n_trims
    beam = cfg.beam_width
    va = mpa_t.area.shape[-2]
    c_cand = n_trims * beam                          # saturated layer

    # candidates: maneuver areas of chunk vehicles at their real start
    # poses, vertex-major [chunk, VA, C] like the one-hot expansion emits
    state = C.initial_state(sc_t, cfg.Hp)
    poses = np.asarray(state.pose[:chunk])
    areas = np.asarray(mpa_t.area)                   # [n, n, VA, 2]
    rng = np.random.default_rng(0)
    pt = rng.integers(0, n_trims, size=(chunk, c_cand))
    ct_ = rng.integers(0, n_trims, size=(chunk, c_cand))
    local = areas[pt, ct_]                           # [chunk, C, VA, 2]
    cth = np.cos(poses[:, 2])[:, None, None]
    sth = np.sin(poses[:, 2])[:, None, None]
    cx = (cth * local[..., 0] - sth * local[..., 1]
          + poses[:, 0, None, None])
    cy = (sth * local[..., 0] + cth * local[..., 1]
          + poses[:, 1, None, None])
    cx = jnp.asarray(np.swapaxes(cx, 1, 2))          # [chunk, VA, C]
    cy = jnp.asarray(np.swapaxes(cy, 1, 2))

    # obstacles: all 20 vehicles' occupied rectangles over 2 families
    # (sequential predictions + parallel reachable sets), VO=16 rings —
    # the cr20 obstacle tensor shape
    occ = jax.vmap(lambda p: C._occupied_area(p, cfg.offset))(state.pose)
    from pdmpc_tpu.ops.search import pad_polys_to_vo

    obs = jnp.concatenate([pad_polys_to_vo(occ)] * 2, axis=0)  # [2n, VO, 2]
    obs_mask = jnp.ones((obs.shape[0],), dtype=bool)
    outline_pre = pk.precompute_outline(obs, obs_mask)
    sat_pre = pk.precompute_obstacles(obs, obs_mask)

    # boundary segments: per-vehicle predicted-lanelet bundles (the real
    # N_PREDICTED_LANELETS x per-lanelet segment rows)
    ids = np.stack([
        np.asarray(sorted(set(int(x) for x in sc.lanelet_indices[v]))
                   [:C.N_PREDICTED_LANELETS] + [0] * C.N_PREDICTED_LANELETS
                   )[:C.N_PREDICTED_LANELETS]
        for v in range(chunk)
    ])
    segs = sc_t.road.boundary_segments[ids].reshape(chunk, -1, 2, 2)
    smask = sc_t.road.boundary_seg_mask[ids].reshape(chunk, -1)
    seg_pre = jax.vmap(pk.precompute_segments)(segs, smask)

    # the one-hot MXU expansion operands
    pack = jnp.asarray(
        np.transpose(areas, (2, 1, 3, 0)).reshape(va * n_trims * 2, n_trims)
    )
    trims = jnp.asarray(rng.integers(0, n_trims, size=(chunk, beam)),
                        dtype=jnp.int32)

    shapes = dict(
        chunk=chunk, n_vehicles=n, n_trims=n_trims, beam=beam, va=va,
        c_cand=c_cand, vo=int(obs.shape[1]), n_obs=int(obs.shape[0]),
        n_segs=int(smask.sum(axis=-1).mean()),
        s_pad=int(seg_pre.packed.shape[-1]),
        layer_candidates=[
            w * n_trims
            for w in np.minimum(
                beam, n_trims ** np.arange(0, cfg.Hp)
            ).tolist()
        ],
    )
    return (cfg, cx, cy, outline_pre, sat_pre, seg_pre, pack, trims,
            shapes)


def measure(device_step_seconds: float | None = None,
            verbose: bool = False) -> dict:
    """Run the micro-benches; returns the sol_utilization dict."""
    import sys

    from pdmpc_tpu.ops import pallas_collision as pk

    def _log(msg):
        if verbose:
            print(msg, file=sys.stderr, flush=True)

    _log("sol: building inputs...")
    (cfg, cx, cy, outline_pre, sat_pre, seg_pre, pack, trims,
     sh) = build_inputs()
    chunk, va, c_cand = sh["chunk"], sh["va"], sh["c_cand"]
    va_pad = -(-va // 8) * 8
    n_obs, vo = sh["n_obs"], sh["vo"]
    s_act = sh["n_segs"]
    out = {"shapes": sh, "peaks": {
        "mxu_bf16_flops": PEAK_MXU_BF16, "hbm_bytes_per_s": PEAK_HBM,
        "device": str(jax.devices()[0]),
    }}

    # ---- outline kernel (the cr20 obstacle check) -----------------------
    _log("sol: outline kernel...")
    def outline_step(x):
        hits = jax.vmap(lambda a, b: pk.outline_hits_pre(a, b, outline_pre)
                        )(x, cy)
        return _feedback(x, jnp.sum(hits.astype(jnp.float32)))

    t = _chain_time(outline_step, cx)
    flops = chunk * c_cand * n_obs * vo * va_pad * OPS_PER_SEGMENT_TEST
    bytes_ = chunk * (2 * va_pad * c_cand * 4      # cx, cy staged
                      + 2 * n_obs * vo * 4 + n_obs * vo * 4   # ox/oy/edge_ok
                      + n_obs * 20 + c_cand * 4)   # bbox+mask, out
    out["outline_kernel"] = {
        "time_ms": round(t * 1e3, 4),
        "flop_equiv_issued_ub": flops,
        "achieved_tflops_equiv": round(flops / t / 1e12, 3),
        "hbm_bytes": bytes_,
        "achieved_gb_per_s": round(bytes_ / t / 1e9, 2),
        "frac_of_hbm_roofline": round(bytes_ / PEAK_HBM / t, 4),
        "note": "VPU predicate work; flop-equivs are the no-skip upper "
                "bound (bbox prefilter skips most groups on real "
                "geometry)",
    }

    # ---- boundary kernel ------------------------------------------------
    _log("sol: boundary kernel...")
    def boundary_step(x):
        hits = jax.vmap(
            lambda a, b, p: pk.boundary_hits_pre(a, b, p)
        )(x, cy, seg_pre)
        return _feedback(x, jnp.sum(hits.astype(jnp.float32)))

    t = _chain_time(boundary_step, cx)
    flops = chunk * c_cand * s_act * va_pad * OPS_PER_SEGMENT_TEST
    bytes_ = chunk * (2 * va_pad * c_cand * 4
                      + 8 * sh["s_pad"] * 4 + sh["s_pad"] * 20
                      + c_cand * 4)
    out["boundary_kernel"] = {
        "time_ms": round(t * 1e3, 4),
        "flop_equiv_issued_ub": flops,
        "achieved_tflops_equiv": round(flops / t / 1e12, 3),
        "hbm_bytes": bytes_,
        "achieved_gb_per_s": round(bytes_ / t / 1e9, 2),
        "frac_of_hbm_roofline": round(bytes_ / PEAK_HBM / t, 4),
    }

    # ---- SAT kernel (circle / convex path) ------------------------------
    _log("sol: sat kernel...")
    def sat_step(x):
        hits = jax.vmap(lambda a, b: pk.sat_hits_pre(a, b, sat_pre))(x, cy)
        return _feedback(x, jnp.sum(hits.astype(jnp.float32)))

    t = _chain_time(sat_step, cx)
    # per candidate-obstacle pair: VO projections on VA_PAD axes + VA
    # projections on VO axes, ~3 ops each + extent compares
    flops = chunk * c_cand * n_obs * (vo * va_pad * 3 + vo * va_pad * 3)
    out["sat_kernel"] = {
        "time_ms": round(t * 1e3, 4),
        "flop_equiv_issued_ub": flops,
        "achieved_tflops_equiv": round(flops / t / 1e12, 3),
    }

    # ---- one-hot MXU expansion ------------------------------------------
    _log("sol: mxu expansion...")
    n_trims, beam = sh["n_trims"], sh["beam"]

    def mxu_step(tr):
        def one(tr_v):
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (n_trims, beam), 0)
                == tr_v[None]
            ).astype(jnp.float32)
            return jax.lax.dot_general(
                pack, onehot, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
        g = jax.vmap(one)(tr)
        return tr + (jnp.sum(g) * 1e-30).astype(jnp.int32)

    t = _chain_time(mxu_step, trims)
    m, k = pack.shape
    flops = chunk * 2 * m * k * beam
    # pack is closed over once and reused across all vmapped vehicles —
    # count its bytes once, not per chunk entry
    bytes_ = m * k * 4 + chunk * (k * beam * 4 + m * beam * 4)
    out["mxu_onehot_expansion"] = {
        "time_ms": round(t * 1e3, 4),
        "flops": flops,
        "achieved_tflops": round(flops / t / 1e12, 4),
        "frac_of_mxu_bf16_peak": round(flops / PEAK_MXU_BF16 / t, 6),
        "hbm_bytes": bytes_,
        "achieved_gb_per_s": round(bytes_ / t / 1e9, 2),
        "frac_of_hbm_roofline": round(bytes_ / PEAK_HBM / t, 4),
        "note": "K=12 of 128 MXU lanes occupied by construction "
                "(12-trim MPA): the op is layout-, not FLOP-, motivated",
    }

    # ---- whole-step roofline -------------------------------------------
    # analytic per-step totals: every vehicle planned once (compact-level),
    # summed over the growing-beam layers
    n = sh["n_vehicles"]
    total_cand = sum(sh["layer_candidates"])
    # predicate (VPU) and matmul (MXU) work cannot share a denominator:
    # the predicate kernels can never use the MXU, so their floor is the
    # HBM roofline of their staged bytes; only the one-hot expansion is
    # MXU-denominated. The combined floor is the sum of the two floors
    # (they are data-dependent within a layer, not overlappable).
    pred_flops = n * total_cand * (
        n_obs * vo * va_pad * OPS_PER_SEGMENT_TEST
        + s_act * va_pad * OPS_PER_SEGMENT_TEST
    )
    mxu_flops = n * cfg.Hp * 2 * m * k * beam
    step_flops = pred_flops + mxu_flops
    pred_bytes = n * cfg.Hp * 2 * va_pad * c_cand * 4
    mxu_bytes = m * k * 4 + n * cfg.Hp * m * beam * 4
    step_bytes = pred_bytes + mxu_bytes
    floor_s = pred_bytes / PEAK_HBM + max(
        mxu_flops / PEAK_MXU_BF16, mxu_bytes / PEAK_HBM
    )
    step_entry = {
        "analytic_flop_equiv_ub": step_flops,
        "analytic_hbm_bytes_approx": step_bytes,
        "predicate_floor_ms_hbm": round(pred_bytes / PEAK_HBM * 1e3, 4),
        "mxu_floor_ms": round(
            max(mxu_flops / PEAK_MXU_BF16, mxu_bytes / PEAK_HBM) * 1e3, 4
        ),
        "roofline_min_time_ms": round(floor_s * 1e3, 4),
        "floor_note": "predicates HBM-denominated (VPU work cannot use "
                      "the MXU), expansion MXU/HBM-denominated; floor = "
                      "sum of the two",
    }
    if device_step_seconds:
        step_entry["measured_ms"] = round(device_step_seconds * 1e3, 3)
        step_entry["achieved_tflops_equiv"] = round(
            step_flops / device_step_seconds / 1e12, 3
        )
        step_entry["frac_of_roofline_floor"] = round(
            floor_s / device_step_seconds, 5
        )
        step_entry["achieved_gb_per_s"] = round(
            step_bytes / device_step_seconds / 1e9, 2
        )
        step_entry["binding_resource"] = (
            "latency/VPU predicates (per-layer sequential dependency), "
            "not MXU FLOPs or HBM bandwidth"
        )
    out["whole_step"] = step_entry
    return out


def main() -> None:  # pragma: no cover — exercised via bench on the TPU
    print(json.dumps(measure(verbose=True), indent=2))


if __name__ == "__main__":
    main()
