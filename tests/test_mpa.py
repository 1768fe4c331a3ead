"""MPA builder tests (reference: hlc/model/motion_primitive_automaton/)."""

import numpy as np
import pytest

from pdmpc_tpu.config import Config, MpaType, ScenarioType
from pdmpc_tpu.models import mpa as mpa_mod
from pdmpc_tpu.models.bicycle import bicycle_ode, integrate_rk4


@pytest.fixture(scope="module")
def mpa_single():
    cfg = Config(scenario_type=ScenarioType.circle, mpa_type=MpaType.single_speed)
    return mpa_mod.build_mpa(cfg)


class TestChooseTrims:
    def test_single_speed_structure(self):
        # choose_trims.m:13-35: 12 steering trims + equilibrium
        inputs, adj = mpa_mod.choose_trims(MpaType.single_speed, 0.128)
        assert inputs.shape == (12, 2)
        # equilibrium is trim 0
        assert inputs[0, 0] == 0 and inputs[0, 1] == 0
        # steering fan from -0.6 to 0.6
        assert inputs[1, 0] == pytest.approx(-0.6)
        assert inputs[-1, 0] == pytest.approx(0.6)
        # middle trim: steering 0, max speed 0.8
        assert inputs[6, 0] == pytest.approx(0.0)
        assert inputs[6, 1] == pytest.approx(0.8)
        # equilibrium reachable from everywhere and vice versa
        assert adj[0].all() and adj[:, 0].all()
        # others: band of +-1
        assert adj[1, 2] and not adj[1, 3]
        assert adj.T.tolist() == adj.tolist()  # symmetric

    def test_triple_speed_structure(self):
        inputs, adj = mpa_mod.choose_trims(MpaType.triple_speed, 0.128)
        assert inputs.shape == (34, 2)
        # equilibrium connects only to the first (slowest) speed row
        assert adj[0, 1:12].all()
        assert not adj[0, 12:].any()
        # same-steering cross-speed links exist
        assert adj[1, 12] and adj[12, 23]
        # speed rows: 0.5 / 0.7 / 0.9 at steering 0
        assert inputs[6, 1] == pytest.approx(0.5)
        assert inputs[17, 1] == pytest.approx(0.7)
        assert inputs[28, 1] == pytest.approx(0.9)

    def test_realistic_structure(self):
        inputs, adj = mpa_mod.choose_trims(MpaType.realistic, 0.128)
        # accel-limited: speed changes of more than 1.05*acc_per_dt forbidden
        dv = np.abs(inputs[:, 1][None] - inputs[:, 1][:, None])
        assert not (adj & (dv > 1.05 * 0.128 + 1e-12)).any()
        # low speeds allow larger steering than high speeds
        lo = np.abs(inputs[inputs[:, 1] == 0][:, 0]).max()
        hi = np.abs(inputs[inputs[:, 1] == inputs[:, 1].max()][:, 0]).max()
        assert lo > hi


class TestBicycle:
    def test_straight_line(self):
        x0 = np.array([0.0, 0.0, 0.0, 1.0, 0.0])
        states = integrate_rk4(x0, np.array([0.0, 0.0]), 1.0, 11)
        np.testing.assert_allclose(states[-1, 0], 1.0, atol=1e-10)
        np.testing.assert_allclose(states[-1, 1:3], 0.0, atol=1e-12)

    def test_ode_matches_rajamani(self):
        # BicycleModel.m:39-53 with Lf=Lr=0.1
        x = np.array([0.0, 0.0, 0.5, 0.8, 0.3])
        dx = bicycle_ode(x, np.array([0.1, 0.2]))
        beta = np.arctan(0.5 * np.tan(0.3))
        assert dx[0] == pytest.approx(0.8 * np.cos(0.5 + beta))
        assert dx[1] == pytest.approx(0.8 * np.sin(0.5 + beta))
        assert dx[2] == pytest.approx(0.8 / 0.2 * np.tan(0.3) * np.cos(beta))
        assert dx[3] == 0.2
        assert dx[4] == 0.1


class TestMpaBuild:
    def test_shapes(self, mpa_single):
        n = 12
        assert mpa_single.dx.shape == (n, n)
        assert mpa_single.transition.shape == (6, n, n)
        assert mpa_single.area_conv.shape == (n, n, mpa_mod.VM_CONVEX, 2)
        assert mpa_single.local_reachable_sets_conv.shape == (
            n, 6, mpa_mod.K_REACHABLE, 2
        )

    def test_straight_maneuver_displacement(self, mpa_single):
        # eq (trim 0) -> straight max speed (trim 7): accel 0 -> 0.8 over
        # 0.2 s => dx = mean speed * dt = 0.08, dy = dyaw = 0
        assert mpa_single.dx[0, 6] == pytest.approx(0.08, abs=1e-9)
        assert mpa_single.dy[0, 6] == pytest.approx(0.0, abs=1e-12)
        assert mpa_single.dyaw[0, 6] == pytest.approx(0.0, abs=1e-12)

    def test_turning_maneuver_symmetry(self, mpa_single):
        # steering +s and -s at same speed mirror in y/yaw
        # trims 1..11: steering -0.6..0.6; trims 5 and 7 mirror around 6
        assert mpa_single.dyaw[6, 7] == pytest.approx(
            -mpa_single.dyaw[6, 5], abs=1e-10
        )
        assert mpa_single.dy[6, 7] == pytest.approx(
            -mpa_single.dy[6, 5], abs=1e-10
        )
        assert mpa_single.dx[6, 7] == pytest.approx(
            mpa_single.dx[6, 5], abs=1e-10
        )

    def test_distance_to_equilibrium(self, mpa_single):
        # everything is 1 hop from the equilibrium except the equilibrium
        assert mpa_single.distance_to_equilibrium[0] == 0
        assert (mpa_single.distance_to_equilibrium[1:] == 1).all()

    def test_recursive_feasibility_transition(self, mpa_single):
        # last step (k = Hp-1): only trims with distance <= 0 allowed
        last = mpa_single.transition[-1]
        allowed_targets = np.nonzero(last.any(axis=0))[0]
        np.testing.assert_array_equal(allowed_targets, [0])
        # earlier steps allow everything adjacent
        assert (
            mpa_single.transition[0].sum() == mpa_single.adjacency.sum()
        )

    def test_maneuver_area_contains_sweep(self, mpa_single):
        # the offset swept polygon must contain the center trajectory
        import jax.numpy as jnp

        from pdmpc_tpu.ops.geometry import point_in_convex

        i, j = 6, 7  # straight -> slight left
        traj = mpa_single.man_trajectory[i, j]
        poly = jnp.asarray(mpa_single.area_conv[i, j], dtype=jnp.float32)
        for t in range(0, traj.shape[0], 5):
            p = jnp.asarray(traj[t, :2], dtype=jnp.float32)
            assert bool(point_in_convex(p, poly))

    def test_reachable_sets_grow_and_contain_maneuvers(self, mpa_single):
        rs = mpa_single.local_reachable_sets_conv
        from pdmpc_tpu.models.mpa import _outer_poly_approx_np

        del _outer_poly_approx_np
        # areas grow with the horizon
        def poly_area(p):
            x, y = p[:, 0], p[:, 1]
            return 0.5 * abs(
                np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
            )

        areas = [poly_area(rs[6, t]) for t in range(6)]
        assert all(areas[t + 1] > areas[t] for t in range(5))
        # step-0 reachable set contains all one-step maneuver endpoints
        import jax.numpy as jnp

        from pdmpc_tpu.ops.geometry import point_in_convex

        poly0 = jnp.asarray(rs[6, 0], dtype=jnp.float32)
        for j in np.nonzero(mpa_single.transition[0][6])[0]:
            p = jnp.asarray(
                [mpa_single.dx[6, j], mpa_single.dy[6, j]], dtype=jnp.float32
            )
            assert bool(point_in_convex(p, poly0))

    def test_trim_from_values(self, mpa_single):
        assert mpa_single.trim_from_values(0.0, 0.0) == 0
        assert mpa_single.trim_from_values(0.8, 0.0) == 6
        # zero steering never maps to a steering trim
        assert mpa_single.trim_from_values(0.55, 0.0) in (0, 6)

    def test_cache_roundtrip(self, mpa_single, tmp_path):
        from pdmpc_tpu.models.mpa import _load_mpa, _save_mpa

        p = str(tmp_path / "mpa.npz")
        _save_mpa(mpa_single, p)
        cfg = Config(scenario_type=ScenarioType.circle)
        loaded = _load_mpa(p, cfg)
        np.testing.assert_array_equal(loaded.dx, mpa_single.dx)
        np.testing.assert_array_equal(
            loaded.local_reachable_sets_conv,
            mpa_single.local_reachable_sets_conv,
        )

    def test_to_tensors(self, mpa_single):
        t = mpa_single.to_tensors(convex=True)
        assert t.n_trims == 12
        assert t.Hp == 6
        assert t.area.shape == (12, 12, mpa_mod.VM_CONVEX, 2)


class TestDpReachability:
    """Divide-&-conquer offline reachability for long horizons.

    Reference: reachability_analysis_offline_DP
    (MotionPrimitiveAutomaton.m:394-647) — frontier enumeration to Hp/2,
    then rigid-transform composition of half-horizon sets.
    """

    @pytest.fixture(scope="class")
    def mpa_hp7(self):
        cfg = Config(scenario_type=ScenarioType.circle, Hp=7)
        return mpa_mod.build_mpa(cfg)

    def test_dp_contains_exact(self, mpa_hp7):
        """DP sets must CONTAIN the exact enumeration (conservative), and
        be tight at the mid-horizon composition boundary."""
        m = mpa_hp7
        exact, _ = mpa_mod._enumerate_reachability(
            m, m.area_conv, m.transition
        )
        dp = m.local_reachable_sets_conv
        theta = 2 * np.pi * np.arange(64) / 64
        dirs = np.stack([np.cos(theta), np.sin(theta)], -1)
        h_dp = np.einsum("ntkd,md->ntkm", dp, dirs).max(axis=2)
        h_ex = np.einsum("ntkd,md->ntkm", exact, dirs).max(axis=2)
        # containment: support function of DP >= exact everywhere
        assert (h_ex - h_dp).max() < 1e-9
        # tightness: over-approximation bounded (metres)
        assert (h_dp - h_ex).max() < 0.2

    def test_first_half_is_exact(self, mpa_hp7):
        m = mpa_hp7
        exact, _ = mpa_mod._enumerate_reachability(
            m, m.area_conv, m.transition
        )
        hp_half = -(-m.Hp // 2)
        np.testing.assert_allclose(
            m.local_reachable_sets_conv[:, :hp_half],
            exact[:, :hp_half], atol=1e-9,
        )

    def test_hp10_builds_fast_without_truncation(self, tmp_path):
        import time
        import warnings

        cfg = Config(scenario_type=ScenarioType.circle, Hp=10)
        cache = mpa_mod._LIBRARY_DIR
        name = mpa_mod.mpa_cache_name(cfg)
        path = f"{cache}/{name}"
        import os
        if os.path.isfile(path):
            os.remove(path)  # force a rebuild to time it
        t0 = time.time()
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any truncation warning fails
            m = mpa_mod.build_mpa(cfg)
        assert time.time() - t0 < 60.0
        assert m.local_reachable_sets_conv.shape[1] == 10
        # sets must be monotonically growing over the horizon (unions of
        # longer-reach maneuvers): area via the shoelace formula
        v = m.local_reachable_sets_conv
        x, y = v[..., 0], v[..., 1]
        area = 0.5 * np.abs(
            np.sum(x * np.roll(y, -1, -1) - np.roll(x, -1, -1) * y, axis=-1)
        )
        assert (np.diff(area, axis=1) > -1e-9).all()
