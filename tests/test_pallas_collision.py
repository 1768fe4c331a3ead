"""Pallas SAT collision kernel vs the XLA reference (interpret mode on CPU;
the real-TPU path is exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pdmpc_tpu.ops.pallas_collision import candidate_collisions_pallas
from pdmpc_tpu.ops.search import candidate_collisions


def rand_polys(rng, n, v, scale=1.0):
    centers = rng.uniform(-3, 3, size=(n, 1, 2))
    ang = np.sort(rng.uniform(0, 2 * np.pi, size=(n, v)), axis=1)
    r = rng.uniform(0.2, 0.6, size=(n, 1)) * scale
    return centers + np.stack([r * np.cos(ang), r * np.sin(ang)], axis=-1)


@pytest.mark.parametrize("c,n_obs", [
    (64, 4),
    # the large tiling case duplicates kernel coverage at ~28 s — CI only
    pytest.param(700, 11, marks=pytest.mark.slow),
])
def test_matches_xla_reference(c, n_obs):
    rng = np.random.default_rng(c + n_obs)
    man = jnp.asarray(rand_polys(rng, c, 16), dtype=jnp.float32)
    obs = jnp.asarray(rand_polys(rng, n_obs, 16, 1.5), dtype=jnp.float32)
    mask = jnp.asarray(rng.random(n_obs) < 0.7)
    ref = np.asarray(candidate_collisions(man, obs, mask))
    got = np.asarray(
        candidate_collisions_pallas(man, obs, mask, interpret=True)
    )
    assert (ref == got).all()


def test_all_masked_no_hits():
    rng = np.random.default_rng(0)
    man = jnp.asarray(rand_polys(rng, 64, 16), dtype=jnp.float32)
    obs = jnp.asarray(rand_polys(rng, 4, 16, 5.0), dtype=jnp.float32)
    mask = jnp.zeros((4,), dtype=bool)
    got = np.asarray(
        candidate_collisions_pallas(man, obs, mask, interpret=True)
    )
    assert not got.any()


@pytest.mark.slow
def test_padded_degenerate_vertices():
    # framework convention: polygons padded by repeating the last vertex
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float32)
    man = np.concatenate([sq, np.tile(sq[-1:], (12, 1))])[None]
    far = sq + 10.0
    obs = np.stack(
        [np.concatenate([sq, np.tile(sq[-1:], (12, 1))]),
         np.concatenate([far, np.tile(far[-1:], (12, 1))])]
    )
    mask = jnp.ones((2,), dtype=bool)
    got = np.asarray(
        candidate_collisions_pallas(
            jnp.asarray(man), jnp.asarray(obs), mask, interpret=True
        )
    )
    assert got[0]  # overlaps itself
