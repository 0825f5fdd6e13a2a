"""Pallas pH kernel vs jnp masked-Newton vs host loop — all three must agree.

On the CPU test backend the Pallas kernel runs in interpreter mode; on TPU it
compiles to a Mosaic kernel. Same contract either way.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import chemistry as chem
from ics_wt_physicsengine_tpu.ops import ph_solver


def _batched_constants(n=300, dtype=jnp.float64):
    rng = np.random.default_rng(42)
    ct = rng.uniform(1.0, 5.0, n)
    alk = rng.uniform(0.5, 1.3, n) * 50.0 * ct   # chemically consistent
    temp = rng.uniform(5.0, 35.0, n)
    return chem.make_chemistry_constants(
        jnp.asarray(alk, dtype), jnp.asarray(ct, dtype),
        jnp.asarray(temp, dtype)), alk, ct, temp


def test_pallas_matches_jnp_solver():
    k, _, _, _ = _batched_constants()
    ph0 = jnp.full(300, 7.0, jnp.float64)
    ph_jnp = np.asarray(chem.solve_pH(k, ph0))
    ph_pallas = np.asarray(ph_solver.solve_pH_pallas(k, ph0, interpret=True))
    # exp-based pow in the kernel vs jnp pow: final Newton iterates agree to
    # the solver tolerance (both residuals are ~1e-12)
    np.testing.assert_allclose(ph_pallas, ph_jnp, rtol=0, atol=2e-6)


def test_pallas_matches_host_loop():
    k, alk, ct, temp = _batched_constants(16)
    ph0 = jnp.full(16, 7.0, jnp.float64)
    ph_pallas = np.asarray(ph_solver.solve_pH_pallas(k, ph0, interpret=True))
    for i in range(16):
        k_host = chem.make_chemistry_constants(alk[i], ct[i], temp[i])
        assert abs(ph_pallas[i] - chem.solve_pH_host(k_host)) < 2e-6


def test_non_tile_aligned_shapes():
    """Padding must not disturb results for awkward batch sizes."""
    for n in (1, 7, 129, 1025):
        k, _, _, _ = _batched_constants(n)
        ph0 = jnp.full(n, 7.0, jnp.float64)
        ph_jnp = np.asarray(chem.solve_pH(k, ph0))
        ph_pallas = np.asarray(
            ph_solver.solve_pH_pallas(k, ph0, interpret=True))
        np.testing.assert_allclose(ph_pallas, ph_jnp, rtol=0, atol=2e-6)


def test_2d_shape():
    k, _, _, _ = _batched_constants(24)
    k2 = jax.tree_util.tree_map(lambda x: x.reshape(4, 6), k)
    ph0 = jnp.full((4, 6), 7.0, jnp.float64)
    out = ph_solver.solve_pH_pallas(k2, ph0, interpret=True)
    assert out.shape == (4, 6)
    flat = np.asarray(chem.solve_pH(k, jnp.full(24, 7.0, jnp.float64)))
    np.testing.assert_allclose(np.asarray(out).ravel(), flat, atol=2e-6)
