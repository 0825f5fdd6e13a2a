"""
EXPERIMENTAL: fixed-iteration Newton-Raphson pH solver as a Pallas kernel.

Status (benchmarked v5e, 65k plants, f32): the plain XLA masked-Newton
(``core.chemistry.solve_pH``) runs ~7x faster than this kernel — XLA's
automatic fusion is already optimal for a pure elementwise fixed-point
loop, and a hand-written kernel only adds launch/packing overhead. The
production entry point is therefore ``solve_pH_auto``, which always
dispatches to the XLA path. This kernel is kept as a correctness-tested
building block for future fused chemistry pipelines where the solve must
live *inside* a larger hand-written kernel (where it pays no launch cost),
not as a standalone fast path. Note also the f32 convergence floor
(``solve_pH_pallas`` docstring).

Design notes (for reuse in fused pipelines): thousands of plants solve the
carbonate charge balance in lockstep on the VPU; the batch is laid out as an
(8k, 128)-tiled 2D array in VMEM, every lane runs the same fixed iteration
count, and converged lanes freeze via masked updates — same semantics as
``core.chemistry.solve_pH``. Physics: charge-balance residual and analytic
derivative per reference core/chemistry.py:193-330.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ics_wt_physicsengine_tpu.core.chemistry import (
    ChemistryConstants,
    MAX_ITERATIONS,
    MAX_NEWTON_STEP,
    NEWTON_STEP_DECAY,
    PH_TOLERANCE,
    solve_pH,
)

LN10 = math.log(10.0)

_LANES = 128
_SUBLANES = 8
_TILE = _LANES * _SUBLANES

# Match the reference's iteration budget (chemistry.py:100). Converged lanes
# freeze via the done-mask, so typical cases stop moving after < 20
# iterations; extreme buffer compositions (cold high-alkalinity water from a
# pH-7 guess) genuinely need ~60.
DEFAULT_ITERS = MAX_ITERATIONS


def _ph_newton_kernel(kw_ref, ka1_ref, ka2_ref, ct_ref, alk_ref, ph0_ref,
                      out_ref, *, iters: int, tolerance: float):
    kw = kw_ref[:]
    ka1 = ka1_ref[:]
    ka2 = ka2_ref[:]
    ct = ct_ref[:]
    alk = alk_ref[:]

    # The done-mask is carried as 0.0/1.0 floats: Mosaic cannot legalize a
    # fori_loop whose carry contains a boolean vector ("failed to legalize
    # scf.for"), and the arithmetic masking is equivalent.
    def body(i, carry):
        ph, done = carry
        h = jnp.exp(-LN10 * ph)
        oh = kw / h
        d = h * h + ka1 * h + ka1 * ka2
        a1 = ka1 * h / d
        a2 = ka1 * ka2 / d
        f = h - oh + a1 * ct + 2.0 * a2 * ct - alk

        dh_dph = -LN10 * h
        doh_dph = -(kw / (h * h)) * dh_dph
        dd_dh = 2.0 * h + ka1
        da1_dh = ka1 * (d - h * dd_dh) / (d * d)
        da2_dh = -ka1 * ka2 * dd_dh / (d * d)
        df = dh_dph - doh_dph + ct * da1_dh * dh_dph + 2.0 * ct * da2_dh * dh_dph

        # decay**i as exp(i * log(decay)): Mosaic has no powf lowering
        cap = MAX_NEWTON_STEP * jnp.exp(
            i.astype(ph.dtype) * math.log(NEWTON_STEP_DECAY))
        delta = jnp.clip(-f / df, -cap, cap)
        ph_new = jnp.clip(ph + delta, 0.0, 14.0)
        newly_done = (jnp.abs(delta) < tolerance).astype(ph.dtype)
        ph = ph + (1.0 - done) * (ph_new - ph)
        return ph, jnp.maximum(done, newly_done)

    ph0 = ph0_ref[:]
    ph, _ = jax.lax.fori_loop(
        0, iters, body, (ph0, jnp.zeros_like(ph0)))
    out_ref[:] = ph


def _pad_to_tiles(x, total):
    flat = jnp.ravel(x)
    pad = total - flat.shape[0]
    if pad:
        flat = jnp.concatenate([flat, jnp.full((pad,), 7.0, flat.dtype)])
    return flat.reshape(-1, _LANES)


@functools.partial(jax.jit, static_argnames=("iters", "tolerance", "interpret"))
def solve_pH_pallas(constants: ChemistryConstants, initial_guess,
                    iters: int = DEFAULT_ITERS,
                    tolerance: float = PH_TOLERANCE,
                    interpret: bool = False):
    """Solve the charge balance for a batch of plants on the TPU VPU.

    EXPERIMENTAL — slower than ``core.chemistry.solve_pH`` as a standalone
    op (see module docstring); use ``solve_pH_auto`` unless embedding the
    solve in a larger kernel.

    ``constants`` leaves and ``initial_guess`` must share one shape (any
    rank); the result has that shape. Lanes are padded to (8k, 128) tiles.

    float32 convergence floor: the default 1e-6 tolerance sits below f32
    resolution near the root, so non-converged lanes oscillate within the
    decayed step cap (~1e-2 pH by iteration 100) instead of meeting the
    tolerance. A sub-f32-resolution tolerance with an f32 guess logs a
    warning; pass float64 inputs when solver-grade accuracy matters.
    """
    ph0 = jnp.asarray(initial_guess)
    if ph0.dtype == jnp.float32 and tolerance < 1e-5:
        import logging
        logging.getLogger(__name__).warning(
            "solve_pH_pallas: tolerance %g is below float32 resolution "
            "near the root; convergence stalls at ~1e-2 worst-case. "
            "Use float64 inputs or tolerance >= 1e-5.", tolerance)
    shape = ph0.shape
    n = max(1, math.prod(shape))
    total = -(-n // _TILE) * _TILE

    dtype = ph0.dtype
    args = [
        _pad_to_tiles(jnp.broadcast_to(jnp.asarray(a, dtype), shape), total)
        for a in (constants.Kw, constants.Ka1, constants.Ka2,
                  constants.C_T_mol, constants.alk_eq, ph0)
    ]

    out = pl.pallas_call(
        functools.partial(_ph_newton_kernel, iters=iters, tolerance=tolerance),
        out_shape=jax.ShapeDtypeStruct(args[0].shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)

    return out.reshape(-1)[:n].reshape(shape)


def solve_pH_auto(constants: ChemistryConstants, initial_guess,
                  iters: int = DEFAULT_ITERS,
                  tolerance: float = PH_TOLERANCE):
    """Dispatch to the fastest correct implementation.

    Measured on v5e (65k plants, f32): the XLA masked-Newton runs at ~1.2M
    solves/s while this Pallas kernel reaches ~174k — XLA's automatic fusion
    is already optimal for a pure elementwise fixed-point loop, so the jnp
    path is the default everywhere. The kernel remains available (and
    correctness-tested, tests/test_ph_solver.py) as the building block for
    future fused chemistry pipelines where the solve must live inside a
    larger hand-written kernel.

    Note on f32: the 1e-6 tolerance sits below f32 resolution near the root;
    lanes that cannot converge oscillate within the decayed step cap
    (~1e-2 by iteration 100). Use float64 when solver-grade pH accuracy
    matters; in-reactor dynamics never call this solver (the buffering
    chain rule uses beta directly, reference reactor.py:339-376).
    """
    del iters  # same budget either way
    return solve_pH(constants, initial_guess, tolerance=tolerance,
                    max_iter=MAX_ITERATIONS)
