"""
Fused whole-rollout Pallas TPU kernel — single plants and packed batches.

Why: the XLA `lax.scan` rollout executes one tiny fused program per RK4
substep; at 20 zones that costs ~200 us/step in loop/dispatch overhead on a
v5e through the remote runtime — the arithmetic itself is sub-microsecond.
This kernel moves the *entire* simulation loop (n_steps x substeps x 4 RK4
stages) inside one `pallas_call`: state lives in VMEM for the whole run and
every derivative term is inline VPU arithmetic. One kernel launch per
rollout. Measured: 5.4k -> 407k steps/s for a single 20-zone plant.

Lane packing: zones sit on the 128-lane axis, and `128 // n_zones` plants
share each row (lane l holds plant ``l // Z``, zone ``l % Z``). The zone
stencil's boundary masks are periodic in the packed layout, so inter-zone
rolls never leak across plant boundaries. Per-plant scalars are expanded to
per-lane planes. An 8-sublane block therefore carries ``8 * (128 // Z)``
plants — 48 at 20 zones — and the grid tiles the batch.

Physics is the same term-for-term ODE system as ``core.reactor.derivatives``
(reference core/reactor.py:272-448); equivalence against the XLA path is
regression-tested in tests/test_fused_rollout.py. Supports n_zones <= 128
(the reference caps at 20, README.md:542).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ics_wt_physicsengine_tpu.core import constants as c
from ics_wt_physicsengine_tpu.core import reactor as R

LN10 = math.log(10.0)

_LANES = 128
# Rows per kernel block: small batches use one 8-row tile; large batches use
# tall blocks so each fori-loop iteration advances ~3k plants worth of lanes
# in wide VPU ops (the sequential grid is the throughput killer otherwise).
_MAX_BLOCK_ROWS = 64

# Column layout of the packed per-plant scalar planes [rows, NCOLS, 128]
# (params first, boundary second).
_COLS = [
    "volume_L", "zone_volume_L", "zone_height", "heat_area_m2",
    "k_exchange", "velocity_scale", "cl_k_ref", "cl_ea",
    "Kw", "Ka1", "Ka2", "Ka_HOCl", "C_T_mol",
    "strat_enabled", "ri_crit", "supp_factor",
    "inlet_flow_rate", "inlet_pH", "inlet_chlorine", "inlet_temperature",
    "acid_flow_rate", "acid_concentration",
    "chlorine_flow_rate", "chlorine_concentration",
    "ambient_temperature", "heat_loss_coefficient",
]
_COL = {name: i for i, name in enumerate(_COLS)}
_NCOLS = len(_COLS)

# Boundary fields in schedule order (per-step scalars for the scheduled
# kernel; the same 10 trailing names as _COLS[16:]).
_BFIELDS = _COLS[16:]
_NBF = len(_BFIELDS)

# Per-step schedule rows streamed through SMEM per grid iteration
# (512 steps x 10 fields x 4 B = 20 kB).
_SCHED_CHUNK = 512


def _masks(block_rows: int, n_zones: int):
    """Lane-geometry masks for the packed layout (zones on the 128-lane
    axis, 128 // n_zones plants per row; tail lanes dead), plus the
    zone-axis shift functions the stencil uses (lane rolls here)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_rows, _LANES), 1)
    zone = lane % n_zones
    plants_per_row = _LANES // n_zones
    in_plant = lane < plants_per_row * n_zones
    return {
        "zone_mask": in_plant,
        "iface_mask": in_plant & (zone < (n_zones - 1)),
        "not_first": in_plant & (zone >= 1),
        "first": in_plant & (zone == 0),
        "last": in_plant & (zone == (n_zones - 1)),
        "zone_height_iota": zone,
        "roll_next": lambda x: pltpu.roll(x, _LANES - 1, 1),
        "roll_prev": lambda x: pltpu.roll(x, 1, 1),
    }


def _masks_zone_major(n_zones: int):
    """Masks/shifts for the plants-on-lanes layout: state is
    ``[n_zones, rows, 128]`` with one plant per lane, zones on the leading
    (major) axis. Zone shifts are static-slice concatenations; masks are
    ``[n_zones, 1, 1]`` planes that broadcast over the plant axes."""
    zone = jax.lax.broadcasted_iota(jnp.int32, (n_zones, 1, 1), 0)
    true_ = zone >= 0
    return {
        "zone_mask": true_,
        "iface_mask": zone < (n_zones - 1),
        "not_first": zone >= 1,
        "first": zone == 0,
        "last": zone == (n_zones - 1),
        "zone_height_iota": zone,
        # wrap-around rows land on masked terms, matching the lane layout's
        # periodic rolls
        "roll_next": lambda x: jnp.concatenate([x[1:], x[:1]], axis=0),
        "roll_prev": lambda x: jnp.concatenate([x[-1:], x[:-1]], axis=0),
    }


def _make_deriv(p, b, m):
    """The ODE right-hand side as a lane-stencil closure.

    ``p``: parameter planes (dict of [rows, 128] arrays), ``b``: boundary
    terms (planes for the constant-BC kernel; scalar-broadcast values for the
    scheduled kernel — identical arithmetic either way), ``m``: lane masks.
    Physics is the same term-for-term system as ``core.reactor.derivatives``
    (reference core/reactor.py:272-448)."""
    safe_u2 = jnp.maximum(p["velocity_scale"], 1e-6) ** 2
    has_flow = p["velocity_scale"] > 1e-6
    iface_mask, not_first = m["iface_mask"], m["not_first"]
    first, last, zone_mask = m["first"], m["last"], m["zone_mask"]

    roll_next, roll_prev = m["roll_next"], m["roll_prev"]

    def exchange(x, k_iface):
        # (L x)[i] = k_iface[i] (x[i+1]-x[i]) + k_iface[i-1] (x[i-1]-x[i]),
        # reference reactor.py:318-337 as a zone stencil (lane rolls in the
        # packed layout, major-axis shifts in the plants-on-lanes layout).
        # The masks are periodic per plant, so shifts never couple plants.
        x_next = roll_next(x)
        x_prev = roll_prev(x)
        up = jnp.where(iface_mask, k_iface * (x_next - x), 0.0)
        k_prev = roll_prev(k_iface)
        dn = jnp.where(not_first, k_prev * (x_prev - x), 0.0)
        return up + dn - jnp.where(last, b["q_per_v"] * x, 0.0)

    def deriv(ph, cl, t):
        # In-domain clamp (see core/reactor.py derivatives docstring).
        ph = jnp.clip(ph, 0.0, 14.0)
        cl = jnp.maximum(cl, 0.0)
        t = jnp.clip(t, 0.0, 100.0)

        # density + Richardson suppression (reference spatial.py:142-320)
        rho = jnp.where(
            t <= 8.0,
            c.RHO_MAX_4C - c.DENSITY_ANOMALY_COEFF * (t - 4.0) ** 2,
            c.WATER_DENSITY_20C * (1.0 - c.THERMAL_EXPANSION_COEFF * (t - 20.0)))
        rho_next = roll_next(rho)
        drho = rho_next - rho
        rho_avg = 0.5 * (rho_next + rho)
        ri = c.G_GRAVITY * drho * p["zone_height"] / (rho_avg * safe_u2)
        # no-flow -> Ri = inf -> always stratified (spatial.py:275)
        stratified = (ri > p["ri_crit"]) | jnp.logical_not(has_flow)
        supp = jnp.where(stratified & (p["strat_enabled"] > 0.5),
                         p["supp_factor"], 1.0)
        k_iface = p["k_exchange"] * supp

        # pH dynamics via buffering chain rule (reference reactor.py:339-376)
        h = jnp.exp(-LN10 * ph)
        d = h * h + p["Ka1"] * h + p["Ka1"] * p["Ka2"]
        a0 = h * h / d
        a1 = p["Ka1"] * h / d
        a2 = p["Ka1"] * p["Ka2"] / d
        beta = 2.303 * (h + p["Kw"] / h) \
            + 2.303 * p["C_T_mol"] * (a0 * a1 + 4.0 * a1 * a2 + a0 * a2)
        inv_beta_ln10 = 1.0 / (beta * LN10)

        dph = -exchange(h, k_iface) * inv_beta_ln10
        dh_in = b["q_per_v"] * (b["h_inlet"] - h)
        dph = dph - jnp.where(first, (b["dh_dosing"] + dh_in) * inv_beta_ln10,
                              0.0)

        # chlorine (reference reactor.py:378-411)
        dcl = exchange(cl, k_iface)
        dcl = dcl + jnp.where(
            first, b["dcl_dosing"] + b["q_per_v"] * (b["cl_inlet"] - cl), 0.0)
        t_k = t + 273.15
        k_base = p["cl_k_ref"] * jnp.exp(
            -(p["cl_ea"] / c.R_GAS) * (1.0 / t_k - 1.0 / c.T_REFERENCE_K))
        a_hocl = h / (h + p["Ka_HOCl"])
        ph_factor = a_hocl + (1.0 - a_hocl) * c.K_OCL_RELATIVE
        dcl = dcl - k_base * ph_factor * cl

        # temperature (reference reactor.py:413-443)
        dtemp = exchange(t, k_iface)
        dtemp = dtemp + jnp.where(first, b["q_per_v"] * (b["t_inlet"] - t),
                                  0.0)
        dtemp = dtemp - b["heat_rate"] * (t - b["t_amb"])

        z = jnp.zeros_like(ph)
        return (jnp.where(zone_mask, dph, z), jnp.where(zone_mask, dcl, z),
                jnp.where(zone_mask, dtemp, z))

    return deriv


def _param_planes(scal_ref):
    def col(name):
        return scal_ref[:, _COL[name], :]          # (B, 128) per-lane plane

    return {name: col(name) for name in _COLS[:16]}


def _boundary_terms(p, get):
    """Boundary-derived source terms from a field accessor ``get(name)``
    (per-lane planes in the constant-BC kernel; per-step scalars in the
    scheduled kernel — broadcasting makes the arithmetic identical)."""
    return {
        "q_per_v": (get("inlet_flow_rate") / 60.0) / p["volume_L"],
        "h_inlet": jnp.exp(-LN10 * get("inlet_pH")),
        "cl_inlet": get("inlet_chlorine"),
        "t_inlet": get("inlet_temperature"),
        "dh_dosing": (get("acid_flow_rate") / 60.0)
        * get("acid_concentration") / p["zone_volume_L"],
        "dcl_dosing": (get("chlorine_flow_rate") / 60.0)
        / p["zone_volume_L"] * get("chlorine_concentration"),
        "t_amb": get("ambient_temperature"),
        "heat_rate": get("heat_loss_coefficient") * p["heat_area_m2"]
        / (c.WATER_DENSITY_20C * c.WATER_CP * (p["volume_L"] / 1000.0)),
    }


def _make_stepper(deriv, h_step: float, stages: int | None):
    """One integrator substep: classic RK4 or s-stage RKC2
    (ops/integrators.py::rkc2_step) with trace-time-unrolled stage
    recurrence — coefficients are Python floats so Mosaic folds them."""

    def rk4(carry):
        ph, cl, t = carry
        k1 = deriv(ph, cl, t)
        k2 = deriv(ph + 0.5 * h_step * k1[0], cl + 0.5 * h_step * k1[1],
                   t + 0.5 * h_step * k1[2])
        k3 = deriv(ph + 0.5 * h_step * k2[0], cl + 0.5 * h_step * k2[1],
                   t + 0.5 * h_step * k2[2])
        k4 = deriv(ph + h_step * k3[0], cl + h_step * k3[1],
                   t + h_step * k3[2])
        ph = ph + (h_step / 6.0) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        cl = cl + (h_step / 6.0) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        t = t + (h_step / 6.0) * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
        return ph, cl, t

    def rkc(carry):
        from ics_wt_physicsengine_tpu.ops.integrators import (
            _rkc2_coefficients)

        mu1t, mu, nu, mut, gmt = _rkc2_coefficients(stages)
        y0 = carry
        f0 = deriv(*y0)
        yjm2 = y0
        yjm1 = tuple(a + float(mu1t) * h_step * b for a, b in zip(y0, f0))
        for j in range(2, stages + 1):
            fj = deriv(*yjm1)
            c0 = 1.0 - float(mu[j]) - float(nu[j])
            yj = tuple(
                c0 * a0 + float(mu[j]) * a1 + float(nu[j]) * a2
                + float(mut[j]) * h_step * fj_ + float(gmt[j]) * h_step * f0_
                for a0, a1, a2, fj_, f0_ in zip(y0, yjm1, yjm2, fj, f0))
            yjm2, yjm1 = yjm1, yj
        return yjm1

    return rk4 if stages is None else rkc


def _bound(ph, cl, t):
    """End-of-step physical bounds (reference reactor.py:526-541)."""
    return (jnp.clip(ph, 0.0, 14.0), jnp.maximum(cl, 0.0),
            jnp.clip(t, 0.0, 100.0))


def _rollout_kernel(scal_ref, ph_ref, cl_ref, t_ref,
                    ph_out, cl_out, t_out,
                    ph_traj=None, cl_traj=None, t_traj=None,
                    *, n_zones: int, dt: float, substeps: int, n_steps: int,
                    block_rows: int, stages: int | None,
                    record_every: int | None = None):
    m = _masks(block_rows, n_zones)

    def col(name):
        return scal_ref[:, _COL[name], :]          # (B, 128) per-lane plane

    p = _param_planes(scal_ref)
    b = _boundary_terms(p, col)
    deriv = _make_deriv(p, b, m)
    stepper = _make_stepper(deriv, dt / substeps, stages)

    def step_body(i, carry):
        ph, cl, t = jax.lax.fori_loop(
            0, substeps, lambda __, cy: stepper(cy), carry)
        ph, cl, t = _bound(ph, cl, t)
        if record_every is not None:
            # Predicated VMEM store: one [rows, 128] tile per recorded
            # variable every record_every-th step (trajectory time series
            # without leaving the kernel).
            @pl.when((i + 1) % record_every == 0)
            def _store():
                slot = (i + 1) // record_every - 1
                ph_traj[slot] = ph
                cl_traj[slot] = cl
                t_traj[slot] = t
        return ph, cl, t

    ph, cl, t = jax.lax.fori_loop(
        0, n_steps, step_body, (ph_ref[:], cl_ref[:], t_ref[:]))

    ph_out[:] = ph
    cl_out[:] = cl
    t_out[:] = t


def _scheduled_kernel(sched_ref, scal_ref, ph_ref, cl_ref, t_ref,
                      ph_out, cl_out, t_out,
                      ph_traj=None, cl_traj=None, t_traj=None,
                      *, n_zones: int, dt: float, substeps: int,
                      n_steps: int, block_rows: int, stages: int | None,
                      record_every: int | None = None):
    """Time-varying-forcing rollout: grid = (row_tiles, time_chunks).

    The state carry lives in the *output* VMEM blocks — their block index is
    constant along the time axis, so Pallas keeps them resident across the
    sequential time iterations and writes HBM once per row tile (the
    standard revisiting pattern). Each time iteration streams one
    [_SCHED_CHUNK, 10] slab of per-step boundary scalars through SMEM;
    per-step source terms are rebuilt from those scalars against the
    resident parameter planes — same arithmetic as the constant-BC kernel,
    so a constant schedule reproduces it bit-for-bit.
    """
    t_idx = pl.program_id(1)
    m = _masks(block_rows, n_zones)
    p = _param_planes(scal_ref)

    @pl.when(t_idx == 0)
    def _init():
        ph_out[:] = ph_ref[:]
        cl_out[:] = cl_ref[:]
        t_out[:] = t_ref[:]

    def step_body(j, carry):
        ph, cl, t = carry
        g = t_idx * _SCHED_CHUNK + j               # global step index

        def get(name):
            return sched_ref[j, _BFIELDS.index(name)]

        b = _boundary_terms(p, get)
        deriv = _make_deriv(p, b, m)
        stepper = _make_stepper(deriv, dt / substeps, stages)
        nph, ncl, nt = jax.lax.fori_loop(
            0, substeps, lambda __, cy: stepper(cy), (ph, cl, t))
        nph, ncl, nt = _bound(nph, ncl, nt)
        # Padded tail steps (g >= n_steps) must not advance the state.
        valid = g < n_steps
        nph = jnp.where(valid, nph, ph)
        ncl = jnp.where(valid, ncl, cl)
        nt = jnp.where(valid, nt, t)
        if record_every is not None:
            @pl.when(valid & ((g + 1) % record_every == 0))
            def _store():
                slot = (g + 1) // record_every - 1
                ph_traj[slot] = nph
                cl_traj[slot] = ncl
                t_traj[slot] = nt
        return nph, ncl, nt

    ph, cl, t = jax.lax.fori_loop(
        0, _SCHED_CHUNK, step_body, (ph_out[:], cl_out[:], t_out[:]))
    ph_out[:] = ph
    cl_out[:] = cl
    t_out[:] = t


def _pack_state(x, batch, n_zones, plants_per_row, rows_padded, dtype):
    """[B, Z] -> [rows_padded, 128] with plants_per_row plants per row."""
    rows = -(-batch // plants_per_row)
    pad_b = rows * plants_per_row - batch
    x = jnp.asarray(x, dtype)
    x = jnp.pad(x, ((0, pad_b), (0, 0)))
    x = x.reshape(rows, plants_per_row * n_zones)
    x = jnp.pad(x, ((0, rows_padded - rows),
                    (0, _LANES - plants_per_row * n_zones)))
    return x


def _unpack_state(x, batch, n_zones, plants_per_row):
    rows = -(-batch // plants_per_row)
    x = x[:rows, :plants_per_row * n_zones]
    x = x.reshape(rows * plants_per_row, n_zones)
    return x[:batch]


def _param_values(params: R.ReactorParams):
    return {
        "volume_L": params.volume_L,
        "zone_volume_L": params.zone_volume_L,
        "zone_height": params.zone_height,
        "heat_area_m2": params.heat_area_m2,
        "k_exchange": params.k_exchange,
        "velocity_scale": params.velocity_scale,
        "cl_k_ref": params.cl_k_ref,
        "cl_ea": params.cl_ea,
        "Kw": params.chem.Kw,
        "Ka1": params.chem.Ka1,
        "Ka2": params.chem.Ka2,
        "Ka_HOCl": params.chem.Ka_HOCl,
        "C_T_mol": params.chem.C_T_mol,
        "strat_enabled": params.strat_enabled,
        "ri_crit": params.ri_crit,
        "supp_factor": params.supp_factor,
    }


def _pack_planes(values, names, batch, n_zones, plants_per_row, rows_padded,
                 dtype):
    planes = []
    for name in names:
        v = jnp.broadcast_to(jnp.asarray(values[name], dtype), (batch,))
        v = jnp.repeat(v, n_zones)                # per-lane within each plant
        plane = _pack_state(v.reshape(batch, n_zones), batch, n_zones,
                            plants_per_row, rows_padded, dtype)
        planes.append(plane)
    return jnp.stack(planes, axis=1)              # [rows_padded, N, 128]


def _pack_scalars(params: R.ReactorParams, boundary: R.BoundaryConditions,
                  batch, n_zones, plants_per_row, rows_padded, dtype):
    """Per-plant scalars -> per-lane planes [rows_padded, NCOLS, 128]."""
    values = _param_values(params)
    values.update({
        "inlet_flow_rate": boundary.inlet_flow_rate,
        "inlet_pH": boundary.inlet_pH,
        "inlet_chlorine": boundary.inlet_chlorine,
        "inlet_temperature": boundary.inlet_temperature,
        "acid_flow_rate": boundary.acid_flow_rate,
        "acid_concentration": boundary.acid_concentration,
        "chlorine_flow_rate": boundary.chlorine_flow_rate,
        "chlorine_concentration": boundary.chlorine_concentration,
        "ambient_temperature": boundary.ambient_temperature,
        "heat_loss_coefficient": boundary.heat_loss_coefficient,
    })
    return _pack_planes(values, _COLS, batch, n_zones, plants_per_row,
                        rows_padded, dtype)


def rollout_fused(params: R.ReactorParams, state: R.ReactorState,
                  boundary: R.BoundaryConditions, *, dt: float,
                  substeps: int, n_steps: int,
                  stages: int | None = None,
                  record_every: int | None = None,
                  interpret: bool | None = None):
    """Advance ``n_steps`` of ``dt`` seconds in one Pallas kernel launch.

    Accepts a single plant (``[Z]`` state) or a batch (``[B, Z]`` state with
    ``[B]`` params); returns the final state with derived quantities updated,
    matching ``core.reactor.rollout(..., record=False)[0]``.

    ``stages`` switches the in-kernel integrator from RK4 to s-stage RKC2
    (same semantics as ``core.reactor.rollout(..., stages=...)``).
    ``record_every=k`` additionally returns ``(final_state, traj)`` where
    traj stacks pH/chlorine/temperature every k-th step ([n_steps // k,
    ..., Z] arrays) — the whole time series is produced inside the one
    kernel launch, so trajectory extraction runs at kernel speed instead of
    the XLA scan path's per-step dispatch rate. The record buffer lives in
    VMEM: keep (n_steps // k) * block_rows * 1.5 kB within ~100 MB (single
    plants / small batches; large-batch trajectory UQ belongs on the XLA
    ``core.reactor.rollout(record=True)`` path).
    ``interpret=None`` auto-selects: compiled Mosaic on TPU backends,
    interpreter elsewhere (Pallas has no compiled CPU lowering).
    """
    if params.nitrogen is not None or params.gas is not None \
            or params.particles is not None \
            or params.disinfection is not None \
            or params.biofilm is not None or params.phase is not None:
        raise ValueError(
            "the fused physics kernels do not support the nitrogen/gas/"
            "particle/disinfection/biofilm/phase extensions; use "
            "core.reactor.rollout / rollout_scheduled (XLA)")

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if record_every is not None and n_steps % record_every:
        raise ValueError(f"n_steps={n_steps} must be a multiple of "
                         f"record_every={record_every}")
    return _rollout_fused_jit(params, state, boundary, dt=dt,
                              substeps=substeps, n_steps=n_steps,
                              stages=stages, record_every=record_every,
                              interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("dt", "substeps", "n_steps", "stages", "record_every",
                     "interpret"))
def _rollout_fused_jit(params: R.ReactorParams, state: R.ReactorState,
                       boundary: R.BoundaryConditions, *, dt: float,
                       substeps: int, n_steps: int, stages: int | None,
                       record_every: int | None, interpret: bool):
    z = params.n_zones
    if z > _LANES:
        raise ValueError(f"fused rollout supports n_zones <= {_LANES}, "
                         f"got {z}")

    ph = jnp.asarray(state.pH)
    single = ph.ndim == 1
    batch = 1 if single else ph.shape[0]
    dtype = ph.dtype

    plants_per_row = _LANES // z
    rows = -(-batch // plants_per_row)
    block_rows = 8 if rows <= 8 else min(
        -(-rows // 8) * 8, _MAX_BLOCK_ROWS)
    rows_padded = -(-rows // block_rows) * block_rows

    def prep(x):
        x = jnp.asarray(x, dtype)
        if single:
            x = x[None, :]
        return _pack_state(x, batch, z, plants_per_row, rows_padded, dtype)

    ph_in = prep(state.pH)
    cl_in = prep(state.chlorine)
    t_in = prep(state.temperature)
    scal = _pack_scalars(params, boundary, batch, z, plants_per_row,
                         rows_padded, dtype)

    grid = (rows_padded // block_rows,)
    block = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    scal_block = pl.BlockSpec((block_rows, _NCOLS, _LANES),
                              lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_rollout_kernel, n_zones=z, dt=dt,
                               substeps=substeps, n_steps=n_steps,
                               block_rows=block_rows, stages=stages,
                               record_every=record_every)
    out_specs = [block, block, block]
    out_shape = [jax.ShapeDtypeStruct((rows_padded, _LANES), dtype)
                 for _ in range(3)]
    if record_every is not None:
        n_rec = n_steps // record_every
        traj_block = pl.BlockSpec((n_rec, block_rows, _LANES),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)
        out_specs += [traj_block] * 3
        out_shape += [jax.ShapeDtypeStruct((n_rec, rows_padded, _LANES),
                                           dtype) for _ in range(3)]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[scal_block, block, block, block],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(scal, ph_in, cl_in, t_in)
    ph_f, cl_f, t_f = outs[:3]

    def unprep(x):
        x = _unpack_state(x, batch, z, plants_per_row)
        return x[0] if single else x

    ph_f, cl_f, t_f = unprep(ph_f), unprep(cl_f), unprep(t_f)

    total_flow = (boundary.inlet_flow_rate + boundary.acid_flow_rate
                  + boundary.chlorine_flow_rate)
    new_state = R.ReactorState(
        time=state.time + dt * n_steps,
        pH=ph_f, chlorine=cl_f, temperature=t_f,
        flow_rate=jnp.asarray(total_flow, dtype)
        + jnp.zeros_like(jnp.asarray(state.flow_rate)),
    )
    new_state = R._update_derived(new_state)
    if record_every is None:
        return new_state

    def unprep_traj(x):
        x = jax.vmap(
            lambda r: _unpack_state(r, batch, z, plants_per_row))(x)
        return x[:, 0] if single else x

    traj = {"pH": unprep_traj(outs[3]), "chlorine": unprep_traj(outs[4]),
            "temperature": unprep_traj(outs[5])}
    return new_state, traj


def rollout_scheduled_fused(params: R.ReactorParams, state: R.ReactorState,
                            schedule: R.BoundaryConditions, *, dt: float,
                            substeps: int, stages: int | None = None,
                            record_every: int | None = None,
                            interpret: bool | None = None):
    """``core.reactor.rollout_scheduled`` semantics at kernel speed: advance
    one step per schedule row, all inside Pallas.

    ``schedule`` is a BoundaryConditions pytree whose leaves carry a leading
    ``[n_steps]`` time axis (scalars broadcast) — the per-step forcing the
    reference applies by mutating BCs in its HIL loop
    (reference __main__.py:398-457). The schedule streams through SMEM in
    512-step chunks while the state stays resident in VMEM, so scripted
    forcing runs at fused-kernel speed instead of the XLA scan's per-step
    dispatch rate. Bit-matches ``rollout_scheduled`` (tests/
    test_fused_rollout.py); a constant schedule bit-matches
    ``rollout_fused``.

    ``record_every=k`` returns ``(final_state, traj)`` with every k-th step
    recorded (same VMEM bound as ``rollout_fused``: the whole trajectory
    buffer lives on-chip per row tile).
    """
    if params.nitrogen is not None or params.gas is not None \
            or params.particles is not None \
            or params.disinfection is not None \
            or params.biofilm is not None or params.phase is not None:
        raise ValueError(
            "the fused physics kernels do not support the nitrogen/gas/"
            "particle/disinfection/biofilm/phase extensions; use "
            "core.reactor.rollout / rollout_scheduled (XLA)")

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lengths = {int(jnp.shape(x)[0])
               for x in jax.tree_util.tree_leaves(schedule)
               if jnp.ndim(x) >= 1}
    if not lengths:
        raise ValueError("schedule has no [n_steps] leaves; use "
                         "rollout_fused() for constant boundary conditions")
    if len(lengths) > 1:
        raise ValueError(f"schedule leaves disagree on n_steps: {lengths}")
    n_steps = lengths.pop()
    if record_every is not None and n_steps % record_every:
        raise ValueError(f"n_steps={n_steps} must be a multiple of "
                         f"record_every={record_every}")
    return _rollout_scheduled_fused_jit(
        params, state, schedule, dt=dt, substeps=substeps, n_steps=n_steps,
        stages=stages, record_every=record_every, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("dt", "substeps", "n_steps", "stages", "record_every",
                     "interpret"))
def _rollout_scheduled_fused_jit(params: R.ReactorParams,
                                 state: R.ReactorState,
                                 schedule: R.BoundaryConditions, *,
                                 dt: float, substeps: int, n_steps: int,
                                 stages: int | None,
                                 record_every: int | None, interpret: bool):
    z = params.n_zones
    if z > _LANES:
        raise ValueError(f"fused rollout supports n_zones <= {_LANES}, "
                         f"got {z}")

    ph = jnp.asarray(state.pH)
    single = ph.ndim == 1
    batch = 1 if single else ph.shape[0]
    dtype = ph.dtype

    plants_per_row = _LANES // z
    rows = -(-batch // plants_per_row)
    block_rows = 8 if rows <= 8 else min(
        -(-rows // 8) * 8, _MAX_BLOCK_ROWS)
    rows_padded = -(-rows // block_rows) * block_rows

    def prep(x):
        x = jnp.asarray(x, dtype)
        if single:
            x = x[None, :]
        return _pack_state(x, batch, z, plants_per_row, rows_padded, dtype)

    ph_in = prep(state.pH)
    cl_in = prep(state.chlorine)
    t_in = prep(state.temperature)
    scal = _pack_planes(_param_values(params), _COLS[:16], batch, z,
                        plants_per_row, rows_padded, dtype)

    # [n_steps, 10] per-step boundary scalars, padded to whole SMEM chunks
    # (padded rows are never applied: the kernel masks steps >= n_steps).
    fields = [jnp.broadcast_to(jnp.asarray(getattr(schedule, name), dtype),
                               (n_steps,)) for name in _BFIELDS]
    sched = jnp.stack(fields, axis=1)
    n_chunks = -(-n_steps // _SCHED_CHUNK)
    sched = jnp.pad(sched, ((0, n_chunks * _SCHED_CHUNK - n_steps), (0, 0)))

    grid = (rows_padded // block_rows, n_chunks)
    block = pl.BlockSpec((block_rows, _LANES), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM)
    scal_block = pl.BlockSpec((block_rows, 16, _LANES),
                              lambda i, t: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    sched_block = pl.BlockSpec((_SCHED_CHUNK, _NBF), lambda i, t: (t, 0),
                               memory_space=pltpu.SMEM)

    kernel = functools.partial(_scheduled_kernel, n_zones=z, dt=dt,
                               substeps=substeps, n_steps=n_steps,
                               block_rows=block_rows, stages=stages,
                               record_every=record_every)
    out_specs = [block, block, block]
    out_shape = [jax.ShapeDtypeStruct((rows_padded, _LANES), dtype)
                 for _ in range(3)]
    if record_every is not None:
        n_rec = n_steps // record_every
        traj_block = pl.BlockSpec((n_rec, block_rows, _LANES),
                                  lambda i, t: (0, i, 0),
                                  memory_space=pltpu.VMEM)
        out_specs += [traj_block] * 3
        out_shape += [jax.ShapeDtypeStruct((n_rec, rows_padded, _LANES),
                                           dtype) for _ in range(3)]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sched_block, scal_block, block, block, block],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(sched, scal, ph_in, cl_in, t_in)
    ph_f, cl_f, t_f = outs[:3]

    def unprep(x):
        x = _unpack_state(x, batch, z, plants_per_row)
        return x[0] if single else x

    ph_f, cl_f, t_f = unprep(ph_f), unprep(cl_f), unprep(t_f)

    # step() updates flow_rate to the current boundary's total flow each
    # step; the final state carries the last schedule row's value.
    total_flow = (sched[n_steps - 1, _BFIELDS.index("inlet_flow_rate")]
                  + sched[n_steps - 1, _BFIELDS.index("acid_flow_rate")]
                  + sched[n_steps - 1,
                          _BFIELDS.index("chlorine_flow_rate")])
    new_state = R.ReactorState(
        time=state.time + dt * n_steps,
        pH=ph_f, chlorine=cl_f, temperature=t_f,
        flow_rate=jnp.asarray(total_flow, dtype)
        + jnp.zeros_like(jnp.asarray(state.flow_rate)),
    )
    new_state = R._update_derived(new_state)
    if record_every is None:
        return new_state

    def unprep_traj(x):
        x = jax.vmap(
            lambda r: _unpack_state(r, batch, z, plants_per_row))(x)
        return x[:, 0] if single else x

    traj = {"pH": unprep_traj(outs[3]), "chlorine": unprep_traj(outs[4]),
            "temperature": unprep_traj(outs[5])}
    return new_state, traj
