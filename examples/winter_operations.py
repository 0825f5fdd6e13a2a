"""
Winter operations: a diurnal arctic cold snap over an outdoor tank — the
phase-change axis (core/phase.py) end to end.

An exposed treatment tank rides a -25 C night / -5 C day sinusoid with wind.
The run shows the physics the reference's [0, 100] C clip cannot express:
the bulk cools to the freezing point and PINS there on the latent plateau,
ice forms top-down (the buoyant mixture density stratifies the icy surface),
the growing lid throttles further heat loss and evaporation, and a
warm-water recirculation purge (hot inlet flow — the standard freeze-
protection measure) melts the lid back. The report card is the operator's:
hours of ice cover, peak ice fraction, evaporative water loss, and whether
the purge kept the outlet liquid.

Usage:
  python examples/winter_operations.py [--days 3] [--dt 300] [--purge-c 35]
         [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=float, default=3.0)
    ap.add_argument("--dt", type=float, default=300.0)
    ap.add_argument("--zones", type=int, default=8)
    ap.add_argument("--t-night", type=float, default=-25.0)
    ap.add_argument("--t-day", type=float, default=-5.0)
    ap.add_argument("--wind", type=float, default=5.0)
    ap.add_argument("--heat-loss", type=float, default=30.0,
                    help="U [W/K] for the exposed tank shell (~5 W/m2K "
                         "over the 6 m2 of an uninsulated 1 m3 tank)")
    ap.add_argument("--purge-c", type=float, default=35.0,
                    help="warm-purge inlet temperature [C] (0 disables "
                         "the purge)")
    ap.add_argument("--purge-hours", type=float, default=20.0,
                    help="purge duration at the end of the run [h]")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from ics_wt_physicsengine_tpu.core import phase as PH
    from ics_wt_physicsengine_tpu.core import reactor as R

    cfg = R.ReactorConfiguration(
        volume=1000.0, height=2.0, diameter=0.798, n_zones=args.zones,
        flow_rate=1.0, temperature=4.0, enable_phase=True)
    params = R.make_params(cfg, dtype=jnp.float32)
    state = R.make_initial_state(cfg, dtype=jnp.float32)
    pp = params.phase

    n_steps = int(args.days * 86400 / args.dt)
    t = np.arange(n_steps) * args.dt
    # diurnal sinusoid, coldest at 04:00
    t_amb = (0.5 * (args.t_day + args.t_night)
             - 0.5 * (args.t_day - args.t_night)
             * np.cos(2 * np.pi * (t / 86400.0 - 4.0 / 24.0)))
    purge_on = (args.purge_c > 0) \
        & (t >= args.days * 86400.0 - args.purge_hours * 3600.0)

    base = R.BoundaryConditions(
        inlet_flow_rate=1.0, inlet_temperature=4.0,
        heat_loss_coefficient=args.heat_loss,
        ambient_humidity=0.6, wind_speed=args.wind)
    schedule = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32),
                                   (n_steps,)), base)
    import dataclasses
    schedule = dataclasses.replace(
        schedule,
        ambient_temperature=jnp.asarray(t_amb, jnp.float32),
        inlet_temperature=jnp.where(jnp.asarray(purge_on), args.purge_c,
                                    4.0).astype(jnp.float32),
        inlet_flow_rate=jnp.where(jnp.asarray(purge_on), 20.0,
                                  1.0).astype(jnp.float32))

    substeps = max(R.default_substeps(cfg, args.dt), 16)
    final, traj = R.rollout_scheduled(params, state, schedule, dt=args.dt,
                                      substeps=substeps, record=True)
    T = np.asarray(traj["temperature"])                  # [n, Z]
    phi = np.asarray(PH.ice_fraction(jnp.asarray(T), pp))
    top = phi[:, -1]

    # evaporative loss over the open-water (not iced) hours
    m_evap = np.asarray(PH.evaporation_flux(
        jnp.asarray(T[:, -1]), jnp.asarray(t_amb, jnp.float32),
        jnp.float32(0.6), jnp.float32(args.wind), pp)) * (1.0 - top)
    a_cross = 1.0 / 2.0                                  # V/H [m^2]
    litres_lost = float((m_evap * a_cross * args.dt).sum())

    ice_hours = float((top > 0.05).sum() * args.dt / 3600.0)
    report = {
        "days": args.days,
        "min_bulk_temp_C": round(float(T.min()), 2),
        "hours_of_surface_ice": round(ice_hours, 1),
        "peak_surface_ice_fraction": round(float(top.max()), 3),
        "peak_worst_ice_fraction": round(float(phi.max()), 3),
        "evaporative_loss_L": round(litres_lost, 2),
        "purge_inlet_C": args.purge_c,
        "outlet_liquid_at_end": bool(top[-1] < 0.05),
        "plateau_note": "bulk pinned in the mushy band "
                        f"{int(((T > -0.5) & (T <= 0.0)).any(axis=1).sum())}"
                        f"/{n_steps} steps (latent heat, not a clip)",
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
