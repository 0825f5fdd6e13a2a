"""
Ensemble Kalman filter on a high-resolution full-chemistry plant —
state estimation past the point where an explicit covariance scales.

A 48-zone nitrogen+gas plant carries 9 fields/zone = a 432-dim state.
The full-state EKF (control/ekf.py) would spend 433 plant evaluations
per tick on the jacfwd Jacobian plus O(432²) covariance algebra; the
EnKF (control/enkf.py) replaces both with a vmapped member batch —
the framework's fastest shape — at a cost that scales with the
ensemble size you choose, not the state size the plant imposes.

The demo reconstructs the UNMEASURED interior (mid-zone chlorine and
ammonia — no instrument within 20 zones) from six boundary taps,
against a truth run the filter's wrong initial guess knows nothing
about, and prints the error trajectory next to the open-loop model
rollout from the same guess.

Usage:
  python examples/enkf_highres.py                  # 48 zones, 64 members
  python examples/enkf_highres.py --zones 96 --members 128 --steps 40
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ics_wt_physicsengine_tpu.utils.backend_select import (  # noqa: E402
    ensure_default_backend)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--zones", type=int, default=48)
    ap.add_argument("--members", type=int, default=64)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--dt", type=float, default=30.0)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (skip the TPU probe)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        ensure_default_backend(min_devices=1, probe_deadline=60.0)
        import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    import dataclasses

    from ics_wt_physicsengine_tpu.control import (
        ensemble_spread, make_enkf, make_enkf_carry, tap_index)
    from ics_wt_physicsengine_tpu.core import reactor as R

    Z, N = args.zones, args.members
    config = R.ReactorConfiguration(
        volume=2000.0, height=4.0, diameter=0.798, n_zones=Z,
        flow_rate=5.0, initial_pH=7.2, initial_chlorine=2.0,
        temperature=20.0, enable_nitrogen=True, enable_gas=True,
        initial_ammonia=0.5)
    params = R.make_params(config, dtype=jnp.float32)
    substeps = R.default_substeps(config, args.dt)
    bc = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.4, inlet_chlorine=0.6,
        inlet_temperature=18.0, inlet_ammonia=0.8,
        chlorine_flow_rate=0.15)

    n_fields = 9          # pH Cl T | NH3 NO2 NO3 NH2Cl | O2 C_T
    n_state = n_fields * Z
    print(f"plant: {Z} zones x {n_fields} fields = {n_state}-dim state, "
          f"{N}-member EnKF on {jax.default_backend()}")
    print(f"(an EKF tick here = {n_state + 1} plant evals for the "
          f"Jacobian + O({n_state}^2) covariance algebra; "
          f"the EnKF tick = {N} plant evals, any state size)")

    # truth: a stratified transient the filter's flat guess doesn't know
    truth = R.make_initial_state(config, dtype=jnp.float32)
    truth = dataclasses.replace(
        truth,
        pH=jnp.linspace(6.9, 7.5, Z).astype(jnp.float32),
        chlorine=jnp.linspace(2.8, 1.0, Z).astype(jnp.float32),
        temperature=jnp.linspace(22.0, 19.0, Z).astype(jnp.float32),
        ammonia=jnp.linspace(0.9, 0.2, Z).astype(jnp.float32),
    ).update_derived()
    # the filter's guess is genuinely wrong: a flat cold-start profile
    guess = R.make_initial_state(config, dtype=jnp.float32)
    guess = dataclasses.replace(
        guess,
        chlorine=jnp.full(Z, 0.4, jnp.float32),
        ammonia=jnp.full(Z, 0.05, jnp.float32),
    ).update_derived()

    taps = [("pH", 0), ("pH", -1), ("chlorine", -1),
            ("temperature", -1), ("ammonia", -1), ("oxygen", -1)]
    sigma = np.array([0.02, 0.02, 0.02, 0.05, 0.02, 0.05])
    enkf_step = jax.jit(make_enkf(
        params, Z, taps, args.dt, substeps,
        process_noise=(1e-7, 1e-6, 1e-5),
        measurement_noise=sigma**2,
        inflation=1.02, localization_radius=max(4.0, Z / 3.0)))
    carry = make_enkf_carry(guess, (0.04, 1.0, 4.0, 0.1, 0.01, 0.01,
                                    0.01, 0.5, 0.05),
                            Z, N, jax.random.PRNGKey(0))

    mid = Z // 2
    i_cl = tap_index("chlorine", mid, Z, nitrogen=True, gas=True)
    i_nh = tap_index("ammonia", mid, Z, nitrogen=True, gas=True)
    tap_idx = [tap_index(f, z, Z, nitrogen=True, gas=True)
               for f, z in taps]

    open_loop = guess
    rng = np.random.default_rng(1)
    step_jit = jax.jit(lambda s: R.step(params, s, bc, args.dt, substeps))
    # warm the compiles so the printed rate is steady-state throughput
    step_jit(truth)
    z_w = jnp.zeros(len(taps), jnp.float32) + jnp.nan
    enkf_step(carry, z_w, bc)
    x = jnp.mean(carry.ensemble, axis=0)
    e0_cl = abs(float(x[i_cl]) - float(truth.chlorine[mid]))
    e0_nh = abs(float(x[i_nh]) - float(truth.ammonia[mid]))
    print(f"{'tick':>4} {'mid-Cl err (EnKF)':>18} {'(open loop)':>12} "
          f"{'mid-NH3 err':>12} {'spread-Cl':>10}")
    t0 = time.perf_counter()
    from ics_wt_physicsengine_tpu.control import flatten_state
    for k in range(args.steps):
        truth = step_jit(truth)
        open_loop = step_jit(open_loop)
        zt = np.asarray(flatten_state(truth))[tap_idx]
        z = jnp.asarray(zt + rng.normal(0.0, sigma), jnp.float32)
        carry, x = enkf_step(carry, z, bc)
        if (k + 1) % 5 == 0 or k == 0:
            e_cl = abs(float(x[i_cl]) - float(truth.chlorine[mid]))
            e_nh = abs(float(x[i_nh]) - float(truth.ammonia[mid]))
            ol = abs(float(open_loop.chlorine[mid])
                     - float(truth.chlorine[mid]))
            sp = float(ensemble_spread(carry)[i_cl])
            print(f"{k + 1:>4} {e_cl:>18.4f} {ol:>12.4f} "
                  f"{e_nh:>12.4f} {sp:>10.4f}")
    wall = time.perf_counter() - t0
    e_cl = abs(float(x[i_cl]) - float(truth.chlorine[mid]))
    e_nh = abs(float(x[i_nh]) - float(truth.ammonia[mid]))
    print(f"\n{args.steps} assimilation cycles in {wall:.1f}s "
          f"({args.steps * N / wall:.0f} member-steps/s incl. truth "
          f"+ open-loop runs)")
    print(f"mid-zone chlorine error: {e0_cl:.3f} -> {e_cl:.3f} mg/L; "
          f"ammonia {e0_nh:.3f} -> {e_nh:.3f} mg-N/L")
    ok = e_cl < 0.25 * e0_cl and e_nh < 0.5 * e0_nh
    print("OK" if ok else "NOT CONVERGED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
