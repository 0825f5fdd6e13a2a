"""
Extended Kalman filter over the full plant state (control/ekf.py).

The EKF must reconstruct UNMEASURED interior zones from the noisy
boundary-zone taps a real plant has — strictly faster and tighter than
open-loop model rollout from the same wrong initial guess — and keep
working through NaN dropouts and under vmap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.control import (
    flatten_state,
    make_ekf,
    make_ekf_carry,
    tap_index,
    unflatten_state,
)
from ics_wt_physicsengine_tpu.core import reactor as R

Z = 6
DT = 30.0
TAPS = [("pH", 0), ("pH", -1), ("chlorine", -1), ("temperature", -1)]
SIGMA = np.array([0.02, 0.02, 0.02, 0.05])   # per-tap noise std


def _plant():
    config = R.ReactorConfiguration(
        volume=1000.0, n_zones=Z, flow_rate=5.0, initial_pH=7.2,
        initial_chlorine=2.0, temperature=20.0)
    params = R.make_params(config, dtype=jnp.float64)
    substeps = R.default_substeps(config, DT)
    boundary = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.5, inlet_chlorine=0.5,
        inlet_temperature=18.0, acid_flow_rate=0.1,
        acid_concentration=0.1, chlorine_flow_rate=0.2)
    return config, params, substeps, boundary


def _truth_state(config):
    """A structured transient the wrong guess does not know about."""
    st = R.make_initial_state(config, dtype=jnp.float64)
    st = R.ReactorState(
        time=st.time,
        pH=jnp.linspace(6.8, 7.6, Z).astype(st.pH.dtype),
        chlorine=jnp.linspace(3.0, 1.2, Z).astype(st.pH.dtype),
        temperature=jnp.linspace(22.0, 19.0, Z).astype(st.pH.dtype),
        flow_rate=st.flow_rate)
    return st.update_derived()


def _wrong_guess(config):
    st = R.make_initial_state(config, dtype=jnp.float64)
    st = R.ReactorState(
        time=st.time,
        pH=jnp.full(Z, 7.0, st.pH.dtype),
        chlorine=jnp.full(Z, 0.5, st.pH.dtype),
        temperature=jnp.full(Z, 17.0, st.pH.dtype),
        flow_rate=st.flow_rate)
    return st.update_derived()


def _measure(truth, rng, nan_mask=None):
    z = np.array([float(flatten_state(truth)[tap_index(f, zz, Z)])
                  for f, zz in TAPS])
    z = z + rng.normal(0.0, SIGMA)
    if nan_mask is not None:
        z = np.where(nan_mask, np.nan, z)
    return jnp.asarray(z)


def _mid_cl_error(x, truth):
    mid = Z // 2
    i = tap_index("chlorine", mid, Z)
    return abs(float(x[i]) - float(truth.chlorine[mid]))


def test_flatten_roundtrip():
    config, *_ = _plant()
    st = _truth_state(config)
    x = flatten_state(st)
    assert x.shape == (3 * Z,)
    back = unflatten_state(x, Z)
    np.testing.assert_allclose(back.pH, st.pH)
    np.testing.assert_allclose(back.chlorine, st.chlorine)
    np.testing.assert_allclose(back.temperature, st.temperature)
    assert tap_index("chlorine", -1, Z) == 2 * Z - 1


def test_ekf_reconstructs_unmeasured_zone():
    """Middle-zone chlorine (no instrument) is recovered from the
    boundary taps — much faster than open-loop model rollout from the
    same wrong initial state."""
    config, params, substeps, boundary = _plant()
    truth = _truth_state(config)
    guess = _wrong_guess(config)
    ekf_step = jax.jit(make_ekf(
        params, Z, TAPS, DT, substeps,
        measurement_noise=(SIGMA ** 2).tolist()))
    step = jax.jit(lambda s: R.step(params, s, boundary, DT, substeps))

    carry = make_ekf_carry(guess, p0=(0.05, 1.0, 4.0), n_zones=Z)
    open_loop = guess
    rng = np.random.default_rng(0)
    err0 = _mid_cl_error(flatten_state(guess), truth)
    n_steps = 40
    for _ in range(n_steps):
        truth = step(truth)
        open_loop = step(open_loop)
        carry, x_hat = ekf_step(carry, _measure(truth, rng), boundary)

    ekf_err = _mid_cl_error(x_hat, truth)
    ol_err = _mid_cl_error(flatten_state(open_loop), truth)
    # open loop decays on the residence-time scale (~200 min); after
    # 20 min it still carries most of the initial error
    assert ol_err > 0.4 * err0, (ol_err, err0)
    assert ekf_err < 0.3 * ol_err, (ekf_err, ol_err)
    assert ekf_err < 0.15, ekf_err
    # covariance stays finite and positive on the diagonal
    assert bool(jnp.all(jnp.isfinite(carry.P)))
    assert bool(jnp.all(jnp.diagonal(carry.P) > 0))


def test_ekf_survives_nan_dropouts():
    """NaN measurements (air bubbles, open/short faults) skip that
    channel's update; the filter stays finite and still converges."""
    config, params, substeps, boundary = _plant()
    truth = _truth_state(config)
    guess = _wrong_guess(config)
    ekf_step = jax.jit(make_ekf(
        params, Z, TAPS, DT, substeps,
        measurement_noise=(SIGMA ** 2).tolist()))
    step = jax.jit(lambda s: R.step(params, s, boundary, DT, substeps))

    carry = make_ekf_carry(guess, p0=(0.05, 1.0, 4.0), n_zones=Z)
    rng = np.random.default_rng(1)
    for i in range(40):
        truth = step(truth)
        # drop a rotating channel every step; an all-NaN tick every 10
        mask = np.zeros(len(TAPS), bool)
        mask[i % len(TAPS)] = True
        if i % 10 == 5:
            mask[:] = True
        carry, x_hat = ekf_step(carry, _measure(truth, rng, mask),
                                boundary)
    assert bool(jnp.all(jnp.isfinite(x_hat)))
    assert _mid_cl_error(x_hat, truth) < 0.25


def test_ekf_vmap_matches_single():
    """A vmapped filter ensemble is the same program per lane."""
    config, params, substeps, boundary = _plant()
    truth = _truth_state(config)
    guess = _wrong_guess(config)
    ekf_step = make_ekf(params, Z, TAPS, DT, substeps,
                        measurement_noise=(SIGMA ** 2).tolist())
    batched = jax.jit(jax.vmap(ekf_step, in_axes=(0, 0, None)))
    single = jax.jit(ekf_step)
    step = jax.jit(lambda s: R.step(params, s, boundary, DT, substeps))

    carry1 = make_ekf_carry(guess, p0=1.0, n_zones=Z)
    carryB = jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a, a]), carry1)
    rng = np.random.default_rng(2)
    for _ in range(5):
        truth = step(truth)
        z = _measure(truth, rng)
        carry1, x1 = single(carry1, z, boundary)
        carryB, xB = batched(carryB, jnp.stack([z, z, z]), boundary)
    np.testing.assert_allclose(np.asarray(xB[0]), np.asarray(x1),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(xB[2]), np.asarray(x1),
                               rtol=1e-12)


def test_ekf_observer_closed_loop_on_real_instruments():
    """Observer-based output feedback: the dual PID acts on the EKF's
    state estimates instead of raw instrument readings, inside one
    jitted closed-loop scan over the full sensor suite. The loop must
    track the setpoint AND the filter must pin the unmeasured middle
    zone against the true (hidden) reactor state."""
    import ics_wt_physicsengine_tpu.control as C
    from ics_wt_physicsengine_tpu.models.plant import make_plant

    zones, dt = 5, 30.0
    config = R.ReactorConfiguration(n_zones=zones, initial_chlorine=2.0,
                                    flow_rate=20.0)
    pparams, plant = make_plant(config, seed=3, dtype=jnp.float32)
    substeps = R.default_substeps(config, dt)
    taps = [("pH", 0), ("pH", -1), ("chlorine", -1),
            ("temperature", -1)]
    measured = ["pH_inlet", "pH_outlet", "chlorine_outlet",
                "temp_outlet"]
    ekf_step = make_ekf(pparams.reactor, zones, taps, dt, substeps,
                        measurement_noise=(4e-4, 4e-4, 2.5e-3, 1e-2))
    # the PID consumes the POSTERIOR estimates of its two inputs
    wrapped = C.ekf_observer(
        C.dual_pid_controller, ekf_step, zones, measured,
        estimates={"chlorine_outlet": ("chlorine", -1),
                   "pH_inlet": ("pH", 0)})
    gains = C.DualPIDGains(
        chlorine=C.make_gains(1.5, 0.05, 0.0, 2.0, 0.0, 1.0),
        ph=C.make_gains(-0.8, -0.05, 0.0, 7.0, 0.0, 2.0))
    guess = R.make_initial_state(config, dtype=jnp.float32)
    carry = (C.make_dual_pid_carry((), jnp.float32),
             make_ekf_carry(guess, p0=(0.05, 1.0, 4.0),
                            n_zones=zones))
    bc = R.BoundaryConditions(inlet_flow_rate=20.0)

    final, (_, ekf_final), _, traj = C.rollout_closed_loop(
        pparams, plant, bc, wrapped, gains, carry, dt=dt,
        substeps=substeps, n_steps=60, observe="sensors",
        record_obs=("chlorine_outlet",))

    # tracking on the real instruments
    track = float(np.asarray(traj["chlorine_outlet"])[-10:].mean())
    assert abs(track - 2.0) < 0.5, track
    # The estimate equals truth up to the outlet sensor's calibration
    # bias (an unobservable common-mode offset — the filter can only be
    # as accurate as its instruments): the interior PROFILE SHAPE must
    # match truth tightly, the absolute level within the bias budget.
    mid = zones // 2
    est = np.asarray(ekf_final.x[zones:2 * zones])
    true_cl = np.asarray(final.reactor.chlorine)
    est_grad = est[mid] - est[-1]
    true_grad = true_cl[mid] - true_cl[-1]
    assert abs(est_grad - true_grad) < 0.1, (est_grad, true_grad)
    assert abs(est[mid] - true_cl[mid]) < 0.7   # |bias| budget
    assert bool(jnp.all(jnp.isfinite(ekf_final.P)))


def test_nis_fault_monitor_flags_biased_instrument():
    """Innovation-based fault detection: after the filter converges, a
    +0.5 mg/L bias in the outlet chlorine instrument drives the NIS
    average over threshold within a few ticks. Detection needs
    cross-constraint (a second chlorine tap): a single-tap bias is
    nearly unobservable — the filter absorbs it into the state — and
    the monitor honestly isolates the fault to the CONFLICTING
    instrument pair, not the single culprit, while the pH and
    temperature channels stay clean."""
    from ics_wt_physicsengine_tpu.control import nis_fault_monitor

    config, params, substeps, boundary = _plant()
    truth = _truth_state(config)
    guess = _wrong_guess(config)
    taps = TAPS + [("chlorine", 0)]     # the suite's inlet instrument
    sigma = np.append(SIGMA, 0.02)
    ekf_step = jax.jit(make_ekf(
        params, Z, taps, DT, substeps,
        measurement_noise=(sigma ** 2).tolist(), diagnostics=True))
    step = jax.jit(lambda s: R.step(params, s, boundary, DT, substeps))
    ema, update = nis_fault_monitor(len(taps))

    rng = np.random.default_rng(4)
    carry = make_ekf_carry(guess, p0=(0.05, 1.0, 4.0), n_zones=Z)
    cl_out = taps.index(("chlorine", -1))

    def measure(tr, rng):
        zv = np.array([float(flatten_state(tr)[tap_index(f, zz, Z)])
                       for f, zz in taps]) + rng.normal(0.0, sigma)
        return zv

    for i in range(100):
        truth = step(truth)
        zv = measure(truth, rng)
        if i >= 60:          # instrument develops a calibration fault
            zv[cl_out] += 0.5
        carry, x_hat, diag = ekf_step(carry, jnp.asarray(zv), boundary)
        ema, flags = update(ema, diag)
        if i == 55:          # converged, pre-fault: everything healthy
            assert not bool(jnp.any(flags)), np.asarray(ema)
        if i == 70:          # flagged within 10 ticks of the fault
            assert bool(flags[cl_out]), np.asarray(ema)
    flags = np.asarray(flags)
    assert flags[cl_out], np.asarray(ema)
    # pH and temperature channels stay clean (fault isolated to the
    # chlorine instrument pair)
    assert not flags[0] and not flags[1] and not flags[3], \
        np.asarray(ema)


def test_augmented_ekf_identifies_unknown_inlet_chlorine():
    """Online parameter estimation: an unmeasured upstream disturbance
    (inlet chlorine at 0.8 mg/L; the filter starts believing 0) is
    identified from the boundary taps while the state stays pinned."""
    from ics_wt_physicsengine_tpu.control import (make_augmented_carry,
                                                  make_augmented_ekf)

    config, params, substeps, boundary = _plant()
    # truth runs with a HIGHER inlet chlorine than the filter's boundary
    import dataclasses
    true_bc = dataclasses.replace(boundary, inlet_chlorine=0.8)
    truth = _truth_state(config)
    guess = _wrong_guess(config)
    # include the suite's INLET chlorine instrument: the first zone
    # reflects the inlet within its own residence time, so the
    # parameter identifies much faster than via the outlet alone
    taps = TAPS + [("chlorine", 0)]
    sigma = np.append(SIGMA, 0.02)
    # augment_noise trades adaptation speed against steady noise: the
    # disturbance here is a step, so a fairly lively random walk
    # (sigma_theta ~ sqrt(1e-3*30) ~ 0.17 mg/L per tick) is right
    ekf_step = jax.jit(make_augmented_ekf(
        params, Z, taps, DT, substeps, augment=("inlet_chlorine",),
        augment_noise=1e-3, measurement_noise=(sigma ** 2).tolist()))
    step = jax.jit(lambda s: R.step(params, s, true_bc, DT, substeps))

    def measure(tr, rng):
        z = np.array([float(flatten_state(tr)[tap_index(f, zz, Z)])
                      for f, zz in taps])
        return jnp.asarray(z + rng.normal(0.0, sigma))

    carry = make_augmented_carry(guess, theta0=[0.0],
                                 p0=(0.05, 1.0, 4.0), p0_theta=1.0,
                                 n_zones=Z)
    rng = np.random.default_rng(3)
    for _ in range(120):
        truth = step(truth)
        # the filter is handed the WRONG boundary (inlet_chlorine=0.5);
        # its augmented state must discover the true 0.8
        carry, x_hat = ekf_step(carry, measure(truth, rng), boundary)

    theta = float(x_hat[3 * Z])
    assert abs(theta - 0.8) < 0.1, theta
    assert _mid_cl_error(x_hat, truth) < 0.15
    assert bool(jnp.all(jnp.isfinite(carry.P)))


def test_ekf_statistical_consistency():
    """Filter consistency: over a long healthy run the per-channel NIS
    must average ~1 (chi-square(1)) — an overconfident filter (NIS >> 1)
    or an undertuned one (NIS << 1) both fail. This pins the Q/R
    defaults as statistically honest, not just convergent."""
    config, params, substeps, boundary = _plant()
    truth = _truth_state(config)
    guess = _wrong_guess(config)
    ekf_step = jax.jit(make_ekf(
        params, Z, TAPS, DT, substeps,
        measurement_noise=(SIGMA ** 2).tolist(), diagnostics=True))
    step = jax.jit(lambda s: R.step(params, s, boundary, DT, substeps))

    rng = np.random.default_rng(5)
    carry = make_ekf_carry(guess, p0=(0.05, 1.0, 4.0), n_zones=Z)
    nis = []
    for i in range(260):
        truth = step(truth)
        carry, x_hat, diag = ekf_step(carry, _measure(truth, rng),
                                      boundary)
        if i >= 60:          # post-convergence steady state
            nis.append(np.asarray(diag["nis"]))
    mean_nis = np.mean(np.stack(nis), axis=0)
    # 200 samples of chi-square(1): the mean lies in a generous
    # confidence band; channels are correlated through the state so
    # exact bounds are loose, but order-of-magnitude miscalibration
    # (overconfident Q/R) is excluded
    assert np.all(mean_nis > 0.2), mean_nis
    assert np.all(mean_nis < 2.5), mean_nis


def test_ekf_validates_taps():
    with pytest.raises(ValueError, match="field"):
        tap_index("ammonia", 0, Z)            # core state: no species
    assert tap_index("ammonia", 0, Z, nitrogen=True) == 3 * Z
    with pytest.raises(ValueError, match="zone"):
        tap_index("pH", Z, Z)


def test_nitrogen_ekf_reconstructs_species():
    """Nitrogen plants extend the EKF state to 7 fields per zone: the
    ISE ammonia instrument plus the core taps reconstruct the
    unmeasured interior ammonia profile through the nitrification
    kinetics."""
    n_config = R.ReactorConfiguration(
        volume=1000.0, n_zones=Z, flow_rate=5.0, initial_pH=7.2,
        initial_chlorine=0.2, temperature=20.0, enable_nitrogen=True,
        initial_ammonia=1.0)
    params = R.make_params(n_config, dtype=jnp.float64)
    substeps = R.default_substeps(n_config, DT)
    boundary = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.4, inlet_chlorine=0.0,
        inlet_temperature=20.0, inlet_ammonia=1.2)
    taps = TAPS + [("ammonia", -1)]
    sigma = np.append(SIGMA, 0.05)
    ekf_step = jax.jit(make_ekf(
        params, Z, taps, DT, substeps,
        measurement_noise=(sigma ** 2).tolist()))
    step = jax.jit(lambda s: R.step(params, s, boundary, DT, substeps))

    truth = R.make_initial_state(n_config, dtype=jnp.float64)
    truth = R.ReactorState(
        time=truth.time, pH=truth.pH, chlorine=truth.chlorine,
        temperature=truth.temperature, flow_rate=truth.flow_rate,
        ammonia=jnp.linspace(1.5, 0.8, Z).astype(truth.pH.dtype),
        nitrite=truth.nitrite, nitrate=truth.nitrate,
        chloramine=truth.chloramine).update_derived()
    guess = R.make_initial_state(n_config, dtype=jnp.float64)

    carry = make_ekf_carry(
        guess, p0=(0.05, 1.0, 4.0, 1.0, 0.1, 0.1, 0.1), n_zones=Z)
    assert carry.x.shape == (7 * Z,)
    rng = np.random.default_rng(6)
    open_loop = guess
    for _ in range(40):
        truth = step(truth)
        open_loop = step(open_loop)
        z = np.array([float(flatten_state(truth)[
            tap_index(f, zz, Z, nitrogen=True)]) for f, zz in taps])
        carry, x_hat = ekf_step(carry,
                                jnp.asarray(z + rng.normal(0, sigma)),
                                boundary)
    mid = Z // 2
    i_nh = tap_index("ammonia", mid, Z, nitrogen=True)
    ekf_err = abs(float(x_hat[i_nh]) - float(truth.ammonia[mid]))
    ol_err = abs(float(open_loop.ammonia[mid])
                 - float(truth.ammonia[mid]))
    assert ekf_err < 0.5 * ol_err, (ekf_err, ol_err)
    assert ekf_err < 0.15, ekf_err
    assert bool(jnp.all(jnp.isfinite(carry.P)))


def test_gas_ekf_reconstructs_oxygen_profile():
    """Gas plants append O2/C_T to the EKF state: the outlet DO probe plus
    the core taps reconstruct the unmeasured interior oxygen sag through
    the reaeration dynamics (soft-sensing for aeration control)."""
    g_config = R.ReactorConfiguration(
        volume=1000.0, n_zones=Z, flow_rate=5.0, initial_pH=7.2,
        initial_chlorine=0.2, temperature=20.0, enable_gas=True,
        gas_params={"kl_surface": 1e-4})
    params = R.make_params(g_config, dtype=jnp.float64)
    substeps = R.default_substeps(g_config, DT)
    boundary = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.4, inlet_chlorine=0.0,
        inlet_temperature=20.0, inlet_oxygen=6.0, aeration_kla=5e-4)
    taps = TAPS + [("oxygen", -1)]
    sigma = np.append(SIGMA, 0.05)
    ekf_step = jax.jit(make_ekf(
        params, Z, taps, DT, substeps,
        measurement_noise=(sigma ** 2).tolist()))
    step = jax.jit(lambda s: R.step(params, s, boundary, DT, substeps))

    truth = R.make_initial_state(g_config, dtype=jnp.float64)
    truth = R.ReactorState(
        time=truth.time, pH=truth.pH, chlorine=truth.chlorine,
        temperature=truth.temperature, flow_rate=truth.flow_rate,
        oxygen=jnp.linspace(3.0, 8.0, Z).astype(truth.pH.dtype),
        carbonate=truth.carbonate).update_derived()
    guess = R.make_initial_state(g_config, dtype=jnp.float64)

    carry = make_ekf_carry(
        guess, p0=(0.05, 1.0, 4.0, 4.0, 0.25), n_zones=Z)
    assert carry.x.shape == (5 * Z,)
    rng = np.random.default_rng(8)
    open_loop = guess
    for _ in range(40):
        truth = step(truth)
        open_loop = step(open_loop)
        z = np.array([float(flatten_state(truth)[
            tap_index(f, zz, Z, gas=True)]) for f, zz in taps])
        carry, x_hat = ekf_step(carry,
                                jnp.asarray(z + rng.normal(0, sigma)),
                                boundary)
    mid = Z // 2
    i_o2 = tap_index("oxygen", mid, Z, gas=True)
    ekf_err = abs(float(x_hat[i_o2]) - float(truth.oxygen[mid]))
    ol_err = abs(float(open_loop.oxygen[mid])
                 - float(truth.oxygen[mid]))
    assert ekf_err < 0.5 * ol_err, (ekf_err, ol_err)
    assert bool(jnp.all(jnp.isfinite(carry.P)))


def test_tap_index_species_layout_nitrogen_plus_gas():
    """Gas fields come AFTER the nitrogen block, matching step()'s species
    tuple layout (pH, Cl, T | 4 nitrogen | 2 gas)."""
    assert tap_index("oxygen", 0, Z, gas=True) == 3 * Z
    assert tap_index("oxygen", 0, Z, nitrogen=True, gas=True) == 7 * Z
    assert tap_index("carbonate", -1, Z, nitrogen=True, gas=True) \
        == 8 * Z + (Z - 1)
    with pytest.raises(ValueError, match="field"):
        tap_index("oxygen", 0, Z)   # gas fields need gas=True


def test_particle_ekf_soft_senses_tss_from_turbidity():
    """Particle plants append TSS classes + sludge to the EKF state, and
    the nephelometer tap is a class-WEIGHTED linear measurement row
    (y = sum_c w_c tss[c, z]): one outlet NTU channel plus the core taps
    pulls the whole total-solids profile toward truth, beating the same
    wrong guess run open loop."""
    from ics_wt_physicsengine_tpu.control import tss_index
    from ics_wt_physicsengine_tpu.core import particles as P

    config = R.ReactorConfiguration(
        volume=1000.0, n_zones=Z, flow_rate=5.0, initial_pH=7.2,
        initial_chlorine=0.5, temperature=20.0, enable_particles=True,
        initial_tss=10.0)
    params = R.make_params(config, dtype=jnp.float64)
    substeps = R.default_substeps(config, DT)
    boundary = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.4, inlet_chlorine=0.3,
        inlet_temperature=20.0, inlet_tss=25.0)
    taps = TAPS + [("turbidity", -1)]
    sigma = np.append(SIGMA, 0.2)        # 0.2 NTU nephelometer noise
    ekf_step = jax.jit(make_ekf(
        params, Z, taps, DT, substeps,
        measurement_noise=(sigma ** 2).tolist(),
        particle_noise=(1e-3, 1e-8)))
    step = jax.jit(lambda s: R.step(params, s, boundary, DT, substeps))

    # truth carries MORE solids than the filter's guess believes
    truth = R.make_initial_state(config, dtype=jnp.float64)
    truth = R.ReactorState(
        time=truth.time, pH=truth.pH, chlorine=truth.chlorine,
        temperature=truth.temperature, flow_rate=truth.flow_rate,
        tss=3.0 * truth.tss, sludge=truth.sludge).update_derived()
    guess = R.make_initial_state(config, dtype=jnp.float64)
    open_loop = guess

    n_cls = P.N_CLASSES
    carry = make_ekf_carry(
        guess, p0=(0.05, 1.0, 4.0, 25.0, 1.0), n_zones=Z)
    assert carry.x.shape == (3 * Z + n_cls * Z + n_cls,)

    rng = np.random.default_rng(11)
    for _ in range(40):
        truth = step(truth)
        open_loop = step(open_loop)
        z = [float(flatten_state(truth)[tap_index(f, zz, Z)])
             for f, zz in TAPS]
        z.append(float(P.turbidity_ntu_tap(truth.tss[:, -1],
                                           params.particles)))
        carry, x_hat = ekf_step(
            carry, jnp.asarray(np.asarray(z) + rng.normal(0, sigma)),
            boundary)

    mid = Z // 2
    est = unflatten_state(x_hat, Z, n_classes=n_cls)
    tss_est = float(jnp.sum(est.tss[:, mid]))
    tss_true = float(jnp.sum(truth.tss[:, mid]))
    tss_ol = float(jnp.sum(open_loop.tss[:, mid]))
    assert abs(tss_est - tss_true) < 0.5 * abs(tss_ol - tss_true), (
        tss_est, tss_true, tss_ol)
    # the flat layout helper addresses the same entries the estimate used
    i0 = tss_index(0, mid, Z, n_cls)
    assert float(x_hat[i0]) == float(est.tss[0, mid])
    assert bool(jnp.all(jnp.isfinite(carry.P)))


def test_biofilm_ekf_soft_senses_wall_film_from_residual():
    """Biofilm plants append bacteria/BDOC/film to the EKF state. The wall
    film is physically unmeasurable, but it exerts a chlorine wall demand
    (core/biofilm.py::wall_demand_rate) — so the outlet residual tap plus
    an HPC grab-sample tap must pull the film estimate toward truth through
    the process-model coupling, beating the same wrong guess open loop
    (the operational question: 'is this tank biofouled?')."""
    from ics_wt_physicsengine_tpu.core import biofilm as B

    def cfg(film):
        return R.ReactorConfiguration(
            volume=1000.0, n_zones=Z, flow_rate=5.0, initial_pH=7.2,
            initial_chlorine=2.0, temperature=20.0, enable_biofilm=True,
            initial_bacteria=2e-4, initial_bdoc=0.5, initial_biofilm=film,
            # stronger wall demand so 40 x 30 s resolves the film through
            # the residual (default 1e-5 needs multi-hour horizons)
            biofilm_params={"k_cl_film": 2e-4})

    t_config = cfg(500.0)               # truth: heavily fouled walls
    g_config = cfg(20.0)                # filter + open loop believe clean
    params = R.make_params(t_config, dtype=jnp.float64)
    substeps = R.default_substeps(t_config, DT)
    boundary = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.4, inlet_chlorine=2.0,
        inlet_temperature=20.0, inlet_bacteria=2e-4, inlet_bdoc=0.5)

    taps = TAPS + [("hpc", -1)]
    sigma = np.append(SIGMA, 30.0)      # 30 CFU/mL plate-count noise
    ekf_step = jax.jit(make_ekf(
        params, Z, taps, DT, substeps,
        measurement_noise=(sigma ** 2).tolist()))
    step = jax.jit(lambda s: R.step(params, s, boundary, DT, substeps))

    truth = R.make_initial_state(t_config, dtype=jnp.float64)
    guess = R.make_initial_state(g_config, dtype=jnp.float64)
    open_loop = guess

    # per-field prior variance: film uncertainty is the big unknown
    carry = make_ekf_carry(
        guess, p0=(0.05, 1.0, 4.0, 1e-6, 0.25, 1e5), n_zones=Z)
    assert carry.x.shape == (6 * Z,)

    rng = np.random.default_rng(13)
    for _ in range(40):
        truth = step(truth)
        open_loop = step(open_loop)
        z = [float(flatten_state(truth)[tap_index(f, zz, Z,
                                                  biofilm=True)])
             for f, zz in TAPS]
        z.append(float(B.hpc_cfu_per_ml(truth.bacteria[-1])))
        carry, x_hat = ekf_step(
            carry, jnp.asarray(np.asarray(z) + rng.normal(0, sigma)),
            boundary)

    mid = Z // 2
    est = unflatten_state(x_hat, Z, biofilm=True)
    film_true = float(truth.biofilm[mid])
    film_err = abs(float(est.biofilm[mid]) - film_true)
    film_ol = abs(float(open_loop.biofilm[mid]) - film_true)
    assert film_err < 0.5 * film_ol, (film_err, film_ol, film_true)
    # the residual estimate itself must track the fouled tank's decay
    cl_err = abs(float(est.chlorine[mid]) - float(truth.chlorine[mid]))
    cl_ol = abs(float(open_loop.chlorine[mid])
                - float(truth.chlorine[mid]))
    assert cl_err < 0.5 * cl_ol, (cl_err, cl_ol)
    assert bool(jnp.all(jnp.isfinite(carry.P)))


def test_tap_index_biofilm_layout():
    """Biofilm fields trail the gas block, matching step()'s species tuple
    (pH, Cl, T | nitrogen | gas | bacteria, bdoc, biofilm); hpc taps
    require a biofilm plant."""
    assert tap_index("bacteria", 0, Z, biofilm=True) == 3 * Z
    assert tap_index("biofilm", -1, Z, biofilm=True) == 5 * Z + (Z - 1)
    assert tap_index("bacteria", 0, Z, nitrogen=True, gas=True,
                     biofilm=True) == 9 * Z
    with pytest.raises(ValueError, match="field"):
        tap_index("bacteria", 0, Z)
    config = R.ReactorConfiguration(
        volume=1000.0, n_zones=Z, enable_biofilm=False)
    params = R.make_params(config, dtype=jnp.float64)
    with pytest.raises(ValueError, match="biofilm"):
        make_ekf(params, Z, [("hpc", -1)], DT, 2,
                 measurement_noise=1.0)


def test_ekf_escapes_zero_film_prior():
    """Regression: the physical-bounds clamp must not be an absorbing
    region. From a 'clean tank' prior (film exactly 0), one noisy update
    can push the film estimate below zero; with a hard (or leaky) clamp
    in the process model the Jacobian self-transition F(B,B) drops to
    ~0 (or leak), the predict then collapses P(B,B) by its square each
    step, and the filter permanently reads clean. The full
    straight-through pre-clip (control/pid.py::ste_clip) keeps both the
    escape direction and the variance alive — the filter must climb out
    and keep a sane covariance."""
    cfg = R.ReactorConfiguration(
        volume=1000.0, n_zones=Z, flow_rate=5.0, initial_pH=7.2,
        initial_chlorine=1.5, temperature=20.0, enable_biofilm=True,
        initial_bacteria=2e-4, initial_bdoc=0.5, initial_biofilm=300.0,
        biofilm_params={"k_cl_film": 1e-4})
    params = R.make_params(cfg, dtype=jnp.float64)
    substeps = R.default_substeps(cfg, 60.0)
    boundary = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_chlorine=1.5, inlet_bacteria=2e-4,
        inlet_bdoc=0.5)
    taps = [("chlorine", -1), ("pH", -1), ("hpc", -1)]
    sigma = np.array([0.02, 0.02, 30.0])
    ekf_step = jax.jit(make_ekf(
        params, Z, taps, 60.0, substeps,
        measurement_noise=(sigma ** 2).tolist()))
    step = jax.jit(lambda s: R.step(params, s, boundary, 60.0, substeps))

    from ics_wt_physicsengine_tpu.core import biofilm as B
    truth = R.make_initial_state(cfg, dtype=jnp.float64)
    g_cfg = R.ReactorConfiguration(
        **{**cfg.__dict__, "initial_biofilm": 0.0})
    carry = make_ekf_carry(
        R.make_initial_state(g_cfg, dtype=jnp.float64),
        p0=(0.05, 1.0, 4.0, 1e-6, 0.25, 1e5), n_zones=Z)
    i_b = tap_index("biofilm", -1, Z, biofilm=True)

    rng = np.random.default_rng(0)
    for _ in range(30):
        truth = step(truth)
        z = np.array([float(truth.chlorine[-1]), float(truth.pH[-1]),
                      float(B.hpc_cfu_per_ml(truth.bacteria[-1]))])
        carry, x_hat = ekf_step(carry, jnp.asarray(z + rng.normal(0, sigma)),
                                boundary)
    # with the collapse bug: B_est ~ 0 and P_BB ~ q*dt*steps ~ 2e-3
    assert float(x_hat[i_b]) > 50.0, float(x_hat[i_b])
    assert float(carry.P[i_b, i_b]) > 1e3, float(carry.P[i_b, i_b])

def test_weak_typed_f64_state_stays_f64():
    """make_ekf_carry from weakly-typed float64 leaves (jnp.full with
    Python floats) must filter in float64 — the f32 bound constants in
    the pre-clip would otherwise silently demote the whole filter via
    weak+strong promotion."""
    import jax.numpy as jnp

    config, params, substeps, boundary = _plant()
    st0 = R.make_initial_state(config, dtype=jnp.float64)
    guess = R.ReactorState(
        time=st0.time, pH=jnp.full(Z, 7.0), chlorine=jnp.full(Z, 0.5),
        temperature=jnp.full(Z, 17.0),
        flow_rate=st0.flow_rate).update_derived()
    ekf_step = make_ekf(params, Z, TAPS, DT, substeps,
                        measurement_noise=(SIGMA ** 2).tolist())
    carry = make_ekf_carry(guess, p0=(0.05, 1.0, 4.0), n_zones=Z)
    z = jnp.asarray(np.array([7.2, 7.4, 1.8, 19.5]))
    carry2, x = ekf_step(carry, z, boundary)
    assert x.dtype == jnp.float64
    assert carry2.P.dtype == jnp.float64
