"""Phase change (core/phase.py): freezing / ice and the boiling cap via the
apparent-heat-capacity method, plus Dalton surface evaporation — closes the
reference's "Temperature limited to 0-100 C (liquid water at standard
pressure)" and "Single-phase only (no ice, no vapor)" limitations (reference
README.md:523-524). Structure mirrors tests/test_gas.py: literature oracles
through the validate suite, then end-to-end behavioral physics through the
integrated reactor, then SPMD bit-exactness."""

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import constants as c
from ics_wt_physicsengine_tpu.core import phase as PH
from ics_wt_physicsengine_tpu.core import reactor as R

F64 = jnp.float64


def _config(**kw):
    base = dict(n_zones=4, enable_phase=True, flow_rate=0.0,
                volume=1000.0, height=2.0, diameter=0.798,
                enable_thermal_stratification=False)
    base.update(kw)
    return R.ReactorConfiguration(**base)


def _run(config, bc, n_steps, dt=60.0, substeps=8, dtype=F64,
         record=False):
    params = R.make_params(config, dtype=dtype)
    state = R.make_initial_state(config, dtype=dtype)
    state, traj = R.rollout(params, state, bc, dt=dt, substeps=substeps,
                            n_steps=n_steps, record=record)
    return params, state, traj


def test_validation_suite():
    assert PH.validate_phase(verbose=False)


def test_disabled_axis_structural_parity():
    """enable_phase=False (the default) carries no phase params and the
    [0, 100] clip path is untouched."""
    config = R.ReactorConfiguration(n_zones=4)
    assert R.make_params(config).phase is None


def test_no_op_phase_is_bit_exact_with_disabled():
    """In the liquid range with evaporation disabled the phase axis is a
    structural no-op: c_eff/cp == 1 exactly, mobility == 1, the mixture
    density IS the water density, and the insulation factor is 1 — so the
    trajectory must be BIT-EXACT against the phase-disabled plant."""
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_temperature=26.0,
                              acid_flow_rate=0.2, inlet_chlorine=0.5,
                              ambient_temperature=10.0,
                              heat_loss_coefficient=50.0)
    on = _config(flow_rate=5.0, enable_thermal_stratification=True,
                 phase_params=dict(k_evap=0.0))
    off = R.ReactorConfiguration(
        n_zones=4, flow_rate=5.0, volume=1000.0, height=2.0,
        diameter=0.798, enable_thermal_stratification=True)
    _, s_on, _ = _run(on, bc, 50, dt=1.0, substeps=4)
    _, s_off, _ = _run(off, bc, 50, dt=1.0, substeps=4)
    np.testing.assert_array_equal(np.asarray(s_on.pH), np.asarray(s_off.pH))
    np.testing.assert_array_equal(np.asarray(s_on.chlorine),
                                  np.asarray(s_off.chlorine))
    np.testing.assert_array_equal(np.asarray(s_on.temperature),
                                  np.asarray(s_off.temperature))


def test_freezing_plateau_pins_temperature():
    """A hard-cooled tank spends most of its trajectory pinned inside the
    mushy band extracting latent heat (the Stefan plateau), instead of
    clipping at 0 like the reference (or crashing through it)."""
    bc = R.BoundaryConditions(inlet_flow_rate=0.0,
                              ambient_temperature=-20.0,
                              heat_loss_coefficient=500.0,
                              ambient_humidity=1.0)
    cfg = _config(temperature=10.0)
    _, final, traj = _run(cfg, bc, 220, dt=60.0, record=True)
    T = np.asarray(traj["temperature"])                     # [steps, Z]
    assert np.isfinite(T).all()
    # enters the band, pins there for many steps, then exits below
    in_band = ((T > -0.5) & (T <= 0.0)).any(axis=1)
    assert in_band.sum() > 50
    assert float(np.asarray(final.temperature).max()) < -0.5
    # while in the band, the per-step temperature motion is latent-limited:
    # over 50x slower than the sensible cooling before the band
    dT = np.diff(T[:, 0])
    band = (T[:-1, 0] > -0.45) & (T[:-1, 0] < -0.05)
    pre = T[:-1, 0] > 2.0
    assert band.sum() > 20 and pre.sum() > 2
    assert np.abs(dT[band]).max() < np.abs(dT[pre]).mean() / 50.0


def test_stefan_freezing_time_oracle():
    """With insulation and evaporation off and a quasi-constant driving
    gradient, the time to traverse the mushy band matches the analytic
    lumped Stefan solution t = rho V (c_m dT + L_f) / (U A dT_drive)."""
    U = 500.0
    cfg = _config(temperature=1.0,
                  phase_params=dict(ice_insulation=0.0, k_evap=0.0))
    params = R.make_params(cfg, dtype=F64)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0,
                              ambient_temperature=-40.0,
                              heat_loss_coefficient=U,
                              ambient_humidity=1.0)
    dt = 30.0
    _, _, traj = _run(cfg, bc, 700, dt=dt, substeps=30, record=True)
    T = np.asarray(traj["temperature"])[:, 0]

    def t_cross(level):
        i = int(np.argmax(T < level))          # first sample below level
        f = (T[i - 1] - level) / (T[i - 1] - T[i])
        return (i - 1 + f) * dt
    t_band = t_cross(-0.5) - t_cross(0.0)
    A = float(np.asarray(params.heat_area_m2))
    c_m = 0.5 * (c.WATER_CP + PH.CP_ICE)
    # driving gradient across the band: T ~ -0.25 C vs -40 C ambient
    t_analytic = (c.WATER_DENSITY_20C * 1.0
                  * (c_m * 0.5 + PH.LATENT_FUSION)) / (U * A * 39.75)
    assert abs(t_band - t_analytic) / t_analytic < 0.05


def test_energy_conservation_across_freeze():
    """The enthalpy drop over a freeze-through equals the time-integrated
    ambient heat loss (trapezoid over the recorded trajectory) — latent
    heat is neither created nor lost by the apparent-capacity scheme."""
    U = 800.0
    cfg = _config(temperature=3.0,
                  phase_params=dict(ice_insulation=0.0, k_evap=0.0))
    params = R.make_params(cfg, dtype=F64)
    pp = params.phase
    bc = R.BoundaryConditions(inlet_flow_rate=0.0,
                              ambient_temperature=-30.0,
                              heat_loss_coefficient=U,
                              ambient_humidity=1.0)
    dt = 30.0
    n = 600
    # substeps sized so each substep's sensible motion is << the band
    # width (the apparent-capacity scheme's band-crossing error scales
    # with the per-substep temperature motion — see core/phase.py)
    _, final, traj = _run(cfg, bc, n, dt=dt, substeps=30, record=True)
    T = np.asarray(traj["temperature"])                     # [n, Z]
    assert float(T.min()) < -1.0                         # fully traversed
    T_path = np.concatenate([np.full((1, T.shape[1]), 3.0), T])
    # enthalpy is per kg; zones have equal mass
    h = np.asarray(PH.enthalpy(jnp.asarray(T_path), pp))
    mass = c.WATER_DENSITY_20C * 1.0 / T.shape[1]        # kg per zone
    dH = mass * (h[-1].sum() - h[0].sum())               # [J]
    A = float(np.asarray(params.heat_area_m2))
    # model's loss term: U A (T - T_amb) / (rho cp V_total) per zone [K/s],
    # which is an energy flux of U A (T - T_amb) * (m_zone / m_total) W
    loss_w = U * A * (T_path - (-30.0)) / T.shape[1]     # [n+1, Z] W/zone
    q_int = -np.trapezoid(loss_w.sum(axis=1), dx=dt)     # [J] into tank
    assert abs(dH - q_int) / abs(q_int) < 0.02


def test_ice_blocks_interzone_mixing():
    """A frozen bottom zone neither mixes its chlorine upward nor receives
    heat from the liquid zones: the interface mobility is zero."""
    cfg = _config(n_zones=4)
    params = R.make_params(cfg, dtype=F64)
    s = R.make_initial_state(cfg, dtype=F64)
    T0 = np.asarray([-5.0, -5.0, 20.0, 20.0])
    Cl0 = np.asarray([5.0, 5.0, 0.5, 0.5])
    s = R._update_derived(R.ReactorState(
        time=s.time, pH=s.pH, chlorine=jnp.asarray(Cl0),
        temperature=jnp.asarray(T0), flow_rate=s.flow_rate))
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, ambient_humidity=1.0)
    step = jax.jit(lambda st: R.step(params, st, bc, dt=60.0, substeps=8))
    for _ in range(30):
        s = step(s)
    T = np.asarray(s.temperature)
    Cl = np.asarray(s.chlorine)
    # No transport across the frozen interface: the frozen pair keeps its
    # chlorine apart from its own Arrhenius decay (slow at -5 C; note the
    # decay itself is NOT arrested — for first-order kinetics the freeze
    # concentration 1/(1-phi) exactly cancels the liquid-volume factor
    # (1-phi), so the bulk rate is unchanged), and none of it reaches the
    # liquid pair. Full mixing would equilibrate everything toward 2.75.
    assert Cl[0] == Cl[1]                       # no gradient formed
    assert (Cl[:2] > 4.7).all()                 # decay only, no export
    assert (Cl[2:] < 0.51).all()                # nothing crossed the ice
    np.testing.assert_allclose(T[:2], -5.0, atol=1e-6)
    # the liquid pair hasn't frozen or drifted
    assert (T[2:] > 15.0).all()


def test_boiling_cap_pins_at_t_boil():
    """Under extreme heating the temperature pins inside the boil band
    instead of clipping at 100 C with runaway energy: the vapor latent
    heat caps it (the reference raises/clips there)."""
    bc = R.BoundaryConditions(inlet_flow_rate=0.0,
                              ambient_temperature=400.0,
                              heat_loss_coefficient=5000.0,
                              ambient_humidity=1.0)
    cfg = _config(temperature=95.0, phase_params=dict(k_evap=0.0))
    _, final, traj = _run(cfg, bc, 400, dt=60.0, record=True)
    T = np.asarray(traj["temperature"])
    assert np.isfinite(T).all()
    assert float(T.max()) <= 100.5 + 1e-9
    # pinned: the last 100 steps sit inside the boil band
    assert (T[-100:] >= 100.0).all()
    # and WITHOUT the phase axis the same forcing clips at exactly 100
    # (a 95 C initial state isn't even constructible there — the config
    # gate enforces the reference's liquid-only range)
    off = R.ReactorConfiguration(
        n_zones=4, flow_rate=0.0, volume=1000.0, height=2.0,
        diameter=0.798, temperature=40.0,
        enable_thermal_stratification=False)
    _, s_off, _ = _run(off, bc, 400, dt=60.0)
    np.testing.assert_allclose(np.asarray(s_off.temperature), 100.0)


def test_evaporative_cooling_magnitude():
    """Dry wind over a warm tank cools the surface zone at the Dalton
    rate; saturated still air at water temperature does nothing."""
    cfg = _config(temperature=25.0)
    params = R.make_params(cfg, dtype=F64)
    dry = R.BoundaryConditions(inlet_flow_rate=0.0,
                               ambient_temperature=25.0,
                               heat_loss_coefficient=0.0,
                               ambient_humidity=0.1, wind_speed=4.0)
    wet = R.BoundaryConditions(inlet_flow_rate=0.0,
                               ambient_temperature=25.0,
                               heat_loss_coefficient=0.0,
                               ambient_humidity=1.0, wind_speed=0.0)
    _, s_dry, _ = _run(cfg, dry, 60, dt=60.0)
    _, s_wet, _ = _run(cfg, wet, 60, dt=60.0)
    np.testing.assert_allclose(np.asarray(s_wet.temperature), 25.0,
                               atol=1e-9)
    T_dry = np.asarray(s_dry.temperature)
    # energy argument: the mixing time (~47 s) is far below the 1 h
    # horizon, so the latent loss q * A_cross spreads tank-wide — the
    # MEAN temperature drop is q A_cross t / (rho cp V_total)
    pp = params.phase
    q = float(PH.evaporative_cooling_flux(
        np.float64(25.0), np.float64(25.0), np.float64(0.1),
        np.float64(4.0), jax.tree_util.tree_map(np.float64, pp)))
    a_cross = 1.0 / 2.0                                   # V/H [m^2]
    dT_est = q * a_cross / (c.WATER_DENSITY_20C * c.WATER_CP * 1.0) \
        * 3600.0
    drop = 25.0 - T_dry.mean()
    assert 0.8 * dT_est < drop < 1.2 * dT_est
    # only the surface zone is cooled directly (no mixing path here:
    # evaporation makes the top COLD and DENSE -> but stratification is
    # disabled in _config, so exchange still spreads it; top must be
    # coldest)
    assert T_dry[-1] == T_dry.min()


def test_ice_lid_blocks_gas_exchange():
    """enable_gas + enable_phase: a frozen surface zone shuts off the
    two-film O2 transfer; the same undersaturated tank with a liquid
    surface re-aerates."""
    def run(T_top):
        cfg = _config(n_zones=3, enable_gas=True, temperature=4.0)
        params = R.make_params(cfg, dtype=F64)
        s = R.make_initial_state(cfg, dtype=F64)
        T0 = np.asarray([4.0, 4.0, T_top])
        s = R._update_derived(R.ReactorState(
            time=s.time, pH=s.pH, chlorine=s.chlorine,
            temperature=jnp.asarray(T0), flow_rate=s.flow_rate,
            oxygen=jnp.full((3,), 5.0), carbonate=s.carbonate))
        bc = R.BoundaryConditions(inlet_flow_rate=0.0, ambient_humidity=1.0,
                                  ambient_temperature=T_top)
        step = jax.jit(lambda st: R.step(params, st, bc, dt=60.0,
                                         substeps=8))
        for _ in range(30):
            s = step(s)
        return np.asarray(s.oxygen)

    o2_frozen = run(-5.0)
    o2_liquid = run(4.0)
    assert o2_liquid[-1] - 5.0 > 0.05          # re-aerating
    assert abs(o2_frozen[-1] - 5.0) < 1e-3     # sealed under the lid


def test_freezing_point_depression_parameter():
    pp = R.make_params(_config(
        phase_params=dict(solute_molality=1.0)), dtype=F64).phase
    assert abs(float(pp.t_freeze) + 1.86) < 1e-12


def test_gradient_through_freezing_plateau():
    """The phase path stays differentiable: d(final top T)/d(U) through a
    trajectory that enters the mushy band is finite and negative (more
    loss -> colder)."""
    cfg = _config(temperature=1.0, phase_params=dict(k_evap=0.0))
    params = R.make_params(cfg, dtype=F64)
    state = R.make_initial_state(cfg, dtype=F64)

    def final_T(u):
        bc = R.BoundaryConditions(inlet_flow_rate=0.0,
                                  ambient_temperature=-20.0,
                                  heat_loss_coefficient=u,
                                  ambient_humidity=1.0)
        s, _ = R.rollout(params, state, bc, dt=60.0, substeps=8,
                         n_steps=40, record=False)
        return s.temperature[-1]

    g = float(jax.grad(final_T)(jnp.float64(400.0)))
    t_end = float(final_T(jnp.float64(400.0)))
    assert -0.5 <= t_end <= 0.0          # ends inside the band
    assert np.isfinite(g) and g < 0.0


def test_zone_sharded_spmd_matches_single_device():
    """The halo-exchanged SPMD step reproduces the single-device engine
    bit-exactly with the phase axis on (mobility and mixture density are
    interface-local, evaporation rides the outlet mask)."""
    from ics_wt_physicsengine_tpu.parallel import (
        make_zone_mesh, shard_state_zones, zone_sharded_step)

    cfg = R.ReactorConfiguration(
        volume=1000, height=2.0, diameter=0.798, n_zones=16,
        flow_rate=2.0, temperature=3.0, enable_phase=True)
    params = R.make_params(cfg, dtype=F64)
    s0 = R.make_initial_state(cfg, dtype=F64)
    # gradient spanning frozen / mushy / liquid so every branch is live
    s0 = R._update_derived(R.ReactorState(
        time=s0.time, pH=s0.pH, chlorine=s0.chlorine,
        temperature=jnp.asarray(np.linspace(-3.0, 8.0, 16)),
        flow_rate=s0.flow_rate))
    bc = R.BoundaryConditions(inlet_flow_rate=2.0, inlet_temperature=6.0,
                              ambient_temperature=-15.0,
                              heat_loss_coefficient=200.0,
                              ambient_humidity=0.4, wind_speed=2.0)

    ref = s0
    step1 = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=4))
    for _ in range(10):
        ref = step1(params, ref, bc)

    mesh = make_zone_mesh(8)
    st = shard_state_zones(s0, mesh)
    fn = zone_sharded_step(mesh, n_zones=16, dt=1.0, substeps=4)
    for _ in range(10):
        st = fn(params, st, bc)

    # Temperature matches to <=2 ULP rather than bit-exactly: the phase
    # axis adds a fused sink expression ((dT - loss - evap) / c_eff) whose
    # FMA grouping XLA selects differently between the plain-jit and
    # shard_map programs (verified: each term alone IS bit-exact; the
    # 8.9e-16 residual appears only with both present, independent of
    # association order in the source). Everything the temperature feeds
    # (chlorine, pH) stays bit-exact below.
    np.testing.assert_allclose(np.asarray(st.temperature),
                               np.asarray(ref.temperature),
                               rtol=0.0, atol=5e-15)
    np.testing.assert_array_equal(np.asarray(st.chlorine),
                                  np.asarray(ref.chlorine))
    np.testing.assert_array_equal(np.asarray(st.pH), np.asarray(ref.pH))


def test_monte_carlo_batch_with_phase():
    """A vmapped Monte-Carlo batch traces cleanly with the phase axis on
    (phase params are [B] leaves like every other parameter)."""
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)

    base = _config(n_zones=4, flow_rate=5.0)
    params, state = make_monte_carlo_batch(base, 6, seed=0, dtype=F64)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0,
                              ambient_temperature=-10.0,
                              heat_loss_coefficient=300.0)
    step = jax.jit(lambda p, s: R.step(p, s, bc, dt=60.0, substeps=4))
    out = step(params, state)
    assert out.temperature.shape == (6, 4)
    assert bool(np.all(np.isfinite(np.asarray(out.temperature))))
