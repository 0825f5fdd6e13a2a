"""Zone-axis model parallelism: the halo-exchanged SPMD step must reproduce
the single-device engine exactly (same floating-point operations per zone,
just distributed), on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.parallel import (
    make_zone_mesh,
    shard_state_zones,
    zone_sharded_rollout,
    zone_sharded_step,
)

BC = R.BoundaryConditions(
    inlet_flow_rate=5.0, inlet_pH=7.5, inlet_chlorine=0.4,
    acid_flow_rate=0.2, chlorine_flow_rate=0.1,
    inlet_temperature=26.0, ambient_temperature=10.0,
    heat_loss_coefficient=50.0)


def _stratified_state(cfg, dtype):
    """Initial state with zone gradients so stratification suppression and
    every stencil term are active."""
    z = cfg.n_zones
    s = R.make_initial_state(cfg, dtype=dtype)
    s = R.ReactorState(
        time=s.time,
        pH=s.pH + np.linspace(0, 0.3, z).astype(dtype),
        chlorine=s.chlorine + np.linspace(0, 0.5, z).astype(dtype),
        temperature=s.temperature + np.linspace(0, 5.0, z).astype(dtype),
        flow_rate=s.flow_rate)
    return R._update_derived(s)


@pytest.fixture(scope="module")
def cfg16():
    return R.ReactorConfiguration(
        volume=1000, height=2.0, diameter=0.798, n_zones=16,
        flow_rate=5.0, initial_pH=7.2, initial_chlorine=2.0,
        temperature=20.0)


def test_zone_sharded_step_matches_single_device(cfg16):
    params = R.make_params(cfg16, dtype=jnp.float64)
    state0 = _stratified_state(cfg16, jnp.float64)

    ref = state0
    step1 = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=4))
    for _ in range(10):
        ref = step1(params, ref, BC)

    mesh = make_zone_mesh(8)
    st = shard_state_zones(state0, mesh)
    fn = zone_sharded_step(mesh, n_zones=16, dt=1.0, substeps=4)
    for _ in range(10):
        st = fn(params, st, BC)

    # Same per-zone arithmetic, just distributed: bit-exact in f64.
    np.testing.assert_array_equal(np.asarray(st.pH), np.asarray(ref.pH))
    np.testing.assert_array_equal(np.asarray(st.chlorine),
                                  np.asarray(ref.chlorine))
    np.testing.assert_array_equal(np.asarray(st.temperature),
                                  np.asarray(ref.temperature))


def test_zone_sharded_rollout_matches_single_device(cfg16):
    params = R.make_params(cfg16, dtype=jnp.float64)
    state0 = _stratified_state(cfg16, jnp.float64)

    ref, _ = jax.jit(lambda p, s, b: R.rollout(
        p, s, b, dt=1.0, substeps=4, n_steps=25, record=False))(
            params, state0, BC)

    mesh = make_zone_mesh(8)
    roll = zone_sharded_rollout(mesh, n_zones=16, dt=1.0, substeps=4,
                                n_steps=25)
    st = roll(params, shard_state_zones(state0, mesh), BC)
    np.testing.assert_array_equal(np.asarray(st.pH), np.asarray(ref.pH))
    assert float(st.time) == pytest.approx(25.0)


def test_zone_sharded_batched_plants(cfg16):
    """[plants, zones] state with the zone axis sharded: broadcasting of the
    masks and halos over the leading batch axis."""
    params = R.make_params(cfg16, dtype=jnp.float64)
    s1 = _stratified_state(cfg16, jnp.float64)
    batch = R.ReactorState(
        time=s1.time,
        pH=jnp.stack([s1.pH, s1.pH + 0.2]),
        chlorine=jnp.stack([s1.chlorine, s1.chlorine * 0.5]),
        temperature=jnp.stack([s1.temperature, s1.temperature + 2.0]),
        flow_rate=s1.flow_rate)
    batch = R._update_derived(batch)

    ref = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=4))(
        params, batch, BC)

    mesh = make_zone_mesh(8)
    fn = zone_sharded_step(mesh, n_zones=16, dt=1.0, substeps=4,
                           state_ndim=2)
    st = fn(params, shard_state_zones(batch, mesh), BC)
    assert st.pH.shape == (2, 16)
    np.testing.assert_array_equal(np.asarray(st.pH), np.asarray(ref.pH))


def test_zone_count_must_divide_mesh(cfg16):
    mesh = make_zone_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        zone_sharded_step(mesh, n_zones=20, dt=1.0, substeps=2)


def test_single_shard_degenerates_to_plain_step(cfg16):
    """A 1-device zone mesh must also match (mirror-ghost edges only)."""
    params = R.make_params(cfg16, dtype=jnp.float64)
    state0 = _stratified_state(cfg16, jnp.float64)
    ref = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=2))(
        params, state0, BC)
    mesh = make_zone_mesh(1)
    fn = zone_sharded_step(mesh, n_zones=16, dt=1.0, substeps=2)
    st = fn(params, shard_state_zones(state0, mesh), BC)
    np.testing.assert_array_equal(np.asarray(st.pH), np.asarray(ref.pH))


def test_masked_derivatives_match_default_layout(cfg16):
    """The mask formulation of derivatives (used by the sharded path) is
    numerically identical to the canonical .at[0]/.at[-1] layout."""
    params = R.make_params(cfg16, dtype=jnp.float64)
    s = _stratified_state(cfg16, jnp.float64)
    d_ref = R.derivatives(params, s.pH, s.chlorine, s.temperature, BC)

    z = cfg16.n_zones
    pos = jnp.arange(z)
    inlet = (pos == 0).astype(jnp.float64)
    outlet = (pos == z - 1).astype(jnp.float64)
    d_mask = R.derivatives(params, s.pH, s.chlorine, s.temperature, BC,
                           inlet_mask=inlet, outlet_mask=outlet)
    for a, b in zip(d_ref, d_mask):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-15)


def test_plant_zone_2d_mesh(cfg16):
    """Combined dp x sp: Monte-Carlo plant batch sharded over plants while
    each plant's zone axis is split across the zone mesh dimension."""
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)
    from ics_wt_physicsengine_tpu.parallel import (
        make_plant_zone_mesh, plant_zone_sharded_step, shard_batch_zones)

    params, state = make_monte_carlo_batch(cfg16, 4, seed=3,
                                           dtype=jnp.float64)
    ref = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=4))(
        params, state, BC)

    mesh = make_plant_zone_mesh(2, 4)
    fn = plant_zone_sharded_step(mesh, n_zones=16, dt=1.0, substeps=4,
                                 params_example=params)
    out = fn(shard_batch_zones(params, mesh), shard_batch_zones(state, mesh),
             BC)
    assert out.pH.shape == (4, 16)
    np.testing.assert_array_equal(np.asarray(out.pH), np.asarray(ref.pH))
    np.testing.assert_array_equal(np.asarray(out.chlorine),
                                  np.asarray(ref.chlorine))


def test_plant_zone_mesh_device_count():
    from ics_wt_physicsengine_tpu.parallel import make_plant_zone_mesh
    with pytest.raises(ValueError, match="need 16 devices"):
        make_plant_zone_mesh(4, 4)


def test_zone_sharded_rkc(cfg16):
    """RKC2 through the halo-exchanged SPMD step: still bit-exact vs the
    single-device RKC path (the stage recurrence adds no cross-shard
    coupling beyond the same per-stage halo exchange)."""
    params = R.make_params(cfg16, dtype=jnp.float64)
    state0 = _stratified_state(cfg16, jnp.float64)
    m, s = R.default_rkc_plan(cfg16, 1.0, mode="fast")

    ref, _ = jax.jit(lambda p, st, b: R.rollout(
        p, st, b, dt=1.0, substeps=m, stages=s, n_steps=20,
        record=False))(params, state0, BC)

    mesh = make_zone_mesh(8)
    roll = zone_sharded_rollout(mesh, n_zones=16, dt=1.0, substeps=m,
                                stages=s, n_steps=20)
    out = roll(params, shard_state_zones(state0, mesh), BC)
    # ULP-level only: XLA's fusion/FMA choices differ between the [2]-wide
    # shard chunks and the [16]-wide single-device arrays in the RKC linear
    # stage combination (RK4's simpler weighted sum fuses identically).
    np.testing.assert_allclose(np.asarray(out.pH), np.asarray(ref.pH),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.chlorine),
                               np.asarray(ref.chlorine), rtol=0, atol=1e-12)


def _particle_cfg(n_zones=16):
    return R.ReactorConfiguration(
        volume=1000, height=2.0, diameter=0.798, n_zones=n_zones,
        flow_rate=5.0, initial_pH=7.2, initial_chlorine=2.0,
        temperature=20.0, enable_particles=True, initial_tss=25.0)


PARTICLE_BC = R.BoundaryConditions(
    inlet_flow_rate=5.0, inlet_pH=7.5, inlet_chlorine=0.4,
    inlet_temperature=26.0, inlet_tss=40.0, coagulant_dose=20.0,
    filter_flow_rate=2.0, sludge_blowdown=1e-5)


def test_zone_sharded_particles_match_single_device():
    """Particle classes ([C, Z] tss + replicated [C] sludge inventory)
    through the halo-exchanged SPMD step: settling crosses shard edges via
    the same ghost zones, the deposit lands on the bottom-owning shard, and
    the psum'd sludge tendency reproduces the single-device trajectory to
    ULP level in f64 (the masked outlet/filtration terms sum in a different
    order than the dense path's .at[-1] updates, so exact bit-matching is
    not expected here, unlike the mask-free primary-species tests above)."""
    cfg = _particle_cfg()
    params = R.make_params(cfg, dtype=jnp.float64)
    state0 = _stratified_state_particles(cfg, jnp.float64)

    ref = state0
    step1 = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=4))
    for _ in range(10):
        ref = step1(params, ref, PARTICLE_BC)

    mesh = make_zone_mesh(8)
    st = shard_state_zones(state0, mesh)
    fn = zone_sharded_step(mesh, n_zones=16, dt=1.0, substeps=4,
                           particles=True)
    for _ in range(10):
        st = fn(params, st, PARTICLE_BC)

    for f in ("pH", "chlorine", "temperature", "tss", "sludge"):
        np.testing.assert_allclose(
            np.asarray(getattr(st, f)), np.asarray(getattr(ref, f)),
            rtol=1e-13, atol=1e-13, err_msg=f)
    # the processes actually ran: sludge accumulated from settling
    assert float(jnp.sum(ref.sludge)) > float(jnp.sum(state0.sludge))


def _stratified_state_particles(cfg, dtype):
    """Stratified initial state carrying a zone-graded TSS profile so the
    settling stencil moves mass across every shard boundary."""
    s = _stratified_state(cfg, dtype)
    base = R.make_initial_state(cfg, dtype=dtype)
    z = cfg.n_zones
    tss = base.tss * (1.0 + jnp.linspace(0.0, 1.0, z, dtype=dtype))
    import dataclasses
    return dataclasses.replace(s, tss=tss, sludge=base.sludge)


def test_zone_sharded_particles_rollout(cfg16):
    """Scan-inside-shard_map variant with particles enabled."""
    cfg = _particle_cfg()
    params = R.make_params(cfg, dtype=jnp.float64)
    state0 = _stratified_state_particles(cfg, jnp.float64)

    ref, _ = jax.jit(lambda p, s, b: R.rollout(
        p, s, b, dt=1.0, substeps=4, n_steps=15, record=False))(
            params, state0, PARTICLE_BC)

    mesh = make_zone_mesh(8)
    roll = zone_sharded_rollout(mesh, n_zones=16, dt=1.0, substeps=4,
                                n_steps=15, particles=True)
    st = roll(params, shard_state_zones(state0, mesh), PARTICLE_BC)
    np.testing.assert_array_equal(np.asarray(st.tss), np.asarray(ref.tss))
    np.testing.assert_array_equal(np.asarray(st.sludge),
                                  np.asarray(ref.sludge))


def test_plant_zone_2d_mesh_particles():
    """dp x sp with the particle classes: per-plant [plants, C] particle
    params shard over plants only, tss shards [plants, :, zones], the
    sludge inventory replicates across the zone dimension."""
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)
    from ics_wt_physicsengine_tpu.parallel import (
        make_plant_zone_mesh, plant_zone_sharded_step, shard_batch_zones)

    cfg = _particle_cfg()
    params, state = make_monte_carlo_batch(cfg, 4, seed=5,
                                           dtype=jnp.float64)
    ref = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=4))(
        params, state, PARTICLE_BC)

    mesh = make_plant_zone_mesh(2, 4)
    fn = plant_zone_sharded_step(mesh, n_zones=16, dt=1.0, substeps=4,
                                 params_example=params, particles=True)
    out = fn(shard_batch_zones(params, mesh),
             shard_batch_zones(state, mesh), PARTICLE_BC)
    assert out.tss.shape == ref.tss.shape
    np.testing.assert_array_equal(np.asarray(out.pH), np.asarray(ref.pH))
    np.testing.assert_array_equal(np.asarray(out.tss), np.asarray(ref.tss))
    np.testing.assert_array_equal(np.asarray(out.sludge),
                                  np.asarray(ref.sludge))


def test_zone_sharded_gas_matches_single_device():
    """Gas species (O2/C_T) halo-exchange across the zone shards; the
    surface transfer lands on the TOP zone via the outlet mask (last
    shard), reproducing the single-device trajectory exactly."""
    cfg = R.ReactorConfiguration(
        volume=1000, height=2.0, diameter=0.798, n_zones=16,
        flow_rate=5.0, initial_pH=7.2, initial_chlorine=2.0,
        temperature=20.0, enable_gas=True, initial_oxygen=5.0,
        gas_params={"kl_surface": 2e-4})
    params = R.make_params(cfg, dtype=jnp.float64)
    state0 = R.make_initial_state(cfg, dtype=jnp.float64)
    bc = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.5, inlet_oxygen=7.0,
        aeration_kla=1e-3, inlet_temperature=22.0)

    ref = state0
    step1 = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=4))
    for _ in range(10):
        ref = step1(params, ref, bc)

    mesh = make_zone_mesh(8)
    st = shard_state_zones(state0, mesh)
    fn = zone_sharded_step(mesh, n_zones=16, dt=1.0, substeps=4, gas=True)
    for _ in range(10):
        st = fn(params, st, bc)

    for f in ("pH", "chlorine", "temperature", "oxygen", "carbonate"):
        np.testing.assert_allclose(
            np.asarray(getattr(st, f)), np.asarray(getattr(ref, f)),
            rtol=0, atol=0, err_msg=f)
    # the surface transfer actually moved O2 toward saturation at the top
    assert float(ref.oxygen[-1]) > float(state0.oxygen[-1])


def test_zone_sharded_disinfection_matches_single_device():
    """Disinfection axis through the halo-exchanged SPMD step: pathogen
    classes ([P, Z]) ride the tss layout, the advected CT/age/TOC/THM
    scalars the gas layout, and the step-level UV operator split lands on
    the outlet-owning shard via the local uv_mask — reproducing the
    single-device trajectory (kill + credit + shading) to f64 tolerance."""
    cfg = R.ReactorConfiguration(
        volume=1000, height=2.0, diameter=0.798, n_zones=16,
        flow_rate=5.0, initial_pH=7.2, initial_chlorine=2.0,
        temperature=20.0, enable_disinfection=True,
        initial_pathogens=1e4, initial_toc=3.0)
    params = R.make_params(cfg, dtype=jnp.float64)
    state0 = R.make_initial_state(cfg, dtype=jnp.float64)
    bc = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.5, inlet_chlorine=0.5,
        inlet_pathogens=5e4, inlet_toc=4.0, uv_intensity=3.0)

    ref = state0
    step1 = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=4))
    for _ in range(10):
        ref = step1(params, ref, bc)

    mesh = make_zone_mesh(8)
    st = shard_state_zones(state0, mesh)
    fn = zone_sharded_step(mesh, n_zones=16, dt=1.0, substeps=4,
                           disinfection=True)
    for _ in range(10):
        st = fn(params, st, bc)

    for f in ("pH", "chlorine", "temperature", "pathogens", "ct", "age",
              "toc", "thm"):
        np.testing.assert_allclose(
            np.asarray(getattr(st, f)), np.asarray(getattr(ref, f)),
            rtol=1e-13, atol=1e-13, err_msg=f)
    # the UV bank actually fired: outlet-zone crypto is below the mixed
    # field everywhere else
    assert float(ref.pathogens[2, -1]) < float(ref.pathogens[2, 0])


def test_zone_sharded_disinfection_rollout_and_2d_mesh():
    """Scan-inside-shard_map and dp x sp variants with disinfection on."""
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)
    from ics_wt_physicsengine_tpu.parallel import (
        make_plant_zone_mesh, plant_zone_sharded_step, shard_batch_zones)

    cfg = R.ReactorConfiguration(
        volume=1000, height=2.0, diameter=0.798, n_zones=16,
        flow_rate=5.0, initial_pH=7.2, initial_chlorine=2.0,
        temperature=20.0, enable_disinfection=True,
        initial_pathogens=1e4, initial_toc=3.0)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pathogens=5e4,
                              inlet_toc=4.0, uv_intensity=2.0)

    params = R.make_params(cfg, dtype=jnp.float64)
    state0 = R.make_initial_state(cfg, dtype=jnp.float64)
    ref, _ = jax.jit(lambda p, s, b: R.rollout(
        p, s, b, dt=1.0, substeps=4, n_steps=15, record=False))(
            params, state0, bc)
    mesh = make_zone_mesh(8)
    roll = zone_sharded_rollout(mesh, n_zones=16, dt=1.0, substeps=4,
                                n_steps=15, disinfection=True)
    st = roll(params, shard_state_zones(state0, mesh), bc)
    np.testing.assert_allclose(np.asarray(st.pathogens),
                               np.asarray(ref.pathogens),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(st.ct), np.asarray(ref.ct),
                               rtol=1e-13, atol=1e-13)

    bparams, bstate = make_monte_carlo_batch(cfg, 4, seed=7,
                                             dtype=jnp.float64)
    bref = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=4))(
        bparams, bstate, bc)
    mesh2 = make_plant_zone_mesh(2, 4)
    fn = plant_zone_sharded_step(mesh2, n_zones=16, dt=1.0, substeps=4,
                                 params_example=bparams,
                                 disinfection=True)
    out = fn(shard_batch_zones(bparams, mesh2),
             shard_batch_zones(bstate, mesh2), bc)
    assert out.pathogens.shape == bref.pathogens.shape
    np.testing.assert_allclose(np.asarray(out.pathogens),
                               np.asarray(bref.pathogens),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(out.thm), np.asarray(bref.thm),
                               rtol=1e-13, atol=1e-13)
