"""
Connected multi-reactor networks (core/network.py) — the reference
roadmap's "Multi-reactor networks" row (reference README.md:447; no
reference implementation exists, so the oracle is the framework's own
single-reactor physics driven with hand-chained boundary schedules).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ics_wt_physicsengine_tpu as wt
from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.core import network as N

F64 = np.float64


def _series_topo(delay=1):
    # plant 0 -> plant 1, full flow
    return wt.NetworkTopology(routing=np.array([[0.0, 0.0], [1.0, 0.0]]),
                              delay_steps=delay)


@pytest.mark.parametrize("delay", [1, 3])
def test_series_matches_scheduled_single_reactor_oracle(delay):
    """A 2-plant series network must reproduce, exactly, plant B run
    standalone with a boundary schedule hand-built from plant A's recorded
    outlet (shifted by the pipe delay). This pins the coupling semantics:
    step k of B sees A's post-step-(k - delay) outlet."""
    cfg = wt.ReactorConfiguration(n_zones=5)
    topo = _series_topo(delay)
    params, ns = N.make_network(cfg, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)

    n_steps = 40
    bc = wt.BoundaryConditions(
        inlet_flow_rate=np.array([5.0, 0.0]),
        inlet_pH=7.8, inlet_chlorine=1.5, inlet_temperature=25.0,
        acid_flow_rate=np.array([0.3, 0.0]), acid_concentration=0.05,
        chlorine_flow_rate=np.array([0.2, 0.0]),
        chlorine_concentration=40.0)
    roll = jax.jit(functools.partial(
        N.rollout_network, dt=2.0, substeps=4, n_steps=n_steps))
    _, traj = roll(params, ta, ns, bc)

    # --- oracle: A standalone, then B standalone on A's shifted outlet ---
    pa = R.make_params(cfg, dtype=F64)
    sa = R.make_initial_state(cfg, dtype=F64)
    bc_a = wt.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.8, inlet_chlorine=1.5,
        inlet_temperature=25.0, acid_flow_rate=0.3, acid_concentration=0.05,
        chlorine_flow_rate=0.2, chlorine_concentration=40.0)
    _, traj_a = jax.jit(functools.partial(
        R.rollout, dt=2.0, substeps=4, n_steps=n_steps))(pa, sa, bc_a)

    np.testing.assert_allclose(np.asarray(traj["pH"][:, 0]),
                               np.asarray(traj_a["pH"]), rtol=0, atol=1e-12)

    def shifted(series, init):
        # B's step-k inlet = A's post-step-(k-delay) outlet
        hist = np.concatenate([np.full(delay, init),
                               np.asarray(series)[:-delay]])
        return hist

    q_a = 5.0 + 0.3 + 0.2    # A's outflow = its total inflow
    sched = wt.BoundaryConditions(
        inlet_flow_rate=np.full(n_steps, q_a),
        inlet_pH=shifted(traj_a["pH"][:, -1], float(np.asarray(sa.pH[-1]))),
        inlet_chlorine=shifted(traj_a["chlorine"][:, -1],
                               float(np.asarray(sa.chlorine[-1]))),
        inlet_temperature=shifted(traj_a["temperature"][:, -1],
                                  float(np.asarray(sa.temperature[-1]))),
        acid_flow_rate=0.0, chlorine_flow_rate=0.0)
    _, traj_b = jax.jit(functools.partial(
        R.rollout_scheduled, dt=2.0, substeps=4))(pa, sa, sched)

    # pH passes through one 10**-x / -log10 round trip in the blender
    np.testing.assert_allclose(np.asarray(traj["pH"][:, 1]),
                               np.asarray(traj_b["pH"]), rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(traj["chlorine"][:, 1]),
                               np.asarray(traj_b["chlorine"]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(traj["temperature"][:, 1]),
                               np.asarray(traj_b["temperature"]),
                               rtol=1e-12, atol=1e-12)


def test_recirculation_hydraulics():
    """Recycle loop 1 -> 0 at 30%: flows solve the fixed point
    q = ext + dose + W q (spectral radius < 1)."""
    W = np.array([[0.0, 0.3], [1.0, 0.0]])
    topo = wt.NetworkTopology(routing=W)
    ext = np.array([4.0, 0.0])
    dose = np.array([0.1, 0.2])
    q = np.linalg.solve(np.eye(2) - W, ext + dose)
    got = topo.resolvent() @ (ext + dose)
    np.testing.assert_allclose(got, q, rtol=1e-12)
    # loop gain 0.3: plant 0 sees its own effluent amplified by 1/(1-0.3)
    assert q[0] == pytest.approx((4.0 + 0.1 + 0.3 * 0.2) / 0.7)

    # the in-graph step uses the same flows
    cfg = wt.ReactorConfiguration(n_zones=4)
    params, ns = N.make_network(cfg, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)
    bc = wt.BoundaryConditions(
        inlet_flow_rate=ext, acid_flow_rate=np.array([0.1, 0.0]),
        chlorine_flow_rate=np.array([0.0, 0.2]))
    ns2 = jax.jit(functools.partial(N.network_step, dt=1.0, substeps=4))(
        params, ta, ns, bc)
    np.testing.assert_allclose(np.asarray(ns2.reactor.flow_rate),
                               q, rtol=1e-9)


def test_single_plant_network_identity():
    """A 1-plant network with no edges is the standalone reactor: the
    blender + ring machinery must be an exact pass-through of the external
    boundary (bit-level, f64)."""
    cfg = wt.ReactorConfiguration(n_zones=6)
    topo = wt.NetworkTopology(routing=np.zeros((1, 1)))
    params, ns = N.make_network(cfg, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)
    bc = wt.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.6,
                               inlet_chlorine=1.0, inlet_temperature=22.0,
                               chlorine_flow_rate=0.15,
                               chlorine_concentration=60.0)
    fs, traj = jax.jit(functools.partial(
        N.rollout_network, dt=1.0, substeps=4, n_steps=25))(
            params, ta, ns, bc)

    pa = R.make_params(cfg, dtype=F64)
    sa = R.make_initial_state(cfg, dtype=F64)
    _, traj_ref = jax.jit(functools.partial(
        R.rollout, dt=1.0, substeps=4, n_steps=25))(pa, sa, bc)

    # pH passes through one 10**-x / -log10 round trip in the blender
    np.testing.assert_allclose(np.asarray(traj["pH"][:, 0]),
                               np.asarray(traj_ref["pH"]), rtol=0,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(traj["chlorine"][:, 0]),
                               np.asarray(traj_ref["chlorine"]),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(traj["temperature"][:, 0]),
                               np.asarray(traj_ref["temperature"]),
                               rtol=1e-13, atol=1e-13)


def test_topology_validation():
    with pytest.raises(ValueError, match="spectral radius"):
        wt.NetworkTopology(routing=np.array([[0.0, 1.0], [1.0, 0.0]]))
    with pytest.raises(ValueError, match="more than 100%"):
        wt.NetworkTopology(routing=np.array([[0.0, 0.0, 0.0],
                                             [0.8, 0.0, 0.0],
                                             [0.5, 0.0, 0.0]]))
    with pytest.raises(ValueError, match="delays must be >= 1"):
        wt.NetworkTopology(routing=np.array([[0.0, 0.0], [1.0, 0.0]]),
                           delay_steps=np.array([[1, 1], [0, 1]]))
    with pytest.raises(ValueError, match="fractions"):
        wt.NetworkTopology(routing=np.array([[0.0, -0.1], [0.5, 0.0]]))


def test_heterogeneous_stage_volumes():
    """A small contact tank feeding a large clearwell: per-stage configs
    stack, and the big tank responds more slowly to the same inlet step."""
    topo = _series_topo()
    def cfg_vol(v):  # keep the cylinder geometry consistent with volume
        import math
        h = v / 1000.0 / (math.pi * (0.798 / 2) ** 2)
        return wt.ReactorConfiguration(n_zones=5, volume=v, height=h)

    cfgs = [cfg_vol(500.0), cfg_vol(5000.0)]
    params, ns = N.make_network(cfgs, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)
    bc = wt.BoundaryConditions(inlet_flow_rate=np.array([8.0, 0.0]),
                               inlet_temperature=30.0)
    fs, _ = jax.jit(functools.partial(
        N.rollout_network, dt=5.0, substeps=8, n_steps=60))(
            params, ta, ns, bc)
    T = np.asarray(fs.reactor.temperature[:, 0])
    # same forcing, 10x the residence time: the 500 L tank has moved an
    # order of magnitude further from its initial 20 C than the 5000 L one
    assert abs(T[0] - 20.0) > 10.0 * abs(T[1] - 20.0) > 0.0

    with pytest.raises(ValueError, match="n_zones"):
        N.make_network([wt.ReactorConfiguration(n_zones=5),
                        wt.ReactorConfiguration(n_zones=6)], topo)


def test_vmap_monte_carlo_batch():
    """vmap over a batch of network realizations == stepping each member
    individually (ensemble UQ over a whole train in one program)."""
    cfg = wt.ReactorConfiguration(n_zones=4)
    topo = _series_topo()
    params, ns0 = N.make_network(cfg, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)

    n_batch = 3
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x),
                                   (n_batch,) + np.shape(x)), ns0)
    cl_in = np.array([0.5, 1.5, 2.5])

    def one(ns, cl):
        bc = wt.BoundaryConditions(
            inlet_flow_rate=jnp.array([5.0, 0.0]), inlet_chlorine=cl)
        return N.network_step(params, ta, ns, bc, dt=1.0, substeps=4)

    out = jax.jit(jax.vmap(one, in_axes=(0, 0)))(batched, jnp.asarray(cl_in))
    for b in range(n_batch):
        ref = one(jax.tree_util.tree_map(lambda x: x[b], batched),
                  jnp.asarray(cl_in[b]))
        np.testing.assert_allclose(np.asarray(out.reactor.chlorine[b]),
                                   np.asarray(ref.reactor.chlorine),
                                   rtol=0, atol=1e-12)


def test_nitrogen_species_routed():
    """With nitrogen chemistry enabled, ammonia dosed into plant A arrives
    in plant B through the pipe (and nowhere else from)."""
    cfg = wt.ReactorConfiguration(n_zones=4, enable_nitrogen=True,
                                  initial_chlorine=0.0)
    topo = _series_topo()
    params, ns = N.make_network(cfg, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)
    bc = wt.BoundaryConditions(
        inlet_flow_rate=np.array([6.0, 0.0]), inlet_chlorine=0.0,
        inlet_ammonia=np.array([4.0, 0.0]))
    fs, _ = jax.jit(functools.partial(
        N.rollout_network, dt=5.0, substeps=8, n_steps=400))(
            params, ta, ns, bc)
    nh = np.asarray(fs.reactor.ammonia)
    assert nh.shape == (2, 4)
    assert nh[0, 0] > 0.1             # A loaded from its external source
    assert 1e-4 < nh[1, 0] < nh[0, 0]  # B loaded only through the pipe


def test_gas_species_routed():
    """With gas exchange enabled, oxygen aerated into plant A arrives in
    plant B through the pipe (B has no aeration and no external source)."""
    cfg = wt.ReactorConfiguration(n_zones=4, enable_gas=True,
                                  initial_oxygen=1.0, initial_chlorine=0.0)
    topo = _series_topo()
    params, ns = N.make_network(cfg, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)
    bc = wt.BoundaryConditions(
        inlet_flow_rate=np.array([6.0, 0.0]), inlet_chlorine=0.0,
        inlet_oxygen=np.array([1.0, 0.0]), inlet_carbonate=2.0,
        aeration_kla=np.array([5e-3, 0.0]))
    fs, _ = jax.jit(functools.partial(
        N.rollout_network, dt=5.0, substeps=8, n_steps=400))(
            params, ta, ns, bc)
    o2 = np.asarray(fs.reactor.oxygen)
    assert o2.shape == (2, 4)
    assert o2[0, -1] > 2.0              # A aerated well above its initial
    assert o2[1, 0] > 1.05              # B rose ONLY through the pipe
    assert np.all(np.isfinite(np.asarray(fs.reactor.carbonate)))


def test_particle_classes_routed_class_resolved():
    """The clarifier-train physics: plant A settles out its coarse solids
    (no dosing — a plain sedimentation basin), so its effluent is
    FINES-ENRICHED relative to the source water; plant B (fed only by the
    pipe) must receive A's actual class split — visible as a finer
    inlet-zone composition in B than the source fractions would give — and
    B's solids must arrive only through the pipe."""
    cfg = wt.ReactorConfiguration(n_zones=4, enable_particles=True,
                                  initial_tss=5.0)
    topo = _series_topo()
    params, ns = N.make_network(cfg, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)
    bc = wt.BoundaryConditions(
        inlet_flow_rate=np.array([6.0, 0.0]),
        inlet_tss=np.array([60.0, 0.0]))        # A clarifies by settling
    fs, _ = jax.jit(functools.partial(
        N.rollout_network, dt=5.0, substeps=8, n_steps=600))(
            params, ta, ns, bc)
    tss = np.asarray(fs.reactor.tss)            # [P, C, Z]
    assert np.all(np.isfinite(tss)) and np.all(tss >= 0.0)

    # B carries solids it could only have gotten through the pipe
    assert tss[1].sum() > 0.5
    # class-resolved piping: B's inlet-zone fine fraction exceeds the
    # source-water fine fraction (A's clarification removed coarse mass)
    src_fine = float(np.asarray(params.particles.inlet_fractions)[0, 0])
    b_split = tss[1, :, 0] / tss[1, :, 0].sum()
    assert b_split[0] > src_fine + 0.05
    # and A's own effluent really is fines-enriched (the physics premise)
    a_split = tss[0, :, -1] / tss[0, :, -1].sum()
    assert a_split[0] > src_fine
    # the upstream basin catches more sludge than the downstream one (it
    # sees the raw coarse load; B only gets what escaped A)
    sl = np.asarray(fs.reactor.sludge)
    assert sl[0].sum() > 1.3 * sl[1].sum() > 0.0


def test_single_plant_network_identity_full_chemistry():
    """The 1-plant pass-through identity with ALL extension species on:
    the blender's gas columns and class-resolved solids must reduce to the
    standalone reactor's external boundary semantics."""
    cfg = wt.ReactorConfiguration(
        n_zones=4, enable_nitrogen=True, enable_gas=True,
        enable_particles=True, enable_biofilm=True, initial_ammonia=0.5,
        initial_oxygen=6.0, initial_tss=15.0, initial_bacteria=1e-3,
        initial_bdoc=0.5)
    topo = wt.NetworkTopology(routing=np.zeros((1, 1)))
    params, ns = N.make_network(cfg, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)
    bc = wt.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.6, inlet_chlorine=1.0,
        inlet_temperature=22.0, inlet_ammonia=1.0, inlet_oxygen=8.0,
        inlet_carbonate=2.5, aeration_kla=1e-3, inlet_tss=30.0,
        coagulant_dose=10.0, filter_flow_rate=1.0, sludge_blowdown=1e-6,
        inlet_bacteria=2e-3, inlet_bdoc=0.8)
    fs, _ = jax.jit(functools.partial(
        N.rollout_network, dt=1.0, substeps=4, n_steps=25))(
            params, ta, ns, bc)

    pa = R.make_params(cfg, dtype=F64)
    sa = R.make_initial_state(cfg, dtype=F64)
    ref, _ = jax.jit(functools.partial(
        R.rollout, dt=1.0, substeps=4, n_steps=25))(pa, sa, bc)

    for f in ("chlorine", "temperature", "ammonia", "oxygen", "carbonate",
              "tss", "sludge", "bacteria", "bdoc", "biofilm"):
        np.testing.assert_allclose(
            np.asarray(getattr(fs.reactor, f))[0],
            np.asarray(getattr(ref, f)), rtol=1e-12, atol=1e-12,
            err_msg=f)
    # pH passes through one 10**-x / -log10 round trip in the blender
    np.testing.assert_allclose(np.asarray(fs.reactor.pH)[0],
                               np.asarray(ref.pH), rtol=0, atol=1e-9)


def test_sharded_plants_bitexact():
    """The P axis sharded over the 8-device mesh: XLA inserts the routing
    collectives; trajectories must match single-device bit-exactly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = wt.ReactorConfiguration(n_zones=4)
    # an 8-plant chain
    W = np.zeros((8, 8))
    for i in range(7):
        W[i + 1, i] = 1.0
    topo = wt.NetworkTopology(routing=W, delay_steps=1)
    params, ns = N.make_network(cfg, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)
    bc = wt.BoundaryConditions(
        inlet_flow_rate=np.array([5.0] + [0.0] * 7), inlet_chlorine=2.5)

    roll = functools.partial(N.rollout_network, dt=1.0, substeps=4,
                             n_steps=12, record=False)
    ref, _ = jax.jit(roll)(params, ta, ns, bc)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("plants",))

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    params_s = jax.tree_util.tree_map(
        lambda x: place(x, P("plants")) if np.ndim(x) >= 1 else x, params)
    ns_s = N.NetworkState(
        reactor=jax.tree_util.tree_map(
            lambda x: place(x, P("plants", *([None] * (np.ndim(x) - 1))))
            if np.ndim(x) >= 1 else place(x, P()), ns.reactor),
        ring=place(ns.ring, P(None, "plants", None)),
        ring_index=place(ns.ring_index, P()))
    got, _ = jax.jit(roll)(params_s, ta, ns_s, bc)

    np.testing.assert_array_equal(np.asarray(ref.reactor.pH),
                                  np.asarray(got.reactor.pH))
    np.testing.assert_array_equal(np.asarray(ref.reactor.chlorine),
                                  np.asarray(got.reactor.chlorine))


def test_multibarrier_disinfection_train():
    """Chlorine contact tank (plant 0) -> UV clearwell (plant 1): the
    routed inlet carries the class-resolved survivors AND the accumulated
    CT / water-age / TOC / THM downstream, so the train's total credit
    composes — the downstream outlet claims more CT and more log-kill
    than the upstream outlet, and only the downstream lamp fires."""
    cfg = wt.ReactorConfiguration(n_zones=4, enable_disinfection=True,
                                  initial_pathogens=0.0,
                                  initial_chlorine=1.0, flow_rate=20.0)
    topo = _series_topo(1)
    params, ns = N.make_network(cfg, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)
    bc = wt.BoundaryConditions(
        inlet_flow_rate=np.array([20.0, 0.0]),
        inlet_chlorine=np.array([2.0, 0.0]),
        inlet_pathogens=np.array([1e5, 0.0]),
        inlet_toc=np.array([3.0, 0.0]),
        uv_intensity=np.array([0.0, 4.0]))
    roll = jax.jit(functools.partial(
        N.rollout_network, dt=30.0, substeps=20, n_steps=2400,
        record=False))  # 20 h >> the ~50 min per-tank time constant
    s, _ = roll(params, ta, ns, bc)
    r = s.reactor
    # Steady balance identity for the DOWNSTREAM tank (flow semantics as
    # in test_disinfection.py::test_steady_cstr_ct_and_age):
    #   q (ct_0 + ct_out) = q ct_in + sum(Cl)/60
    # with ct_in = the upstream outlet credit — exact only if the routing
    # actually carries CT downstream (ct_in = 0 misses by ~ct[0,-1]).
    q = 20.0 / 60.0 / 1000.0
    ct_in = float(r.ct[0, -1])
    assert ct_in > 10.0
    lhs = q * (float(r.ct[1, 0]) + float(r.ct[1, -1]))
    rhs = q * ct_in + float(jnp.sum(r.chlorine[1])) / 60.0
    np.testing.assert_allclose(lhs, rhs, rtol=2e-3)
    assert abs(lhs - rhs) < 0.2 * q * ct_in  # routing is load-bearing
    # same identity for water age (source 1 s/s in each of the 4 zones)
    lhs_a = q * (float(r.age[1, 0]) + float(r.age[1, -1]))
    rhs_a = q * float(r.age[0, -1]) + 4.0
    np.testing.assert_allclose(lhs_a, rhs_a, rtol=2e-3)
    # survivors shrink through every barrier (crypto: UV does the work)
    up = float(r.pathogens[0, 2, -1])
    down = float(r.pathogens[1, 2, -1])
    assert 0.0 <= down < 0.1 * up and up > 0.0
    # THMs formed upstream arrive downstream
    assert float(r.thm[1, -1]) > 0.3 * float(r.thm[0, -1]) > 0.0

def test_regrowth_propagates_downstream():
    """Distribution pair with no residual: plant A is seeded by its source
    water (bacteria + BDOC); plant B has NO external inflow, so any
    planktonic biomass or substrate it holds arrived through the pipe —
    and B's wall film, starting sterile, colonizes from that piped
    biomass. The film itself is attached and must NOT be piped."""
    cfg = wt.ReactorConfiguration(n_zones=4, enable_biofilm=True,
                                  initial_chlorine=0.0,
                                  initial_bacteria=0.0, initial_bdoc=0.0,
                                  initial_biofilm=0.0)
    topo = _series_topo()
    params, ns = N.make_network(cfg, topo, dtype=F64)
    ta = N.topology_arrays(topo, F64)
    bc = wt.BoundaryConditions(
        inlet_flow_rate=np.array([6.0, 0.0]), inlet_chlorine=0.0,
        inlet_bacteria=np.array([1e-3, 0.0]),
        inlet_bdoc=np.array([1.0, 0.0]))
    fs, _ = jax.jit(functools.partial(
        N.rollout_network, dt=60.0, substeps=8, n_steps=3000,
        record=False))(params, ta, ns, bc)   # ~50 h of plant time
    r = fs.reactor
    x = np.asarray(r.bacteria)
    s = np.asarray(r.bdoc)
    b = np.asarray(r.biofilm)
    assert np.all(np.isfinite(x)) and np.all(x >= 0.0)
    # A loaded from its external source; B only through the pipe
    assert x[0, -1] > 1e-4
    assert 1e-5 < x[1, 0] < 2.0 * x[0, -1]
    assert s[1, 0] > 0.05
    # B's wall film colonized from piped bacteria (sterile start, no
    # external seed) — attachment is load-bearing through the routing
    assert b[1, 0] > 1e-6
    # the film is attached: a sanity magnitude check that B's film grew
    # from ATTACHMENT of piped bulk biomass, not from a piped film (the
    # ring carries only 2 biofilm-axis columns — shape-checked here)
    assert fs.ring.shape[-1] == N._n_species(r)
