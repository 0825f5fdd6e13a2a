"""
Differentiability of the physics engine: ``jax.grad`` through steps,
rollouts, and the instrumented plant.

The reference (scipy ``solve_ivp`` Radau, reference core/reactor.py:476-484)
is a black-box compiled solver — no gradients exist. Here the whole rollout
is a composition of jnp primitives, so reverse-mode AD through it is free,
enabling gradient-based model calibration / parameter estimation
(examples/parameter_estimation.py) and sensitivity analysis.

These tests pin that capability:
  - gradients w.r.t. physical parameters are finite and match finite
    differences (the AD-correctness oracle),
  - gradients flow through the stratification (Richardson suppression) path,
  - gradients flow through the full instrumented plant step (sensor suite),
  - a gradient-descent fit recovers a perturbed decay constant from
    trajectory data (end-to-end calibration).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import reactor as R


def _setup(n_zones=4, dtype=jnp.float64, **cfg):
    config = R.ReactorConfiguration(n_zones=n_zones, **cfg)
    params = R.make_params(config, dtype=dtype)
    state = R.make_initial_state(config, dtype=dtype)
    bc = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.2, inlet_chlorine=0.5,
        inlet_temperature=26.0, acid_flow_rate=0.05,
        ambient_temperature=15.0, heat_loss_coefficient=50.0)
    return config, params, state, bc


def _loss_of_kref(params, state, bc, n_steps=30):
    """Mean outlet chlorine over a rollout, as a function of cl_k_ref."""

    def loss(k_ref):
        p = dataclasses.replace(params, cl_k_ref=k_ref)
        _, traj = R.rollout(p, state, bc, dt=1.0, substeps=4,
                            n_steps=n_steps)
        return jnp.mean(traj["chlorine"][:, -1])

    return loss


def test_grad_finite_and_matches_fd():
    """Reverse-mode gradient w.r.t. the decay constant matches a central
    finite difference to 1e-4 relative (float64)."""
    _, params, state, bc = _setup()
    loss = _loss_of_kref(params, state, bc)
    k0 = jnp.asarray(1e-4, jnp.float64)

    g = jax.grad(loss)(k0)
    assert np.isfinite(float(g))
    assert float(g) < 0.0  # faster decay -> less chlorine

    h = 1e-9
    fd = (float(loss(k0 + h)) - float(loss(k0 - h))) / (2 * h)
    assert np.isclose(float(g), fd, rtol=1e-4), (float(g), fd)


def test_grad_wrt_full_param_pytree():
    """grad w.r.t. every ReactorParams leaf at once: all finite, and the
    physically coupled ones are nonzero."""
    _, params, state, bc = _setup()

    def loss(p):
        _, traj = R.rollout(p, state, bc, dt=1.0, substeps=4, n_steps=20)
        return (jnp.mean(traj["chlorine"]) + jnp.mean(traj["pH"])
                + 1e-2 * jnp.mean(traj["temperature"]))

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert abs(float(grads.cl_k_ref)) > 0
    assert abs(float(grads.k_exchange)) > 0
    assert np.any(np.abs(np.asarray(
        jax.tree_util.tree_leaves(grads.chem))) > 0)


def test_grad_through_stratification_path():
    """The Richardson-suppression branch (jnp.where lattice over density
    differences, core/spatial.py) must not poison gradients."""
    _, params, state, bc = _setup(
        n_zones=8, enable_thermal_stratification=True,
        volume=1000, height=2.0, diameter=0.798)
    # Impose a real thermal gradient so the stratified branch is active.
    T = jnp.linspace(15.0, 25.0, 8).astype(state.temperature.dtype)
    state = dataclasses.replace(state, temperature=T)

    def loss(k_exchange):
        p = dataclasses.replace(params, k_exchange=k_exchange)
        _, traj = R.rollout(p, state, bc, dt=1.0, substeps=4, n_steps=20)
        return jnp.mean(traj["temperature"][:, 0])

    g = jax.grad(loss)(params.k_exchange)
    assert np.isfinite(float(g))
    assert abs(float(g)) > 0


def test_grad_through_scheduled_rollout():
    """Differentiate through time-varying forcing — e.g. dose-schedule
    sensitivity: d(mean outlet Cl)/d(dosing schedule) is finite and
    positive for every step's dose."""
    _, params, state, bc = _setup()
    n_steps = 16

    def loss(cl_flow_schedule):
        sched = dataclasses.replace(
            bc, chlorine_flow_rate=cl_flow_schedule,
            chlorine_concentration=jnp.asarray(1000.0, jnp.float64))
        _, traj = R.rollout_scheduled(params, state, sched, dt=1.0,
                                      substeps=4)
        return jnp.mean(traj["chlorine"][:, -1])

    sched0 = jnp.full((n_steps,), 0.01, jnp.float64)
    g = jax.grad(loss)(sched0)
    assert g.shape == (n_steps,)
    assert np.all(np.isfinite(np.asarray(g)))
    # Early doses influence the mean more than the final-step dose (which
    # only affects the last recorded sample).
    assert float(g[0]) > float(g[-1]) >= 0.0


def test_grad_through_instrumented_plant():
    """Gradients flow through physics + the seven-sensor read pipeline
    (noise lattices, delay rings, fault selects) back to physical params."""
    from ics_wt_physicsengine_tpu.models import make_plant, plant_step

    config = R.ReactorConfiguration(n_zones=4)
    params, plant = make_plant(config, seed=3, dtype=jnp.float64)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.2,
                              inlet_chlorine=0.5, acid_flow_rate=0.05)

    def loss(k_ref):
        rp = dataclasses.replace(params.reactor, cl_k_ref=k_ref)
        p = dataclasses.replace(params, reactor=rp)

        def body(pl, _):
            pl, readings = plant_step(p, pl, bc, dt=1.0, substeps=4)
            return pl, readings["chlorine_outlet"].value

        _, vals = jax.lax.scan(body, plant, None, length=8)
        return jnp.mean(vals)

    k0 = jnp.asarray(1e-4, jnp.float64)
    g = jax.grad(loss)(k0)
    assert np.isfinite(float(g))
    assert float(g) < 0.0


def test_gradient_descent_recovers_decay_constant():
    """End-to-end calibration: recover a perturbed chlorine decay constant
    from a noiseless outlet-chlorine trajectory by gradient descent on
    log k. The full workflow of examples/parameter_estimation.py, shrunk."""
    _, params, state, bc = _setup()
    n_steps = 120
    k_true = 2.0e-4

    def simulate(log10_k):
        p = dataclasses.replace(
            params, cl_k_ref=10.0 ** log10_k)
        _, traj = R.rollout(p, state, bc, dt=1.0, substeps=4,
                            n_steps=n_steps)
        return traj["chlorine"][:, -1]

    target = simulate(jnp.log10(jnp.asarray(k_true, jnp.float64)))

    import optax

    @jax.jit
    def loss_and_grad(theta):
        def loss(th):
            resid = simulate(th) - target
            return jnp.mean(resid * resid) * 1e6
        return jax.value_and_grad(loss)(theta)

    theta = jnp.asarray(-4.0, jnp.float64)        # start at k = 1e-4
    opt = optax.adam(5e-2)
    opt_state = opt.init(theta)
    first_loss = None
    for _ in range(80):
        val, g = loss_and_grad(theta)
        if first_loss is None:
            first_loss = float(val)
        updates, opt_state = opt.update(g, opt_state)
        theta = optax.apply_updates(theta, updates)

    k_hat = float(10.0 ** theta)
    final_loss = float(loss_and_grad(theta)[0])
    assert final_loss < 1e-3 * first_loss, (first_loss, final_loss)
    assert abs(k_hat - k_true) / k_true < 0.05, k_hat


def test_remat_gradient_matches_exact():
    """remat=True changes memory, not math: the rematerialized gradient is
    identical to the standard one."""
    _, params, state, bc = _setup()

    def loss(k_ref, remat):
        p = dataclasses.replace(params, cl_k_ref=k_ref)
        _, traj = R.rollout(p, state, bc, dt=1.0, substeps=4, n_steps=40,
                            remat=remat)
        return jnp.mean(traj["chlorine"][:, -1])

    k0 = jnp.asarray(1e-4, jnp.float64)
    g_exact = jax.grad(lambda k: loss(k, False))(k0)
    g_remat = jax.grad(lambda k: loss(k, True))(k0)
    assert float(g_exact) == float(g_remat)


def test_remat_gradient_through_100k_step_rollout():
    """Long-horizon gradient memory (VERDICT r3 item 6): jax.grad through a
    100,000-step rollout with remat=True completes without exhausting
    memory — reverse mode stores only the per-step carry, recomputing the
    step residuals (~100x the carry) on the backward pass. Parameter
    estimation and gradient MPC reach 1-day-plus horizons on-chip."""
    _, params, state, bc = _setup(n_zones=2)

    @jax.jit
    def grad_fn(k_ref):
        def loss(k):
            p = dataclasses.replace(params, cl_k_ref=k)
            final, _ = R.rollout(p, state, bc, dt=1.0, substeps=1, stages=4,
                                 n_steps=100_000, record=False, remat=True)
            return jnp.mean(final.chlorine)
        return jax.grad(loss)(k_ref)

    g = grad_fn(jnp.asarray(1e-4, jnp.float64))
    assert np.isfinite(float(g))
    assert float(g) < 0.0   # faster decay -> less chlorine at the end


def test_remat_closed_loop_gradient_matches_exact():
    """The closed-loop scan accepts remat=True with identical gradients —
    the gain-tuning path scales to long horizons too."""
    from ics_wt_physicsengine_tpu import control as C

    _, params, state, bc = _setup()
    gains = C.make_gain_grid(kp_cl=jnp.asarray([0.5]),
                             ki_cl=jnp.asarray([0.02]),
                             kp_ph=jnp.asarray([-0.5]),
                             ki_ph=jnp.asarray([-0.05]))
    state_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (1,) + x.shape), state)

    def loss(kp, remat):
        g = dataclasses.replace(
            gains, chlorine=dataclasses.replace(gains.chlorine, kp=kp))
        carry = C.make_dual_pid_carry((1,), jnp.float64)
        st, _, _, _ = C.rollout_closed_loop(
            params, state_b, bc, C.dual_pid_controller, g, carry,
            dt=1.0, substeps=4, n_steps=25, record=False, remat=remat)
        return jnp.mean((st.chlorine[..., -1] - 2.0) ** 2)

    kp0 = jnp.asarray([0.5], jnp.float64)
    g_exact = jax.grad(lambda k: loss(k, False))(kp0)
    g_remat = jax.grad(lambda k: loss(k, True))(kp0)
    assert float(g_exact[0]) == float(g_remat[0])
    assert np.isfinite(float(g_remat[0]))
