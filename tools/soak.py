"""
Long-horizon soak + checkpoint/resume end-to-end, driver-capturable.

Three phases, all on the default (TPU) backend, printing ONE JSON line:

1. **1M-step fused soak** of the 20-zone plant (one `rollout_fused` kernel
   launch per 250k-step segment) with an in-graph conservation audit
   (`core.reactor.conservation_metrics`, the reference's oracle,
   reference core/reactor.py:570-611) evaluated at every segment boundary,
   plus `record_every` trajectory extraction inside the kernel.
2. **Checkpoint/resume bit-identity**: the same 1M steps run as
   500k -> save .npz -> restore into a fresh pytree -> 500k must reproduce
   the uninterrupted run bit-for-bit.
3. **Instrumented checkpoint/resume**: a full PlantState (physics + seven
   sensor carries incl. PRNG keys and delay rings) checkpointed mid-scan
   and resumed, again bit-identical.
4. **Nitrogen soak** (round 4): the nitrogen-enabled INSTRUMENTED plant
   (physics + 9 instruments incl. the two ammonia ISEs) over the same
   horizon through the XLA scan path (the fused kernels deliberately
   reject nitrogen configs), with per-segment finiteness + species-bounds
   audits and its own mid-soak checkpoint/resume bit-identity.

Backend-hermetic (round 4): the default backend is proven healthy in a
deadline-bounded subprocess BEFORE first use (utils/backend_select.py);
on a wedged/unusable accelerator this prints a parseable
``{"ok": false, "reason": ...}`` line instead of hanging or crashing.

Usage: python tools/soak.py [--steps 1000000] [--out soak.json]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from ics_wt_physicsengine_tpu.core import reactor as R  # noqa: E402
from ics_wt_physicsengine_tpu.ops.fused_rollout import rollout_fused  # noqa: E402
from ics_wt_physicsengine_tpu.utils import checkpoint as ckpt  # noqa: E402

BC = R.BoundaryConditions(
    inlet_flow_rate=5.0, inlet_pH=7.2, inlet_chlorine=0.5,
    inlet_temperature=26.0, acid_flow_rate=0.1,
    ambient_temperature=15.0, heat_loss_coefficient=50.0)


def _get(x):
    return np.asarray(x)          # device->host transfer = reliable barrier


def state_equal(a: R.ReactorState, b: R.ReactorState) -> bool:
    return all(np.array_equal(_get(x), _get(y))
               for x, y in zip((a.pH, a.chlorine, a.temperature),
                               (b.pH, b.chlorine, b.temperature)))


def soak(n_steps: int):
    config = R.ReactorConfiguration(volume=1000, height=2.0, diameter=0.798,
                                    n_zones=20)
    substeps = R.default_substeps(config, 1.0)
    params = R.make_params(config, dtype=jnp.float32)
    state0 = R.make_initial_state(config, dtype=jnp.float32)
    audit = jax.jit(R.conservation_metrics)

    n_segments = 4
    seg = n_steps // n_segments
    rec_every = max(1, seg // 64)
    while seg % rec_every:        # record_every must divide the segment
        rec_every -= 1

    # -- phase 1: segmented soak with conservation audit + trajectories
    # Warm-up: compile the segment kernel + audit once so the timed loop
    # measures sustained throughput, not remote-compile latency.
    w, _ = rollout_fused(params, state0, BC, dt=1.0, substeps=substeps,
                         n_steps=seg, record_every=rec_every)
    _get(audit(params, w)["total_chlorine_mg"])

    state = state0
    audits = []
    finite_ok = True
    cl0 = None
    t0 = time.perf_counter()
    traj_points = 0
    for i in range(n_segments):
        state, traj = rollout_fused(params, state, BC, dt=1.0,
                                    substeps=substeps, n_steps=seg,
                                    record_every=rec_every)
        m = audit(params, state)
        total_cl = float(_get(m["total_chlorine_mg"]))
        charge = float(_get(m["charge_balance_mol"]))
        ph_tail = _get(traj["pH"])
        traj_points += ph_tail.shape[0]
        finite_ok = finite_ok and bool(np.all(np.isfinite(ph_tail))) \
            and bool(np.all(np.isfinite(_get(state.pH)))) \
            and bool(np.all(np.isfinite(_get(state.temperature))))
        if cl0 is None:
            cl0 = total_cl
        audits.append({"t": float(_get(state.time)),
                       "total_chlorine_mg": round(total_cl, 3),
                       "charge_balance_mol": charge})
    elapsed = time.perf_counter() - t0
    final_soak_state = state

    # -- phase 2: checkpoint/resume bit-identity (bare physics)
    half = n_steps // 2
    a = rollout_fused(params, state0, BC, dt=1.0, substeps=substeps,
                      n_steps=half)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "soak_ckpt.npz")
        ckpt.save_pytree(path, {"params": params, "state": a},
                         metadata={"step": half})
        restored = ckpt.load_pytree(path, {"params": params, "state": a})
    b = rollout_fused(restored["params"], restored["state"], BC, dt=1.0,
                      substeps=substeps, n_steps=n_steps - half)
    # Oracle: the same halves with no checkpoint in between. (The 4-segment
    # soak state above must match too — segmentation cannot change bits.)
    c = rollout_fused(params, state0, BC, dt=1.0, substeps=substeps,
                      n_steps=half)
    c = rollout_fused(params, c, BC, dt=1.0, substeps=substeps,
                      n_steps=n_steps - half)
    resume_bitexact = state_equal(b, c)
    if n_segments * seg == n_steps:   # segmentation must not change bits
        resume_bitexact = resume_bitexact and state_equal(
            b, final_soak_state)

    # -- phase 3: instrumented plant checkpoint/resume (PRNG keys + rings)
    from ics_wt_physicsengine_tpu.models.plant import (
        make_plant, plant_rollout)

    pparams, plant0 = make_plant(config, seed=7, dtype=jnp.float32)
    n_inst = 2000
    h = n_inst // 2
    roll = jax.jit(lambda p, n: plant_rollout(
        pparams, p, BC, 1.0, substeps, n, record=False)[0],
        static_argnums=1)
    mid = roll(plant0, h)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "plant_ckpt.npz")
        ckpt.save_pytree(path, mid, metadata={"step": h})
        mid_restored = ckpt.load_pytree(path, mid)
    end_resumed = roll(mid_restored, n_inst - h)
    end_oracle = roll(roll(plant0, h), n_inst - h)
    def _keyfix(tree):
        return jax.tree_util.tree_map(
            lambda v: (jax.random.key_data(v)
                       if hasattr(v, "dtype") and jax.dtypes.issubdtype(
                           v.dtype, jax.dtypes.prng_key) else v), tree)

    def _leaf_eq(x, y):
        x, y = _get(x), _get(y)
        if x.dtype.kind == "f":
            # NaN leaves are expected (random open/short faults latch
            # last_value to NaN at ~1e-4/read) and must compare equal.
            return np.array_equal(x, y, equal_nan=True)
        return np.array_equal(x, y)

    inst_ok = all(
        _leaf_eq(x, y) for x, y in zip(
            jax.tree_util.tree_leaves(_keyfix(end_resumed)),
            jax.tree_util.tree_leaves(_keyfix(end_oracle))))

    # -- phase 4: nitrogen-enabled instrumented soak (XLA scan path — the
    # fused kernels reject nitrogen configs by design). Same horizon,
    # 4 segments, per-segment finiteness + species-bounds audit, plus its
    # own mid-soak checkpoint/resume bit-identity.
    n_cfg = R.ReactorConfiguration(
        volume=1000, height=2.0, diameter=0.798, n_zones=20,
        enable_nitrogen=True, initial_ammonia=1.0)
    n_bc = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.2, inlet_chlorine=0.5,
        inlet_temperature=26.0, acid_flow_rate=0.1,
        ambient_temperature=15.0, heat_loss_coefficient=50.0,
        inlet_ammonia=1.0)
    np_params, nplant0 = make_plant(n_cfg, seed=11, dtype=jnp.float32)
    n_sub = R.default_substeps(n_cfg, 1.0)
    nroll = jax.jit(lambda p, n: plant_rollout(
        np_params, p, n_bc, 1.0, n_sub, n, record=False)[0],
        static_argnums=1)

    nstate = nplant0
    nitro_finite = True
    nitro_bounded = True
    nitro_audits = []
    t0 = time.perf_counter()
    for i in range(n_segments):
        nstate = nroll(nstate, seg)
        r = nstate.reactor
        for arr in (r.pH, r.chlorine, r.temperature, r.ammonia,
                    r.nitrite, r.nitrate, r.chloramine):
            nitro_finite = nitro_finite and bool(
                np.all(np.isfinite(_get(arr))))
        for arr in (r.ammonia, r.nitrite, r.nitrate, r.chloramine):
            a = _get(arr)
            nitro_bounded = nitro_bounded and bool(
                np.all(a >= -1e-6) and np.all(a < 100.0))
        from ics_wt_physicsengine_tpu.core.nitrogen import total_nitrogen_mgN
        nitro_audits.append({
            "t": float(_get(r.time)),
            "total_N_mgN_per_L_mean": round(float(np.mean(_get(
                total_nitrogen_mgN(r.ammonia, r.nitrite, r.nitrate,
                                   r.chloramine)))), 4),
            "ammonia_outlet": round(float(_get(r.ammonia)[-1]), 4),
        })
    nitro_elapsed = time.perf_counter() - t0

    nmid = nroll(nplant0, 1000)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "nitro_ckpt.npz")
        ckpt.save_pytree(path, nmid, metadata={"step": 1000})
        nmid_restored = ckpt.load_pytree(path, nmid)
    nitro_resume_ok = all(
        _leaf_eq(x, y) for x, y in zip(
            jax.tree_util.tree_leaves(_keyfix(nroll(nmid_restored, 1000))),
            jax.tree_util.tree_leaves(_keyfix(nroll(nmid, 1000)))))

    drift_pct = 100.0 * (audits[-1]["total_chlorine_mg"] - cl0) / cl0
    # Self-judging bounds (the audit used to be print-only; a regression
    # was captured but never caught): chlorine drift within 0.5% over the
    # soak (r2 measured -0.0018%), all trajectories/states finite, both
    # resume paths bit-exact.
    checks = {
        "drift_within_bounds": bool(abs(drift_pct) < 0.5),
        "trajectories_finite": bool(finite_ok),
        "resume_bitexact_physics": bool(resume_bitexact),
        "resume_bitexact_instrumented": bool(inst_ok),
        "nitrogen_finite": bool(nitro_finite),
        "nitrogen_species_bounded": bool(nitro_bounded),
        "resume_bitexact_nitrogen": bool(nitro_resume_ok),
    }
    return {
        "metric": "1M-step soak + checkpoint/resume e2e (20 zones, f32)",
        "soak_steps": n_steps,
        "soak_steps_per_sec": round(n_steps / elapsed, 1),
        "traj_points_recorded": traj_points,
        "conservation_audit": audits,
        "chlorine_drift_pct_over_soak": round(drift_pct, 4),
        "nitrogen_soak_steps": n_segments * seg,
        "nitrogen_steps_per_sec": round(n_segments * seg / nitro_elapsed, 1),
        "nitrogen_audit": nitro_audits,
        **checks,
        "ok": all(checks.values()),
        "backend": jax.default_backend(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1_000_000)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from ics_wt_physicsengine_tpu.utils.backend_select import (
        ensure_default_backend)
    platform, reason = ensure_default_backend(
        min_devices=1, probe_deadline=60.0, retries=3,
        log=lambda m: print(f"[soak] {m}", file=sys.stderr, flush=True))
    if platform == "cpu" and os.environ.get("SOAK_ALLOW_CPU") != "1":
        line = json.dumps({
            "metric": "1M-step soak + checkpoint/resume e2e (20 zones, f32)",
            "ok": False,
            "reason": (f"accelerator backend unusable: {reason}"
                       if reason != "ok" else
                       "default backend is cpu (fused soak kernels need "
                       "the TPU); set SOAK_ALLOW_CPU=1 to force")})
        print(line)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line + "\n")
        raise SystemExit(0)

    result = soak(args.steps)
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    raise SystemExit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
