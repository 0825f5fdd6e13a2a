"""
Fused whole-rollout kernel for the INTEGRATED plant: physics + all seven
instruments per step, inside one Pallas launch.

Why: the XLA scan of ``models.plant.plant_step`` executes hundreds of tiny
fused programs per step; at single-plant scale that is latency-bound at a
few thousand steps/s while the bare-physics fused kernel runs at hundreds of
thousands. This kernel keeps the reactor state, every sensor carry, and the
sample-line histories resident in VMEM for the whole rollout, so BASELINE
config 3 (physics + sensor suite) runs at kernel speed.

When to use which path (measured, v5e, 20 zones, RK4):
- single / small-batch instrumented rollouts: THIS kernel — 57k steps/s at
  4096 steps, 117k at 16384 (per-step cost ~6.6 us + ~35 ms call overhead)
  vs 7.1k steps/s for the XLA ``plant_rollout`` scan (8-16x).
- large Monte-Carlo ensembles: the XLA ``plant_rollout_batched`` path —
  120M plant-steps/s at 65,536 plants (with its O(1) line taps + packed
  PRNG, models/plant.py; steady-state 512-step calls) vs 5.5M
  (``layout="zl"``) / 6.7M (``layout="pl"``) here.

Automatic path selection: use ``models.plant.plant_rollout_auto`` — it
dispatches fused-vs-XLA by batch size and backend so callers cannot
silently pick the order-of-magnitude slower path.

Two lane layouts (``layout=``; "auto" == "zl"):
- "zl" (zones on lanes): 128//Z plants per row; per-plant sensor math is
  replicated across each plant's Z lanes — ideal at single/small batch,
  wasteful at scale (where the XLA batched path wins anyway).
- "pl" (plants on lanes): EXPERIMENTAL, explicit opt-in only (demoted in
  round 3, like the Pallas pH solver). One plant per lane, zones on the
  major axis of [Z, rows, 128] state. Sensor math then uses every lane
  productively and zone taps are free row slices, BUT each physics
  intermediate is Z sublane-tiles tall and the zone stencil becomes
  major-axis shifts — measured only ~1.2x over "zl" at 16k plants (the
  physics dominates; a physics-only "pl" run caps near 5M plant-steps/s
  vs the standalone zone-packed physics kernel's 48M; the per-zone
  [8, 128] planes serialize VPU dispatch). Never enough of a win to
  matter: large ensembles belong on the XLA batched path (120M
  plant-steps/s at 65k plants), which auto-dispatch picks.

Design — reuse, don't re-implement:
- The sensor pipeline code is the *same* jnp code as the XLA path: the
  kernel builds plane-valued ``SensorParams``/``SensorCarry`` dataclasses
  ([rows, 128] leaves) from packed VMEM tensors and calls the very same
  ``ph_read``/``chlorine_read``/``flow_read``/``temperature_read``
  (sensors/*.py), with externally supplied randomness (their ``rand``
  hook) and an externally resolved sample line (their ``delayed_true``
  hook, with ``line_capacity=0`` params so the in-carry ring is skipped).
  Any fix to the sensor physics automatically applies to both paths.
- The physics is the shared lane-stencil body from ops/fused_rollout.py.
- Lane layout: zones on the 128-lane axis, ``128 // n_zones`` plants per
  row (ops/fused_rollout.py docstring). Per-plant sensor scalars are packed
  per-lane; each lane computes an independent sensor-noise realization and
  unpacking reads each plant's zone-0 lane — one coherent stream per plant.

Sample line: with a fixed step dt, the reference's nearest-timestamp ring
lookup reduces to "the tap from round(delay/dt) steps ago" — a circular
[max_delay_steps+1] history in VMEM scratch with O(1) lookup (uniform
delays) or a one-hot gather (per-plant heterogeneous delays) instead of
an argmin over 100 entries. Incoming carry rings ARE consumed
(``consume_line=True``): a host prologue resolves what the exact
nearest-timestamp lookup would return for each of the first ``delay``
reads and prefills the history (``_resolve_lead_in``), so a fused
continuation of an XLA run is sample-for-sample exact
(tests/test_fused_plant.py::test_fused_plant_consumes_incoming_ring).
On exit the circular histories are written back and the carry rings
RECONSTRUCTED (``_rebuild_rings``), so fused -> XLA chaining is also
exact (tests/test_fused_plant.py::test_fused_plant_writes_ring_back).
Remaining differences vs the XLA ring (documented, noise level): the
fused line records the true process value every step (the reference skips
appends while warming or power-faulted, shifting post-fault delays by
+-1 step at ~1e-4/read probability), exactly-equal-distance ties between
an incoming and an in-rollout sample resolve by ring-slot order, and a
rollout SHORTER than a line's delay loses pre-rollout history beyond the
reconstructed window.

Randomness: on TPU, the on-chip PRNG (pltpu.prng_seed / prng_random_bits,
seeded per grid block from ``seed``); uniforms take the top 24 bits,
normals are Box-Muller pairs. For CPU/interpret testing the same word
stream can be *injected* (``rng="bits"``) — tests feed identical words to
this kernel and to an XLA plant_step scan (via the sensors' ``rand`` hook)
and compare bit-for-bit (tests/test_fused_plant.py).

Reference semantics: sensors/base_sensor.py:509-698 (base pipeline),
ph_sensor/chlorine_sensor/flow_sensor/temperature_sensor overlays, and
the reference __main__.py:398-457 step-then-read-all loop.
"""

from __future__ import annotations

import functools
import math
from dataclasses import replace as dc_replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.models.plant import PlantState
from ics_wt_physicsengine_tpu.ops.fused_rollout import (
    _BFIELDS,
    _COL,
    _COLS as _COLS_ALL,
    _LANES,
    _MAX_BLOCK_ROWS,
    _NBF,
    _SCHED_CHUNK,
    _boundary_terms,
    _bound,
    _make_deriv,
    _make_stepper,
    _masks,
    _masks_zone_major,
    _pack_planes,
    _pack_scalars,
    _pack_state,
    _param_planes,
    _param_values,
    _unpack_state,
)
from ics_wt_physicsengine_tpu.sensors import base as SB
from ics_wt_physicsengine_tpu.sensors import chlorine as SC
from ics_wt_physicsengine_tpu.sensors import flow as SF
from ics_wt_physicsengine_tpu.sensors import ph as SP
from ics_wt_physicsengine_tpu.sensors import temperature as ST

# ---------------------------------------------------------------------------
# Registries: sensor order, randomness layout, packed column layouts
# ---------------------------------------------------------------------------

# (reading name, PlantParams/PlantState attribute, kind)
SENSORS = [
    ("pH_inlet", "ph_inlet", "ph"),
    ("pH_outlet", "ph_outlet", "ph"),
    ("chlorine_inlet", "chlorine_inlet", "cl"),
    ("chlorine_outlet", "chlorine_outlet", "cl"),
    ("flow_main", "flow_main", "flow"),
    ("temp_inlet", "temp_inlet", "temp"),
    ("temp_outlet", "temp_outlet", "temp"),
]

_RAND = {  # (n_normals, n_uniforms) per sensor kind
    "ph": (SP.N_NORMALS, SP.N_UNIFORMS),
    "cl": (SC.N_NORMALS, SC.N_UNIFORMS),
    "flow": (SF.N_NORMALS, SF.N_UNIFORMS),
    "temp": (ST.N_NORMALS, ST.N_UNIFORMS),
}


def words_per_sensor(kind: str) -> int:
    n, m = _RAND[kind]
    return 2 * ((n + 1) // 2) + m


N_WORDS = sum(words_per_sensor(kind) for _, _, kind in SENSORS)
_WORD_OFFSET = {}
_off = 0
for _rname, _attr, _kind in SENSORS:
    _WORD_OFFSET[_attr] = _off
    _off += words_per_sensor(_kind)

# Per-plant float parameter columns: (attr, field path relative to the
# sensor params dataclass). Base fields used by base_read, then overlays.
_BASE_P = ["min_value", "max_value", "precision", "drift_rate",
           "warmup_time_s", "max_rate_of_change", "flow_velocity",
           "air_bubble_frequency", "grounding_quality", "pipe_vibration_g",
           "ambient_temperature"]
_OVERLAY_P = {
    "ph": ["temperature_coefficient"],
    "cl": ["ozone_sensitivity", "h2o2_sensitivity", "clo2_sensitivity"],
    "flow": ["full_scale"],
    "temp": ["nominal_resistance", "rtd_alpha", "lead_resistance",
             "excitation_current_mA", "self_heating_C_per_mW",
             "seebeck_coefficient"],
}

# Carry columns (kind tags drive f32 encode/decode: f=float, b=bool, i=int).
_BASE_C = [("current_value", "f"), ("supply_voltage", "f"),
           ("power_on_time", "f"), ("calibration_offset", "f"),
           ("last_calibration_time", "f"),
           ("calibration_validity_hours", "f"), ("has_calibration", "b"),
           ("status", "i"), ("fault", "i"), ("last_value", "f"),
           ("last_timestamp", "f"), ("has_history", "b")]
_OVERLAY_C = {
    "ph": [("membrane_fouling", "f"), ("glass_etching", "f"),
           ("days_since_cleaning", "f"), ("water_hardness", "f"),
           ("reference_contamination", "f"), ("slope_percentage", "f"),
           ("cal_point_1", "f"), ("cal_point_2", "f")],
    "cl": [("membrane_fouling", "f"), ("membrane_age_days", "f"),
           ("electrode_polarization", "f"), ("reagent_potency", "f"),
           ("reagent_age_days", "f"), ("light_exposure_hours", "f"),
           ("storage_temperature", "f")],
    "flow": [("bearing_friction", "f"), ("bearing_wear_days", "f"),
             ("electrode_fouling", "f"), ("fluid_conductivity", "f")],
    "temp": [("cold_junction_temp", "f"), ("cold_junction_drift", "f")],
}


def _build_cols():
    pcols, ccols = [], []
    for _, attr, kind in SENSORS:
        for f in _BASE_P:
            pcols.append((attr, "base", f))
        for f in _OVERLAY_P[kind]:
            pcols.append((attr, None, f))
        for f, k in _BASE_C:
            ccols.append((attr, "base", f, k))
        for f, k in _OVERLAY_C[kind]:
            ccols.append((attr, None, f, k))
    return pcols, ccols


_PCOLS, _CCOLS = _build_cols()
_PCOL = {c[:3]: i for i, c in enumerate(_PCOLS)}
_CCOL = {c[:3]: i for i, c in enumerate(_CCOLS)}
N_PCOLS, N_CCOLS = len(_PCOLS), len(_CCOLS)


# Perf-debug ablation switches (consulted at trace time; empty in
# production). Members: "no_sensors", "no_rand", "no_taps", "no_store",
# "no_hist", "one_sensor".
_ABLATE = frozenset()

# Schedule rows per SMEM slab (tests shrink this to cross chunk
# boundaries cheaply in interpreter mode).
_PLANT_SCHED_CHUNK = _SCHED_CHUNK


class _Cols:
    """Duck-typed stand-in for a trailing-axis-stacked random array: the
    sensor read fns index ``normals[..., i]`` / slice ``[..., :k]``; this
    serves those from a plain list of planes (no 3-D stacks in Mosaic)."""

    def __init__(self, cols):
        self.cols = list(cols)

    def __getitem__(self, idx):
        assert isinstance(idx, tuple) and idx[0] is Ellipsis
        sel = idx[1]
        if isinstance(sel, slice):
            return _Cols(self.cols[sel])
        return self.cols[sel]


def rand_from_words(words, n_normals: int, n_uniforms: int):
    """Transform raw int32 words into (normals, uniforms) — shared by the
    kernel and the XLA bit-match oracle so both consume identical streams.

    Uniforms take the top 24 bits (mask first: prng bits are *signed* int32,
    a bare >> would sign-extend); normals are Box-Muller pairs."""
    def unif(w):
        return ((w >> 8) & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))

    n_pairs = (n_normals + 1) // 2
    normals = []
    for p in range(n_pairs):
        u1 = unif(words[2 * p])
        u2 = unif(words[2 * p + 1])
        r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
        theta = (2.0 * math.pi) * u2
        normals.append(r * jnp.cos(theta))
        normals.append(r * jnp.sin(theta))
    normals = normals[:n_normals]
    uniforms = [unif(words[2 * n_pairs + i]) for i in range(n_uniforms)]
    return _Cols(normals), _Cols(uniforms)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _seg_tap(x, k: int, n_zones: int, zone, lanes: int):
    """Zone-k value of each packed plant, broadcast across the plant's
    lanes: left-rotate by k (zone-k lands on the zone-0 lane of the same
    segment), then logarithmic fill-right within segments."""
    if k:
        x = pltpu.roll(x, lanes - k, 1)
    s = 1
    while s < n_zones:
        x = jnp.where(zone >= s, pltpu.roll(x, s, 1), x)
        s *= 2
    return x


_LINE_ATTRS = ("ph_inlet", "ph_outlet", "temp_inlet", "temp_outlet")
_LINE_IDX = {a: i for i, a in enumerate(_LINE_ATTRS)}


def _plant_kernel(time_ref, seed_ref, sched_ref, scal_ref, sp_ref, cin_ref,
                  bits_ref, dsteps_ref,
                  lead_ph_in, lead_ph_out, lead_t_in, lead_t_out,
                  ph_ref, cl_ref, t_ref,
                  ph_out, cl_out, t_out, time_out, cout_ref, traj_ref,
                  hist_ph_in, hist_ph_out, hist_t_in, hist_t_out,
                  *, n_zones: int, dt: float, substeps: int, n_steps: int,
                  # hist_* are OUTPUT refs (revisiting blocks), not scratch:
                  # the final circular histories are written back so the
                  # host can reconstruct the sample-line rings
                  # (fused -> XLA chaining, see _rebuild_rings).
                  block_rows: int, stages, record_every: int, hw_rng: bool,
                  statics, scheduled: bool, chunk: int,
                  layout: str):
    # layout "zl": zones on lanes, 128//Z plants per row (single/small
    # batch). layout "pl": one plant per lane, zones on the major axis of
    # [Z, rows, 128] state — zero lane waste on the per-plant sensor math
    # and free zone taps (large batches).
    m = _masks(block_rows, n_zones) if layout == "zl" \
        else _masks_zone_major(n_zones)
    p = _param_planes(scal_ref)
    zone = jax.lax.broadcasted_iota(jnp.int32, (block_rows, _LANES), 1) \
        % n_zones

    if scheduled:
        # 2-D grid (rows, time chunks): per-step boundary scalars stream
        # through SMEM; the state carry lives in the output refs, whose
        # block index is constant along the time axis (revisiting pattern,
        # like fused_rollout._scheduled_kernel).
        t_idx = pl.program_id(1)

        def boundary_for(j):
            def get(name):
                return sched_ref[j, _BFIELDS.index(name)]
            b = _boundary_terms(p, get)
            q_total = (get("inlet_flow_rate") + get("acid_flow_rate")
                       + get("chlorine_flow_rate")) \
                + jnp.zeros((block_rows, _LANES), jnp.float32)
            return b, q_total
    else:
        t_idx = 0
        b_const = _boundary_terms(
            p, lambda name: scal_ref[:, _COL[name], :])
        q_const = (scal_ref[:, _COL["inlet_flow_rate"], :]
                   + scal_ref[:, _COL["acid_flow_rate"], :]
                   + scal_ref[:, _COL["chlorine_flow_rate"], :])

        def boundary_for(j):
            return b_const, q_const

    if hw_rng:
        # distinct stream per (row block, time chunk); Mosaic prng_seed
        # accepts at most two values, so fold the grid coords into one.
        # The seed itself is runtime data (SMEM) so per-device streams
        # under shard_map and seed changes don't recompile.
        if scheduled:
            pltpu.prng_seed(seed_ref[0],
                            pl.program_id(0) * 65536 + pl.program_id(1))
        else:
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    hists = {"ph_inlet": hist_ph_in, "ph_outlet": hist_ph_out,
             "temp_inlet": hist_t_in, "temp_outlet": hist_t_out}
    leads = {"ph_inlet": lead_ph_in, "ph_outlet": lead_ph_out,
             "temp_inlet": lead_t_in, "temp_outlet": lead_t_out}

    def _init():
        cout_ref[:] = cin_ref[:]
        ph_out[:] = ph_ref[:]
        cl_out[:] = cl_ref[:]
        t_out[:] = t_ref[:]
        time_out[:] = jnp.zeros_like(time_out) + time_ref[0]
        # Sample-line lead-in: the host resolved what each line read would
        # return for the first d steps FROM THE INCOMING CARRY RING (exact
        # nearest-timestamp semantics, see _resolve_lead_in); NaN slots fall
        # back to the first in-rollout sample (fresh-line clamp).
        for a in _LINE_ATTRS:
            if statics[a]["d_max"] > 0:
                hists[a][:] = leads[a][:]
            else:       # unused history output: define its contents
                hists[a][:] = jnp.zeros_like(hists[a])

    if scheduled:
        pl.when(t_idx == 0)(_init)
    else:
        _init()

    def pparam(attr, sub, field):
        return sp_ref[:, _PCOL[(attr, sub, field)], :]

    def cget(attr, sub, field):
        return cout_ref[:, _CCOL[(attr, sub, field)], :]

    def cset(attr, sub, field, value):
        cout_ref[:, _CCOL[(attr, sub, field)], :] = value

    def base_params(attr, **extra):
        kw = {f: pparam(attr, "base", f) for f in _BASE_P}
        return SB.SensorParams(
            line_capacity=0, response_time=jnp.float32(0.0),
            hysteresis_magnitude=jnp.float32(0.0),
            line_delay_s=jnp.float32(0.0), **kw)

    def base_carry(attr):
        g = lambda f: cget(attr, "base", f)  # noqa: E731
        return SB.SensorCarry(
            key=jnp.zeros((), jnp.float32),
            current_value=g("current_value"),
            supply_voltage=g("supply_voltage"),
            power_on_time=g("power_on_time"),
            calibration_offset=g("calibration_offset"),
            last_calibration_time=g("last_calibration_time"),
            calibration_validity_hours=g("calibration_validity_hours"),
            has_calibration=g("has_calibration") > 0.5,
            status=g("status").astype(jnp.int32),
            fault=g("fault").astype(jnp.int32),
            last_value=g("last_value"),
            last_timestamp=g("last_timestamp"),
            has_history=g("has_history") > 0.5,
            line_values=jnp.zeros((1,), jnp.float32),
            line_times=jnp.zeros((1,), jnp.float32),
            line_count=jnp.zeros((), jnp.int32),
            line_ptr=jnp.zeros((), jnp.int32),
        )

    def store_base(attr, nc):
        cset(attr, "base", "current_value", nc.current_value)
        cset(attr, "base", "supply_voltage", nc.supply_voltage)
        cset(attr, "base", "status", nc.status.astype(jnp.float32))
        cset(attr, "base", "fault", nc.fault.astype(jnp.float32))
        cset(attr, "base", "last_value", nc.last_value)
        cset(attr, "base", "last_timestamp",
             jnp.zeros_like(nc.current_value) + nc.last_timestamp)
        cset(attr, "base", "has_history",
             jnp.zeros_like(nc.current_value)
             + nc.has_history.astype(jnp.float32))

    def overlay_carry(attr, kind, base):
        fields = {f: cget(attr, None, f) for f, _ in _OVERLAY_C[kind]}
        cls = {"ph": SP.PHSensorCarry, "cl": SC.ChlorineSensorCarry,
               "flow": SF.FlowSensorCarry,
               "temp": ST.TemperatureSensorCarry}[kind]
        return cls(base=base, **fields)

    def store_overlay(attr, kind, nc):
        for f, _ in _OVERLAY_C[kind]:
            cset(attr, None, f, getattr(nc, f))

    def words_for(attr, kind, i):
        nw = words_per_sensor(kind)
        if hw_rng:
            return [pltpu.prng_random_bits((block_rows, _LANES))
                    for _ in range(nw)]
        w0 = _WORD_OFFSET[attr]
        return [bits_ref[i, w0 + w] for w in range(nw)]

    def run_step(j):
        """One dt step, mutating the output refs in place. ``j`` is the
        step index within this kernel invocation (== the global step in
        constant mode; chunk-relative when scheduled)."""
        g = t_idx * chunk + j if scheduled else j
        b, q_total = boundary_for(j)
        deriv = _make_deriv(p, b, m)
        stepper = _make_stepper(deriv, dt / substeps, stages)

        nph, ncl, ntt = jax.lax.fori_loop(
            0, substeps, lambda __, cy: stepper(cy),
            (ph_out[:], cl_out[:], t_out[:]))
        nph, ncl, ntt = _bound(nph, ncl, ntt)
        t = time_out[:] + jnp.float32(dt)
        ph_out[:] = nph
        cl_out[:] = ncl
        t_out[:] = ntt
        time_out[:] = t
        if "no_sensors" in _ABLATE:
            return

        # zone taps at ARBITRARY static zones (any sensor may read any
        # zone, not just inlet/outlet), memoized per (variable, zone)
        planes = {"pH": nph, "cl": ncl, "T": ntt}
        _tap_cache = {}

        def tap_of(var, k):
            if "no_taps" in _ABLATE:
                return nph if layout == "zl" else nph[0]
            if (var, k) not in _tap_cache:
                arr = planes[var]
                _tap_cache[(var, k)] = arr[k] if layout == "pl" \
                    else _seg_tap(arr, k, n_zones, zone, _LANES)
            return _tap_cache[(var, k)]

        def delayed(attr, tap):
            """Circular sample-line history: append this step's tap, read
            the tap from d steps ago. ``d`` may be per-plant (packed in
            dsteps_ref); capacity is the batch max + 1. Lead-in slots were
            prefilled from the incoming carry ring (see _init); NaN lead
            slots fall back to the first in-rollout sample — the exact
            ring's nearest-available pick for a young line."""
            info = statics[attr]
            d_stat, d_max = info["d_static"], info["d_max"]
            if "no_hist" in _ABLATE or d_max == 0:
                return tap
            hist = hists[attr]
            cap = jnp.int32(d_max + 1)
            gi = jnp.int32(g)
            hist[jax.lax.rem(gi, cap)] = tap
            if d_stat is not None:        # uniform delay: O(1) direct read
                idx = jax.lax.rem(gi - jnp.int32(d_stat) + cap, cap)
                v = hist[idx]
            else:                         # per-plant delays: one-hot gather
                dpl = dsteps_ref[:, _LINE_IDX[attr], :].astype(jnp.int32)
                idx = jax.lax.rem(gi - dpl + cap, cap)
                v = hist[0]
                for k in range(1, d_max + 1):
                    v = jnp.where(idx == k, hist[k], v)
            # NaN marks "no usable pre-rollout sample for this read":
            # fall back to the oldest in-rollout sample (slot 0 holds the
            # step-0 write untouched for the whole lead-in window)
            return jnp.where(jnp.isnan(v), hist[0], v)

        readings = {}
        sensors = SENSORS[:1] if "one_sensor" in _ABLATE else SENSORS
        for rname, attr, kind in sensors:
            n_n, n_u = _RAND[kind]
            if "no_rand" in _ABLATE:
                zero = jnp.zeros_like(tap_of("pH", 0))
                half = zero + 0.5
                normals = _Cols([zero] * n_n)
                uniforms = _Cols([half] * n_u)
            else:
                normals, uniforms = rand_from_words(
                    words_for(attr, kind, j), n_n, n_u)
            rand = (normals, uniforms)
            bp = base_params(attr)
            bc = base_carry(attr)

            if kind == "ph":
                pp = SP.PHSensorParams(
                    zone_index=0, base=bp,
                    temperature_coefficient=pparam(
                        attr, None, "temperature_coefficient"))
                cc = overlay_carry(attr, kind, bc)
                zi = statics[attr]["zone"]
                tap_ph = tap_of("pH", zi)
                tap_t = tap_of("T", zi)
                comp = SP.nernst_compensated_ph(pp, tap_ph, tap_t)
                dtap = delayed(attr, comp)
                nc, out = SP.ph_read(pp, cc, tap_ph, tap_t, t, rand=rand,
                                     delayed_true=dtap)
            elif kind == "cl":
                pp = SC.ChlorineSensorParams(
                    zone_index=0, sensor_type=statics[attr]["type"],
                    base=bp,
                    ozone_sensitivity=pparam(attr, None,
                                             "ozone_sensitivity"),
                    h2o2_sensitivity=pparam(attr, None, "h2o2_sensitivity"),
                    clo2_sensitivity=pparam(attr, None, "clo2_sensitivity"))
                cc = overlay_carry(attr, kind, bc)
                zi = statics[attr]["zone"]
                tap_cl = tap_of("cl", zi)
                tap_ph = tap_of("pH", zi)
                nc, out = SC.chlorine_read(pp, cc, tap_cl, tap_ph, t,
                                           rand=rand)
            elif kind == "flow":
                pp = SF.FlowSensorParams(
                    sensor_type=statics[attr]["type"], base=bp,
                    full_scale=pparam(attr, None, "full_scale"))
                cc = overlay_carry(attr, kind, bc)
                nc, out = SF.flow_read(pp, cc, q_total, t, rand=rand)
            else:  # temp
                pp = ST.TemperatureSensorParams(
                    zone_index=0, sensor_type=statics[attr]["type"],
                    base=bp,
                    nominal_resistance=pparam(attr, None,
                                              "nominal_resistance"),
                    rtd_alpha=pparam(attr, None, "rtd_alpha"),
                    lead_resistance=pparam(attr, None, "lead_resistance"),
                    excitation_current_mA=pparam(
                        attr, None, "excitation_current_mA"),
                    self_heating_C_per_mW=pparam(
                        attr, None, "self_heating_C_per_mW"),
                    seebeck_coefficient=pparam(attr, None,
                                               "seebeck_coefficient"))
                cc = overlay_carry(attr, kind, bc)
                tap_t = tap_of("T", statics[attr]["zone"])
                dtap = delayed(attr, tap_t)
                nc, out = ST.temperature_read(pp, cc, tap_t, t, rand=rand,
                                              delayed_true=dtap)

            if "no_store" not in _ABLATE:
                store_base(attr, nc.base)
                store_overlay(attr, kind, nc)
            readings[rname] = out.value

        @pl.when((g + 1) % record_every == 0)
        def _record():
            slot = (g + 1) // record_every - 1
            for k, (rname, _, _) in enumerate(SENSORS):
                if rname in readings:       # ablation may drop sensors
                    traj_ref[slot, k] = readings[rname]

    if scheduled:
        def chunk_body(j, _):
            g = t_idx * chunk + j

            @pl.when(g < n_steps)        # padded tail steps are no-ops
            def _step():
                run_step(j)
            return 0

        jax.lax.fori_loop(0, chunk, chunk_body, 0)
    else:
        def body(j, _):
            run_step(j)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _resolve_lead_in(base_carry, delay_s, d_arr, d_max, t0, dt, batch):
    """Prefill ``[d_max + 1, batch]`` for a sample-line history: what the
    exact nearest-timestamp ring lookup (sensors.base._ring_append_and_
    lookup) would return for each of the first ``d`` in-rollout reads,
    resolved from the INCOMING carry ring. NaN = "no usable pre-rollout
    sample" — the kernel falls back to the first in-rollout sample (the
    fresh-line clamp). Emulates the exact path's semantics including the
    progressive overwrite of incoming entries by in-rollout appends and
    jnp.argmin's storage-order tie-break (ties at exactly equal distance
    between an incoming and an in-rollout sample resolve by ring slot
    index)."""
    dtype = jnp.float32
    cap = d_max + 1
    nanfill = jnp.full((cap, batch), jnp.nan, dtype)
    lv = jnp.asarray(base_carry.line_values, dtype)
    lt = jnp.asarray(base_carry.line_times, dtype)
    if lv.ndim == 1:
        lv, lt = lv[None, :], lt[None, :]
    C = lv.shape[-1]
    if d_max == 0 or C == 0:
        return nanfill
    lv = jnp.broadcast_to(lv, (batch, C))
    lt = jnp.broadcast_to(lt, (batch, C))
    count = jnp.broadcast_to(
        jnp.asarray(base_carry.line_count, jnp.int32).reshape(-1), (batch,))
    ptr = jnp.broadcast_to(
        jnp.asarray(base_carry.line_ptr, jnp.int32).reshape(-1), (batch,))
    delay_s = jnp.broadcast_to(jnp.asarray(delay_s, dtype).reshape(-1),
                               (batch,))
    d_arr = jnp.broadcast_to(jnp.asarray(d_arr, jnp.int32).reshape(-1),
                             (batch,))
    t0 = jnp.broadcast_to(jnp.asarray(t0, dtype).reshape(-1), (batch,))

    g = jnp.arange(d_max, dtype=jnp.int32)[:, None]             # [d, 1]
    target = t0[None, :] + (g.astype(dtype) + 1.0) * dt \
        - delay_s[None, :]                                       # [d, B]
    s = jnp.arange(C, dtype=jnp.int32)[None, :]                  # [1, C]
    overwrite_step = jnp.mod(s - ptr[:, None], C)                # [B, C]
    valid = s < count[:, None]                                   # [B, C]
    surv = valid[None] & (overwrite_step[None] > g[:, :, None])  # [d, B, C]
    dist = jnp.where(surv, jnp.abs(lt[None] - target[..., None]),
                     jnp.inf)
    slot_in = jnp.argmin(dist, axis=-1)                          # [d, B]
    dist_in = jnp.min(dist, axis=-1)
    # nearest in-rollout candidate for a read this young is always the
    # step-0 sample (slot ptr), at |delay - g*dt|
    dist0 = jnp.abs(delay_s[None, :] - g.astype(dtype) * dt)
    use = (dist_in < dist0) | ((dist_in == dist0)
                               & (slot_in < ptr[None, :]))
    use = use & (g < d_arr[None, :])
    vals = jnp.take_along_axis(
        jnp.broadcast_to(lv[None], (d_max, batch, C)),
        slot_in[..., None], axis=-1)[..., 0]
    lead_gb = jnp.where(use, vals, jnp.nan)                      # [d, B]

    # scatter into prefill slots: the read for step g < d_b hits ring slot
    # (g - d_b + cap) % cap = g + 1 + (d_max - d_b)
    slots = jnp.arange(cap, dtype=jnp.int32)[:, None]            # [cap, 1]
    g_of = slots - 1 - (d_max - d_arr[None, :])                  # [cap, B]
    ok = (g_of >= 0) & (g_of < d_arr[None, :])
    gi = jnp.clip(g_of, 0, d_max - 1)
    return jnp.where(ok, jnp.take_along_axis(lead_gb, gi, axis=0),
                     jnp.nan).astype(dtype)


def _rebuild_rings(hist, old_carry, d_max: int, n_steps: int, t0, dt,
                   batch: int, per_plant, dtype):
    """Reconstruct a sensor's sample-line ring from the kernel's
    written-back circular history: the last min(n_steps, d_max+1, C)
    samples, laid out oldest->newest from slot 0 with ptr/count set so a
    subsequent XLA (or fused) segment's nearest-timestamp lookups resolve
    exactly as if the ring had been appended sample by sample. Samples
    older than the reconstructed window cannot win a lookup as long as
    the rollout was at least one delay long (n_steps >= d); shorter
    rollouts lose pre-rollout history beyond the window (noise-level,
    documented)."""
    cap = d_max + 1
    C = int(jnp.shape(old_carry.line_values)[-1])
    k = min(n_steps, cap, C)
    # hist slot of in-rollout step g is g % cap; take the last k steps
    gs = list(range(n_steps - k, n_steps))
    vals = jnp.stack([jnp.atleast_1d(per_plant(hist[g % cap]))
                      for g in gs])                          # [k, B]
    t0b = jnp.broadcast_to(jnp.asarray(t0, dtype).reshape(-1), (batch,))
    times = t0b[None, :] + (jnp.asarray(gs, dtype)[:, None] + 1.0) * dt
    ref_v = jnp.asarray(old_carry.line_values)
    ref_t = jnp.asarray(old_carry.line_times)
    single = ref_v.ndim == 1
    new_v = jnp.zeros((batch, C), ref_v.dtype)
    new_t = jnp.full((batch, C), -jnp.inf, ref_t.dtype)
    new_v = new_v.at[:, :k].set(vals.T.astype(ref_v.dtype))
    new_t = new_t.at[:, :k].set(times.T.astype(ref_t.dtype))
    if single:
        new_v, new_t = new_v[0], new_t[0]
    count = jnp.full((() if single else (batch,)), k, jnp.int32)
    ptr = jnp.full((() if single else (batch,)), k % C, jnp.int32)
    return {"line_values": new_v, "line_times": new_t,
            "line_count": count, "line_ptr": ptr}


def sensor_statics(params, dt: float):
    """The hashable per-sensor statics tuple the fused-plant jit keys on:
    (attr, normalized zone, sensor type, d_static, d_max) per sensor.
    Shared by plant_rollout_fused and the shard_map wrapper
    (parallel.fused.sharded_plant_rollout_fused) — the two MUST derive
    identical tuples for the same params or their caches/kernels
    desynchronize. Requires concrete (non-traced) params."""
    z = params.reactor.n_zones
    statics = []
    for _, attr, kind in SENSORS:
        sp = getattr(params, attr)
        zi = getattr(sp, "zone_index", 0)
        if not -z <= zi < z:
            raise ValueError(f"{attr}: zone_index {zi} out of range for "
                             f"{z} zones")
        zi = zi % z
        d_static, d_max = 0, 0
        if attr in _LINE_ATTRS and sp.base.line_capacity > 0:
            darr = np.round(np.asarray(
                jax.device_get(sp.base.line_delay_s),
                np.float64).ravel() / dt).astype(np.int64)
            darr = np.maximum(darr, 0)
            d_max = int(darr.max()) if darr.size else 0
            d_static = int(darr[0]) \
                if darr.size and np.all(darr == darr[0]) else None
        statics.append((attr, zi, getattr(sp, "sensor_type", None),
                        d_static, d_max))
    return tuple(statics)


def plant_rollout_fused(params, plant, boundary, *, dt: float,
                        substeps: int, n_steps: int, stages=None,
                        record_every: int = 1, rng: str = "hw",
                        bits=None, seed: int = 0,
                        interpret: bool | None = None,
                        layout: str = "auto", consume_line: bool = True):
    """Advance the full instrumented plant ``n_steps`` inside one kernel.

    Returns ``(new_plant, readings)`` where readings maps each sensor name
    to its measured-value trajectory ``[n_steps // record_every, ...]`` —
    the measured-value UQ workload (BASELINE config 3) at kernel speed.

    ``boundary`` may be constant (scalar leaves) or a *schedule*: a
    BoundaryConditions pytree with ``[n_steps]`` leaves (scalars broadcast)
    applies per-step forcing, streamed through SMEM exactly like
    ``rollout_scheduled_fused`` — the reference's HIL loop shape (per-step
    BC mutation + read-all-instruments) in one launch.

    ``rng="hw"`` uses the on-chip PRNG (seeded from ``seed``; TPU only).
    ``rng="bits"`` consumes caller-supplied int32 ``bits`` of shape
    ``[n_steps, N_WORDS, rows_padded, 128]`` — the CPU-testable path whose
    stream the XLA oracle can replay (see module docstring).

    Sample lines: per-plant delays are supported (plants may have
    heterogeneous line delays — the kernel gathers each lane's own tap;
    uniform-delay batches keep the O(1) fast path), sensors may tap ANY
    zone (``zone_index`` normalized, uniform across the batch), and the
    incoming carry rings ARE consumed (``consume_line=True``, default):
    the first ``delay`` reads resolve against the pre-rollout ring
    contents with the exact nearest-timestamp semantics, and on exit the
    final circular histories are written back into the carry rings
    (``_rebuild_rings``) — chaining in EITHER direction
    (XLA -> fused -> XLA) is sample-exact.

    Constraints: n_zones <= 128; sensor zone/type statics uniform across
    the batch.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if rng == "hw" and interpret:
        raise ValueError("rng='hw' needs the TPU PRNG; pass rng='bits' "
                         "with explicit words for CPU/interpret runs")
    if n_steps % record_every:
        raise ValueError(f"n_steps={n_steps} must be a multiple of "
                         f"record_every={record_every}")

    rparams = params.reactor
    state = plant.reactor
    z = rparams.n_zones
    if z > _LANES:
        raise ValueError(f"fused plant supports n_zones <= {_LANES}")
    if rparams.nitrogen is not None or rparams.gas is not None \
            or rparams.particles is not None \
            or rparams.disinfection is not None \
            or rparams.biofilm is not None or rparams.phase is not None:
        raise ValueError("the fused plant kernel does not support the "
                         "nitrogen/gas/particle/disinfection/biofilm/"
                         "phase extensions; use the XLA integrated-plant "
                         "paths (plant_rollout_auto routes there "
                         "automatically)")

    # -- static per-sensor config (types, zones, delay structure) —
    #    derived from concrete params host-side, passed as hashable statics
    #    to the jit. Zones may be ANY zone (normalized); sample-line delays
    #    may differ per plant (d_static=None => per-plant path in-kernel).
    statics = sensor_statics(params, dt)

    # -- schedule handling: [n_steps]-leaf BoundaryConditions => per-step
    #    forcing streamed through SMEM (chunked sequential time grid axis)
    sched_lengths = {int(jnp.shape(x)[0])
                     for x in jax.tree_util.tree_leaves(boundary)
                     if jnp.ndim(x) >= 1}
    if sched_lengths:
        if sched_lengths != {n_steps}:
            raise ValueError(f"schedule leaves have length {sched_lengths}; "
                             f"expected n_steps={n_steps}")
        scheduled = True
    else:
        scheduled = False

    if layout == "auto":
        # "zl" always: the "pl" (plants-on-lanes) layout never beat it by
        # enough to matter (~1.2x at 16k plants) and large ensembles belong
        # on the XLA batched path anyway (see module docstring / the
        # measured crossover in models.plant.plant_rollout_auto). "pl" is
        # retained as an EXPERIMENTAL explicit opt-in only.
        layout = "zl"
    if layout not in ("zl", "pl"):
        raise ValueError(f"unknown layout {layout!r} (zl, pl, or auto)")

    if rng == "hw":
        bits = jnp.zeros((1,), jnp.int32)   # placeholder, kernel ignores
    return _fused_plant_jit(
        params, plant, boundary, bits, dt=dt, substeps=substeps,
        n_steps=n_steps, stages=stages, record_every=record_every,
        hw_rng=rng == "hw", seed=seed, interpret=interpret,
        statics_t=statics, consume_line=consume_line,
        scheduled=scheduled, sched_chunk=_PLANT_SCHED_CHUNK,
        layout=layout, ablate=_ABLATE)


@functools.partial(
    jax.jit,
    static_argnames=("dt", "substeps", "n_steps", "stages", "record_every",
                     "hw_rng", "interpret", "statics_t", "consume_line",
                     "scheduled", "sched_chunk", "layout", "ablate"))
def _fused_plant_jit(params, plant, boundary, bits, *, dt, substeps,
                     n_steps, stages, record_every, hw_rng, seed,
                     interpret, statics_t, consume_line, scheduled,
                     sched_chunk, layout, ablate):
    del ablate  # only a cache key: _ABLATE is read at trace time
    statics = {attr: {"zone": zone, "type": typ, "d_static": d_static,
                      "d_max": d_max}
               for attr, zone, typ, d_static, d_max in statics_t}
    rparams = params.reactor
    state = plant.reactor
    z = rparams.n_zones

    ph = jnp.asarray(state.pH)
    single = ph.ndim == 1
    batch = 1 if single else ph.shape[0]
    dtype = jnp.float32

    plants_per_row = _LANES // z if layout == "zl" else _LANES
    rows = -(-batch // plants_per_row)
    # The integrated kernel carries ~220 packed scalar columns plus four
    # sample-line histories per block: taller blocks than 16 rows blow the
    # Mosaic scoped-VMEM stack (compile-time OOM at 64 rows). In the
    # plants-on-lanes layout every physics intermediate is n_zones rows
    # tall, so its blocks cap at 8 (still 1024 plants per block).
    max_rows = min(_MAX_BLOCK_ROWS, 16 if layout == "zl" else 8)
    block_rows = 8 if rows <= 8 else min(-(-rows // 8) * 8, max_rows)
    rows_padded = -(-rows // block_rows) * block_rows

    # -- pack everything
    def pack_flat(x):
        """[B] per-plant values -> [rows_padded, 128], one plant per lane."""
        x = jnp.broadcast_to(jnp.asarray(x, dtype), (batch,))
        x = jnp.pad(x, (0, rows_padded * _LANES - batch))
        return x.reshape(rows_padded, _LANES)

    def prep(x):
        x = jnp.asarray(x, dtype)
        if single:
            x = x[None, :]
        if layout == "pl":
            # [B, Z] -> [Z, rows_padded, 128]
            x = jnp.pad(x, ((0, rows_padded * _LANES - batch), (0, 0)))
            return x.reshape(rows_padded, _LANES, z).transpose(2, 0, 1)
        return _pack_state(x, batch, z, plants_per_row, rows_padded, dtype)

    def pack_cols(values, names):
        if layout == "pl":
            return jnp.stack([pack_flat(values[n]) for n in names], axis=1)
        return _pack_planes(values, names, batch, z, plants_per_row,
                            rows_padded, dtype)

    def pack_physics_scalars(bc):
        vals = _param_values(rparams)
        vals.update({n: getattr(bc, n) for n in _BFIELDS})
        if layout == "pl":
            return pack_cols(vals, _COLS_ALL)
        return _pack_scalars(rparams, bc, batch, z, plants_per_row,
                             rows_padded, dtype)

    if scheduled:
        # boundary columns of the physics tensor are unused (the kernel
        # reads per-step scalars from the SMEM schedule); pack defaults
        scal = pack_physics_scalars(R.BoundaryConditions())
        fields = [jnp.broadcast_to(jnp.asarray(getattr(boundary, n), dtype),
                                   (n_steps,)) for n in _BFIELDS]
        sched = jnp.stack(fields, axis=1)
        chunk = min(sched_chunk, max(n_steps, 1))
        n_chunks = -(-n_steps // chunk)
        sched = jnp.pad(sched, ((0, n_chunks * chunk - n_steps), (0, 0)))
    else:
        scal = pack_physics_scalars(boundary)
        sched = jnp.zeros((1, _NBF), dtype)
        chunk, n_chunks = n_steps, 1

    pvals = {}
    for (attr, sub, field) in _PCOLS:
        src = getattr(params, attr)
        leaf = getattr(src.base if sub == "base" else src, field)
        pvals[(attr, sub, field)] = leaf
    sp_t = pack_cols(pvals, _PCOLS)

    cvals = {}
    for (attr, sub, field, kindtag) in _CCOLS:
        src = getattr(plant, attr)
        leaf = getattr(src.base if sub == "base" else src, field)
        leaf = jnp.asarray(leaf).astype(dtype)
        cvals[(attr, sub, field)] = leaf
    cin = pack_cols(cvals, [c[:3] for c in _CCOLS])

    # -- sample-line lead-in prefill (consume the incoming carry rings) and
    #    per-plant delay-step planes
    t0_arr = jnp.asarray(state.time, dtype)
    lead_planes, d_vals = {}, {}
    for a in _LINE_ATTRS:
        info = statics[a]
        sp_a = getattr(params, a)
        car_a = getattr(plant, a).base
        cap_a = info["d_max"] + 1
        delay_leaf = jnp.asarray(sp_a.base.line_delay_s, dtype)
        d_arr = jnp.maximum(jnp.round(delay_leaf / dt),
                            0.0).astype(jnp.int32)
        d_vals[a] = jnp.broadcast_to(d_arr.reshape(-1).astype(dtype)
                                     if d_arr.ndim else
                                     d_arr.astype(dtype).reshape(-1),
                                     (batch,))
        if consume_line and info["d_max"] > 0 \
                and getattr(sp_a.base, "line_capacity", 0) > 0:
            lead = _resolve_lead_in(car_a, delay_leaf, d_arr,
                                    info["d_max"], t0_arr, dt, batch)
        else:
            lead = jnp.full((cap_a, batch), jnp.nan, dtype)
        if layout == "pl":
            lead_planes[a] = jax.vmap(pack_flat)(lead)
        else:
            lead_planes[a] = jax.vmap(
                lambda v: _pack_state(
                    jnp.broadcast_to(v[:, None], (batch, z)), batch, z,
                    plants_per_row, rows_padded, dtype))(lead)
    dsteps = pack_cols(d_vals, list(_LINE_ATTRS))

    # Index maps take one grid coordinate per grid axis: (rows,) in
    # constant mode, (rows, time_chunks) when scheduled. Row-tiled blocks
    # ignore the time coordinate (constant in t = resident carry).
    grid = (rows_padded // block_rows, n_chunks) if scheduled \
        else (rows_padded // block_rows,)

    def bspec(shape, index):
        return pl.BlockSpec(shape, index, memory_space=pltpu.VMEM)

    if scheduled:
        row2 = lambda i, t: (i, 0)              # noqa: E731
        row3 = lambda i, t: (i, 0, 0)           # noqa: E731
        traj3_idx = lambda i, t: (0, i, 0)      # noqa: E731
        traj_idx = lambda i, t: (0, 0, i, 0)    # noqa: E731
        sched_block = pl.BlockSpec((chunk, _NBF), lambda i, t: (t, 0),
                                   memory_space=pltpu.SMEM)
        if hw_rng:
            bits = jnp.zeros((1, 1, rows_padded, _LANES), jnp.int32)
            bits_block = bspec((1, 1, block_rows, _LANES),
                               lambda i, t: (0, 0, i, 0))
        else:
            bits = jnp.asarray(bits, jnp.int32)
            expect = (n_steps, N_WORDS, rows_padded, _LANES)
            if bits.shape != expect:
                raise ValueError(f"bits shape {bits.shape} != {expect}")
            bits = jnp.pad(bits, ((0, n_chunks * chunk - n_steps),
                                  (0, 0), (0, 0), (0, 0)))
            bits_block = bspec((chunk, N_WORDS, block_rows, _LANES),
                               lambda i, t: (t, 0, i, 0))
    else:
        row2 = lambda i: (i, 0)                 # noqa: E731
        row3 = lambda i: (i, 0, 0)              # noqa: E731
        traj3_idx = lambda i: (0, i, 0)         # noqa: E731
        traj_idx = lambda i: (0, 0, i, 0)       # noqa: E731
        sched_block = pl.BlockSpec(memory_space=pltpu.SMEM)
        if hw_rng:
            bits = jnp.zeros((1, 1, rows_padded, _LANES), jnp.int32)
            bits_block = bspec((1, 1, block_rows, _LANES),
                               lambda i: (0, 0, i, 0))
        else:
            bits = jnp.asarray(bits, jnp.int32)
            expect = (n_steps, N_WORDS, rows_padded, _LANES)
            if bits.shape != expect:
                raise ValueError(f"bits shape {bits.shape} != {expect}")
            bits_block = bspec((n_steps, N_WORDS, block_rows, _LANES),
                               lambda i: (0, 0, i, 0))

    n_rec = n_steps // record_every
    block = bspec((block_rows, _LANES), row2)
    if layout == "pl":      # physics state [Z, rows, 128]
        state_block = bspec((z, block_rows, _LANES), traj3_idx)
        state_shape = (z, rows_padded, _LANES)
    else:
        state_block = block
        state_shape = (rows_padded, _LANES)
    scal_block = bspec((block_rows, scal.shape[1], _LANES), row3)
    sp_block = bspec((block_rows, N_PCOLS, _LANES), row3)
    c_block = bspec((block_rows, N_CCOLS, _LANES), row3)
    traj_block = bspec((n_rec, len(SENSORS), block_rows, _LANES), traj_idx)
    dsteps_block = bspec((block_rows, len(_LINE_ATTRS), _LANES), row3)
    lead_blocks = [bspec((statics[a]["d_max"] + 1, block_rows, _LANES),
                         traj3_idx) for a in _LINE_ATTRS]

    t0 = jnp.asarray(state.time, dtype).reshape(-1)[0]

    kernel = functools.partial(
        _plant_kernel, n_zones=z, dt=dt, substeps=substeps,
        n_steps=n_steps, block_rows=block_rows, stages=stages,
        record_every=record_every, hw_rng=hw_rng,
        statics={k: dict(v) for k, v in statics.items()},
        scheduled=scheduled, chunk=chunk, layout=layout)

    time_in = (jnp.zeros((1,), dtype) + t0)
    seed_in = jnp.zeros((1,), jnp.int32) + jnp.asarray(seed, jnp.int32)

    hist_specs = tuple(
        bspec((statics[a]["d_max"] + 1, block_rows, _LANES), traj3_idx)
        for a in _LINE_ATTRS)
    hist_shapes = tuple(
        jax.ShapeDtypeStruct((statics[a]["d_max"] + 1, rows_padded,
                              _LANES), dtype)
        for a in _LINE_ATTRS)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM), sched_block,
                  scal_block, sp_block, c_block, bits_block, dsteps_block]
        + lead_blocks
        + [state_block, state_block, state_block],
        out_specs=(state_block, state_block, state_block, block, c_block,
                   traj_block) + hist_specs,
        out_shape=(jax.ShapeDtypeStruct(state_shape, dtype),
                   jax.ShapeDtypeStruct(state_shape, dtype),
                   jax.ShapeDtypeStruct(state_shape, dtype),
                   jax.ShapeDtypeStruct((rows_padded, _LANES), dtype),
                   jax.ShapeDtypeStruct((rows_padded, N_CCOLS, _LANES),
                                        dtype),
                   jax.ShapeDtypeStruct((n_rec, len(SENSORS), rows_padded,
                                         _LANES), dtype)) + hist_shapes,
        interpret=interpret,
    )(time_in, seed_in, sched, scal, sp_t, cin, bits, dsteps,
      lead_planes["ph_inlet"], lead_planes["ph_outlet"],
      lead_planes["temp_inlet"], lead_planes["temp_outlet"],
      prep(state.pH), prep(state.chlorine), prep(state.temperature))

    (ph_f, cl_f, t_f, time_plane, cout, traj), hist_outs = \
        outs[:6], outs[6:]

    def unprep(x):
        if layout == "pl":      # [Z, rows, 128] -> [B, Z]
            x = x.transpose(1, 2, 0).reshape(rows_padded * _LANES, z)[:batch]
        else:
            x = _unpack_state(x, batch, z, plants_per_row)
        return x[0] if single else x

    def per_plant(plane):
        if layout == "pl":      # [rows, 128] -> [B]
            x = plane.reshape(rows_padded * _LANES)[:batch]
        else:
            x = _unpack_state(plane, batch, z, plants_per_row)[:, 0]
        return x[0] if single else x

    t_final = time_plane[0, 0] + 0.0 * t0  # scalar; t0 keeps dtype/trace

    def last(x):        # final boundary value (scheduled: last row applied)
        x = jnp.asarray(x, dtype)
        return x[n_steps - 1] if x.ndim else x

    total_flow = (last(boundary.inlet_flow_rate)
                  + last(boundary.acid_flow_rate)
                  + last(boundary.chlorine_flow_rate))
    new_reactor = R.ReactorState(
        time=t_final.astype(jnp.asarray(state.time).dtype)
        + jnp.zeros_like(jnp.asarray(state.time)),
        pH=unprep(ph_f), chlorine=unprep(cl_f), temperature=unprep(t_f),
        flow_rate=total_flow + jnp.zeros_like(jnp.asarray(state.flow_rate)),
    )
    new_reactor = R._update_derived(new_reactor)

    # -- rebuild the PlantState: updated scalar carries, pass-through keys,
    #    and RECONSTRUCTED delay rings (from the written-back circular
    #    histories, so a fused -> XLA continuation resolves its line
    #    lookups exactly; see _rebuild_rings)
    rings = {}
    for a, hist in zip(_LINE_ATTRS, hist_outs):
        info = statics[a]
        if info["d_max"] <= 0:
            continue
        old_carry = getattr(plant, a).base
        if old_carry.line_values is None:
            continue
        rings[a] = _rebuild_rings(hist, old_carry, info["d_max"], n_steps,
                                  t0, dt, batch, per_plant, dtype)

    sensors_new = {}
    for _, attr, kind in SENSORS:
        old = getattr(plant, attr)
        base_updates, overlay_updates = {}, {}
        for (a, sub, field, ktag) in _CCOLS:
            if a != attr:
                continue
            col = _CCOL[(a, sub, field)]
            val = per_plant(cout[:, col, :])
            ref_leaf = getattr(old.base if sub == "base" else old, field)
            if ktag == "b":
                val = val > 0.5
            elif ktag == "i":
                val = val.astype(jnp.int32)
            else:
                val = val.astype(jnp.asarray(ref_leaf).dtype)
            (base_updates if sub == "base" else overlay_updates)[field] = val
        if attr in rings:
            base_updates.update(rings[attr])
        new_base = dc_replace(old.base, **base_updates)
        sensors_new[attr] = dc_replace(old, base=new_base,
                                       **overlay_updates)

    new_plant = PlantState(reactor=new_reactor, **sensors_new)

    readings = {}
    for k, (rname, _, _) in enumerate(SENSORS):
        series = jax.vmap(per_plant)(traj[:, k])
        readings[rname] = series
    return new_plant, readings
