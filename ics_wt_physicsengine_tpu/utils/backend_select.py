"""
Deadline-bounded JAX backend selection for the driver entry points.

Why this module exists: on a wedged TPU tunnel, ``jax.devices()`` can hang
FOREVER inside the PJRT plugin's ``make_c_api_client`` — it does not raise.
Worse, jax's backend registry initializes every registered platform under a
global lock, so once any thread is stuck inside ``backends()`` no other
thread can fall back to ``jax.devices("cpu")`` either: a watchdog thread
cannot rescue the process. The only safe sequence is to decide BEFORE the
first backend touch in this process:

1. If backends are already initialized, enumeration is a cached dict
   lookup — no hang possible; go straight to in-process selection.
2. Otherwise probe the default backend in a SUBPROCESS with a hard
   deadline. The child inherits the environment, so it resolves exactly
   the backend the parent would; if the child hangs, it is killed at the
   deadline and the parent never touches that backend.
3. On probe failure/timeout — or when the caller needs more devices than
   the tunneled single chip can ever supply — pin this process to the CPU
   backend via ``jax.config`` BEFORE any backend init. Env vars are too
   late here: the container pre-sets ``JAX_PLATFORMS`` and a
   sitecustomize imports jax at interpreter startup, so only the config
   API reliably reroutes selection (same trick as tests/conftest.py).

Counterpart in the reference: none — this is driver-contract plumbing for
the TPU framework (reference ``__main__.py:371-379`` degrades Modbus, not
compute backends).
"""

import os
import re
import subprocess
import sys
import time
from dataclasses import dataclass

import jax
import numpy as np

_PROBE_CODE = (
    "import jax, numpy as np\n"
    "ds = jax.devices()\n"
    "x = jax.device_put(np.zeros(8, np.float32), ds[0])\n"
    "np.asarray(x)\n"
    "print('PROBE_OK', ds[0].platform, len(ds), flush=True)\n"
)


def _null_log(msg):  # pragma: no cover - default sink
    pass


def backends_initialized() -> bool:
    """True if this process has already initialized jax backends (in which
    case enumeration cannot hang and config-level rerouting is moot)."""
    try:
        from jax._src import xla_bridge as xb
        return bool(xb._backends)
    except Exception:
        # Private API moved: assume initialized (the conservative answer —
        # we skip config updates that would raise after initialization).
        return True


@dataclass
class ProbeResult:
    ok: bool
    platform: str | None
    n_devices: int
    reason: str


def probe_default_backend(deadline: float = 45.0, retries: int = 2,
                          log=_null_log, _code: str | None = None,
                          _runner=None) -> ProbeResult:
    """Prove (in a killable subprocess) that the default jax backend can
    enumerate devices and round-trip an array within ``deadline`` seconds.

    ``_code``/``_runner`` are test seams: tests substitute a sleeping child
    to verify the deadline actually fires (tests/test_backend_select.py).

    The deadline ESCALATES per attempt (1x, 2x, 3x...): a healthy-but-slow
    init (transient host load — observed when the suite saturates the
    single core) must not burn every retry at the same short deadline and
    spuriously demote a working accelerator to CPU numbers; a truly wedged
    tunnel is still bounded by the sum of the escalated deadlines.
    """
    reason = "probe never ran"
    runner = _runner or subprocess.run
    for attempt in range(max(1, retries)):
        t0 = time.monotonic()
        attempt_deadline = deadline * (attempt + 1)
        try:
            r = runner([sys.executable, "-c", _code or _PROBE_CODE],
                       capture_output=True, text=True,
                       timeout=attempt_deadline)
        except subprocess.TimeoutExpired:
            reason = (f"backend probe hit the {attempt_deadline:.0f}s "
                      f"deadline (wedged backend init, attempt "
                      f"{attempt + 1})")
            log(reason)
            continue
        dt = time.monotonic() - t0
        out = (r.stdout or "").strip().splitlines()
        mark = [ln for ln in out if ln.startswith("PROBE_OK")]
        if r.returncode == 0 and mark:
            _, platform, count = mark[-1].split()
            log(f"backend probe ok in {dt:.1f}s: {platform} x{count}")
            return ProbeResult(True, platform, int(count), "ok")
        err = (r.stderr or "").strip().splitlines()
        reason = (f"backend probe failed rc={r.returncode} in {dt:.1f}s"
                  + (f": {err[-1][:200]}" if err else ""))
        log(reason)
        time.sleep(min(2.0, deadline / 10))
    return ProbeResult(False, None, 0, reason)


def pin_cpu(n_devices: int = 1, log=_null_log) -> None:
    """Reroute this (backend-uninitialized) process to the CPU backend,
    ensuring at least ``n_devices`` virtual host devices exist."""
    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if m:
        if int(m.group(1)) < n_devices:
            os.environ["XLA_FLAGS"] = flags.replace(
                m.group(0),
                f"--xla_force_host_platform_device_count={n_devices}")
    elif n_devices > 1:
        jax.config.update("jax_num_cpu_devices", n_devices)
    jax.config.update("jax_platforms", "cpu")
    log(f"pinned backend to cpu (>= {n_devices} virtual devices)")


def select_devices(n_devices: int, probe_deadline: float = 45.0,
                   log=_null_log):
    """Pick ``n_devices`` *working* devices without ever risking a hang.

    Multi-device requests (n > 1) can never be satisfied by the tunneled
    single TPU chip, so they pin CPU immediately — a wedged tunnel is never
    on the critical path (VERDICT r3 item 1). Single-device requests probe
    the default backend under a subprocess deadline first.
    """
    if not backends_initialized():
        if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
            # Explicit cpu request: pin it (the axon plugin registration
            # overrides the env var with jax_platforms="axon,cpu", so the
            # env alone would still route init through the tunnel).
            pin_cpu(n_devices, log=log)
        elif n_devices > 1:
            log(f"{n_devices} devices requested: single-chip tunnel can "
                "never satisfy this — selecting virtual CPU mesh directly")
            pin_cpu(n_devices, log=log)
        else:
            res = probe_default_backend(probe_deadline, log=log)
            if not res.ok:
                log(f"default backend unusable ({res.reason})")
                pin_cpu(n_devices, log=log)
    # Backend init is now safe: cpu, subprocess-proven default, or already
    # initialized. The transfer probe below still guards against backends
    # that enumerate but cannot execute (MULTICHIP_r01's failure mode).
    candidates = []
    try:
        candidates.append(list(jax.devices()))
    except Exception:
        pass
    try:
        cpu = list(jax.devices("cpu"))
        if not candidates or candidates[0][0].platform != "cpu":
            candidates.append(cpu)
    except Exception:
        pass

    for devs in candidates:
        if len(devs) < n_devices:
            continue
        try:
            probe = jax.device_put(np.zeros(8, np.float32), devs[0])
            np.asarray(probe)  # force the round trip
            return devs[:n_devices]
        except Exception:
            continue
    counts = [f"{d[0].platform}:{len(d)}" for d in candidates]
    raise RuntimeError(
        f"no backend can supply {n_devices} working devices "
        f"(candidates: {counts or 'none initialized'})")


def ensure_default_backend(min_devices: int = 1, probe_deadline: float = 60.0,
                           retries: int = 2, log=_null_log):
    """For whole-program consumers (bench.py): guarantee that subsequent
    jax calls in this process cannot hang, and report what backend they
    will get. Returns ``(platform, reason)``; ``reason`` is "ok" when the
    default backend passed its probe."""
    if backends_initialized():
        return jax.default_backend(), "ok"
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # The user explicitly asked for cpu. The env var alone is NOT
        # enough — the axon plugin's registration force-updates
        # jax_platforms to "axon,cpu" at import, so without this pin the
        # probe would still init (and possibly hang on) the tunnel.
        pin_cpu(min_devices, log=log)
        return "cpu", "ok"
    res = probe_default_backend(probe_deadline, retries=retries, log=log)
    if res.ok:
        return res.platform, "ok"
    pin_cpu(min_devices, log=log)
    return "cpu", res.reason


def enable_compile_cache(log=_null_log) -> None:
    """Point jax at the repo's persistent compilation cache (the same one
    tests/conftest.py uses) — on this single-core host, cold XLA compiles
    dominate entry-point wall time. No-op if backends already initialized
    or the config was already set."""
    cache = os.path.abspath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..",
        ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        log(f"compile cache: {cache}")
    except Exception as e:  # never let cache plumbing kill an entry point
        log(f"compile cache unavailable: {type(e).__name__}")
