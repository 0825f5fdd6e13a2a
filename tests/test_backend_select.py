"""
Deadline-bounded backend selection (utils/backend_select.py).

Round-3 regression: MULTICHIP_r03 timed out (rc=124) because
``jax.devices()`` hangs forever inside a wedged TPU tunnel's PJRT plugin
init — an *exception* guard can't catch a *hang*, and jax's backend
registry lock means no in-process fallback exists once the hang starts.
These tests prove the three defenses: (1) the subprocess probe's deadline
actually fires on a hanging child, (2) a multi-device request never
touches the default backend at all, and (3) a failed probe falls back to
CPU and the entry points still complete.
"""

import os
import subprocess
import sys
import time

import pytest

from ics_wt_physicsengine_tpu.utils.backend_select import (
    ProbeResult, probe_default_backend, select_devices)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_probe_deadline_fires_on_hanging_child():
    """A child that hangs in backend init (simulated by sleep) is killed at
    the deadline instead of blocking forever — the exact MULTICHIP_r03
    failure mode."""
    t0 = time.monotonic()
    res = probe_default_backend(deadline=1.5, retries=1,
                                _code="import time; time.sleep(60)")
    elapsed = time.monotonic() - t0
    assert not res.ok
    assert "deadline" in res.reason
    assert elapsed < 10.0, f"deadline did not bound the probe: {elapsed}s"


def test_probe_parses_healthy_child():
    res = probe_default_backend(deadline=30.0, retries=1,
                                _code="print('PROBE_OK cpu 8')")
    assert res.ok
    assert res.platform == "cpu"
    assert res.n_devices == 8


def test_probe_reports_crashing_child():
    res = probe_default_backend(deadline=30.0, retries=1,
                                _code="raise RuntimeError('tunnel down')")
    assert not res.ok
    assert "rc=1" in res.reason
    assert "tunnel down" in res.reason


def test_probe_retries_until_success():
    calls = []

    def runner(cmd, **kw):
        calls.append(1)
        if len(calls) < 2:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))
        return subprocess.run([sys.executable, "-c",
                               "print('PROBE_OK cpu 4')"],
                              capture_output=True, text=True)

    res = probe_default_backend(deadline=1.0, retries=3, _runner=runner)
    assert res.ok and len(calls) == 2


def test_probe_deadline_escalates_per_attempt():
    """Retry N gets an N-times-longer deadline: transient host load (a
    saturated single core slowing a HEALTHY tunnel's init past the base
    deadline — observed live during a concurrent test-suite run) must not
    burn every retry at the same short deadline and demote the working
    accelerator to degraded CPU numbers."""
    timeouts = []

    def runner(cmd, **kw):
        timeouts.append(kw.get("timeout"))
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))

    res = probe_default_backend(deadline=7.0, retries=3, _runner=runner)
    assert not res.ok
    assert timeouts == [7.0, 14.0, 21.0]
    assert "21s deadline" in res.reason


def test_multi_device_request_never_touches_wedged_default():
    """In a FRESH process whose default backend is the (possibly wedged)
    tunnel — JAX_PLATFORMS is inherited from the container env — a
    multi-device request must pin the virtual CPU mesh immediately, without
    ever initializing the default backend. Bounded by a subprocess timeout
    far below the tunnel's observed multi-minute hangs."""
    code = (
        "from ics_wt_physicsengine_tpu.utils.backend_select import "
        "select_devices\n"
        "ds = select_devices(4)\n"
        "print('GOT', ds[0].platform, len(ds))\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=90, cwd=REPO)
    assert r.returncode == 0, r.stderr[-500:]
    assert "GOT cpu 4" in r.stdout


def test_single_device_falls_back_to_cpu_on_failed_probe():
    """When the probe says the default backend is unusable, a fresh process
    pins CPU and still returns a working device."""
    code = (
        "from ics_wt_physicsengine_tpu.utils import backend_select as bs\n"
        "bs.probe_default_backend = lambda *a, **k: bs.ProbeResult(\n"
        "    False, None, 0, 'simulated wedged tunnel')\n"
        "ds = bs.select_devices(1)\n"
        "print('GOT', ds[0].platform, len(ds))\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=90, cwd=REPO)
    assert r.returncode == 0, r.stderr[-500:]
    assert "GOT cpu 1" in r.stdout


def test_bench_degrades_to_real_cpu_measurement_on_unusable_backend():
    """bench.py with an unusable accelerator prints ONE parseable JSON
    line and exits 0 — and since round 4 that line carries a REAL
    degraded CPU measurement (XLA scan paths only) with degraded=true
    and the probe-failure reason, instead of value 0.0 / ok=false
    (BENCH_r03's rc=1 mode is two contracts ago)."""
    import json

    code = (
        "from ics_wt_physicsengine_tpu.utils import backend_select as bs\n"
        # the real ensure_default_backend PINS cpu before reporting it
        # (env vars alone are overridden by the accelerator plugin's
        # registration); the fake must honor that contract or the bench
        # body would touch the broken default backend
        "bs.ensure_default_backend = lambda **k: (bs.pin_cpu(1), "
        "('cpu', 'simulated: probe timeout'))[1]\n"
        "import bench\n"
        "bench.ensure_default_backend = bs.ensure_default_backend\n"
        "bench.main()\n")
    env = dict(os.environ)
    env.pop("BENCH_ALLOW_CPU", None)
    # Force cpu so importing bench's package deps can't touch the tunnel.
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-500:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["ok"] is True
    assert rec["degraded"] is True
    assert "probe timeout" in rec["reason"]
    assert rec["unit"] == "steps/s"
    assert rec["value"] > 0
    assert rec["extra"]["backend"] == "cpu"


def test_select_devices_in_initialized_process():
    """Inside the test session (backends already up, cpu x8) selection is a
    pure enumeration — no probe subprocess, no config mutation."""
    devs = select_devices(8)
    assert len(devs) == 8 and devs[0].platform == "cpu"
    with pytest.raises(RuntimeError, match="no backend can supply"):
        select_devices(10_000)


def test_probe_result_shape():
    r = ProbeResult(True, "cpu", 8, "ok")
    assert (r.ok, r.platform, r.n_devices) == (True, "cpu", 8)
