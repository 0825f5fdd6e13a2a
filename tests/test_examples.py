"""Smoke-run every example script end-to-end (subprocess, CPU, tiny args).

The examples are the user-facing front door; without execution coverage an
API change can silently rot them. Each runs as a real `python examples/x.py`
subprocess (its own backend selection, sys.path bootstrap, CLI parsing) with
parameters small enough for the 1-core host, and must exit 0 with its
expected output marker. The persistent jax compilation cache keeps repeat
runs fast.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, args, timeout=420):
    env = dict(os.environ)
    # Hermetic: pin the subprocess to CPU. The container's default backend
    # is a tunneled TPU whose health (wedged tunnel, a concurrent bench on
    # the same chip) must not decide this suite's outcome — a contended
    # tunnel has SIGSEGV'd an example subprocess mid-run. Default-backend
    # probing/fallback has its own deadline-bounded unit coverage
    # (tests/test_backend_select.py, test_orchestrator.py).
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, (script, out.stdout[-2000:],
                                 out.stderr[-2000:])
    return out.stdout


def test_monte_carlo_uq():
    out = _run("monte_carlo_uq.py",
               ["--cpu", "--plants", "16", "--hours", "0.02"])
    assert '"plants": 16' in out


def test_monte_carlo_uq_with_sensors():
    out = _run("monte_carlo_uq.py",
               ["--cpu", "--plants", "8", "--hours", "0.02",
                "--with-sensors"])
    assert "measured-values" in out


def test_monte_carlo_uq_dosing_program():
    out = _run("monte_carlo_uq.py",
               ["--cpu", "--plants", "8", "--hours", "0.02",
                "--with-sensors", "--dosing-program"])
    assert "dosing-program" in out


def test_treatment_train():
    out = _run("treatment_train.py",
               ["--cpu", "--hours", "0.25", "--doses", "4"])
    assert "booster sweep" in out and "finished-water residual" in out


def test_clarifier_train():
    out = _run("clarifier_train.py",
               ["--cpu", "--hours", "0.25", "--doses", "4"])
    assert "coagulant sweep" in out and "class split" in out


def test_winter_operations():
    out = _run("winter_operations.py",
               ["--cpu", "--days", "0.5", "--dt", "600"])
    assert "hours_of_surface_ice" in out and "plateau_note" in out


def test_parameter_estimation():
    out = _run("parameter_estimation.py",
               ["--cpu", "--steps", "60", "--iters", "25"])
    assert "recovered" in out.lower() or "error" in out.lower()


def test_zone_sharded_highres():
    out = _run("zone_sharded_highres.py",
               ["--cpu", "--zones", "64", "--steps", "20"])
    assert "zones" in out.lower()


def test_enkf_highres():
    out = _run("enkf_highres.py",
               ["--cpu", "--zones", "16", "--members", "32",
                "--steps", "10"])
    assert "OK" in out and "NOT CONVERGED" not in out


def test_dosing_program_hil():
    out = _run("dosing_program_hil.py", ["--cpu", "--hours", "0.05"])
    assert out.strip()


def test_pid_controller_spawn():
    out = _run("pid_controller.py",
               ["--spawn", "--iterations", "15", "--period", "0.1"])
    assert "setpoint" in out.lower() or "iter" in out.lower()


def test_fleet_farm_spawn():
    out = _run("fleet_farm.py", ["--units", "2", "--iterations", "20"])
    assert '"fleet_units": 2' in out


def test_opcua_scada_spawn():
    out = _run("opcua_scada.py",
               ["--spawn", "--publishes", "20", "--interval", "0.15"])
    assert "subscribed:" in out
    assert "pushed data changes" in out


def test_ekf_soft_sensor_spawn():
    out = _run("ekf_soft_sensor.py", ["--spawn", "--ticks", "8"])
    assert "estimated Cl profile" in out
    assert "soft sensor assimilated 8 ticks" in out


@pytest.mark.parametrize("module,marker", [
    ("ics_wt_physicsengine_tpu.core", "ALL"),
    ("ics_wt_physicsengine_tpu.sensors", "Demo complete."),
    ("ics_wt_physicsengine_tpu.sensors.validation", "PASSED"),
    ("ics_wt_physicsengine_tpu.modbus", "Demo complete."),
])
def test_package_demo_mains(module, marker):
    """The runnable package demos (`python -m ...`) — the counterpart of
    the reference's per-module __main__ blocks — must complete quickly on
    the CPU backend regardless of the session's default device."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-m", module], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, (module, out.stdout[-1500:],
                                 out.stderr[-1500:])
    assert marker in out.stdout, (module, out.stdout[-1500:])


def test_relay_autotune():
    out = _run("relay_autotune.py",
               ["--switches", "4", "--verify-iterations", "20"],
               timeout=420)
    assert "ultimate_gain_Ku" in out and "ziegler_nichols_PI" in out


def test_pid_controller_feedforward():
    out = _run("pid_controller.py",
               ["--spawn", "--iterations", "15", "--period", "0.1",
                "--feedforward"])
    assert "setpoint" in out.lower() or "iter" in out.lower()


def test_plot_history_tool(tmp_path):
    """tools/plot_history.py renders a trends PNG from logged history
    (the reference roadmap's 'trending and visualization' item)."""
    pytest.importorskip("matplotlib")
    csv = tmp_path / "h.csv"
    csv.write_text(
        "sim_time,pH_inlet,pH_outlet,chlorine_inlet,chlorine_outlet,"
        "flow_main,temp_inlet,temp_outlet,acid_cmd,chlorine_cmd,"
        "inlet_flow_cmd,any_fault\n"
        + "\n".join(f"{t},7.2,7.1,1.5,1.2,5.0,20.0,19.8,0.1,0.2,5.0,0"
                    for t in range(0, 600, 60)) + "\n")
    png = tmp_path / "h.png"
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plot_history.py"),
         str(csv), "-o", str(png)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=180)
    assert out.returncode == 0, out.stderr[-1000:]
    assert png.exists() and png.stat().st_size > 10_000


def test_pid_tuning_sweep():
    out = _run("pid_tuning_sweep.py",
               ["--cpu", "--gains", "16", "--steps", "20",
                "--refine-iters", "3"])
    # grid sizing floors at 2*2*4*4 = 64 candidates
    assert '"n_gains": 64' in out and '"tuned"' in out


def test_chloramine_curve():
    out = _run("chloramine_curve.py",
               ["--cpu", "--doses", "8", "--contact-min", "2"])
    assert '"stoich_ratio_Cl2_N": 5.062' in out


def test_web_hmi(tmp_path):
    """tools/web_hmi.py (the reference roadmap's 'Web-based HMI' row):
    serves the dashboard + JSON state of a live plant and writes validated
    commands through to the holding registers."""
    import json
    import socket
    import threading
    import time
    import urllib.error
    import urllib.request

    import ics_wt_physicsengine_tpu.__main__ as orch
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import web_hmi

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    mb_port = free_port()
    orch.running = True
    sim = threading.Thread(
        target=orch.main,
        args=(["--port", str(mb_port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "1000000", "--rtf", "0", "--zones", "4",
               "--seed", "6"],), daemon=True)
    sim.start()
    deadline = time.time() + 60
    server = None
    while time.time() < deadline:
        try:
            server = web_hmi.serve("127.0.0.1", mb_port, "127.0.0.1", 0)
            break
        except OSError:
            time.sleep(0.3)
    assert server is not None, "could not attach HMI to the plant"
    http = threading.Thread(target=server.serve_forever, daemon=True)
    http.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"Web HMI" in page
        state = json.loads(urllib.request.urlopen(
            base + "/api/state", timeout=10).read())
        assert "pH_inlet" in state["inputs"]
        assert state["coils"]["simulation_running"] is True

        req = urllib.request.Request(
            base + "/api/command",
            data=json.dumps({"register": "acid_flow_rate",
                             "value": 99.0}).encode(), method="POST",
            headers={"Content-Type": "application/json"})
        resp = json.loads(urllib.request.urlopen(req, timeout=10).read())

        # Write-path hardening (docs/SECURITY.md): non-JSON content types
        # (a cross-site form post) and oversized bodies are rejected.
        for data, hdrs, want in [
            (b"register=acid_flow_rate&value=99",
             {"Content-Type": "application/x-www-form-urlencoded"}, 415),
            (b"{" + b" " * 8192 + b"}",
             {"Content-Type": "application/json"}, 413),
        ]:
            bad = urllib.request.Request(base + "/api/command", data=data,
                                         method="POST", headers=hdrs)
            try:
                urllib.request.urlopen(bad, timeout=10)
                raise AssertionError("hostile POST was accepted")
            except urllib.error.HTTPError as e:
                assert e.code == want, (e.code, want)
        assert resp["ok"] and resp["applied"] == 2.0   # HMI-side clamp
        state = json.loads(urllib.request.urlopen(
            base + "/api/state", timeout=10).read())
        assert state["commands"]["acid_flow_rate"] == pytest.approx(2.0)

        # Prometheus scrape endpoint (trending/Grafana roadmap row)
        metrics = urllib.request.urlopen(
            base + "/metrics", timeout=10).read().decode()
        assert "# TYPE wt_sim_measurement gauge" in metrics
        assert 'wt_sim_command{register="acid_flow_rate"} 2.0' in metrics
        assert 'wt_sim_coil{coil="simulation_running"} 1' in metrics
        assert 'wt_sim_sensor_fault{sensor=' in metrics
        # FC 08 wire diagnostics surfaced as Prometheus counters
        assert "# TYPE wt_sim_modbus_diagnostic counter" in metrics
        assert 'wt_sim_modbus_diagnostic{counter="bus_message_count"}' \
            in metrics
    finally:
        server.shutdown()
        server.hmi.close()
        orch.running = False
        sim.join(timeout=30)


def test_mpc_dosing():
    out = _run("mpc_dosing.py",
               ["--cpu", "--minutes", "40", "--zones", "4",
                "--output-feedback"])
    assert '"mpc_beats_pid"' in out
    assert '"score_ISE_vs_truth"' in out

def test_surrogate_mpc():
    out = _run("surrogate_mpc.py",
               ["--cpu", "--traj", "48", "--minutes", "15",
                "--train-steps", "400", "--rollout-steps", "50"])
    assert "one_step_skill_vs_identity" in out
    assert "surrogate_mpc" in out and "physics_mpc" in out

def test_surrogate_from_historian():
    out = _run("surrogate_from_historian.py",
               ["--cpu", "--lanes", "8", "--steps", "120", "--burn",
                "20", "--train-steps", "400", "--rollout-steps", "50",
                "--mpc-minutes", "0"], timeout=600)
    assert "ekf_midzone_cl_rmse_mgL" in out
    assert "true_one_step_skill_vs_identity" in out
