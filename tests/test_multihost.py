"""Multi-host integration: 2 jax.distributed processes, cross-host map
weld over TCP blocks, joint sharded BA on the global 8-device mesh
(VERDICT r4 missing #2 / next-step #4). Drives apps/run_multihost.py the
way a 2-host deployment would, on the CPU rig (2 procs x 4 virtual
devices, gloo collectives)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
APP = os.path.join(ROOT, "apps", "run_multihost.py")


@pytest.mark.slow
def test_two_process_weld_and_joint_ba():
    env = dict(os.environ)
    # the app owns its device topology: drop the test harness's 8-device
    # single-process flags so each process boots 4 local CPU devices
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    coord = "localhost:9821"
    args = ["--coordinator", coord, "--map-port", "9822",
            "--n-frames", "80", "--n-points", "1000", "--ba-iters", "4"]
    p0 = subprocess.Popen(
        [sys.executable, APP, "--process-id", "0", *args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=ROOT, env=env)
    p1 = subprocess.Popen(
        [sys.executable, APP, "--process-id", "1", *args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=ROOT, env=env)
    try:
        out0, _ = p0.communicate(timeout=900)
        out1, _ = p1.communicate(timeout=300)
    except subprocess.TimeoutExpired:
        p0.kill()
        p1.kill()
        out0 = p0.communicate()[0] or ""
        out1 = p1.communicate()[0] or ""
        pytest.fail(f"multihost timeout\n--- p0:\n{out0[-3000:]}"
                    f"\n--- p1:\n{out1[-3000:]}")

    assert p0.returncode == 0, f"p0 failed:\n{out0[-3000:]}"
    assert p1.returncode == 0, f"p1 failed:\n{out1[-3000:]}"
    # both joined ONE global mesh
    assert "joined: 8 global devices" in out0
    assert "joined: 8 global devices" in out1
    # the weld actually moved keyframes across hosts
    assert "welded" in out0
    ok = [ln for ln in out0.splitlines() if ln.startswith("MULTIHOST OK")]
    assert ok, f"no success marker:\n{out0[-3000:]}"
    # merged-map accuracy after the joint solve
    ate = float(ok[0].split("ate_mm=")[1])
    assert ate < 120.0, f"merged-map ATE {ate} mm"
    assert "MULTIHOST OK (worker)" in out1
