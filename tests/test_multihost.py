"""2-process jax.distributed verification (the parallel_physically mode).

Reference: nuc_control/deploy_nuc.sh:17 — per-host launches of
main_distributed(i). Here two OS processes form one jax.distributed
cluster (4 virtual CPU devices each), the vehicle mesh axis spans both
processes, and the sharded run must equal the sequential one (the
reference's systemtest invariant across computation modes).
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.parametrize("scenario,port", [
    ("circle", 29517),
    # the hard path: non-convex outlines + lanelet boundaries exchanged
    # over the cross-process collective
    ("commonroad", 29523),
])
def test_two_process_distributed_run(scenario, port):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coordinator = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests._multihost_worker",
             coordinator, "2", str(pid), scenario],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{out[-3000:]}"
        )
        assert "ok=True" in out, f"worker {pid}:\n{out[-3000:]}"
    # both processes computed the same replicated summary
    lines = [
        next(ln for ln in out.splitlines() if ln.startswith("RESULT"))
        for out in outputs
    ]
    sums = [ln.split("pose_sum=")[1].split()[0] for ln in lines]
    assert sums[0] == sums[1], f"divergent results: {lines}"
