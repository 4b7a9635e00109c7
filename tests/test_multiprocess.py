"""Real multi-PROCESS execution (VERDICT r1 item 6; SURVEY.md §2.4).

Launches two OS processes that each call jax.distributed.initialize and
jointly execute a data-parallel train step plus a sharded Langevin sweep
chunk over one global 4-device mesh (2 CPU devices per process, Gloo
collectives across the process boundary). Asserts both workers succeed
and report IDENTICAL global results — the SPMD invariant.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(os.name != "posix", reason="needs posix subprocesses")
def test_two_process_distributed_train_and_sweep(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via --platform
    env["MP_SMOKE_CKPT"] = str(tmp_path / "mp_smoke_ckpt.npz")
    workers = [
        subprocess.Popen(
            [sys.executable, "-m",
             "score_based_channels_tpu.parallel.mp_smoke",
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(i),
             "--platform", "cpu"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for i, w in enumerate(workers):
        try:
            out, _ = w.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for ww in workers:
                ww.kill()
            pytest.fail(f"worker {i} timed out")
        outs.append(out)
    for i, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {i} failed:\n{out}"
    lines = [next(ln for ln in out.splitlines() if "MP_SMOKE_OK" in ln)
             for out in outs]
    # strip the per-process pid field; every global value must match
    stripped = [" ".join(t for t in ln.split() if not t.startswith("pid="))
                for ln in lines]
    assert stripped[0] == stripped[1], lines
    assert "procs=2 devs=4" in stripped[0], lines
    # the save→restore→estimate cycle ran and the restored state matched
    assert "ckpt=ok" in stripped[0], lines
