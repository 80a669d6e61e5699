"""Multi-process sharding test: 2 local CPU processes x 4 virtual devices
form a global (2, 4) mesh; images shard across processes ('data' ~ DCN),
restart segments across each process's devices ('seg' ~ ICI).

SURVEY.md §4.4: jax.distributed multi-process tests on localhost; the
shard_map code is identical on a real pod."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_grid(nproc: int, local_devices: int, batch: int, timeout: int):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port),
             str(local_devices), str(batch)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "MULTIHOST_OK" in out, (out, err[-2000:])
    return outs


@pytest.mark.slow
def test_two_process_sharded_decode():
    _run_grid(nproc=2, local_devices=4, batch=4, timeout=240)


@pytest.mark.slow
def test_four_process_eight_device_mixed_geometry():
    """VERDICT r1 item 8: full_decode_step under 4 processes x 8 virtual
    devices each (32-device global mesh), mixed-geometry batch, bit-exact
    on every addressable shard."""
    outs = _run_grid(nproc=4, local_devices=8, batch=8, timeout=480)
    # Record the per-geometry scaling lines (visible with pytest -s).
    for _, out, _ in outs[:1]:
        for line in out.splitlines():
            if line.startswith("GEOM"):
                print(line)
