"""Multi-process (multi-host-style) launch: two OS processes, each owning
2 local CPU devices, form one 4-device global mesh via
jax.distributed.initialize and compute a cross-process collective
(parity: the torch.multiprocessing.spawn + init_process_group NCCL stack,
/root/reference/utils/multiprocessing.py:8-58, utils/misc.py:437-453 —
collapsed to one initialize call per host)."""

import os
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from brainfm_tpu.parallel.mesh import init_distributed, make_mesh

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
rank, count = init_distributed(f"localhost:{port}", nproc, pid)
assert count == nproc and rank == pid
mesh = make_mesh(data=jax.device_count(), space=1)
x = np.ones((jax.local_device_count(),), np.float32) * (rank + 1)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), x)
s = jax.jit(lambda a: jnp.sum(a),
            out_shardings=NamedSharding(mesh, P()))(arr)
print(f"GLOBALSUM {float(s)}", flush=True)
os._exit(0)
"""


def test_two_process_global_mesh(tmp_path):
    # dynamic port (a fixed one collides with concurrent runs) and a long
    # deadline: under a saturated machine the coordination handshake +
    # 2x CPU jit can exceed 240 s (observed flake, 2026-08-21)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = ""
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    # ranks contribute (1+1) + (2+2) over their 2 local devices each
    for out in outs:
        assert "GLOBALSUM 6.0" in out, out[-2000:]
