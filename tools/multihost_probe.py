"""Probe: does jax.distributed (gloo) multi-process CPU work here?

Spawns N_PROC processes, each with N_LOCAL virtual CPU devices, builds a
global 1-axis mesh, device_puts a host array with an element-partition
sharding, runs a shard_map psum, and fetches a replicated scalar.
"""

import os
import subprocess
import sys

N_PROC = 2
N_LOCAL = 4

CHILD = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address="127.0.0.1:45679",
    num_processes=%(np)d,
    process_id=pid,
    cluster_detection_method="deactivate",
)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
devs = jax.devices()
assert len(devs) == %(np)d * %(nl)d, (pid, len(devs))
mesh = Mesh(np.array(devs), ("e",))
sh_e = NamedSharding(mesh, P("e"))
sh_r = NamedSharding(mesh, P())
x_host = np.arange(16, dtype=np.float32)
x = jax.device_put(x_host, sh_e)          # global device_put of host data
u = jax.device_put(np.ones(3, np.float32), sh_r)

def local(xl, ur):
    return jax.lax.psum(jnp.sum(xl) * ur, "e")

f = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=(P("e"), P()), out_specs=P()))
y = f(x, u)
val = float(y[0])
assert abs(val - 120.0) < 1e-6, val
print(f"proc {pid}: ok val={val}", flush=True)
""" % {"np": N_PROC, "nl": N_LOCAL}


def main():
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={N_LOCAL}"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PYTHONPATH", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD, str(pid)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    rc = 0
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        print(f"--- proc {pid} rc={p.returncode} ---")
        print(out[-2000:])
        rc |= p.returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()
