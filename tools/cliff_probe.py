"""Gather-locality-cliff experiments at capacity scale (nx from
FCVM_BENCH_NX, default 43 -> 1.98M dof).

Measured (iter_probe.py, v5e): the forward row gather degrades from
2.5 ns/idx at 499k dof to 5.6 ns/idx at 2M (node table 24 MB), and the
ScatterPlan reduce from 7 to 9.6 ns/idx (stream 57 MB) — the >0.5M-node
HBM-locality cliff.  Hypothesis: the per-element gather repeats each node
~7.2x; gathering each *unique* node once per element chunk (jumpy, but
7x fewer indices) into a small per-chunk table and redistributing locally
(fast small-table gathers) beats the flat gather.

  g1. baseline          u3 = u[eln_m]                (4.77M idx, 24 MB src)
  g2. dedup two-level   u_loc[c] = u[uids[c]]; u3[c] = u_loc[c][lids[c]]

Chained fori_loop + host fetch (see bw_probe.py header).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fcvm_tpu.config import enable_compilation_cache

enable_compilation_cache()

import bench
from fcvm_tpu.runtime import system as sysm
from fcvm_tpu.utils.indexing import pad_ndof, pad_vector


def log(*a):
    print(*a, flush=True)


def timeit_chain(step, state, iters, fetch, reps=4, consts=()):
    @jax.jit
    def run(state, *consts):
        state = jax.lax.fori_loop(
            0, iters, lambda i, s: step(s, *consts), state
        )
        return fetch(state), state

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        scalar, state = run(state, *consts)
        float(scalar)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[1:])) / iters


def build_dedup_plan(eln_m: np.ndarray, chunk: int):
    """Per-chunk unique node ids (padded) + local indices.

    Returns uids (nch, umax) int32 (padded with 0) and lids (nch, chunk, 10)
    int32 into the per-chunk table.
    """
    ne = eln_m.shape[0]
    nch = -(-ne // chunk)
    pad = nch * chunk - ne
    eln_p = np.concatenate([eln_m, np.zeros((pad, 10), eln_m.dtype)]) if pad else eln_m
    uids_list, lids_list = [], []
    umax = 0
    for c in range(nch):
        sl = eln_p[c * chunk : (c + 1) * chunk]
        u, inv = np.unique(sl, return_inverse=True)
        uids_list.append(u)
        lids_list.append(inv.reshape(chunk, 10))
        umax = max(umax, len(u))
    umax = -(-umax // 128) * 128  # lane-align the table length
    uids = np.zeros((nch, umax), np.int32)
    for c, u in enumerate(uids_list):
        uids[c, : len(u)] = u
    lids = np.stack(lids_list).astype(np.int32)
    return jnp.asarray(uids), jnp.asarray(lids), umax


def main():
    nx = int(os.environ.get("FCVM_BENCH_NX", "43"))
    dtype = jnp.float32
    mesh, model = bench.build(nx)
    log(f"mesh: nn={mesh.n_nodes} ne={mesh.n_elements} ndof={mesh.ndof}")
    nd_pad = pad_ndof(mesh.ndof)
    nn_pad = nd_pad // 3
    fixmask_np, _, _ = model.bcs.masks(mesh.ndof)
    fixmask = jnp.asarray(pad_vector(fixmask_np, nd_pad), dtype)
    space = sysm.build_solve_space(mesh.coords, mesh.elnodes, fixmask, nd_pad)
    eln_m = np.asarray(space.elnodes_m)
    ne = eln_m.shape[0]

    from fcvm_tpu.runtime.prewarm import start_transfer_opener

    start_transfer_opener(log=log)

    key = jax.random.PRNGKey(0)
    u0 = jax.random.normal(key, (nd_pad,), dtype)
    eln_d = jnp.asarray(eln_m)

    # g1: flat row gather (production)
    def g1(u, eln):
        u3 = u.reshape(nn_pad, 3)[eln]  # (ne, 10, 3)
        return (u3.sum(axis=(1, 2)) * 1e-9).repeat(-(-nd_pad // ne))[:nd_pad] + u

    t = timeit_chain(g1, u0, 30, lambda s: s.sum(), consts=(eln_d,))
    log(f"g1 flat gather:        {t * 1e3:8.2f} ms  "
        f"({t / (ne * 10) * 1e9:.2f} ns/idx)")

    for chunk in (32768, 65536):
        uids, lids, umax = build_dedup_plan(eln_m, chunk)
        nch = uids.shape[0]
        nuniq = nch * umax
        log(f"chunk={chunk}: nch={nch} umax={umax} "
            f"unique-gather idx={nuniq} ({nuniq / (ne * 10):.2f} of flat)")

        def g2v(u, uids, lids):
            u3n = u.reshape(nn_pad, 3)
            u_loc = u3n[uids]  # (nch, umax, 3)
            u3 = jax.vmap(lambda t, i: t[i])(u_loc, lids)  # (nch, chunk, 10, 3)
            return (u3.sum(axis=(1, 2, 3)) * 1e-9).repeat(
                -(-nd_pad // nch))[:nd_pad] + u

        t = timeit_chain(g2v, u0, 30, lambda s: s.sum(),
                         consts=(uids, lids))
        log(f"g2 dedup two-level:    {t * 1e3:8.2f} ms  (chunk={chunk})")


if __name__ == "__main__":
    main()
