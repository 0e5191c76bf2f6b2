"""Decompose the capacity-regime reduce cost with HONEST chaining.

First version of this probe (and window_probe part A) timed gathers of
loop-INVARIANT operands inside the fori_loop — XLA hoists those out of
the loop entirely, producing fantasy 0.36 ns/idx rates.  Every variant
here is state-chained: the reduce input derives from the loop-carried
(nn, 3) vector through the real forward connectivity gather, exactly as
in the CG matvec, so nothing can be hoisted or elided.

Variants (all produce the next (nn, 3) state):

  r0. forward gather + einsum-free passthrough control:
      v' = 0.1 * (bucket-order concat WITHOUT the final invperm) — the
      reduce minus its output permutation
  r1. shipped scatter_node_rows (gather+sum buckets, concat, invperm)
  r2. scalar-space variant: per-bucket 1D gathers from the flattened
      stream (indices pre-expanded x3), reshape-sums, concat, invperm
  r3. plain segment_sum
  r4. invperm-only chain: v' = v[invperm-like permutation] — the cost of
      ONE (nn,) node-row permutation gather at this scale
  r5. shipped reduce with the invperm REPLACED by a sorted (identity)
      gather — structure identical, permutation monotone

r1 - r0 isolates the invperm cost; r4/r5 say whether it's the
permutation's jumpiness or the gather itself.

Run: FCVM_BENCH_NX=43 python tools/reduce_fuse_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fcvm_tpu.config import enable_compilation_cache

enable_compilation_cache()

import bench
from fcvm_tpu.ops import assembly as asm_ops
from fcvm_tpu.runtime import system as sysm
from fcvm_tpu.utils.indexing import pad_ndof, pad_vector


def log(*a):
    print(*a, flush=True)


def timeit_chain(step, state, iters, fetch, reps=4, consts=()):
    @jax.jit
    def run(state, *consts):
        state = jax.lax.fori_loop(0, iters, lambda i, s: step(s, *consts), state)
        return fetch(state), state

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        scalar, state = run(state, *consts)
        float(scalar)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[1:])) / iters


def main():
    nx = int(os.environ.get("FCVM_BENCH_NX", "43"))
    mesh, model = bench.build(nx)
    fixmask_np, _, _ = model.bcs.masks(mesh.ndof)
    nd_pad = pad_ndof(mesh.ndof)
    fixmask = jnp.asarray(pad_vector(fixmask_np, nd_pad), jnp.float32)
    space = sysm.build_solve_space(mesh.coords, mesh.elnodes, fixmask, nd_pad)
    plan = space.plan_m
    eln_m = np.asarray(space.elnodes_m)
    ne, nn = eln_m.shape[0], nd_pad // 3
    nrows = ne * 10
    log(f"nx={nx} ne={ne} nn={nn} nrows={nrows}")

    rng = np.random.default_rng(0)
    eln_dev = jnp.asarray(eln_m.reshape(-1).astype(np.int32))  # (nrows,)
    v0 = jnp.asarray(rng.normal(size=(nn, 3)).astype(np.float32))

    incs_np = [np.asarray(i, np.int64) for i in plan.inc]
    ntot = sum(i.size for i in incs_np)
    nz = nn - sum(i.shape[0] for i in incs_np)
    # scalar-space incs: row index r (or the nrows pad sentinel) -> 3r + c
    incs3 = [
        jnp.asarray(
            ((i[..., None] * 3 + np.arange(3)).reshape(i.shape[0], -1)).astype(
                np.int32
            )
        )
        for i in incs_np
    ]
    iters = 30
    scale = 0.999 / 7.25  # keep |v| stable (mean incidence ~7.25)

    def fwd(v):
        return v[eln_dev]  # (nrows, 3) forward connectivity gather

    def t(name, step):
        tt = timeit_chain(step, v0, iters, lambda v: v.sum())
        log(f"{name}: {tt * 1e3:.2f} ms")
        return tt

    def bucket_concat(rows3):
        rows_ext = jnp.concatenate([rows3, jnp.zeros((1, 3), rows3.dtype)])
        outs = [rows_ext[inc].sum(axis=1) for inc in tuple(plan.inc)]
        outs.append(jnp.zeros((nz, 3), rows3.dtype))
        return jnp.concatenate(outs)

    t("r0 reduce WITHOUT invperm (bucket-order out)",
      lambda v: scale * bucket_concat(fwd(v)))

    t("r1 shipped scatter_node_rows",
      lambda v: scale * asm_ops.scatter_node_rows(fwd(v), plan))

    def r2(v):
        rows3 = fwd(v)
        f = jnp.concatenate(
            [rows3, jnp.zeros((1, 3), rows3.dtype)]
        ).reshape(-1)
        outs = []
        for inc3 in incs3:
            g = f[inc3]  # (nb, Db*3) 1D gather
            nb, w = g.shape
            outs.append(g.reshape(nb, w // 3, 3).sum(axis=1))
        outs.append(jnp.zeros((nz, 3), jnp.float32))
        return scale * jnp.concatenate(outs)[plan.invperm]

    t("r2 scalar-space bucket gathers + invperm", r2)

    def r3(v):
        rows3 = fwd(v)
        return scale * jax.ops.segment_sum(rows3, eln_dev, num_segments=nn)

    t("r3 segment_sum", r3)

    perm = jnp.asarray(np.asarray(plan.invperm))
    t("r4 invperm row gather alone (chained)", lambda v: 0.999 * v[perm])
    ident = jnp.arange(nn, dtype=jnp.int32)
    t("r4b identity row gather alone (chained)", lambda v: 0.999 * v[ident])

    def r5(v):
        rows3 = fwd(v)
        return scale * bucket_concat(rows3)[ident]

    t("r5 shipped structure, identity perm", r5)

    # forward gather alone, chained: v' from a (nn,3)-shaped slice of rows
    def r6(v):
        rows3 = fwd(v)
        return 0.999 * rows3[:nn] + 1e-6 * rows3[nrows - nn:]

    t("r6 forward gather + two slices (control)", r6)


if __name__ == "__main__":
    main()
