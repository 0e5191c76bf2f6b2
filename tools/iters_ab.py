"""Minimal A/B probe: elastic-solve CG iteration count at bench scale.

Round-3 regression hunt: BENCH_r02 had 58 iters / deflated 29-38 at 499k
dof; the round-3 tree draws 78 / 73.  This rebuilds exactly bench.py's
elastic path (assembly -> two-level precond -> solve_displacement) and
prints iters + relres + timings, nothing else — cheap to run across
worktree states to bisect which change degraded the preconditioner.

Usage: python tools/iters_ab.py [nx] [coarse_max_dim]
  nx: bench mesh size (default 27 -> 499k dof)
  coarse_max_dim: override cfg.coarse_max_dim (capacity-regime A/B: the
    default 12288 cap means 645-node clusters at 1.98M dof vs 163 at
    499k — the suspected driver of the 51 -> 101 iteration growth)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from fcvm_tpu.config import enable_compilation_cache, get_config

enable_compilation_cache()

import bench  # mesh builder + constants

from fcvm_tpu.ops import assembly as asm_ops
from fcvm_tpu.ops import material as mat
from fcvm_tpu.runtime import system as sysm
from fcvm_tpu.utils.indexing import pad_ndof, pad_vector


def log(*a):
    print(*a, flush=True)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 27
    dtype = jnp.float32
    if len(sys.argv) > 2:
        c = get_config()
        c.coarse_max_dim = int(sys.argv[2])
        # the cluster-count cap otherwise clamps the dim at 18000
        c.coarse_max_clusters = max(
            c.coarse_max_clusters, -(-c.coarse_max_dim // c.coarse_modes)
        )
        log(f"coarse_max_dim override: {c.coarse_max_dim} "
            f"(max clusters {c.coarse_max_clusters})")
    mesh, model = bench.build(nx)
    log(f"mesh: nn={mesh.n_nodes} ne={mesh.n_elements} ndof={mesh.ndof}")
    coords = jnp.asarray(mesh.coords, dtype)
    eln = jnp.asarray(mesh.elnodes)
    dmat = mat.hooke_dmat(jnp.asarray(bench.E, dtype), jnp.asarray(bench.NU, dtype))
    fixmask_np, u_fix_np, _ = model.bcs.masks(mesh.ndof)
    nd_pad = pad_ndof(mesh.ndof)
    cfg = get_config()

    from fcvm_tpu.runtime.prewarm import start_transfer_opener

    start_transfer_opener(log=log)

    fixmask = jnp.asarray(pad_vector(fixmask_np, nd_pad), dtype)
    u_fix = jnp.asarray(pad_vector(u_fix_np, nd_pad), dtype)
    lt = sysm.LoadTables.from_spec(model.loads, dtype)
    plan = asm_ops.build_scatter_plan(mesh.elnodes, nd_pad // 3)
    space = sysm.build_solve_space(mesh.coords, mesh.elnodes, fixmask, nd_pad)

    t0 = time.perf_counter()
    esm, pinv, glv, rhs, gpc, vol, ls = jax.block_until_ready(
        sysm.assemble_elastic(
            coords, eln, dmat, lt, jnp.asarray(0.0, dtype), fixmask, u_fix, plan
        )
    )
    log(f"assembly cold: {time.perf_counter() - t0:.2f}s")

    cs = cfg.resolve_cluster_size(mesh.n_nodes)
    ncl = -(-mesh.n_nodes // cs)
    log(f"cluster size {cs} -> {ncl} clusters, coarse dim ~{ncl * cfg.coarse_modes}")
    t0 = time.perf_counter()
    pc = jax.block_until_ready(
        sysm.build_precond(
            esm, eln, coords, fixmask,
            cfg.resolve_cluster_size(mesh.n_nodes), space=space,
        )
    )
    log(f"precond build: {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    pc = jax.block_until_ready(
        sysm.build_precond(
            esm, eln, coords, fixmask,
            cfg.resolve_cluster_size(mesh.n_nodes), space=space,
        )
    )
    log(f"precond repeat: {time.perf_counter() - t0:.2f}s")
    from fcvm_tpu.ops.precond import COARSE_BUILD_STATS

    log(f"coarse build stats: {COARSE_BUILD_STATS}")

    for rep in range(2):
        t0 = time.perf_counter()
        res = sysm.solve_displacement(
            esm, eln, fixmask, pc, rhs, 1e-5, 5000, plan=plan, space=space,
        )
        iters = int(res.iters)
        relres = float(res.relres)
        log(
            f"elastic solve[{rep}]: {iters} iters, relres {relres:.2e}, "
            f"{time.perf_counter() - t0:.2f}s"
        )


if __name__ == "__main__":
    main()
