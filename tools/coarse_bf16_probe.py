"""Does bf16 STORAGE of the dense coarse inverse pay on the real TPU?

The two-level apply reads the (12.3k, 12.3k) f32 coarse inverse every CG
iteration (~605 MB ≈ 1.2 ms at HBM speed).  Storing it bf16 halves that
traffic.  This is different from the measured-fatal bf16 *computation* of
the inverse (docs/PERFORMANCE.md "TPU matmul-precision trap": a blocked-
Schur inverse built with bf16 MXU passes carries a NONSYMMETRIC O(1e-3)
error and degrades 58 -> 222 iters): entrywise bf16 rounding of a good f32
inverse keeps symmetry exactly, so CG sees a fixed symmetric (possibly
marginally indefinite) preconditioner.  The probe measures whether the
iteration count survives and the per-iteration time drops.

Run on the real TPU from the repo root:  timeout 1800 python tools/coarse_bf16_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fcvm_tpu.config import enable_compilation_cache, get_config

enable_compilation_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fcvm_tpu.ops import assembly as asm_ops
    from fcvm_tpu.ops import material as mat
    from fcvm_tpu.runtime import system as sysm
    from fcvm_tpu.utils.indexing import pad_ndof, pad_vector

    import bench

    dtype = jnp.float32
    nx = int(os.environ.get("FCVM_BENCH_NX", "27"))
    mesh, model = bench.build(nx)
    log(f"mesh: nn={mesh.n_nodes} ne={mesh.n_elements} ndof={mesh.ndof}")
    coords = jnp.asarray(mesh.coords, dtype)
    eln = jnp.asarray(mesh.elnodes)
    dmat = mat.hooke_dmat(jnp.asarray(bench.E, dtype), jnp.asarray(bench.NU, dtype))
    fixmask_np, u_fix_np, _ = model.bcs.masks(mesh.ndof)
    nd_pad = pad_ndof(mesh.ndof)
    fixmask = jnp.asarray(pad_vector(fixmask_np, nd_pad), dtype)
    u_fix = jnp.asarray(pad_vector(u_fix_np, nd_pad), dtype)
    lt = sysm.LoadTables.from_spec(model.loads, dtype)
    plan = asm_ops.build_scatter_plan(mesh.elnodes, nd_pad // 3)
    space = sysm.build_solve_space(mesh.coords, mesh.elnodes, fixmask, nd_pad)

    esm, pinv, glv, rhs, gpc, vol, ls = jax.block_until_ready(
        sysm.assemble_elastic(coords, eln, dmat, lt, jnp.asarray(0.0, dtype),
                              fixmask, u_fix, plan)
    )
    cfg = get_config()
    pc = jax.block_until_ready(
        sysm.build_precond(esm, eln, coords, fixmask,
                           cfg.resolve_cluster_size(mesh.n_nodes), space=space)
    )
    ci = pc.coarse_inv
    log(f"coarse dim: {ci.shape[0]}  f32 bytes: {ci.size * 4 / 1e6:.0f} MB")

    RTOL, MAXITER = 1e-5, 5000

    def run_case(name, pc_case):
        # warm compile
        r = jax.block_until_ready(
            sysm.solve_displacement(esm, eln, fixmask, pc_case, rhs, RTOL,
                                    MAXITER, plan=plan, space=space)
        )
        iters = int(r.iters)
        # axon caches (executable, args): time with per-call perturbed rhs
        times = []
        for j in range(3):
            b = rhs * (1.0 + 1e-6 * (j + 1))
            t0 = time.perf_counter()
            r = jax.block_until_ready(
                sysm.solve_displacement(esm, eln, fixmask, pc_case, b, RTOL,
                                        MAXITER, plan=plan, space=space)
            )
            times.append(time.perf_counter() - t0)
        t = min(times)
        log(f"{name}: {iters} iters, {t*1e3:7.1f} ms "
            f"({t*1e3/max(iters,1):.2f} ms/iter), relres {float(r.relres):.2e}")
        return iters, t

    it_f32, t_f32 = run_case("f32 coarse_inv ", pc)

    ci_bf16 = ci.astype(jnp.bfloat16)
    # symmetry check after rounding (entrywise rounding must preserve it)
    sym = bool(jnp.all(ci_bf16 == ci_bf16.T))
    log(f"bf16 rounded inverse symmetric: {sym}")
    pc_b = pc._replace(coarse_inv=ci_bf16)
    it_b, t_b = run_case("bf16 coarse_inv", pc_b)

    log(f"delta: {it_b - it_f32:+d} iters, {(t_b - t_f32)*1e3:+.1f} ms "
        f"({(t_b/t_f32 - 1)*100:+.1f}%)")


if __name__ == "__main__":
    main()
