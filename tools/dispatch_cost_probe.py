"""Un-chained back-to-back dispatch timing: the round-4 verdict's named
probe.  Times INDIVIDUAL launches (dispatch -> block_until_ready) of the
same executables the chained probes measured at phase parity, local vs
sharded (1-device mesh), at the bench scale.  If a sharded (shard_map /
collective-bearing) program costs ~seconds per LAUNCH on the remote
runtime while the local equivalent costs ~milliseconds, the sharded
backend's per-step handicap is launch overhead — unfixable by reducing
dispatch count, only by putting more iterations inside one launch.

Every launch perturbs its input (axon result-cache rule).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcvm_tpu.config import enable_compilation_cache, get_config

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from fcvm_tpu.runtime.backend import LocalSystem, make_backend  # noqa: E402

NX = int(os.environ.get("FCVM_PROBE_NX", "27"))
N_LAUNCH = int(os.environ.get("FCVM_PROBE_LAUNCHES", "10"))


def time_launches(label, fn, x0):
    # warm (compile/load) launch first
    x = fn(x0)
    jax.block_until_ready(x)
    ts = []
    for k in range(N_LAUNCH):
        xp = x0 * (1.0 + 1e-6 * (k + 1))  # distinct args per launch
        jax.block_until_ready(xp)
        t0 = time.perf_counter()
        y = fn(xp)
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts) * 1e3
    print(f"[{label}] per-launch ms: min {ts.min():.1f} median "
          f"{np.median(ts):.1f} max {ts.max():.1f}  all "
          f"{[f'{t:.0f}' for t in ts]}", flush=True)
    return float(np.median(ts))


def main():
    cfg = get_config()
    mesh, model = bench.build(NX)
    dtype = jnp.float32

    # local backend operator
    be_l = LocalSystem(model, cfg, dtype)
    esm_l, pinv_l, glv_l, rhs_l, *_ = be_l.assemble(model.mesh.coords)
    pc_l = be_l.make_pc(esm_l, pinv_l, jnp.asarray(model.mesh.coords, dtype))

    # sharded backend on a 1-device mesh (the graded-row configuration)
    old = cfg.force_sharded
    cfg.force_sharded = True
    try:
        be_s = make_backend(model, cfg, dtype)
    finally:
        cfg.force_sharded = old
    esm_s, pinv_s, glv_s, rhs_s, *_ = be_s.assemble(model.mesh.coords)
    pc_s = be_s.make_pc(esm_s, pinv_s, jnp.asarray(model.mesh.coords, dtype))

    # 1) full PCG solve launches (the per-NR-iteration hot program)
    t_l = time_launches(
        "local solve", lambda b: be_l.solve(esm_l, pc_l, b).x, rhs_l
    )
    t_s = time_launches(
        "sharded solve", lambda b: be_s.solve(esm_s, pc_s, b).x, rhs_s
    )
    print(f"solve launch ratio sharded/local: {t_s / t_l:.2f}", flush=True)

    # 2) tangent-refresh launches (assembly + follower loads + warm
    # predictor solve — the per-NR-iteration companion program)
    ue_l = be_l.solve(esm_l, pc_l, rhs_l).x
    ue_s = be_s.solve(esm_s, pc_s, rhs_s).x
    pgp_l = be_l.gauss_false()
    pgp_s = be_s.gauss_false()
    sig0_l = be_l.gauss_zeros((6,))
    sig0_s = be_s.gauss_zeros((6,))
    coords = jnp.asarray(model.mesh.coords, dtype)
    du_l = 0.1 * ue_l

    t_tan_l = time_launches(
        "local tangent",
        lambda d: be_l.tangent_refresh(coords, sig0_l, pgp_l, d, du_l,
                                       pc_l, 0.1, ue0=ue_l)[3],
        0.05 * ue_l,
    )
    t_tan_s = time_launches(
        "sharded tangent",
        lambda d: be_s.tangent_refresh(coords, sig0_s, pgp_s, d, du_l,
                                       pc_s, 0.1, ue0=ue_s)[3],
        0.05 * ue_s,
    )
    print(f"tangent launch ratio sharded/local: {t_tan_s / t_tan_l:.2f}",
          flush=True)

    # 3) residual (stress update + reduce) launches
    sy_l = be_l.gauss_full(25.0)
    sy_s = be_s.gauss_full(25.0)
    r_l = time_launches(
        "local residual",
        lambda d: be_l.residual(coords, sy_l, jnp.zeros_like(ue_l), d,
                                sig0_l, glv_l, 1.0, 1.0, 0.1, True)[4],
        ue_l,
    )
    r_s = time_launches(
        "sharded residual",
        lambda d: be_s.residual(coords, sy_s, jnp.zeros_like(ue_s), d,
                                sig0_s, glv_s, 1.0, 1.0, 0.1, True)[4],
        ue_s,
    )
    print(f"residual launch ratio sharded/local: {r_s / r_l:.2f}",
          flush=True)

    # 4) fused newton_iteration launches (refresh=False variant)
    def fused_l(b):
        return be_l.newton_iteration(
            coords, sy_l, jnp.zeros_like(ue_l), 0.05 * ue_l, sig0_l,
            glv_l, 0.0, 0.1, 1.0, ue_l, ue_l, b, 0.1, esm_l, pc_l,
            False, True,
        ).r

    def fused_s(b):
        return be_s.newton_iteration(
            coords, sy_s, jnp.zeros_like(ue_s), 0.05 * ue_s, sig0_s,
            glv_s, 0.0, 0.1, 1.0, ue_s, ue_s, b, 0.1, esm_s, pc_s,
            False, True,
        ).r

    f_l = time_launches("local fused-iter", fused_l, glv_l)
    f_s = time_launches("sharded fused-iter", fused_s, glv_s)
    print(f"fused-iter launch ratio sharded/local: {f_s / f_l:.2f}",
          flush=True)

    # 5) deflation machinery launches: the production tangent path
    # re-Galerkins a held residual space (make_deflation) and deflates the
    # predictor with a load-space basis (tangent w-variant) every refresh
    rng = np.random.default_rng(1)
    w_np = rng.normal(size=(be_l.ndof_pad, 32)).astype(np.float32)
    w_l = jnp.asarray(w_np) * be_l.space.fixmask_m[:, None]
    w_s = jnp.asarray(w_np) * be_s.space.fixmask_m[:, None]

    d_l = time_launches(
        "local make_deflation",
        lambda wv: be_l.make_deflation(esm_l, wv).kw_inv, w_l,
    )
    d_s = time_launches(
        "sharded make_deflation",
        lambda wv: be_s.make_deflation(esm_s, wv).kw_inv, w_s,
    )
    print(f"make_deflation launch ratio sharded/local: {d_s / d_l:.2f}",
          flush=True)

    t_tanw_l = time_launches(
        "local tangent+w",
        lambda d: be_l.tangent_refresh(coords, sig0_l, pgp_l, d, du_l,
                                       pc_l, 0.1, ue0=ue_l, w=w_l)[3],
        0.05 * ue_l,
    )
    t_tanw_s = time_launches(
        "sharded tangent+w",
        lambda d: be_s.tangent_refresh(coords, sig0_s, pgp_s, d, du_l,
                                       pc_s, 0.1, ue0=ue_s, w=w_s)[3],
        0.05 * ue_s,
    )
    print(f"tangent+w launch ratio sharded/local: "
          f"{t_tanw_s / t_tanw_l:.2f}", flush=True)

    # 6) deflated solve launches (the steady-state production solve)
    defl_l = be_l.make_deflation(esm_l, w_l)
    defl_s = be_s.make_deflation(esm_s, w_s)
    sd_l = time_launches(
        "local solve+defl",
        lambda b: be_l.solve(esm_l, pc_l, b, defl=defl_l).x, rhs_l,
    )
    sd_s = time_launches(
        "sharded solve+defl",
        lambda b: be_s.solve(esm_s, pc_s, b, defl=defl_s).x, rhs_s,
    )
    print(f"solve+defl launch ratio sharded/local: {sd_s / sd_l:.2f}",
          flush=True)

    # 7) FRESH-OPERAND launches: production differs from the sections
    # above in one key way — every tangent refresh hands the next solve a
    # brand-new 425 MB block array, while the probes above reuse one esm
    # buffer.  If the remote runtime content-hashes call arguments for its
    # (executable, args) result cache with per-buffer memoization, a fresh
    # big operand costs a full rehash per launch.  Time solves against a
    # different fresh esm buffer each launch, plus a repeat against one.
    import gc

    fresh_l = [esm_l * (1.0 + 1e-7 * (k + 1)) for k in range(5)]
    jax.block_until_ready(fresh_l)
    ts = []
    for k in range(5):
        t0 = time.perf_counter()
        y = be_l.solve(fresh_l[k], pc_l, rhs_l).x
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    print(f"[local solve, fresh esm each] s: "
          f"{[f'{t:.2f}' for t in ts]}", flush=True)
    t0 = time.perf_counter()
    y = be_l.solve(fresh_l[4], pc_l, rhs_l * 1.000001).x
    jax.block_until_ready(y)
    print(f"[local solve, repeat same esm new rhs] {time.perf_counter()-t0:.2f}s",
          flush=True)
    del fresh_l, y
    gc.collect()

    fresh_s = [esm_s * (1.0 + 1e-7 * (k + 1)) for k in range(5)]
    jax.block_until_ready(fresh_s)
    ts = []
    for k in range(5):
        t0 = time.perf_counter()
        y = be_s.solve(fresh_s[k], pc_s, rhs_s).x
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    print(f"[sharded solve, fresh esm each] s: "
          f"{[f'{t:.2f}' for t in ts]}", flush=True)
    t0 = time.perf_counter()
    y = be_s.solve(fresh_s[4], pc_s, rhs_s * 1.000001).x
    jax.block_until_ready(y)
    print(f"[sharded solve, repeat same esm new rhs] {time.perf_counter()-t0:.2f}s",
          flush=True)


if __name__ == "__main__":
    main()
