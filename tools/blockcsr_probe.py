"""Block-CSR (node-pair 3x3 block) matvec vs the shipped element matvec.

The shipped operator is matrix-free: forward row gather (1.18M idx at
~2.5 ns/idx) + element einsum + ScatterPlan node reduce (1.18M idx at
~5.5-7 ns/idx — the jumpy inverse map, 9.8 ms of the 14.4 ms iteration,
docs/PERFORMANCE.md).  A pre-assembled block-CSR matvec has ~1.96x the
index count (4.63M unique node pairs on the 499k-dof bench mesh) but ALL
of it in forward-local order (neighbor ids are Morton-close to the row
node) and writes its output rows in node order — no reduce at all.  If
block-CSR gathers run at the forward rate, the matvec goes ~12.7 ->
~11 ms (neutral); if locality beats the estimate it could win ~20%.
This probe measures it honestly (chained fori_loop, host scalar fetch).

Run on the real TPU from the repo root:
    timeout 1800 python tools/blockcsr_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fcvm_tpu.config import enable_compilation_cache

enable_compilation_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_blockcsr(elnodes_m: np.ndarray, esm_m: np.ndarray, nn: int):
    """Host-side: unique (i, j) node-pair 3x3 blocks, exact-degree buckets.

    Returns (buckets, invperm) where each bucket is (nodes, nbr, blocks):
    nodes (nb,) Morton row ids ascending, nbr (nb, deg) neighbor node ids,
    blocks (nb, deg, 3, 3) f32.  Rows come out bucket-concatenated;
    invperm maps back to node order (same trick as ScatterPlan).
    """
    ne = elnodes_m.shape[0]
    i = np.repeat(elnodes_m, 10, axis=1).ravel().astype(np.int64)
    j = np.tile(elnodes_m, (1, 10)).ravel().astype(np.int64)
    key = i * nn + j
    uniq, inv = np.unique(key, return_inverse=True)
    # element sub-blocks (ne*100, 3, 3) -> accumulate per unique pair
    sub = (
        esm_m.reshape(ne, 10, 3, 10, 3)
        .transpose(0, 1, 3, 2, 4)
        .reshape(-1, 3, 3)
        .astype(np.float64)
    )
    blocks = np.empty((len(uniq), 3, 3), np.float32)
    for a in range(3):
        for b in range(3):
            blocks[:, a, b] = np.bincount(
                inv, weights=sub[:, a, b], minlength=len(uniq)
            )
    rows = (uniq // nn).astype(np.int64)
    cols = (uniq % nn).astype(np.int64)
    deg = np.bincount(rows, minlength=nn)
    ofs = np.zeros(nn + 1, np.int64)
    np.cumsum(deg, out=ofs[1:])

    buckets = []
    covered = 0
    for d in np.unique(deg):
        if d == 0:
            continue
        nodes = np.where(deg == d)[0]
        idx = ofs[nodes][:, None] + np.arange(d)[None, :]
        buckets.append(
            (nodes, cols[idx].astype(np.int32), blocks[idx])
        )
        covered += len(nodes)
    zero_nodes = np.where(deg == 0)[0]
    order = np.concatenate([b[0] for b in buckets] + [zero_nodes])
    invperm = np.empty(nn, np.int64)
    invperm[order] = np.arange(nn)
    nnz = len(uniq)
    pad = sum(b[1].size for b in buckets)
    log(
        f"block-CSR: nnz={nnz} ({nnz / (2 * ne * 10):.2f}x element idx), "
        f"{len(buckets)} exact-degree buckets, padded idx {pad} "
        f"(+{pad / nnz - 1:.1%})"
    )
    return buckets, invperm.astype(np.int32)


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
    nn_pad = nd_pad // 3
    fixmask = jnp.asarray(pad_vector(fixmask_np, nd_pad), dtype)
    u_fix = jnp.asarray(pad_vector(u_fix_np, nd_pad), dtype)
    lt = sysm.LoadTables.from_spec(model.loads, dtype)
    plan = asm_ops.build_scatter_plan(mesh.elnodes, nn_pad)
    space = sysm.build_solve_space(mesh.coords, mesh.elnodes, fixmask, nd_pad)

    esm, *_ = jax.block_until_ready(
        sysm.assemble_elastic(coords, eln, dmat, lt, jnp.asarray(0.0, dtype),
                              fixmask, u_fix, plan)
    )
    esm_m = jax.block_until_ready(esm[space.eperm])
    eldofs = asm_ops.element_dof_ids(space.elnodes_m)

    t0 = time.perf_counter()
    buckets, invperm_np = build_blockcsr(
        np.asarray(jax.device_get(space.elnodes_m)),
        np.asarray(jax.device_get(esm_m), dtype=np.float64),
        nn_pad,
    )
    log(f"host CSR build: {time.perf_counter() - t0:.1f} s (one-time probe cost)")

    nbrs = [jnp.asarray(b[1]) for b in buckets]
    blks = [jnp.asarray(b[2], dtype) for b in buckets]
    invperm = jnp.asarray(invperm_np)
    nzero = nn_pad - sum(b[0].shape[0] for b in buckets)

    # big operands (element blocks 425 MB, CSR blocks ~170 MB) are jit
    # ARGUMENTS — a closure over them trips the axon remote-compile payload
    # limit (HTTP 413); the small index tables stay closures
    def f_ref(esm_a, u):
        return asm_ops.make_matvec(esm_a, eldofs, nd_pad, plan=space.plan_m)(u)

    def f_csr(blks_a, u):
        x3 = u.reshape(nn_pad, 3)
        outs = [
            jnp.einsum("ndab,ndb->na", bb, x3[nb])
            for nb, bb in zip(nbrs, blks_a)
        ]
        outs.append(jnp.zeros((nzero, 3), u.dtype))
        return jnp.concatenate(outs)[invperm].reshape(-1)

    def f_gather_floor(_, u):
        # index traffic only: same gathers, no block math
        x3 = u.reshape(nn_pad, 3)
        outs = [x3[nb].sum(axis=1) for nb in nbrs]
        outs.append(jnp.zeros((nzero, 3), u.dtype))
        return jnp.concatenate(outs)[invperm].reshape(-1)

    # correctness
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(nd_pad), dtype)
    y_ref = jax.block_until_ready(jax.jit(f_ref)(esm_m, x))
    y_csr = jax.block_until_ready(jax.jit(f_csr)(blks, x))
    err = float(jnp.max(jnp.abs(y_csr - y_ref)) / jnp.max(jnp.abs(y_ref)))
    log(f"correctness: rel max err {err:.2e}")
    assert err < 5e-5, "block-CSR disagrees with the element operator"

    # honest timing: ITERS chained passes inside one jit
    ITERS = 50

    def chained(f):
        def run(p, u):
            def body(_, v):
                w = f(p, v)
                return w * jax.lax.rsqrt(jnp.vdot(w, w) + 1e-30)
            return jax.lax.fori_loop(0, ITERS, body, u)
        return jax.jit(run)

    for name, f, p in (
        ("element+ScatterPlan", f_ref, esm_m),
        ("block-CSR", f_csr, blks),
        ("block-CSR gather floor", f_gather_floor, blks),
    ):
        run = chained(f)
        _ = float(run(p, x).sum())  # compile
        times = []
        for k in range(3):
            xk = x * (1.0 + 1e-6 * (k + 1))
            t0 = time.perf_counter()
            _ = float(run(p, xk).sum())
            times.append(time.perf_counter() - t0)
        t = min(times) / ITERS
        log(f"{name:26s}: {t * 1e3:7.2f} ms/matvec")


if __name__ == "__main__":
    main()
