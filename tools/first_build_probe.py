"""Per-stage timing of the FIRST two-level preconditioner build (fresh
process, 499k dof) — VERDICT round-2 item #6.

The bench's first-build number "breathes" (2.9 s ... 17.3 s across
sessions at identical config); the repeat build is stable (~1.6 s).  This
probe breaks the first build into its constituent jit programs and times
each stage's first call (compile-cache load + dispatch + compute) and
second call (compute only), so the spread can be attributed: cache-load
cost per executable vs tunnel state vs real compute.

Run from the repo root (fresh process each time):
    python tools/first_build_probe.py [nx]
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
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 27
    import jax
    import jax.numpy as jnp

    import fcvm_tpu
    from fcvm_tpu.models import meshgen
    from fcvm_tpu.ops import assembly as asm_ops
    from fcvm_tpu.ops import material as mat
    from fcvm_tpu.ops import precond as pre
    from fcvm_tpu.runtime import system as sysm
    from fcvm_tpu.utils.indexing import pad_ndof, pad_vector

    E, NU = 210000.0, 0.3
    LBOX, SIGMA = 10.0, 100.0
    dtype = jnp.float32

    t_start = time.perf_counter()
    mesh = meshgen.box_tet10(nx, nx, nx, LBOX, LBOX, LBOX)
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [
            (mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, None, None)),
            (mesh.select_nodes(lambda x, y, z: y < 1e-9), (None, 0.0, None)),
            (mesh.select_nodes(lambda x, y, z: z < 1e-9), (None, None, 0.0)),
        ]
    )
    faces = mesh.faces_on(lambda x, y, z: x > LBOX - 1e-9)
    loads = fcvm_tpu.Loads(
        traction_faces=faces, tractions=np.tile([SIGMA, 0, 0], (len(faces), 1))
    )
    model = fcvm_tpu.Model(mesh, fcvm_tpu.Material(E, NU), bcs, loads)
    log(f"mesh: nn={mesh.n_nodes} ne={mesh.n_elements} ndof={mesh.ndof} "
        f"(host setup {time.perf_counter() - t_start:.2f}s)")

    coords = jnp.asarray(mesh.coords, dtype)
    eln = jnp.asarray(mesh.elnodes)
    dmat = mat.hooke_dmat(jnp.asarray(E, dtype), jnp.asarray(NU, dtype))
    fixmask_np, u_fix_np, _ = model.bcs.masks(mesh.ndof)
    nd_pad = pad_ndof(mesh.ndof)
    fixmask = jnp.asarray(pad_vector(fixmask_np, nd_pad), dtype)
    u_fix = jnp.asarray(pad_vector(u_fix_np, nd_pad), dtype)
    lt = sysm.LoadTables.from_spec(model.loads, dtype)
    plan = asm_ops.build_scatter_plan(mesh.elnodes, nd_pad // 3)
    space = sysm.build_solve_space(mesh.coords, mesh.elnodes, fixmask, nd_pad)

    t0 = time.perf_counter()
    esm, pinv, glv, rhs, gpc, vol, ls = jax.block_until_ready(
        sysm.assemble_elastic(
            coords, eln, dmat, lt, jnp.asarray(0.0, dtype), fixmask, u_fix,
            plan,
        )
    )
    log(f"assembly (cold): {time.perf_counter() - t0:.2f}s")

    cfg = get_config()
    cs = cfg.resolve_cluster_size(mesh.n_nodes)
    n_modes = cfg.coarse_modes
    esm_m = esm[space.eperm]
    eln_m = space.elnodes_m
    coords_m = space.coords_m
    fixmask_m = space.fixmask_m
    jax.block_until_ready(esm_m)

    stages = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        t2 = time.perf_counter() - t0
        stages[name] = (t1, t2)
        log(f"  {name}: first {t1:.3f}s repeat {t2:.3f}s")
        return out

    log("stage timings (first = cache-load + dispatch + compute):")
    timed("block_jacobi", lambda: pre._block_jacobi_jit(esm_m, eln_m, fixmask_m))
    qmat_bc = timed(
        "qmat_bc", lambda: pre._qmat_bc_jit(coords_m, fixmask_m, cs, n_modes)
    )
    kc = timed(
        "coarse_accumulate",
        lambda: pre._coarse_accumulate_jit(esm_m, eln_m, qmat_bc, cs),
    )
    timed(
        "coarse_invert(+ladder sync)",
        lambda: pre.invert_coarse_with_ladder(kc, esm_m.dtype),
    )

    t0 = time.perf_counter()
    pc = jax.block_until_ready(
        sysm.build_precond(esm, eln, coords, fixmask, cs, space=space)
    )
    t_full = time.perf_counter() - t0
    first_sum = sum(v[0] for v in stages.values())
    repeat_sum = sum(v[1] for v in stages.values())
    log(f"full build_precond after stages warm: {t_full:.2f}s")
    log(f"stage sums: first {first_sum:.2f}s, repeat {repeat_sum:.2f}s; "
        f"cache/dispatch overhead = {first_sum - repeat_sum:.2f}s")


if __name__ == "__main__":
    main()
