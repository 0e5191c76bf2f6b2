"""Sub-stage timing of the dense coarse inverse first call (fresh process,
499k dof -> 12.3k coarse dim, blocked-Schur path).

Companion to tools/first_build_probe.py: that probe shows the warm-cache
first build is dominated by coarse_invert (~28 s first vs 0.76 s repeat).
This one attributes it to the individual jit programs + the eager
slice/concatenate ops inside _blocked_spd_inverse.
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

    esm = jax.block_until_ready(
        sysm.assemble_elastic(
            coords, eln, dmat, lt, jnp.asarray(0.0, dtype), fixmask, u_fix,
            plan,
        )
    )[0]
    cfg = get_config()
    cs = cfg.resolve_cluster_size(mesh.n_nodes)
    esm_m = esm[space.eperm]
    qmat_bc = pre._qmat_bc_jit(space.coords_m, space.fixmask_m, cs,
                               cfg.coarse_modes)
    kc = jax.block_until_ready(
        pre._coarse_accumulate_jit(esm_m, space.elnodes_m, qmat_bc, cs)
    )
    log(f"kc shape {kc.shape}; coarse dim "
        f"{cfg.coarse_modes * (qmat_bc.shape[0] // cs)}")

    def timed(name, fn, n=2):
        outs = []
        for i in range(n):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn())
            outs.append(time.perf_counter() - t0)
        log(f"  {name}: " + " ".join(f"{t:.3f}s" for t in outs))
        return out

    ridge = jnp.asarray(3.0e-4, kc.dtype)
    log("coarse_invert sub-stages:")
    kc_scaled, dscale = timed(
        "densify_scale", lambda: pre._coarse_densify_scale(kc, ridge)
    )
    n = kc_scaled.shape[0]
    h = (n + 1) // 2
    a = timed("slice a (eager)", lambda: kc_scaled[:h, :h])
    b = timed("slice b (eager)", lambda: kc_scaled[:h, h:])
    c = timed("slice c (eager)", lambda: kc_scaled[h:, h:])
    a_inv = timed(f"fused_spd_inv32({h})", lambda: pre._fused_spd_inv32(a))
    s = timed("schur_complement", lambda: pre._schur_complement(a_inv, b, c))
    s_inv = timed(f"fused_spd_inv32 S({s.shape[0]})",
                  lambda: pre._fused_spd_inv32(s))
    tl, tr = timed("schur_assemble", lambda: pre._schur_assemble(a_inv, b, s_inv))
    top = timed("concat top (eager)", lambda: jnp.concatenate([tl, tr], axis=1))
    bot = timed("concat bot (eager)",
                lambda: jnp.concatenate([tr.T, s_inv], axis=1))
    inv = timed("concat full (eager)",
                lambda: jnp.concatenate([top, bot], axis=0))
    inv = timed("newton_schulz", lambda: pre._newton_schulz_refine(inv, kc_scaled))
    timed("finite check (sync)", lambda: jnp.all(jnp.isfinite(inv)))

    t0 = time.perf_counter()
    jax.block_until_ready(pre.invert_coarse_with_ladder(kc, kc.dtype))
    log(f"full invert_coarse_with_ladder after warm: "
        f"{time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
