import time, sys
import jax
import jax.numpy as jnp, numpy as np
import fcvm_tpu
from fcvm_tpu.models import meshgen
from fcvm_tpu.ops import assembly as asm_ops, material as mat
from fcvm_tpu.runtime import system as sysm
from fcvm_tpu.utils.indexing import pad_ndof, pad_vector
from fcvm_tpu.config import get_config

nx=27
dtype = jnp.float32
mesh = meshgen.box_tet10(nx,nx,nx,10.,10.,10.)
bcs = fcvm_tpu.BoundaryConditions.from_node_sets([
    (mesh.select_nodes(lambda x,y,z: x<1e-9),(0.,None,None)),
    (mesh.select_nodes(lambda x,y,z: y<1e-9),(None,0.,None)),
    (mesh.select_nodes(lambda x,y,z: z<1e-9),(None,None,0.))])
faces = mesh.faces_on(lambda x,y,z: x>10-1e-9)
loads = fcvm_tpu.Loads(traction_faces=faces, tractions=np.tile([100.,0,0],(len(faces),1)))
model = fcvm_tpu.Model(mesh, fcvm_tpu.Material(210000.,0.3), bcs, loads)
coords = jnp.asarray(mesh.coords, dtype); eln = jnp.asarray(mesh.elnodes)
dmat = mat.hooke_dmat(jnp.asarray(210000.,dtype), jnp.asarray(0.3,dtype))
fixmask_np, u_fix_np, _ = model.bcs.masks(mesh.ndof)
nd_pad = pad_ndof(mesh.ndof)
fixmask = jnp.asarray(pad_vector(fixmask_np, nd_pad), dtype)
u_fix = jnp.asarray(pad_vector(u_fix_np, nd_pad), dtype)
lt = sysm.LoadTables.from_spec(model.loads, dtype)
plan = asm_ops.build_scatter_plan(mesh.elnodes, nd_pad//3)
space = sysm.build_solve_space(mesh.coords, mesh.elnodes, fixmask, nd_pad)
esm, pinv, glv, rhs, gpc, vol, ls = jax.block_until_ready(sysm.assemble_elastic(coords, eln, dmat, lt, jnp.asarray(0.,dtype), fixmask, u_fix, plan))
cfg = get_config()

mode = sys.argv[1] if len(sys.argv)>1 else "cs64"
if mode == "cs64":
    t0=time.perf_counter()
    pc = jax.block_until_ready(sysm.build_precond(esm, eln, coords, fixmask, 64, space=space))
    print("build cs64:", time.perf_counter()-t0, flush=True)
    r = jax.block_until_ready(sysm.solve_displacement(esm, eln, fixmask, pc, rhs, 1e-5, 20000, plan=plan, space=space))
    t0=time.perf_counter()
    r = jax.block_until_ready(sysm.solve_displacement(esm, eln, fixmask, pc, rhs*1.0001, 1e-5, 20000, plan=plan, space=space))
    ts=time.perf_counter()-t0
    print(f"cs64: solve {ts*1e3:.0f}ms iters {int(r.iters)} ms/iter {ts*1e3/max(int(r.iters),1):.2f}", flush=True)
elif mode == "bf16":
    cs = cfg.resolve_cluster_size(mesh.n_nodes)
    pc = jax.block_until_ready(sysm.build_precond(esm, eln, coords, fixmask, cs, space=space))
    from fcvm_tpu.ops import solver as slv
    from fcvm_tpu.ops.precond import apply_precond
    esm_m = esm[space.eperm]
    esm_bf = esm_m.astype(jnp.bfloat16)
    eldofs_m = asm_ops.element_dof_ids(space.elnodes_m)
    ne = esm.shape[0]
    elnodes_m10 = space.elnodes_m
    nn = nd_pad//3
    @jax.jit
    def solve_bf(esm_a, pc_a, fm_a, plan_a, eln_a, b):
        esm4 = esm_a.reshape(ne, 10, 3, 30)
        def kv(u):
            up = fm_a * u
            u3 = up.reshape(nn,3)[eln_a]
            fe = jnp.einsum("eabj,ej->eab", esm4, u3.reshape(ne,30).astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            y = asm_ops.scatter_node_rows(fe.reshape(-1,3), plan_a).reshape(-1)
            return fm_a * y + (1.0-fm_a)*u
        return slv.pcg(kv, b, precond=lambda rr: apply_precond(pc_a, rr), rtol=1e-5, maxiter=20000)
    args = (esm_bf, pc, space.fixmask_m, space.plan_m, elnodes_m10)
    r = jax.block_until_ready(solve_bf(*args, space.to_m(rhs)))
    t0=time.perf_counter()
    r = jax.block_until_ready(solve_bf(*args, space.to_m(rhs*1.0001)))
    ts=time.perf_counter()-t0
    print(f"bf16: solve {ts*1e3:.0f}ms iters {int(r.iters)} ms/iter {ts*1e3/max(int(r.iters),1):.2f} relres {float(r.relres):.1e}", flush=True)
