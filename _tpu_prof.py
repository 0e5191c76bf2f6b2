import time, sys
import jax
import jax.numpy as jnp, numpy as np
import fcvm_tpu
from fcvm_tpu.models import meshgen
from fcvm_tpu.ops import assembly as asm_ops, material as mat
from fcvm_tpu.runtime import system as sysm
from fcvm_tpu.ops import solver as slv
from fcvm_tpu.ops.precond import apply_precond
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
cfg = get_config(); cs = cfg.resolve_cluster_size(mesh.n_nodes)
pc = jax.block_until_ready(sysm.build_precond(esm, eln, coords, fixmask, cs, space=space))

esm_m = esm[space.eperm]
eldofs_m = asm_ops.element_dof_ids(space.elnodes_m)
kv = asm_ops.make_bc_matvec(esm_m, eldofs_m, space.fixmask_m, space.plan_m)
# native-order matvec for comparison
eldofs_o = asm_ops.element_dof_ids(eln)
kv_o = asm_ops.make_bc_matvec(esm, eldofs_o, fixmask, plan)

N = 30
def bench(name, g, *args):
    y = jax.block_until_ready(g(*args))  # compile
    a2 = list(args); a2[-1] = args[-1] * 1.0001
    t0 = time.perf_counter()
    y = jax.block_until_ready(g(*a2))
    dt = (time.perf_counter()-t0)/N
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)

from functools import partial
nn = nd_pad//3
x = space.to_m(rhs)

@jax.jit
def g_mv_m(esm_a, eldofs_a, fm_a, plan_a, v):
    f = asm_ops.make_bc_matvec(esm_a, eldofs_a, fm_a, plan_a)
    return jax.lax.fori_loop(0, N, lambda i, a: f(a), v)

bench("matvec morton", g_mv_m, esm_m, eldofs_m, space.fixmask_m, space.plan_m, x)
bench("matvec native", g_mv_m, esm, eldofs_o, fixmask, plan, rhs)

@jax.jit
def g_pc(pc_a, v):
    return jax.lax.fori_loop(0, N, lambda i, a: apply_precond(pc_a, a), v)
bench("precond apply", g_pc, pc, x)

@jax.jit
def g_gather(eln_a, v):
    def step(i, a):
        u3 = a.reshape(nn,3)[eln_a]
        return a.at[0].set(u3.sum() + a[0])
    return jax.lax.fori_loop(0, N, step, v)
bench("gather morton", g_gather, space.elnodes_m, x)
bench("gather native", g_gather, eln, rhs)

@jax.jit
def g_scat(esm_a, eldofs_a, fm_a, plan_a, v):
    # matvec without plan (segment-sum scatter) for comparison
    f = asm_ops.make_bc_matvec(esm_a, eldofs_a, fm_a, None)
    return jax.lax.fori_loop(0, N, lambda i, a: f(a), v)
bench("matvec morton noplan", g_scat, esm_m, eldofs_m, space.fixmask_m, space.plan_m, x)
