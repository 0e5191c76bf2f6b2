import time, numpy as np, jax, jax.numpy as jnp
import fcvm_tpu
from fcvm_tpu.models import meshgen
from fcvm_tpu.ops import material as mat, assembly as asm
from fcvm_tpu.runtime import system as sysm
from fcvm_tpu.config import get_config
from fcvm_tpu.utils.indexing import pad_ndof, pad_vector

dtype = jnp.float32
E, NU = 210000.0, 0.3
mesh = meshgen.box_tet10(22, 22, 22, 10., 10., 10.)
print("ndof", mesh.ndof, "pad", pad_ndof(mesh.ndof), flush=True)
bcs = fcvm_tpu.BoundaryConditions.from_node_sets([
    (mesh.select_nodes(lambda x,y,z: x < 1e-9), (0.0,None,None)),
    (mesh.select_nodes(lambda x,y,z: y < 1e-9), (None,0.0,None)),
    (mesh.select_nodes(lambda x,y,z: z < 1e-9), (None,None,0.0)),
])
faces = mesh.faces_on(lambda x,y,z: x > 10-1e-9)
loads = fcvm_tpu.Loads(traction_faces=faces, tractions=np.tile([100.,0,0],(len(faces),1)))
coords = jnp.asarray(mesh.coords, dtype); eln = jnp.asarray(mesh.elnodes)
dmat = mat.hooke_dmat(jnp.asarray(E,dtype), jnp.asarray(NU,dtype))
fixmask_np, u_fix_np, _ = bcs.masks(mesh.ndof)
nd = pad_ndof(mesh.ndof)
fixmask = jnp.asarray(pad_vector(fixmask_np, nd), dtype)
u_fix = jnp.asarray(pad_vector(u_fix_np, nd), dtype)
lt = sysm.LoadTables.from_spec(loads, dtype)
t0 = time.perf_counter()
esm, pinv, glv, rhs, *_ = jax.block_until_ready(
    sysm.assemble_elastic(coords, eln, dmat, lt, jnp.asarray(0.,dtype), fixmask, u_fix))
print("assemble cold", time.perf_counter()-t0, flush=True)
cfg = get_config()
cs = cfg.resolve_cluster_size(mesh.n_nodes)
t0 = time.perf_counter()
pc = jax.block_until_ready(sysm.build_precond(esm, eln, coords, fixmask, cs))
print(f"precond build (cs={cs}):", time.perf_counter()-t0, flush=True)
for name, p in (("block_jacobi", pinv), ("two_level", pc)):
    t0 = time.perf_counter()
    res = sysm.solve_displacement(esm, eln, fixmask, p, rhs, 1e-5, 5000)
    jax.block_until_ready(res.x); c = time.perf_counter()-t0
    t0 = time.perf_counter()
    res = sysm.solve_displacement(esm, eln, fixmask, p, rhs, 1e-5, 5000)
    jax.block_until_ready(res.x); dt = time.perf_counter()-t0
    print(f"{name}: {int(res.iters)} iters {dt:.3f}s ({dt/max(int(res.iters),1)*1e3:.2f} ms/iter) relres {float(res.relres):.1e} [compile {c:.0f}s]", flush=True)
