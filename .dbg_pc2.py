import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
import fcvm_tpu
from fcvm_tpu.models import meshgen
from fcvm_tpu.ops import material as mat, assembly as asm
from fcvm_tpu.ops.precond import build_two_level
from fcvm_tpu.runtime import system as sysm
from fcvm_tpu.utils.indexing import pad_ndof, pad_vector

dtype = jnp.float32
mesh = meshgen.box_tet10(10, 10, 10, 10., 10., 10.)
bcs = fcvm_tpu.BoundaryConditions.from_node_sets([
    (mesh.select_nodes(lambda x,y,z: x < 1e-9), (0.0,None,None)),
    (mesh.select_nodes(lambda x,y,z: y < 1e-9), (None,0.0,None)),
    (mesh.select_nodes(lambda x,y,z: z < 1e-9), (None,None,0.0)),
])
faces = mesh.faces_on(lambda x,y,z: x > 10-1e-9)
loads = fcvm_tpu.Loads(traction_faces=faces, tractions=np.tile([100.,0,0],(len(faces),1)))
coords = jnp.asarray(mesh.coords, dtype); eln = jnp.asarray(mesh.elnodes)
dmat = mat.hooke_dmat(jnp.asarray(210000.,dtype), jnp.asarray(0.3,dtype))
fixmask_np, u_fix_np, _ = bcs.masks(mesh.ndof)
nd = pad_ndof(mesh.ndof)
fixmask = jnp.asarray(pad_vector(fixmask_np, nd), dtype)
u_fix = jnp.asarray(pad_vector(u_fix_np, nd), dtype)
lt = sysm.LoadTables.from_spec(loads, dtype)
esm, pinv, glv, rhs, *_ = sysm.assemble_elastic(coords, eln, dmat, lt, jnp.asarray(0.,dtype), fixmask, u_fix)
pc = build_two_level(esm, eln, coords, fixmask, cluster_size=32)
khat = asm.make_bc_matvec(esm, asm.element_dof_ids(eln), fixmask)

# hand-rolled instrumented PCG in numpy (f32)
b = np.asarray(rhs, np.float32)
x = np.zeros_like(b); r = b - np.asarray(khat(jnp.asarray(x)), np.float32)
z = np.asarray(pc.apply(jnp.asarray(r)), np.float32); p = z.copy()
rz = float(r @ z)
print("initial rz", rz)
for k in range(60):
    ap = np.asarray(khat(jnp.asarray(p)), np.float32)
    pap = float(p @ ap)
    alpha = rz / pap
    x += alpha * p; r -= alpha * ap
    z = np.asarray(pc.apply(jnp.asarray(r)), np.float32)
    rz_new = float(r @ z)
    if k < 12 or rz_new < 0 or pap < 0:
        print(f"k={k} pap={pap:.3e} rz={rz_new:.3e} |r|={np.linalg.norm(r):.3e}")
    if rz_new < 0 or pap < 0:
        print("NEGATIVE -> indefinite in f32"); break
    beta = rz_new / rz; rz = rz_new
    p = z + beta * p
