import jax
jax.config.update('jax_platforms', 'cpu'); jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, time
import fcvm_tpu
from fcvm_tpu.models import meshgen
from fcvm_tpu.ops import assembly as asm, material as mat, solver as slv
from fcvm_tpu.ops.precond import build_two_level

E, NU = 210000.0, 0.3
for dims, name in [((8,1,1,20.,1.,1.),'beam8'), ((10,2,2,20.,1.,1.),'beam10x2'), ((6,6,6,10.,10.,10.),'box6')]:
    mesh = meshgen.box_tet10(*dims)
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets([
        (mesh.select_nodes(lambda x,y,z: x < 1e-9), (0.0,0.0,0.0))])
    faces = mesh.faces_on(lambda x,y,z: x > dims[3]-1e-9)
    loads = fcvm_tpu.Loads(traction_faces=faces, tractions=np.tile([0.,-10.,0.],(len(faces),1)))
    coords = jnp.asarray(mesh.coords); eln = jnp.asarray(mesh.elnodes)
    dmat = mat.hooke_dmat(jnp.float64(E), jnp.float64(NU))
    fixmask_np, u_fix, _ = bcs.masks(mesh.ndof)
    fixmask = jnp.asarray(fixmask_np)
    from fcvm_tpu.runtime import system as sysm
    lt = sysm.LoadTables.from_spec(loads, jnp.float64)
    esm, pinv, glv, rhs, *_ = sysm.assemble_elastic(coords, eln, dmat, lt, jnp.float64(0.0),
                                                    fixmask, jnp.asarray(u_fix))
    khat = asm.make_bc_matvec(esm, asm.element_dof_ids(eln), fixmask)
    r0 = slv.pcg(khat, rhs, precond=lambda r: asm.apply_block_precond(pinv, r), rtol=1e-10, maxiter=mesh.ndof*2)
    for cs in (16, 32, 64):
        pc = build_two_level(esm, eln, coords, fixmask, cluster_size=cs)
        r1 = slv.pcg(khat, rhs, precond=pc.apply, rtol=1e-10, maxiter=mesh.ndof*2)
        err = float(jnp.linalg.norm(r1.x - r0.x)/jnp.linalg.norm(r0.x))
        print(f"{name} ndof={mesh.ndof}: BJ {int(r0.iters)} -> 2lvl(cs={cs}) {int(r1.iters)} iters, sol diff {err:.1e}")
