import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
import fcvm_tpu
from fcvm_tpu.models import meshgen
from fcvm_tpu.ops import material as mat, assembly as asm
from fcvm_tpu.ops.precond import build_two_level
from fcvm_tpu.runtime import system as sysm
from fcvm_tpu.utils.indexing import pad_ndof, pad_vector

for dtype, x64 in ((jnp.float32, False),):
    mesh = meshgen.box_tet10(4, 4, 4, 10., 10., 10.)
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
    pc = build_two_level(esm, eln, coords, fixmask, cluster_size=16)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=nd), dtype); w = jnp.asarray(rng.normal(size=nd), dtype)
    Mv = pc.apply(v); Mw = pc.apply(w)
    print("sym err:", float(jnp.vdot(w, Mv) - jnp.vdot(v, Mw)) / float(jnp.vdot(v, Mv)))
    print("vMv:", float(jnp.vdot(v, Mv)), " wMw:", float(jnp.vdot(w, Mw)))
    # coarse-only correction energy
    z2 = Mv - asm.apply_block_precond(pc.pinv, v)
    print("coarse part vs bj part norm:", float(jnp.linalg.norm(z2)), float(jnp.linalg.norm(Mv - z2)))
    # compare f32 apply vs f64 recompute of same operator
    pinv64 = np.asarray(pc.pinv, np.float64); q64 = np.asarray(pc.qmat, np.float64)
    ci64 = np.asarray(pc.coarse_inv, np.float64); fm64 = np.asarray(pc.fixmask, np.float64)
    def apply64(r):
        nnp = q64.shape[0]; ncl = ci64.shape[0]//6; cs = nnp//ncl
        z = np.einsum('nab,nb->na', pinv64, (r).reshape(-1,3)).reshape(-1)
        r3 = (fm64*r).reshape(-1,3)
        r3p = np.vstack([r3, np.zeros((nnp-r3.shape[0],3))])
        rc = np.einsum('nak,na->nk', q64, r3p).reshape(ncl,cs,6).sum(1).reshape(-1)
        zc = ci64@rc
        zcn = np.repeat(zc.reshape(ncl,1,6), cs, axis=1).reshape(nnp,6)
        z2 = np.einsum('nak,nk->na', q64, zcn)[:r3.shape[0]].reshape(-1)*fm64
        return z + z2
    M64 = apply64(np.asarray(v, np.float64))
    print("f32 vs f64 apply relerr:", np.linalg.norm(np.asarray(Mv)-M64)/np.linalg.norm(M64))
    # eigen check of preconditioned operator on small dense K
    eldofs = np.asarray(asm.element_dof_ids(eln))
    K = np.zeros((nd, nd))
    esm_np = np.asarray(esm, np.float64)
    for e in range(len(eldofs)):
        K[np.ix_(eldofs[e], eldofs[e])] += esm_np[e]
    fm = np.asarray(fixmask_np)
    free = np.concatenate([fm, np.zeros(nd-len(fm))]) > 0.5
    Khat = np.where(free[:,None]&free[None,:], K, 0.0); np.fill_diagonal(Khat, np.where(free, np.diagonal(Khat), 1.0))
    # build dense M from applies (f64 version)
    n = nd
    M = np.zeros((n,n))
    for i in range(n):
        e_i = np.zeros(n); e_i[i] = 1.0
        M[:, i] = apply64(e_i)
    print("M sym err:", np.abs(M-M.T).max()/np.abs(M).max())
    ev = np.linalg.eigvalsh(0.5*(M+M.T))
    print("M eig range:", ev.min(), ev.max())
