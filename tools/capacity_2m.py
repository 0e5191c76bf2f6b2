"""Single-chip capacity: 2M-dof elastic assembly + solve (chunked builders)."""
import sys, time
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import fcvm_tpu
from fcvm_tpu.models import meshgen
from fcvm_tpu.ops import assembly as asm
from fcvm_tpu.ops import material as mat
from fcvm_tpu.runtime import system as sysm
from fcvm_tpu.utils.indexing import pad_ndof, pad_vector
from fcvm_tpu.config import get_config, enable_compilation_cache
enable_compilation_cache()

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 43
dtype = jnp.float32
mesh = meshgen.box_tet10(nx, nx, nx, 10.0, 10.0, 10.0)
print(f"mesh nn={mesh.n_nodes} ne={mesh.n_elements} ndof={mesh.ndof}", flush=True)
coords = jnp.asarray(mesh.coords, dtype)
eln = jnp.asarray(mesh.elnodes)
dmat = mat.hooke_dmat(jnp.asarray(210000.0, dtype), jnp.asarray(0.3, dtype))
bcs = fcvm_tpu.BoundaryConditions.from_node_sets([
    (mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, None, None)),
    (mesh.select_nodes(lambda x, y, z: y < 1e-9), (None, 0.0, None)),
    (mesh.select_nodes(lambda x, y, z: z < 1e-9), (None, None, 0.0)),
])
faces = mesh.faces_on(lambda x, y, z: x > 10.0 - 1e-9)
lt = sysm.LoadTables.from_spec(
    fcvm_tpu.Loads(traction_faces=faces,
                   tractions=np.tile([100.0, 0, 0], (len(faces), 1))), dtype)
fixmask_np, u_fix_np, _ = bcs.masks(mesh.ndof)
nd_pad = pad_ndof(mesh.ndof)
fixmask = jnp.asarray(pad_vector(fixmask_np, nd_pad), dtype)
u_fix = jnp.asarray(pad_vector(u_fix_np, nd_pad), dtype)
plan = asm.build_scatter_plan(mesh.elnodes, nd_pad // 3)
space = sysm.build_solve_space(mesh.coords, mesh.elnodes, fixmask, nd_pad)
print("host setup done", flush=True)

t0 = time.perf_counter()
esm, pinv, glv, rhs, gpc, vol, ls = jax.block_until_ready(
    sysm.assemble_elastic(coords, eln, dmat, lt, jnp.asarray(0.0, dtype),
                          fixmask, u_fix, plan))
print(f"assembly ok: {time.perf_counter()-t0:.1f}s "
      f"(blocks {esm.nbytes/2**30:.2f} GiB)", flush=True)

cfg = get_config()
cs = cfg.resolve_cluster_size(mesh.n_nodes)
t0 = time.perf_counter()
pc = jax.block_until_ready(
    sysm.build_precond(esm, eln, coords, fixmask, cs, space=space))
print(f"precond build (cs={cs}): {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
res = jax.block_until_ready(sysm.solve_displacement(
    esm, eln, fixmask, pc, rhs, 1e-5, 5000, plan=plan, space=space))
t_s = time.perf_counter() - t0
t0 = time.perf_counter()
res = jax.block_until_ready(sysm.solve_displacement(
    esm, eln, fixmask, pc, rhs, 1e-5, 5000, plan=plan, space=space))
t_s = time.perf_counter() - t0
print(f"elastic solve: {int(res.iters)} iters relres {float(res.relres):.2e} "
      f"in {t_s:.2f}s ({t_s/max(int(res.iters),1)*1e3:.1f} ms/iter)", flush=True)
