"""Profile the two-level precond build phases at ~500k dof on TPU."""
import time, sys
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
from fcvm_tpu.ops import precond as pcmod

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 27
dtype = jnp.float32
E, NU = 210000.0, 0.3
mesh = meshgen.box_tet10(nx, nx, nx, 10.0, 10.0, 10.0)
print(f"mesh nn={mesh.n_nodes} ne={mesh.n_elements} ndof={mesh.ndof}", flush=True)
coords = jnp.asarray(mesh.coords, dtype)
eln = jnp.asarray(mesh.elnodes)
dmat = mat.hooke_dmat(jnp.asarray(E, dtype), jnp.asarray(NU, dtype))
bcs = fcvm_tpu.BoundaryConditions.from_node_sets([
    (mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, None, None)),
    (mesh.select_nodes(lambda x, y, z: y < 1e-9), (None, 0.0, None)),
    (mesh.select_nodes(lambda x, y, z: z < 1e-9), (None, None, 0.0)),
])
fixmask_np, u_fix_np, _ = bcs.masks(mesh.ndof)
nd_pad = pad_ndof(mesh.ndof)
fixmask = jnp.asarray(pad_vector(fixmask_np, nd_pad), dtype)
space = sysm.build_solve_space(mesh.coords, mesh.elnodes, fixmask, nd_pad)

t0=time.perf_counter()
esm = jax.block_until_ready(asm.elastic_stiffness_blocks(coords, eln, dmat))
print(f"esm blocks: {time.perf_counter()-t0:.2f}s", flush=True)

cfg = get_config()
cs = cfg.resolve_cluster_size(mesh.n_nodes)
print("cluster_size", cs, "ncl", -(-nd_pad//3//cs), flush=True)

# replicate build_two_level phases with timers, in solve space
esm_m = esm[space.eperm]
elnodes = space.elnodes_m
fixmask_m = space.fixmask_m
coords_m = space.coords_m
jax.block_until_ready(esm_m)

nn_pad = fixmask_m.shape[0] // 3
t0=time.perf_counter()
pinv = jax.block_until_ready(asm.block_jacobi_inverse_blocks(esm_m, elnodes, fixmask_m))
print(f"block_jacobi: {time.perf_counter()-t0:.2f}s", flush=True)

nn = coords_m.shape[0]
coords_p = jnp.pad(coords_m.astype(dtype), ((0, nn_pad - nn), (0, 0)))
t0=time.perf_counter()
qmat = jax.block_until_ready(pcmod._rigid_modes(coords_p, cs))
print(f"rigid modes: {time.perf_counter()-t0:.2f}s", flush=True)
m3 = jnp.pad(fixmask_m.reshape(nn_pad, 3), ((0, qmat.shape[0] - nn_pad), (0, 0)))
qmat_bc = qmat * m3[:, :, None]

t0=time.perf_counter()
kc = jax.block_until_ready(pcmod._coarse_accumulate_jit(esm_m, elnodes, qmat_bc, cs))
t_acc_cold = time.perf_counter()-t0
t0=time.perf_counter()
kc = jax.block_until_ready(pcmod._coarse_accumulate_jit(esm_m, elnodes, qmat_bc, cs))
print(f"coarse accumulate: cold {t_acc_cold:.2f}s steady {time.perf_counter()-t0:.2f}s", flush=True)

t0=time.perf_counter()
inv = jax.block_until_ready(pcmod._coarse_densify_invert(kc, jnp.asarray(3e-4, dtype)))
t_inv_cold = time.perf_counter()-t0
t0=time.perf_counter()
inv = jax.block_until_ready(pcmod._coarse_densify_invert(kc, jnp.asarray(3e-4, dtype)))
print(f"densify+invert: cold {t_inv_cold:.2f}s steady {time.perf_counter()-t0:.2f}s", flush=True)
print("finite:", bool(jnp.all(jnp.isfinite(inv))), flush=True)

# full driver-style build (what bench.py measures)
from fcvm_tpu.ops.precond import build_two_level
t0=time.perf_counter()
pc = jax.block_until_ready(sysm.build_precond(esm, eln, coords, fixmask, cs, space=space))
print(f"full build_precond (driver path): {time.perf_counter()-t0:.2f}s", flush=True)
t0=time.perf_counter()
pc = jax.block_until_ready(sysm.build_precond(esm, eln, coords, fixmask, cs, space=space))
print(f"full build_precond (2nd in-process): {time.perf_counter()-t0:.2f}s", flush=True)
