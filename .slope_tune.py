import time
import jax
jax.config.update('jax_platforms', 'cpu'); jax.config.update('jax_enable_x64', True)
import numpy as np, fcvm_tpu
from fcvm_tpu.models import meshgen
t0=time.time()
H, L, T = 10.0, 16.0, 2.0
rho, g = 2.0e-6, 9810.0
sy = 0.02
mesh = meshgen.box_tet10(8, 1, 6, L, T, H)
bcs = fcvm_tpu.BoundaryConditions.from_node_sets([
    (mesh.select_nodes(lambda x,y,z: z < 1e-9), (0.0, 0.0, 0.0)),
    (mesh.select_nodes(lambda x,y,z: x > L-1e-9), (0.0, None, None)),
    (mesh.select_nodes(lambda x,y,z: y < 1e-9), (None, 0.0, None)),
    (mesh.select_nodes(lambda x,y,z: y > T-1e-9), (None, 0.0, None)),
])
loads = fcvm_tpu.Loads(gravity=[0.0, 0.0, -g])
model = fcvm_tpu.Model(mesh, fcvm_tpu.Material(50.0, 0.49, density=rho), bcs, loads)
params = fcvm_tpu.ControlParams(sig_yield=sy, nstep=10, iterat_max=25, error_max=3e-4,
                                et_e=0.0, target_lf=9.0, ultimate_strain=0.5)
def cont(h, i):
    if len(h.lbd) > 40: return "stop"
    if len(h.lbd) > 8 and abs(h.lbd[-1]-h.lbd[-4]) < 1e-2*h.lbd[-1]: return "stop"
    return "add"
res = fcvm_tpu.solve_collapse(model, params, continuation=cont)
lbd = np.array(res.history.lbd)
ns = lbd.max()*rho*g*H/(sy/np.sqrt(3.0))
print("steps", len(lbd), "collapse LF", round(lbd.max(),4), "N_s", round(ns,3), "time", round(time.time()-t0,1))
