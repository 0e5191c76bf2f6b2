import jax
jax.config.update('jax_platforms', 'cpu'); jax.config.update('jax_enable_x64', True)
import numpy as np, fcvm_tpu
from fcvm_tpu.models import meshgen
sy, applied = 100.0, 50.0
mesh = meshgen.plate_with_hole_tet10(radius=10., width=50., height=100., thickness=5.,
                                     n_circ=10, n_rad=8, n_thick=1)
print("nn", mesh.n_nodes, "ne", mesh.n_elements)
import jax.numpy as jnp
from fcvm_tpu.ops import elements as el
det,_,_ = jax.vmap(el.tet10_element_geometry)(jnp.asarray(mesh.coords)[jnp.asarray(mesh.elnodes)])
print("vol", float(jnp.sum(jnp.abs(det)*jnp.asarray(el.W10)[None,:])), "min det", float(det.min()))
bcs = fcvm_tpu.BoundaryConditions.from_node_sets([
    (mesh.select_nodes(lambda x,y,z: x < 1e-9), (0.0,None,None)),
    (mesh.select_nodes(lambda x,y,z: y < 1e-9), (None,0.0,None)),
    (mesh.select_nodes(lambda x,y,z: z < 1e-9), (None,None,0.0)),
])
top = mesh.faces_on(lambda x,y,z: y > 100-1e-6)
print("top faces", len(top), "area", None)
loads = fcvm_tpu.Loads(traction_faces=top, tractions=np.tile([0,applied,0],(len(top),1)))
model = fcvm_tpu.Model(mesh, fcvm_tpu.Material(210000.,0.3), bcs, loads)
params = fcvm_tpu.ControlParams(sig_yield=sy, nstep=12, iterat_max=20, error_max=5e-4,
                                et_e=0.0, target_lf=5.0, ultimate_strain=0.25)
def cont(h,i):
    if len(h.lbd) > 60: return "stop"
    if len(h.lbd) > 6 and abs(h.lbd[-1]-h.lbd[-4]) < 1e-3: return "stop"
    return "add"
res = fcvm_tpu.solve_collapse(model, params, continuation=cont)
print("loadsums", res.loadsums, "expect y:", applied*50*5*1, " (area of top=width*thickness)")
print(np.round(np.array(res.history.lbd),4))
print(np.round(np.array(res.history.un),4))
