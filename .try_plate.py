import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np
import fcvm_tpu
from fcvm_tpu.models import meshgen

# quarter plate with hole: radius 10, half-width 50, half-height 100(?) ->
# reference geometry: plate 100 wide (half 50), hole r=10
mesh = meshgen.plate_with_hole_tet10(radius=10., width=50., height=100., thickness=5.,
                                     n_circ=14, n_rad=10, n_thick=1)
print("nn", mesh.n_nodes, "ne", mesh.n_elements)
# check volume = (50*100 - pi*10^2/4)*5 approx (mesh has polygonal hole)
import jax.numpy as jnp
from fcvm_tpu.ops import elements as el
det,_,_ = jax.vmap(el.tet10_element_geometry)(jnp.asarray(mesh.coords)[jnp.asarray(mesh.elnodes)])
vol = float(jnp.sum(jnp.abs(det)*jnp.asarray(el.W10)[None,:]))
print("volume", vol, "expect ~", (50*100 - np.pi*100/4)*5)
print("min det", float(det.min()))
# symmetry: x=0 plane (cut through hole vertically) -> ux=0; y=0 plane -> uy=0
# load: top face y=100 tension sigma in +y
E, NU, SY = 210000., 0.3, 100.
bcs = fcvm_tpu.BoundaryConditions.from_node_sets([
    (mesh.select_nodes(lambda x,y,z: x < 1e-9), (0.0,None,None)),
    (mesh.select_nodes(lambda x,y,z: y < 1e-9), (None,0.0,None)),
    (mesh.select_nodes(lambda x,y,z: z < 1e-9), (None,None,0.0)),
])
top = mesh.faces_on(lambda x,y,z: y > 100-1e-6)
print("top faces:", len(top))
loads = fcvm_tpu.Loads(traction_faces=top, tractions=np.tile([0,50.,0],(len(top),1)))
model = fcvm_tpu.Model(mesh, fcvm_tpu.Material(E,NU), bcs, loads, name="plate")
params = fcvm_tpu.ControlParams(sig_yield=SY, nstep=12, iterat_max=20, error_max=5e-4,
                                et_e=0.0, target_lf=5.0, scale_re=2.0, ultimate_strain=0.25)
def cont(h, i):
    # continue until load factor stalls (collapse) or 60 steps
    if len(h.lbd) > 60: return "stop"
    if len(h.lbd) > 6 and abs(h.lbd[-1]-h.lbd[-4]) < 1e-3: return "stop"
    return "add"
res = fcvm_tpu.solve_collapse(model, params, continuation=cont)
lbd = np.array(res.history.lbd)
print("LF history:", np.round(lbd,4))
# net section collapse: sigma_applied*W = SY*(W-R) -> LF = (50-10)/50 * 100/50 = 1.6
print("plateau LF:", lbd.max(), "net-section estimate:", (50-10)/50*SY/50.)
