"""Headline physics validations from the reference corpus (BASELINE.md):
plate-with-hole collapse, gravity self-weight."""

import numpy as np
import pytest

import fcvm_tpu
from fcvm_tpu.models import meshgen

E, NU = 210000.0, 0.3


def test_plate_with_hole_collapse():
    """Quarter plate with a hole in tension, perfect plasticity: the limit
    load factor must sit just above the net-section lower bound
    sigma_y (W - R) / (W sigma_applied) and converge toward it with mesh
    refinement (reference manual section 9.1; at 14x10 in-plane resolution
    the plateau is ~1.69 for a bound of 1.60)."""
    sy, applied = 100.0, 50.0
    mesh = meshgen.plate_with_hole_tet10(
        radius=10.0, width=50.0, height=100.0, thickness=5.0,
        n_circ=10, n_rad=8, n_thick=1,
    )
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [
            (mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, None, None)),
            (mesh.select_nodes(lambda x, y, z: y < 1e-9), (None, 0.0, None)),
            (mesh.select_nodes(lambda x, y, z: z < 1e-9), (None, None, 0.0)),
        ]
    )
    top = mesh.faces_on(lambda x, y, z: y > 100 - 1e-6)
    loads = fcvm_tpu.Loads(
        traction_faces=top, tractions=np.tile([0, applied, 0], (len(top), 1))
    )
    model = fcvm_tpu.Model(mesh, fcvm_tpu.Material(E, NU), bcs, loads, name="plate")
    params = fcvm_tpu.ControlParams(
        sig_yield=sy, nstep=12, iterat_max=20, error_max=5e-4,
        et_e=0.0, target_lf=5.0, ultimate_strain=0.25,
    )

    def cont(h, i):
        if len(h.lbd) > 45:
            return "stop"
        if len(h.lbd) > 6 and abs(h.lbd[-1] - h.lbd[-4]) < 2e-3:
            return "stop"
        return "add"

    res = fcvm_tpu.solve_collapse(model, params, continuation=cont)
    plateau = max(res.history.lbd)
    bound = (50.0 - 10.0) / 50.0 * sy / applied  # 1.6
    assert plateau > bound * 0.99  # limit load respects the lower bound
    assert plateau < bound * 1.10  # and is within coarse-mesh distance of it
    # the hot spot is at the hole edge on the net section (y ~ 0, x ~ R)
    crip = res.history.crip[-1]
    gx, gy = res.gp_coords.reshape(-1, 3)[crip][:2]
    assert gx < 25.0 and gy < 25.0
    # CSR accumulated at the critical point
    assert res.history.csr[-1] > 0.0


def test_gravity_self_weight_column():
    """Column under self-weight: sigma_zz(z) = -rho g (H - z), tip
    displacement = rho g H^2 / 2E (exact for uniaxial stress state)."""
    rho, g, h = 7.85e-6, 9810.0, 100.0  # kg/mm^3, mm/s^2, mm
    mesh = meshgen.box_tet10(1, 1, 8, 2.0, 2.0, h)
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [
            (mesh.select_nodes(lambda x, y, z: z < 1e-9), (None, None, 0.0)),
            (mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, None, None)),
            (mesh.select_nodes(lambda x, y, z: y < 1e-9), (None, 0.0, None)),
        ]
    )
    loads = fcvm_tpu.Loads(gravity=[0.0, 0.0, -g])
    model = fcvm_tpu.Model(
        mesh, fcvm_tpu.Material(E, NU, density=rho), bcs, loads, name="col"
    )
    params = fcvm_tpu.ControlParams(
        sig_yield=1e9, nstep=1, error_max=1e-10, gnl="GNLN"
    )
    res = fcvm_tpu.solve_collapse(model, params)
    np.testing.assert_allclose(res.loadsums[2], -rho * g * (2.0 * 2.0 * h), rtol=1e-9)
    top = mesh.select_nodes(lambda x, y, z: z > h - 1e-9)
    uz = res.disp_total.reshape(-1, 3)[top, 2].mean()
    np.testing.assert_allclose(uz, -rho * g * h**2 / (2 * E), rtol=2e-3)


def test_vertical_cut_slope_stability():
    """Gravity-driven collapse of a vertical cut in undrained clay
    (phi=0 soil body, the reference's embankment family, manual section 9.2):
    stability number N_s = LF * gamma * H / c_u must match Taylor's 3.64-3.83
    within coarse-mesh overshoot."""
    h, length, t = 10.0, 16.0, 2.0
    rho, g = 2.0e-6, 9810.0
    sy = 0.02  # MPa; c_u = sy / sqrt(3)
    mesh = meshgen.box_tet10(8, 1, 6, length, t, h)
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [
            (mesh.select_nodes(lambda x, y, z: z < 1e-9), (0.0, 0.0, 0.0)),
            (mesh.select_nodes(lambda x, y, z: x > length - 1e-9), (0.0, None, None)),
            (mesh.select_nodes(lambda x, y, z: y < 1e-9), (None, 0.0, None)),
            (mesh.select_nodes(lambda x, y, z: y > t - 1e-9), (None, 0.0, None)),
        ]
    )
    loads = fcvm_tpu.Loads(gravity=[0.0, 0.0, -g])
    model = fcvm_tpu.Model(
        mesh, fcvm_tpu.Material(50.0, 0.49, density=rho), bcs, loads, name="cut"
    )
    params = fcvm_tpu.ControlParams(
        sig_yield=sy, nstep=10, iterat_max=25, error_max=3e-4,
        et_e=0.0, target_lf=9.0, ultimate_strain=0.5,
    )

    def cont(hist, info):
        if len(hist.lbd) > 40:
            return "stop"
        if len(hist.lbd) > 8 and abs(hist.lbd[-1] - hist.lbd[-4]) < 1e-2 * hist.lbd[-1]:
            return "stop"
        return "add"

    res = fcvm_tpu.solve_collapse(model, params, continuation=cont)
    lf = max(res.history.lbd)
    n_s = lf * rho * g * h / (sy / np.sqrt(3.0))
    assert 3.35 < n_s < 4.45  # Taylor 3.64-3.83 + coarse-mesh overshoot
    assert res.peeq_gp.max() > 0.0  # a plastic mechanism formed


def test_multi_material_series_bar():
    """Two materials in series under uniform tension: u(L) = sigma (L1/E1 +
    L2/E2).  True per-element materials — beyond the reference, whose
    kernels use the first material row only (fcVM.py:736)."""
    l_tot, sigma = 10.0, 100.0
    e1, e2 = 100000.0, 200000.0
    mesh = meshgen.box_tet10(4, 2, 2, l_tot, 5.0, 5.0)
    centroids = mesh.coords[mesh.elnodes[:, :4]].mean(axis=1)
    mbe = np.zeros((mesh.n_elements, 3))
    mbe[:, 0] = np.where(centroids[:, 0] < l_tot / 2, e1, e2)
    mbe[:, 1] = 0.0  # nu = 0 keeps the series state exactly uniaxial
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [
            (mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, None, None)),
            (mesh.select_nodes(lambda x, y, z: y < 1e-9), (None, 0.0, None)),
            (mesh.select_nodes(lambda x, y, z: z < 1e-9), (None, None, 0.0)),
        ]
    )
    faces = mesh.faces_on(lambda x, y, z: x > l_tot - 1e-9)
    loads = fcvm_tpu.Loads(
        traction_faces=faces, tractions=np.tile([sigma, 0, 0], (len(faces), 1))
    )
    model = fcvm_tpu.Model(
        mesh, fcvm_tpu.Material(e1, 0.0), bcs, loads,
        name="series", materials_by_element=mbe,
    )
    params = fcvm_tpu.ControlParams(sig_yield=1e6, nstep=2, error_max=1e-10, target_lf=1.0)
    res = fcvm_tpu.solve_collapse(model, params)
    end = mesh.select_nodes(lambda x, y, z: x > l_tot - 1e-9)
    ux = res.disp_total.reshape(-1, 3)[end, 0]
    expect = sigma * (l_tot / 2 / e1 + l_tot / 2 / e2)
    np.testing.assert_allclose(ux, expect, rtol=1e-7)


def test_multi_material_gravity_density():
    """Per-element densities: total weight = sum(rho_i g V_i)."""
    mesh = meshgen.box_tet10(2, 2, 4, 2.0, 2.0, 8.0)
    centroids = mesh.coords[mesh.elnodes[:, :4]].mean(axis=1)
    mbe = np.zeros((mesh.n_elements, 3))
    mbe[:, 0] = 210000.0
    mbe[:, 1] = 0.3
    rho1, rho2 = 1.0e-6, 3.0e-6
    mbe[:, 2] = np.where(centroids[:, 2] < 4.0, rho1, rho2)
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [(mesh.select_nodes(lambda x, y, z: z < 1e-9), (0.0, 0.0, 0.0))]
    )
    g = 9810.0
    loads = fcvm_tpu.Loads(gravity=[0.0, 0.0, -g])
    model = fcvm_tpu.Model(
        mesh, fcvm_tpu.Material(210000.0, 0.3, rho1), bcs, loads,
        materials_by_element=mbe,
    )
    params = fcvm_tpu.ControlParams(sig_yield=1e9, nstep=1)
    res = fcvm_tpu.solve_collapse(model, params)
    vol_half = 2.0 * 2.0 * 4.0
    np.testing.assert_allclose(
        res.loadsums[2], -g * vol_half * (rho1 + rho2), rtol=1e-9
    )
