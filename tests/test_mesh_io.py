"""Mesh IO roundtrips (native C++ parser vs python fallback) + RCM."""

import numpy as np
import pytest

from fcvm_tpu import native
from fcvm_tpu.models import meshgen, meshio_io
from fcvm_tpu.models.spec import Mesh


@pytest.fixture(scope="module")
def mesh():
    return meshgen.box_tet10(2, 2, 2, 3.0, 2.0, 1.0)


def _assert_same(a: Mesh, b: Mesh):
    np.testing.assert_allclose(a.coords, b.coords, atol=1e-12)
    np.testing.assert_array_equal(a.elnodes, b.elnodes)


def test_gmsh_roundtrip_python(tmp_path, mesh):
    p = tmp_path / "m.msh"
    meshio_io.write_gmsh(p, mesh)
    back = meshio_io._read_gmsh_py(p)
    _assert_same(mesh, back)


def test_unv_roundtrip_python(tmp_path, mesh):
    p = tmp_path / "m.unv"
    meshio_io.write_unv(p, mesh)
    back = meshio_io._read_unv_py(p)
    _assert_same(mesh, back)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_gmsh_roundtrip_native(tmp_path, mesh):
    p = tmp_path / "m.msh"
    meshio_io.write_gmsh(p, mesh)
    out = native.read_gmsh_native(str(p))
    assert out is not None
    _assert_same(mesh, Mesh(out[0], out[1]))


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_unv_roundtrip_native(tmp_path, mesh):
    p = tmp_path / "m.unv"
    meshio_io.write_unv(p, mesh)
    out = native.read_unv_native(str(p))
    assert out is not None
    _assert_same(mesh, Mesh(out[0], out[1]))


def test_node_order_preserves_volume(tmp_path, mesh):
    """A wrong midside permutation would corrupt element Jacobians."""
    import jax
    import jax.numpy as jnp

    from fcvm_tpu.ops import elements as el

    p = tmp_path / "m.msh"
    meshio_io.write_gmsh(p, mesh)
    back = meshio_io.read_mesh(p)
    det, _, _ = jax.vmap(el.tet10_element_geometry)(
        jnp.asarray(back.coords)[jnp.asarray(back.elnodes)]
    )
    vol = float(jnp.sum(jnp.abs(det) * jnp.asarray(el.W10)[None, :]))
    assert abs(vol - 3.0 * 2.0 * 1.0) < 1e-9
    assert float(jnp.min(det.min())) > 0  # orientation preserved


def test_rcm_reduces_bandwidth(mesh):
    rng = np.random.default_rng(0)
    # scramble node numbering, then RCM should restore locality
    perm = rng.permutation(mesh.n_nodes)
    scrambled_coords, scrambled_eln = native.apply_node_permutation(
        mesh.coords, mesh.elnodes, perm
    )
    bw0 = native.bandwidth(scrambled_eln, mesh.n_nodes)
    order = native.rcm_order(scrambled_eln, mesh.n_nodes)
    assert sorted(order.tolist()) == list(range(mesh.n_nodes))
    c2, e2 = native.apply_node_permutation(scrambled_coords, scrambled_eln, order)
    bw1 = native.bandwidth(e2, mesh.n_nodes)
    assert bw1 <= bw0
    # geometry unchanged
    assert abs(np.sort(c2[:, 0]).sum() - np.sort(mesh.coords[:, 0]).sum()) < 1e-9


def test_rcm_python_fallback_matches_contract(mesh):
    order = native._rcm_python(mesh.elnodes.astype(np.int64), mesh.n_nodes)
    assert sorted(order.tolist()) == list(range(mesh.n_nodes))


def test_native_builds():
    """The C++ library must compile in this environment."""
    assert native.build(), "native toolchain present but build failed"
    assert native.available()


def test_vtk_reader_on_own_export(tmp_path, mesh):
    """The legacy-VTK reader ingests our own ASCII export (and hence the
    reference's committed ``output files/*.vtk`` meshes, which use the same
    QUADRATIC_TETRA layout)."""
    from fcvm_tpu.runtime import vtk as vtk_mod

    import fcvm_tpu
    from fcvm_tpu.models.inp import ControlParams
    from fcvm_tpu.runtime.driver import solve_collapse

    path = tmp_path / "m.vtk"
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [(mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, 0.0, 0.0))]
    )
    model = fcvm_tpu.Model(
        mesh, fcvm_tpu.Material(210000.0, 0.3), bcs, fcvm_tpu.Loads(),
        name="m",
    )
    params = ControlParams(nstep=1, gnl="GNLN")
    res = solve_collapse(model, params)
    vtk_mod.export_results(path, res, mesh.elnodes, params, 240.0)
    got = meshio_io.read_vtk(path)
    assert got.n_elements == mesh.n_elements
    np.testing.assert_allclose(
        np.sort(got.coords, axis=0), np.sort(mesh.coords, axis=0), atol=1e-9
    )
    # connectivity equivalent up to node numbering: compare element volumes
    def vol(m):
        c = m.coords[m.elnodes]
        return np.sort(np.abs(np.einsum(
            "ij,ij->i", np.cross(c[:, 1] - c[:, 0], c[:, 2] - c[:, 0]),
            c[:, 3] - c[:, 0])) / 6.0)
    np.testing.assert_allclose(vol(got), vol(mesh), rtol=1e-9)


def test_mesh_validate_catches_inverted_and_out_of_range():
    mesh = meshgen.box_tet10(1, 1, 1, 1.0, 1.0, 1.0)
    mesh.validate()  # a healthy generated mesh passes

    # swap two corner nodes of element 0 -> negative corner volume
    bad = Mesh(mesh.coords.copy(), mesh.elnodes.copy())
    bad.elnodes[0, [0, 1]] = bad.elnodes[0, [1, 0]]
    with pytest.raises(ValueError, match="inverted"):
        bad.validate()

    # connectivity out of range
    oob = Mesh(mesh.coords.copy(), mesh.elnodes.copy())
    oob.elnodes[0, 0] = mesh.n_nodes + 5
    with pytest.raises(ValueError, match="connectivity"):
        oob.validate()


def test_mesh_validate_mirrored_mesh_warns_and_repairs():
    """A uniformly mirror-oriented mesh must not be rejected (|det J| volume
    kernels, reference parity fcVM.py:756) — but boundary_faces/pressure
    normals assume positive orientation, so validate() flips the element
    orientation in place (corner 1<->2 swap + midside permutation)."""
    mesh = meshgen.box_tet10(1, 1, 1, 1.0, 1.0, 1.0)
    coords = mesh.coords.copy()
    coords[:, 0] *= -1.0  # mirror: every corner volume flips sign
    mirrored = Mesh(coords, mesh.elnodes.copy())
    with pytest.warns(UserWarning, match="mirror"):
        mirrored.validate()

    # repaired: positively oriented again
    x = mirrored.coords[mirrored.elnodes[:, :4]]
    vol6 = np.linalg.det(x[:, 1:] - x[:, :1])
    assert (vol6 > 0).all()
    # midside permutation consistent: node 4+k is the midpoint of its edge
    edges = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3), (2, 3)]
    c = mirrored.coords
    for k, (a, b) in enumerate(edges):
        np.testing.assert_allclose(
            c[mirrored.elnodes[:, 4 + k]],
            0.5 * (c[mirrored.elnodes[:, a]] + c[mirrored.elnodes[:, b]]),
            atol=1e-12,
        )
    # outward pressure normals restored: boundary faces of the repaired
    # mirrored mesh have the same outward-flux sign as the original's
    for m in (mesh, mirrored):
        f = m.boundary_faces()
        tri = m.coords[f[:, :3]]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        center = m.coords.mean(axis=0)
        out = ((tri.mean(axis=1) - center) * n).sum(axis=1)
        assert (out > 0).all()


def test_mesh_validate_degenerate_element_raises():
    mesh = meshgen.box_tet10(1, 1, 1, 1.0, 1.0, 1.0)
    coords = mesh.coords.copy()
    # collapse one element's corner 1 onto its corner 0: zero volume
    e0 = mesh.elnodes[0]
    coords[e0[1]] = coords[e0[0]]
    degen = Mesh(coords, mesh.elnodes.copy())
    with pytest.raises(ValueError, match="degenerate"):
        degen.validate()
