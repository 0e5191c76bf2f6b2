"""Unit tests of the tet10/tri6/line3 element kernels against closed form.

Mirrors the test strategy mandated for the rebuild (SURVEY.md section 4):
partition of unity, B-matrix consistency, exact volumes/areas/lengths.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fcvm_tpu.models import meshgen
from fcvm_tpu.ops import elements as el
from fcvm_tpu.ops.quadrature import GP10, GP6, GP2


def test_tet10_partition_of_unity():
    for gp in GP10:
        shp = el.tet10_shape_np(*gp[:3])
        assert abs(shp.sum() - 1.0) < 1e-14
        d = el.tet10_dshape_local_np(*gp[:3])
        assert np.abs(d.sum(axis=1)).max() < 1e-13


def test_tet10_shape_interpolates_nodes():
    # shape function j is 1 at node j, 0 at the others
    corners = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float
    )
    from fcvm_tpu.models.spec import TET10_EDGES

    nodes = np.vstack(
        [corners] + [0.5 * (corners[a] + corners[b]) for a, b in TET10_EDGES]
    )
    for j, (xi, et, ze) in enumerate(nodes):
        shp = el.tet10_shape_np(xi, et, ze)
        expect = np.zeros(10)
        expect[j] = 1.0
        np.testing.assert_allclose(shp, expect, atol=1e-14)


def test_gauss_weights():
    assert abs(GP10[:, 3].sum() - 1.0 / 6.0) < 1e-12  # unit tet volume
    assert abs(GP6[:, 2].sum() - 0.5) < 1e-12  # unit tri area
    assert abs(GP2[:, 1].sum() - 2.0) < 1e-12


def test_box_volume_and_bmat_rowsums():
    mesh = meshgen.box_tet10(2, 3, 2, 2.0, 3.0, 1.5)
    coords = jnp.asarray(mesh.coords)
    det, dshpg, bmat = jax.vmap(el.tet10_element_geometry)(
        coords[jnp.asarray(mesh.elnodes)]
    )
    vol = float(jnp.sum(jnp.abs(det) * jnp.asarray(el.W10)[None, :]))
    assert abs(vol - 2.0 * 3.0 * 1.5) < 1e-9
    # global derivatives of a partition of unity sum to zero
    assert float(jnp.max(jnp.abs(dshpg.sum(-1)))) < 1e-10


def test_bmat_linear_field_exact_strain():
    """B @ u reproduces the exact strain of an affine displacement field."""
    mesh = meshgen.box_tet10(2, 2, 2, 1.0, 1.0, 1.0)
    rng = np.random.default_rng(0)
    grad = rng.normal(size=(3, 3)) * 0.01  # du_a/dx_b
    u = mesh.coords @ grad.T  # (nn, 3)
    exact = np.array(
        [
            grad[0, 0],
            grad[1, 1],
            grad[2, 2],
            grad[0, 1] + grad[1, 0],
            grad[0, 2] + grad[2, 0],
            grad[1, 2] + grad[2, 1],
        ]
    )
    coords = jnp.asarray(mesh.coords)
    eln = jnp.asarray(mesh.elnodes)
    _, _, bmat = jax.vmap(el.tet10_element_geometry)(coords[eln])
    u_el = jnp.asarray(u)[eln].reshape(len(mesh.elnodes), 30)
    eps = jnp.einsum("egkn,en->egk", bmat, u_el)
    np.testing.assert_allclose(
        np.asarray(eps), np.broadcast_to(exact, eps.shape), atol=1e-12
    )


def test_tri6_area_and_normal():
    # unit right triangle in the xy-plane at z=2, with midside nodes
    corners = np.array([[0, 0, 2.0], [3.0, 0, 2.0], [0, 2.0, 2.0]])
    nodes = np.vstack(
        [
            corners,
            0.5 * (corners[0] + corners[1]),
            0.5 * (corners[1] + corners[2]),
            0.5 * (corners[2] + corners[0]),
        ]
    )
    xsj, normal = el.tri6_surface_frame(jnp.asarray(nodes))
    area = float(jnp.sum(jnp.abs(xsj) * jnp.asarray(el.W6)))
    assert abs(area - 3.0) < 1e-12
    np.testing.assert_allclose(np.asarray(normal), [[0, 0, 1.0]] * 6, atol=1e-12)


def test_line3_length():
    nodes = np.array([[0, 0, 0], [2.0, 0, 0], [1.0, 0, 0]])
    xsj = el.line3_jacobian(jnp.asarray(nodes))
    length = float(jnp.sum(jnp.abs(xsj) * jnp.asarray(el.W2)))
    assert abs(length - 2.0) < 1e-12
