"""Pallas kernels vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import fcvm_tpu
from fcvm_tpu.models import meshgen
from fcvm_tpu.ops import assembly as asm
from fcvm_tpu.ops import material as mat
from fcvm_tpu.ops import pallas_kernels as pk
from fcvm_tpu.utils.indexing import pad_ndof, pad_vector


def test_block_matvec_matches_einsum():
    rng = np.random.default_rng(0)
    ne = pk.ELEM_TILE  # one tile
    esm = jnp.asarray(rng.normal(size=(ne, 30, 30)).astype(np.float32))
    ue = jnp.asarray(rng.normal(size=(ne, 30)).astype(np.float32))
    ref = jnp.einsum("eij,ej->ei", esm, ue)
    out = pk.block_matvec(jnp.transpose(esm, (1, 2, 0)), ue.T, interpret=True)
    np.testing.assert_allclose(np.asarray(out.T), np.asarray(ref), rtol=2e-5, atol=1e-4)


def test_pallas_khat_matches_xla_khat():
    mesh = meshgen.box_tet10(2, 2, 2, 10.0, 10.0, 10.0)
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [(mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, 0.0, 0.0))]
    )
    coords = jnp.asarray(mesh.coords)
    eln = jnp.asarray(mesh.elnodes)
    dmat = mat.hooke_dmat(jnp.float64(210000.0), jnp.float64(0.3))
    esm = asm.elastic_stiffness_blocks(coords, eln, dmat)
    fixmask_np, _, _ = bcs.masks(mesh.ndof)
    nd = pad_ndof(mesh.ndof)
    fixmask = jnp.asarray(pad_vector(fixmask_np, nd))
    eldofs = asm.element_dof_ids(eln)
    khat_ref = asm.make_bc_matvec(esm, eldofs, fixmask)
    khat_pl = pk.make_pallas_matvec(esm, eldofs, fixmask)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=nd))
    np.testing.assert_allclose(
        np.asarray(khat_pl(u)), np.asarray(khat_ref(u)), rtol=1e-10, atol=1e-8
    )
