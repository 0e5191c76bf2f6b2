"""Multi-chip correctness on the virtual 8-device CPU mesh: sharded results
must equal the single-device path bit-for-tolerance (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fcvm_tpu
from fcvm_tpu.models import meshgen
from fcvm_tpu.ops import assembly as asm
from fcvm_tpu.ops import material as mat
from fcvm_tpu.parallel import sharding as shd
from fcvm_tpu.runtime import system as sysm

E, NU, L = 210000.0, 0.3, 10.0


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = meshgen.box_tet10(2, 2, 3, L, L, L)  # 72 elements -> pads to 72
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [
            (mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, None, None)),
            (mesh.select_nodes(lambda x, y, z: y < 1e-9), (None, 0.0, None)),
            (mesh.select_nodes(lambda x, y, z: z < 1e-9), (None, None, 0.0)),
        ]
    )
    faces = mesh.faces_on(lambda x, y, z: x > L - 1e-9)
    loads = fcvm_tpu.Loads(
        traction_faces=faces, tractions=np.tile([100.0, 0, 0], (len(faces), 1))
    )
    model = fcvm_tpu.Model(mesh, fcvm_tpu.Material(E, NU), bcs, loads)
    dmesh = shd.make_device_mesh(8)
    sm = shd.shard_model(model, dmesh, dtype=jnp.float64)
    return mesh, model, dmesh, sm


def test_padding():
    eln = np.arange(50 * 10).reshape(50, 10)
    pad, w = shd.pad_elements(eln, 8)
    assert len(pad) == 56
    assert w.sum() == 50
    np.testing.assert_array_equal(pad[:50], eln)


def test_sharded_assembly_matches_single(setup):
    mesh, model, dmesh, sm = setup
    esm_sh, pinv_sh = shd.sharded_assemble(sm)
    coords = jnp.asarray(mesh.coords)
    eln = jnp.asarray(mesh.elnodes)
    dmat = mat.hooke_dmat(jnp.float64(E), jnp.float64(NU))
    esm_ref = asm.elastic_stiffness_blocks(coords, eln, dmat)
    fixmask, _, _ = model.bcs.masks(mesh.ndof)
    pinv_ref = asm.block_jacobi_inverse_blocks(esm_ref, eln, jnp.asarray(fixmask))
    ne = mesh.n_elements
    np.testing.assert_allclose(
        np.asarray(esm_sh)[:ne], np.asarray(esm_ref), rtol=1e-10, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(pinv_sh), np.asarray(pinv_ref), rtol=1e-10, atol=1e-12
    )


def test_sharded_matvec_matches_single(setup):
    mesh, model, dmesh, sm = setup
    esm_sh, _ = shd.sharded_assemble(sm)
    khat_sh = shd.sharded_matvec_fn(sm, esm_sh)
    coords = jnp.asarray(mesh.coords)
    eln = jnp.asarray(mesh.elnodes)
    dmat = mat.hooke_dmat(jnp.float64(E), jnp.float64(NU))
    esm_ref = asm.elastic_stiffness_blocks(coords, eln, dmat)
    fixmask, _, _ = model.bcs.masks(mesh.ndof)
    khat_ref = asm.make_bc_matvec(esm_ref, asm.element_dof_ids(eln), jnp.asarray(fixmask))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=mesh.ndof))
    np.testing.assert_allclose(
        np.asarray(khat_sh(u)), np.asarray(khat_ref(u)), rtol=1e-10, atol=1e-8
    )


def test_sharded_internal_force_matches_single(setup):
    mesh, model, dmesh, sm = setup
    from fcvm_tpu.ops.stress_update import update_stress_load

    ne_pad = sm.elnodes.shape[0]
    ne = mesh.n_elements
    rng = np.random.default_rng(1)
    disp = jnp.asarray(rng.normal(size=mesh.ndof) * 1e-3)
    du = jnp.asarray(rng.normal(size=mesh.ndof) * 1e-4)
    sig_old_np = rng.normal(size=(ne_pad, 4, 6)) * 50.0
    sy = jnp.full((ne_pad, 4), 240.0)

    qin_fn = shd.sharded_internal_force_fn(
        sm, jnp.float64(E), jnp.float64(NU), jnp.float64(0.1), large_disp=True
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh_e = NamedSharding(dmesh, P("e"))
    sig_old = jax.device_put(jnp.asarray(sig_old_np), sh_e)
    sn_sh, st_sh, pgp_sh, qin_sh = qin_fn(jax.device_put(sy, sh_e), disp, du, sig_old)

    dmat = mat.hooke_dmat(jnp.float64(E), jnp.float64(NU))
    sn, st, pgp, qin = update_stress_load(
        jnp.asarray(mesh.coords), jnp.asarray(mesh.elnodes), dmat,
        sy[:ne], disp, du, jnp.asarray(sig_old_np[:ne]),
        jnp.float64(E), jnp.float64(NU), jnp.float64(0.1), True,
    )
    np.testing.assert_allclose(np.asarray(sn_sh)[:ne], np.asarray(sn), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qin_sh), np.asarray(qin), rtol=1e-9, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(pgp_sh)[:ne], np.asarray(pgp))


def test_sharded_load_step_runs_and_matches_physics(setup):
    """One full sharded Riks load step reproduces the elastic solution."""
    mesh, model, dmesh, sm = setup
    lt = sysm.LoadTables.from_spec(model.loads, jnp.float64)
    coords = jnp.asarray(mesh.coords)
    eln = jnp.asarray(mesh.elnodes)
    dmat = mat.hooke_dmat(jnp.float64(E), jnp.float64(NU))
    fixmask, u_fix, _ = model.bcs.masks(mesh.ndof)
    esm, pinv, glv, rhs, *_ = sysm.assemble_elastic(
        coords, eln, dmat, lt, jnp.float64(0.0),
        jnp.asarray(fixmask), jnp.asarray(u_fix),
    )
    ue = sysm.solve_displacement(esm, eln, jnp.asarray(fixmask), pinv, rhs, 1e-12, 20000).x

    load_step, _ = shd.sharded_newton_load_step(
        sm, jnp.float64(E), jnp.float64(NU), jnp.float64(0.1),
        cg_rtol=1e-10, cg_maxiter=5000, nr_tol=1e-9, nr_maxiter=10,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    ne_pad = sm.elnodes.shape[0]
    sh_e = NamedSharding(dmesh, P("e"))
    zeros6 = jax.device_put(jnp.zeros((ne_pad, 4, 6)), sh_e)
    sy = jax.device_put(jnp.full((ne_pad, 4), 1e9), sh_e)  # stay elastic
    dl = 0.25
    du0 = dl * ue
    qnorm = jnp.linalg.norm(glv)
    du, lbd1, sig_new, sig_test, pgp, err, it = load_step(
        glv, ue, du0, jnp.float64(0.0), jnp.float64(dl), zeros6, sy,
        jnp.zeros(mesh.ndof), qnorm,
    )
    assert float(err) < 1e-9
    np.testing.assert_allclose(float(lbd1), dl, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(du), dl * np.asarray(ue), rtol=1e-6, atol=1e-12)
    assert not bool(jnp.any(pgp))
