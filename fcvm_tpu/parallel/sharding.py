"""Multi-chip element-partition sharding building blocks (demo tier).

NOTE: the *production* multi-chip path is
:class:`fcvm_tpu.parallel.system.ShardedSystem`, which runs the full
collapse driver SPMD with the two-level preconditioner; this module keeps
the self-contained building blocks (model sharding, one-psum matvec, a
single elastic Riks step) used by its tests and the fast smoke path.

The reference has no distributed capability (SURVEY.md section 2); the
scaling axis of this workload is mesh size.  The TPU-native scaling design:

* **Elements are the sharded axis.**  Every per-element array — connectivity,
  stiffness blocks, Gauss-point state (stress, yield, PEEQ, CSR) — is
  partitioned over the ``"e"`` mesh axis.  Element integration, tangent
  assembly and stress return are embarrassingly parallel, so they run with
  zero communication.
* **Node vectors are replicated.**  The only cross-device communication in
  the whole solver is one ``psum`` over the element axis per operator
  application (the node-boundary scatter-add), riding ICI.  Dot products in
  CG reuse the replicated vectors, so they are free of collectives.
* The Krylov loop, Riks correction and stress update all live inside a
  single ``jit`` whose intermediate shardings XLA propagates from these
  ``shard_map`` building blocks.

For meshes whose node vectors outgrow one chip's HBM, the next refinement is
a node partition with ``psum_scatter`` halo exchange — the element partition
here is the first-order design because ndof ~ 4 MB per million dofs (f32),
tiny next to the element blocks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(n_devices: int = 0, axis: str = "e") -> Mesh:
    devs = jax.devices()
    if n_devices <= 0:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), (axis,))


def pad_elements(elnodes: np.ndarray, n_shards: int):
    """Pad the element list to a multiple of the shard count.

    Padding elements replicate element 0's connectivity but are masked by a
    zero weight, so their stiffness/force contributions vanish identically —
    scatter-adds of zeros are safe and keep every shard's shapes static.

    Returns (elnodes_padded, weights (ne_padded,)).
    """
    ne = len(elnodes)
    ne_pad = ((ne + n_shards - 1) // n_shards) * n_shards
    weights = np.zeros(ne_pad)
    weights[:ne] = 1.0
    if ne_pad == ne:
        return elnodes, weights
    pad = np.tile(elnodes[:1], (ne_pad - ne, 1))
    return np.concatenate([elnodes, pad], axis=0), weights


class ShardedModel(NamedTuple):
    """Device-resident model arrays with element-axis shardings applied."""

    coords: jnp.ndarray  # (nn, 3) replicated
    elnodes: jnp.ndarray  # (ne_pad, 10) sharded P('e')
    weights: jnp.ndarray  # (ne_pad,) sharded P('e') — 0 on padding
    fixmask: jnp.ndarray  # (ndof,) replicated
    u_fix: jnp.ndarray  # (ndof,) replicated
    dmat: jnp.ndarray  # (6, 6) replicated
    mesh: Mesh


def shard_model(model, device_mesh: Mesh, dtype=jnp.float32) -> ShardedModel:
    """Place a :class:`fcvm_tpu.models.spec.Model` onto the device mesh."""
    n_shards = device_mesh.devices.size
    eln_pad, weights = pad_elements(model.mesh.elnodes, n_shards)
    fixmask, u_fix, _ = model.bcs.masks(model.mesh.ndof)
    from fcvm_tpu.ops import material as mat

    sh_e = NamedSharding(device_mesh, P("e"))
    sh_r = NamedSharding(device_mesh, P())
    dmat = mat.hooke_dmat(
        jnp.asarray(model.material.e, dtype=dtype),
        jnp.asarray(model.material.nu, dtype=dtype),
    )
    return ShardedModel(
        coords=jax.device_put(jnp.asarray(model.mesh.coords, dtype=dtype), sh_r),
        elnodes=jax.device_put(jnp.asarray(eln_pad, dtype=jnp.int32), sh_e),
        weights=jax.device_put(jnp.asarray(weights, dtype=dtype), sh_e),
        fixmask=jax.device_put(jnp.asarray(fixmask, dtype=dtype), sh_r),
        u_fix=jax.device_put(jnp.asarray(u_fix, dtype=dtype), sh_r),
        dmat=jax.device_put(dmat, sh_r),
        mesh=device_mesh,
    )


# ---------------------------------------------------------------------------
# shard_map building blocks
# ---------------------------------------------------------------------------


def _eldofs(elnodes):
    return (3 * elnodes[:, :, None] + jnp.arange(3)[None, None, :]).reshape(
        elnodes.shape[0], 30
    )


def sharded_assemble(sm: ShardedModel):
    """Element stiffness blocks + block-Jacobi inverse, element-sharded.

    The esm computation is communication-free; the nodal preconditioner
    blocks need one psum over the element axis.
    """
    from fcvm_tpu.ops import assembly as asm
    from fcvm_tpu.utils.linalg3 import inv3_spd

    ndof = sm.fixmask.shape[0]
    nn = ndof // 3

    def local(coords, elnodes, weights, dmat, fixmask):
        esm = asm.elastic_stiffness_blocks(coords, elnodes, dmat)
        esm = esm * weights[:, None, None]
        ne = esm.shape[0]
        blocks5 = esm.reshape(ne, 10, 3, 10, 3)
        idx = jnp.arange(10)
        diag = blocks5[:, idx, :, idx, :]  # (10, ne, 3, 3)
        node_ids = elnodes.T.reshape(-1)
        nodal = jax.ops.segment_sum(diag.reshape(-1, 3, 3), node_ids, num_segments=nn)
        nodal = jax.lax.psum(nodal, "e")
        m3 = fixmask.reshape(nn, 3)
        mask_ij = m3[:, :, None] * m3[:, None, :]
        eye = jnp.eye(3, dtype=esm.dtype)
        nodal = nodal * mask_ij + (1.0 - m3)[:, :, None] * eye[None]
        return esm, inv3_spd(nodal)

    return jax.shard_map(
        local,
        mesh=sm.mesh,
        in_specs=(P(), P("e"), P("e"), P(), P()),
        out_specs=(P("e"), P()),
    )(sm.coords, sm.elnodes, sm.weights, sm.dmat, sm.fixmask)


def sharded_matvec_fn(sm: ShardedModel, esm):
    """Returns ``K_hat @ v``: the one-psum-per-application sharded operator."""
    ndof = sm.fixmask.shape[0]

    def khat(u):
        def local(esm_l, elnodes_l, fixmask, u_r):
            up = (fixmask * u_r).reshape(-1, 3)
            ne_l = elnodes_l.shape[0]
            fe = jnp.einsum("eij,ej->ei", esm_l, up[elnodes_l].reshape(ne_l, 30))
            y = jax.ops.segment_sum(
                fe.reshape(-1, 3), elnodes_l.reshape(-1), num_segments=ndof // 3
            ).reshape(-1)
            y = jax.lax.psum(y, "e")
            return fixmask * y + (1.0 - fixmask) * u_r

        return jax.shard_map(
            local,
            mesh=sm.mesh,
            in_specs=(P("e"), P("e"), P(), P()),
            out_specs=P(),
        )(esm, sm.elnodes, sm.fixmask, u)

    return khat


def sharded_internal_force_fn(sm: ShardedModel, e, nu, et_e, large_disp: bool):
    """Full sharded stress update + internal force (the NR hot kernel).

    Returns ``f(sig_yield, disp, du, sig_old) -> (sig_new, sig_test, pgp, qin)``
    with Gauss state sharded P('e') and qin replicated.
    """
    from fcvm_tpu.ops.stress_update import _element_stress_update
    from fcvm_tpu.ops import material as mat

    ndof = sm.fixmask.shape[0]
    g = mat.shear_modulus(e, nu)
    h = mat.hardening_modulus(e, et_e)

    def f(sig_yield, disp, du, sig_old):
        def local(coords, elnodes_l, weights, dmat, sig_yield_l, disp_r, du_r, sig_old_l):
            coords_el = coords[elnodes_l]
            u_el = disp_r.reshape(-1, 3)[elnodes_l]
            du_el = du_r.reshape(-1, 3)[elnodes_l]

            def one(c, u, d, s, sy):
                return _element_stress_update(c, u, d, s, sy, dmat, h, g, large_disp)

            sig_new, sig_test, pgp, elv = jax.vmap(one)(
                coords_el, u_el, du_el, sig_old_l, sig_yield_l
            )
            elv = elv * weights[:, None]
            qin = jax.ops.segment_sum(
                elv.reshape(-1, 3), elnodes_l.reshape(-1), num_segments=ndof // 3
            ).reshape(-1)
            return sig_new, sig_test, pgp, jax.lax.psum(qin, "e")

        return jax.shard_map(
            local,
            mesh=sm.mesh,
            in_specs=(P(), P("e"), P("e"), P(), P("e"), P(), P(), P("e")),
            out_specs=(P("e"), P("e"), P("e"), P()),
        )(sm.coords, sm.elnodes, sm.weights, sm.dmat, sig_yield, disp, du, sig_old)

    return f


def sharded_newton_load_step(sm: ShardedModel, e, nu, et_e, large_disp=False,
                             relax=1.0, cg_rtol=1e-5, cg_maxiter=200,
                             nr_tol=1e-4, nr_maxiter=8):
    """One full Riks load step as a single jitted SPMD program.

    This is the multi-chip "train step": elastic predictor state in, converged
    incremental state out, with the NR loop and the inner CG both as
    ``lax.while_loop`` on device.  Used by ``dryrun_multichip`` and the bench.
    """
    from fcvm_tpu.ops.solver import pcg
    from fcvm_tpu.ops.assembly import apply_block_precond
    from fcvm_tpu.runtime.system import riks_update

    esm, pinv = sharded_assemble(sm)
    khat = sharded_matvec_fn(sm, esm)
    qin_fn = sharded_internal_force_fn(sm, e, nu, et_e, large_disp)
    precond = lambda r: apply_block_precond(pinv, r)

    def solve(b):
        return pcg(khat, b, precond=precond, rtol=cg_rtol, maxiter=cg_maxiter).x

    @jax.jit
    def load_step(glv, ue, du0, lbd0, dl, sig_old, sig_yield, disp, qnorm):
        lbd1 = lbd0 + dl
        a = du0

        # carry: (du, lbd1, sig_new, sig_test, pgp, r, err, it)
        sig_new, sig_test, pgp, qin = qin_fn(sig_yield, disp, du0, sig_old)
        r = sm.fixmask * (lbd1 * glv - qin)
        err = jnp.linalg.norm(r) / qnorm

        def cond(c):
            return jnp.logical_and(c[6] > nr_tol, c[7] < nr_maxiter)

        def body(c):
            du, lbd1, _, _, _, r, _, it = c
            due = solve(relax * r)
            du, lbd1, _ = riks_update(a, ue, due, du, lbd0, lbd1)
            sig_new, sig_test, pgp, qin = qin_fn(sig_yield, disp, du, sig_old)
            r = sm.fixmask * (lbd1 * glv - qin)
            err = jnp.linalg.norm(r) / qnorm
            return (du, lbd1, sig_new, sig_test, pgp, r, err, it + 1)

        init = (du0, lbd1, sig_new, sig_test, pgp, r, err, jnp.array(0, jnp.int32))
        du, lbd1, sig_new, sig_test, pgp, r, err, it = jax.lax.while_loop(
            cond, body, init
        )
        return du, lbd1, sig_new, sig_test, pgp, err, it

    return load_step, (esm, pinv, khat, solve, qin_fn)
