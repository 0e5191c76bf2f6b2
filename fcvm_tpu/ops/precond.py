"""Preconditioners for the matrix-free CG solver.

Two levels:

* **Block-Jacobi** — inverse 3x3 nodal diagonal blocks
  (:func:`fcvm_tpu.ops.assembly.block_jacobi_inverse_blocks`), rebuilt with
  every tangent refresh.
* **Two-level aggregation coarse correction** — nodes are aggregated into
  index-contiguous clusters (the mesh generators and RCM-ordered imports are
  band-ordered, so contiguous index ranges are spatially compact); each
  cluster carries the 6 rigid-body modes (translations + rotations about the
  cluster centroid).  The coarse operator ``K_c = P^T K_hat P`` is assembled
  directly from the element blocks and inverted densely on device once; the
  per-iteration coarse correction is ``z += P K_c^{-1} P^T r``.

  Because clusters are index-contiguous, ``P`` / ``P^T`` are reshapes +
  einsums over a precomputed (nn, 3, 6) rigid-mode basis — no gather or
  scatter appears anywhere in the apply path, which is what makes the
  correction nearly free on TPU.

This is the TPU replacement for the spectral role of the reference's sparse
Cholesky factorization: global (long-wavelength) error is killed by the
coarse solve, local error by the nodal blocks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fcvm_tpu.ops import assembly as asm


class TwoLevelPrecond(NamedTuple):
    pinv: jnp.ndarray  # (nn, 3, 3) block-Jacobi inverses
    qmat: jnp.ndarray  # (nn_pad, 3, 6) rigid-body modes per node
    coarse_inv: jnp.ndarray  # (6 ncl, 6 ncl) dense inverse of P^T K P
    fixmask: jnp.ndarray  # (ndof,)

    def apply(self, r):
        z = asm.apply_block_precond(self.pinv, r)
        nn_pad = self.qmat.shape[0]
        ncl = self.coarse_inv.shape[0] // 6
        cs = nn_pad // ncl
        r3 = (self.fixmask * r).reshape(-1, 3)
        pad = nn_pad - r3.shape[0]
        r3p = jnp.pad(r3, ((0, pad), (0, 0)))
        # P^T r: project onto rigid modes and sum within clusters
        rc = jnp.einsum("nak,na->nk", self.qmat, r3p)  # (nn_pad, 6)
        rc = rc.reshape(ncl, cs, 6).sum(axis=1).reshape(-1)  # (6 ncl,)
        zc = self.coarse_inv @ rc
        zc_n = jnp.repeat(zc.reshape(ncl, 1, 6), cs, axis=1).reshape(nn_pad, 6)
        z2 = jnp.einsum("nak,nk->na", self.qmat, zc_n)  # (nn_pad, 3)
        z2 = z2[: r3.shape[0]].reshape(-1) * self.fixmask
        return z + z2


def apply_precond(pc, r):
    """Dispatch on the preconditioner pytree (trace-time static)."""
    if isinstance(pc, TwoLevelPrecond):
        return pc.apply(r)
    return asm.apply_block_precond(pc, r)


def refresh_blocks(pc, esm, elnodes, fixmask):
    """Rebuild the block-Jacobi part after a tangent refresh, keeping the
    coarse correction from the elastic operator (it only needs to stay SPD
    and spectrally close, cf. modified-NR reuse of the elastic factor in the
    reference, ``fcVM.py:1400-1406``)."""
    pinv = asm.block_jacobi_inverse_blocks(esm, elnodes, fixmask)
    if isinstance(pc, TwoLevelPrecond):
        return pc._replace(pinv=pinv)
    return pinv


def _rigid_modes(coords, cluster_size):
    """(nn_pad, 3, 6) rigid-body mode basis per node, centroid-centered."""
    nn = coords.shape[0]
    ncl = -(-nn // cluster_size)
    nn_pad = ncl * cluster_size
    pad = nn_pad - nn
    cpad = jnp.pad(coords, ((0, pad), (0, 0)))
    centroids = cpad.reshape(ncl, cluster_size, 3).mean(axis=1)
    d = cpad - jnp.repeat(centroids, cluster_size, axis=0)  # (nn_pad, 3)
    z = jnp.zeros(nn_pad, dtype=coords.dtype)
    eye = jnp.eye(3, dtype=coords.dtype)
    trans = jnp.broadcast_to(eye, (nn_pad, 3, 3))
    # rotation modes: u = omega x d -> u_a = eps_abc omega_b d_c
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    rot = jnp.stack(
        [
            jnp.stack([z, dz, -dy], axis=-1),
            jnp.stack([-dz, z, dx], axis=-1),
            jnp.stack([dy, -dx, z], axis=-1),
        ],
        axis=1,
    )  # (nn_pad, 3, 3): column b = mode omega_b
    q = jnp.concatenate([trans, rot], axis=2)  # (nn_pad, 3, 6)
    # zero the padding nodes so they contribute nothing
    mask = (jnp.arange(nn_pad) < nn).astype(coords.dtype)
    return q * mask[:, None, None]


def build_two_level(
    esm: jnp.ndarray,
    elnodes: jnp.ndarray,
    coords: jnp.ndarray,
    fixmask: jnp.ndarray,
    cluster_size: int = 64,
) -> TwoLevelPrecond:
    """Assemble the two-level preconditioner from element blocks.

    The coarse operator uses the Dirichlet-masked blocks, so it approximates
    ``K_hat`` exactly on the coarse space; near-singular coarse dofs (fully
    constrained clusters) are regularized to identity.
    """
    nn = fixmask.shape[0] // 3
    pinv = asm.block_jacobi_inverse_blocks(esm, elnodes, fixmask)

    qmat = _rigid_modes(coords, cluster_size)
    ncl = qmat.shape[0] // cluster_size
    m3 = fixmask.reshape(nn, 3)
    qmat_bc = qmat.at[:nn].mul(m3[:, :, None])

    ne = esm.shape[0]
    blocks = esm.reshape(ne, 10, 3, 10, 3)
    qe = qmat_bc[elnodes]  # (ne, 10, 3, 6)
    cid = jnp.asarray(jnp.arange(qmat.shape[0]) // cluster_size)[elnodes]  # (ne, 10)
    # 6x6 coarse pair blocks: Q_i^T B_ij Q_j
    pair = jnp.einsum("eiax,eiajb,ejby->eijxy", qe, blocks, qe)  # (ne,10,10,6,6)
    keys = (cid[:, :, None] * ncl + cid[:, None, :]).reshape(-1)
    kc = jax.ops.segment_sum(
        pair.reshape(-1, 6, 6), keys, num_segments=ncl * ncl
    ).reshape(ncl, ncl, 6, 6)
    kc_dense = jnp.transpose(kc, (0, 2, 1, 3)).reshape(6 * ncl, 6 * ncl)
    # regularize empty/constrained coarse dofs
    diag = jnp.diag(kc_dense)
    scale = jnp.max(diag)
    fix_diag = jnp.where(diag <= 1e-12 * scale, scale, 0.0)
    kc_dense = kc_dense + jnp.diag(fix_diag)
    coarse_inv = jnp.linalg.inv(kc_dense)
    return TwoLevelPrecond(pinv, qmat_bc, coarse_inv, fixmask)
