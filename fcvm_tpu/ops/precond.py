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
    # rotation modes: u = omega x d -> u_a = eps_abc omega_b d_c, normalized
    # by the cluster rms offset so all six modes have comparable magnitude
    # (keeps cond(K_c) low enough for an f32 apply of the coarse inverse).
    d_rms = jnp.sqrt(
        (d.reshape(ncl, cluster_size, 3) ** 2).mean(axis=(1, 2))
    )  # (ncl,)
    scale = 1.0 / jnp.maximum(jnp.repeat(d_rms, cluster_size), 1e-30)
    dx, dy, dz = d[:, 0] * scale, d[:, 1] * scale, d[:, 2] * scale
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

    The coarse Galerkin assembly runs on host in chunked numpy: its natural
    intermediates have tiny trailing (6, 6) dims that tile catastrophically
    in TPU HBM (a (ne, 10, 10, 6, 6) value pads ~28x).  It happens once per
    analysis; the dense inverse goes back on device where the MXU makes it
    cheap.
    """
    import numpy as np

    nn_pad = fixmask.shape[0] // 3  # includes dof-alignment padding
    pinv = asm.block_jacobi_inverse_blocks(esm, elnodes, fixmask)

    nn = coords.shape[0]
    coords_p = jnp.pad(coords, ((0, nn_pad - nn), (0, 0)))
    qmat = _rigid_modes(coords_p, cluster_size)
    ncl = qmat.shape[0] // cluster_size
    m3 = jnp.pad(fixmask.reshape(nn_pad, 3), ((0, qmat.shape[0] - nn_pad), (0, 0)))
    qmat_bc = qmat * m3[:, :, None]

    ne = esm.shape[0]
    esm_np = np.asarray(esm)
    eln_np = np.asarray(elnodes)
    q_np = np.asarray(qmat_bc)
    cid_np = (np.arange(qmat.shape[0]) // cluster_size)[eln_np]  # (ne, 10)

    kc_flat = np.zeros((ncl * ncl, 6, 6), dtype=np.float64)
    chunk = max(1, 2_000_000 // 100)  # ~2M pair-blocks per chunk
    for s in range(0, ne, chunk):
        e = slice(s, min(s + chunk, ne))
        c = min(s + chunk, ne) - s
        blocks = esm_np[e].astype(np.float32)  # (c, 30, 30)
        qe = q_np[eln_np[e]].astype(np.float32)  # (c, 10, 3, 6)
        # pair[c,i,j] = Q_i^T B_ij Q_j via two batched BLAS matmuls
        # (a 5-operand einsum here costs minutes at 500k dofs)
        qe_t = np.ascontiguousarray(qe.transpose(0, 1, 3, 2)).reshape(c * 10, 6, 3)
        b_rows = blocks.reshape(c, 10, 3, 30).reshape(c * 10, 3, 30)
        s1 = (qe_t @ b_rows).reshape(c, 10, 6, 10, 3)  # (c,i,x,j,b)
        s1 = np.ascontiguousarray(s1.transpose(0, 3, 1, 2, 4))  # (c,j,i,x,b)
        qe_j = qe.reshape(c, 10, 3, 6)
        pair = (s1.reshape(c * 10, 60, 3) @ qe_j.reshape(c * 10, 3, 6))
        pair = pair.reshape(c, 10, 10, 6, 6).transpose(0, 2, 1, 3, 4)  # (c,i,j,x,y)
        ci = cid_np[e][:, :, None].repeat(10, axis=2)
        cj = cid_np[e][:, None, :].repeat(10, axis=1)
        keys = (ci * ncl + cj).reshape(-1)
        vals = pair.reshape(-1, 36)
        # Sort-and-segment reduction: one argsort + reduceat streams the
        # chunk once, vs 36 full-length bincount passes (~6x on this host).
        order = np.argsort(keys, kind="stable")
        k_sorted = keys[order]
        v_sorted = vals[order]
        starts = np.r_[0, np.flatnonzero(np.diff(k_sorted)) + 1]
        seg = np.add.reduceat(v_sorted.astype(np.float64), starts, axis=0)
        kc2d = kc_flat.reshape(ncl * ncl, 36)
        np.add.at(kc2d, k_sorted[starts], seg)
    kc = kc_flat.reshape(ncl, ncl, 6, 6)

    kc_dense = np.transpose(kc, (0, 2, 1, 3)).reshape(6 * ncl, 6 * ncl)
    diag = np.diagonal(kc_dense).copy()
    scale = diag.max()
    diag[diag <= 1e-12 * scale] = scale
    # Symmetric Jacobi scaling before the f64 host inversion keeps the
    # explicit inverse balanced, bounding the f32 cancellation error of the
    # per-iteration coarse matvec (a raw f32/TPU LU inversion is unusable:
    # the coarse matrix inherits the stiffness conditioning).
    dscale = 1.0 / np.sqrt(diag)
    kc_scaled = kc_dense * dscale[:, None] * dscale[None, :]
    np.fill_diagonal(kc_scaled, np.maximum(np.diagonal(kc_scaled), 1.0))
    # Ridge on the scaled matrix: index-contiguous clusters can be nearly
    # collinear (band-ordered meshes), leaving a near-null axis-rotation
    # mode whose exploding inverse entries an f32 apply cannot cancel.
    # The ridge bounds ||inv|| by 1/ridge while perturbing healthy modes
    # (diag ~ 1) by O(ridge).
    ridge = 1.0e-4
    kc_scaled += ridge * np.eye(len(kc_scaled))
    # f32 inversion is safe here: scaling + ridge bound the condition number
    # by ~1/ridge, and the result is only a preconditioner.  The scaled
    # matrix is SPD (diag >= 1 + ridge after the identity floor), so invert
    # via Cholesky on the default device: the TPU MXU does the 9000^2 case
    # in ~1s, and even jax-CPU LAPACK beats numpy's f32 getri ~4x here.
    kcs_dev = jnp.asarray(kc_scaled, dtype=jnp.float32)
    chol = jax.scipy.linalg.cho_factor(kcs_dev, lower=True)
    inv_scaled = jax.scipy.linalg.cho_solve(
        chol, jnp.eye(kcs_dev.shape[0], dtype=jnp.float32)
    )
    dscale_dev = jnp.asarray(dscale, dtype=jnp.float32)
    coarse_inv = (inv_scaled * dscale_dev[:, None] * dscale_dev[None, :]).astype(
        esm.dtype
    )
    return TwoLevelPrecond(pinv, qmat_bc, coarse_inv, fixmask)
