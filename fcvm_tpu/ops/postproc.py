"""Result post-processing: Gauss->node mapping, principal stresses,
surface/edge averaging, reinforcement design.

Vectorized numpy rebuilds of the reference's numba post-processing kernels:

* ``mapStresses``                 -> :func:`map_stresses`       (``fcVM.py:2496-2554``)
* ``calculate_principal_stress``  -> :func:`principal_stresses` (``fcVM.py:2953-2994``)
* ``calcSum``                     -> :func:`integrate_edges` / :func:`integrate_faces` (``fcVM.py:2830-2900``)
* ``calculate_rho``               -> :func:`reinforcement_rho`  (``fcVM.py:2997-3150``)
* ``calculate_mohr_coulomb``      -> :func:`mohr_coulomb`       (``fcVM.py:3153-3168``)

These run on host after the solve (they are output-bound, not compute-bound);
the solve-path state they consume is already numpy.
"""

from __future__ import annotations

import numpy as np

from fcvm_tpu.models.spec import TET10_EDGES
from fcvm_tpu.ops import elements as el


def map_stresses(
    averaged: bool,
    elnodes: np.ndarray,
    n_nodes: int,
    sig_gp: np.ndarray,
    peeq_gp: np.ndarray,
    csr_gp: np.ndarray,
    svm_gp: np.ndarray,
    noce: np.ndarray,
    sig_yield: float,
):
    """Gauss-point (4/element) -> nodal fields.

    Stresses are always averaged over adjacent elements (divided by ``noce``);
    scalars are averaged or element-maxed depending on ``averaged``
    (``fcVM.py:2519-2539``).  Midside nodes are interpolated from their two
    edge corners (the fixed 0.5 stencil ``map_inter``, ``fcVM.py:2500-2552``).

    Returns (stress (nn, 6), peeq, csr, svm, triax) nodal arrays.
    """
    ne = len(elnodes)
    corners = elnodes[:, :4]  # (ne, 4)
    triax_gp = (sig_gp[..., 0] + sig_gp[..., 1] + sig_gp[..., 2]) / 3.0 / sig_yield

    stress = np.zeros((n_nodes, 6))
    w = 1.0 / noce[corners]  # (ne, 4)
    np.add.at(stress, corners.reshape(-1), (sig_gp * w[..., None]).reshape(-1, 6))

    def nodal_scalar(gp_field):
        out = np.zeros(n_nodes)
        if averaged:
            np.add.at(out, corners.reshape(-1), (gp_field * w).reshape(-1))
        else:
            np.maximum.at(out, corners.reshape(-1), gp_field.reshape(-1))
        return out

    peeq = nodal_scalar(peeq_gp)
    csr = nodal_scalar(csr_gp)
    svm = nodal_scalar(svm_gp)
    triax = nodal_scalar(triax_gp)

    # midside nodes: mean of the two edge-corner values
    mids = elnodes[:, 4:].reshape(-1)
    pa = np.empty((ne, 6), dtype=np.int64)
    pb = np.empty((ne, 6), dtype=np.int64)
    for k, (a, b) in enumerate(TET10_EDGES):
        pa[:, k] = elnodes[:, a]
        pb[:, k] = elnodes[:, b]
    pa = pa.reshape(-1)
    pb = pb.reshape(-1)
    stress[mids] = 0.5 * (stress[pa] + stress[pb])
    for arr in (peeq, csr, svm, triax):
        arr[mids] = 0.5 * (arr[pa] + arr[pb])
    return stress, peeq, csr, svm, triax


def principal_stresses(stress: np.ndarray):
    """Sorted principal stresses + scaled principal direction vectors.

    Args:
      stress: (nn, 6) Voigt [xx,yy,zz,xy,zx,yz].

    Returns:
      (s1, s2, s3, v1, v2, v3): scalars (nn,), vectors (nn, 3) scaled by
      their eigenvalue (``fcVM.py:2986-2992``).
    """
    t = np.zeros((len(stress), 3, 3))
    t[:, 0, 0] = stress[:, 0]
    t[:, 1, 1] = stress[:, 1]
    t[:, 2, 2] = stress[:, 2]
    t[:, 0, 1] = t[:, 1, 0] = stress[:, 3]
    t[:, 0, 2] = t[:, 2, 0] = stress[:, 4]
    t[:, 1, 2] = t[:, 2, 1] = stress[:, 5]
    vals, vecs = np.linalg.eigh(t)  # ascending
    vals = vals[:, ::-1]
    vecs = vecs[:, :, ::-1]
    v1 = vals[:, 0, None] * vecs[:, :, 0]
    v2 = vals[:, 1, None] * vecs[:, :, 1]
    v3 = vals[:, 2, None] * vecs[:, :, 2]
    return vals[:, 0], vals[:, 1], vals[:, 2], v1, v2, v3


def integrate_edges(edge_groups, coords, *fields):
    """Length-averaged field values over groups of line3 edge elements.

    Args:
      edge_groups: list of (n_i, 3) node-id arrays (one group per named edge).
      fields: nodal arrays to average.

    Returns:
      (lengths, [averages per field]) — the reference's per-edge rows
      (``fcVM.py:2840-2865``).
    """
    lengths = []
    avgs = [[] for _ in fields]
    shp = el.SHP2_AT_GP  # (2 gp, 3 nodes)
    w = el.W2
    for group in edge_groups:
        group = np.asarray(group, dtype=np.int64).reshape(-1, 3)
        total_l = 0.0
        totals = [0.0] * len(fields)
        for elem in group:
            xle = coords[elem]  # (3, 3)
            dx = el.DSHP2_AT_GP @ xle  # (2, 3)
            xsj = np.linalg.norm(dx, axis=1)  # (2,)
            dl = shp * (np.abs(xsj) * w)[:, None]  # (2, 3)
            total_l += dl.sum()
            for i, f in enumerate(fields):
                totals[i] += (dl * f[elem][None, :]).sum()
        lengths.append(total_l)
        for i in range(len(fields)):
            avgs[i].append(totals[i] / total_l if total_l > 0 else 0.0)
    return lengths, avgs


def integrate_faces(face_groups, coords, *fields):
    """Area-averaged field values over groups of tri6 face elements
    (``fcVM.py:2872-2898``)."""
    import jax.numpy as jnp

    areas = []
    avgs = [[] for _ in fields]
    shp = el.SHP6_AT_GP  # (6 gp, 6 nodes)
    w = el.W6
    for group in face_groups:
        group = np.asarray(group, dtype=np.int64).reshape(-1, 6)
        total_a = 0.0
        totals = [0.0] * len(fields)
        for elem in group:
            xlf = coords[elem]
            xsj, _ = el.tri6_surface_frame(jnp.asarray(xlf))
            xsj = np.abs(np.asarray(xsj))
            da = shp * (xsj * w)[:, None]  # (6, 6)
            total_a += da.sum()
            for i, f in enumerate(fields):
                totals[i] += (da * f[elem][None, :]).sum()
        areas.append(total_a)
        for i in range(len(fields)):
            avgs[i].append(totals[i] / total_a if total_a > 0 else 0.0)
    return areas, avgs


def reinforcement_rho(stress: np.ndarray, fy: float) -> np.ndarray:
    """Orthogonal reinforcement ratios per node (HERON 53-4 closed forms).

    Evaluates the reference's 15 candidate solutions, keeps those with
    non-negative ratios and an admissible (compressive) concrete stress
    state, and returns the minimum-sum candidate (``fcVM.py:2997-3150``).
    """
    out = np.zeros((len(stress), 3))
    for index, s in enumerate(stress):
        sxx, syy, szz, sxy, sxz, syz = s[0], s[1], s[2], s[3], s[4], s[5]
        rhox = np.zeros(15)
        rhoy = np.zeros(15)
        rhoz = np.zeros(15)
        i3 = (
            sxx * syy * szz
            + 2 * sxy * sxz * syz
            - sxx * syz**2
            - syy * sxz**2
            - szz * sxy**2
        )
        d = sxx * syy - sxy**2
        if d != 0.0:
            rhoz[0] = i3 / d / fy
        d = sxx * szz - sxz**2
        if d != 0.0:
            rhoy[1] = i3 / d / fy
        d = syy * szz - syz**2
        if d != 0.0:
            rhox[2] = i3 / d / fy
        if sxx != 0.0:
            fc = sxz * sxy / sxx - syz
            fxy = sxy**2 / sxx
            fxz = sxz**2 / sxx
            rhoy[3] = (syy - fxy + fc) / fy
            rhoz[3] = (szz - fxz + fc) / fy
            rhoy[4] = (syy - fxy - fc) / fy
            rhoz[4] = (szz - fxz - fc) / fy
        if syy != 0.0:
            fc = syz * sxy / syy - sxz
            fxy = sxy**2 / syy
            fyz = syz**2 / syy
            rhox[5] = (sxx - fxy + fc) / fy
            rhoz[5] = (szz - fyz + fc) / fy
            rhox[6] = (sxx - fxy - fc) / fy
            rhoz[6] = (szz - fyz - fc) / fy
        if szz != 0.0:
            fc = sxz * syz / szz - sxy
            fxz = sxz**2 / szz
            fyz = syz**2 / szz
            rhox[7] = (sxx - fxz + fc) / fy
            rhoy[7] = (syy - fyz + fc) / fy
            rhox[8] = (sxx - fxz - fc) / fy
            rhoy[8] = (syy - fyz - fc) / fy
        rhox[9] = (sxx + sxy + sxz) / fy
        rhoy[9] = (syy + sxy + syz) / fy
        rhoz[9] = (szz + sxz + syz) / fy
        rhox[10] = (sxx + sxy - sxz) / fy
        rhoy[10] = (syy + sxy - syz) / fy
        rhoz[10] = (szz - sxz - syz) / fy
        rhox[11] = (sxx - sxy - sxz) / fy
        rhoy[11] = (syy - sxy + syz) / fy
        rhoz[11] = (szz - sxz + syz) / fy
        rhox[12] = (sxx - sxy + sxz) / fy
        rhoy[12] = (syy - sxy - syz) / fy
        rhoz[12] = (szz + sxz - syz) / fy
        if syz != 0.0:
            rhox[13] = (sxx - sxy * sxz / syz) / fy
        if sxz != 0.0:
            rhoy[13] = (syy - sxy * syz / sxz) / fy
        if sxy != 0.0:
            rhoz[13] = (szz - sxz * syz / sxy) / fy

        rmin = 1.0e9
        eqmin = 14
        for ir in range(rhox.size):
            if rhox[ir] >= -1e-10 and rhoy[ir] >= -1e-10 and rhoz[ir] > -1e-10:
                scxx = sxx - rhox[ir] * fy
                scyy = syy - rhoy[ir] * fy
                sczz = szz - rhoz[ir] * fy
                ic1 = scxx + scyy + sczz
                ic2 = (
                    scxx * scyy + scyy * sczz + sczz * scxx
                    - sxy**2 - sxz**2 - syz**2
                )
                ic3 = (
                    scxx * scyy * sczz
                    + 2 * sxy * sxz * syz
                    - scxx * syz**2
                    - scyy * sxz**2
                    - sczz * sxy**2
                )
                if ic1 <= 1e-6 and ic2 >= -1e-6 and ic3 <= 1e-6:
                    rsum = rhox[ir] + rhoy[ir] + rhoz[ir]
                    if 0.0 < rsum < rmin:
                        rmin = rsum
                        eqmin = ir
        out[index] = [rhox[eqmin], rhoy[eqmin], rhoz[eqmin]]
    return out


def mohr_coulomb(prin1, prin3, phi: float, fck: float):
    """Mohr-Coulomb crushing/shear check (``fcVM.py:3153-3168``)."""
    coh = fck * (1 - np.sin(phi)) / 2 / np.cos(phi)
    mc = (prin1 - prin3) + (prin1 + prin3) * np.sin(phi) - 2.0 * coh * np.cos(phi)
    return np.maximum(mc, 0.0)
