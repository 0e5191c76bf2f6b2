"""Dof-vector padding for TPU gather/scatter alignment.

TPU dynamic gathers and scatter-adds fall off a ~400x performance cliff when
the source (gather) or output (scatter) vector length is not a multiple of
the native tile: measured 17 ms vs 0.04 ms for a 1.9M-index gather at 273k
dofs.  ``ndof = 3 * nn`` is generically odd, so every dof vector in the
solver is padded to a multiple of 384 = 3 * 128 (keeping ``nn_pad = ndof/3``
integral and lane-aligned).  Padding dofs carry ``fixmask = 0`` and zero
loads, so they behave as decoupled identity rows of ``K_hat``.
"""

from __future__ import annotations

import numpy as np

DOF_ALIGN = 384


def pad_ndof(ndof: int) -> int:
    return -(-ndof // DOF_ALIGN) * DOF_ALIGN


def pad_vector(v: np.ndarray, ndof_pad: int, fill=0.0) -> np.ndarray:
    out = np.full(ndof_pad, fill, dtype=v.dtype)
    out[: len(v)] = v
    return out
