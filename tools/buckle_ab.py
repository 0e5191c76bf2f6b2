"""A/B probe: f32 buckling factors on the slender imperfect-column case.

Round-3 regression hunt: after the subspace-correction precision fixes the
f32 eigensolve stopped breaking down (no f64 retry) and silently converged
to wrong factors ([51.9, 69.3] vs the correct [2.23, 2.24]).  Isolates the
candidates: buckling deflation recycling (FCVM_DEFLATION=0), the coarse
base ridge (FCVM_AB_RIDGE=3e-4 restores the round-2 ladder), and dtype
(FCVM_DTYPE=float64 for truth).

Usage: python tools/buckle_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fcvm_tpu.config import enable_compilation_cache

enable_compilation_cache()

ridge = os.environ.get("FCVM_AB_RIDGE")
if ridge:
    from fcvm_tpu.ops import precond

    precond._RIDGE_LADDER = (float(ridge),) + tuple(
        r for r in precond._RIDGE_LADDER if r > float(ridge)
    )
    print("ridge ladder:", precond._RIDGE_LADDER, flush=True)

import fcvm_tpu

case = sys.argv[1] if len(sys.argv) > 1 else (
    "examples/imperfect_column_collapse.toml"
)
if case.endswith(".FCStd"):
    from fcvm_tpu.models.fcstd import load_reference_case

    model, params = load_reference_case(case)
else:
    from fcvm_tpu.models.casefile import load_case

    model, params = load_case(case)
t0 = time.perf_counter()
factors, modes = fcvm_tpu.linear_buckling(model, params, k=2)
print("factors:", np.asarray(factors), flush=True)
print(f"wall: {time.perf_counter() - t0:.1f}s", flush=True)
