"""Embankment corpus replay on the REAL TPU: f32 vs f64 parity tiers."""
import os, sys, time
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
if mode == "f64":
    import jax
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from fcvm_tpu.config import get_config, enable_compilation_cache
enable_compilation_cache()
cfg = get_config()
cfg.dtype = "float64" if mode == "f64" else "float32"
from fcvm_tpu.models.fcstd import load_reference_case

t0 = time.perf_counter()
model, params = load_reference_case(
    "/root/reference/freeCAD files/Embankment_with_Ditch_Example.FCStd")
import fcvm_tpu
res = fcvm_tpu.solve_collapse(model, params, progress=lambda s: None)
lbd = np.asarray(res.history.lbd)
un = np.asarray(res.history.un)
committed = [0.248, 0.330, 0.409, 0.459, 0.478, 0.484, 0.487, 0.489]
errs = [float(np.min(np.abs(lbd - c)) / c) for c in committed]
print(f"mode={mode} dev={__import__('jax').default_backend()} "
      f"wall={time.perf_counter()-t0:.1f}s steps={len(lbd)-1}")
print("final LF", lbd[-1], "un_final", un[-1])
print("plateau rel errs:", " ".join(f"{e:.2e}" for e in errs))
print("max plateau rel err:", max(errs))
