"""Corpus replay on the REAL TPU: f32 vs f64 precision-tier parity.

Usage: python tools/tpu_parity.py [f32|f64] [case-stem]

Replays ``freeCAD files/<case>.FCStd`` (+ paired ``.inp``; committed VTK
mesh substituted automatically when the archive's mesh was purged) with the
CG solver on the current backend and compares the load/displacement history
against the committed ``output files/<case>.out`` step table.
"""
import sys, os, time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.abspath(
        globals().get("__file__", "tools/x.py")
    ))),
)
import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
case = sys.argv[2] if len(sys.argv) > 2 else "Embankment_with_Ditch_Example"
if mode == "f64":
    import jax

    jax.config.update("jax_enable_x64", True)
from fcvm_tpu.config import get_config, enable_compilation_cache

enable_compilation_cache()
cfg = get_config()
cfg.dtype = "float64" if mode == "f64" else "float32"
from pathlib import Path

from fcvm_tpu.models.fcstd import load_reference_case

REF = Path("/root/reference")
doc = REF / "freeCAD files" / f"{case}.FCStd"
vtk = REF / "output files" / f"{case}.vtk"
kw = {}
try:
    model, params = load_reference_case(doc)
except Exception:
    model, params = load_reference_case(doc, mesh_path=vtk)

# committed step table: load (col 4) and disp (col 5)
rows = []
in_table = False
for line in (REF / "output files" / f"{case}.out").read_text().splitlines():
    if line.startswith("Gauss point"):
        in_table = True
        continue
    if in_table:
        parts = line.split()
        if len(parts) != 12:
            break
        rows.append((float(parts[4]), float(parts[5])))
com_load = np.array([r[0] for r in rows])
com_disp = np.array([r[1] for r in rows])

import fcvm_tpu

t0 = time.perf_counter()
res = fcvm_tpu.solve_collapse(model, params, progress=lambda s: None)
lbd = np.asarray(res.history.lbd)
un = np.asarray(res.history.un)
import jax

print(f"case={case} mode={mode} dev={jax.default_backend()} "
      f"wall={time.perf_counter() - t0:.1f}s steps={len(lbd) - 1}")
n = min(len(lbd), len(com_load))
rel = np.abs(lbd[:n] - com_load[:n]) / np.maximum(np.abs(com_load[:n]), 1e-30)
reld = np.abs(un[:n] - com_disp[:n]) / np.maximum(np.abs(com_disp[:n]), 1e-30)
print(f"shared prefix {n} rows: max load rel err {rel[1:].max():.2e}, "
      f"max disp rel err {reld[1:].max():.2e}")
print(f"final: LF {lbd[-1]:.5f} (committed {com_load[-1]:.3f}), "
      f"un {un[-1]:.4g} (committed {com_disp[-1]:.3g})")
