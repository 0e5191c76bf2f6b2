import time
import numpy as np, jax
import jax.numpy as jnp
from fcvm_tpu.models import fcstd
from fcvm_tpu import api

model, params = fcstd.load_reference_case("/root/reference/freeCAD files/Embankment_with_Ditch_Example.FCStd")
t0=time.time()
res = api.run_analysis(model, params, outdir="/tmp/replay_emb_tpu", save_plots=False, progress=print)
print("wall:", round(time.time()-t0,1))
h = res.history
print("final LF:", round(h.lbd[-1],4), "(committed 0.503) un:", round(h.un[-1],1), "(562)")
print("cg:", res.cg_stats)
