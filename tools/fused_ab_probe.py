"""A/B the fused Newton iteration + HP-matvec escalation on hardware.

Runs the BENCH sharded-row configuration (499k-dof box, plastic GNL,
3 Riks steps at error_max 1e-5 — the regime whose graded r4 numbers were
37.3 s/step local vs 62.5 s/step sharded with restarts) through the
production driver under selectable switches, and prints per-run stats:
stepping wall, per-step wall, cg totals, Newton iterations, dispatches,
restarts, hp activations, lbd history.

Usage:
  python tools/fused_ab_probe.py local_fused local_unfused \
      sharded_fused sharded_unfused     # any subset, in order
  FCVM_PROBE_NX=27 overrides the mesh size.

Round-5 targets (VERDICT r4 items 1+3): fused sharded <= 1.15x fused
local per step; zero restarts at error_max 1e-5 via the HP escalation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcvm_tpu.config import enable_compilation_cache, get_config

enable_compilation_cache()

import numpy as np  # noqa: E402

import bench  # noqa: E402  (mesh builders + row config)
import fcvm_tpu  # noqa: E402

NX = int(os.environ.get("FCVM_PROBE_NX", "27"))


_SEQ = {"n": 0}


def run_one(label, sharded, fused):
    cfg = get_config()
    _, model = bench.build(NX)
    # axon caches (executable, args) results server-side: two runs of the
    # SAME physics through paths that share any executable (e.g.
    # tangent_refresh between the fused and unfused drivers) get those
    # calls served from cache and read as phantom speedups.  Scale the
    # WHOLE problem (traction AND yield) by a unique factor per run: the
    # solution scales exactly, every relative tolerance and iteration
    # count is invariant, and every device argument differs.
    _SEQ["n"] += 1
    c = 1.0 + 7.0e-5 * _SEQ["n"]
    model.loads.tractions = model.loads.tractions * c
    params = fcvm_tpu.ControlParams(
        sig_yield=25.0 * c, nstep=3, error_max=1e-5, et_e=0.1,
        target_lf=99.0, gnl="GNLY", max_imp=0.0,
    )
    old = (cfg.force_sharded, cfg.fused_newton)
    cfg.force_sharded = sharded
    cfg.fused_newton = fused
    lines = []
    t0 = time.perf_counter()
    try:
        res = fcvm_tpu.solve_collapse(model, params, progress=lines.append)
    finally:
        cfg.force_sharded, cfg.fused_newton = old
    wall = time.perf_counter() - t0
    nsteps = max(len(res.history.lbd) - 1, 1)
    st = res.timers.get("stepping", 0.0)
    restarts = sum("RESTART #" in ln for ln in lines)
    cs = res.cg_stats
    print(
        f"[{label}] wall {wall:.1f}s stepping {st:.1f}s "
        f"({st / nsteps * 1e3:.0f} ms/step, {nsteps} steps) "
        f"cg {cs['iters']} iters / {cs['solves']} solves, "
        f"newton {cs.get('newton_iterations')}, "
        f"dispatches {cs.get('dispatches')} "
        f"(fused {cs.get('fused_iterations')}), "
        f"restarts {restarts}, hp {cs.get('hp_matvec_activations')}, "
        f"refine {cs.get('refinement_activations')}, "
        f"clamps {cs.get('floor_clamps')}",
        flush=True,
    )
    print(f"  lbd: {[round(float(v), 6) for v in res.history.lbd]}",
          flush=True)
    print(f"  timers: {res.timers}", flush=True)
    print(f"  cg time {cs['time']:.1f}s (deferred {cs['deferred_solves']}), "
          f"tangent_time {cs['tangent_time']:.1f}s, predictor "
          f"{cs['predictor_iters']} iters / {cs['predictor_solves']} solves",
          flush=True)
    tail = [ln for ln in lines if any(k in ln for k in (
        "deflation", "harvest", "FLOOR", "RESTART", "NRTRACE"))]
    for ln in tail[:120]:
        print(f"  | {ln}", flush=True)
    return st / nsteps, res


def main():
    modes = sys.argv[1:] or ["local_fused", "local_unfused", "sharded_fused"]
    results = {}
    for i, m in enumerate(modes):
        sharded = m.startswith("sharded")
        fused = m.endswith("fused") and not m.endswith("unfused")
        # duplicated modes: the LAST occurrence (in-process warm) wins
        results[m] = run_one(f"{m}#{i}", sharded, fused)[0]
    if "local_fused" in results and "sharded_fused" in results:
        r = results["sharded_fused"] / results["local_fused"]
        print(f"sharded/local per-step ratio (fused): {r:.3f}", flush=True)
    if "local_fused" in results and "local_unfused" in results:
        r = results["local_unfused"] / results["local_fused"]
        print(f"unfused/fused per-step ratio (local): {r:.3f}", flush=True)


if __name__ == "__main__":
    main()
