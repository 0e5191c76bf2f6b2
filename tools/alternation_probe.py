"""Executable-alternation launch timing.

Production interleaves DIFFERENT large executables every NR iteration
(tangent -> [make_deflation] -> solve -> residual ...), while the
launch-cost probes repeat one executable and measure parity.  This probe
times each launch in an alternating A/B/A/B pattern (tangent, solve) —
if alternated launches cost seconds where repeated launches cost
milliseconds, the production overhead is program-switch cost on the
remote runtime, and the roadmap is fewer/smaller programs per iteration,
not fewer dispatches.

Inputs are perturbed per launch (axon result-cache rule).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcvm_tpu.config import enable_compilation_cache, get_config

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from fcvm_tpu.runtime.backend import LocalSystem, make_backend  # noqa: E402

NX = int(os.environ.get("FCVM_PROBE_NX", "27"))
ROUNDS = int(os.environ.get("FCVM_PROBE_ROUNDS", "6"))


def run_pattern(label, steps):
    """steps: list of (name, fn, x0) launched in order, each timed."""
    # warm every executable once
    for name, fn, x0 in steps:
        jax.block_until_ready(fn(x0, 0))
    times = {name: [] for name, _, _ in steps}
    for r in range(ROUNDS):
        for name, fn, x0 in steps:
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x0, r + 1))
            times[name].append(time.perf_counter() - t0)
    for name, _, _ in steps:
        ts = np.asarray(times[name]) * 1e3
        print(f"[{label} {name}] per-launch ms: median {np.median(ts):.0f} "
              f"all {[f'{t:.0f}' for t in ts]}", flush=True)


def main():
    cfg = get_config()
    mesh, model = bench.build(NX)
    dtype = jnp.float32
    coords = jnp.asarray(model.mesh.coords, dtype)

    for mode in ("local", "sharded"):
        if mode == "local":
            be = LocalSystem(model, cfg, dtype)
        else:
            old = cfg.force_sharded
            cfg.force_sharded = True
            try:
                be = make_backend(model, cfg, dtype)
            finally:
                cfg.force_sharded = old
        esm, pinv, glv, rhs, *_ = be.assemble(model.mesh.coords)
        pc = be.make_pc(esm, pinv, coords)
        ue = be.solve(esm, pc, rhs).x
        pgp = be.gauss_false()
        sig0 = be.gauss_zeros((6,))
        sy = be.gauss_full(25.0)
        du = 0.1 * ue

        state = {"esm": esm, "pc": pc}

        def tangent(x0, k):
            out = be.tangent_refresh(
                coords, sig0, pgp, x0 * (1.0 + 1e-6 * k), du, pc, 0.1,
                ue0=ue,
            )
            # keep the fresh operator like production does
            state["esm"], state["pc"] = out[0], out[1]
            return out[3]

        def solve(x0, k):
            return be.solve(state["esm"], state["pc"],
                            x0 * (1.0 + 1e-6 * k)).x

        def residual(x0, k):
            return be.residual(coords, sy, jnp.zeros_like(ue),
                               x0 * (1.0 + 1e-6 * k), sig0, glv,
                               1.0, 1.0, 0.1, True)[4]

        print(f"--- {mode}: repeated baselines", flush=True)
        run_pattern(mode, [("tangent(rep)", tangent, 0.05 * ue)])
        run_pattern(mode, [("solve(rep)", solve, rhs)])
        print(f"--- {mode}: alternating tangent/solve/residual", flush=True)
        run_pattern(mode, [
            ("tangent(alt)", tangent, 0.05 * ue),
            ("solve(alt)", solve, rhs),
            ("residual(alt)", residual, ue),
        ])


if __name__ == "__main__":
    main()
