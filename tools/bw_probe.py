"""HBM bandwidth + matvec-plateau probe (v5e via axon).

Questions this answers (docs/PERFORMANCE.md "Next levers" follow-up):
1. What is the real achievable streaming bandwidth on this chip/runtime
   (XLA elementwise pass over a 2 GiB array)?
2. Does the 100-130 GB/s plateau of every block-matvec formulation come
   from the op structure or from DMA pipelining depth?  A manual Pallas
   read-only kernel with K outstanding copies (K = 1, 4, 8) separates
   "single in-flight DMA" from "DMA engine saturated".
3. Per-index gather cost vs row width (12 B vs 48 B rows) and the
   batched small-domain gather (take_along_axis) alternative.

Measurement discipline (axon): ``block_until_ready`` through the tunnel can
elide unused work (phantom 1000x speedups).  Every section therefore chains
ITERS dependent passes inside one on-device ``lax.fori_loop`` and fetches a
scalar reduction to host; reported time is wall / ITERS.

Run on the TPU (one process!), generous timeout.  All sections are
independent; failures print and continue.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fcvm_tpu.config import enable_compilation_cache

enable_compilation_cache()

V5E_PEAK_GBS = 819.0


def section(name):
    print(f"--- {name}", flush=True)


def timeit_chain(step, state, iters, fetch):
    """Median wall/iter of ``state = step(state)`` chained on device.

    ``fetch(state) -> scalar array`` forces a host transfer so the tunnel
    cannot elide the chain.  Returns seconds per iteration.
    """

    @jax.jit
    def run(state):
        state = jax.lax.fori_loop(0, iters, lambda i, s: step(s), state)
        return fetch(state), state

    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        scalar, state = run(state)
        float(scalar)  # host fetch = real barrier
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[1:])) / iters


# ---------------------------------------------------------------- 1. XLA BW
ROWS = 2 ** 22  # (4M, 128) f32 = 2 GiB
try:
    section("xla elementwise (2 GiB read + 2 GiB write per pass)")
    x = jnp.ones((ROWS, 128), jnp.float32)
    t = timeit_chain(lambda x: x * 1.0000001, x, 64, lambda x: x[0, 0])
    gb = 2 * x.nbytes / 1e9
    print(f"elementwise: {t*1e3:.2f} ms -> {gb/t:.0f} GB/s rw "
          f"({gb/t/V5E_PEAK_GBS*100:.0f}% of 819 peak)")
    del x
except Exception as e:
    print("FAILED:", e)

# ------------------------------------------------------- 2. production einsum
NE = 131072
try:
    section(f"production einsum (ne={NE}, 472 MB blocks)")
    esm4 = jnp.ones((NE, 10, 3, 30), jnp.float32) * 1e-6
    ue = jnp.ones((NE, 30), jnp.float32)

    def estep(ue):
        qe = jnp.einsum("eabj,ej->eab", esm4, ue)
        return ue * 0.999999 + 1e-9 * qe.reshape(NE, 30)

    t = timeit_chain(estep, ue, 32, lambda u: u[0, 0])
    print(f"einsum: {t*1e3:.2f} ms -> {esm4.nbytes/t/1e9:.0f} GB/s (esm read)")
    del esm4, ue
except Exception as e:
    print("FAILED:", e)

# ----------------------------------------------- 3. Pallas SoA matvec tile 1024
try:
    section("pallas SoA block matvec, TILE=1024")
    TILE = 1024
    esm_t = jnp.ones((30, 30, NE), jnp.float32) * 1e-6

    def _kern(esm_ref, ue_ref, out_ref):
        uev = ue_ref[:]
        acc = jnp.zeros_like(out_ref)
        for j in range(30):
            acc = acc + esm_ref[:, j, :] * uev[j, :][None, :]
        out_ref[:] = acc

    def soa_matvec(ue_t):
        return pl.pallas_call(
            _kern,
            grid=(NE // TILE,),
            in_specs=[
                pl.BlockSpec((30, 30, TILE), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((30, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((30, TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((30, NE), jnp.float32),
        )(esm_t, ue_t)

    def pstep(ue_t):
        q = soa_matvec(ue_t)
        return ue_t * 0.999999 + 1e-9 * q

    ue_t = jnp.ones((30, NE), jnp.float32)
    t = timeit_chain(pstep, ue_t, 32, lambda u: u[0, 0])
    print(f"pallas soa: {t*1e3:.2f} ms -> {esm_t.nbytes/t/1e9:.0f} GB/s")
    del esm_t, ue_t
except Exception as e:
    print("FAILED:", e)

# ------------------------------------------- 4. manual K-outstanding DMA reads
CHUNK = 2048  # rows; chunk bytes = 2048*128*4 = 1 MiB
NCHUNK = ROWS // CHUNK


def make_bw_kernel(k_bufs: int):
    def kern(hbm_ref, out_ref):
        def body(scratch, sems):
            def dma(i):
                slot = jax.lax.rem(i, k_bufs)
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(i * CHUNK, CHUNK), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            for w in range(k_bufs):
                dma(jnp.int32(w)).start()

            def lb(i, acc):
                dma(i).wait()
                acc = acc + scratch[jax.lax.rem(i, k_bufs), 0, 0]

                @pl.when(i + k_bufs < NCHUNK)
                def _():
                    dma(i + k_bufs).start()

                return acc

            acc = jax.lax.fori_loop(0, NCHUNK, lb, jnp.float32(0.0))
            out_ref[:] = jnp.full((8, 128), acc, jnp.float32)

        pl.run_scoped(
            body,
            pltpu.VMEM((k_bufs, CHUNK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((k_bufs,)),
        )

    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    return run


for K in (1, 4, 8):
    try:
        section(f"pallas manual DMA read, {K} outstanding (2 GiB, 1 MiB chunks)")
        x = jnp.ones((ROWS, 128), jnp.float32)
        runk = make_bw_kernel(K)

        def dstep(state):
            x, acc = state
            o = runk(x)
            # chain: next pass's input depends on this pass's kernel output
            return x * 1.0 + 1e-30 * o[0, 0], acc + o[0, 0]

        @jax.jit
        def drun(x):
            (x, acc) = jax.lax.fori_loop(
                0, 8, lambda i, s: dstep(s), (x, jnp.float32(0.0))
            )
            return acc, x

        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            acc, x = drun(x)
            float(acc)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts[1:])) / 8
        print(f"K={K}: {t*1e3:.2f} ms/pass -> read {x.nbytes/t/1e9:.0f} GB/s "
              f"({x.nbytes/t/1e9/V5E_PEAK_GBS*100:.0f}% of peak)")
        del x
    except Exception as e:
        print("FAILED:", e)

# ------------------------------------------------------------- 5. gather costs
NN = 166000
NIDX = 1_180_000
try:
    section("gather: per-index cost vs row width")
    rng = np.random.default_rng(0)
    # locality-friendly indices: sorted-ish like Morton element access
    base = np.repeat(np.arange(NIDX // 8) * (NN * 8 // NIDX), 8)
    jit_idx = (base + rng.integers(0, 32, NIDX)).clip(0, NN - 1).astype(np.int32)
    idx = jnp.asarray(jit_idx)

    for width in (3, 12):
        u = jnp.ones((NN, width), jnp.float32)

        def gstep(u):
            g = u[idx]
            return u * 0.999999 + 1e-9 * g[0, 0]

        t = timeit_chain(gstep, u, 32, lambda u: u[0, 0])
        print(f"width {width*4:3d}B x {NIDX} rows: {t*1e3:.2f} ms "
              f"({t/NIDX*1e9:.2f} ns/idx, payload {NIDX*width*4/1e6:.0f} MB "
              f"-> {NIDX*width*4/t/1e9:.0f} GB/s)")
        del u
except Exception as e:
    print("FAILED:", e)

try:
    section("batched small-domain gather (take_along_axis)")
    NEL = 118000
    buf = jnp.ones((NEL, 24, 3), jnp.float32)
    lidx = jnp.asarray(np.random.default_rng(1).integers(0, 24, (NEL, 10, 1), dtype=np.int32))

    def tstep(buf):
        out = jnp.take_along_axis(buf, lidx, axis=1)
        return buf * 0.999999 + 1e-9 * out[0, 0, 0]

    t = timeit_chain(tstep, buf, 32, lambda b: b[0, 0, 0])
    print(f"take_along_axis (118k, 24->10, 3): {t*1e3:.2f} ms "
          f"({t/(NEL*10)*1e9:.2f} ns/row)")
except Exception as e:
    print("FAILED:", e)

print("done", flush=True)
