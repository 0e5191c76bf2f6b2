"""Attack the >0.5M-node reduce-gather cliff with Morton-tile windows.

Round-3 measured the 1.98M-dof CG iteration's reduce at 9.6 ns/index vs
7 at 499k dof (and the forward gather at 5.6 vs 2.5), and attributed it
to HBM locality over the grown tables (docs/PERFORMANCE.md capacity
section).  Round-4 verdict asks for one more structured attempt before
calling it a floor: node-range-blocked ScatterPlan windows — bucket the
reduce within Morton tiles whose gather SOURCE window is sized back to
the fast-locality regime — or prove the per-index cost is a
row-activation floor no layout can cross.

Part A — locality microprobe (decides whether windowing can work at all):
gathers of EQUAL index count from the same value stream, varying only the
address range the indices touch:

  a1. the real reduce indices of the shipped plan (baseline pattern)
  a2. uniform random over the full stream (worst locality)
  a3. uniform random confined to a 0.5M-row window (fast-regime range)
  a4. the real indices folded mod 0.5M rows (real pattern density, small
      range)

If a3/a4 run at the 499k-dof fast rate while a1/a2 pay the cliff, the
cost is ADDRESS-RANGE-bound and Part B has headroom.  If all four price
out equally, the cliff is index-count/issue-bound and no tiling helps —
the floor section writes itself.

Part B — tile-windowed ScatterPlan: nodes processed in Morton tiles of
``T`` nodes; each tile's incident rows are gathered from ONE
``dynamic_slice`` window of ``W`` stream rows (indices window-relative,
so every gather source is W rows), out-of-window stragglers (octant
boundary straddlers) handled by a sparse residual pass.  A/B against the
shipped flat plan on the real nx=43 connectivity.

Chained fori_loop + host fetch throughout (tools/bw_probe.py discipline).
Run on the real TPU: FCVM_BENCH_NX=43 python tools/window_probe.py
CPU correctness check: FCVM_WINDOW_SELFTEST=1 (tiny mesh, exact match).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("FCVM_WINDOW_SELFTEST"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from fcvm_tpu.config import enable_compilation_cache

enable_compilation_cache()

import bench  # bench mesh builder
from fcvm_tpu.ops import assembly as asm_ops
from fcvm_tpu.runtime import system as sysm
from fcvm_tpu.utils.indexing import pad_ndof, pad_vector


def log(*a):
    print(*a, flush=True)


def timeit_chain(step, state, iters, fetch, reps=4, consts=()):
    @jax.jit
    def run(state, *consts):
        state = jax.lax.fori_loop(0, iters, lambda i, s: step(s, *consts), state)
        return fetch(state), state

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        scalar, state = run(state, *consts)
        float(scalar)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[1:])) / iters


# ---------------------------------------------------------------------------
# Part B: tile-windowed plan (host build + jit apply)
# ---------------------------------------------------------------------------


class TileWindowedPlan:
    """Morton-tile windowed reduce plan (see module docstring)."""

    def __init__(self, w0, incs, invperm, tile_nodes, window_rows, nn,
                 res_pos, res_nodes, node_counts):
        self.w0 = w0                # (ntiles,) int32 window starts
        self.incs = incs            # per bucket: (ntiles, nb, Db) int32
        self.invperm = invperm      # (ntiles, T) int32
        self.tile_nodes = tile_nodes
        self.window_rows = window_rows
        self.nn = nn
        self.res_pos = res_pos      # (m,) int32 stream positions
        self.res_nodes = res_nodes  # (m,) int32 node ids
        self.node_counts = node_counts  # static per-bucket padded lengths


def build_tile_windowed_plan(elnodes, nn, tile_nodes=65536, window_rows=None,
                             quantile=0.001):
    """Host-side build: per-tile degree buckets with window-relative indices.

    Bucket caps and per-bucket node counts are UNIFIED across tiles (same
    static program per tile, build_sharded_scatter_plans-style); rows
    outside a tile's [w0, w0 + W) window go to the sparse residual pass.
    """
    eln = np.asarray(elnodes)
    flat = eln.reshape(-1)
    nrows = flat.size
    cnt = np.bincount(flat, minlength=nn)
    srt = np.argsort(flat, kind="stable")
    ofs = np.zeros(nn + 1, np.int64)
    np.cumsum(cnt, out=ofs[1:])

    T = tile_nodes
    ntiles = -(-nn // T)

    # window starts: the quantile of each tile's incident positions, so a
    # few low stragglers don't drag w0 (they go residual instead)
    w0 = np.zeros(ntiles, np.int64)
    spans = []
    for t in range(ntiles):
        lo_n, hi_n = t * T, min((t + 1) * T, nn)
        pos = srt[ofs[lo_n]:ofs[hi_n]]
        if pos.size == 0:
            w0[t] = 0
            continue
        w0[t] = np.quantile(pos, quantile, method="lower")
        spans.append(np.quantile(pos, 1.0 - quantile, method="higher") - w0[t])
    if window_rows is None:
        window_rows = int(max(spans)) + 1 if spans else 1
    W = int(window_rows)
    w0 = np.minimum(w0, max(nrows - W, 0))

    dmax = max(int(cnt.max()), 1)
    caps, c = [], 4
    while c < dmax:
        caps.append(c)
        c = c * 3 // 2 if c >= 8 else c + 2
    caps.append(dmax)

    # per tile, per cap: window-relative inc rows (invalid/overflow -> W)
    per_tile_groups = []  # [tile][cap] -> (node_ids, inc_rows)
    res_pos, res_nodes = [], []
    for t in range(ntiles):
        lo_n, hi_n = t * T, min((t + 1) * T, nn)
        tile_nodes_ids = np.arange(lo_n, hi_n)
        tcnt = cnt[lo_n:hi_n]
        lo_c, groups = 0, []
        for cap in caps:
            sel = np.where((tcnt > lo_c) & (tcnt <= cap))[0]
            lo_c = cap
            rows = np.full((len(sel), cap), W, np.int64)
            for j, nloc in enumerate(sel):
                n = lo_n + nloc
                pos = srt[ofs[n]:ofs[n + 1]]
                rel = pos - w0[t]
                ok = (rel >= 0) & (rel < W)
                good = rel[ok]
                rows[j, : good.size] = good
                bad = pos[~ok]
                if bad.size:
                    res_pos.append(bad)
                    res_nodes.append(np.full(bad.size, n))
            groups.append((sel, rows))
        per_tile_groups.append(groups)

    # unify per-bucket counts across tiles (pad with all-W rows that sum
    # the zeroed window row; their invperm slots point at the zero tail)
    nbuckets = len(caps)
    maxn = [max(len(per_tile_groups[t][b][0]) for t in range(ntiles))
            for b in range(nbuckets)]
    keep = [b for b in range(nbuckets) if maxn[b] > 0]
    incs, invperms = [], np.zeros((ntiles, T), np.int64)
    for b in keep:
        cap = caps[b]
        arr = np.full((ntiles, maxn[b], cap), W, np.int64)
        for t in range(ntiles):
            sel, rows = per_tile_groups[t][b]
            arr[t, : len(sel)] = rows
        incs.append(jnp.asarray(arr.astype(np.int32)))
    # invperm: concat(bucket outputs, zero tail)[invperm] == tile node order
    for t in range(ntiles):
        order = []
        for b in keep:
            sel, _ = per_tile_groups[t][b]
            order.append(t * T + np.asarray(sel))  # global slot unused; local below
        # positions in the concatenated per-tile output
        out_pos = {}
        base = 0
        for b, nb in zip(keep, (maxn[b] for b in keep)):
            sel, _ = per_tile_groups[t][b]
            for j, nloc in enumerate(sel):
                out_pos[int(nloc)] = base + j
            base += nb
        zero_slot = base  # first zero-tail slot
        inv = np.full(T, zero_slot, np.int64)
        for nloc, p in out_pos.items():
            inv[nloc] = p
        invperms[t] = inv
    if res_pos:
        res_pos = np.concatenate(res_pos)
        res_nodes = np.concatenate(res_nodes)
    else:
        res_pos = np.zeros(0, np.int64)
        res_nodes = np.zeros(0, np.int64)
    log(f"tile-windowed plan: ntiles={ntiles} T={T} W={W} "
        f"({W * 12 / 1e6:.1f} MB window) buckets="
        + ",".join(f"{maxn[b]}x{caps[b]}" for b in keep)
        + f" residual={res_pos.size} ({res_pos.size / max(nrows,1) * 100:.3f}%)")
    return TileWindowedPlan(
        jnp.asarray(w0.astype(np.int32)), tuple(incs),
        jnp.asarray(invperms.astype(np.int32)), T, W, nn,
        jnp.asarray(res_pos.astype(np.int32)),
        jnp.asarray(res_nodes.astype(np.int32)),
        tuple(maxn[b] for b in keep),
    )


def windowed_scatter_node_rows(rows3, plan: TileWindowedPlan):
    """Apply: lax.map over tiles (dynamic_slice window -> bucket gathers ->
    invperm), then the sparse residual pass."""
    W, T = plan.window_rows, plan.tile_nodes
    rest = rows3.shape[1:]
    stream_ext = jnp.concatenate(
        [rows3, jnp.zeros((1,) + rest, rows3.dtype)]
    )
    ntiles = plan.w0.shape[0]

    def tile(args):
        w0 = args[0]
        incs_t = args[1]
        invp_t = args[2]
        win = jax.lax.dynamic_slice(
            stream_ext, (w0,) + (0,) * len(rest), (W + 1,) + rest
        )
        win = win.at[W].set(jnp.zeros(rest, rows3.dtype))
        outs = [win[inc].sum(axis=1) for inc in incs_t]
        # one zero row at slot sum(node_counts): empty invperm slots
        outs.append(jnp.zeros((1,) + rest, rows3.dtype))
        return jnp.concatenate(outs)[invp_t]

    per_tile = jax.lax.map(tile, (plan.w0, tuple(plan.incs), plan.invperm))
    out = per_tile.reshape((ntiles * T,) + rest)[: plan.nn]
    if plan.res_pos.shape[0]:
        out = out.at[plan.res_nodes].add(stream_ext[plan.res_pos])
    return out


def selftest():
    from fcvm_tpu.models import meshgen

    mesh = meshgen.box_tet10(6, 6, 6, 10.0, 10.0, 10.0)
    nd_pad = pad_ndof(mesh.ndof)
    nn = nd_pad // 3
    fix = jnp.zeros(nd_pad, jnp.float32)
    space = sysm.build_solve_space(mesh.coords, mesh.elnodes, fix, nd_pad)
    eln_m = np.asarray(space.elnodes_m)
    rng = np.random.default_rng(0)
    rows = jnp.asarray(
        rng.normal(size=(eln_m.size, 3)).astype(np.float32)
    )
    ref = asm_ops.scatter_node_rows(rows, space.plan_m)
    for T, W in ((512, None), (256, 2000), (1024, None)):
        plan = build_tile_windowed_plan(eln_m, nn, tile_nodes=T,
                                        window_rows=W)
        got = windowed_scatter_node_rows(rows, plan)
        err = float(jnp.max(jnp.abs(got - ref)))
        log(f"selftest T={T} W={plan.window_rows}: max |diff| = {err:.2e}")
        assert err < 1e-4, "windowed reduce mismatch"
    log("selftest OK")


def main():
    if os.environ.get("FCVM_WINDOW_SELFTEST"):
        selftest()
        return

    nx = int(os.environ.get("FCVM_BENCH_NX", "43"))
    dtype = jnp.float32
    mesh, model = bench.build(nx)
    fixmask_np, _, _ = model.bcs.masks(mesh.ndof)
    nd_pad = pad_ndof(mesh.ndof)
    fixmask = jnp.asarray(pad_vector(fixmask_np, nd_pad), dtype)
    space = sysm.build_solve_space(mesh.coords, mesh.elnodes, fixmask, nd_pad)
    plan = space.plan_m
    eln_m = np.asarray(space.elnodes_m)
    ne, nn = eln_m.shape[0], nd_pad // 3
    nrows = ne * 10
    log(f"nx={nx} ne={ne} nn={nn} nrows={nrows}")

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(nrows, 3)).astype(np.float32))

    iters = 30

    # ---- Part A: locality microprobe --------------------------------------
    real_idx = np.concatenate(
        [np.asarray(i).reshape(-1) for i in plan.inc]
    ).astype(np.int64)
    real_idx = np.minimum(real_idx, nrows - 1)  # drop the pad sentinel
    n_idx = real_idx.size
    small = 5_000_000 // 10  # 0.5M-row window
    variants = {
        "a1 real reduce indices": real_idx,
        "a2 uniform full range": rng.integers(0, nrows, n_idx),
        "a3 uniform 0.5M window": rng.integers(0, min(small, nrows), n_idx),
        "a4 real indices mod 0.5M": real_idx % min(small, nrows),
    }
    for name, idx in variants.items():
        idx_dev = jnp.asarray(idx.astype(np.int32))

        def step(s, rows_c, idx_c):
            return s + rows_c[idx_c].sum() * 1e-30

        t = timeit_chain(step, jnp.zeros((), jnp.float32), iters,
                         lambda s: s, consts=(rows, idx_dev))
        log(f"{name}: {t * 1e3:.2f} ms ({t / n_idx * 1e9:.2f} ns/idx, "
            f"{n_idx} idx)")

    # ---- Part B: tile-windowed plan vs shipped ----------------------------
    def step_ship(s, rows_c):
        return s + asm_ops.scatter_node_rows(rows_c * (1.0 + s * 1e-30), plan).sum() * 1e-30

    t_ship = timeit_chain(step_ship, jnp.zeros((), jnp.float32), iters,
                          lambda s: s, consts=(rows,))
    log(f"shipped ScatterPlan reduce: {t_ship * 1e3:.2f} ms")

    for T, q in ((65536, 0.001), (131072, 0.001), (32768, 0.002)):
        wplan = build_tile_windowed_plan(eln_m, nn, tile_nodes=T, quantile=q)

        def step_win(s, rows_c):
            return s + windowed_scatter_node_rows(
                rows_c * (1.0 + s * 1e-30), wplan
            ).sum() * 1e-30

        t_win = timeit_chain(step_win, jnp.zeros((), jnp.float32), iters,
                             lambda s: s, consts=(rows,))
        log(f"tile-windowed T={T} W={wplan.window_rows}: {t_win * 1e3:.2f} ms "
            f"({t_win / t_ship * 100:.0f}% of shipped)")


if __name__ == "__main__":
    main()
