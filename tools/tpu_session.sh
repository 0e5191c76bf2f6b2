#!/bin/bash
# One-shot TPU measurement session (run when the tunnel is healthy).
# Each stage is a separate process with a completion-sized timeout; the
# sequence aborts at the first wedge sign (a timed-out stage) so we never
# stack claims on a wedged device.  Logs land in /tmp/tpu_session/.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_session
mkdir -p "$OUT"

run_stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  tail -5 "$OUT/$name.err"
  if [ $rc -ne 0 ]; then
    echo "STAGE $name rc=$rc — aborting session (wedge protocol)"
    exit $rc
  fi
}

run_stage health 180 python - <<'EOF'
import jax, jax.numpy as jnp
x = jax.jit(lambda a: a @ a)(jnp.ones((256, 256)))
x.block_until_ready()
print("TPU OK", jax.devices())
EOF

# GNL tangent-predictor levers (warm start / load deflation) at 499k dof
PROBE=gnl run_stage gnl_refresh 2400 python tools/gnl_refresh_probe.py

# bf16 storage of the dense coarse inverse (expected net loss; record it)
run_stage coarse_bf16 1800 python tools/coarse_bf16_probe.py

# headline bench (writes the JSON line to bench.json.out)
run_stage bench 3600 python bench.py

# block-CSR matvec vs element+ScatterPlan (round-3 lead; expected ~neutral)
run_stage blockcsr 1800 python tools/blockcsr_probe.py

echo "=== session complete; outputs in $OUT ==="
grep -h "" "$OUT"/bench.out 2>/dev/null
