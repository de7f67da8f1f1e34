#!/bin/bash
# Round-3 measurement queue, rev B (dense_fused REGRESSED: 26.9 vs 31.8
# img/s, so the decoder stays on the XLA dense path).  Serial; NEVER probe
# the chip manually while this runs.
#   1. base  — shipped default under the packed-vjp encoder refactor
#   2. rbg   — rbg dropout PRNG on top
#   3. bs32  — batch 32 + rbg (amortization probe); remat fallback on OOM
#   4. clamp — gather-vs-pallas semantics A/B (VERDICT round-1 item 4)
#   5. trace — profile_step breakdown of the winning config
set -u
cd /root/repo
S=/tmp/sprint3_summary.txt

probe() {
  timeout 120 python -c \
    "import jax, jax.numpy as jnp; print(float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))" \
    >/dev/null 2>&1
}

run_step() {  # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  if ! probe; then
    sleep 60
    if ! probe; then
      echo "$name: SKIPPED (chip down before start)" >> "$S"
      return 1
    fi
  fi
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" env "$@" > "/tmp/sprint3_$name.log" 2>&1
  local rc=$?
  grep -h '"metric"' "/tmp/sprint3_$name.log" | tail -1 | sed "s/^/$name [rc=$rc]: /" >> "$S"
  if ! grep -q '"metric"' "/tmp/sprint3_$name.log"; then
    tail -1 "/tmp/sprint3_$name.log" | sed "s/^/$name [rc=$rc]: /" >> "$S"
  fi
  sleep 10
  return $rc
}

# explicit BENCH_RNG on both steps: bench.py's default is now 'rbg', so a
# bare run would make base and rbg measure the identical configuration
run_step base 1800 BENCH_RNG=threefry python bench.py
run_step rbg  1800 BENCH_RNG=rbg python bench.py
if ! run_step bs32 1800 BENCH_BS=32 BENCH_RNG=rbg python bench.py; then
  run_step bs32r 2400 BENCH_BS=32 BENCH_REMAT=1 BENCH_RNG=rbg python bench.py
fi

echo "=== clamp validation ($(date +%H:%M:%S)) ==="
timeout 5400 python tools/validate_clamp.py > /tmp/sprint3_clamp.log 2>&1
echo "validate_clamp rc=$?" >> "$S"
tail -5 /tmp/sprint3_clamp.log

run_step trace 2400 BENCH_RNG=rbg python tools/profile_step.py --steps 3

echo "=== sprint3 done ==="
cat "$S"
