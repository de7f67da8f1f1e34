#!/bin/bash
# Round-2 follow-up sprint: the A/Bs the first sprint lost to probe
# collisions (NEVER probe the chip manually while this runs).
# All candidates pre-flighted for TPU lowering via tests/test_tpu_lowering.py
# + a full-train-step jax.export preflight, so rc!=0 here means runtime
# (OOM/perf), not lowering.
set -u
cd /root/repo
S=/tmp/sprint2_summary.txt
: > "$S"

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
  timeout "$tmo" env "$@" > "/tmp/sprint2_$name.log" 2>&1
  local rc=$?
  grep -h '"metric"' "/tmp/sprint2_$name.log" | tail -1 | sed "s/^/$name [rc=$rc]: /" >> "$S"
  if ! grep -q '"metric"' "/tmp/sprint2_$name.log"; then
    tail -1 "/tmp/sprint2_$name.log" | sed "s/^/$name [rc=$rc]: /" >> "$S"
  fi
  sleep 10
  return $rc
}

# 1. fixed fused dense-hat decoder MSDA (the lowering bug is fixed)
run_step fused  1800 BENCH_DEC_MSDA=dense_fused python bench.py
# 2. rbg dropout PRNG on top
run_step rbgf   1800 BENCH_RNG=rbg BENCH_DEC_MSDA=dense_fused python bench.py
# 3. rbg alone (attribution, in case fused regresses)
run_step rbg    1800 BENCH_RNG=rbg python bench.py

echo "=== sprint2 done ==="
cat "$S"
