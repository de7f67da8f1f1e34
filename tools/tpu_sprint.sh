#!/bin/bash
# TPU measurement sprint — run when the chip comes back after a wedge.
#
# Hygiene rules baked in (see memory: tpu-worker-wedge / measurement
# pitfalls): ONE job at a time, generous timeouts for first compiles
# (>= 900 s), never kill a client mid-compile, and do NOT retry a compile
# that crashed the worker.  Each step logs to /tmp/sprint_<name>.log and
# appends a one-line summary to /tmp/sprint_summary.txt.
set -u
cd /root/repo
S=/tmp/sprint_summary.txt
: > "$S"

probe() {
  timeout 120 python -c \
    "import jax, jax.numpy as jnp; print(float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))" \
    >/dev/null 2>&1
}

run_step() {  # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  if ! probe; then
    echo "$name: SKIPPED (chip down before start)" >> "$S"
    return 1
  fi
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" env "$@" > "/tmp/sprint_$name.log" 2>&1
  local rc=$?
  tail -1 "/tmp/sprint_$name.log" | sed "s/^/$name [rc=$rc]: /" >> "$S"
  # give the worker a breather between jobs
  sleep 10
  return $rc
}

# 1. baseline: shipped config (also refreshes the driver-comparable number)
run_step bench_base     1800 python bench.py
# 2. fused dense-hat decoder MSDA (candidate default)
run_step bench_fused    1800 BENCH_DEC_MSDA=dense_fused python bench.py
# 3. larger batch (flash-attn freed the big probs tensors; bs32 may now fit)
run_step bench_bs32     1800 BENCH_BS=32 python bench.py
run_step bench_bs32f    1800 BENCH_BS=32 BENCH_DEC_MSDA=dense_fused python bench.py
# 4. rbg dropout PRNG (threefry mask generation is VPU-heavy at [B,S,256])
run_step bench_rbg      1800 BENCH_RNG=rbg python bench.py
run_step bench_rbgf     1800 BENCH_RNG=rbg BENCH_DEC_MSDA=dense_fused python bench.py
# 5. fresh per-component profile at the best-known config
run_step profile        1800 python tools/profile_step.py --steps 3 --batch 16
# 6. windowed-clamp semantics validation (VERDICT item 4)
run_step clamp          2400 python tools/validate_clamp.py --steps 300 --batch 8

echo "=== sprint done ==="
cat "$S"
