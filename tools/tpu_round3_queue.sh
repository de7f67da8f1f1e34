#!/bin/bash
# Round-3 serial on-chip queue: the two VERDICT round-2 must-runs, strictly
# one device job at a time (NEVER probe the chip manually while this runs).
#   1. tpu_sprint2.sh — dense_fused / rbg / rbg+fused bench A/Bs
#   2. validate_clamp.py — gather-vs-pallas training-dynamics + decode A/B
set -u
cd /root/repo
bash tools/tpu_sprint2.sh
echo "=== clamp validation ($(date +%H:%M:%S)) ==="
timeout 5400 python tools/validate_clamp.py > /tmp/clamp_validation.log 2>&1
rc=$?
echo "validate_clamp rc=$rc" >> /tmp/sprint2_summary.txt
tail -25 /tmp/clamp_validation.log
echo "=== round3 queue done ($(date +%H:%M:%S)) ==="
