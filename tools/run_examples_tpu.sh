#!/bin/bash
# Run every example end-to-end on the real TPU, recording wall times.
# (matmul-NTT TPU default keeps cold compiles tunnel-survivable;
# the persistent XLA cache makes re-runs fast.)
out=${1:-/tmp/examples_tpu.log}
: > "$out"
cd /root/repo
for ex in examples/*.py; do
  name=$(basename "$ex" .py)
  echo "=== $name start $(date +%H:%M:%S)" >> "$out"
  start=$(date +%s.%N)
  if timeout 2400 python "$ex" >> "$out" 2>&1; then
    status=ok
  else
    status="FAIL($?)"
  fi
  end=$(date +%s.%N)
  echo "=== $name $status $(echo "$end $start" | awk '{printf "%.1f", $1-$2}')s" >> "$out"
done
echo "ALL DONE" >> "$out"
