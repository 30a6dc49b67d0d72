#!/bin/bash
# Grad-parity sweep (VERDICT r4 #2): block-kernel vs pure-XLA full gradient
# tree on the real TPU at the placement-sensitivity batches from the bisect.
# One process per run (crash isolation); compares written to the log.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/gradpar}
mkdir -p "$OUT"
for b in 16 12 32; do
  for m in block none; do
    f="$OUT/${m}_${b}.npz"
    if [ ! -f "$f" ]; then
      echo "=== run $m batch=$b ==="
      python tools/probe_grad_parity_tpu.py run "$m" "$b" "$f" || \
        echo "RUN FAILED: $m $b rc=$?"
    fi
  done
  echo "=== compare batch=$b ==="
  python tools/probe_grad_parity_tpu.py compare \
    "$OUT/block_${b}.npz" "$OUT/none_${b}.npz" 5e-2 || true
done
echo "=== grad-parity sweep complete ==="
