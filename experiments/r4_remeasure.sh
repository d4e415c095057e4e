#!/bin/bash
# Chained r4 re-measurement pass (run on a quiet rig; every stage appends
# to experiments/r4_remeasure.log). Order: on-TPU kernel parity FIRST
# (numbers from a broken kernel are worthless), then the scorecard the
# driver will capture, then the r4-specific measurements (spec pricing,
# config #5 combined, K-quant variant shootout for the record).
set -u
cd /root/repo
LOG=experiments/r4_remeasure.log
stamp() { echo "# ===== [$(date +%H:%M:%S)] $1 =====" | tee -a "$LOG"; }

stamp "on-TPU Mosaic kernel parity (incl. r4 group-dot K-quant tiles, S-minor scale append, device unpacker)"
if ! NT_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py -q >>"$LOG" 2>&1; then
  stamp "KERNEL PARITY FAILED - aborting the bench chain"
  exit 1
fi

stamp "full scorecard (the driver's bench.py, warm-cache run)"
timeout 3600 python bench.py >>"$LOG" 2>&1

stamp "speculative serving price sheet (draft/verify dispatch costs)"
timeout 3600 python experiments/spec_serve_probe.py 3 >>"$LOG" 2>&1

stamp "BASELINE config #5 combined: tiered + skip 0.98 + self-spec k=3"
timeout 3600 python experiments/config5_combined.py 24 >>"$LOG" 2>&1

stamp "batched scaling curve (B=1..64, bf16/int8 KV)"
timeout 3600 python experiments/batched_scaling.py >>"$LOG" 2>&1

stamp "K-quant variant shootout (for the record: v7 group-dot vs v0-v5)"
timeout 3600 python experiments/kquant_variants.py all >>"$LOG" 2>&1

stamp "done"
