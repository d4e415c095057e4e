#!/bin/bash
# Chained r5 re-measurement pass (run on a quiet rig; every stage appends
# to experiments/r5_remeasure.log). Order: on-TPU kernel parity FIRST
# (numbers from a broken kernel are worthless — now includes the r5
# merged-head batched attention, s_live buckets, and the W4A8 kernels),
# then the driver's full scorecard (13 metrics incl. the spec price
# sheet, learned-weights acceptance, config #5, and the real-GGUF hook),
# then the r5-specific records: the B>=32 bisect that motivated the
# attention work, the attention-kernel variant shootout, the bucketed
# B-curve, and speculative acceptance on learned weights.
set -u
cd /root/repo
LOG=experiments/r5_remeasure.log
stamp() { echo "# ===== [$(date +%H:%M:%S)] $1 =====" | tee -a "$LOG"; }

stamp "on-TPU Mosaic kernel parity (merged-head batched attention, s_live buckets, W4A8, K-quant, appends)"
if ! NT_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py -q >>"$LOG" 2>&1; then
  stamp "KERNEL PARITY FAILED - aborting the bench chain"
  exit 1
fi

stamp "full scorecard (the driver's bench.py, warm-cache run)"
timeout 5400 python bench.py >>"$LOG" 2>&1

stamp "B=64 production bisect (matmul/attention/append/head decomposition)"
timeout 3600 python experiments/b64_bisect.py 64 512 >>"$LOG" 2>&1

stamp "B=64 with the serving s_live bucket (640 covers pos 512..600)"
NT_BISECT_MODES=prod NT_BISECT_SLIVE=640 timeout 1800 python experiments/b64_bisect.py 64 512 >>"$LOG" 2>&1

stamp "attention kernel variant shootout (f32/bf16/int8 dots, block targets)"
timeout 1800 python experiments/attn_variants.py 64 512 >>"$LOG" 2>&1

stamp "batched scaling curve (B=1..64, bf16/int8 KV, serving s_live buckets)"
timeout 3600 python experiments/batched_scaling.py >>"$LOG" 2>&1

stamp "speculative acceptance on learned weights (engine + serving + sampled)"
timeout 3600 python experiments/spec_repolm.py >>"$LOG" 2>&1

stamp "done"
