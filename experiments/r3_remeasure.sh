#!/bin/bash
# Chained r3 re-measurement pass (run on a quiet rig; every stage appends
# to experiments/r3_remeasure.log). Order: decisive in-model runs first
# (headline per-dtype decode + switch A/Bs + serve replay + scaling), the
# isolated-kernel probe last — the r3 kernel fix changed every batched
# program's HLO, so everything recompiles; spend that budget on the
# numbers that decide.
set -u
cd /root/repo
LOG=experiments/r3_remeasure.log
stamp() { echo "# ===== [$(date +%H:%M:%S)] $1 =====" | tee -a "$LOG"; }

stamp "on-TPU Mosaic kernel parity (validates the r3 kernel fix on hardware first)"
if ! NT_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_tpu_kernels.py -q >>"$LOG" 2>&1; then
  stamp "KERNEL PARITY FAILED - aborting the bench chain (numbers from a broken kernel are worthless)"
  exit 1
fi

stamp "per-dtype single-stream decode (batched1 mode, B=1)"
for dt in q8_0 q4_k_m q6_k q4_0; do
  stamp "bench $dt"
  NT_BENCH_DTYPE=$dt timeout 2400 python bench.py >>"$LOG" 2>&1
done

stamp "A/B: NT_KV_APPEND=dus at B=1 (q8_0, q4_k_m)"
for dt in q8_0 q4_k_m; do
  stamp "bench $dt dus-append"
  NT_KV_APPEND=dus NT_BENCH_DTYPE=$dt timeout 2400 python bench.py >>"$LOG" 2>&1
done

stamp "A/B: NT_PAD_VOCAB=2048 (q4_k_m, q6_k)"
for dt in q4_k_m q6_k; do
  stamp "bench $dt padded-vocab"
  NT_PAD_VOCAB=2048 NT_BENCH_DTYPE=$dt timeout 2400 python bench.py >>"$LOG" 2>&1
done

stamp "A/B: both switches (q4_k_m, q6_k, q8_0)"
for dt in q4_k_m q6_k q8_0; do
  stamp "bench $dt dus+pad"
  NT_KV_APPEND=dus NT_PAD_VOCAB=2048 NT_BENCH_DTYPE=$dt \
    timeout 2400 python bench.py >>"$LOG" 2>&1
done

stamp "serve replay B=8 (warmup outside the clock)"
timeout 2400 python experiments/serve_replay.py 8 24 >>"$LOG" 2>&1

stamp "batched scaling incl. B=64 int8 (serving headline curve)"
timeout 3600 python experiments/batched_scaling.py >>"$LOG" 2>&1

stamp "lmhead+append probe"
timeout 3600 python experiments/lmhead_append_probe.py all >>"$LOG" 2>&1

stamp "done"
