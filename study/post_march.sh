#!/bin/bash
# Post-march measurement batch (round 4, host-glue fusion follow-ups).
#
# Waits for the running Ra=1e8 march (pid in /tmp/ra1e8.pid) to exit, then:
#   1. krylov_econ --direct  — direct p16 JNK wall/attribution with the
#      fused host-FGMRES + fused refinement passes (vs 28-34 s baseline,
#      ~16 s of it host glue); also absorbs the new programs' XLA compiles
#      into the persistent cache before the march resume needs them.
#   2. bench.py              — the driver metric, post-change sanity.
#   3. resume the Ra=1e8 march with a long graceful budget.
#
# Bounded with outer timeouts only as backstops (CLAUDE.md lesson 17).
set -x
cd "$(dirname "$0")/.."

if [ -f /tmp/ra1e8.pid ]; then
  while kill -0 "$(cat /tmp/ra1e8.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 60  # let the tunnel settle after the previous process exits

PYTHONUNBUFFERED=1 timeout 4800 python study/krylov_econ.py --direct \
  > study/hw_logs/econ_fused.log 2>&1
PYTHONUNBUFFERED=1 timeout 2400 python bench.py \
  > study/hw_logs/bench_r4b.log 2>&1

nohup timeout 26000 python study/boussinesq_run.py \
  -P 16 -Ne 64 -Ra 1e8 -mode PTC -velo_inner 5 \
  -ckpt True -resume True -budget 24000 \
  > study/hw_logs/ra1e8_s3.log 2>&1 &
echo $! > /tmp/ra1e8.pid
