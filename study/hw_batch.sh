#!/bin/bash
# Hardware-confirmation batch (VERDICT r3 #3/#5) — run when the accelerator
# tunnel is up.  Each step is bounded and logs to study/hw_logs/; safe to
# re-run (persistent compile + constants caches make warm passes fast).
#
#   bash study/hw_batch.sh [step ...]      # default: all steps in order
#
# Steps:
#   bench        bench.py (BENCH operator-apply + coupled-solve numbers)
#   oplat        op_latency.py (per-op matmul latency -> pc fusion decision)
#   pclat        pc_latency.py (p16 pc-chain decomposition + fusion candidate)
#   econ         krylov_econ --direct (eta=0.25 ms/it confirmation, p16)
#   north        north_star --short (ladder solve wall-clock)
#   ra1e7        PTC p16 64x64 Ra=1e7 with velo_inner=5 + checkpointing
set -u
cd "$(dirname "$0")/.."
mkdir -p study/hw_logs
steps=("$@")
[ ${#steps[@]} -eq 0 ] && steps=(bench econ north ra1e7)

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  PYTHONUNBUFFERED=1 timeout "$tmo" "$@" > "study/hw_logs/$name.log" 2>&1
  echo "=== $name rc=$? (tail) ==="
  tail -n 12 "study/hw_logs/$name.log"
}

for s in "${steps[@]}"; do
  case "$s" in
    bench)  run bench 3000 python bench.py ;;
    oplat)  run oplat 1200 python study/op_latency.py ;;
    pclat)  run pclat 2400 python study/pc_latency.py ;;
    econ)   run econ 3600 python study/krylov_econ.py --direct ;;
    north)  run north 3600 python study/north_star.py --short ;;
    ra1e7)  run ra1e7 28800 python study/boussinesq_run.py -P 16 -Ne 64 \
              -Ra 1e7 -mode PTC -velo_inner 5 -ckpt True -log True ;;
    *) echo "unknown step: $s" ;;
  esac
done
