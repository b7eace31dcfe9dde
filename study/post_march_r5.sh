#!/bin/bash
# Round-5 TPU measurement batch — run AFTER the Ra=1e7 p16 resume finishes.
#
#   bash study/post_march_r5.sh [step ...]   # default order below
#
# Steps (each bounded; logs to study/hw_logs/):
#   finish1e7  if the Ra=1e7 march exited on budget (not converged), resume
#              it once more with a 3 h budget
#   econ       krylov_econ --direct — direct p16 JNK with the FUSED
#              preconditioner application (VERDICT r4 #4 target: <= 8 s
#              cached, <= 15 ms/it end-to-end; was 10.3 s / 23 ms/it);
#              also absorbs the new pc_apply compile into the jit cache
#   roofline   study/roofline.py — headline-apply roofline attribution
#              (VERDICT r4 #6)
#   north2     north_star --short --ttfs TWICE: first process records the
#              prefetch manifest (and pays one-time compiles), the second
#              measures prefetch-warm TTFS (VERDICT r4 #2; was 560 s)
#   bench      bench.py — driver metric sanity after the round-5 changes
#   adjoint    study/adjoint_hi.py at the converged Ra=1e7 p16 checkpoint
#              (VERDICT r4 #5) — bounded: capped inner/outer iterations,
#              best-effort exit reports cost either way
#   ra1e8      Ra=1e8 p16 PTC march seeded from the Ra=1e7 checkpoint
#              (-init manual continuation), graceful -budget, ckpt on
set -u
cd "$(dirname "$0")/.."
mkdir -p study/hw_logs
CKPT7='Boussinesq_study/BoussinesqPTC_1.0e+03~1.0e+07~0.71_16~64_1e-10_1e-13~20_1e-13.ckpt.npz'
LOG7='Boussinesq_study/BoussinesqPTC_1.0e+03~1.0e+07~0.71_16~64_1e-10_1e-13~20_1e-13.log'

steps=("$@")
[ ${#steps[@]} -eq 0 ] && steps=(finish1e7 econ roofline north2 bench adjoint ra1e8)

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  PYTHONUNBUFFERED=1 timeout "$tmo" "$@" > "study/hw_logs/$name.log" 2>&1
  echo "=== $name rc=$? (tail) ==="
  tail -n 8 "study/hw_logs/$name.log"
}

for s in "${steps[@]}"; do
  case "$s" in
    finish1e7)
      # the study run writes the full-field .npz only on a CONVERGED run
      # (budget exhaustion raises before the save)
      if [ -f "${CKPT7%.ckpt.npz}.npz" ]; then
        echo "Ra=1e7 already converged"; else
        run finish1e7 12600 python study/boussinesq_run.py -P 16 -Ne 64 \
          -Ra 1e7 -mode PTC -velo_inner 5 -ckpt True -resume True \
          -log True -budget 10800
      fi ;;
    econ)     run econ_r5 4800 python study/krylov_econ.py --direct ;;
    roofline) run roofline 2400 python study/roofline.py ;;
    north2)   run north_a 4800 python study/north_star.py --short --ttfs
              run north_b 2400 python study/north_star.py --short --ttfs ;;
    bench)    run bench_r5 3000 python bench.py ;;
    adjoint)  run adjoint_p16 4800 python study/adjoint_hi.py -ckpt "$CKPT7" \
                -maxiter 400 -inner_maxiter 150 ;;
    ra1e8)
      nohup timeout 25000 python study/boussinesq_run.py \
        -P 16 -Ne 64 -Ra 1e8 -mode PTC -velo_inner 5 \
        -ckpt True -resume True -init "$CKPT7" -budget 23400 \
        > study/hw_logs/ra1e8.log 2>&1 &
      echo $! > /tmp/ra1e8.pid
      echo "Ra=1e8 march launched (pid $(cat /tmp/ra1e8.pid))" ;;
    *) echo "unknown step: $s" ;;
  esac
done
