#!/bin/bash
# Round-5 march-gap measurements: run when the Ra=1e8 march budget-exits
# (~23:28), BEFORE resuming it — uncontended records on the quiet chip.
# All programs were cache-warmed concurrently with the march beforehand
# (north_warm.log / applyvar_warm.log), so these pay loads, not compiles.
cd "$(dirname "$0")/.."
set -x
date

# 1. clean TTFS (instrumented: per-level build-wait/solve + prefetch stats)
PYTHONUNBUFFERED=1 timeout 2400 python study/north_star.py --ttfs --short \
    > study/hw_logs/north_r5c.log 2>&1
echo "north rc=$?"

# 2. TTFS of the DIRECT p16 solve (one program set, no coarse level)
PYTHONUNBUFFERED=1 timeout 2400 python study/north_star.py --ttfs --direct \
    > study/hw_logs/north_r5d.log 2>&1
echo "north-direct rc=$?"

# 3. apply-variant head-to-head (dense / pallas / einsum; simple + coupled)
PYTHONUNBUFFERED=1 timeout 2400 python study/apply_variants.py \
    > study/hw_logs/applyvar_r5.log 2>&1
echo "applyvar rc=$?"

# 4. resume the Ra=1e8 march (budget exits between iterations; outer
#    timeout is a backstop only — lesson 17)
date
nohup timeout 17100 python study/boussinesq_run.py -P 16 -Ne 64 -Ra 1e8 \
    -mode PTC -velo_inner 5 -ckpt True -resume True \
    -init "Boussinesq_study/BoussinesqPTC_1.0e+03~1.0e+07~0.71_16~64_1e-10_1e-13~20_1e-13.ckpt.npz" \
    -budget 14400 -ptc_dtmax 0.7 \
    >> study/hw_logs/ra1e8.log 2>&1 &
echo "march resumed pid $!"
