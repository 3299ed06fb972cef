#!/bin/bash
# Round-5 follow-up TPU measurements: the verdict items the round-4 sweep
# file does not cover — trained-weight bench (BENCH duty: --weights), the
# synth-regression yardstick run that produces those weights, and the
# epoch WALL-rate A/B (per-step dispatch vs scan-chunked) that decides the
# wall/step-gap "done" bar (val-every-epoch wall >= 75% of step rate).
# Resumable: stages with a recorded rc=0 are skipped.
set -u
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
OUT=/tmp/sweep_r5
mkdir -p $OUT
cd /root/repo

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  if [ "$(cat "$OUT/$name.rc" 2>/dev/null)" = "0" ]; then
    echo "=== $name: done earlier (rc=0), skipping ==="
    return 0
  fi
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "$rc" >"$OUT/$name.rc"
  echo "rc=$rc -> $OUT/$name.log"; tail -3 "$OUT/$name.log"
}

# 1) synth regression yardstick (CLAUDE.md: yolo11n mAP50 0.99 in 30 epochs
#    @320) — doubles as the trained checkpoint for the --weights bench
run synth_train 3600 python tools/bench_epoch.py \
  --epochs 30 --imgsz 320 --batch 32 --train-n 2016 --val-n 300 \
  --val-period 5 --data-root /tmp/dyd_bench

# 2) trained-weights e2e bench (verdict r3 item 1: unmeasured path)
run bench_weights 2400 python bench.py \
  --weights /tmp/dyd_bench/runs/epoch_drive/weights/best

# 3) epoch wall-rate A/B @640 (verdict r3 weak 3 done-bar)
run epoch_spd1 3600 python tools/bench_epoch.py \
  --epochs 5 --imgsz 640 --batch 32 --steps-per-dispatch 1 \
  --data-root /tmp/dyd_bench
run epoch_auto 3600 python tools/bench_epoch.py \
  --epochs 5 --imgsz 640 --batch 32 --steps-per-dispatch 0 \
  --data-root /tmp/dyd_bench

# 4) fresh per-op rooflines to steer the round-5 perf work: the serving
#    batch infer program (headline metric) and the current train step
run mfu_infer 2400 python tools/profile_mfu.py \
  --variant infer --batch 128 --csv "$OUT/mfu_infer_b128.csv"
run mfu_train 2400 python tools/profile_mfu.py \
  --variant train --batch 32 --csv "$OUT/mfu_train_b32.csv"

# 5) rerun the int8 probe with the in-jit token chain (the first version
#    paid an eager tunnel op per iteration and read 4.9 TOP/s for bf16)
run probe_int8_v2 1200 python tools/probe_int8.py
echo "=== sweep2 done ($(date +%H:%M:%S)); logs in $OUT ==="
