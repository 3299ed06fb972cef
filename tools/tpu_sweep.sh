#!/bin/bash
# Round-4 TPU measurement sweep (VERDICT r3 item 1) — run when the axon
# tunnel is up. Saves each log under /tmp/sweep_r4/. Every stage is
# individually time-bounded so a tunnel drop mid-sweep can't hang the run.
set -u
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
OUT=/tmp/sweep_r4
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

run bench_default   2400 python bench.py
run bench_int8      2400 python bench.py --int8
run bench_s         2400 python bench.py --scale s
run bench_x         2400 python bench.py --scale x
run bench_v8n       2400 python bench.py --model yolov8
run bench_v8s       2400 python bench.py --model yolov8 --scale s
run bench_v12n      2400 python bench.py --model yolo12
run bench_v12s      2400 python bench.py --model yolo12 --scale s
run probe_int8      1200 python tools/probe_int8.py
run probe_autobatch 1800 python tools/probe_autobatch.py --scales n,s,x
run train_base      1800 python tools/bench_train.py --only full_step
run train_bnbf16    1800 python tools/bench_train.py --only full_step --bn-bf16-stats
run train_folddiv   1800 python tools/bench_train.py --only full_step --fold-div
run train_donate    2400 python tools/bench_train.py --only full_step --donate
run train_spd       1800 python tools/bench_train.py --only full_step --spd
run aug_warp        1800 python tools/bench_augment.py
run serve_n         1800 python tools/bench_serve.py --seconds 20
run serve_n_openloop 1800 python tools/bench_serve.py --seconds 20 --rate 2000
# remat: x-scale @1280 batch lever (memory analysis + step rate, b2 vs b4)
run x1280_b2        2400 python tools/bench_train.py --scale x --imgsz 1280 --batch 2 --iters 10 --only full_step
run x1280_b4_remat  2400 python tools/bench_train.py --scale x --imgsz 1280 --batch 4 --iters 10 --only full_step --remat
echo "=== sweep done ($(date +%H:%M:%S)); logs in $OUT ==="
