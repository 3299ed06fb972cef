#!/bin/bash
# Poll the axon TPU tunnel; when a small matmul round-trips, run the
# round-4 measurement sweep (tools/tpu_sweep.sh) once and exit.
# Bounded: gives up after MAX_HOURS. Logs to /tmp/tunnel_watch.log.
set -u
MAX_HOURS=${MAX_HOURS:-10}
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
LOG=/tmp/tunnel_watch.log
echo "[watch] start $(date +%H:%M:%S), deadline in ${MAX_HOURS}h" >>"$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 150 python - >>"$LOG" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
y = (x @ x).block_until_ready()
print("probe ok:", jax.devices(), float(y[0, 0]))
EOF
  then
    echo "[watch] tunnel UP at $(date +%H:%M:%S); running sweep" >>"$LOG"
    bash /root/repo/tools/tpu_sweep.sh >>"$LOG" 2>&1
    echo "[watch] sweep finished rc=$? at $(date +%H:%M:%S)" >>"$LOG"
    exit 0
  fi
  echo "[watch] probe failed at $(date +%H:%M:%S); sleeping 300s" >>"$LOG"
  sleep 300
done
echo "[watch] deadline reached without tunnel; giving up" >>"$LOG"
exit 1
