#!/bin/bash
# wait until the axon service answers a tiny matmul (max ~50 min)
for i in $(seq 1 10); do
  if timeout 300 env PYTHONPATH=/root/repo:/root/.axon_site python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok', float((x@x)[0,0]))" 2>/dev/null; then
    exit 0
  fi
  echo "probe $i failed; sleeping 300s"
  sleep 300
done
echo "PROBE NEVER SUCCEEDED"
exit 1
