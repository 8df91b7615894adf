#!/bin/bash
# Wait for the axon TPU pool to come back (liveness probe every 4 min),
# then run the round-5 evidence chain. Progress: /tmp/r5_chain.log.
set -u
cd /root/repo
echo "waiter start $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log
for i in $(seq 1 60); do
    if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(jnp.sum(x @ x)) == 128.0 * 128 * 128
print('tpu ok')
" > /tmp/r5_liveness.log 2>&1; then
        echo "tpu live after probe $i $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log
        exec bash tools/r5_tpu_chain.sh
    fi
    echo "probe $i: tpu unavailable $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log
    sleep 240
done
echo "waiter gave up $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log
