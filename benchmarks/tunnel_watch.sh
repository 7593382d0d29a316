#!/bin/bash
# Poll the axon tunnel; the moment it answers, run the full pending
# hardware-validation matrix (benchmarks/hw_validate.sh suite).
# Run under tmux: bash benchmarks/tunnel_watch.sh
cd "$(dirname "$0")/.."
mkdir -p benchmarks/hw_logs
while true; do
    echo "[$(date +%T)] probing tunnel..."
    # a REAL roundtrip under budget: jax.devices() answers instantly
    # even when the tunnel is doing 160+ s roundtrips (seen round 4)
    if timeout 120 python -c "import numpy as np, jax.numpy as jnp; \
print(np.asarray(jnp.ones((8,128))*2)[0,0])" \
        > benchmarks/hw_logs/probe_last.txt 2>&1; then
        echo "[$(date +%T)] TUNNEL ALIVE: $(cat benchmarks/hw_logs/probe_last.txt)"
        bash benchmarks/hw_validate.sh suite 2>&1 \
            | tee benchmarks/hw_logs/validate_run.log
        echo "[$(date +%T)] VALIDATION DONE"
        break
    fi
    echo "[$(date +%T)] still dead; sleeping 600s"
    sleep 600
done
