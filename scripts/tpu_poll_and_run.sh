#!/bin/bash
# Wait for the axon TPU tunnel to answer, then kick the campaign.
# A probe = trivial matmul fetched to host within 75 s.
set -u
cd /root/repo
mkdir -p /tmp/campaign
while true; do
  if timeout 75 python - <<'EOF' > /dev/null 2>&1
import jax, numpy as np
import jax.numpy as jnp
x = jnp.ones((8, 8))
assert float(np.asarray(x @ x).sum()) == 512.0
EOF
  then
    echo "tunnel alive $(date)" | tee -a /tmp/campaign/status.log
    break
  fi
  echo "tunnel dead $(date)" >> /tmp/campaign/status.log
  sleep 45
done
exec bash scripts/tpu_campaign.sh
