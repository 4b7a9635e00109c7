#!/bin/bash
# Round-5 tail: takes over after the stage-2 orchestrator was re-planned
# mid-round. Waits for the running MMSE fixed-phase PID, then runs the
# re-prioritized remainder: WGAN oracle retry (smaller chunk after a TPU
# worker crash on the 1200-chain program), per-SNR-chat calibration, and
# the per-SNR production run if wall-clock remains.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

# 1. WGAN oracle decomposition retry (chunk 600: the 1200-chain jit
#    faulted the TPU worker once; same protocol otherwise)
timeout 3600 python scripts/diag_wgan_oracle.py --chunk 600 \
    > /tmp/r5_wgan_oracle2.log 2>&1

# 2. MMSE per-SNR chat (random ensemble, 50-channel production)
timeout 10800 python scripts/run_r5_mmse.py --phase persnr \
    --ensemble random --num_channels 50 > /tmp/r5_mmse_persnr.log 2>&1

echo TAIL_DONE
