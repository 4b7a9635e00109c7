#!/bin/bash
# Round-5 stage 2 (after the pilot-alpha driver): WGAN oracle
# decomposition, then the two MMSE-at-scale phases. Waits for the given
# PID (the stage-1 driver) to exit first; strictly sequential — the TPU
# tunnel is single-process.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

# 1. WGAN oracle decomposition on the fixed ensemble (VERDICT item 2)
timeout 7200 python scripts/diag_wgan_oracle.py \
    > /tmp/r5_wgan_oracle.log 2>&1

# 2. MMSE symmetric row: fixed ensemble, noise-init beta=1, global chat
timeout 10800 python scripts/run_r5_mmse.py --phase fixed \
    > /tmp/r5_mmse_fixed.log 2>&1

# 3. MMSE per-SNR chat on the random ensemble (closes the 0.89 dB
#    high-SNR gap of the global-chat law). 50 channels: the calibration
#    gain is a bound-gap measurement, not a headline row — halved scale
#    keeps the whole stage inside the round's wall-clock.
timeout 14400 python scripts/run_r5_mmse.py --phase persnr \
    --ensemble random --num_channels 50 > /tmp/r5_mmse_persnr.log 2>&1

echo STAGE2_DONE
