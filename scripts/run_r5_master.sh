#!/bin/bash
# Round-5 master driver: bootstrap the gitignored artifacts (checkpoints
# are regenerated every round — models/ and data/ are not committed), then run
# stage 1 (pilot-alpha axis) and stage 2 (WGAN oracle decomposition +
# MMSE symmetrization) strictly sequentially: the TPU tunnel is
# single-process.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY="python -m score_based_channels_tpu"
FIXCK=models/score/CDL-C-fixedcoupling/final_model.npz

# ---- 0. bootstrap checkpoints --------------------------------------------
timeout 3600 $PY train-score --train CDL-C --ray_coupling fixed \
    --train_size 2000 --output $FIXCK > /tmp/r5_train_fixed.log 2>&1

# ---- 1. pilot-alpha axis (VERDICT item 1 — top priority) ------------------
bash scripts/run_r5_pilot_alpha.sh > /tmp/r5_stage1.log 2>&1

# random-ensemble checkpoint (stage-2 per-SNR-chat phase prerequisite;
# deferred past stage 1 so the top-priority axis starts sooner)
timeout 3600 $PY train-score --train CDL-C --train_size 2000 \
    > /tmp/r5_train_random.log 2>&1

# ---- 1b. WGAN training on the fixed ensemble (stage-2 prerequisite) -------
timeout 10800 $PY train-wgan --ray_coupling fixed \
    --output models/wgan/CDL-C-fixed_0.50.npz > /tmp/r5_wgan_train.log 2>&1

# ---- 2. stage 2: WGAN oracle decomposition + MMSE phases ------------------
# (the multi-restart flagship WGAN eval is sized AFTER the oracle
# decomposition attributes the gap — run manually once stage 2 lands)
bash scripts/run_r5_stage2.sh > /tmp/r5_stage2_outer.log 2>&1

# ---- 3. headline bench -----------------------------------------------------
timeout 7200 python bench.py > /tmp/r5_bench.log 2>&1

echo MASTER_DONE
