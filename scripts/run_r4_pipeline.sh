#!/bin/bash
# Round-4 TPU pipeline (run AFTER the reference-scale MMSE job):
#   1. Pallas conv-shape probe (VERDICT r3 item 1 kernel-level data)
#   2. OOD re-validation with round-3 tuning + the auto protocol
#      (items 4 + 7) and the bf16/f32 A/B on OOD + warm paths
#   3. fixed-coupling-ensemble baseline suite for the one-dataset
#      flagship figure (items 3 + 5)
# Sequential on purpose: the TPU tunnel is single-process.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY="python -m score_based_channels_tpu"
HP=results/score/CDL-C-hyperparameters.npz
FIXCK=models/score/CDL-C-fixedcoupling/final_model.npz

# ---- 1. conv probe --------------------------------------------------------
timeout 3600 python -m score_based_channels_tpu.kernels.conv_probe \
    > /tmp/r4_probe.log 2>&1

# ---- 2. OOD re-validation + auto protocol ---------------------------------
for prof in CDL-C CDL-A CDL-B CDL-D; do
  d=results/score/train-CDL-C_test-$prof
  timeout 5400 $PY estimate --train CDL-C --test $prof --hparams $HP \
      --output $d/results_r4.npz > /tmp/r4_ref_$prof.log 2>&1
  timeout 5400 $PY estimate --train CDL-C --test $prof --init lmmse \
      --sigma_start 0.05 --output $d/results_warm_r4.npz \
      > /tmp/r4_warm_$prof.log 2>&1
  timeout 5400 $PY estimate --train CDL-C --test $prof --hparams $HP \
      --init auto --output $d/results_auto.npz \
      > /tmp/r4_auto_$prof.log 2>&1
done

# ---- 2b. dtype A/B on the OOD + warm paths (ADVICE r3) --------------------
timeout 5400 $PY estimate --train CDL-C --test CDL-D --hparams $HP \
    --init auto --dtype float32 \
    --output results/score/train-CDL-C_test-CDL-D/results_auto_f32.npz \
    > /tmp/r4_auto_D_f32.log 2>&1
timeout 5400 $PY estimate --train CDL-C --test CDL-C --init lmmse \
    --sigma_start 0.05 --dtype float32 \
    --output results/score/train-CDL-C_test-CDL-C/results_warm_f32.npz \
    > /tmp/r4_warm_C_f32.log 2>&1

# ---- 3. fixed-ensemble baseline suite -------------------------------------
timeout 1800 $PY ls --ray_coupling fixed --num_channels 100 \
    --output results/baselines/ls_fixed.npz > /tmp/r4_ls_fixed.log 2>&1
timeout 1800 $PY lmmse --ray_coupling fixed --num_channels 100 \
    --output results/baselines/lmmse_fixed.npz > /tmp/r4_lmmse_fixed.log 2>&1
timeout 7200 $PY amp --ray_coupling fixed --num_channels 50 \
    --output results/baselines/amp_fixed.npz > /tmp/r4_amp_fixed.log 2>&1
timeout 10800 $PY lasso --ray_coupling fixed \
    --output results/baselines/lasso_fixed.npz > /tmp/r4_lasso_fixed.log 2>&1

# LDAMP: per-SNR models on the fixed ensemble, then eval
timeout 14400 $PY train-ldamp --ray_coupling fixed \
    --model_dir models/ldamp-FlippedUNet-fixed \
    > /tmp/r4_ldamp_train_fixed.log 2>&1
timeout 7200 $PY eval-ldamp --ray_coupling fixed \
    --model_dir models/ldamp-FlippedUNet-fixed \
    --output results/baselines/ldamp_fixed.npz \
    > /tmp/r4_ldamp_eval_fixed.log 2>&1

# WGAN: train on fixed ensemble; eval with BOTH noise conventions
timeout 14400 $PY train-wgan --ray_coupling fixed \
    --output models/wgan/CDL-C-fixed_0.50.npz > /tmp/r4_wgan_train.log 2>&1
timeout 7200 $PY eval-wgan --ray_coupling fixed \
    --checkpoint models/wgan/CDL-C-fixed_0.50.npz \
    --noise_convention aligned --snr -10 -7.5 -5 -2.5 0 2.5 5 7.5 10 12.5 15 17.5 20 22.5 25 27.5 30 \
    --output results/baselines/wgan_fixed_aligned.npz \
    > /tmp/r4_wgan_fixed_aligned.log 2>&1
timeout 7200 $PY eval-wgan --ray_coupling fixed \
    --checkpoint models/wgan/CDL-C-fixed_0.50.npz \
    --output results/baselines/wgan_fixed_ref.npz \
    > /tmp/r4_wgan_fixed_ref.log 2>&1

# WGAN on the RANDOM ensemble with the aligned convention (the baseline
# table's SNR-aligned row — VERDICT r3 item 5)
timeout 14400 $PY train-wgan \
    --output models/wgan/CDL-C_0.50.npz > /tmp/r4_wgan_train_rand.log 2>&1
timeout 7200 $PY eval-wgan \
    --checkpoint models/wgan/CDL-C_0.50.npz \
    --noise_convention aligned --snr -10 -7.5 -5 -2.5 0 2.5 5 7.5 10 12.5 15 17.5 20 22.5 25 27.5 30 \
    --output results/baselines/wgan_random_aligned.npz \
    > /tmp/r4_wgan_rand_aligned.log 2>&1

# MMSE posterior-averaging row on the fixed ensemble (warm, beta=1)
timeout 7200 $PY mmse --checkpoint $FIXCK --init lmmse --sigma_start 0.05 \
    --beta_noise 1.0 --coef_cap auto --num_channels 100 --mmse_avg 50 \
    --dtype bfloat16 --chunk 256 \
    --output results/mmse/CDL-C-fixed-lmmse-beta1.npz \
    > /tmp/r4_mmse_fixed.log 2>&1

# ---- 4. headline bench with the round-4 model changes ---------------------
timeout 7200 python bench.py > /tmp/r4_bench.log 2>&1

echo PIPELINE_DONE
