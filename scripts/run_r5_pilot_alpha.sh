#!/bin/bash
# Round-5 pilot-alpha axis (VERDICT r4 item 1): the reference evaluates
# pilot fraction alpha in {1.0, 0.8, 0.6} as a first-class experiment axis
# (test_score.py:17-22, 88-91) and tabulates its OOD/stopping results PER
# alpha — blind-SNR single stop steps and known-SNR per-SNR stop tables
# (plot_ood_results.py:12-15, 76-82). This driver produces the same
# deliverables on the fixed-coupling ensemble (the reference-data
# hypothesis): per-alpha tuned hyper-parameters (known-SNR tables + the
# blind single (alpha, beta, N) selection), per-alpha known-SNR and
# blind-SNR estimate runs, and the per-alpha Lasso rows for the figure.
# Sequential on purpose: the TPU tunnel is single-process.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY="python -m score_based_channels_tpu"
FIXCK=models/score/CDL-C-fixedcoupling/final_model.npz

for a in 1.0 0.8 0.6; do
  HP=results/score/CDL-C-fixed-hyperparameters-a$a.npz
  # 1. per-alpha grid search on the fixed ensemble (50 channels; the
  #    round-3 data-scale grid, reference procedure)
  timeout 5400 $PY tune --channel CDL-C --checkpoint $FIXCK \
      --pilot_alpha $a \
      --alpha_step_range 1e-10 3e-10 6e-10 1.2e-9 \
      --beta_noise_range 0.1 0.01 0.001 \
      --output $HP > /tmp/r5_tune_a$a.log 2>&1
  # 2. known-SNR protocol: per-SNR tuned (alpha, beta) + per-SNR stops.
  #    --init noise: the per-alpha stop tables are indices into the FULL
  #    reference anneal trace (plots --pilot_axis reads avg_nmse[..., step]);
  #    the round-5 auto default would warm-start matched samples and
  #    desynchronize the trace from the tuner's stop indices.
  timeout 5400 $PY estimate --train CDL-C --test CDL-C \
      --checkpoint $FIXCK --pilot_alpha $a --hparams $HP --init noise \
      --output results/score/fixedcoupling/results_known_a$a.npz \
      > /tmp/r5_known_a$a.log 2>&1
  # 3. blind-SNR protocol: ONE (alpha, beta, N) for the whole sweep
  timeout 5400 $PY estimate --train CDL-C --test CDL-C \
      --checkpoint $FIXCK --pilot_alpha $a --hparams $HP --blind \
      --output results/score/fixedcoupling/results_blind_a$a.npz \
      > /tmp/r5_blind_a$a.log 2>&1
done

# 4. Lasso per alpha on the fixed ensemble (the figure's dotted rows).
#    Small (lambda, lr) grid around the reference defaults so each alpha
#    gets its own best combo (grid-as-batch; the per-alpha argmin is
#    taken inside plots --pilot_axis from complete_log).
[ -f results/baselines/lasso_fixed_allalpha.npz ] || \
timeout 10800 $PY lasso --ray_coupling fixed --alpha 1.0 0.8 0.6 \
    --lmbda 0.1 0.3 1.0 --lr 1e-3 3e-3 \
    --output results/baselines/lasso_fixed_allalpha.npz \
    > /tmp/r5_lasso_allalpha.log 2>&1

echo PILOT_ALPHA_DONE
