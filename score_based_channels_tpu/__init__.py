"""score_based_channels_tpu — TPU-native score-based MIMO channel estimation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
utcsilab/score-based-channels (MIMO Channel Estimation Using Score-Based
Generative Models, Arvinte & Tamir, IEEE TWC 2023).

Layering (see SURVEY.md §7.1):
  physics    — pilot forward operator Y = P̄ᵀH + N, adjoint, NMSE
  data       — CDL channel generation (replaces the MATLAB 5G Toolbox path),
               dataset assembly, QPSK pilots
  models     — NCSNv2 score networks, U-Nets, LDAMP, DCGAN in flax (NHWC)
  diffusion  — σ-schedules, DSM loss, EMA, annealed-Langevin posterior
               sampling as a single `lax.scan`
  kernels    — Pallas-TPU fused kernels for the hot ops
  parallel   — mesh construction + sharded sweep runners (pjit/shard_map)
  train      — pjit trainers (score / LDAMP / WGAN)
  eval       — SNR-sweep harnesses, hparam tuning, baselines
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
    SamplingConfig,
    TrainingConfig,
    default_score_config,
)
