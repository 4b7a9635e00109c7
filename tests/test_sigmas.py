"""σ-schedule and Song'20 step-size selection (SURVEY.md Appendix A.5)."""

import numpy as np

from score_based_channels_tpu.config import ModelConfig
from score_based_channels_tpu.diffusion.sigmas import get_sigmas, song_step_size


def test_geometric_schedule_endpoints():
    cfg = ModelConfig()
    s = np.asarray(get_sigmas(cfg.sigma_begin, cfg.sigma_end, cfg.num_classes))
    assert s.shape == (2311,)
    np.testing.assert_allclose(s[0], 39.15, rtol=1e-5)
    # σ_end = 39.15·0.995^2310 ≈ 3.665e-4 (train_score.py:98-101)
    np.testing.assert_allclose(s[-1], 3.665e-4, rtol=1e-3)
    # geometric ratio is constant = sigma_rate
    ratios = s[1:] / s[:-1]
    np.testing.assert_allclose(ratios, 0.995, rtol=1e-4)


def test_uniform_schedule():
    s = np.asarray(get_sigmas(10.0, 1.0, 10, dist="uniform"))
    np.testing.assert_allclose(s, np.linspace(10.0, 1.0, 10), rtol=1e-6)


def test_song_step_size_in_candidate_range():
    cfg = ModelConfig()
    eps = song_step_size(cfg.sigma_end, cfg.num_classes, cfg.sigma_rate)
    assert 1e-13 <= eps <= 1e-8
