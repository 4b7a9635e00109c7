from .sigmas import get_sigmas, song_step_size  # noqa: F401
from .dsm import anneal_dsm_loss  # noqa: F401
from .ema import ema_init, ema_update  # noqa: F401
from .sampling import (  # noqa: F401
    LangevinHParams,
    annealed_langevin_posterior,
    annealed_langevin_posterior_c2,
    annealed_langevin_unconditional,
)
