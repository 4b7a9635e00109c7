from .estimate import (  # noqa: F401
    EstimationResults,
    langevin_chunked,
    run_estimation,
    run_snr_sweep,
    score_fn_from_params,
)
from .tune import TuneResults, run_hparam_search  # noqa: F401
