from .ls import ls_estimate, run_ls_baseline  # noqa: F401
from .lasso import fista_l1_lifted, run_lasso_baseline  # noqa: F401
from .mmse import run_mmse_estimation  # noqa: F401
from .amp import em_bg_amp, em_gm_amp, run_amp_baseline  # noqa: F401
