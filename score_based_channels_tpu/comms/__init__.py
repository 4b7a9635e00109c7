from .ldpc import LDPCCode, make_wifi_like_ldpc  # noqa: F401
from .modulation import qpsk_demap_llr, qpsk_modulate  # noqa: F401
from .mimo import mimo_ml_llr  # noqa: F401
from .link import LinkResults, run_link_simulation  # noqa: F401
