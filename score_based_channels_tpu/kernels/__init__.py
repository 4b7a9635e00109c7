from .instance_norm import instance_norm_plus_pallas, kernels_enabled, set_kernels_enabled  # noqa: F401
