from .layers import (  # noqa: F401
    Conv2d,
    CRPBlock,
    InstanceNorm2dPlus,
    MSFBlock,
    RCUBlock,
    RefineBlock,
    ResidualBlock,
    get_act,
)
from .ncsnv2 import NCSNv2, NCSNv2Deeper, NCSNv2Deepest, make_score_model  # noqa: F401
