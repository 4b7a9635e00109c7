from .cdl import CDL_PROFILES, generate_cdl_channels  # noqa: F401
from .dataset import ChannelDataset, channel_filename  # noqa: F401
