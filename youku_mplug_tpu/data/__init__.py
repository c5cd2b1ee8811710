from youku_mplug_tpu.data.samplers import (
    get_frame_indices,
    get_frame_indices_start_end,
)
from youku_mplug_tpu.data.video_decode import read_frames
from youku_mplug_tpu.data.loader import ShardedLoader, MetaLoader

__all__ = [
    "get_frame_indices",
    "get_frame_indices_start_end",
    "read_frames",
    "ShardedLoader",
    "MetaLoader",
]
