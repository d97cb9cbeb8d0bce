from skdownscale_tpu.utils import checkpoint, metrics, native, profiling
from skdownscale_tpu.utils.timeindex import PaddedGroups, TimeIndex

__all__ = ["PaddedGroups", "TimeIndex", "checkpoint", "metrics", "native", "profiling"]
