from skdownscale_tpu.utils.timeindex import PaddedGroups, TimeIndex

__all__ = ["PaddedGroups", "TimeIndex"]
