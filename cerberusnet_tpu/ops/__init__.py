from cerberusnet_tpu.ops.correlation import correlation2d, correlation1d
from cerberusnet_tpu.ops.warp import warp2d, warp1d

__all__ = ["correlation2d", "correlation1d", "warp2d", "warp1d"]
