from cerberusnet_tpu.eval.tiled import tiled_forward
from cerberusnet_tpu.eval.tta import tta_forward

__all__ = ["tiled_forward", "tta_forward"]
