from cerberusnet_tpu.eval.tta import tta_forward

__all__ = ["tta_forward"]
