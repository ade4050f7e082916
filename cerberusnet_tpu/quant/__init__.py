from cerberusnet_tpu.quant.ptq import (
    calibrate,
    quantize,
    quantized_apply,
    quant_interception,
    quantization_error,
)
from cerberusnet_tpu.quant.qat import (
    qat_apply,
    qat_interception,
    init_ema,
    update_ema,
    finalize,
)

__all__ = [
    "calibrate",
    "quantize",
    "quantized_apply",
    "quant_interception",
    "quantization_error",
    "qat_apply",
    "qat_interception",
    "init_ema",
    "update_ema",
    "finalize",
]
