from cerberusnet_tpu.quant.ptq import (
    calibrate,
    quantize,
    quantized_apply,
    quant_interception,
    quantization_error,
)

__all__ = [
    "calibrate",
    "quantize",
    "quantized_apply",
    "quant_interception",
    "quantization_error",
]
