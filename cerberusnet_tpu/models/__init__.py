from cerberusnet_tpu.models.encoder import PyramidEncoder
from cerberusnet_tpu.models.flow import FlowDecoder, FlowNet
from cerberusnet_tpu.models.dcv_flow import (
    DCVFlowDecoder,
    DCVFlowNet,
    DCVStereoDecoder,
    DCVStereoNet,
    CerberusDCV,
)
from cerberusnet_tpu.models.raft import (
    CerberusRAFT,
    RAFTFlowDecoder,
    RAFTFlowNet,
    RAFTStereoDecoder,
    RAFTStereoNet,
)
from cerberusnet_tpu.models.disparity import DisparityDecoder, StereoNet
from cerberusnet_tpu.models.segmentation import SegmentationHead, SegNet
from cerberusnet_tpu.models.cerberus import CerberusNet

__all__ = [
    "PyramidEncoder",
    "FlowDecoder",
    "FlowNet",
    "DCVFlowDecoder",
    "DCVFlowNet",
    "DCVStereoDecoder",
    "DCVStereoNet",
    "CerberusDCV",
    "CerberusRAFT",
    "RAFTFlowDecoder",
    "RAFTFlowNet",
    "RAFTStereoDecoder",
    "RAFTStereoNet",
    "DisparityDecoder",
    "StereoNet",
    "SegmentationHead",
    "SegNet",
    "CerberusNet",
]
