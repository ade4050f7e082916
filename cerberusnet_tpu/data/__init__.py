from cerberusnet_tpu.data.encodings import (
    decode_kitti_flow,
    encode_kitti_flow,
    decode_kitti_disparity,
    encode_kitti_disparity,
    labelids_to_trainids,
    preprocess_image,
)
from cerberusnet_tpu.data.synthetic import SyntheticPerceptionDataset
from cerberusnet_tpu.data.loader import DataLoader
from cerberusnet_tpu.data.flow_datasets import (
    SintelDataset,
    FlyingChairsDataset,
    FlyingThings3DDataset,
)

__all__ = [
    "decode_kitti_flow",
    "encode_kitti_flow",
    "decode_kitti_disparity",
    "encode_kitti_disparity",
    "labelids_to_trainids",
    "preprocess_image",
    "SyntheticPerceptionDataset",
    "DataLoader",
    "SintelDataset",
    "FlyingChairsDataset",
    "FlyingThings3DDataset",
]
