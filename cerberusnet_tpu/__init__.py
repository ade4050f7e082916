"""cerberusnet_tpu — a TPU-native multi-task perception framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
5had3z/CerberusNet (see SURVEY.md): a shared CNN pyramid encoder feeding three
decoder heads — stereo disparity, optical flow, and semantic segmentation —
compiled as a single jitted graph, with the reference's custom CUDA ops
(correlation cost-volume, bilinear warping) implemented as Pallas TPU kernels
with custom VJPs.

NOTE on citations: the reference tree at /root/reference was empty during both
the survey and this build session (SURVEY.md §0), so docstrings cite SURVEY.md
sections (which carry the [BASELINE]/[PAPER] provenance) instead of
reference-file lines.
"""

__version__ = "0.1.0"

from cerberusnet_tpu.ops.correlation import correlation2d, correlation1d
from cerberusnet_tpu.ops.warp import warp2d, warp1d

__all__ = [
    "correlation2d",
    "correlation1d",
    "warp2d",
    "warp1d",
]
