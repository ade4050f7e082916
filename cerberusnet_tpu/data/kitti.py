"""KITTI-2015 stereo+flow dataset loader (SURVEY.md §3 C10).

Directory layout (KITTI scene-flow training split):
  root/image_2/XXXXXX_10.png, XXXXXX_11.png   left camera, frames t, t+1
  root/image_3/XXXXXX_10.png                  right camera, frame t
  root/flow_occ/XXXXXX_10.png                 16-bit flow GT (t -> t+1)
  root/disp_occ_0/XXXXXX_10.png               16-bit disparity GT (frame t)

Sample-dict convention mapping (matches the CerberusNet forward contract —
every GT anchors at the 'left' frame):
  left     = image_2/_10  (KITTI's GT-anchored frame)
  temporal = image_2/_11  (flow maps left -> temporal)
  right    = image_3/_10

GT decode per SURVEY.md §9.5; sparse validity masks ride along.
"""

from __future__ import annotations

import os
from glob import glob


from cerberusnet_tpu.data import encodings
from cerberusnet_tpu.data import io as data_io


class Kitti2015Dataset:
    def __init__(self, root: str, split: str = "training"):
        self.root = os.path.join(root, split) if split else root
        if not os.path.isdir(os.path.join(self.root, "image_2")):
            # allow pointing straight at a directory containing image_2/
            if os.path.isdir(os.path.join(root, "image_2")):
                self.root = root
            else:
                raise FileNotFoundError(f"no image_2/ under {self.root}")
        self.ids = sorted(
            os.path.basename(p)[:6]
            for p in glob(os.path.join(self.root, "image_2", "*_10.png"))
        )

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx: int):
        sid = self.ids[idx]

        def p(sub, frame):
            return os.path.join(self.root, sub, f"{sid}_{frame}.png")

        sample = {
            "left": data_io.read_image_u8(p("image_2", "10")),
            "temporal": data_io.read_image_u8(p("image_2", "11")),
        }
        right = p("image_3", "10")
        if os.path.exists(right):
            sample["right"] = data_io.read_image_u8(right)
        flow_path = p("flow_occ", "10")
        if os.path.exists(flow_path):
            flow, valid = encodings.decode_kitti_flow(data_io.read_png16(flow_path))
            sample["flow_gt"] = flow
            sample["flow_valid"] = valid
        disp_path = p("disp_occ_0", "10")
        if os.path.exists(disp_path):
            disp, valid = encodings.decode_kitti_disparity(
                data_io.read_png16(disp_path)
            )
            sample["disp_gt"] = disp
            sample["disp_valid"] = valid
        return sample
