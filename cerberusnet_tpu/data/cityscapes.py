"""Cityscapes dataset loader (SURVEY.md §3 C9).

Directory layout (standard Cityscapes package):
  root/leftImg8bit/{split}/{city}/{city}_{seq}_{frame}_leftImg8bit.png
  root/rightImg8bit/...                      (stereo pair)
  root/gtFine/{split}/{city}/..._gtFine_labelIds.png   (seg GT, labelIds)
  root/disparity/{split}/{city}/..._disparity.png      (precomputed 16-bit)
  root/leftImg8bit_sequence/...              (optional, for the prev frame)

labelIds are mapped to the 19 trainIds with ignore=255; the precomputed
disparity uses the Cityscapes (val-1)/256 encoding (SURVEY.md §9.5 family).
The 'temporal' frame (flow target) is the previous sequence frame when the
sequence package exists, else the current left image (flow GT is absent in
Cityscapes anyway).
"""

from __future__ import annotations

import os
from glob import glob

from cerberusnet_tpu.data import encodings
from cerberusnet_tpu.data import io as data_io


class CityscapesDataset:
    def __init__(self, root: str, split: str = "train"):
        self.root = root
        self.split = split
        pattern = os.path.join(
            root, "leftImg8bit", split, "*", "*_leftImg8bit.png"
        )
        self.left_paths = sorted(glob(pattern))
        if not self.left_paths:
            raise FileNotFoundError(f"no Cityscapes images under {pattern}")

    def __len__(self):
        return len(self.left_paths)

    def _sibling(self, left_path: str, kind: str, suffix: str):
        rel = os.path.relpath(left_path, os.path.join(self.root, "leftImg8bit"))
        rel = rel.replace("_leftImg8bit.png", suffix)
        return os.path.join(self.root, kind, rel)

    def __getitem__(self, idx: int):
        lp = self.left_paths[idx]
        sample = {"left": data_io.read_image_u8(lp)}

        rp = self._sibling(lp, "rightImg8bit", "_rightImg8bit.png")
        if os.path.exists(rp):
            sample["right"] = data_io.read_image_u8(rp)

        # previous frame from the sequence package when present
        base = os.path.basename(lp)
        city, seq, frame, _ = base.split("_")
        prev_name = f"{city}_{seq}_{int(frame) - 1:06d}_leftImg8bit.png"
        prev_path = os.path.join(
            self.root,
            "leftImg8bit_sequence",
            self.split,
            city,
            prev_name,
        )
        sample["temporal"] = (
            data_io.read_image_u8(prev_path)
            if os.path.exists(prev_path)
            else sample["left"]
        )

        gt = self._sibling(lp, "gtFine", "_gtFine_labelIds.png")
        if os.path.exists(gt):
            sample["seg_labels"] = encodings.labelids_to_trainids(
                data_io.read_image_gray_u8(gt)
            )

        dp = self._sibling(lp, "disparity", "_disparity.png")
        if os.path.exists(dp):
            disp, valid = encodings.decode_cityscapes_disparity(
                data_io.read_png16(dp)
            )
            sample["disp_gt"] = disp
            sample["disp_valid"] = valid
        return sample
