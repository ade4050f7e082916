"""Visualisation tests (SURVEY.md §3 C18)."""

import numpy as np

from cerberusnet_tpu.utils import visualization as vis


class TestFlowColor:
    def test_shape_and_dtype(self):
        flow = np.random.RandomState(0).randn(8, 10, 2).astype(np.float32)
        img = vis.flow_to_color(flow)
        assert img.shape == (8, 10, 3) and img.dtype == np.uint8

    def test_zero_flow_is_black(self):
        img = vis.flow_to_color(np.zeros((4, 4, 2), np.float32), max_flow=1.0)
        assert img.max() == 0

    def test_direction_changes_hue(self):
        right = vis.flow_to_color(np.full((1, 1, 2), [5.0, 0.0]), max_flow=5.0)
        left = vis.flow_to_color(np.full((1, 1, 2), [-5.0, 0.0]), max_flow=5.0)
        assert not np.array_equal(right, left)


class TestDispSeg:
    def test_disp_colormap(self):
        img = vis.disparity_to_color(np.linspace(0, 96, 16).reshape(4, 4))
        assert img.shape == (4, 4, 3) and img.dtype == np.uint8

    def test_seg_color_and_ignore(self):
        labels = np.array([[0, 13], [255, 18]], np.uint8)
        img = vis.seg_to_color(labels)
        assert tuple(img[0, 0]) == (128, 64, 128)  # road
        assert tuple(img[1, 0]) == (0, 0, 0)  # ignore -> black

    def test_overlay_blend(self):
        base = np.full((2, 2, 3), 100, np.uint8)
        labels = np.zeros((2, 2), np.uint8)
        out = vis.seg_overlay(base, labels, alpha=0.5)
        assert out.shape == (2, 2, 3)

    def test_summary_panel(self):
        rng = np.random.RandomState(0)
        panel = vis.summary_panel(
            {
                "image": (rng.rand(4, 6, 3) * 255).astype(np.uint8),
                "seg": rng.randint(0, 19, (4, 6)).astype(np.uint8),
                "flow": rng.randn(4, 6, 2).astype(np.float32),
                "disp": rng.rand(4, 6).astype(np.float32) * 10,
            }
        )
        assert panel.shape == (16, 6, 3)
