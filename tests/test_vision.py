"""Vis/debug utility tests (fork surface: DCVC-HEM/src/utils/vision.py)."""

import numpy as np
import pytest

from dcvc_tpu.utils.vision import (Alignment, compare_img, ctu_crop,
                                   feature_map_grid, flow_to_color, gen_color,
                                   heatmap, plot_heatmap, plot_yuv)


def test_flow_to_color_shape_and_constant_flow():
    flow = np.zeros((16, 24, 2), np.float32)
    img = flow_to_color(flow)
    assert img.shape == (16, 24, 3) and img.dtype == np.uint8
    # constant nonzero flow -> uniform color
    flow[..., 0] = 3.0
    img = flow_to_color(flow)
    assert (img == img[0, 0]).all()


def test_heatmap_range():
    img = heatmap(np.linspace(0, 1, 64).reshape(8, 8))
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def test_gen_color_anchors_and_rb():
    ramp = gen_color("RAINBOW", n=10)
    assert ramp.shape == (10, 3)
    # ramp starts at the first anchor (red) and ends at the last (violet)
    assert np.allclose(ramp[0], [1.0, 0.0, 0.0], atol=1e-6)
    assert np.allclose(ramp[-1], np.array([148, 0, 211]) / 255.0, atol=1e-6)
    rb = gen_color("RB", n=8)
    assert rb.shape == (8, 3)
    assert rb[0, 0] > 0.9 and rb[4, 2] > 0.9  # red half then blue half
    with pytest.raises(AssertionError):
        gen_color("RB", n=7)


def test_plot_heatmap_clamps_and_maps():
    x = np.array([[-1.0, 0.0], [0.5, 2.0]])
    img = plot_heatmap(x, "U", vmin=0.0, vmax=1.0)
    assert img.shape == (2, 2, 3) and img.dtype == np.uint8
    # U ramp: green -> blue; below-range clamps to green, above to blue
    assert img[0, 0, 1] > img[0, 0, 2]
    assert img[1, 1, 2] > img[1, 1, 1]


def test_plot_yuv_444_and_420_layouts():
    y = np.random.rand(8, 8).astype(np.float32)
    u = np.random.rand(8, 8).astype(np.float32)
    v = np.random.rand(8, 8).astype(np.float32)
    assert plot_yuv(y, u, v).shape == (8, 24, 3)
    u2, v2 = u[:4, :4], v[:4, :4]
    assert plot_yuv(y, u2, v2).shape == (8, 12, 3)


def test_feature_map_grid_tiles_and_normalizes():
    fmap = np.stack([np.full((4, 6), 5.0), np.arange(24.).reshape(4, 6)])
    grid = feature_map_grid(fmap, nrow=2, pad=1)
    assert grid.shape == (4, 13)
    # each map scaled to [0, 1] independently (scale_each semantics)
    assert grid[:, 7:].max() == pytest.approx(1.0)
    assert grid[0, 0] == grid[3, 5]  # constant map -> uniform tile


def test_compare_img_interleaves_batchwise():
    a = np.zeros((2, 4, 4, 3))
    b = np.ones((2, 4, 4, 3))
    out = compare_img([a, b])
    assert out.shape == (4, 4, 4, 3)
    # per batch element: a then b
    assert out[0].max() == 0 and out[1].min() == 1
    assert out[2].max() == 0 and out[3].min() == 1


def test_ctu_crop_modes():
    x = np.random.rand(70, 130, 3)
    assert ctu_crop(x, 64).shape == (64, 128, 3)
    padded = ctu_crop(x, 64, pad_if_needed=True, padding_mode="edge")
    assert padded.shape == (128, 192, 3)
    assert np.allclose(padded[69, :130], padded[70, :130])  # edge pad


def test_alignment_roundtrip():
    al = Alignment(64)
    x = np.random.rand(70, 130, 3).astype(np.float32)
    y = al.align(x)
    assert y.shape == (128, 192, 3)
    assert np.allclose(al.resume(y), x)
