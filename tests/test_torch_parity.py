"""Golden parity tests: our NHWC flax layers vs the reference's torch code.

Imports the reference modules directly (torch CPU), copies their randomly
initialized weights into our flax modules via utils/torch_port.py, and
compares outputs on identical inputs. This validates layer topology,
layout conversion, padding/activation semantics, grid_sample parity and
pixel-shuffle channel ordering — the SURVEY §7 'cross-framework drift'
risk areas — without needing pretrained checkpoints.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/DCVC-DC")

import jax.numpy as jnp  # noqa: E402

from dcvc_tpu.utils import torch_port as tp  # noqa: E402

ATOL = 2e-5


def _np(x):
    return x.detach().cpu().numpy()


def _to_nhwc(x):
    return np.transpose(_np(x), (0, 2, 3, 1))


def _from_nhwc(x):
    return torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def _rand_t(shape, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


def test_conv3x3_parity():
    from src.models.layers import conv3x3

    tmod = conv3x3(8, 16, stride=2)
    x = _rand_t((1, 8, 16, 16))
    ref = _to_nhwc(tmod(x))

    import flax.linen as nn

    from dcvc_tpu.layers.blocks import conv

    jmod = conv(16, 3, 2)
    params = {"params": {"kernel": jnp.asarray(tp.conv_kernel(_np(tmod.weight))),
                         "bias": jnp.asarray(_np(tmod.bias))}}
    out = jmod.apply(params, jnp.asarray(_to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)


def test_pixel_shuffle_parity():
    from src.models.layers import subpel_conv1x1

    tmod = subpel_conv1x1(8, 4, 2)
    x = _rand_t((1, 8, 6, 6), 1)
    ref = _to_nhwc(tmod(x))

    from dcvc_tpu.layers.blocks import SubpelConv

    jmod = SubpelConv(4, 2, 1)
    params = {"params": {"conv": {
        "kernel": jnp.asarray(tp.conv_kernel(_np(tmod[0].weight))),
        "bias": jnp.asarray(_np(tmod[0].bias))}}}
    out = jmod.apply(params, jnp.asarray(_to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)


def test_depth_conv_block2_parity():
    from src.models.layers import DepthConvBlock2

    tmod = DepthConvBlock2(8, 12)
    x = _rand_t((1, 8, 10, 10), 2)
    ref = _to_nhwc(tmod(x))

    from dcvc_tpu.layers.blocks import DepthConvBlock2 as JBlock

    t = tmod.block
    dc, ffn = t[0], t[1]
    params = {"params": {
        "depth_conv": {
            "conv1": {"kernel": jnp.asarray(tp.conv_kernel(_np(dc.conv1[0].weight))),
                      "bias": jnp.asarray(_np(dc.conv1[0].bias))},
            "depth_conv": {"kernel": jnp.asarray(
                tp.depthwise_kernel(_np(dc.depth_conv.weight))),
                "bias": jnp.asarray(_np(dc.depth_conv.bias))},
            "conv2": {"kernel": jnp.asarray(tp.conv_kernel(_np(dc.conv2.weight))),
                      "bias": jnp.asarray(_np(dc.conv2.bias))},
            "adaptor": {"kernel": jnp.asarray(tp.conv_kernel(_np(dc.adaptor.weight))),
                        "bias": jnp.asarray(_np(dc.adaptor.bias))},
        },
        "ffn": {
            "conv": {"kernel": jnp.asarray(tp.conv_kernel(_np(ffn.conv.weight))),
                     "bias": jnp.asarray(_np(ffn.conv.bias))},
            "conv_out": {"kernel": jnp.asarray(tp.conv_kernel(_np(ffn.conv_out.weight))),
                         "bias": jnp.asarray(_np(ffn.conv_out.bias))},
        },
    }}
    out = JBlock(12).apply(params, jnp.asarray(_to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)


def test_flow_warp_parity():
    """grid_sample(border, align_corners=True) vs our clamped bilinear."""
    from src.models.video_net import torch_warp

    g = torch.Generator().manual_seed(3)
    im = torch.randn(2, 4, 12, 16, generator=g)
    flow = torch.randn(2, 2, 12, 16, generator=g) * 3.0
    ref = _to_nhwc(torch_warp(im, flow))

    from dcvc_tpu.ops.warp import flow_warp

    out = flow_warp(jnp.asarray(_to_nhwc(im)), jnp.asarray(_to_nhwc(flow)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_bilinear_resize_parity():
    from src.models.video_net import bilineardownsacling, bilinearupsacling

    g = torch.Generator().manual_seed(4)
    x = torch.randn(1, 3, 8, 12, generator=g)
    from dcvc_tpu.ops.warp import bilinear_down2, bilinear_up2

    np.testing.assert_allclose(
        np.asarray(bilinear_up2(jnp.asarray(_to_nhwc(x)))),
        _to_nhwc(bilinearupsacling(x)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(bilinear_down2(jnp.asarray(_to_nhwc(x)))),
        _to_nhwc(bilineardownsacling(x)), atol=1e-5)


def test_replicate_pad_parity():
    import torch.nn.functional as F

    from dcvc_tpu.ops.warp import replicate_pad

    g = torch.Generator().manual_seed(5)
    x = torch.randn(1, 3, 5, 7, generator=g)
    ref = _to_nhwc(F.pad(x, (1, 2, 3, 0), mode="replicate"))
    out = replicate_pad(jnp.asarray(_to_nhwc(x)), (1, 2, 3, 0))
    np.testing.assert_allclose(np.asarray(out), ref, atol=0)


def test_offset_diversity_parity():
    """Grouped multi-offset warp: reshape semantics + block-diag fusion."""
    from src.models.video_model import OffsetDiversity as TOffsetDiversity

    torch.manual_seed(7)
    tmod = TOffsetDiversity()  # in_channel=48, aux=53, O=2, G=16
    g = torch.Generator().manual_seed(8)
    x = torch.randn(1, 48, 16, 24, generator=g)
    aux = torch.randn(1, 53, 16, 24, generator=g)
    flow = torch.randn(1, 2, 16, 24, generator=g) * 2
    ref = _to_nhwc(tmod(x, aux, flow))

    from dcvc_tpu.models.video_net import OffsetDiversity

    jmod = OffsetDiversity(in_channel=48)
    convs = [m for m in tmod.conv_offset if isinstance(m, torch.nn.Conv2d)]
    fusion_w = _np(tmod.fusion.weight)  # [48, 6, 1, 1] grouped
    fusion_b = _np(tmod.fusion.bias)
    G, in_per_g, out_per_g = 16, 6, 3
    wg = np.zeros((G, in_per_g, out_per_g), np.float32)
    for gi in range(G):
        for j in range(out_per_g):
            wg[gi, :, j] = fusion_w[gi * out_per_g + j, :, 0, 0]
    params = {"params": {
        "offset1": {"kernel": jnp.asarray(tp.conv_kernel(_np(convs[0].weight))),
                    "bias": jnp.asarray(_np(convs[0].bias))},
        "offset2": {"kernel": jnp.asarray(tp.conv_kernel(_np(convs[1].weight))),
                    "bias": jnp.asarray(_np(convs[1].bias))},
        "offset3": {"kernel": jnp.asarray(tp.conv_kernel(_np(convs[2].weight))),
                    "bias": jnp.asarray(_np(convs[2].bias))},
        "fusion_kernel": jnp.asarray(wg),
        "fusion_bias": jnp.asarray(fusion_b),
    }}
    out = jmod.apply(params, jnp.asarray(_to_nhwc(x)),
                     jnp.asarray(_to_nhwc(aux)), jnp.asarray(_to_nhwc(flow)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_conv_transpose_parity():
    tmod = torch.nn.ConvTranspose2d(6, 8, 3, stride=2, padding=1,
                                    output_padding=1)
    x = _rand_t((1, 6, 7, 9), 6)
    ref = _to_nhwc(tmod(x))

    from dcvc_tpu.layers.blocks import deconv

    jmod = deconv(8, 3, 2)
    params = {"params": {
        "kernel": jnp.asarray(tp.conv_transpose_kernel(_np(tmod.weight))),
        "bias": jnp.asarray(_np(tmod.bias))}}
    out = jmod.apply(params, jnp.asarray(_to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)
