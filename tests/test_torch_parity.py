"""Numerics parity vs the reference torch modules (CPU, converted weights).

For each live model component, instantiate the reference implementation,
convert its state_dict with ait_tpu.convert, run both forwards in eval mode
on the same inputs, and require near-bit agreement in float32.  This pins the
semantic details SURVEY.md §7 lists as parity hazards (post-LN ordering,
selective-head gating, causal/pad masks, zero-init GroupNorm residuals,
ceil-mode maxpool, frozen-BN folding, Caffe-style bottleneck strides).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

import ref_harness

ref_harness.install()

from ait_tpu.convert import convert_backbone, convert_detector  # noqa: E402
from ait_tpu.models.ait_transformer import AITTransformer  # noqa: E402
from ait_tpu.models.coattention import (MHACoAttention,  # noqa: E402
                                        NonLocalCoAttention)
from ait_tpu.models.resnet import ResNetBackbone, ResNetTop  # noqa: E402
from ait_tpu.models.sknet import SKNet  # noqa: E402

pytestmark = pytest.mark.slow  # >30s: heavy compile / torch parity

ATOL = 2e-4


def to_nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def from_nhwc(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


def subtree(tree, key):
    return tree[key]


def test_ait_transformer_parity():
    from model.system.Models import Transformer

    torch.manual_seed(0)
    ref = Transformer(d_k=64, d_v=64, d_model=512, d_word_vec=512,
                      d_inner=2048, n_position=64, n_layers=1, n_head=8,
                      dropout=0.1)
    ref.eval()
    x_props = torch.randn(6, 1024, 7, 7)
    x_query = torch.randn(3, 1024, 8, 8)
    with torch.no_grad():
        want = ref(x_props, x_query).numpy()

    sd = {"transformer." + k: v for k, v in ref.state_dict().items()}
    params = convert_detector(sd)["transformer"]

    model = AITTransformer(n_layers=1, channels=1024)
    out = model.apply({"params": params}, to_nhwc(x_props),
                      to_nhwc(x_query), deterministic=True)
    got = from_nhwc(out)
    # 1e-3: the encoder runs at the 8-aligned real source length (56) while
    # the reference pads to 64 (ait_transformer.py n_enc note) — identical
    # in exact arithmetic (masked keys are exact zeros), but the narrower
    # contraction reassociates the f32 reductions
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_sknet_parity_faithful():
    import model.modules.blocks_coatt_transformer_sk as B

    torch.manual_seed(1)
    ref = B.SKNet(channels=256)
    ref.eval()
    xp = torch.randn(4, 256, 7, 7)
    xq = torch.randn(2, 256, 8, 8)
    with torch.no_grad():
        wp, wq = ref(xp, xq)

    sd = {"sk." + k: v for k, v in ref.state_dict().items()}
    params = convert_detector(sd)["sk"]
    # faithful mode never creates the dead gate params
    for branch in params.values():
        branch.pop("fc", None)
        branch.pop("sk", None)

    model = SKNet(channels=256, gate="faithful")
    gp, gq = model.apply({"params": params}, to_nhwc(xp), to_nhwc(xq))
    np.testing.assert_allclose(from_nhwc(gp), wp.numpy(), atol=ATOL,
                               rtol=1e-4)
    np.testing.assert_allclose(from_nhwc(gq), wq.numpy(), atol=ATOL,
                               rtol=1e-4)


def test_nonlocal_coattention_parity():
    import model.modules.blocks_coatt_transformer_sk as B

    torch.manual_seed(2)
    ref = B.CoAttention(in_ch=256, c_hidden=128, with_residual=True,
                        normlization="division")
    ref.eval()
    # zero-init GN makes the output trivially equal the input; perturb the
    # affine so the non-local branch actually contributes
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.GroupNorm):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
    xi = torch.randn(2, 256, 10, 12)
    xq = torch.randn(2, 256, 8, 8)
    with torch.no_grad():
        wi, wq = ref(xi, xq)

    sd = {"coattention_module.coattention." + k: v
          for k, v in ref.state_dict().items()}
    params = convert_detector(sd)["coattention"]

    model = NonLocalCoAttention(channels=256, normalization="division")
    gi, gq = model.apply({"params": params}, to_nhwc(xi), to_nhwc(xq),
                         deterministic=True)
    np.testing.assert_allclose(from_nhwc(gi), wi.numpy(), atol=ATOL,
                               rtol=1e-4)
    np.testing.assert_allclose(from_nhwc(gq), wq.numpy(), atol=ATOL,
                               rtol=1e-4)


def test_mha_coattention_parity():
    from model.faster_rcnn.faster_rcnn_sys_transformer_sk_dilat import \
        CoAttentionModule

    torch.manual_seed(3)
    ref = CoAttentionModule(d_word_vec=256, d_model=128, d_inner=512,
                            n_head=8, d_k=64, d_v=64, dropout=0.1)
    ref.eval()
    xi = torch.randn(2, 256, 9, 11)
    xq = torch.randn(2, 256, 8, 8)
    with torch.no_grad():
        wi, wq = ref(xi, xq)

    sd = {"coattention." + k: v for k, v in ref.state_dict().items()}
    params = convert_detector(sd)["coattention"]

    model = MHACoAttention(channels=256, n_head=8, d_k=64, d_v=64)
    gi, gq = model.apply({"params": params}, to_nhwc(xi), to_nhwc(xq),
                         deterministic=True)
    np.testing.assert_allclose(from_nhwc(gi), wi.numpy(), atol=ATOL,
                               rtol=1e-4)
    np.testing.assert_allclose(from_nhwc(gq), wq.numpy(), atol=ATOL,
                               rtol=1e-4)


def test_resnet_backbone_parity():
    from model.faster_rcnn.resnet_sys_transformer_sk_dilat import (
        RCNNBackbone, resnet50)

    torch.manual_seed(4)
    net = resnet50()
    # randomize BN stats so frozen-BN folding is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    ref = RCNNBackbone(cfg=None, backbone=net)
    ref.eval()
    x = torch.randn(1, 3, 128, 160)
    with torch.no_grad():
        want, _ = ref(x)
        want4 = net.layer4(want).mean(3).mean(2)

    params = convert_backbone(net.state_dict(), strip_module=False)

    backbone = ResNetBackbone("resnet50")
    got = backbone.apply({"params": params["backbone"]}, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(got), want.numpy(), atol=5e-4,
                               rtol=1e-4)

    top = ResNetTop("resnet50")
    got4 = top.apply({"params": params["top"]}, got)
    np.testing.assert_allclose(np.asarray(got4), want4.numpy(), atol=5e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("method", ["GRU", "LSTM"])
def test_contextual_relation_parity(method):
    """The optional recurrent-excitation branch vs the reference
    (resnet_sys_transformer_sk_dilat.py:277-354), GRU and LSTM flavors."""
    from model.faster_rcnn.resnet_sys_transformer_sk_dilat import (
        RCNNBackbone, resnet50)

    from ait_tpu.models.resnet import ContextualRelation

    torch.manual_seed(7)
    net = resnet50()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    ref = RCNNBackbone(cfg=None, backbone=net,
                       with_contextual_relation=True, rnn_method=method)
    ref.eval()
    x = torch.randn(2, 3, 128, 128)
    with torch.no_grad():
        _, want_scale = ref(x)

    sd = {"RCNN_base." + k: v for k, v in ref.state_dict().items()}
    params = convert_detector(sd)

    backbone = ResNetBackbone("resnet50")
    _, stages = backbone.apply({"params": params["backbone"]}, to_nhwc(x),
                               return_stages=True)
    ctx = ContextualRelation(method=method)
    got = ctx.apply({"params": params["contextual"]}, stages)
    np.testing.assert_allclose(np.asarray(got), want_scale.numpy(),
                               atol=2e-4, rtol=1e-4)
