"""VGG16 pretrain conversion + pre-conv3 freezing (reference vgg16.py:22-42).

Pins: (a) torchvision-layout state_dict maps onto VGGBackbone/VGGTop with
matching shapes and bit-parity forward numerics (incl. the fc6 CHW->HWC
flatten permutation), (b) the optimizer labels conv1_*/conv2_* frozen so a
train step leaves them untouched."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ait_tpu.convert import convert_vgg_backbone
from ait_tpu.models.vgg import VGGBackbone, VGGTop
from ait_tpu.train.optim import param_label


def _torch_vgg():
    """torchvision vgg16 layout (no torchvision in this image): the standard
    features/classifier Sequentials, so state_dict keys are features.N.* /
    classifier.N.* exactly as in vgg16_caffe.pth."""
    import torch.nn as tnn

    torch.manual_seed(0)
    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in plan:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_c, v, 3, padding=1), tnn.ReLU(True)]
            in_c = v

    class VGG(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*layers)
            self.classifier = tnn.Sequential(
                tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(True),
                tnn.Dropout(), tnn.Linear(4096, 4096), tnn.ReLU(True),
                tnn.Dropout(), tnn.Linear(4096, 1000))

    return VGG()


@pytest.fixture(scope="module")
def converted():
    vgg = _torch_vgg()
    return vgg, convert_vgg_backbone(vgg.state_dict())


@pytest.mark.slow
def test_backbone_forward_parity(converted, rng):
    vgg, tree = converted
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    got = VGGBackbone().apply({"params": tree["backbone"]}, jnp.asarray(x))
    with torch.no_grad():
        # features[:-1]: drop the final maxpool (vgg16.py:38)
        feats = torch.nn.Sequential(*list(vgg.features.children())[:-1])
        ref = feats(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(got),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_top_forward_parity(converted, rng):
    vgg, tree = converted
    x = rng.randn(3, 7, 7, 512).astype(np.float32)
    got = VGGTop().apply({"params": tree["top"]}, jnp.asarray(x),
                         deterministic=True)
    with torch.no_grad():
        # classifier[:-1] minus Dropout (eval mode): fc6/relu/fc7/relu
        t = torch.from_numpy(x.transpose(0, 3, 1, 2)).reshape(3, -1)
        ref = torch.relu(vgg.classifier[3](
            torch.relu(vgg.classifier[0](t))))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_conversion_coverage(converted):
    _, tree = converted
    params = VGGBackbone().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    top = VGGTop().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 7, 7, 512)))["params"]

    def flat(t, p=()):
        for k, v in t.items():
            if isinstance(v, dict):
                yield from flat(v, p + (k,))
            else:
                yield p + (k,), np.asarray(v)

    ours = dict(flat({"backbone": params, "top": top}))
    conv = dict(flat(tree))
    assert set(ours) == set(conv), (
        set(ours) ^ set(conv))
    for k in ours:
        assert ours[k].shape == conv[k].shape, (k, ours[k].shape,
                                                conv[k].shape)


def test_pre_conv3_frozen_in_optimizer():
    class K:      # minimal DictKey stand-in
        def __init__(self, key):
            self.key = key

    for name in ("conv1_1", "conv1_2", "conv2_1", "conv2_2"):
        for leaf in ("kernel", "bias"):
            assert param_label(
                (K("backbone"), K(name), K(leaf))) == "frozen", name
    assert param_label((K("backbone"), K("conv3_1"), K("kernel"))) == "weight"
    assert param_label((K("backbone"), K("conv3_1"), K("bias"))) == "bias"


def test_frozen_convs_not_updated_by_grad():
    model = VGGBackbone()
    x = jnp.ones((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        return (model.apply({"params": p}, x) ** 2).mean()

    g = jax.grad(loss)(params)
    for name in ("conv1_1", "conv2_2"):
        assert float(jnp.abs(g[name]["kernel"]).max()) == 0.0, name
    assert float(jnp.abs(g["conv3_1"]["kernel"]).max()) > 0.0


@pytest.mark.slow
def test_vgg16_detector_train_step_freezes_stem():
    """--net vgg16 equivalent: full train step; conv1/2 stay fixed
    (vgg16.py:40-42), conv3+ train."""
    import dataclasses

    from ait_tpu.config import Config
    from ait_tpu.models import AITDetector
    from ait_tpu.train import (TrainState, init_params, lr_schedule,
                               make_optimizer, make_train_step)

    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, backbone="vgg16", channels=512),
        TRAIN=dataclasses.replace(
            cfg.TRAIN, RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16,
            RPN_BATCHSIZE=16, BATCH_SIZE=8),
        MAX_NUM_GT_BOXES=4)
    model = AITDetector(cfg, dtype=jnp.float32)
    r = np.random.RandomState(0)
    b, h, w = 2, 96, 96
    batch = {
        "image": jnp.asarray(r.rand(b, h, w, 3), jnp.float32),
        "query": jnp.asarray(r.rand(b, 128, 128, 3), jnp.float32),
        "im_info": jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (b, 1)),
        "gt_boxes": jnp.asarray(
            np.tile(np.array([[8, 8, 60, 60, 1]], np.float32), (b, 4, 1))),
        "num_boxes": jnp.ones((b,), jnp.int32),
    }
    params = init_params(model, cfg, jax.random.PRNGKey(0), batch=batch)
    tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1), clip_norm=10.0)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, tx))
    before = np.asarray(state.params["backbone"]["conv1_1"]["kernel"])
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.array_equal(
        before, np.asarray(state.params["backbone"]["conv1_1"]["kernel"]))
    assert not np.allclose(
        np.asarray(params["backbone"]["conv3_1"]["kernel"]),
        np.asarray(state.params["backbone"]["conv3_1"]["kernel"]))
