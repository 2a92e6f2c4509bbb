"""Host space-to-depth input path: regroup equivalence, backbone parity,
loader format."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ait_tpu import native
from ait_tpu.config import Config
from ait_tpu.data.transforms import space_to_depth
from ait_tpu.models.detector import _to_model_input
from ait_tpu.models.resnet import ResNetBackbone


def test_space_to_depth_matches_device_regroup(rng):
    x = rng.randint(0, 256, (2, 8, 12, 3)).astype(np.uint8)
    got = space_to_depth(x)
    b, h, w, _ = x.shape
    ref = x.reshape(b, h // 2, 2, w // 2, 2, 3).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 12)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(not native.available(), reason="native .so not built")
def test_native_s2d_matches_numpy(rng):
    x = rng.randint(0, 256, (3, 16, 20, 3)).astype(np.uint8)
    np.testing.assert_array_equal(native.space_to_depth(x, 2),
                                  space_to_depth(x))


def test_backbone_accepts_s2d_input_bitwise(rng):
    """model(host_s2d(u8)) must equal model(u8) exactly — the device does
    the same regroup, and normalization commutes with it."""
    x = rng.randint(0, 256, (1, 64, 96, 3)).astype(np.uint8)
    model = ResNetBackbone("resnet50")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    y3 = model.apply({"params": params},
                     _to_model_input(jnp.asarray(x), jnp.float32))
    y12 = model.apply({"params": params},
                      _to_model_input(jnp.asarray(space_to_depth(x)),
                                      jnp.float32))
    np.testing.assert_array_equal(np.asarray(y3), np.asarray(y12))


def test_loader_ships_s2d(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from fixtures import make_voc_devkit

    from ait_tpu.data import OneShotLoader
    from ait_tpu.data.voc import filter_seen, load_voc

    devkit = make_voc_devkit(str(tmp_path / "VOCdevkit2007"))
    cfg = Config()
    assert cfg.tpu.host_s2d
    view = filter_seen(load_voc(devkit, "2007", "test"), 1)
    loader = OneShotLoader(view, cfg, training=False)
    item = loader.test_item(0)
    ch, cw = cfg.tpu.image_size
    assert item["image"].shape == (ch // 2, cw // 2, 12)
    assert item["image"].dtype == np.uint8
    # vgg16 has no s2d stem -> loader keeps [H, W, 3]
    cfgv = cfg.replace(model=dataclasses.replace(
        cfg.model, backbone="vgg16", channels=512))
    lv = OneShotLoader(filter_seen(load_voc(devkit, "2007", "test"), 1),
                       cfgv, training=False)
    assert not lv.host_s2d
    assert lv.test_item(0)["image"].shape == (ch, cw, 3)
