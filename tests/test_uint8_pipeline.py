"""uint8 input pipeline: device-side normalization parity + prefetch."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from ait_tpu.config import Config
from ait_tpu.data import OneShotLoader, device_prefetch
from ait_tpu.data.transforms import normalize
from ait_tpu.data.voc import filter_seen, load_voc
from ait_tpu.models.detector import _to_model_input


def test_device_normalize_matches_host():
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    host = normalize(raw)
    dev = np.asarray(_to_model_input(jnp.asarray(raw), jnp.float32))
    np.testing.assert_allclose(dev, host, atol=1e-6)
    # float inputs pass through
    f = rng.rand(2, 8, 8, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(_to_model_input(jnp.asarray(f), jnp.float32)), f)


def test_loader_uint8_vs_float_paths(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from fixtures import make_voc_devkit

    devkit = make_voc_devkit(str(tmp_path / "VOCdevkit2007"))
    cfg8 = Config()
    assert cfg8.tpu.input_uint8
    cfgf = cfg8.replace(tpu=dataclasses.replace(cfg8.tpu,
                                                input_uint8=False))
    v8 = filter_seen(load_voc(devkit, "2007", "test"), 1)
    vf = filter_seen(load_voc(devkit, "2007", "test"), 1)
    l8 = OneShotLoader(v8, cfg8, training=False)
    lf = OneShotLoader(vf, cfgf, training=False)
    i8 = l8.test_item(0)
    ifl = lf.test_item(0)
    assert i8["image"].dtype == np.uint8
    assert ifl["image"].dtype == np.float32
    # uint8 images ship host-s2d ([H/2, W/2, 12]); normalization commutes
    # with the regroup, so compare in s2d space
    assert l8.host_s2d and i8["image"].shape[-1] == 12
    from ait_tpu.data.transforms import space_to_depth
    ifl["image"] = space_to_depth(ifl["image"])
    # device-normalized uint8 canvas ~= host-normalized canvas; the only
    # difference is uint8-resize rounding (sub-LSB, ~0.5/255 per channel)
    dev = np.asarray(_to_model_input(jnp.asarray(i8["image"]), jnp.float32))
    # image region: cv2's fixed-point uint8 interpolation rounds within
    # ~1 LSB; padding region: mean-fill maps to ~0
    np.testing.assert_allclose(dev, ifl["image"], atol=1.2 / 255 / 0.225)
    np.testing.assert_array_equal(i8["im_info"], ifl["im_info"])
    # query path: uint8 order IS the reference order -> near-exact
    qdev = np.asarray(_to_model_input(jnp.asarray(i8["query"]),
                                      jnp.float32))
    np.testing.assert_allclose(qdev, ifl["query"], atol=1e-5)


def test_device_prefetch_preserves_order():
    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(7)]
    out = list(device_prefetch(iter(batches), size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      batches[i]["x"])
