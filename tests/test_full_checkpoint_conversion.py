"""Full-detector checkpoint conversion: every live reference tensor must map
onto our param tree with matching shapes (the module-level parity tests
already pin numerics; this pins COVERAGE for released-checkpoint loading)."""

import numpy as np
import pytest
import torch

import ref_harness

ref_harness.install()

import jax  # noqa: E402

from ait_tpu.config import Config  # noqa: E402
from ait_tpu.convert import convert_detector  # noqa: E402
from ait_tpu.models import AITDetector  # noqa: E402
from ait_tpu.train import init_params  # noqa: E402

pytestmark = pytest.mark.slow  # >30s: heavy compile / torch parity


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


@pytest.mark.parametrize("flavor,layers", [("voc", 50), ("coco", 50),
                                           ("voc", 101)])
def test_full_detector_conversion_coverage(flavor, layers):
    if flavor == "voc":
        from model.faster_rcnn.resnet_sys_transformer_sk_dilat import resnet
        coatt = "mha"
    else:
        from model.faster_rcnn.resnet_coatt_transformer_sk import resnet
        coatt = "nonlocal"
    torch.manual_seed(0)
    # layers=101 pins the res101 checkpoint layout (the 23-block layer3,
    # resnet_sys_transformer_sk_dilat.py:358-394)
    ref = resnet(("__background__", "fg"), layers, pretrained=False,
                 class_agnostic=True, num_K=3)
    ref.create_architecture()
    sd = ref.state_dict()
    converted = flatten(convert_detector(sd))

    cfg = Config()
    import dataclasses
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, coattention=coatt, sk_gate="fixed",
        backbone=f"resnet{layers}"))
    params = init_params(AITDetector(cfg), cfg, jax.random.PRNGKey(0))
    ours = flatten(params)

    missing = sorted(set(ours) - set(converted))
    # positional tables / masks are deterministic buffers, not params;
    # nothing else may be missing
    assert not missing, missing

    mismatched = [k for k in ours if converted[k].shape != ours[k].shape]
    assert not mismatched, mismatched

    extra = sorted(set(converted) - set(ours))
    assert not extra, extra
