"""End-to-end released-checkpoint chain: .pth -> converter CLI -> eval CLI.

The north-star run (NEXT.md #1) is `tools/convert_torch_checkpoint.py` on a
released `{dataset}_{net}_fasterRCNN_*.pth` followed by `tools/test_net.py`.
Every piece was tested separately but nothing drove the CHAIN: a .pth in the
released on-disk format (torch dict with session/epoch/model/optimizer/
pooling_mode — trainval_net_voc.py:488-500), the converter CLI's format
auto-detection, and the eval CLI's new --pretrained entry.  This test runs
that exact chain on the synthetic VOC devkit and requires the detections to
be IDENTICAL to the orbax-checkpoint route used by the system-parity test —
same framework both sides, so equality is exact, no tolerance.
"""

import os
import pickle
import sys

import numpy as np
import pytest
import torch

import ref_harness

ref_harness.install()

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from fixtures import make_voc_devkit  # noqa: E402
from test_e2e_torch_parity import _fit_params, _install_shims  # noqa: E402
from test_system_parity import SYS_FIXTURE  # noqa: E402

pytestmark = pytest.mark.slow

SMALL = [
    "TEST.SCALES", "(128,)",
    "TEST.RPN_PRE_NMS_TOP_N", "256",
    "TEST.RPN_POST_NMS_TOP_N", "32",
    "tpu.input_uint8", "False",
    "tpu.host_s2d", "False",
    "tpu.compute_dtype", "float32",
    "tpu.image_size", "(128, 160)",
]


def test_released_pth_to_eval_chain(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_voc_devkit(str(tmp_path / "VOCdevkit2007"), fixture=SYS_FIXTURE)
    _install_shims()

    from model.faster_rcnn.resnet_sys_transformer_sk_dilat import resnet

    torch.manual_seed(5)
    ref_model = resnet(("__background__",) + tuple(f"c{i}" for i in
                                                   range(20)), 50,
                       pretrained=False, class_agnostic=True, num_K=3)
    ref_model.create_architecture()

    # the released artifact, byte-for-byte format (trainval_net_voc.py:493-500
    # via net_utils.save_checkpoint) — including the DataParallel 'module.'
    # prefixes a 4-GPU training run leaves on every key
    pth = tmp_path / "pascal_voc_res50_fasterRCNN_session-1_epoch-10.pth"
    torch.save({
        "session": 1, "epoch": 10,
        "model": {"module." + k: v
                  for k, v in ref_model.state_dict().items()},
        "optimizer": {"state": {}, "param_groups": []},
        "pooling_mode": "align",
        "class_agnostic": True,
    }, str(pth))

    import convert_torch_checkpoint as conv_cli
    import test_net as cli

    pkl = tmp_path / "converted.pkl"
    conv_cli.main(["--input", str(pth), "--output", str(pkl)])
    assert pkl.exists()

    common = [
        "--dataset", "pascal_voc", "--net", "res50",
        "--data_dir", str(tmp_path), "--seen", "2", "--a", "1",
        "--bs", "2", "--nw", "0",
        "--set", *SMALL,
    ]

    # route A: converter CLI pickle -> --pretrained
    out_a = str(tmp_path / "out_a")
    res_a = cli.main(common + ["--pretrained", str(pkl),
                               "--output_dir", out_a])

    # route B: in-process conversion -> orbax ckpt (the system-parity route)
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ait_tpu.config import Config
    from ait_tpu.convert import convert_detector
    from ait_tpu.models import AITDetector
    from ait_tpu.train import (TrainState, init_params, lr_schedule,
                               make_optimizer)
    from ait_tpu.train.checkpoint import CheckpointManager, save_config

    cfg = Config().override(list(SMALL))
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, backbone="resnet50", coattention="mha",
        channels=1024, class_agnostic=True))
    model = AITDetector(cfg, dtype=jnp.float32)
    template = init_params(model, cfg, jax.random.PRNGKey(0))
    params = _fit_params(template, convert_detector(ref_model.state_dict()))
    run_dir = tmp_path / "models" / "res50" / "pascal_voc" / "chain"
    os.makedirs(run_dir, exist_ok=True)
    mgr = CheckpointManager(str(run_dir / "ckpt"))
    mgr.save(1, TrainState.create(
        params, make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))))
    save_config(str(run_dir), cfg)

    out_b = str(tmp_path / "out_b")
    res_b = cli.main(common + ["--checkpoint_path", str(run_dir / "ckpt"),
                               "--output_dir", out_b])

    # identical framework + identical params -> identical detections, exactly
    with open(os.path.join(out_a, "sess1_seen2_0.pkl"), "rb") as f:
        boxes_a = pickle.load(f)
    with open(os.path.join(out_b, "sess1_seen2_0.pkl"), "rb") as f:
        boxes_b = pickle.load(f)
    assert set(boxes_a) == set(boxes_b)
    n_dets = 0
    for ci in boxes_a:
        assert set(boxes_a[ci]) == set(boxes_b[ci])
        for ri in boxes_a[ci]:
            a = np.asarray(boxes_a[ci][ri])
            b = np.asarray(boxes_b[ci][ri])
            np.testing.assert_array_equal(
                a, b, err_msg=f"class {ci} record {ri}")
            n_dets += len(a)
    assert n_dets > 0
    assert res_a[0]["mAP"] == res_b[0]["mAP"]