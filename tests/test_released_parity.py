"""Smoke the one-command released-parity runbook (tools/released_parity.py)
end to end on the synthetic devkit + a synthetic released-format .pth —
the exact chain the day-1 real-data run will execute (NEXT.md #1), minus
the real data."""

import os
import sys

import pytest
import torch

import ref_harness

ref_harness.install()

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from fixtures import make_voc_devkit  # noqa: E402
from test_convert_cli import SMALL  # noqa: E402
from test_e2e_torch_parity import _install_shims  # noqa: E402
from test_system_parity import SYS_FIXTURE  # noqa: E402

pytestmark = pytest.mark.slow


def _released_pth(tmp_path):
    from model.faster_rcnn.resnet_sys_transformer_sk_dilat import resnet

    torch.manual_seed(5)
    ref_model = resnet(("__background__",) + tuple(f"c{i}" for i in
                                                   range(20)), 50,
                       pretrained=False, class_agnostic=True, num_K=3)
    ref_model.create_architecture()
    pth = tmp_path / "pascal_voc_res50_fasterRCNN_session-1_epoch-10.pth"
    torch.save({
        "session": 1, "epoch": 10,
        "model": {"module." + k: v
                  for k, v in ref_model.state_dict().items()},
        "optimizer": {"state": {}, "param_groups": []},
        "pooling_mode": "align",
        "class_agnostic": True,
    }, str(pth))
    return pth


def test_runbook_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_voc_devkit(str(tmp_path / "VOCdevkit2007"), fixture=SYS_FIXTURE)
    _install_shims()
    pth = _released_pth(tmp_path)

    import released_parity as rb

    # random weights score near-zero AP: --no-gate must run the FULL chain
    # (layout checks -> converter -> eval -> report) and exit 0
    rc = rb.main([
        "--dataset", "pascal_voc", "--pth", str(pth),
        "--data_dir", str(tmp_path), "--a", "2", "--bs", "2", "--nw", "0",
        "--out_dir", str(tmp_path / "rp_out"), "--no-gate",
        "--set", *SMALL,
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "rp_out" / "converted_params.pkl")

    # the gate itself: same run against an achievable target passes, and
    # against the real 72.2 target fails with exit 1 (random weights)
    rc_pass = rb.main([
        "--dataset", "pascal_voc", "--pth", str(pth),
        "--data_dir", str(tmp_path), "--a", "2", "--bs", "2", "--nw", "0",
        "--out_dir", str(tmp_path / "rp_out2"),
        "--expected", "0.0", "--tolerance", "5.0",
        "--set", *SMALL,
    ])
    assert rc_pass == 0
    rc_fail = rb.main([
        "--dataset", "pascal_voc", "--pth", str(pth),
        "--data_dir", str(tmp_path), "--a", "2", "--bs", "2", "--nw", "0",
        "--out_dir", str(tmp_path / "rp_out3"),
        "--set", *SMALL,
    ])
    assert rc_fail == 1


def test_runbook_layout_checks(tmp_path):
    import released_parity as rb

    # missing checkpoint
    with pytest.raises(SystemExit):
        rb.main(["--dataset", "pascal_voc", "--pth",
                 str(tmp_path / "nope.pth"), "--data_dir", str(tmp_path)])
    # missing devkit
    pth = tmp_path / "x.pth"
    pth.write_bytes(b"not-a-real-ckpt")
    with pytest.raises(SystemExit):
        rb.main(["--dataset", "pascal_voc", "--pth", str(pth),
                 "--data_dir", str(tmp_path)])
    # coco without --g
    os.makedirs(tmp_path / "coco" / "annotations")
    os.makedirs(tmp_path / "coco" / "images")
    os.makedirs(tmp_path / "coco_reference_image")
    with pytest.raises(SystemExit):
        rb.main(["--dataset", "coco", "--pth", str(pth),
                 "--data_dir", str(tmp_path)])
