"""Torch checkpoint conversion: reference .pth state_dicts -> flax params.

Two sources (SURVEY.md §5 checkpoint/resume):
  * the reduced-ImageNet backbone pretrains
    (data/pretrain_imagenet_resnet{50,101}/model_best.pth.tar, loaded with
    `module.` prefixes stripped — resnet_sys_transformer_sk_dilat.py:379-394);
  * full released detector checkpoints
    ({dataset}_{net}_fasterRCNN_session-S_epoch-E_step-T.pth, torch dict with
    a 'model' state_dict — trainval_net_voc.py:488-500).

Layout conversions: torch conv [O,I,kh,kw] -> flax [kh,kw,I,O]; linear
[O,I] -> [I,O]; BatchNorm {weight,bias,running_mean,running_var} ->
FrozenBatchNorm {scale,bias,mean,var}.  The RCNNBackbone state_dict aliases
every backbone tensor under both `backbone.*` and `stem./layerN.` names; only
the latter are read.  Buffers that are deterministic functions of shape
(positional-encoding tables, num_batches_tracked) are skipped.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _set(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _linear(w) -> np.ndarray:
    return np.asarray(w).T


_BN_LEAF = {"weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var"}


def _bn(path, leaf, value, out):
    _set(out, path + (_BN_LEAF[leaf],), np.asarray(value))


def _norm_leaf(leaf: str) -> str:
    return {"weight": "scale", "bias": "bias"}[leaf]


def convert_backbone(state_dict: Dict[str, "object"],
                     strip_module: bool = True) -> dict:
    """ImageNet-pretrain resnet state_dict -> {'backbone':..., 'top':...}."""
    out: dict = {}
    for key, val in state_dict.items():
        if strip_module and key.startswith("module."):
            key = key[len("module."):]
        parts = key.split(".")
        if parts[0] in ("fc", "avgpool"):
            continue
        if parts[-1] == "num_batches_tracked":
            continue
        val = np.asarray(getattr(val, "numpy", lambda: val)())
        if parts[0] == "conv1":
            _set(out, ("backbone", "conv1", "kernel"), _conv(val))
        elif parts[0] == "bn1":
            _bn(("backbone", "bn1"), parts[1], val, out)
        elif re.fullmatch(r"layer[1-4]", parts[0]):
            layer = parts[0]
            root = ("top", "layer4") if layer == "layer4" else ("backbone",
                                                               layer)
            block = f"block{parts[1]}"
            mod, leaf = parts[2], parts[3]
            if mod.startswith("conv"):
                _set(out, root + (block, mod, "kernel"), _conv(val))
            elif mod.startswith("bn"):
                _bn(root + (block, mod), leaf, val, out)
            elif mod == "downsample":
                idx, leaf = parts[3], parts[4]
                if idx == "0":
                    _set(out, root + (block, "downsample_conv", "kernel"),
                         _conv(val))
                else:
                    _bn(root + (block, "downsample_bn"), leaf, val, out)
    return out


# torchvision vgg16 features index -> conv name (vgg16.py:38 uses
# features[:-1]; indices skip the interleaved ReLU/MaxPool modules)
_VGG_FEATURES = {0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
                 10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
                 17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
                 24: "conv5_1", 26: "conv5_2", 28: "conv5_3"}


def _vgg_fc6(w: np.ndarray) -> np.ndarray:
    """classifier.0 weight [4096, C*H*W] (torch CHW flatten order) ->
    [H*W*C, 4096] (flax HWC flatten order).  H=W=7, C=512."""
    o, i = np.asarray(w).shape
    c, s = 512, int(round((i / 512) ** 0.5))
    assert c * s * s == i, f"unexpected fc6 in-dim {i}"
    return (np.asarray(w).reshape(o, c, s, s)
            .transpose(2, 3, 1, 0).reshape(i, o))


def convert_vgg_backbone(state_dict: Dict[str, "object"],
                         strip_module: bool = True) -> dict:
    """torchvision/caffe-layout vgg16 state_dict (vgg16_caffe.pth,
    vgg16.py:31-33) -> {'backbone': conv1_1..conv5_3, 'top': fc6/fc7}.

    classifier.6 (the 1000-way head) is dropped — the reference keeps
    classifier[:-1] (vgg16.py:35).  fc6 gets the CHW->HWC input-dim
    permutation (torch flattens [C,7,7]; flax flattens [7,7,C]).
    """
    out: dict = {}
    for key, val in state_dict.items():
        if strip_module and key.startswith("module."):
            key = key[len("module."):]
        parts = key.split(".")
        val = np.asarray(getattr(val, "numpy", lambda: val)())
        if parts[0] == "features" and int(parts[1]) in _VGG_FEATURES:
            name = _VGG_FEATURES[int(parts[1])]
            if parts[2] == "weight":
                _set(out, ("backbone", name, "kernel"), _conv(val))
            else:
                _set(out, ("backbone", name, "bias"), val)
        elif parts[0] == "classifier" and parts[1] in ("0", "3"):
            name = "fc6" if parts[1] == "0" else "fc7"
            if parts[2] == "weight":
                w = _vgg_fc6(val) if name == "fc6" else _linear(val)
                _set(out, ("top", name, "kernel"), w)
            else:
                _set(out, ("top", name, "bias"), val)
    return out


# torch module path prefix -> (flax path, kind); kind: conv|linear|norm|bn
_MHA_SUBS = [
    ("w_qs.weight", ("w_qs", "kernel"), _linear),
    ("w_ks.weight", ("w_ks", "kernel"), _linear),
    ("w_vs.weight", ("w_vs", "kernel"), _linear),
    ("fc.weight", ("fc", "kernel"), _linear),
    ("sh.sk.weight", ("sh", "sk", "kernel"), _linear),
    ("sh.sk.bias", ("sh", "sk", "bias"), np.asarray),
    ("layer_norm.weight", ("LayerNorm_0", "scale"), np.asarray),
    ("layer_norm.bias", ("LayerNorm_0", "bias"), np.asarray),
]

_FFN_SUBS = [
    ("w_1.weight", ("w_1", "kernel"), _linear),
    ("w_1.bias", ("w_1", "bias"), np.asarray),
    ("w_2.weight", ("w_2", "kernel"), _linear),
    ("w_2.bias", ("w_2", "bias"), np.asarray),
    ("layer_norm.weight", ("LayerNorm_0", "scale"), np.asarray),
    ("layer_norm.bias", ("LayerNorm_0", "bias"), np.asarray),
]


def _match_subs(rest: str, subs, base_path, out, val) -> bool:
    for suffix, path, fn in subs:
        if rest == suffix:
            _set(out, base_path + path, fn(val))
            return True
    return False


def convert_detector(state_dict: Dict[str, "object"]) -> dict:
    """Full detector state_dict ('model' entry of a released ckpt)."""
    out: dict = {}
    for key, val in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        val = np.asarray(getattr(val, "numpy", lambda: val)())
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        if "pos_table" in key:
            continue  # deterministic sinusoid buffer
        if parts[0] == "RCNN_base":
            if parts[1] == "backbone":
                continue  # aliases of stem./layerN. tensors
            # optional contextual-relation branch (resnet_sys…:277-317)
            m = re.fullmatch(r"trans([123])", parts[1])
            if m:
                leaf = "kernel" if parts[3] == "weight" else "bias"
                _set(out, ("contextual", f"trans{m.group(1)}", leaf),
                     _conv(val) if leaf == "kernel" else val)
                continue
            if parts[1] == "rnn":
                m = re.fullmatch(r"(weight|bias)_(ih|hh)_l(\d+)(_reverse)?",
                                 parts[2])
                kind, gate, layer, rev = m.groups()
                d = f"l{layer}_bw" if rev else f"l{layer}_fw"
                leaf = ("w_" if kind == "weight" else "b_") + gate
                _set(out, ("contextual", d, leaf),
                     _linear(val) if kind == "weight" else np.asarray(val))
                continue
            if parts[1] == "fc":
                leaf = "kernel" if parts[3] == "weight" else "bias"
                _set(out, ("contextual", "fc", leaf),
                     _linear(val) if leaf == "kernel" else val)
                continue
            if parts[1] == "stem":
                if parts[2] == "0":
                    _set(out, ("backbone", "conv1", "kernel"), _conv(val))
                else:
                    _bn(("backbone", "bn1"), parts[3], val, out)
                continue
            layer, block = parts[1], f"block{parts[2]}"
            root = ("backbone", layer, block)
            mod = parts[3]
            if mod.startswith("conv"):
                _set(out, root + (mod, "kernel"), _conv(val))
            elif mod.startswith("bn"):
                _bn(root + (mod,), parts[4], val, out)
            elif mod == "downsample":
                if parts[4] == "0":
                    _set(out, root + ("downsample_conv", "kernel"),
                         _conv(val))
                else:
                    _bn(root + ("downsample_bn",), parts[5], val, out)
            continue
        if parts[0] == "RCNN_top":
            block = f"block{parts[2]}"
            root = ("top", "layer4", block)
            mod = parts[3]
            if mod.startswith("conv"):
                _set(out, root + (mod, "kernel"), _conv(val))
            elif mod.startswith("bn"):
                _bn(root + (mod,), parts[4], val, out)
            elif mod == "downsample":
                if parts[4] == "0":
                    _set(out, root + ("downsample_conv", "kernel"),
                         _conv(val))
                else:
                    _bn(root + ("downsample_bn",), parts[5], val, out)
            continue
        if parts[0] == "RCNN_rpn":
            name = {"RPN_Conv": "conv", "RPN_cls_score": "cls_score",
                    "RPN_bbox_pred": "bbox_pred"}[parts[1]]
            leaf = "kernel" if parts[2] == "weight" else "bias"
            _set(out, ("rpn", name, leaf),
                 _conv(val) if leaf == "kernel" else val)
            continue
        if parts[0] == "RCNN_cls_score":
            leaf = "kernel" if parts[2] == "weight" else "bias"
            _set(out, (f"cls_score_{parts[1]}", leaf),
                 _linear(val) if leaf == "kernel" else val)
            continue
        if parts[0] == "RCNN_bbox_pred":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            _set(out, ("bbox_pred_head", leaf),
                 _linear(val) if leaf == "kernel" else val)
            continue
        if parts[0] in ("coattention", "coattention_module"):
            rest = ".".join(parts[1:])
            # VOC MHA flavor (faster_rcnn_sys_transformer_sk_dilat.py:31-64)
            for emb in ("img_emb", "qry_emb"):
                if rest.startswith(emb + ".0."):
                    leaf = "kernel" if rest.endswith("weight") else "bias"
                    _set(out, ("coattention", emb, leaf),
                         _conv(val) if leaf == "kernel" else val)
                    break
            else:
                for tr in ("img_trans", "qry_trans"):
                    if rest.startswith(tr + ".0."):
                        leaf = "kernel" if rest.endswith("weight") else "bias"
                        _set(out, ("coattention", tr, leaf),
                             _linear(val) if leaf == "kernel" else val)
                        break
                else:
                    m = re.match(r"(i2q_attn|q2i_attn)\.(.+)", rest)
                    if m and _match_subs(m.group(2), _MHA_SUBS,
                                         ("coattention", m.group(1)), out,
                                         val):
                        continue
                    # COCO non-local flavor (blocks_coatt:17-58)
                    m = re.match(r"coattention\.(emb|rho|phi)\.(weight|bias)",
                                 rest)
                    if m:
                        leaf = "kernel" if m.group(2) == "weight" else "bias"
                        _set(out, ("coattention", m.group(1), leaf),
                             _conv(val) if leaf == "kernel" else val)
                        continue
                    m = re.match(r"coattention\.(omega|theta)\.(0|1)\."
                                 r"(weight|bias)", rest)
                    if m:
                        name, idx, leaf = m.groups()
                        if idx == "0":
                            _set(out, ("coattention", f"{name}_conv",
                                       "kernel" if leaf == "weight"
                                       else "bias"),
                                 _conv(val) if leaf == "weight" else val)
                        else:
                            _set(out, ("coattention", f"{name}_gn",
                                       "GroupNorm_0", _norm_leaf(leaf)),
                                 val)
                        continue
            continue
        if parts[0] == "transformer":
            rest = ".".join(parts[1:])
            for emb in ("enc_emb", "dec_emb", "dec_trans"):
                if rest.startswith(emb + ".0."):
                    leaf = "kernel" if rest.endswith("weight") else "bias"
                    _set(out, ("transformer", emb, leaf),
                         _conv(val) if leaf == "kernel" else val)
                    break
            else:
                m = re.match(
                    r"(encoder|decoder)\.layer_norm\.(weight|bias)", rest)
                if m:
                    name = ("enc_in_ln" if m.group(1) == "encoder"
                            else "dec_in_ln")
                    _set(out, ("transformer", name, _norm_leaf(m.group(2))),
                         val)
                    continue
                m = re.match(r"(encoder|decoder)\.layer_stack\.(\d+)\."
                             r"(slf_attn|enc_attn|pos_ffn)\.(.+)", rest)
                if m:
                    side = "enc" if m.group(1) == "encoder" else "dec"
                    base = ("transformer", f"{side}_layer{m.group(2)}",
                            m.group(3))
                    subs = _FFN_SUBS if m.group(3) == "pos_ffn" else _MHA_SUBS
                    _match_subs(m.group(4), subs, base, out, val)
                    continue
            continue
        if parts[0] == "sk":
            rest = ".".join(parts[2:])
            branch = parts[1]
            mm = re.match(r"convs\.(\d)\.0\.(weight|bias)", rest)
            if mm:
                leaf = "kernel" if mm.group(2) == "weight" else "bias"
                _set(out, ("sk", branch, f"conv{mm.group(1)}", leaf),
                     _conv(val) if leaf == "kernel" else val)
                continue
            mm = re.match(r"(fc|sk)\.(weight|bias)", rest)
            if mm:
                # gate params exist only in sk_gate='fixed' models; kept in
                # the tree either way so overlay can skip them
                leaf = "kernel" if mm.group(2) == "weight" else "bias"
                _set(out, ("sk", branch, mm.group(1), leaf),
                     _linear(val) if leaf == "kernel" else val)
                continue
            continue
    return out


def load_pretrained(params, path):
    """Overlay a converted params pickle (tools/convert_torch_checkpoint.py
    output, a nested dict of arrays) onto freshly-initialized params.

    Partial trees are fine (backbone-only pretrains overlay just their
    subtree, like the reference's strict=False backbone load,
    resnet_sys_transformer_sk_dilat.py:379-394); keys absent from the init
    tree are ignored (e.g. sk-gate params of the other sk_gate flavor).
    Returns (params, n_loaded)."""
    import pickle

    import jax
    import jax.numpy as jnp

    with open(path, "rb") as f:
        loaded = pickle.load(f)

    n = [0]

    def rec(d, s, pre):
        for k, v in s.items():
            if k not in d:
                continue
            if isinstance(v, dict):
                if not isinstance(d[k], dict):
                    raise ValueError(
                        f"structure mismatch at '{pre + k}': the pickle has "
                        f"a subtree but the model has a leaf "
                        f"{getattr(d[k], 'shape', type(d[k]))}")
                rec(d[k], v, pre + k + "/")
            else:
                if isinstance(d[k], dict):
                    raise ValueError(
                        f"structure mismatch at '{pre + k}': the pickle has "
                        f"a leaf {v.shape} but the model has a subtree")
                assert d[k].shape == v.shape, (pre + k, d[k].shape, v.shape)
                d[k] = jnp.asarray(v)
                n[0] += 1

    params = jax.tree_util.tree_map(lambda x: x, params)  # fresh containers
    if not isinstance(params, dict):
        # older flax returns FrozenDict trees; tree_map preserves the
        # container type, and the in-place overlay below needs plain dicts
        import flax.core
        params = flax.core.unfreeze(params)
    rec(params, loaded, "")
    return params, n[0]
