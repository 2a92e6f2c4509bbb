"""Import harness for the reference's torch modules (/root/reference/lib).

Installs lightweight stubs for the reference's unavailable deps (easydict,
torchvision, terminaltables, progress bars, the compiled `model._C`
extension) so its pure-torch model code runs on CPU for numerics parity
tests.  Nothing here ships in the framework — test scaffolding only.
"""

import io
import os
import sys
import types

REF_LIB = "/root/reference/lib"


class _EasyDict(dict):
    def __init__(self, d=None, **kw):
        super().__init__()
        d = dict(d or {})
        d.update(kw)
        for k, v in d.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, _EasyDict):
            v = _EasyDict(v)
        super().__setitem__(k, v)
        super().__setattr__(k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _bbox_iou_xywh(dt, gt, iscrowd):
    """pycocotools _mask.iou for bbox lists ([x, y, w, h] rows): plain IoU,
    except crowd gt divide by the DETECTION area only (maskApi.c bbIou)."""
    import numpy as np

    dt = np.asarray(dt, np.float64).reshape(-1, 4)
    gt = np.asarray(gt, np.float64).reshape(-1, 4)
    if len(dt) == 0 or len(gt) == 0:
        return []
    crowd = np.asarray(iscrowd, np.uint8).astype(bool)
    ix1 = np.maximum(dt[:, None, 0], gt[None, :, 0])
    iy1 = np.maximum(dt[:, None, 1], gt[None, :, 1])
    ix2 = np.minimum(dt[:, None, 0] + dt[:, None, 2],
                     gt[None, :, 0] + gt[None, :, 2])
    iy2 = np.minimum(dt[:, None, 1] + dt[:, None, 3],
                     gt[None, :, 1] + gt[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    da = (dt[:, 2] * dt[:, 3])[:, None]
    ga = (gt[:, 2] * gt[:, 3])[None, :]
    union = np.where(crowd[None, :], da, da + ga - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-300), 0.0)


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_installed = False


def install():
    global _installed
    if _installed:
        return
    _installed = True
    if REF_LIB not in sys.path:
        sys.path.insert(0, REF_LIB)

    _module("easydict", EasyDict=_EasyDict)
    noop = lambda *a, **k: None
    _module("lib")
    _module("lib.ops")
    _module("lib.ops.utils", printer=noop, color=lambda *a, **k: "",
            mkdir=noop, AverageMeter=object)
    class _Bar:  # progress.bar API surface the reference touches
        def __init__(self, *a, **k):
            self.suffix = ""
            self.elapsed_td = self.eta_td = 0

        def next(self):
            pass

        def finish(self):
            pass

    _module("lib.utilities", Bar=_Bar, FillingSquaresBar=_Bar)
    class _Table:
        def __init__(self, *a, **k):
            self.justify_columns = {}
            self.table = ""

    _module("terminaltables", DoubleTable=_Table, AsciiTable=_Table,
            SingleTable=_Table)

    # torchvision: only `torchvision.models` is imported, never called on
    # the paths we exercise
    tv = _module("torchvision")
    tv.models = _module("torchvision.models")

    # compiled extension: never called in CPU-side module construction
    _module("model._C", nms=noop, roi_align_forward=noop,
            roi_align_backward=noop, roi_pool_forward=noop,
            roi_pool_backward=noop)

    # vendored pycocotools' Cython _mask isn't built; datasets.factory
    # imports datasets.coco -> pycocotools.coco -> .mask at module level.
    # bbox-mode COCOeval calls exactly one of these — iou on [x,y,w,h]
    # box lists (maskApi.c bbIou semantics incl. the crowd union) — so
    # provide it for real; everything mask-typed stays inert (the live
    # reference surface is bbox-only).
    _module("pycocotools._mask", iou=_bbox_iou_xywh, merge=noop,
            frPyObjects=noop, encode=noop, decode=noop, area=noop,
            toBbox=noop)

    # module-level `stty size` calls need a tty
    real_popen = os.popen
    os.popen = lambda *a, **k: io.StringIO("24 80")

    # Capture the reference cfg's import-time defaults BEFORE any test can
    # mutate the global EasyDict (tests set ANCHOR_SCALES, NMS tops, ... and
    # used to leak them into later tests — an order-dependent failure the
    # round-4 verdict root-caused).  conftest restores after every test.
    global _CFG_PRISTINE
    if _CFG_PRISTINE is None:
        from model.utils.config import cfg
        _CFG_PRISTINE = _plain_tree(cfg)
    return real_popen


def restore_popen(real_popen):
    if real_popen is not None:
        os.popen = real_popen


# ---------------------------------------------------------------------------
# Reference-cfg isolation: snapshot at install(), restore after each test
# ---------------------------------------------------------------------------

_CFG_PRISTINE = None


def _plain_tree(d):
    import copy
    return {k: _plain_tree(v) if isinstance(v, dict) else copy.deepcopy(v)
            for k, v in d.items()}


def _restore_into(ed, snap):
    import copy
    for k in list(ed.keys()):
        if k not in snap:
            dict.__delitem__(ed, k)
            ed.__dict__.pop(k, None)
    for k, v in snap.items():
        if isinstance(v, dict) and isinstance(ed.get(k), dict):
            _restore_into(ed[k], v)
        else:
            ed[k] = copy.deepcopy(v)


def restore_cfg():
    """Reset the reference's global cfg EasyDict (in place — every module
    that did `from model.utils.config import cfg` holds the same object) to
    its import-time defaults.  No-op until install() has run."""
    if _CFG_PRISTINE is None or "model.utils.config" not in sys.modules:
        return
    from model.utils.config import cfg
    _restore_into(cfg, _CFG_PRISTINE)
