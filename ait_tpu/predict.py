"""High-level one-shot inference API.

The reference has no serving surface — users re-purpose test_net_*.py.  This
is the "switch-over" API: load a run directory (or raw params), then

    predictor = OneShotPredictor.from_run("models/res50/pascal_voc/1.0.0")
    dets = predictor.predict(image_rgb_uint8, query_rgb_uint8, query_box)

returns [N, 5] (x1, y1, x2, y2, score) detections of the query's class in
original image coordinates.  Batched `predict_batch` amortizes the fixed
canvas over many pairs; everything device-side runs in one jit.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ait_tpu.config import Config
from ait_tpu.data.transforms import (crop_query, place_on_canvas, prep_image,
                                     to_rgb3)
from ait_tpu.evaluation import postprocess_detections
from ait_tpu.models import AITDetector
from ait_tpu.train import init_params, make_eval_step


class OneShotPredictor:
    def __init__(self, cfg: Config, params, *, score_thresh: float = 0.0,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        self.model = AITDetector(cfg, dtype=dtype)
        self.params = params
        self._eval = jax.jit(make_eval_step(self.model))
        t = cfg.TEST
        self._post = jax.jit(lambda r, c, b, ii: postprocess_detections(
            r, c, b, ii, nms_thresh=t.NMS, score_thresh=score_thresh,
            max_per_image=t.MAX_PER_IMAGE,
            bbox_normalize_means=cfg.TRAIN.BBOX_NORMALIZE_MEANS,
            bbox_normalize_stds=cfg.TRAIN.BBOX_NORMALIZE_STDS))

    # ------------------------------------------------------------------
    @classmethod
    def from_run(cls, run_dir: str, **kw) -> "OneShotPredictor":
        """Load config.json + the latest orbax checkpoint of a training run."""
        from ait_tpu.train import TrainState, lr_schedule, make_optimizer
        from ait_tpu.train.checkpoint import CheckpointManager

        cfg_path = os.path.join(run_dir, "config.json")
        cfg = Config()
        if os.path.exists(cfg_path):
            cfg = _config_from_json(json.load(open(cfg_path)))
        params = init_params(AITDetector(cfg, dtype=jnp.bfloat16), cfg,
                             jax.random.PRNGKey(0))
        ckpt_dir = os.path.join(run_dir, "ckpt")
        if os.path.isdir(ckpt_dir):
            tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
            mgr = CheckpointManager(ckpt_dir)
            restored = mgr.restore(TrainState.create(params, tx))
            if restored is not None:
                params = restored.params
        return cls(cfg, params, **kw)

    @classmethod
    def from_converted_checkpoint(cls, pkl_path: str,
                                  cfg: Optional[Config] = None,
                                  **kw) -> "OneShotPredictor":
        """Load params converted from a reference .pth
        (tools/convert_torch_checkpoint.py)."""
        import pickle

        cfg = cfg or Config()
        params = init_params(AITDetector(cfg, dtype=jnp.bfloat16), cfg,
                             jax.random.PRNGKey(0))
        with open(pkl_path, "rb") as f:
            loaded = pickle.load(f)

        def overlay(dst, src):
            for k, v in src.items():
                if k in dst:
                    if isinstance(v, dict):
                        overlay(dst[k], v)
                    else:
                        dst[k] = jnp.asarray(v)
        overlay(params, loaded)
        return cls(cfg, params, **kw)

    # ------------------------------------------------------------------
    def _prep_pair(self, image, query_image, query_box):
        image = to_rgb3(np.asarray(image))
        im, scale = prep_image(image, self.cfg.TEST.SCALES[0],
                               max_hw=self.cfg.tpu.image_size,
                               keep_uint8=self.cfg.tpu.input_uint8)
        h, w = im.shape[:2]
        canvas = place_on_canvas(im, self.cfg.tpu.image_size)
        q = crop_query(to_rgb3(np.asarray(query_image)), query_box,
                       self.cfg.TRAIN.query_size)
        if not self.cfg.tpu.input_uint8:
            from ait_tpu.data.transforms import normalize
            q = normalize(q)
        return canvas, q, np.array([h, w, scale], np.float32)

    def predict_batch(self, pairs: Sequence[Tuple]) -> List[np.ndarray]:
        """pairs: [(image, query_image, query_box)] -> list of [N, 5] dets."""
        canvases, queries, infos = zip(*[self._prep_pair(*p) for p in pairs])
        g = self.cfg.MAX_NUM_GT_BOXES
        b = len(pairs)
        batch = {
            "image": jnp.asarray(np.stack(canvases)),
            "query": jnp.asarray(np.stack(queries)),
            "im_info": jnp.asarray(np.stack(infos)),
            "gt_boxes": jnp.zeros((b, g, 5), jnp.float32),
            "num_boxes": jnp.zeros((b,), jnp.int32),
        }
        out = self._eval(self.params, batch)
        dets, valid = self._post(out["rois"], out["cls_prob"],
                                 out["bbox_pred"], batch["im_info"])
        dets = np.asarray(dets)
        valid = np.asarray(valid)
        return [dets[i][valid[i]] for i in range(b)]

    def predict(self, image, query_image, query_box) -> np.ndarray:
        """One (target image, query crop) pair -> [N, 5] detections."""
        return self.predict_batch([(image, query_image, query_box)])[0]


def _config_from_json(doc: dict) -> Config:
    """Rebuild a Config from save_config's json (lists -> tuples)."""
    import dataclasses

    def rebuild(template, d):
        kw = {}
        for f in dataclasses.fields(template):
            if f.name not in d:
                continue
            cur = getattr(template, f.name)
            v = d[f.name]
            if dataclasses.is_dataclass(cur):
                kw[f.name] = rebuild(cur, v)
            elif isinstance(cur, tuple):
                kw[f.name] = tuple(v)
            else:
                kw[f.name] = v
        return dataclasses.replace(template, **kw)

    return rebuild(Config(), doc)
