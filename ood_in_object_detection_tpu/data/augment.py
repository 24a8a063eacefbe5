"""Training augmentations (host-side NumPy).

Capability parity with the reference train-time transform stack
(ultralytics/data/augment.py): 4-image mosaic on a 2S canvas, random
scale/translate crop back to S (the core of RandomPerspective with the
default degrees=0/shear=0/perspective=0), HSV jitter (hgain 0.015,
sgain 0.7, vgain 0.4), horizontal flip p=0.5, and the trainer's
close_mosaic window (mosaic disabled for the final epochs,
cfg/default.yaml close_mosaic=10).

Boxes are cxcywh-normalized in, xyxy-pixel out (matching PaddedBatcher).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from .dataset import DetectionDataset, Label
from .letterbox import PAD_VALUE


@dataclass
class AugmentConfig:
    mosaic: float = 1.0
    scale: float = 0.5       # random scale in [1-s, 1+s]
    translate: float = 0.1
    fliplr: float = 0.5
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    close_mosaic: int = 10


def _load_rgb(label: Label) -> np.ndarray:
    from PIL import Image

    with Image.open(label.im_file) as im:
        return np.asarray(im.convert("RGB"))


def _boxes_xyxy_abs(label: Label) -> np.ndarray:
    h, w = label.shape
    if not label.bboxes.size:
        return np.empty((0, 4), np.float32)
    cx, cy, bw, bh = (label.bboxes[:, i] for i in range(4))
    return np.stack([(cx - bw / 2) * w, (cy - bh / 2) * h,
                     (cx + bw / 2) * w, (cy + bh / 2) * h], 1).astype(np.float32)


def mosaic4(ds: DetectionDataset, idxs: List[int], img_size: int,
            rng: np.random.Generator):
    """4-image mosaic on a (2S, 2S) canvas (reference augment.py Mosaic):
    random centre in [S/2, 3S/2]^2, each image letterbox-free pasted at its
    corner. Returns canvas, boxes xyxy, cls."""
    s = img_size
    canvas = np.full((2 * s, 2 * s, 3), PAD_VALUE, np.uint8)
    yc = int(rng.uniform(s * 0.5, s * 1.5))
    xc = int(rng.uniform(s * 0.5, s * 1.5))
    boxes_all, cls_all = [], []
    for k, idx in enumerate(idxs[:4]):
        lb = ds.labels[idx]
        img = _load_rgb(lb)
        h, w = img.shape[:2]
        r = min(s / h, s / w)
        nh, nw = int(h * r), int(w * r)
        if (nh, nw) != (h, w):
            from PIL import Image

            img = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
        if k == 0:   # top-left
            x1a, y1a = max(xc - nw, 0), max(yc - nh, 0)
            x2a, y2a = xc, yc
            x1b, y1b = nw - (x2a - x1a), nh - (y2a - y1a)
        elif k == 1:  # top-right
            x1a, y1a = xc, max(yc - nh, 0)
            x2a, y2a = min(xc + nw, 2 * s), yc
            x1b, y1b = 0, nh - (y2a - y1a)
        elif k == 2:  # bottom-left
            x1a, y1a = max(xc - nw, 0), yc
            x2a, y2a = xc, min(yc + nh, 2 * s)
            x1b, y1b = nw - (x2a - x1a), 0
        else:         # bottom-right
            x1a, y1a = xc, yc
            x2a, y2a = min(xc + nw, 2 * s), min(yc + nh, 2 * s)
            x1b, y1b = 0, 0
        canvas[y1a:y2a, x1a:x2a] = img[y1b : y1b + (y2a - y1a), x1b : x1b + (x2a - x1a)]
        b = _boxes_xyxy_abs(lb) * r
        if len(b):
            b[:, [0, 2]] += x1a - x1b
            b[:, [1, 3]] += y1a - y1b
            boxes_all.append(b)
            cls_all.append(lb.cls)
    boxes = np.concatenate(boxes_all) if boxes_all else np.empty((0, 4), np.float32)
    cls = np.concatenate(cls_all) if cls_all else np.empty(0, np.float32)
    return canvas, boxes, cls


def random_scale_translate(img: np.ndarray, boxes: np.ndarray, img_size: int,
                           scale: float, translate: float,
                           rng: np.random.Generator):
    """Random zoom + shift cropping the (2S or S) canvas to (S, S)
    (reference RandomPerspective with default rotation/shear off)."""
    from PIL import Image

    s = img_size
    h, w = img.shape[:2]
    r = rng.uniform(1 - scale, 1 + scale)
    # centre offset of the source window, in output pixels
    tx = rng.uniform(0.5 - translate, 0.5 + translate) * 2 - 1  # [-2t, 2t]
    ty = rng.uniform(0.5 - translate, 0.5 + translate) * 2 - 1
    nw, nh = int(w * r), int(h * r)
    big = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
    b = boxes * r
    # window top-left so the canvas centre (plus jitter) lands at the output centre
    ox = int((nw - s) / 2 + tx * s)
    oy = int((nh - s) / 2 + ty * s)
    out = np.full((s, s, 3), PAD_VALUE, np.uint8)
    sx1, sy1 = max(ox, 0), max(oy, 0)
    sx2, sy2 = min(ox + s, nw), min(oy + s, nh)
    if sx2 > sx1 and sy2 > sy1:
        out[sy1 - oy : sy2 - oy, sx1 - ox : sx2 - ox] = big[sy1:sy2, sx1:sx2]
    if len(b):
        b = b.copy()
        b[:, [0, 2]] -= ox
        b[:, [1, 3]] -= oy
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, s)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, s)
    return out, b


def filter_degenerate(boxes: np.ndarray, cls: np.ndarray, min_wh: float = 2.0):
    if not len(boxes):
        return boxes, cls
    wh_ok = (boxes[:, 2] - boxes[:, 0] > min_wh) & (boxes[:, 3] - boxes[:, 1] > min_wh)
    return boxes[wh_ok], cls[wh_ok]


def hsv_jitter(img: np.ndarray, hgain: float, sgain: float, vgain: float,
               rng: np.random.Generator) -> np.ndarray:
    """HSV gains (reference augment.py RandomHSV, cv2-free implementation)."""
    import colorsys  # noqa: F401  (documented intent; vectorized below)

    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    x = img.astype(np.float32) / 255.0
    mx = x.max(-1)
    mn = x.min(-1)
    v = mx
    s = np.where(mx > 0, (mx - mn) / np.maximum(mx, 1e-12), 0)
    c = mx - mn
    safe = np.maximum(c, 1e-12)
    rch, g, bch = x[..., 0], x[..., 1], x[..., 2]
    h = np.where(mx == rch, ((g - bch) / safe) % 6,
                 np.where(mx == g, (bch - rch) / safe + 2, (rch - g) / safe + 4)) / 6
    h = (h * r[0]) % 1.0
    s = np.clip(s * r[1], 0, 1)
    v = np.clip(v * r[2], 0, 1)
    i = np.floor(h * 6).astype(int) % 6
    f = h * 6 - np.floor(h * 6)
    p = v * (1 - s); q = v * (1 - f * s); t = v * (1 - (1 - f) * s)
    conds = [(i == k)[..., None] for k in range(6)]
    rgb = np.select(
        conds,
        [np.stack([v, t, p], -1), np.stack([q, v, p], -1), np.stack([p, v, t], -1),
         np.stack([p, q, v], -1), np.stack([t, p, v], -1), np.stack([v, p, q], -1)])
    return (rgb * 255).astype(np.uint8)


def augmented_sample(ds: DetectionDataset, idx: int, img_size: int,
                     cfg: AugmentConfig, rng: np.random.Generator,
                     use_mosaic: bool = True):
    """One training sample: (image u8 (S,S,3), boxes xyxy (N,4), cls (N,))."""
    if use_mosaic and rng.uniform() < cfg.mosaic:
        others = rng.integers(0, len(ds), 3).tolist()
        canvas, boxes, cls = mosaic4(ds, [idx] + others, img_size, rng)
        img, boxes = random_scale_translate(canvas, boxes, img_size,
                                            cfg.scale, cfg.translate, rng)
    else:
        from .letterbox import letterbox_np

        lb = ds.labels[idx]
        img, ratio_pad = letterbox_np(_load_rgb(lb), (img_size, img_size))
        (r, _), (dw, dh) = ratio_pad
        boxes = _boxes_xyxy_abs(lb) * r
        if len(boxes):
            boxes[:, [0, 2]] += dw
            boxes[:, [1, 3]] += dh
        cls = ds.labels[idx].cls
    boxes, cls = filter_degenerate(boxes, cls)
    img = hsv_jitter(img, cfg.hsv_h, cfg.hsv_s, cfg.hsv_v, rng)
    if rng.uniform() < cfg.fliplr:
        img = img[:, ::-1]
        if len(boxes):
            boxes = boxes.copy()
            x1 = img_size - boxes[:, 2]
            x2 = img_size - boxes[:, 0]
            boxes[:, 0], boxes[:, 2] = x1, x2
    return np.ascontiguousarray(img), boxes, cls


class AugmentedTrainBatcher:
    """Shuffled, augmented fixed-shape batches for training (reference
    build_dataloader + YOLODataset train transforms). ``epoch``/``epochs``
    drive close_mosaic."""

    def __init__(self, ds: DetectionDataset, batch_size: int, img_size: int,
                 max_gt: int = 128, cfg: Optional[AugmentConfig] = None,
                 epochs: int = 100, seed: int = 0):
        self.ds = ds
        self.bs = batch_size
        self.img_size = img_size
        self.max_gt = max_gt
        self.cfg = cfg or AugmentConfig()
        self.epochs = epochs
        self.epoch = 0
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return max(len(self.ds) // self.bs, 1)

    def __iter__(self):
        use_mosaic = self.epoch < self.epochs - self.cfg.close_mosaic
        order = self._rng.permutation(len(self.ds))
        S = self.img_size
        for start in range(0, len(order) - self.bs + 1, self.bs):
            B = self.bs
            images = np.zeros((B, S, S, 3), np.float32)
            gtb = np.zeros((B, self.max_gt, 4), np.float32)
            gtc = np.zeros((B, self.max_gt), np.int32)
            gtm = np.zeros((B, self.max_gt), bool)
            for j in range(B):
                img, boxes, cls = augmented_sample(
                    self.ds, int(order[start + j]), S, self.cfg, self._rng, use_mosaic)
                images[j] = img.astype(np.float32) / 255.0
                m = min(len(boxes), self.max_gt)
                gtb[j, :m] = boxes[:m]
                gtc[j, :m] = cls[:m].astype(np.int32)
                gtm[j, :m] = True
            yield dict(images=images, gt_bboxes=gtb, gt_labels=gtc, gt_mask=gtm)
        self.epoch += 1
