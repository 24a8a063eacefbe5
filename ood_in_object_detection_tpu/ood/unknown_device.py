"""Device-side (jitted, batched) EUL front-end: saliency summarization and
histogram thresholding for the whole batch in ONE compiled call.

The reference computes the EUL saliency map and its Otsu thresholds per image
on the host (unknown_localization_utils.py:45-200 driven by
ood_utils.py:641-735) — numpy reductions over the (C, H, W) stride-8 map plus
recursive histogram Otsu. Profiling our host port shows those two stages are
~2/3 of the EUL cost per image; both are pure dense math, so the TPU-native
design moves them on-device and batches them:

- every saliency summarizer is a per-pixel channel reduction, except that the
  ``ftmap_minus_mean*`` / ``*_absolute_deviation`` families subtract the mean
  over the *unpadded* crop — per-image letterbox pads make the crop a dynamic
  shape, so the batched kernel uses a padding mask and a masked mean instead
  (identical values inside the crop; the padded border rows are cropped on
  the host before use),
- Otsu becomes *weighted* Otsu: the recursive split tree
  (unknown_localization_utils.py:175-200) is unrolled statically (the depth is
  a hyperparameter) and each node carries a {0,1} weight vector over the flat
  saliency instead of a data-dependent subset — same histogram, same
  inter-class-variance argmax, static shapes throughout. Degenerate nodes
  (empty / zero-ptp, the host recursion's stop condition) emit NaN and zero
  out their subtree's weights; the host drops NaNs and dedups, exactly like
  ``sorted(set(...))`` in the host path.
- quantile thresholding is a masked sort + linear interpolation (numpy
  'linear' quantile semantics).

Connected components -> boxes stays on the host (scipy.ndimage.label is
~0.3 ms per 80x80 mask and inherently sequential); only the (B, H, W)
saliency and (B, T) thresholds cross the wire instead of the (B, H, W, C)
P3 map when the caller does not otherwise need P3.

multithreshold_otsu / k_means / fast_otsu have no device path (exhaustive
combinatorics / sklearn); ``eul_frontend_batched`` in ``unknown.py`` falls
back to the host implementations for those.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NBINS = 256  # host threshold_otsu / np.histogram default used in unknown.py

DEVICE_SUMMARIZERS = frozenset({
    "ftmap_minus_mean_of_ftmaps_then_abs_sum",
    "ftmap_minus_mean_of_ftmaps_then_sum",
    "sum_of_ftmaps",
    "std_of_ftmaps",
    "iqr_of_ftmaps",
    "mean_absolute_deviation_of_ftmaps",
    "median_absolute_deviation_of_ftmaps",
})
DEVICE_THRESHOLDERS = frozenset({"recursive_otsu", "quantile"})


def _grid_mask(pad_xy: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, 2) int (px, py) letterbox pads (in stride-8 cells) -> (B, H, W)
    bool mask of the unpadded crop ``[py : H - py, px : W - px]``."""
    px = pad_xy[:, 0][:, None, None]
    py = pad_xy[:, 1][:, None, None]
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    return (ys >= py) & (ys < H - py) & (xs >= px) & (xs < W - px)


def _summarize(f: jnp.ndarray, mask: jnp.ndarray, name: str) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W) saliency; mean-subtracting summarizers use
    the masked (crop) mean. Values outside the mask are garbage-by-design —
    the host crops them away before thresholding/boxes."""
    m3 = mask[..., None].astype(f.dtype)
    cnt = jnp.maximum(m3.sum(axis=(1, 2)), 1.0)          # (B, 1)
    mean = ((f * m3).sum(axis=(1, 2)) / cnt)[:, None, None, :]
    if name == "ftmap_minus_mean_of_ftmaps_then_abs_sum":
        return jnp.abs(f - mean).sum(-1)
    if name == "ftmap_minus_mean_of_ftmaps_then_sum":
        return (f - mean).sum(-1)
    if name == "sum_of_ftmaps":
        return f.sum(-1)
    if name == "std_of_ftmaps":
        return f.std(-1)
    if name == "iqr_of_ftmaps":
        return (jnp.percentile(f, 75, axis=-1)
                - jnp.percentile(f, 25, axis=-1))
    if name == "mean_absolute_deviation_of_ftmaps":
        return jnp.abs(f - mean).mean(-1)
    if name == "median_absolute_deviation_of_ftmaps":
        y = f - mean
        med = jnp.median(y, axis=-1, keepdims=True)
        return jnp.median(jnp.abs(y - med), axis=-1)
    raise ValueError(f"no device summarizer: {name}")


def _otsu_weighted(vals: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 256-bin Otsu over ``vals`` (flat f32) with {0,1} weights.

    Same definition as the host ``threshold_otsu`` (maximize inter-class
    variance, return the left bin center) with np.histogram's binning: edges
    linspace(lo, hi, NBINS+1), right edge inclusive. Returns NaN when the
    weighted subset is empty or constant (the host recursion's stop)."""
    inf = jnp.float32(jnp.inf)
    lo = jnp.min(jnp.where(w > 0, vals, inf))
    hi = jnp.max(jnp.where(w > 0, vals, -inf))
    n = w.sum()
    span = hi - lo
    safe = jnp.where(span > 0, span, 1.0)
    idx = jnp.clip(
        jnp.floor((vals - lo) / safe * NBINS), 0, NBINS - 1
    ).astype(jnp.int32)
    counts = jnp.zeros((NBINS,), jnp.float32).at[idx].add(w)
    edges = lo + span * jnp.arange(NBINS + 1, dtype=jnp.float32) / NBINS
    centers = (edges[:-1] + edges[1:]) * 0.5
    w1 = jnp.cumsum(counts)
    w2 = jnp.cumsum(counts[::-1])[::-1]
    cm = jnp.cumsum(counts * centers)
    m1 = cm / jnp.maximum(w1, 1e-12)
    m2 = (jnp.cumsum((counts * centers)[::-1])
          / jnp.maximum(w2[::-1], 1e-12))[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    t = jnp.take(centers[:-1], jnp.argmax(var12))
    return jnp.where((n > 0) & (span > 0), t, jnp.nan)


def _recursive_otsu(vals: jnp.ndarray, mask: jnp.ndarray,
                    num_classes: int) -> jnp.ndarray:
    """Statically unrolled recursive-Otsu tree (host ``recursive_otsu``):
    depth d in [1, num_classes-2] has 2^(d-1) nodes; each node thresholds its
    weighted subset and splits it <=t / >t. Returns all 2^(num_classes-2)-1
    node thresholds (NaN for degenerate nodes) in tree order — the host
    sorts/dedups/drops-NaN, matching ``sorted(set(thresholds))``."""
    thrs = []
    nodes = [mask.astype(jnp.float32)]
    for _depth in range(1, max(num_classes - 1, 1)):
        nxt = []
        for w in nodes:
            t = _otsu_weighted(vals, w)
            thrs.append(t)
            ok = jnp.isfinite(t).astype(jnp.float32)
            tt = jnp.where(jnp.isfinite(t), t, 0.0)
            nxt.append(w * (vals <= tt).astype(jnp.float32) * ok)
            nxt.append(w * (vals > tt).astype(jnp.float32) * ok)
        nodes = nxt
    if not thrs:
        return jnp.full((1,), jnp.nan, jnp.float32)
    return jnp.stack(thrs)


def _quantile_thresholds(vals: jnp.ndarray, mask: jnp.ndarray,
                         num_quantiles: int) -> jnp.ndarray:
    """Masked np.quantile('linear') of the interior quantiles (host
    ``quantile_thresholding``): sort with masked values pushed to +inf, then
    interpolate at q*(n-1) over the n valid leading entries."""
    qs = jnp.linspace(0.0, 1.0, num_quantiles + 1)[1:-1]
    n = mask.sum().astype(jnp.float32)
    s = jnp.sort(jnp.where(mask, vals, jnp.inf))
    pos = qs * jnp.maximum(n - 1.0, 0.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    out = s[lo] * (1.0 - frac) + s[hi] * frac
    return jnp.where(n > 0, out, jnp.nan)


def _compute_saliency_thresholds(p3, pad_xy, summarizer, method,
                                 num_thresholds):
    B, H, W, _ = p3.shape
    mask = _grid_mask(pad_xy, H, W)
    sal = _summarize(p3.astype(jnp.float32), mask, summarizer)
    flat = sal.reshape(B, -1)
    fmask = mask.reshape(B, -1)
    nclasses = num_thresholds + 1
    if method == "recursive_otsu":
        thr = jax.vmap(lambda v, m: _recursive_otsu(v, m, nclasses))(flat, fmask)
    elif method == "quantile":
        thr = jax.vmap(
            lambda v, m: _quantile_thresholds(v, m, nclasses))(flat, fmask)
    else:
        raise ValueError(f"no device thresholder: {method}")
    return sal, thr


@functools.partial(
    jax.jit, static_argnames=("summarizer", "method", "num_thresholds"))
def eul_frontend(p3: jnp.ndarray, pad_xy: jnp.ndarray, *, summarizer: str,
                 method: str, num_thresholds: int):
    """Batched device EUL front-end (saliency + thresholds).

    p3: (B, H, W, C) stride-8 neck features (padded letterbox layout).
    pad_xy: (B, 2) int32 (px, py) pads in stride-8 cells.
    Returns (saliency (B, H, W) f32, thresholds (B, T) f32 NaN-padded).
    ``num_thresholds`` is the user hyperparameter; the class count handed to
    the thresholder is num_thresholds+1 (host ``select_thresholding``)."""
    return _compute_saliency_thresholds(p3, pad_xy, summarizer, method,
                                        num_thresholds)


@functools.partial(
    jax.jit, static_argnames=("summarizer", "method", "num_thresholds"))
def eul_frontend_masks(p3: jnp.ndarray, pad_xy: jnp.ndarray, *,
                       summarizer: str, method: str, num_thresholds: int):
    """Like ``eul_frontend`` but finishes the threshold COMPARE on device and
    emits bit-packed binary masks instead of the f32 saliency — 32x less
    wire traffic, which matters when the host link is a high-latency tunnel.

    Returns (packed (B, T, H, ceil(W/8)) uint8 — saliency > thr, MSB-first
    np.packbits layout; thr (B, T) f32 ascending with +inf padding for
    degenerate/missing node thresholds)."""
    B, H, W, _ = p3.shape
    sal, thr = _compute_saliency_thresholds(p3, pad_xy, summarizer, method,
                                            num_thresholds)
    thr = jnp.sort(jnp.where(jnp.isfinite(thr), thr, jnp.inf), axis=1)
    masks = sal[:, None] > thr[:, :, None, None]            # (B, T, H, W)
    Wp = -(-W // 8) * 8
    if Wp != W:
        masks = jnp.pad(masks, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
    bits = masks.reshape(B, thr.shape[1], H, Wp // 8, 8).astype(jnp.uint8)
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    packed = (bits * weights).sum(-1).astype(jnp.uint8)
    return packed, thr
