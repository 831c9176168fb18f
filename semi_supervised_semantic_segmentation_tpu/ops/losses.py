"""Loss functions for supervised + semi-supervised segmentation.

Rebuilds (TPU-native, pure functions over jnp arrays):
  - C11 supervised pixel CE with ignore_index (reference:
    ``F.cross_entropy(..., ignore_index=255)``).
  - C13 Mean-Teacher MSE consistency between student/teacher softmax.
  - C14 confidence-masked pseudo-label CE (FixMatch-style).
  - C15 cross-pseudo-supervision loss (two nets supervise each other).

All losses compute in float32 regardless of the model's compute dtype, and
every reduction is a jit-safe masked mean (no dynamic shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``x`` over elements where ``mask`` is True; 0 if mask empty."""
    mask = mask.astype(jnp.float32)
    total = jnp.sum(x * mask)
    count = jnp.sum(mask)
    return total / jnp.maximum(count, 1.0)


def _pick_label_logp(logp: jnp.ndarray, labels_safe: jnp.ndarray) -> jnp.ndarray:
    """log p[label] per pixel WITHOUT a gather.

    ``take_along_axis`` lowers to a per-pixel gather that serializes on TPU
    (profiled at ~45% of a 512² train step); the one-hot select fuses into
    an elementwise mask + small-axis reduction on the VPU instead.
    """
    classes = jax.lax.broadcasted_iota(jnp.int32, logp.shape, logp.ndim - 1)
    sel = jnp.where(classes == labels_safe[..., None], logp, 0.0)
    return jnp.sum(sel, axis=-1)


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    extra_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pixel cross-entropy with ignore-index, averaged over valid pixels.

    Matches torch ``F.cross_entropy(logits, labels, ignore_index=...)`` with
    default ``reduction='mean'`` semantics (mean over non-ignored pixels).

    Args:
      logits: (..., C) float logits (any float dtype; upcast internally).
      labels: (...) integer labels in [0, C) or == ignore_index.
      extra_mask: optional (...) boolean/float mask; pixels where it is
        False/0 are excluded from the mean *numerator and denominator is the
        full valid count* — see ``confidence_masked_ce`` for FixMatch
        normalization. Here it simply intersects with the validity mask.
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    if extra_mask is not None:
        valid = jnp.logical_and(valid, extra_mask.astype(bool))
    labels_safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = _pick_label_logp(logp, labels_safe)
    return _masked_mean(-ll, valid)


def confidence_masked_ce(
    logits: jnp.ndarray,
    pseudo_labels: jnp.ndarray,
    conf_mask: jnp.ndarray,
    ignore_index: int = 255,
    normalize: str = "all",
) -> jnp.ndarray:
    """FixMatch-style CE on pseudo-labeled pixels above the confidence bar.

    Args:
      logits: (..., C) student logits on the strong view.
      pseudo_labels: (...) int teacher argmax labels (may contain
        ignore_index where CutMix pasted padded regions).
      conf_mask: (...) bool, True where teacher max-prob > tau.
      normalize: "all" divides by the count of *valid* pixels (standard
        FixMatch — low-confidence pixels contribute 0 to the numerator but
        still count in the denominator, so the loss scale anneals with mask
        rate); "masked" divides by the count of confident pixels only.
    """
    logits = logits.astype(jnp.float32)
    valid = pseudo_labels != ignore_index
    keep = jnp.logical_and(valid, conf_mask.astype(bool))
    labels_safe = jnp.where(keep, pseudo_labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = _pick_label_logp(logp, labels_safe)
    loss = -ll * keep.astype(jnp.float32)
    if normalize == "all":
        denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        return jnp.sum(loss) / denom
    return _masked_mean(-ll, keep)


def mse_consistency(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    valid_mask: jnp.ndarray | None = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Mean-Teacher softmax MSE consistency.

    ``reduction='mean'`` matches torch ``F.mse_loss(softmax(s), softmax(t))``
    (mean over every element, classes included); ``'classes'`` sums over the
    class axis then averages over pixels (the other common convention).
    """
    ps = jax.nn.softmax(student_logits.astype(jnp.float32), axis=-1)
    pt = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    sq = (ps - pt) ** 2
    if valid_mask is None:
        if reduction == "mean":
            return jnp.mean(sq)
        return jnp.mean(jnp.sum(sq, axis=-1))
    m = valid_mask.astype(jnp.float32)[..., None]
    if reduction == "mean":
        denom = jnp.maximum(jnp.sum(m) * sq.shape[-1], 1.0)
        return jnp.sum(sq * m) / denom
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(sq * m) / denom


def cps_loss(
    logits1: jnp.ndarray,
    logits2: jnp.ndarray,
    ignore_index: int = 255,
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Cross-pseudo-supervision: each net is CE-supervised by the other's
    hard argmax pseudo-labels (stop-gradient on the labels).

    loss = CE(p1, sg(argmax p2)) + CE(p2, sg(argmax p1))

    ``valid_mask``: optional (...) bool geometric-content mask from the weak
    aug; False pixels (mean-fill padding outside the scaled image) are
    excluded from both CE terms — argmax pseudo-labels would otherwise
    supervise fake content.
    """
    y1 = jax.lax.stop_gradient(jnp.argmax(logits1, axis=-1))
    y2 = jax.lax.stop_gradient(jnp.argmax(logits2, axis=-1))
    return cross_entropy(logits1, y2, ignore_index, extra_mask=valid_mask) + cross_entropy(
        logits2, y1, ignore_index, extra_mask=valid_mask
    )


def pseudo_labels_from_logits(
    teacher_logits: jnp.ndarray, conf_thresh: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher logits -> (argmax pseudo-labels, confidence mask).

    Pseudo-labels = argmax over classes; mask = max softmax prob > tau.
    All on-device, no host round-trip (BASELINE.json:5).
    """
    probs = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    conf = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    return labels, conf > conf_thresh


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    thresh: float = 0.7,
    min_kept: int = 100000,
) -> jnp.ndarray:
    """Online hard example mining CE (the Cityscapes recipe of the CPS/HRNet
    reference lineage): keep pixels whose true-class probability is below
    ``max(thresh, p_k)`` where ``p_k`` is the ``min(min_kept, n_valid-1)``-th
    smallest true-class probability — i.e. always mine at least ~min_kept of
    the hardest pixels — and average CE over the kept set.

    Exactly mirrors the official OhemCrossEntropy (sort ascending by
    true-class prob; index min(min_kept, numel-1); strict ``p < threshold``
    filter).  The sort only feeds ONE order statistic, so instead of a
    device-wide sort (8.5/16 ms per step on configs 5/4) ``p_k`` comes from
    ``_kth_smallest_nonneg_f32`` — a 32-step exact binary search on the
    IEEE bit space (static-shape, ~32 cheap counting reductions).
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    labels_safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = _pick_label_logp(logp, labels_safe)
    pix_loss = jnp.where(valid, -ll, 0.0)
    p_true = jnp.exp(ll)

    flat_p = jnp.where(valid, p_true, jnp.inf).reshape(-1)
    n_valid = jnp.sum(valid)
    idx = jnp.clip(jnp.minimum(min_kept, n_valid - 1), 0, flat_p.shape[0] - 1)
    p_k = _kth_smallest_nonneg_f32(flat_p, idx)
    threshold = jnp.maximum(p_k, thresh)
    kept = valid & (p_true < threshold)
    denom = jnp.maximum(jnp.sum(kept), 1)
    return jnp.sum(pix_loss * kept) / denom


def _kth_smallest_nonneg_f32(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Exact k-th smallest (0-based) of a flat array of NON-NEGATIVE f32
    values (+inf allowed).  For x >= 0 the IEEE-754 bit pattern is monotone
    in the value, so the k-th order statistic is found by a 32-step binary
    search over the uint32 bit space, each step one counting reduction —
    O(32 n) elementwise work with NO data movement, vs the O(n log n)
    device-wide ``jnp.sort`` it replaces (equality tested vs sort in
    tests/test_losses.py).
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rank = (k + 1).astype(jnp.uint32)  # smallest u with count(bits<=u)>=rank

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // jnp.uint32(2)
        cnt = jnp.sum((bits <= mid).astype(jnp.int32)).astype(jnp.uint32)
        take = cnt >= rank
        return (jnp.where(take, lo, mid + jnp.uint32(1)),
                jnp.where(take, mid, hi))

    lo0 = jnp.uint32(0)
    hi0 = jnp.uint32(0x7F800000)  # +inf: the largest value present
    lo, _ = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    return jax.lax.bitcast_convert_type(lo, jnp.float32)
