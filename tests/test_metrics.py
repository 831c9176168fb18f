"""Confusion matrix / IoU tests vs NumPy oracle (SURVEY.md C18/C22)."""

import jax.numpy as jnp
import numpy as np

from semi_supervised_semantic_segmentation_tpu.ops import metrics


def _np_confusion(pred, label, num_classes, ignore=255):
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    for p, t in zip(pred.reshape(-1), label.reshape(-1)):
        if t != ignore:
            cm[t, p] += 1
    return cm


def test_confusion_matrix_matches_oracle():
    rng = np.random.RandomState(0)
    pred = rng.randint(0, 5, (2, 16, 16))
    label = rng.randint(0, 5, (2, 16, 16))
    label[0, :4] = 255
    expected = _np_confusion(pred, label, 5)
    for impl in ("matmul", "bincount"):
        ours = np.asarray(
            metrics.confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 5, impl=impl)
        )
        np.testing.assert_array_equal(ours, expected)


def test_confusion_matrix_impls_agree_large():
    rng = np.random.RandomState(9)
    pred = rng.randint(0, 21, (4, 128, 128))
    label = rng.randint(0, 21, (4, 128, 128))
    label[pred == 3] = 255  # irregular ignore pattern
    a = np.asarray(metrics.confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 21, impl="matmul"))
    b = np.asarray(metrics.confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 21, impl="bincount"))
    np.testing.assert_array_equal(a, b)


def test_iou_perfect_prediction():
    label = np.random.RandomState(1).randint(0, 3, (1, 8, 8))
    cm = metrics.confusion_matrix(jnp.asarray(label), jnp.asarray(label), 3)
    iou, miou = metrics.iou_from_confusion(cm)
    assert miou == 1.0
    assert np.all(iou[~np.isnan(iou)] == 1.0)


def test_iou_absent_class_excluded_from_mean():
    # Class 2 never appears in gt or pred -> excluded, not counted as 0.
    pred = np.zeros((1, 4, 4), dtype=np.int64)
    label = np.zeros((1, 4, 4), dtype=np.int64)
    cm = metrics.confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 3)
    iou, miou = metrics.iou_from_confusion(cm)
    assert miou == 1.0
    assert np.isnan(iou[2])


def test_confusion_additivity():
    """Per-shard confmats summed == global confmat (the psum merge law)."""
    rng = np.random.RandomState(2)
    pred = rng.randint(0, 4, (8, 8, 8))
    label = rng.randint(0, 4, (8, 8, 8))
    whole = np.asarray(metrics.confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 4))
    parts = sum(
        np.asarray(metrics.confusion_matrix(jnp.asarray(pred[i]), jnp.asarray(label[i]), 4))
        for i in range(8)
    )
    np.testing.assert_array_equal(whole, parts)
