"""Pallas fused CutMix+normalize kernel (ops/pallas_aug.py) — geometric and
numeric invariants in TPU-interpret mode (the pltpu PRNG stream differs
from threefry by design, so invariants rather than bit-parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from semi_supervised_semantic_segmentation_tpu.ops.pallas_aug import (
    cutmix_normalize_pallas,
)

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _run(seed=7, b=4, h=64, w=32, prob=1.0):
    rng = np.random.RandomState(0)
    img = rng.rand(b, h, w, 3).astype(np.float32)
    lab = rng.randint(0, 5, (b, h, w)).astype(np.int32)
    conf = rng.rand(b, h, w) > 0.5
    oi, ol, oc = cutmix_normalize_pallas(
        jnp.asarray(img), jnp.asarray(lab), jnp.asarray(conf), seed,
        prob=prob, interpret=pltpu.InterpretParams(), block_h=32,
    )
    return img, lab, conf, np.asarray(oi, np.float32), np.asarray(ol), np.asarray(oc)


def test_every_pixel_from_self_or_partner_and_aligned():
    img, lab, conf, oi, ol, oc = _run()
    rimg, rlab, rconf = np.roll(img, 1, 0), np.roll(lab, 1, 0), np.roll(conf, 1, 0)
    exp_self = (img - MEAN) / STD
    exp_part = (rimg - MEAN) / STD
    from_self = np.all(np.abs(oi - exp_self) < 2e-2, axis=-1)
    from_part = np.all(np.abs(oi - exp_part) < 2e-2, axis=-1)
    assert np.all(from_self | from_part)
    # Image/label/conf cut with the SAME box: where the label provably came
    # from the partner, the image must have too.
    lab_from_part = (ol == rlab) & (lab != rlab)
    assert np.all(from_part[lab_from_part])
    assert np.all((ol == lab) | (ol == rlab))
    assert np.all((oc == conf) | (oc == rconf))


def test_box_is_rectangle():
    img, lab, conf, oi, ol, oc = _run(seed=3)
    rlab = np.roll(lab, 1, 0)
    changed = (ol != lab) & (lab != rlab)
    for i in range(changed.shape[0]):
        ys, xs = np.where(changed[i])
        if len(ys) == 0:
            continue
        sub = changed[i][ys.min():ys.max() + 1, xs.min():xs.max() + 1]
        interior = (lab[i] != rlab[i])[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
        # Inside the bbox, every pixel whose labels differ must be changed.
        assert np.all(sub[interior])


def test_prob_zero_is_identity_normalize():
    img, lab, conf, oi, ol, oc = _run(prob=0.0)
    np.testing.assert_allclose(oi, (img - MEAN) / STD, atol=2e-2)
    np.testing.assert_array_equal(ol, lab)
    np.testing.assert_array_equal(oc, conf)


def test_deterministic_per_seed():
    """Same seed -> same output.  (Cross-seed inequality can only be tested
    on real hardware: TPU-interpret mode's prng_random_bits ignores the seed
    and returns a fixed stream, so the box is constant under interpret —
    scripts/smoke_pallas_tpu checks the real-PRNG path on the chip.)"""
    _, _, _, a_img, a_lab, _ = _run(seed=11)
    _, _, _, b_img, b_lab, _ = _run(seed=11)
    np.testing.assert_array_equal(a_lab, b_lab)
    np.testing.assert_array_equal(a_img, b_img)
