"""SSL math unit tests vs NumPy/torch oracles (SURVEY.md §4.2 'Unit: SSL math')."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from semi_supervised_semantic_segmentation_tpu.ops import losses


def test_cross_entropy_matches_torch_ignore_index():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 8, 5).astype(np.float32)
    labels = rng.randint(0, 5, (2, 8, 8)).astype(np.int64)
    labels[0, :2] = 255  # ignored region
    ours = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    theirs = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels),
        ignore_index=255,
    )
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_cross_entropy_all_ignored_is_zero():
    logits = jnp.zeros((1, 4, 4, 3))
    labels = jnp.full((1, 4, 4), 255, dtype=jnp.int32)
    assert float(losses.cross_entropy(logits, labels)) == 0.0


def test_mse_consistency_matches_torch():
    rng = np.random.RandomState(1)
    s = rng.randn(2, 4, 4, 5).astype(np.float32)
    t = rng.randn(2, 4, 4, 5).astype(np.float32)
    ours = losses.mse_consistency(jnp.asarray(s), jnp.asarray(t))
    theirs = F.mse_loss(
        torch.softmax(torch.from_numpy(s), dim=-1),
        torch.softmax(torch.from_numpy(t), dim=-1),
    )
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_confidence_masked_ce_fixmatch_normalization():
    rng = np.random.RandomState(2)
    logits = rng.randn(1, 4, 4, 3).astype(np.float32)
    pseudo = rng.randint(0, 3, (1, 4, 4))
    conf = np.zeros((1, 4, 4), dtype=bool)
    conf[0, 0, 0] = True
    # 'all' normalization: only 1 of 16 pixels contributes, denominator 16.
    ours = losses.confidence_masked_ce(
        jnp.asarray(logits), jnp.asarray(pseudo), jnp.asarray(conf), normalize="all"
    )
    logp = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    pix = -logp[0, 0, 0, pseudo[0, 0, 0]]
    np.testing.assert_allclose(float(ours), float(pix) / 16.0, rtol=1e-5)
    # 'masked': denominator is the confident count (1).
    ours_m = losses.confidence_masked_ce(
        jnp.asarray(logits), jnp.asarray(pseudo), jnp.asarray(conf), normalize="masked"
    )
    np.testing.assert_allclose(float(ours_m), float(pix), rtol=1e-5)


def test_zero_conf_mask_gives_zero_loss():
    logits = jnp.ones((1, 4, 4, 3))
    pseudo = jnp.zeros((1, 4, 4), dtype=jnp.int32)
    conf = jnp.zeros((1, 4, 4), dtype=bool)
    assert float(losses.confidence_masked_ce(logits, pseudo, conf)) == 0.0


def test_pseudo_labels_from_logits():
    logits = jnp.asarray(
        [[[[5.0, 0.0, 0.0], [0.1, 0.2, 0.3]]]]  # (1,1,2,3)
    )
    labels, mask = losses.pseudo_labels_from_logits(logits, conf_thresh=0.9)
    assert labels.shape == (1, 1, 2)
    assert int(labels[0, 0, 0]) == 0
    assert bool(mask[0, 0, 0])  # softmax([5,0,0]) max ~= 0.987 > 0.9
    assert not bool(mask[0, 0, 1])  # near-uniform


def test_cps_loss_symmetric_and_grad_flows_to_logits_only():
    rng = np.random.RandomState(3)
    l1 = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    l2 = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    v12 = losses.cps_loss(l1, l2)
    v21 = losses.cps_loss(l2, l1)
    np.testing.assert_allclose(float(v12), float(v21), rtol=1e-6)
    # Gradient exists (stop_gradient only blocks the label path).
    g = jax.grad(lambda a: losses.cps_loss(a, l2))(l1)
    assert float(jnp.abs(g).sum()) > 0


def test_mse_consistency_valid_mask_excludes_padding():
    """Padding pixels (geometric invalidity from the weak aug) must not
    contribute to the consistency loss in numerator or denominator."""
    rng = np.random.RandomState(7)
    s = rng.randn(1, 4, 4, 3).astype(np.float32)
    t = rng.randn(1, 4, 4, 3).astype(np.float32)
    mask = np.zeros((1, 4, 4), bool)
    mask[0, :2] = True  # top half valid
    ours = losses.mse_consistency(jnp.asarray(s), jnp.asarray(t), jnp.asarray(mask))
    oracle = losses.mse_consistency(jnp.asarray(s[:, :2]), jnp.asarray(t[:, :2]))
    np.testing.assert_allclose(float(ours), float(oracle), rtol=1e-6)
    # All-invalid -> exactly zero, not NaN.
    zero = losses.mse_consistency(
        jnp.asarray(s), jnp.asarray(t), jnp.zeros((1, 4, 4), bool)
    )
    assert float(zero) == 0.0


def test_cps_loss_valid_mask_excludes_padding():
    rng = np.random.RandomState(8)
    l1 = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    l2 = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    mask = np.zeros((1, 4, 4), bool)
    mask[0, :, :2] = True  # left half valid
    ours = losses.cps_loss(l1, l2, valid_mask=jnp.asarray(mask))
    oracle = losses.cps_loss(l1[:, :, :2], l2[:, :, :2])
    np.testing.assert_allclose(float(ours), float(oracle), rtol=1e-6)


@pytest.mark.parametrize("thresh,min_kept", [(0.7, 50), (0.9, 5), (0.3, 10_000)])
def test_ohem_cross_entropy_matches_official_torch(thresh, min_kept):
    """ohem_cross_entropy vs the official OhemCrossEntropy logic (sort by
    true-class prob, index min(min_kept, numel-1), strict p < threshold)."""
    rng = np.random.RandomState(int(thresh * 10) + min_kept)
    n, h, w, c = 2, 13, 11, 5
    logits = rng.randn(n, h, w, c).astype(np.float32) * 3
    labels = rng.randint(0, c, (n, h, w)).astype(np.int32)
    labels[rng.rand(n, h, w) < 0.15] = 255

    got = float(
        losses.ohem_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), 255, thresh, min_kept
        )
    )

    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    yt = torch.from_numpy(labels).long()
    pixel_losses = F.cross_entropy(
        lt, yt, ignore_index=255, reduction="none"
    ).reshape(-1)
    mask = (yt != 255).reshape(-1)
    pixel_losses = pixel_losses[mask]
    prob = F.softmax(lt, dim=1)
    yt_safe = yt.clone()
    yt_safe[yt == 255] = 0
    p_true = prob.gather(1, yt_safe.unsqueeze(1)).squeeze(1).reshape(-1)[mask]
    pred, ind = p_true.sort()
    min_value = pred[min(min_kept, pred.numel() - 1)]
    threshold = max(float(min_value), thresh)
    kept = pixel_losses[ind][pred < threshold]
    want = float(kept.mean()) if kept.numel() else 0.0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_kth_smallest_bitsearch_equals_sort():
    """The OHEM order statistic from the 32-step bit-space binary search is
    EXACTLY jnp.sort(x)[k], including duplicates, k=0, k=n-1, and +inf
    padding (the invalid-pixel encoding)."""
    rng = np.random.RandomState(0)
    x = rng.rand(4097).astype(np.float32)
    x[rng.rand(4097) < 0.1] = np.inf        # invalid pixels
    x[rng.rand(4097) < 0.1] = 0.25          # duplicates
    x[0] = 0.0
    xs = np.sort(x)
    xj = jnp.asarray(x)
    for k in [0, 1, 100, 2048, 4095, 4096]:
        got = float(losses._kth_smallest_nonneg_f32(xj, jnp.int32(k)))
        assert got == float(xs[k]), (k, got, float(xs[k]))


def test_ohem_mines_hard_pixels_loss_at_least_plain_ce():
    """OHEM keeps the hardest (highest-CE) pixels, so its mean is >= the
    all-pixel CE mean; and with min_kept >= n_valid and thresh=1.0 it keeps
    everything and equals plain CE exactly."""
    rng = np.random.RandomState(7)
    logits = rng.randn(2, 16, 16, 6).astype(np.float32) * 2
    labels = rng.randint(0, 6, (2, 16, 16)).astype(np.int32)
    labels[rng.rand(2, 16, 16) < 0.2] = 255

    plain = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 255))
    mined = float(
        losses.ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 255, 0.7, 64)
    )
    assert mined >= plain - 1e-6

    all_kept = float(
        losses.ohem_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), 255, 1.0, 10**6
        )
    )
    np.testing.assert_allclose(all_kept, plain, rtol=1e-6, atol=1e-7)
