import numpy as np

from semi_supervised_semantic_segmentation_tpu.ops import schedules


def test_poly_lr_endpoints():
    np.testing.assert_allclose(float(schedules.poly_lr(0, 0.01, 1000)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(schedules.poly_lr(1000, 0.01, 1000)), 0.0, atol=1e-8)
    # Overrun does not go negative.
    assert float(schedules.poly_lr(2000, 0.01, 1000)) == 0.0


def test_poly_lr_formula():
    np.testing.assert_allclose(
        float(schedules.poly_lr(250, 0.02, 1000, power=0.9)),
        0.02 * (1 - 0.25) ** 0.9,
        rtol=1e-5,
    )


def test_sigmoid_rampup():
    np.testing.assert_allclose(
        float(schedules.sigmoid_rampup(0, 100)), np.exp(-5.0), rtol=1e-5
    )
    np.testing.assert_allclose(float(schedules.sigmoid_rampup(100, 100)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(schedules.sigmoid_rampup(500, 100)), 1.0, rtol=1e-6)
    # No ramp configured -> always 1.
    assert float(schedules.sigmoid_rampup(0, 0)) == 1.0


def test_consistency_weight_monotone():
    vals = [float(schedules.consistency_weight(s, 2.0, 100)) for s in range(0, 101, 10)]
    assert all(b >= a - 1e-7 for a, b in zip(vals, vals[1:]))
    np.testing.assert_allclose(vals[-1], 2.0, rtol=1e-5)
