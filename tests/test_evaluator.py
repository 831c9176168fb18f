"""Evaluator semantics: sliding-window tiling == whole-image on sizes where
both apply; window starts cover the canvas; blank-pad slots contribute
nothing."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from semi_supervised_semantic_segmentation_tpu.engine.evaluator import (
    _window_starts,
    make_eval_step,
)
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

from .helpers import synthetic_batch, tiny_cfg


def test_window_starts_cover_and_flush():
    assert _window_starts(64, 64, 43) == [0]
    assert _window_starts(100, 64, 43) == [0, 36]  # final window flushes to edge
    starts = _window_starts(257, 64, 43)
    assert starts[0] == 0 and starts[-1] == 257 - 64
    assert all(b - a <= 43 for a, b in zip(starts, starts[1:]))


def test_sliding_equals_whole_when_one_window():
    """Canvas == crop: sliding has exactly one window -> identical confmat."""
    cfg_w = tiny_cfg("supervised", crop=32)
    cfg_s = tiny_cfg("supervised", crop=32, **{"data.eval_mode": "sliding"})
    model = build_model(cfg_w)
    method = get_method("supervised")
    state = method.init_state(cfg_w, model, jax.random.key(0), 10)
    batch = synthetic_batch(2, 32, seed=0)
    cm_w = np.asarray(jax.jit(make_eval_step(cfg_w, model))(state.params, state.batch_stats, batch))
    cm_s = np.asarray(jax.jit(make_eval_step(cfg_s, model))(state.params, state.batch_stats, batch))
    np.testing.assert_array_equal(cm_w, cm_s)


@pytest.mark.slow
def test_sliding_counts_all_pixels_on_larger_canvas():
    cfg = tiny_cfg("supervised", crop=32, **{"data.eval_mode": "sliding"})
    model = build_model(cfg)
    method = get_method("supervised")
    state = method.init_state(cfg, model, jax.random.key(0), 10)
    batch = synthetic_batch(2, 48, seed=1)
    cm = np.asarray(jax.jit(make_eval_step(cfg, model))(state.params, state.batch_stats, batch))
    assert cm.sum() == 2 * 48 * 48


@pytest.mark.slow
def test_sliding_covers_nonsquare_cityscapes_aspect():
    """Cityscapes-like 1:2 aspect canvas: the window grid must tile both
    axes (flush windows at each edge) and count every pixel exactly once in
    the confmat (configs 4/5 run eval_mode=sliding over 1024x2048)."""
    cfg = tiny_cfg("supervised", crop=32, **{"data.eval_mode": "sliding",
                                             "data.eval_stride": 24})
    model = build_model(cfg)
    method = get_method("supervised")
    state = method.init_state(cfg, model, jax.random.key(0), 10)
    batch = synthetic_batch(1, 32, seed=3)
    # Fabricate a 48x96 canvas batch (content fills it entirely).
    rng = np.random.RandomState(5)
    batch = {
        "image": (rng.rand(1, 48, 96, 3) * 255).astype(np.uint8),
        "label": rng.randint(0, 4, (1, 48, 96)).astype(np.int32),
        "size": np.asarray([[48, 96]], np.int32),
    }
    cm = np.asarray(
        jax.jit(make_eval_step(cfg, model))(state.params, state.batch_stats, batch)
    )
    assert cm.sum() == 48 * 96


@pytest.mark.slow
def test_eval_size_resizes_whole_image_forward():
    """data.eval_size: whole-mode forwards at eval_size^2 and scores logits
    upsampled back to the canvas; eval_size == canvas is a no-op."""
    cfg_noop = tiny_cfg("supervised", crop=32, **{"data.eval_size": 32})
    cfg_plain = tiny_cfg("supervised", crop=32)
    cfg_resized = tiny_cfg("supervised", crop=32, **{"data.eval_size": 64})
    model = build_model(cfg_plain)
    method = get_method("supervised")
    state = method.init_state(cfg_plain, model, jax.random.key(0), 10)
    batch = synthetic_batch(2, 32, seed=4)
    cm_plain = np.asarray(
        jax.jit(make_eval_step(cfg_plain, model))(state.params, state.batch_stats, batch)
    )
    cm_noop = np.asarray(
        jax.jit(make_eval_step(cfg_noop, model))(state.params, state.batch_stats, batch)
    )
    np.testing.assert_array_equal(cm_plain, cm_noop)
    cm_resized = np.asarray(
        jax.jit(make_eval_step(cfg_resized, model))(state.params, state.batch_stats, batch)
    )
    # Scored at native label resolution regardless of the forward size.
    assert cm_resized.sum() == cm_plain.sum() == 2 * 32 * 32


@pytest.mark.slow
def test_blank_pad_rows_are_ignored():
    cfg = tiny_cfg("supervised", crop=32)
    model = build_model(cfg)
    method = get_method("supervised")
    state = method.init_state(cfg, model, jax.random.key(0), 10)
    batch = synthetic_batch(2, 32, seed=2)
    batch["label"][1] = 255  # a blank eval pad slot
    cm = np.asarray(jax.jit(make_eval_step(cfg, model))(state.params, state.batch_stats, batch))
    assert cm.sum() == 32 * 32  # only sample 0 counted


@pytest.mark.slow
def test_tta_defaults_match_plain_eval():
    """eval_flip=False, eval_scales=(1.0,) must be bit-identical to the
    pre-TTA evaluator (argmax of softmax == argmax of logits)."""
    cfg = tiny_cfg("supervised", crop=32)
    cfg_tta = tiny_cfg(
        "supervised", crop=32,
        **{"data.eval_flip": False, "data.eval_scales": [1.0]},
    )
    model = build_model(cfg)
    method = get_method("supervised")
    state = method.init_state(cfg, model, jax.random.key(1), 10)
    batch = synthetic_batch(2, 32, seed=3)
    cm_a = np.asarray(
        jax.jit(make_eval_step(cfg, model))(state.params, state.batch_stats, batch)
    )
    cm_b = np.asarray(
        jax.jit(make_eval_step(cfg_tta, model))(state.params, state.batch_stats, batch)
    )
    np.testing.assert_array_equal(cm_a, cm_b)


def test_tta_flip_matches_manual_average():
    """eval_flip averages probs of the plain and mirrored forwards; verify
    against a hand-built average through the raw model."""
    from semi_supervised_semantic_segmentation_tpu.methods import common
    from semi_supervised_semantic_segmentation_tpu.ops.augment import (
        canvas_normalize_eval,
    )
    from semi_supervised_semantic_segmentation_tpu.ops.metrics import (
        confusion_matrix,
    )

    cfg = tiny_cfg("supervised", crop=32, **{"data.eval_flip": True})
    model = build_model(cfg)
    method = get_method("supervised")
    state = method.init_state(cfg, model, jax.random.key(2), 10)
    batch = synthetic_batch(2, 32, seed=5)
    cm = np.asarray(
        jax.jit(make_eval_step(cfg, model))(state.params, state.batch_stats, batch)
    )

    x = canvas_normalize_eval(
        batch["image"], tuple(cfg.data.mean), tuple(cfg.data.std), model.dtype
    )
    p = jax.nn.softmax(
        common.apply_eval(model, state.params, state.batch_stats, x).astype(
            jnp.float32
        ),
        -1,
    )
    pf = jax.nn.softmax(
        common.apply_eval(
            model, state.params, state.batch_stats, x[:, :, ::-1, :]
        ).astype(jnp.float32),
        -1,
    )
    pred = jnp.argmax(p + pf[:, :, ::-1, :], axis=-1)
    want = np.asarray(
        confusion_matrix(
            pred, batch["label"], cfg.data.num_classes, cfg.data.ignore_index
        )
    )
    np.testing.assert_array_equal(cm, want)


@pytest.mark.slow
def test_tta_multiscale_runs_and_counts_all_pixels():
    """Multi-scale TTA compiles as one program and scores every labeled
    pixel exactly once."""
    cfg = tiny_cfg(
        "supervised", crop=32,
        **{"data.eval_scales": [0.75, 1.0, 1.5], "data.eval_flip": True},
    )
    model = build_model(cfg)
    method = get_method("supervised")
    state = method.init_state(cfg, model, jax.random.key(3), 10)
    batch = synthetic_batch(2, 32, seed=7)
    cm = np.asarray(
        jax.jit(make_eval_step(cfg, model))(state.params, state.batch_stats, batch)
    )
    labeled = np.asarray(batch["label"]) != cfg.data.ignore_index
    assert cm.sum() == labeled.sum()


def test_eval_scales_validation():
    import pytest

    with pytest.raises(ValueError, match="eval_scales"):
        tiny_cfg("supervised", crop=32, **{"data.eval_scales": [0.0, 1.0]})


def _staged_fixture(**extra):
    from semi_supervised_semantic_segmentation_tpu.engine.evaluator import (
        make_staged_eval_step,
    )

    cfg = tiny_cfg(
        "supervised", crop=32,
        **{
            "data.eval_mode": "sliding",
            "data.eval_stride": 24,
            "data.eval_flip": True,
            "data.eval_scales": [0.75, 1.0, 1.5],
            **extra,
        },
    )
    model = build_model(cfg)
    method = get_method("supervised")
    state = method.init_state(cfg, model, jax.random.key(4), 10)
    rng = np.random.RandomState(9)
    batch = {
        "image": (rng.rand(1, 48, 96, 3) * 255).astype(np.uint8),
        "label": rng.randint(0, 4, (1, 48, 96)).astype(np.int32),
        "size": np.asarray([[48, 96]], np.int32),
    }
    return cfg, model, state, batch, make_staged_eval_step


@pytest.mark.slow
def test_staged_equals_fused_sliding_tta():
    """The staged per-scale evaluator (batched window forwards, host scale
    sum) computes the SAME protocol as the fused one-program path: sliding
    windows + flip + multi-scale on a non-square canvas."""
    cfg, model, state, batch, make_staged = _staged_fixture()
    cm_fused = np.asarray(
        jax.jit(make_eval_step(cfg, model))(state.params, state.batch_stats, batch)
    )
    cm_staged = np.asarray(
        make_staged(cfg, model)(state.params, state.batch_stats, batch)
    )
    np.testing.assert_array_equal(cm_fused, cm_staged)
    assert cm_staged.sum() == 48 * 96


@pytest.mark.slow
def test_staged_window_batch_chunking_matches():
    """eval_window_batch chunks the batched window forward without changing
    the result."""
    cfg, model, state, batch, make_staged = _staged_fixture()
    cfg_chunk, *_ = _staged_fixture(**{"data.eval_window_batch": 3})
    cm_all = np.asarray(
        make_staged(cfg, model)(state.params, state.batch_stats, batch)
    )
    cm_chunk = np.asarray(
        make_staged(cfg_chunk, model)(state.params, state.batch_stats, batch)
    )
    np.testing.assert_array_equal(cm_all, cm_chunk)


def test_use_staged_auto_routing():
    from semi_supervised_semantic_segmentation_tpu.engine.evaluator import (
        use_staged,
    )

    # Config-5-like: sliding + flip + 6 scales -> staged.
    assert use_staged(
        tiny_cfg(
            "supervised", crop=32,
            **{
                "data.eval_mode": "sliding",
                "data.eval_flip": True,
                "data.eval_scales": [0.5, 0.75, 1.0, 1.25, 1.5, 1.75],
            },
        )
    )
    # Plain whole-image eval (the train-loop path) -> fused.
    assert not use_staged(tiny_cfg("supervised", crop=32))
    # Whole-image + flip only -> fused (one extra forward, no blowup).
    assert not use_staged(
        tiny_cfg("supervised", crop=32, **{"data.eval_flip": True})
    )
    # Explicit override wins.
    assert use_staged(
        tiny_cfg("supervised", crop=32, **{"data.eval_impl": "staged"})
    )
    assert not use_staged(
        tiny_cfg(
            "supervised", crop=32,
            **{
                "data.eval_impl": "fused",
                "data.eval_mode": "sliding",
                "data.eval_flip": True,
                "data.eval_scales": [0.5, 1.0, 1.5],
            },
        )
    )
