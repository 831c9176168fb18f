from semi_supervised_semantic_segmentation_tpu.ops import (  # noqa: F401
    augment,
    losses,
    metrics,
    resize,
    schedules,
)
