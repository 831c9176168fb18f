from semi_supervised_semantic_segmentation_tpu.models.registry import (  # noqa: F401
    build_model,
)
