from semi_supervised_semantic_segmentation_tpu.methods.registry import (  # noqa: F401
    get_method,
)
