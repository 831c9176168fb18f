from semi_supervised_semantic_segmentation_tpu.data.datasets import (  # noqa: F401
    build_dataset,
)
from semi_supervised_semantic_segmentation_tpu.data.pipeline import (  # noqa: F401
    DualLoader,
    Loader,
)
