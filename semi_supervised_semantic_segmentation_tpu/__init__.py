"""TPU-native semi-supervised semantic segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``Luonic/semi-supervised_semantic_segmentation`` (a PyTorch research trainer
for semi-supervised semantic segmentation on Pascal VOC 2012 aug and
Cityscapes — see SURVEY.md for the capability contract reconstructed from
``BASELINE.json``; the reference mount was empty in this environment, so all
parity targets are stated against that contract rather than source lines).

Design (TPU-first, not a port):
  - Weak/strong augmentation (random scale-crop-flip, color jitter, CutMix)
    runs *on device* inside the jitted train step on uint8 HBM batches.
  - Student + EMA-teacher forwards, pseudo-labels, consistency losses, SGD,
    and the EMA update all fuse into a single XLA program per step.
  - Data parallelism is a 1-D ``jax.sharding.Mesh`` with the batch sharded on
    the ``data`` axis; XLA emits the psum/all-reduce collectives over ICI.
  - Host work is limited to decode + static-shape uint8 batch assembly.
"""

__version__ = "0.1.0"

from semi_supervised_semantic_segmentation_tpu.config import (  # noqa: F401
    Config,
    load_config,
)
