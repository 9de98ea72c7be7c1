"""JABD-TPU: a TPU-native (JAX/XLA/Pallas) re-design of the JABD small-face
detector framework.

Reference capabilities: liudabao001/JABD-Joint-Attention-Based-Detector-for-
small-face-detection (RetinaFace-style one-stage anchor detector with joint
attention: ECA/GAI channel attention + cross-scale non-local fusion + DIoU).

Design principles (TPU-first, not a port):
  * NHWC layout everywhere; convs map onto the MXU via XLA.
  * One functional model parameterized by a config tree instead of 14
    copy-paste variants.
  * Anchor generation / box codec / matching are dense vectorized jnp ops
    (vmapped over the batch) instead of per-image Python loops.
  * NMS is a fixed-shape, jit-safe kernel (XLA reference + Pallas fused
    kernel) instead of torchvision's dynamic-shape CUDA op.
  * Data parallelism is expressed with jax.sharding over a device Mesh
    (ICI collectives), not DataParallel/NCCL.
"""

__version__ = "0.1.0"

from jabd_tpu import configs  # noqa: F401
