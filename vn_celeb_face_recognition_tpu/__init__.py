"""vn_celeb_face_recognition_tpu — a TPU-native face recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
VN-celeb face recognition stack (votnhan/VN_celeb_face_recognition): face
detection (MTCNN cascade, RetinaFace), 5-point similarity alignment, 512-d
face embedding (InceptionResnetV1 / iresnet100), MLP embedding
classification, emotion tagging (2-branch ResNet50), a config-driven
trainer, batch embedding extraction and image/video/statistics pipelines.

Design stance (vs the reference's host-looped PyTorch code):
  * shape-static, batched, jit-compiled device stages with padded/masked
    face sets (capacity-bounded detection instead of dynamic box counts);
  * NHWC layouts, bf16 matmuls on the MXU, XLA fusion for elementwise work;
  * multi-chip scale through ``jax.sharding`` meshes (data-parallel batch
    sharding with psum gradient reduction), not NCCL-style process groups;
  * host side limited to IO, while augmentation/normalisation runs on
    device inside the jitted step.
"""

__version__ = "0.1.0"
