"""AVION-TPU: a TPU-native video-language pretraining framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of AVION
("Training a Large Video Model on a Single Machine in a Day",
arXiv:2309.16669): CLIP-style dual-encoder video-language contrastive
pretraining, VideoMAE masked-autoencoder pretraining, downstream
finetuning (retrieval + classification), zero-shot evaluation suites,
and a fused host-decode + device-augment input pipeline.

Design pillars (TPU-first, not a port):
  - SPMD over a `jax.sharding.Mesh` (data / fsdp / tensor axes) with
    pjit-partitioned train steps; optimizer state sharding (ZeRO-like)
    falls out of sharding rules.
  - Pallas kernels for the hot ops: flash attention, fused
    crop/resize/flip/normalize input processing, masked patchify.
  - bf16 compute policy with f32 params/reductions.
  - C++ (FFmpeg) host decode library feeding device-side augmentation.
"""

__version__ = "0.1.0"
