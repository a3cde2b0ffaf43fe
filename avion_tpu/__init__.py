"""AVION-TPU: a TPU-native video-language pretraining framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of AVION
("Training a Large Video Model on a Single Machine in a Day",
arXiv:2309.16669): CLIP-style dual-encoder video-language contrastive
pretraining, VideoMAE masked-autoencoder pretraining, downstream
finetuning (retrieval + classification), zero-shot evaluation suites,
and a fused host-decode + device-augment input pipeline.

Design pillars (TPU-first, not a port):
  - SPMD over a `jax.sharding.Mesh` (data / fsdp / pp / sp / ep /
    tensor axes) with pjit-partitioned train steps; optimizer-state
    sharding (ZeRO-like), Megatron col/row rules, GPipe pipeline, ring
    attention, and MoE expert parallelism all fall out of sharding
    rules + collectives-by-annotation.
  - Pallas kernels for the hot ops: packed/fused-qkv flash attention
    (fwd + bwd), fused crop/resize/flip/normalize input processing,
    masked patchify.
  - bf16 compute policy with f32 params/reductions.
  - C++ (FFmpeg) host decode library (keyframe-indexed seek, B-frame
    fast-forward) feeding shared-memory loaders and device-side
    augmentation.
  - Production serving (`avion_tpu.serve`): HTTP + request
    micro-batching over the jitted encoders; bf16 (exact) or int8
    (weight-only) weight storage; KV-cached narrator generation.
  - head_dim-128 model geometries (`*_H128` registry variants): same
    widths/params/FLOPs with full-lane MXU attention for from-scratch
    training.
"""

__version__ = "0.3.0"
