"""kvq_tpu — TPU-native (JAX/XLA/Pallas) rebuild of the KVQ NR-VQA stack.

Reference capabilities (lixinustc/KVQ-Challenge-CVPR-NTIRE2024) re-designed
TPU-first. See SURVEY.md for the reference layer map and this package's
architecture:

    core/      config, registries, metrics, checkpointing, RNG plumbing
    data/      host pipeline: samplers, fragment views, decode, datasets
    nn/        flax modules: swin-3d, resnet, clip-vit, contrique, heads, cdm
    models/    SimpleVQA / KSVQE / FastVQA compositions (VQANetwork)
    ops/       custom primitives: perturbed top-k, pallas window attention
    parallel/  device mesh + sharded train/eval steps
    train/     trainer, losses, optimizer/schedule/EMA
    cli/       train/test/feature-extraction/scoring entry points
"""

__version__ = "0.1.0"
