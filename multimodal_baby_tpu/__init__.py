"""multimodal_baby_tpu: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
capabilities of wkvong/multimodal-baby (CVCL, Vong et al. 2024, Science;
Wang et al. 2023, Cognitive Science).

This is not a port: models are flax/JAX modules jitted against static shapes,
the hot ops (fused InfoNCE, LSTM recurrence, attention) have Pallas TPU
kernels, and scaling is expressed via ``jax.sharding.Mesh`` + collectives
instead of a per-process distributed backend.

Layering (bottom-up), mirroring the reference's de-facto layers
(see /root/repo/SURVEY.md section 1):

- ``core``       config dataclasses, constants, precision policy, RNG helpers
- ``ops``        Pallas TPU kernels + jittable compute primitives
- ``parallel``   device mesh construction and sharding specs
- ``models``     vision encoders, text encoders, contrastive + LM heads
- ``data``       vocab/tokenizer, datasets, host loader, on-device augment, ETL
- ``train``      jitted train/eval steps, optimizer, trainer loop, checkpoints
- ``evaluation`` forced-choice harnesses, linear probes, textgen metrics
- ``api``        the public CVCL API (load_model/encode_image/encode_text/
                 tokenize/forward) + torch-checkpoint converter
- ``cli``        entry points and sweep runner
"""

__version__ = "0.1.0"
