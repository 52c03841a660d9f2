"""CLAP2Diffusion-TPU: a TPU-native (JAX/XLA/Pallas/pjit) audio+text -> image framework.

A ground-up rebuild of the capabilities of the CLAP2Diffusion reference
(audio-conditioned Stable Diffusion v1.5 via CLAP embeddings and a 3-level
hierarchical decomposer), designed TPU-first:

- All compute paths are jit-compiled JAX; hot kernels (flash attention, fused
  GroupNorm+SiLU) are Pallas TPU kernels with XLA fallbacks.
- The DDIM+CFG sampling loop is a single ``lax.scan`` on device.
- Training is data-parallel over a ``jax.sharding.Mesh`` with ``shard_map``;
  sharding rules also expose tensor-parallel axes for larger deployments.
- Audio conditioning is a *static* architectural branch of the UNet (gated
  audio cross-attention per early/mid/late level), not a runtime
  monkey-patched attention processor (cf. reference
  models/audio_attention_processor.py:148-255).

Package layout::

    core/       config dataclasses (YAML-backed), dtype policy, mesh, PRNG
    ops/        Pallas kernels + XLA fallbacks (attention, groupnorm, stft)
    models/     CLAP (HTSAT + text), SD-1.5 UNet/VAE/CLIP-text, condition stack
    parallel/   sharding rules, data-parallel train-step wrappers
    data/       AudioCaps datasets, caption parser, fixtures, precompute tools
    train/      stage 1/2/3 training loops, optimizers, EMA, checkpointing
    eval/       metrics (CLIP score, audio alignment), parity harness
    apps/       CLI entry points (infer / train / evaluate / prepare) + gradio
    utils/      audio IO (pure-numpy WAV + resample), metric logging
"""

__version__ = "0.1.0"
