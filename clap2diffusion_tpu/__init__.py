"""CLAP2Diffusion-TPU: a TPU-native (JAX/XLA/Pallas/pjit) audio+text -> image framework.

A ground-up rebuild of the capabilities of the CLAP2Diffusion reference
(audio-conditioned Stable Diffusion v1.5 via CLAP embeddings and a 3-level
hierarchical decomposer), designed TPU-first:

- All compute paths are jit-compiled JAX; hot kernels (flash attention, fused
  GroupNorm+SiLU) are Pallas TPU kernels with XLA fallbacks.
- The DDIM+CFG sampling loop is a single ``lax.scan`` on device.
- Training is data-parallel over a ``jax.sharding.Mesh`` with XLA-inserted
  collectives; sharding rules also expose tensor-parallel axes.
- Audio conditioning is a *static* architectural branch of the UNet (gated
  audio cross-attention per early/mid/late level), not a runtime
  monkey-patched attention processor (cf. reference
  models/audio_attention_processor.py:148-255).

Package layout::

    core/       config dataclasses (YAML-backed), dtype policy, mesh, PRNG
    ops/        Pallas kernels + XLA fallbacks (attention, groupnorm, norm-60)
    models/     CLAP (HTSAT + text), SD-1.5 UNet/VAE/CLIP text+vision,
                tokenizers, condition stack, weight converters
    diffusion/  DDIM+CFG sampler (lax.scan), end-to-end pipeline
    parallel/   sharding rules, data/tensor-parallel mesh helpers
    data/       AudioCaps datasets, caption parser, fixtures, precompute tools
    train/      stage 1/2/3 training, optimizers, EMA, orbax checkpointing
    eval/       metrics (Frechet/IS/CLIPScore/alignment), eval harness
    apps/       CLI entry points (infer / train / evaluate / prepare) + gradio
    utils/      audio IO (native C++ loader + numpy fallback), logging, profiling
"""

__version__ = "0.1.0"

from clap2diffusion_tpu.core.config import Config, load_config

__all__ = ["Config", "load_config", "__version__"]


def pipeline(cfg=None, params=None, seed: int = 0):
    """Convenience constructor: ``clap2diffusion_tpu.pipeline()`` -> ready
    AudioToImagePipeline (imported lazily to keep bare import light)."""
    from clap2diffusion_tpu.diffusion.pipeline import AudioToImagePipeline

    return AudioToImagePipeline(cfg or Config(), params=params, seed=seed)
