#!/usr/bin/env python
"""HBM footprint of the evaluator's production-geometry metric programs
(VERDICT r4 weak #5's "peak memory" leg).

AOT-lowers each metric tower at the shapes run_evaluation actually
compiles (batched_features batch_size=16; CLAP chunk min(32, n)) and
prints XLA's memory_analysis — no parameter values are materialized
(lowering needs only avals), so the probe costs one compile each (the
compile cache makes re-runs free).

Programs probed (shapes from eval/evaluate.py):
  - InceptionV3 pool3 features        [16, 299, 299, 3]
  - CLIP-vision ViT-L features        [16, 224, 224, 3]
  - CLAP audio tower (mel + HTSAT)    [16, 480000] waveform
  - CLAP text tower (RoBERTa)         [16, 77] ids
The 512px generation program's 2.41 GiB is documented separately
(BENCH_NOTES "Serving HBM footprint").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gib(n: int) -> str:
    return f"{n / 2**30:.3f} GiB"


def main() -> None:
    import jax
    import jax.numpy as jnp

    cache = os.path.join(REPO, ".cache", "jax", "tpu")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.models.clap.frontend import log_mel_spectrogram
    from clap2diffusion_tpu.models.clap.htsat import ClapAudioTower
    from clap2diffusion_tpu.models.clap.text import ClapTextTower
    from clap2diffusion_tpu.models.clip_vision import CLIPVisionEncoder
    from clap2diffusion_tpu.models.inception_v3 import InceptionV3

    cfg = Config()
    sds = jax.ShapeDtypeStruct

    def probe(name, module, x_aval):
        p_aval = jax.eval_shape(
            lambda k, x: module.init(k, x)["params"],
            jax.random.key(0), x_aval,
        )
        fn = jax.jit(lambda p, x: module.apply({"params": p}, x))
        mem = fn.lower(p_aval, x_aval).compile().memory_analysis()
        print(f"{name}: args {gib(mem.argument_size_in_bytes)} + temp "
              f"{gib(mem.temp_size_in_bytes)} + out "
              f"{gib(mem.output_size_in_bytes)} = "
              f"{gib(mem.argument_size_in_bytes + mem.temp_size_in_bytes + mem.output_size_in_bytes)}",
              flush=True)

    probe("inception_v3 pool3 [16,299,299,3]", InceptionV3(),
          sds((16, 299, 299, 3), jnp.float32))
    probe("clip_vision ViT-L [16,224,224,3]",
          CLIPVisionEncoder(cfg=cfg.diffusion.clip_vision),
          sds((16, 224, 224, 3), jnp.float32))

    # CLAP audio: frontend + tower fused, as pipeline.encode_audio runs it
    audio_mod = ClapAudioTower(cfg=cfg.clap.audio)
    mel_aval = jax.eval_shape(
        lambda w: log_mel_spectrogram(w, cfg.clap.frontend),
        sds((16, 480000), jnp.float32),
    )
    pa_aval = jax.eval_shape(
        lambda k, m: audio_mod.init(k, m)["params"],
        jax.random.key(0), mel_aval,
    )
    fn = jax.jit(lambda p, w: audio_mod.apply(
        {"params": p}, log_mel_spectrogram(w, cfg.clap.frontend)))
    mem = fn.lower(pa_aval, sds((16, 480000), jnp.float32)) \
            .compile().memory_analysis()
    print(f"clap_audio mel+HTSAT [16,480000]: args "
          f"{gib(mem.argument_size_in_bytes)} + temp "
          f"{gib(mem.temp_size_in_bytes)} + out "
          f"{gib(mem.output_size_in_bytes)} = "
          f"{gib(mem.argument_size_in_bytes + mem.temp_size_in_bytes + mem.output_size_in_bytes)}",
          flush=True)

    text_mod = ClapTextTower(cfg=cfg.clap.text)
    ids_aval = sds((16, 77), jnp.int32)
    pt_aval = jax.eval_shape(
        lambda k, ids: text_mod.init(k, ids, jnp.ones_like(ids))["params"],
        jax.random.key(0), ids_aval,
    )
    fn = jax.jit(lambda p, ids: text_mod.apply({"params": p}, ids))
    mem = fn.lower(pt_aval, ids_aval).compile().memory_analysis()
    print(f"clap_text RoBERTa [16,77]: args "
          f"{gib(mem.argument_size_in_bytes)} + temp "
          f"{gib(mem.temp_size_in_bytes)} + out "
          f"{gib(mem.output_size_in_bytes)} = "
          f"{gib(mem.argument_size_in_bytes + mem.temp_size_in_bytes + mem.output_size_in_bytes)}",
          flush=True)


if __name__ == "__main__":
    main()
