"""End-to-end audio+text -> image pipeline.

Implements (for real) the path the reference stubs out
(reference scripts/inference.py:101-166: CLAP encode -> hierarchical tokens +
Norm-60 -> DDIM with CFG -> image; the CLAP embed and SD sampling there are
placeholders returning random tensors).

Everything after host-side audio decode is ONE jit-compiled function per
(batch, steps, mode): log-mel -> HTSAT -> hierarchical conditioning ->
50-step DDIM lax.scan with folded CFG -> VAE decode. The conditional and
unconditional UNet passes are batched (2B), and — matching the reference's
diffusers semantics, where one ``cross_attention_kwargs`` serves the whole
doubled batch — the audio conditioning applies to both CFG halves; the
guidance contrast comes from the text prompt.

Model types (reference app/gradio_app.py:113-118):
- ``hierarchical``: routed early/mid/late injection + CLIP text context.
- ``sonic``: 16 adapter tokens (Norm-60) injected at every level.
- ``baseline``: text only.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clap2diffusion_tpu.core.config import Config
from clap2diffusion_tpu.models.clap.frontend import log_mel_spectrogram, prepare_waveform
from clap2diffusion_tpu.models.clap.htsat import ClapAudioTower
from clap2diffusion_tpu.models.clip_text import CLIPTextEncoder
from clap2diffusion_tpu.models.condition import AudioAdapter, HierarchicalAudioEncoder
from clap2diffusion_tpu.models.unet import UNet2DCondition
from clap2diffusion_tpu.models.vae import AutoencoderKL
from clap2diffusion_tpu.diffusion.ddim import (
    SAMPLERS,
    NoiseSchedule,
    cfg_eps_fn,
    ddim_timesteps,
)
from clap2diffusion_tpu.ops.token_norm import rescale_to_norm


@dataclass
class PipelineModules:
    clap_audio: ClapAudioTower
    clip_text: CLIPTextEncoder
    hierarchical: HierarchicalAudioEncoder
    adapter: AudioAdapter
    unet: UNet2DCondition
    vae: AutoencoderKL


def build_modules(cfg: Config) -> PipelineModules:
    return PipelineModules(
        clap_audio=ClapAudioTower(cfg=cfg.clap.audio),
        clip_text=CLIPTextEncoder(cfg=cfg.diffusion.clip_text),
        hierarchical=HierarchicalAudioEncoder(cfg=cfg.condition),
        adapter=AudioAdapter(cfg=cfg.condition),
        unet=UNet2DCondition(cfg=cfg.diffusion.unet),
        vae=AutoencoderKL(cfg=cfg.diffusion.vae),
    )


def init_params(cfg: Config, seed: int = 0, dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init all module params (converters/orbax replace them later).

    Each init is jit-compiled: eager flax init dispatches thousands of tiny
    ops, which is pathological through a remote TPU tunnel.
    """
    m = build_modules(cfg)
    keys = jax.random.split(jax.random.key(seed), 6)
    lat = cfg.diffusion.image_size // 8

    def jinit(module, *args):
        return jax.jit(lambda k: module.init(k, *args))

    params = {
        "clap_audio": jinit(
            m.clap_audio, jnp.ones((1, 1001, cfg.clap.frontend.num_mel_bins))
        )(keys[0])["params"],
        "clip_text": jinit(
            m.clip_text, jnp.ones((1, cfg.diffusion.clip_text.max_length), jnp.int32)
        )(keys[1])["params"],
        "hierarchical": jinit(
            m.hierarchical, jnp.ones((1, cfg.condition.clap_dim)), 1.0
        )(keys[2])["params"],
        "adapter": jinit(m.adapter, jnp.ones((1, cfg.condition.clap_dim)))(
            keys[3]
        )["params"],
        "unet": jinit(
            m.unet,
            jnp.ones((1, lat, lat, 4)),
            jnp.ones((1,), jnp.int32),
            jnp.ones((1, 77, cfg.diffusion.unet.cross_attention_dim)),
            {lvl: jnp.ones((1, cfg.condition.num_tokens,
                            cfg.diffusion.unet.cross_attention_dim))
             for lvl in ("early", "mid", "late")},
        )(keys[4])["params"],
        "vae": jinit(m.vae, jnp.ones((1, 64, 64, 3)), jax.random.key(0))(
            keys[5]
        )["params"],
    }
    if dtype != jnp.float32:
        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return params


def params_cache_path(cfg: Config, seed: int = 0, dtype=jnp.float32,
                      cache_dir: Optional[str] = None) -> Optional[str]:
    """Deterministic on-disk location for a (geometry, seed, dtype) param
    set — the key ``cached_init_params`` uses. None when no cache dir is
    configured (``cache_dir`` arg or ``C2D_PARAM_CACHE``)."""
    cache_dir = cache_dir or os.environ.get("C2D_PARAM_CACHE")
    if not cache_dir:
        return None
    import hashlib
    import json

    from clap2diffusion_tpu.core.config import to_dict

    key = hashlib.sha256(
        json.dumps([to_dict(cfg), seed, str(jnp.dtype(dtype))],
                   sort_keys=True, default=str).encode()
    ).hexdigest()[:16]
    return os.path.join(os.path.abspath(cache_dir), f"params_{key}")


def restore_params_host(path: str) -> Dict[str, Any]:
    """Restore a ``save_pipeline`` checkpoint to HOST numpy arrays — no
    device placement. Separating disk->host from host->device lets callers
    overlap the device upload with XLA compilation (bench.py's cold-start
    path: on a tunneled TPU the ~GiB upload and the 50-step-program compile
    are each minutes, and neither needs the other)."""
    import orbax.checkpoint as ocp

    p = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        # the default restore builds jax.Arrays on the DEFAULT device (the
        # tunneled TPU on the bench host — the transfer this function
        # exists to defer); request np.ndarray leaves explicitly
        meta = ckptr.metadata(p).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
            dict(meta) if hasattr(meta, "keys") else meta,
        )
        return ckptr.restore(p, restore_args=restore_args)
    finally:
        ckptr.close()


def cached_init_params(cfg: Config, seed: int = 0, dtype=jnp.float32,
                       cache_dir: Optional[str] = None) -> Dict[str, Any]:
    """init_params with an on-disk orbax cache.

    Random init of the full SD stack jit-compiles six programs; on a remote
    TPU that is minutes of compile per process. Benchmarks and tools set
    ``C2D_PARAM_CACHE`` (or pass ``cache_dir``) to pay it once. The cache key
    covers seed/dtype/geometry; anything else falls back to a fresh init.
    """
    path = params_cache_path(cfg, seed=seed, dtype=dtype, cache_dir=cache_dir)
    if path is None:
        return init_params(cfg, seed=seed, dtype=dtype)
    if os.path.exists(path):
        import orbax.checkpoint as ocp

        abstract = jax.eval_shape(
            lambda: init_params(cfg, seed=seed, dtype=dtype)
        )
        return ocp.StandardCheckpointer().restore(path, abstract)
    params = init_params(cfg, seed=seed, dtype=dtype)
    save_pipeline(path, params)
    return params


def _dequantize_pcm16(waveform: jax.Array) -> jax.Array:
    """Device-side counterpart of the int16 PCM16 upload path (see
    ``load_audio``): dequantize and peak-normalize. Dividing the int16
    samples by their own peak equals peak_normalize(x/32768) exactly, as
    long as the host kept the global peak inside the window (load_audio
    guarantees it). Float input passes through unchanged."""
    if waveform.dtype != jnp.int16:
        return waveform
    wf = waveform.astype(jnp.float32)
    peak = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
    return wf / jnp.maximum(peak, 1.0)


class AudioToImagePipeline:
    """Host-facing pipeline. Heavy math is jit-cached per static signature.

    The reference equivalent is ``AudioToImageInference``
    (reference scripts/inference.py:21-180) plus the gradio ``generate`` knobs
    (norm_value, steps, cfg, seed, model_type — reference app/gradio_app.py:52-92).
    """

    def __init__(self, cfg: Config, params: Optional[Dict] = None, seed: int = 0):
        self.cfg = cfg
        self.m = build_modules(cfg)
        self.params = params if params is not None else init_params(cfg, seed)
        self.schedule = NoiseSchedule.create(cfg.diffusion.scheduler)
        # compute dtype follows the parameters (bf16 params => bf16 MXU path)
        self.compute_dtype = jax.tree.leaves(self.params["unet"])[0].dtype

    # -- host-side frontends -------------------------------------------------

    def load_audio(self, path: str) -> np.ndarray:
        from clap2diffusion_tpu.models.clap.frontend import fit_to_length
        from clap2diffusion_tpu.utils.audio_io import (
            peak_normalize,
            read_audio,
            read_wav_pcm16,
        )

        # PCM16 fast path: mono 16-bit WAV at the target rate stays int16
        # end-to-end — half the host->device bytes of float32 (the tunnel
        # upload is a measurable slice of serving latency, BENCH_NOTES.md),
        # dequantized + peak-normalized on device inside _generate_jit.
        # Lossless: x_i16/peak == peak_normalize(x_i16/32768) — but only
        # when cropping keeps the global peak (the float path normalizes
        # the FULL file before cropping; repeatpad always preserves the
        # peak, a crop may not). Louder-tail files take the float path.
        pcm = read_wav_pcm16(path)
        if pcm is not None and pcm[1] == self.cfg.clap.frontend.sample_rate:
            x, n = pcm[0], self.cfg.clap.frontend.num_samples
            if len(x) <= n or np.abs(x[:n]).max() == np.abs(x).max():
                return fit_to_length(x, n)

        wav, sr = read_audio(path)
        wav = peak_normalize(wav)  # (reference scripts/inference.py:73-83)
        return prepare_waveform(wav, sr, self.cfg.clap.frontend)

    def load_init_image(self, source, mask: bool = False) -> np.ndarray:
        """Load an init image (or inpainting mask) from a path, PIL image or
        array into the uint8 geometry ``generate`` expects — the ONE image
        frontend shared by the CLI, HTTP server and gradio app. Masks use
        nearest-neighbour resizing (no interpolation halos) and grayscale."""
        from PIL import Image

        if isinstance(source, (str, bytes)) or hasattr(source, "read"):
            img = Image.open(source)  # path or file-like (e.g. BytesIO)
        elif isinstance(source, Image.Image):
            img = source
        else:
            arr = np.asarray(source)
            if np.issubdtype(arr.dtype, np.floating):
                arr = (np.clip(arr, 0.0, 1.0) * 255.0).round()
            img = Image.fromarray(arr.astype(np.uint8))
        size = self.cfg.diffusion.image_size
        if mask:
            return np.asarray(
                img.convert("L").resize((size, size), Image.NEAREST), np.uint8
            )
        return np.asarray(
            img.convert("RGB").resize((size, size), Image.LANCZOS), np.uint8
        )

    # -- jitted stages -------------------------------------------------------
    # NOTE: params are explicit jit arguments everywhere. Closing over
    # ``self.params`` would capture gigabytes of weights as compile-time
    # constants (XLA then folds them into the program — pathological compile
    # times and duplicated HBM).

    @functools.partial(jax.jit, static_argnums=0)
    def _encode_audio_impl(self, clap_params, waveform: jax.Array) -> jax.Array:
        waveform = _dequantize_pcm16(waveform)
        mel = log_mel_spectrogram(waveform, self.cfg.clap.frontend)
        return self.m.clap_audio.apply({"params": clap_params}, mel)

    def encode_audio(self, waveform: jax.Array) -> jax.Array:
        """waveform [B, samples] -> normalized CLAP embedding [B, 512].

        Accepts float32 (already peak-normalized by ``load_audio``) or the
        int16 PCM16 fast path's output, which is dequantized on device the
        same way ``_generate_jit`` does."""
        return self._encode_audio_impl(self.params["clap_audio"], waveform)

    @functools.partial(jax.jit, static_argnums=0)
    def _encode_text_impl(self, clip_params, input_ids: jax.Array) -> jax.Array:
        return self.m.clip_text.apply({"params": clip_params}, input_ids)

    def encode_text(self, input_ids: jax.Array) -> jax.Array:
        return self._encode_text_impl(self.params["clip_text"], input_ids)

    def _condition(self, params, clap_emb: jax.Array, model_type: str,
                   norm_target: float, temperature: float):
        """CLAP [B,512] -> (tokens77, routed audio dict) per model type."""
        if model_type == "baseline":
            return None, None
        if model_type == "sonic":
            tokens = self.m.adapter.apply({"params": params["adapter"]}, clap_emb)
            tokens = rescale_to_norm(tokens, norm_target)
            return None, {lvl: tokens for lvl in ("early", "mid", "late")}
        tokens77, info = self.m.hierarchical.apply(
            {"params": params["hierarchical"]}, clap_emb, temperature,
            return_all=True,
        )
        routed = {
            lvl: rescale_to_norm(t, norm_target)
            for lvl, t in info["routed"].items()
        }
        return rescale_to_norm(tokens77, norm_target), routed

    @functools.partial(jax.jit, static_argnums=(0, 5, 7, 9, 12, 13))
    def _generate_jit(
        self,
        params,
        waveform: Optional[jax.Array],
        text_ids: jax.Array,
        uncond_ids: jax.Array,
        num_steps: int,
        guidance_scale: jax.Array,
        model_type: str,
        seed: jax.Array,
        batch: int,
        norm_target: jax.Array,
        temperature: jax.Array,
        sampler: str = "ddim",
        init_steps: int = 0,
        init_image: Optional[jax.Array] = None,
        waveform2: Optional[jax.Array] = None,
        audio_mix: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        seeds: Optional[jax.Array] = None,
        guidance_rescale: jax.Array | float = 0.0,
    ) -> jax.Array:
        # PRNG key derived on device: a host-side jax.random.key() is its own
        # dispatch, and on the tunneled backend every dispatch costs a ~30 ms
        # round-trip (measured; see BENCH_NOTES.md).
        rng = jax.random.key(seed)
        # Sampler noise stream (used by stochastic samplers only): a fold_in
        # tag keeps it disjoint from the init-latent / VAE streams, and the
        # deterministic samplers `del` it, so XLA DCEs the derivation and
        # their compiled programs — and the frozen image golden — are
        # unchanged.
        samp_rng = jax.random.fold_in(rng, 0x5A)
        # CLAP encode fused into the same program: one dispatch per image
        # (a separate encode call costs an extra host round-trip).
        clap_emb = None
        if waveform is not None:
            wf = _dequantize_pcm16(waveform)
            if waveform2 is not None:
                # Compositional serving: encode both sources in ONE batched
                # CLAP call, blend embeddings, re-normalize (CLAP embeddings
                # live on the unit sphere). The serve-time counterpart of the
                # dataset's balanced/creative composition pairing
                # (reference data/dataset.py:133-181).
                wf = jnp.concatenate([wf, _dequantize_pcm16(waveform2)], axis=0)
            mel = log_mel_spectrogram(wf, self.cfg.clap.frontend)
            clap_emb = self.m.clap_audio.apply(
                {"params": params["clap_audio"]}, mel
            )
            if waveform2 is not None:
                n = clap_emb.shape[0] // 2
                mixed = audio_mix * clap_emb[:n] + (1.0 - audio_mix) * clap_emb[n:]
                clap_emb = mixed / jnp.maximum(
                    jnp.linalg.norm(mixed, axis=-1, keepdims=True), 1e-8
                )
            if batch > 1 and clap_emb.shape[0] == 1:
                clap_emb = jnp.broadcast_to(clap_emb, (batch, clap_emb.shape[1]))
        # one batched CLIP call for cond+uncond prompts
        ehs_both = self.m.clip_text.apply(
            {"params": params["clip_text"]},
            jnp.concatenate([text_ids, uncond_ids], axis=0),
        )
        ehs_cond, ehs_uncond = jnp.split(ehs_both, 2, axis=0)
        tokens77, routed = (
            (None, None)
            if clap_emb is None
            else self._condition(params, clap_emb, model_type, norm_target,
                                 temperature)
        )
        if model_type == "audio_tokens" and tokens77 is not None:
            # 77-token replacement path: hierarchical audio tokens stand in
            # for the CLIP text context (SURVEY.md section 1, path 1 —
            # reference models/hierarchical_audio_v4.py:464-492 produces
            # CLIP-shaped tokens usable anywhere text embeddings go).
            ehs_cond = tokens77.astype(ehs_cond.dtype)

        def unet_apply(lat, t, ctx, audio):
            return self.m.unet.apply({"params": params["unet"]}, lat, t, ctx, audio)

        eps_fn = cfg_eps_fn(
            unet_apply, ehs_cond, ehs_uncond, guidance_scale,
            audio_cond=routed, audio_uncond=routed,
            guidance_rescale=guidance_rescale,
        )
        lat_size = self.cfg.diffusion.image_size // 8
        if init_steps > 0 and init_image is not None:
            # SDEdit-style img2img: VAE-encode the init image, noise it to
            # the first timestep of the tail slice, denoise only that tail.
            ts_full = ddim_timesteps(num_steps, self.schedule.num_train_timesteps)
            ts = ts_full[num_steps - init_steps:]
            rng_enc, rng_noise = jax.random.split(rng)
            x = (init_image.astype(jnp.float32) / 127.5 - 1.0).astype(
                self.compute_dtype
            )
            if batch > 1 and x.shape[0] == 1:
                x = jnp.broadcast_to(x, (batch,) + x.shape[1:])
            x0 = self.m.vae.apply(
                {"params": params["vae"]}, x, rng_enc,
                method=AutoencoderKL.sample_latent,
            )
            noise = jax.random.normal(rng_noise, x0.shape).astype(x0.dtype)
            t0 = jnp.full((x0.shape[0],), ts[0], jnp.int32)
            latents = self.schedule.add_noise(x0, noise, t0)
            blend_fn = None
            if mask is not None:
                # Inpainting: after every sampler update, re-impose the
                # known (mask=0) region as the init latent noised to the
                # step's noise level (x0 exactly at the final step). The
                # blend lives inside the scan — still one device program.
                m = mask.astype(jnp.float32)

                def blend_fn(lat, t_prev):
                    tp = jnp.full((x0.shape[0],), jnp.maximum(t_prev, 0),
                                  jnp.int32)
                    known = jnp.where(
                        t_prev >= 0,
                        self.schedule.add_noise(x0, noise, tp),
                        x0,
                    )
                    out = m * lat.astype(jnp.float32) + (1.0 - m) * known.astype(jnp.float32)
                    return out.astype(lat.dtype)

            latents = SAMPLERS[sampler](
                eps_fn, self.schedule, latents, num_steps, timesteps=ts,
                blend_fn=blend_fn, rng=samp_rng,
            )
        else:
            if seeds is not None:
                # Per-lane seeds: each image's noise is a function of ITS
                # seed alone — independent of batch composition (identical
                # group shapes reproduce bit-exactly; across different
                # batch sizes XLA's per-shape compilations can differ by
                # ~1 ulp). The scalar path below draws one batch-shaped
                # tensor from one key — lane-order-dependent — and is kept
                # unchanged for golden stability.
                keys = jax.vmap(jax.random.key)(seeds)
                latents = jax.vmap(
                    lambda k: jax.random.normal(k, (lat_size, lat_size, 4))
                )(keys).astype(self.compute_dtype)
                # per-lane sampler stream: image i's ancestral noise depends
                # only on seeds[i] (same coalescing contract as the init
                # latents above)
                samp_rng = jax.vmap(lambda k: jax.random.fold_in(k, 0x5A))(keys)
            else:
                latents = jax.random.normal(
                    rng, (batch, lat_size, lat_size, 4)
                ).astype(self.compute_dtype)
            latents = SAMPLERS[sampler](eps_fn, self.schedule, latents,
                                        num_steps, rng=samp_rng)
        img = self.m.vae.apply(
            {"params": params["vae"]}, latents,
            method=AutoencoderKL.decode_latent,
        )
        return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

    # -- public API ----------------------------------------------------------

    def generate(self, *args, **kw) -> np.ndarray:
        """Generate images [B, H, W, 3] uint8 (blocking).

        Defaults mirror the reference CLI: 50 steps, CFG 7.5, Norm-60
        (reference scripts/inference.py:107-108,32). Same signature as
        ``_dispatch_generate``; this materializes the result on host.
        """
        return np.asarray(self._dispatch_generate(*args, **kw))

    def _dispatch_generate(
        self,
        waveform: Optional[np.ndarray] = None,
        text_ids: Optional[np.ndarray] = None,
        uncond_ids: Optional[np.ndarray] = None,
        *,
        num_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        norm_target: Optional[float] = None,
        temperature: float = 0.5,
        model_type: str = "hierarchical",
        seed: int = 0,
        batch: int = 1,
        sampler: Optional[str] = None,
        init_image: Optional[np.ndarray] = None,
        strength: float = 0.8,
        waveform2: Optional[np.ndarray] = None,
        audio_mix: float = 0.5,
        mask_image: Optional[np.ndarray] = None,
        seeds: Optional[np.ndarray] = None,
        guidance_rescale: float = 0.0,
    ) -> jax.Array:
        """Asynchronous ``generate``: prepares args and dispatches the one
        jitted program, returning the on-device image without fetching it
        (dispatch itself is ~10 ms; see ``generate_stream``).

        ``seeds`` (int32 [batch]) switches initial-latent noise to per-lane
        key derivation: image i's noise depends only on ``seeds[i]``,
        independent of batch composition — the contract the server's
        request coalescer relies on (cross-batch-size reruns can still
        differ by per-shape XLA compilation rounding, ≤1 uint8 step).
        Mutually exclusive with ``init_image`` (img2img's VAE sampling and
        noising use the scalar ``seed`` path).

        Beyond the reference surface: ``init_image`` (uint8 [H,W,3] or
        [B,H,W,3]) + ``strength`` runs SDEdit-style img2img (VAE-encode,
        noise to ``round(steps*strength)`` from the schedule tail, denoise
        that tail); ``mask_image`` (uint8 [H,W], nonzero = regenerate)
        turns that into inpainting (use ``strength=1.0`` for pure
        inpainting); ``waveform2`` + ``audio_mix`` blends two audio
        sources' CLAP embeddings (``audio_mix`` = weight of the first)."""
        sch = self.cfg.diffusion.scheduler
        sampler = sampler or sch.sampler
        if sampler not in SAMPLERS:
            raise ValueError(
                f"unknown sampler {sampler!r}; available: {sorted(SAMPLERS)}"
            )
        num_steps = num_steps or sch.num_inference_steps
        guidance_scale = (
            sch.guidance_scale if guidance_scale is None else guidance_scale
        )
        norm_target = (
            self.cfg.condition.audio_norm_target if norm_target is None else norm_target
        )
        max_len = self.cfg.diffusion.clip_text.max_length
        if text_ids is None:
            text_ids = np.zeros((batch, max_len), np.int32)
        if uncond_ids is None:
            uncond_ids = np.zeros((batch, max_len), np.int32)

        # All argument prep stays in numpy: each host-side jnp op (asarray
        # with conversion, [None] reshape, random.key) is a separate device
        # dispatch, and on the tunneled backend every dispatch is a ~30 ms
        # round-trip — six of them cost ~0.2 s of the ~1.3 s image budget.
        # numpy args ride along with the one _generate_jit dispatch.
        def prep_wav(w):
            if w is None:
                return None
            w = np.asarray(w)
            if w.dtype != np.int16:  # int16 rides through (PCM16 path)
                w = w.astype(np.float32)
            return w[None] if w.ndim == 1 else w

        wav = prep_wav(waveform)
        wav2 = prep_wav(waveform2)
        if wav2 is not None and wav is None:
            raise ValueError("waveform2 requires waveform")
        if wav2 is not None and wav2.shape[0] != wav.shape[0]:
            # the device program splits the batched CLAP output in equal
            # halves — unequal leading dims would silently mis-blend
            raise ValueError(
                f"waveform2 batch {wav2.shape[0]} must match waveform "
                f"batch {wav.shape[0]}"
            )

        if mask_image is not None and init_image is None:
            raise ValueError("mask_image requires init_image")
        if not 0.0 <= float(guidance_rescale) <= 1.0:
            raise ValueError(
                f"guidance_rescale must be in [0, 1], got {guidance_rescale}"
            )
        if seeds is not None:
            if init_image is not None:
                raise ValueError("per-lane seeds are unsupported with "
                                 "init_image (img2img uses the scalar seed)")
            seeds = np.asarray(seeds, np.int32).reshape(-1)
            if seeds.shape[0] != batch:
                raise ValueError(
                    f"seeds has {seeds.shape[0]} entries for batch {batch}"
                )
        init_steps = 0
        init = None
        mask = None
        if init_image is not None:
            from clap2diffusion_tpu.diffusion.ddim import img2img_timesteps

            # validates strength and fixes the (static) tail length
            init_steps = int(
                img2img_timesteps(num_steps, strength,
                                  self.schedule.num_train_timesteps).shape[0]
            )
            init = np.asarray(init_image)
            if init.dtype != np.uint8:
                # a silent uint8 cast would truncate float [0,1] images to
                # near-black; be loud instead (load_init_image converts)
                raise ValueError(
                    f"init_image must be uint8 (got {init.dtype}); use "
                    "pipeline.load_init_image() to convert"
                )
            if init.ndim == 3:
                init = init[None]
            size = self.cfg.diffusion.image_size
            if init.shape[1:3] != (size, size):
                raise ValueError(
                    f"init_image must be {size}x{size}, got {init.shape[1:3]}"
                )
            if mask_image is not None:
                m = np.asarray(mask_image)
                if m.shape[-2:] != (size, size):
                    raise ValueError(
                        f"mask_image must be {size}x{size}, got {m.shape[-2:]}"
                    )
                if m.ndim == 2:
                    m = m[None]
                # absolute normalization (uint8/255, bool as-is, float
                # clipped to [0,1]) — a pixel's meaning must not depend on
                # the rest of the mask (review r3 finding)
                if m.dtype == np.uint8:
                    m = m.astype(np.float32) / 255.0
                elif m.dtype == np.bool_:
                    m = m.astype(np.float32)
                else:
                    m = np.clip(m.astype(np.float32), 0.0, 1.0)
                # latent-resolution soft mask by 8x8 block mean, prepared on
                # host (numpy) so the device program sees a tiny array
                lat = size // 8
                m = m.reshape(m.shape[0], lat, 8, lat, 8).mean(axis=(2, 4))
                mask = m[..., None].astype(np.float32)

        return self._generate_jit(
            self.params,
            wav,
            np.asarray(text_ids, np.int32),
            np.asarray(uncond_ids, np.int32),
            num_steps,
            np.float32(guidance_scale),
            model_type,
            np.int32(seed),
            batch,
            np.float32(norm_target),
            np.float32(temperature),
            sampler,
            init_steps,
            init,
            wav2,
            np.float32(audio_mix) if wav2 is not None else None,
            mask,
            seeds,
            np.float32(guidance_rescale),
        )

    def generate_stream(self, requests, *, depth: int = 2, **shared):
        """Pipelined multi-image generation; yields uint8 images in order.

        ``requests`` is an iterable of per-image ``generate`` kwarg dicts
        (``waveform``, ``text_ids``, ``seed``, ...), each merged over the
        ``shared`` kwargs. Device dispatch is asynchronous (~10 ms), so
        keeping ``depth`` requests in flight overlaps one request's
        waveform upload and image download with its neighbours' device
        compute — on a tunneled backend those transfers are ~10-15% of
        per-image wall time (BENCH_NOTES.md), which a sequential
        ``generate`` loop pays serialized per image.
        """
        for img, _ in self.generate_stream_timed(requests, depth=depth, **shared):
            yield img

    def generate_stream_timed(self, requests, *, depth: int = 2, **shared):
        """``generate_stream`` that also yields per-request **service time**.

        Yields ``(image, service_s)`` where ``service_s`` is the
        dispatch->fetch wall time of THAT request — time in system,
        including queueing behind the ``depth-1`` requests already in
        flight. Note the distinction: under pipelining, the deltas
        *between* yields measure aggregate throughput (the device is busy
        with a neighbour while a request waits), not per-request latency —
        callers wanting a throughput number should divide total wall time
        by the image count instead of averaging inter-yield gaps.
        """
        import time
        from collections import deque

        in_flight: deque = deque()

        def drain():
            t_dispatch, fut = in_flight.popleft()
            img = np.asarray(fut)  # blocks until fetched over the tunnel
            return img, time.perf_counter() - t_dispatch

        for req in requests:
            in_flight.append(
                (time.perf_counter(),
                 self._dispatch_generate(**dict(shared, **req)))
            )
            if len(in_flight) >= max(1, depth):
                yield drain()
        while in_flight:
            yield drain()

    # -- best-of-n reranked serving (beyond the reference surface) -----------

    @functools.partial(jax.jit, static_argnums=0)
    def _select_best_impl(self, vision_params, text_params, text_projection,
                          imgs: jax.Array, text_ids: jax.Array):
        """Score candidate images [n,H,W,3] uint8 against ONE prompt by
        CLIPScore and return (best image, per-lane scores). Runs entirely
        on device: the n-image batch never crosses the tunnel — only the
        winner and n floats do (a batch-8 512px fetch is ~6 MB at
        ~10-20 MB/s, BENCH_NOTES.md)."""
        from clap2diffusion_tpu.models.clip_vision import (
            CLIPVisionEncoder,
            clip_text_features,
            preprocess_images_device,
        )

        vision = CLIPVisionEncoder(cfg=self.cfg.diffusion.clip_vision)
        px = preprocess_images_device(
            imgs, self.cfg.diffusion.clip_vision.image_size
        )
        feats = vision.apply({"params": vision_params}, px)  # [n,proj], L2'd
        hidden = self.m.clip_text.apply({"params": text_params}, text_ids)
        tf = clip_text_features(hidden, text_ids, text_projection)  # [1,proj]
        cos = (feats.astype(jnp.float32) * tf).sum(-1)  # [n]
        scores = jnp.maximum(cos * 100.0, 0.0)  # CLIPScore (eval/metrics.py)
        return jnp.take(imgs, jnp.argmax(scores), axis=0), scores

    def _dispatch_best_of(self, n: int, *, waveform=None, text_ids=None,
                          uncond_ids=None, seed: int = 0, seeds=None,
                          waveform2=None, **knobs):
        """Async best-of-n: two device dispatches (generate batch-n with
        per-lane seeds, then score+argmax-select), no host fetch in
        between. Returns (best_image, scores) on device."""
        if n < 1:
            raise ValueError(f"best-of n must be >= 1, got {n}")
        missing = {"clip_vision", "clip_text_projection"} - set(self.params)
        if missing:
            raise ValueError(
                "best-of-n ranks candidates by CLIPScore and needs the CLIP "
                f"vision weights (params missing {sorted(missing)}); convert "
                "with tools/convert_checkpoints.py --clip-vision"
            )
        if text_ids is None:
            raise ValueError(
                "best-of-n ranks candidates against the text prompt; a text "
                "prompt is required"
            )
        if knobs.get("init_image") is not None:
            raise ValueError(
                "best-of-n is unsupported with init_image (candidates need "
                "per-lane seeds; img2img uses the scalar seed path)"
            )
        if "batch" in knobs:
            raise ValueError("best-of-n sets batch=n itself")
        text_ids = np.asarray(text_ids, np.int32)
        if text_ids.ndim == 1:
            text_ids = text_ids[None]
        if text_ids.shape[0] != 1:
            raise ValueError(
                f"best-of-n takes ONE prompt, got {text_ids.shape[0]}"
            )
        if uncond_ids is not None:
            uncond_ids = np.asarray(uncond_ids, np.int32)
            if uncond_ids.ndim == 1:
                uncond_ids = uncond_ids[None]
        if seeds is None:
            # distinct per-lane seeds derived from the base seed; lane i's
            # noise depends only on seeds[i] (the per-lane-seed contract)
            seeds = np.arange(seed, seed + n, dtype=np.int32)

        def rep(x):
            if x is None:
                return None
            x = np.asarray(x)
            if x.ndim == 1:
                x = x[None]
            return np.repeat(x, n, axis=0) if x.shape[0] == 1 else x

        imgs = self._dispatch_generate(
            waveform=rep(waveform),
            text_ids=rep(text_ids),
            uncond_ids=rep(uncond_ids),
            batch=n,
            seed=seed,
            seeds=seeds,
            waveform2=rep(waveform2),
            **knobs,
        )
        return self._select_best_impl(
            self.params["clip_vision"],
            self.params["clip_text"],
            self.params["clip_text_projection"],
            imgs,
            text_ids,
        )

    def generate_best_of(self, n: int, **kw):
        """Generate ``n`` candidates (distinct per-lane seeds) and return
        ``(best_image [H,W,3] uint8, clip_scores [n])`` — the candidate
        with the highest CLIPScore against the prompt, selected ON DEVICE.

        The serve-time quality knob the reference has no counterpart for:
        candidates ride one batched program (per-image cost drops ~30% at
        batch 8, BENCH_NOTES.md), ranking reuses the in-repo CLIP towers
        (the evaluator's CLIPScore path), and only the winning image is
        fetched. Requires converted CLIP vision weights."""
        best, scores = self._dispatch_best_of(n, **kw)
        return np.asarray(best), np.asarray(scores)


def save_pipeline(path: str, params: Dict[str, Any]) -> str:
    """Persist the full parameter set (all six towers) as one orbax
    checkpoint — the converted-weights artifact users load for serving."""
    import orbax.checkpoint as ocp

    p = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(p, params, force=True)
    ckptr.wait_until_finished()
    return p


def load_pipeline(cfg: Config, path: str, dtype=None) -> "AudioToImagePipeline":
    """Restore a pipeline from a save_pipeline checkpoint.

    Restores as-saved (no abstract tree) so optional eval towers the
    converter may have added (clip_vision / clip_text_projection /
    inception_v3) survive the round-trip; the six core towers are then
    checked for presence explicitly.

    ``C2D_INT8_WIRE=1``: restore to host numpy and ride the int8 wire
    format for the host->device upload (utils/wire.py) — ~2x fewer tunnel
    bytes on a remote-TPU host, bounded+tested weight rounding.
    """
    import orbax.checkpoint as ocp

    int8_wire = os.environ.get("C2D_INT8_WIRE") == "1"
    if int8_wire:
        params = dict(restore_params_host(path))
    else:
        ckptr = ocp.StandardCheckpointer()
        params = dict(ckptr.restore(os.path.abspath(path)))
    required = {"clap_audio", "clip_text", "hierarchical", "adapter", "unet", "vae"}
    missing = required - set(params)
    if missing:
        raise ValueError(
            f"pipeline checkpoint at {path} is missing towers: {sorted(missing)}"
        )
    # restore-as-saved skips orbax's structure check, so validate the six
    # core towers against the active config explicitly — a checkpoint from
    # a different geometry must fail HERE, not as an opaque shape error
    # mid-generation (review r3 finding #6)
    abstract = jax.eval_shape(lambda: init_params(cfg, seed=0))
    for tower in sorted(required):
        expect = jax.tree.map(lambda x: tuple(x.shape), abstract[tower])
        got = jax.tree.map(lambda x: tuple(x.shape), params[tower])
        if expect != got:
            raise ValueError(
                f"pipeline checkpoint tower {tower!r} does not match the "
                f"active config's geometry (structure or shapes differ) — "
                f"wrong --config for this checkpoint?"
            )
    if dtype is not None:
        params = jax.tree.map(lambda x: x.astype(dtype), params)
    if int8_wire:
        from clap2diffusion_tpu.utils.wire import upload_params

        params = upload_params(params, int8_wire=True)
    return AudioToImagePipeline(cfg, params=params)


def shard_pipeline_for_serving(pipe: "AudioToImagePipeline", mesh):
    """Latency-mode tensor parallelism: place the pipeline's wide kernels
    model-sharded on the mesh (``parallel.sharding.param_spec`` — the UNet
    feed-forward projections and the adapter's 256->24,576 KV head), the
    rest replicated. Under jit, GSPMD computes each sharded matmul on its
    device slice and inserts the ICI all-reduce where the next contraction
    needs the full axis — so extra chips cut single-image latency for the
    FFN share of the step, independent of batch size.

    Compose with a data axis for throughput x latency: on
    mesh {"data": D, "model": M}, ``generate_sharded`` shards the batch
    over D while every shard's UNet FFNs run M-way tensor-parallel.
    Attention stays replicated by design (the Pallas flash kernel is
    per-device; its Q/K/V kernels are below the TP width cutoff).

    Single-axis data meshes are a no-op (everything replicates), so this is
    safe to call unconditionally. Parity + placement are pinned by
    tests/test_distributed.py::test_tp_serving_parity on the virtual
    8-device mesh.
    """
    from clap2diffusion_tpu.parallel.sharding import shard_params

    pipe.params = shard_params(pipe.params, mesh)
    return pipe


def generate_sharded(
    pipe: "AudioToImagePipeline",
    mesh,
    waveforms: np.ndarray,
    text_ids: np.ndarray,
    uncond_ids: Optional[np.ndarray] = None,
    num_steps: int = 50,
    guidance_scale: float = 7.5,
    norm_target: float = 60.0,
    model_type: str = "hierarchical",
    seed: int = 0,
    sampler: str = "ddim",
    seeds: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Multi-chip serving: shard a batch of requests over the mesh's data
    axis. The single jit program is sharding-agnostic (GSPMD propagates from
    the input shardings); with B % data_axis == 0 each chip denoises its
    slice and collectives never enter the hot loop.

    ``seeds`` (int32 [B]) opts into per-lane noise derivation — the same
    contract as the single-chip path: each image depends only on its own
    seed, so request->chip placement doesn't change results. The seed
    vector shards over the data axis with everything else.

    Validated on the virtual 8-device CPU mesh
    (tests/test_pipeline.py::test_generate_sharded_mesh).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if sampler not in SAMPLERS:
        raise ValueError(
            f"unknown sampler {sampler!r}; available: {sorted(SAMPLERS)}"
        )
    b = text_ids.shape[0]
    if uncond_ids is None:
        uncond_ids = np.zeros_like(text_ids)

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    wav = put(waveforms, P("data", None))
    tids = put(text_ids.astype(np.int32), P("data", None))
    uids = put(uncond_ids.astype(np.int32), P("data", None))
    if seeds is not None:
        seeds = np.asarray(seeds, np.int32).reshape(-1)
        if seeds.shape[0] != b:
            raise ValueError(f"seeds has {seeds.shape[0]} entries for batch {b}")
        seeds = put(seeds, P("data"))
    with mesh:
        img = pipe._generate_jit(
            pipe.params,
            wav,
            tids,
            uids,
            num_steps,
            np.float32(guidance_scale),
            model_type,
            np.int32(seed),
            b,
            np.float32(norm_target),
            np.float32(0.5),
            sampler,
            seeds=seeds,
        )
    return np.asarray(img)
