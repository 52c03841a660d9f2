# CLAP2Diffusion-TPU serving image.
# Reference equivalent: pytorch/pytorch CUDA base + gradio CMD
# (reference Dockerfile:2,8-14,33-37,51-55); here a JAX/TPU base. On Cloud
# TPU VMs run with --privileged (or the TPU device plugin on GKE).

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential curl \
    && rm -rf /var/lib/apt/lists/*

# JAX with TPU support + framework deps
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint einops pyyaml pillow numpy gradio

# non-root user (reference Dockerfile:33-37)
RUN useradd -m -u 1000 appuser
WORKDIR /app
COPY --chown=appuser . /app

# native audio loader
RUN make -C native && chown -R appuser /app
USER appuser

ENV PYTHONPATH=/app \
    GRADIO_SERVER_NAME=0.0.0.0 \
    GRADIO_SERVER_PORT=7860

EXPOSE 7860
HEALTHCHECK --interval=30s --timeout=10s --start-period=120s \
    CMD curl -f http://localhost:7860/ || exit 1

CMD ["python", "-m", "clap2diffusion_tpu.apps.main", "app"]
