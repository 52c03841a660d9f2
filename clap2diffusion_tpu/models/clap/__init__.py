from clap2diffusion_tpu.models.clap.frontend import (
    log_mel_spectrogram,
    mel_filter_bank_slaney,
    prepare_waveform,
)
from clap2diffusion_tpu.models.clap.htsat import ClapAudioTower, HTSATEncoder
from clap2diffusion_tpu.models.clap.text import ClapTextTower
from clap2diffusion_tpu.models.clap.convert import (
    convert_clap,
    convert_clap_audio,
    convert_clap_text,
)


def audio_text_similarity(audio_emb, text_emb, logit_scale: float = 1.0):
    """Cosine-similarity matrix between normalized CLAP embeddings
    [Na,512] x [Nt,512] -> [Na,Nt] (reference models/audio_encoder.py:287-309;
    pass the checkpoint's exp(logit_scale_a) for calibrated logits)."""
    import jax.numpy as jnp

    a = audio_emb / (jnp.linalg.norm(audio_emb, axis=-1, keepdims=True) + 1e-8)
    t = text_emb / (jnp.linalg.norm(text_emb, axis=-1, keepdims=True) + 1e-8)
    return logit_scale * (a @ t.T)


__all__ = [
    "log_mel_spectrogram", "mel_filter_bank_slaney", "prepare_waveform",
    "ClapAudioTower", "HTSATEncoder", "ClapTextTower",
    "convert_clap", "convert_clap_audio", "convert_clap_text",
    "audio_text_similarity",
]
