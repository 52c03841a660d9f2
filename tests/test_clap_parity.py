"""CLAP parity: our Flax towers + frontend vs torch transformers ClapModel,
at FULL laion/clap-htsat-unfused geometry with RANDOM weights (no downloads —
a randomly initialized torch ClapModel is the golden reference; architecture
parity is what matters, real checkpoints then convert identically).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from clap2diffusion_tpu.core.config import AudioFrontendConfig, CLAPTextConfig, HTSATConfig
from clap2diffusion_tpu.models.clap.convert import convert_clap
from clap2diffusion_tpu.models.clap.frontend import (
    log_mel_spectrogram,
    mel_filter_bank_slaney,
    prepare_waveform,
)
from clap2diffusion_tpu.models.clap.htsat import ClapAudioTower, bicubic_resize_matrix
from clap2diffusion_tpu.models.clap.text import ClapTextTower


@pytest.fixture(scope="module")
def torch_clap():
    torch.manual_seed(0)
    from transformers import ClapConfig, ClapModel

    model = ClapModel(ClapConfig()).eval()
    return model


def test_mel_filterbank_matches_hf():
    from transformers import ClapFeatureExtractor

    fe = ClapFeatureExtractor()
    ours = mel_filter_bank_slaney(513, 64, 0.0, 14_000.0, 48_000)
    np.testing.assert_allclose(ours, fe.mel_filters_slaney, atol=1e-6)


def test_log_mel_matches_feature_extractor():
    from transformers import ClapFeatureExtractor

    fe = ClapFeatureExtractor()
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=48_000 * 10) * 0.1).astype(np.float32)
    theirs = fe(wav, sampling_rate=48_000, truncation="rand_trunc",
                padding="repeatpad", return_tensors="np")["input_features"]
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(wav)[None]))
    assert theirs.shape == (1, 1, 1001, 64)
    np.testing.assert_allclose(ours[0], theirs[0, 0], atol=2e-3, rtol=1e-4)


def test_bicubic_matrix_matches_torch_interpolate():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 1, 1001, 64)).astype(np.float32)
    theirs = torch.nn.functional.interpolate(
        torch.from_numpy(x), (1024, 64), mode="bicubic", align_corners=True
    ).numpy()
    mat = bicubic_resize_matrix(1001, 1024)
    ours = np.einsum("ot,bctf->bcof", mat, x)
    # fp32 accumulation noise at 1001-tap rows; exact to 1.5e-6 at small sizes
    np.testing.assert_allclose(ours, theirs, atol=1e-3)


@pytest.mark.slow
def test_audio_tower_parity_full_geometry(torch_clap):
    sd = torch_clap.state_dict()
    audio_params, text_params, extras = convert_clap(sd)

    rng = np.random.default_rng(2)
    wav = (rng.normal(size=(2, 480_000)) * 0.05).astype(np.float32)

    from transformers import ClapFeatureExtractor

    fe = ClapFeatureExtractor()
    feats = [
        fe(w, sampling_rate=48_000, truncation="rand_trunc", padding="repeatpad",
           return_tensors="pt")["input_features"]
        for w in wav
    ]
    input_features = torch.cat(feats, dim=0)
    with torch.no_grad():
        theirs = torch_clap.get_audio_features(input_features=input_features).numpy()

    mel = log_mel_spectrogram(jnp.asarray(wav))
    tower = ClapAudioTower(cfg=HTSATConfig())
    ours = np.asarray(tower.apply({"params": audio_params}, mel))

    assert ours.shape == theirs.shape == (2, 512)
    np.testing.assert_allclose(ours, theirs, atol=2e-3)
    # normalized embeddings -> cosine similarity ~ 1
    cos = (ours * theirs).sum(-1)
    assert (cos > 0.9999).all()


def test_text_tower_parity_full_geometry(torch_clap):
    sd = torch_clap.state_dict()
    _, text_params, _ = convert_clap(sd)

    rng = np.random.default_rng(3)
    ids = rng.integers(2, 50_000, size=(2, 24)).astype(np.int64)
    ids[:, 0] = 0  # CLS
    ids[0, -4:] = 1  # pad tail of first row
    mask = (ids != 1).astype(np.int64)

    with torch.no_grad():
        theirs = torch_clap.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).numpy()

    tower = ClapTextTower(cfg=CLAPTextConfig())
    ours = np.asarray(
        tower.apply({"params": text_params}, jnp.asarray(ids), jnp.asarray(mask))
    )
    assert ours.shape == theirs.shape == (2, 512)
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_prepare_waveform_repeatpad_and_crop():
    cfg = AudioFrontendConfig()
    short = np.ones(100_000, dtype=np.float32)
    out = prepare_waveform(short, 48_000)
    assert out.shape == (480_000,)
    assert out[:100_000].sum() == pytest.approx(100_000)
    long = np.ones(500_000, dtype=np.float32)
    assert prepare_waveform(long, 48_000).shape == (480_000,)
    stereo = np.stack([np.ones(480_000), -np.ones(480_000)]).astype(np.float32)
    assert np.abs(prepare_waveform(stereo, 48_000)).max() == 0.0


def test_audio_text_similarity_matches_torch_clap(torch_clap):
    """Similarity math vs ClapModel's logits_per_audio (up to logit scale)."""
    from clap2diffusion_tpu.models.clap import audio_text_similarity

    rng = np.random.default_rng(5)
    a = rng.normal(size=(3, 512)).astype(np.float32)
    t = rng.normal(size=(4, 512)).astype(np.float32)
    sim = np.asarray(audio_text_similarity(jnp.asarray(a), jnp.asarray(t)))
    a_n = a / np.linalg.norm(a, axis=-1, keepdims=True)
    t_n = t / np.linalg.norm(t, axis=-1, keepdims=True)
    np.testing.assert_allclose(sim, a_n @ t_n.T, atol=1e-5)
    # calibrated by the checkpoint's exp(logit_scale), like ClapModel.forward
    scale = float(torch.exp(torch_clap.logit_scale_a))
    sim_scaled = np.asarray(
        audio_text_similarity(jnp.asarray(a), jnp.asarray(t), logit_scale=scale)
    )
    np.testing.assert_allclose(sim_scaled, scale * (a_n @ t_n.T), rtol=1e-5)
