"""Data pipeline tests: caption parser semantics (vs the reference's
documented outputs), fixtures, latent dataset splits/pairing/fallbacks,
prefetch loader, and the VAE latent precompute tool."""

import json
import numpy as np
import pytest

from clap2diffusion_tpu.data.caption_parser import AudioCaptionParser
from clap2diffusion_tpu.data.fixtures import make_fixture_dataset
from clap2diffusion_tpu.data.latent_dataset import AudioCapsLatentDataset, PrefetchLoader


def test_caption_parser_hierarchy():
    p = AudioCaptionParser()
    parsed = p.parse_caption("A woman speaks while a dog barks in the background")
    assert parsed["relationships"] == "simultaneous"
    assert any("woman speaks" in s for s in parsed["primary"])
    assert parsed["categories"] == ["human", "animal"] or set(
        parsed["categories"]
    ) >= {"human", "animal"}
    labels = p.get_hierarchy_labels(parsed)
    assert labels["foreground"] and labels["background"] and labels["ambience"]


def test_caption_parser_relationship_kinds():
    p = AudioCaptionParser()
    assert p.parse_caption("a cat meows and a door opens")["relationships"] == "additive"
    assert p.parse_caption("a man talks at a concert")["relationships"] == "spatial"
    # note: substring matching (reference semantics) means words containing
    # "in"/"as" etc. trigger spatial/temporal; pick a clean single-event text
    assert p.parse_caption("thunder rumbles loudly")["relationships"] == "single"


def test_caption_parser_actions_and_complexity():
    p = AudioCaptionParser()
    parsed = p.parse_caption("Music playing with people talking and laughing")
    assert "playing" in parsed["actions"]
    assert "talking" in parsed["actions"]
    assert parsed["complexity"] in ("moderate", "complex")
    # reference formula: len(split(' and ')) + len(split(' while ')) -> a
    # single-event caption scores 2 ("moderate"); match that behavior
    assert p.parse_caption("rain falls")["complexity"] == "moderate"
    assert (
        p.parse_caption("a dog barks and rain falls and wind blows")["complexity"]
        == "complex"
    )


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("audiocaps")
    make_fixture_dataset(str(root), n_train=6, n_val=2, n_test=2,
                         duration_s=0.2, latent_hw=8)
    return str(root)


def test_latent_dataset_splits(fixture_root):
    train = AudioCapsLatentDataset(fixture_root, "train", audio_duration=0.2,
                                   latent_hw=8)
    val = AudioCapsLatentDataset(fixture_root, "val", audio_duration=0.2,
                                 latent_hw=8)
    assert len(train) == 6 and len(val) == 2
    item = train[0]
    assert item["audio"].shape == (int(0.2 * 48_000),)
    assert item["latent"].shape == (8, 8, 4)  # NHWC
    assert isinstance(item["caption"], str) and item["caption"]


def test_latent_dataset_pairing(fixture_root):
    shifted = AudioCapsLatentDataset(
        fixture_root, "train", audio_duration=0.2, latent_hw=8,
        composition_strategy="shifted", composition_shift=2,
    )
    assert shifted.pairs[0] == (0, 2)
    rnd = AudioCapsLatentDataset(
        fixture_root, "train", audio_duration=0.2, latent_hw=8,
        composition_strategy="random",
    )
    assert sorted(j for _, j in rnd.pairs) == list(range(6))


def test_latent_dataset_zero_fallback(fixture_root, tmp_path):
    ds = AudioCapsLatentDataset(fixture_root, "train", audio_duration=0.2,
                                latent_hw=8)
    # corrupt one latent file -> zero fallback, no crash
    sid = ds.samples[0]["id"]
    bad = ds.latents_dir / f"{sid}.npy"
    bad.write_bytes(b"not a npy")
    item = ds[0]
    assert float(np.abs(item["latent"]).max()) == 0.0


def test_split_fallback_when_no_split_field(tmp_path):
    root = tmp_path / "ds"
    make_fixture_dataset(str(root), n_train=10, n_val=0, n_test=0,
                         duration_s=0.1, latent_hw=8)
    meta = json.loads((root / "metadata_unified.json").read_text())
    for s in meta["samples"]:
        del s["split"]
    (root / "metadata_unified.json").write_text(json.dumps(meta))
    tr = AudioCapsLatentDataset(str(root), "train", audio_duration=0.1, latent_hw=8)
    va = AudioCapsLatentDataset(str(root), "val", audio_duration=0.1, latent_hw=8)
    te = AudioCapsLatentDataset(str(root), "test", audio_duration=0.1, latent_hw=8)
    assert len(tr) == 8 and len(va) == 1 and len(te) == 1


def test_prefetch_loader(fixture_root):
    ds = AudioCapsLatentDataset(fixture_root, "train", audio_duration=0.2,
                                latent_hw=8)
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    assert batches[0]["audio"].shape == (2, int(0.2 * 48_000))
    assert batches[0]["latent"].shape == (2, 8, 8, 4)
    # deterministic order per (seed, epoch)
    again = list(loader.epoch(0))
    assert batches[0]["audio_id"] == again[0]["audio_id"]
    other = list(loader.epoch(1))
    assert any(b["audio_id"] != o["audio_id"] for b, o in zip(batches, other))


def test_prefetch_loader_disjoint_shards(fixture_root):
    """Multi-host sharding: same seed + strided slice -> per-epoch disjoint
    partitions whose union is the dataset (VERDICT round-2 missing #3)."""
    ds = AudioCapsLatentDataset(fixture_root, "train", audio_duration=0.2,
                                latent_hw=8)
    loaders = [
        PrefetchLoader(ds, batch_size=1, shuffle=True, seed=7,
                       shard_index=i, num_shards=2, drop_last=False)
        for i in (0, 1)
    ]
    seen = []
    for ld in loaders:
        ids = [b["audio_id"][0] for b in ld.epoch(3)]
        assert len(ids) == len(ld) == 3
        seen.append(set(ids))
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == {ds[i]["audio_id"] for i in range(len(ds))}
    # shards reshuffle across epochs but stay disjoint
    ids0_e4 = {b["audio_id"][0] for b in loaders[0].epoch(4)}
    ids1_e4 = {b["audio_id"][0] for b in loaders[1].epoch(4)}
    assert ids0_e4.isdisjoint(ids1_e4)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shard_index"):
        PrefetchLoader(ds, batch_size=1, shard_index=2, num_shards=2)

    # uneven split (6 samples, 4 shards): every shard gets the SAME
    # truncated size so hosts advance epochs in lockstep — unequal sizes
    # would drift hosts onto different epoch permutations, whose strided
    # slices are NOT disjoint (review r3 finding #1)
    l4 = [PrefetchLoader(ds, batch_size=1, seed=7, shard_index=i,
                         num_shards=4, drop_last=False) for i in range(4)]
    sets = [{b["audio_id"][0] for b in ld.epoch(0)} for ld in l4]
    assert all(len(ld) == 1 for ld in l4)
    assert all(len(s) == 1 for s in sets)
    assert len(set().union(*sets)) == 4  # pairwise disjoint
    # a shard smaller than the batch raises instead of silently yielding
    # nothing (which would hang the multi-host training loop)
    tiny = PrefetchLoader(ds, batch_size=8, seed=7, shard_index=0,
                          num_shards=2)
    with _pytest.raises(ValueError, match="fewer than batch_size"):
        next(tiny.epoch(0))


@pytest.mark.slow
def test_encode_latents_tool(tmp_path):
    from PIL import Image

    from clap2diffusion_tpu.data.prepare import encode_latents

    root = tmp_path / "ds"
    frames = root / "frames"
    frames.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        ).save(frames / f"vid_{i}.png")

    import jax, jax.numpy as jnp
    from clap2diffusion_tpu.core.config import VAEConfig
    from clap2diffusion_tpu.models.vae import AutoencoderKL

    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4)
    vae = AutoencoderKL(cfg=cfg)
    params = vae.init(jax.random.key(0), jnp.ones((1, 32, 32, 3)), jax.random.key(1))["params"]

    # monkeypatch-free: pass params + small image size
    n = encode_latents(str(root), vae_params=params, vae_cfg=cfg, batch_size=2, image_size=32)
    assert n == 3
    lat = np.load(root / "latents" / "vid_0.npy")
    assert lat.shape == (4, 4, 4)  # NCHW file format, 32/8=4
