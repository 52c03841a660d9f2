"""Raw-media dataset tests: pairing strategies, augmentations, hierarchy
labels, image loading, load_images fast path."""

import numpy as np
import pytest

from clap2diffusion_tpu.data.fixtures import make_fixture_dataset
from clap2diffusion_tpu.data.raw_dataset import AudioCapsHierarchicalDataset


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = tmp_path_factory.mktemp("raw")
    make_fixture_dataset(str(r), n_train=12, n_val=2, n_test=1,
                         duration_s=0.3, latent_hw=8)
    # add a few image frames
    from PIL import Image

    frames = r / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(frames / f"sample_{i:05d}.jpg")
    return str(r)


def test_balanced_pairing_and_stats(root):
    ds = AudioCapsHierarchicalDataset(
        root, "train", audio_duration=0.3, image_size=32,
        composition_strategy="balanced", use_augmentation=False,
    )
    stats = ds.composition_statistics()
    assert stats["matching"] == 12
    assert stats["complementary"] == 11  # last sample has no next
    assert stats.get("creative", 0) >= 10  # n>10 -> creative pairs included
    item = ds[0]
    assert item["composition_type"] == "matching"
    assert item["audio"].shape == (int(0.3 * 48_000),)
    assert item["image"].shape == (32, 32, 3)
    assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0


def test_creative_pairing(root):
    ds = AudioCapsHierarchicalDataset(
        root, "train", audio_duration=0.3, composition_strategy="creative",
        load_images=False,
    )
    assert len(ds) == 36  # 3 per sample
    assert "image" not in ds[0]  # fast path for stage 1


def test_hierarchy_labels(root):
    ds = AudioCapsHierarchicalDataset(
        root, "train", audio_duration=0.3, composition_strategy="matching",
        load_images=False,
    )
    item = ds[0]
    labels = item["hierarchy"]
    assert set(labels) == {"foreground", "background", "ambience"}
    assert all(isinstance(v, str) and v for v in labels.values())


def test_augmentation_changes_audio(root):
    aug = AudioCapsHierarchicalDataset(
        root, "train", audio_duration=0.2, composition_strategy="matching",
        use_augmentation=True, load_images=False, seed=7,
    )
    noaug = AudioCapsHierarchicalDataset(
        root, "val", audio_duration=0.2, composition_strategy="matching",
        use_augmentation=True, load_images=False, seed=7,
    )
    # val split disables augmentation regardless of the flag
    assert noaug.use_augmentation is False
    a1, a2 = aug[0]["audio"], aug[0]["audio"]
    # stochastic augmentation: repeated reads differ (gain/noise/crop)
    assert a1.shape == a2.shape
    assert np.abs(a1).max() <= 1.0


def test_missing_frame_zero_image(root):
    ds = AudioCapsHierarchicalDataset(
        root, "val", audio_duration=0.2, composition_strategy="matching",
        image_size=16,
    )
    item = ds[0]  # val samples have no frames written
    assert float(np.abs(item["image"]).max()) == 0.0
