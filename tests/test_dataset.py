import os

import numpy as np
import pytest

from speechdrivestemplates_tpu.config import get_cfg_defaults
from speechdrivestemplates_tpu.datasets import DataLoader, get_dataset
from speechdrivestemplates_tpu.datasets.synthetic import (make_demo_wav,
                                                          make_synthetic_speaker)

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("speakers")
    make_synthetic_speaker(str(root), "oliver", num_train=8, num_dev=4)
    return str(root)


def _cfg(data_root, hierarchical=True):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = data_root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.DATASET.HIERARCHICAL_POSE = hierarchical
    return cfg


def test_train_item_shapes(data_root):
    cfg = _cfg(data_root)
    ds = get_dataset("GestureDataset")(data_root, "oliver", "train", cfg)
    assert len(ds) == 8
    s = ds[0]
    assert s["audio"].shape == (68266,)
    assert s["poses"].shape == (64, 2, 121)
    assert s["poses_score"].shape == (64, 2, 121)
    assert s["num_frames"] == 64
    assert s["speaker_stat"]["mean"].shape == (242,)
    assert np.isfinite(s["poses"]).all()


def test_val_split(data_root):
    cfg = _cfg(data_root)
    ds = get_dataset("GestureDataset")(data_root, "oliver", "val", cfg)
    assert len(ds) == 4


def test_nonhierarchical_item_has_global_stats(data_root):
    cfg = _cfg(data_root, hierarchical=False)
    ds = get_dataset("GestureDataset")(data_root, "oliver", "train", cfg)
    s = ds[0]
    assert "speaker_stat_global" in s


def test_normalize_roundtrip_through_dataset(data_root):
    """denormalize(get_final_results inverse chain) must reproduce the raw
    relative pose (reference gesture_dataset.py:213-220)."""
    cfg = _cfg(data_root)
    ds = get_dataset("GestureDataset")(data_root, "oliver", "train", cfg)
    s = ds[0]
    stat = {k: v[None] for k, v in s["speaker_stat"].items()}
    final = ds.get_final_results(s["poses"][None], stat)
    assert final.shape == (1, 64, 2, 121)
    assert np.isfinite(np.asarray(final)).all()


def test_dataloader_batching(data_root):
    cfg = _cfg(data_root)
    ds = get_dataset("GestureDataset")(data_root, "oliver", "train", cfg)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b["audio"].shape == (4, 68266)
    assert b["poses"].shape == (4, 64, 2, 121)
    assert b["clip_index"].shape == (4,)
    assert b["speaker_stat"]["mean"].shape == (4, 242)
    assert isinstance(b["speaker"], list) and len(b["speaker"]) == 4


def test_dataloader_epoch_shuffle_differs(data_root):
    cfg = _cfg(data_root)
    ds = get_dataset("GestureDataset")(data_root, "oliver", "train", cfg)
    dl = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
    dl.set_epoch(1)
    i1 = next(iter(dl))["clip_index"].tolist()
    dl.set_epoch(2)
    i2 = next(iter(dl))["clip_index"].tolist()
    assert i1 != i2


def test_dataloader_sharding_partitions(data_root):
    cfg = _cfg(data_root)
    ds = get_dataset("GestureDataset")(data_root, "oliver", "train", cfg)
    seen = []
    for shard in range(2):
        dl = DataLoader(ds, batch_size=4, shuffle=False, num_shards=2,
                        shard_index=shard)
        for b in dl:
            seen.extend(b["clip_index"].tolist())
    assert sorted(seen) == list(range(8))


def test_demo_split(data_root, tmp_path):
    wav = make_demo_wav(str(tmp_path / "demo.wav"), seconds=4.27)
    cfg = _cfg(data_root)
    ds = get_dataset("GestureDataset")(data_root, "oliver", "demo", cfg,
                                       demo_input=wav)
    s = ds[0]
    # 4.27 s -> 64 frames at 15 fps -> 68266 samples
    assert s["num_frames"] == 64
    assert s["audio"].shape == (68266,)


def test_speaker_stat_tables():
    from speechdrivestemplates_tpu.datasets import get_speaker_stat

    st = get_speaker_stat("oliver", 121, True)
    assert st["mean"].shape == (242,) and st["std"].shape == (242,)
    assert st["scale_factor"] > 0
    stg = get_speaker_stat("oliver", 121, False)
    assert not np.allclose(st["mean"], stg["mean"])
    with pytest.raises(KeyError):
        get_speaker_stat("nobody", 121, True)


def test_soa_cache_promotion_and_equality(data_root):
    """CACHING=True: after the first full epoch the item cache is promoted to
    a structure-of-arrays; gathered batches must equal per-item collation
    exactly, and post-promotion __getitem__ must still return samples."""
    cfg = _cfg(data_root)
    cfg.DATASET.CACHING = True
    ds = get_dataset("GestureDataset")(data_root, "oliver", "train", cfg)
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=0)
    first = list(dl)  # fills + promotes
    assert ds._soa is not None and not ds._cache

    cfg2 = _cfg(data_root)
    cfg2.DATASET.CACHING = False
    ds2 = get_dataset("GestureDataset")(data_root, "oliver", "train", cfg2)

    dl.set_epoch(1)
    for b in dl:
        for j, idx in enumerate(np.asarray(b["clip_index"])):
            ref = ds2[int(idx)]
            np.testing.assert_array_equal(b["poses"][j], ref["poses"])
            np.testing.assert_array_equal(b["audio"][j], ref["audio"])
            np.testing.assert_array_equal(b["speaker_stat"]["mean"][j],
                                          ref["speaker_stat"]["mean"])
            assert b["speaker"][j] == ref["speaker"]

    # straggler single-item access after promotion
    s = ds[2]
    np.testing.assert_array_equal(s["poses"], ds2[2]["poses"])
    assert s["num_frames"] == ds2[2]["num_frames"]


def test_demo_split_deterministic(data_root, tmp_path):
    """Demo directory sampling and MAX_DEMO_LENGTH cropping are seeded from
    SYS.SEED: the same command selects the same clips and crops the same
    windows (SURVEY §5 determinism; the reference uses the global RNG)."""
    demo_dir = tmp_path / "wavs"
    demo_dir.mkdir()
    for i in range(6):
        make_demo_wav(str(demo_dir / f"clip{i}.wav"), seconds=2.0 + 0.5 * i)

    cfg = _cfg(data_root)
    cfg.DEMO.NUM_SAMPLES = 3
    cfg.DATASET.MAX_DEMO_LENGTH = 3  # seconds -> long clips get cropped

    def run():
        ds = get_dataset("GestureDataset")(data_root, "oliver", "demo", cfg,
                                           demo_input=str(demo_dir))
        return list(ds.clips), [ds[i]["audio"] for i in range(len(ds))]

    clips_a, audio_a = run()
    clips_b, audio_b = run()
    assert clips_a == clips_b
    for a, b in zip(audio_a, audio_b):
        np.testing.assert_array_equal(a, b)

    # a different seed reshuffles (6 files, 3 picked -> overwhelmingly likely)
    cfg.SYS.SEED = 1234
    clips_c, _ = run()
    assert set(clips_c) <= {str(demo_dir / f"clip{i}.wav") for i in range(6)}
