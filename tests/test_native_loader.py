"""Native (C++) loader vs numpy-path parity on the synthetic fixture."""

import os

import numpy as np
import pytest

from speechdrivestemplates_tpu.config import get_cfg_defaults
from speechdrivestemplates_tpu.datasets import get_dataset
from speechdrivestemplates_tpu.datasets.native_loader import (load_clip_native,
                                                              native_available)
from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libsdt_dataio.so not built")


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("speakers")
    make_synthetic_speaker(str(root), "oliver", num_train=4, num_dev=2)
    return str(root)


def _numpy_item(data_root, idx, hierarchical):
    """Force the numpy path by monkeypatching native away."""
    import speechdrivestemplates_tpu.datasets.gesture_dataset as gd
    import speechdrivestemplates_tpu.datasets.native_loader as nl

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = data_root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.DATASET.HIERARCHICAL_POSE = hierarchical
    ds = gd.GestureDataset(data_root, "oliver", "train", cfg)

    orig = nl.load_clip_native
    nl.load_clip_native = lambda *a, **k: None
    try:
        np_item = ds[idx]
    finally:
        nl.load_clip_native = orig
    native_item = ds[idx]
    return np_item, native_item


@pytest.mark.parametrize("hierarchical", [True, False])
def test_native_matches_numpy(data_root, hierarchical):
    np_item, nat_item = _numpy_item(data_root, 0, hierarchical)
    np.testing.assert_allclose(nat_item["poses"], np_item["poses"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(nat_item["poses_score"], np_item["poses_score"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(nat_item["audio"], np_item["audio"], atol=1e-7)


def test_native_direct_call(data_root):
    from speechdrivestemplates_tpu.datasets.speakers_stat import get_speaker_stat

    stat = get_speaker_stat("oliver", 121, True)
    path = os.path.join(data_root, "oliver", "clip_0000.npz")
    out = load_clip_native(path, 64, True, stat["mean"], stat["std"], 68266)
    assert out is not None
    poses, scores, audio = out
    assert poses.shape == (64, 2, 121)
    assert np.isfinite(poses).all()
    assert audio.shape == (68266,)


def test_native_handles_compressed_npz(tmp_path):
    """np.savez_compressed entries (DEFLATE) must parse too."""
    from speechdrivestemplates_tpu.datasets.speakers_stat import get_speaker_stat

    rng = np.random.RandomState(0)
    pose = (rng.randn(64, 3, 137) * 50 + 300).astype(np.float32)
    audio = rng.randn(68266).astype(np.float32)
    p = str(tmp_path / "clip.npz")
    np.savez_compressed(p, pose=pose, audio=audio)
    stat = get_speaker_stat("oliver", 121, True)
    out = load_clip_native(p, 64, True, stat["mean"], stat["std"], 68266)
    assert out is not None
    np.testing.assert_allclose(out[2], audio, atol=1e-7)
