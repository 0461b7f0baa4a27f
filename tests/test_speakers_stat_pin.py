"""Pin ``speakers_stat.npz`` bit-exactly to the reference's source tables.

The repo ships the reference's ~1500 lines of per-speaker normalization
statistics (``/root/reference/core/datasets/speakers_stat.py:4-1492``) as a
compressed npz.  This test re-parses the reference source (importlib on the
file path — no package import, the module only needs numpy) and asserts exact
numeric equality for every speaker in both the global and parted tables, so a
regenerated npz can never silently drift from the reference data.

Skipped when the reference tree is absent (same policy as test_torch_parity).
"""

import importlib.util
import os

import numpy as np
import pytest

REFERENCE_STAT = "/root/reference/core/datasets/speakers_stat.py"
pytestmark = pytest.mark.skipif(not os.path.isfile(REFERENCE_STAT),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_tables():
    spec = importlib.util.spec_from_file_location("_ref_speakers_stat",
                                                  REFERENCE_STAT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return {"global": mod.SPEAKERS_STAT_121,
            "parted": mod.SPEAKERS_STAT_121_parted}


@pytest.fixture(scope="module")
def npz_tables():
    from speechdrivestemplates_tpu.datasets import speakers_stat

    return speakers_stat._load_tables()


def test_speaker_sets_match(ref_tables, npz_tables):
    for space in ("global", "parted"):
        assert set(npz_tables[space]) >= set(ref_tables[space]), (
            space, set(ref_tables[space]) - set(npz_tables[space]))


@pytest.mark.parametrize("space", ["global", "parted"])
def test_tables_bit_equal(ref_tables, npz_tables, space):
    for speaker, ref in ref_tables[space].items():
        got = npz_tables[space][speaker]
        for field in ("mean", "std"):
            r = np.asarray(ref[field], dtype=np.float64).reshape(-1)
            g = np.asarray(got[field], dtype=np.float64).reshape(-1)
            assert r.shape == g.shape, (speaker, field)
            assert np.array_equal(r, g), (speaker, field,
                                          np.abs(r - g).max())
        assert float(got["scale_factor"]) == float(ref["scale_factor"]), speaker


def test_get_speaker_stat_matches_reference(ref_tables):
    """The public lookup returns float32 casts of the exact reference values
    (gesture_dataset.py:167-171 uses these to z-score poses)."""
    from speechdrivestemplates_tpu.datasets.speakers_stat import get_speaker_stat

    for space, parted in (("global", False), ("parted", True)):
        for speaker, ref in ref_tables[space].items():
            got = get_speaker_stat(speaker, 121, parted)
            np.testing.assert_array_equal(
                got["mean"],
                np.asarray(ref["mean"], np.float64).reshape(-1).astype(np.float32))
            np.testing.assert_array_equal(
                got["std"],
                np.asarray(ref["std"], np.float64).reshape(-1).astype(np.float32))
