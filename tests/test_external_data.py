"""Tests for the gated external-corpus loaders (DIPS / PINDER formats)."""
import gzip
import pickle

import numpy as np
import pytest

from dfmdock_tpu.data.external import DIPSDataset, PinderDataset


def test_dips_missing_dir_raises(tmp_path):
    lf = tmp_path / "list.txt"
    lf.write_text("ab/1abc.pdb1_0\n")
    with pytest.raises(FileNotFoundError, match="DIPS data not found"):
        DIPSDataset(str(tmp_path / "nope"), str(lf))


def test_pinder_gzip_pickle_roundtrip(tmp_path):
    d = {
        "rec_seq": "MKV",
        "lig_seq": "AC",
        "rec_pos": np.zeros((3, 3, 3), np.float32),
        "lig_pos": np.ones((2, 3, 3), np.float32),
        "rec_x": np.zeros((3, 1280), np.float32),
        "lig_x": np.zeros((2, 1280), np.float32),
    }
    with gzip.open(tmp_path / "1abc__A_B.pkl.gz", "wb") as f:
        pickle.dump(d, f)
    ds = PinderDataset(str(tmp_path))
    assert len(ds) == 1
    raw = ds.load_raw(0)
    assert raw["id"] == "1abc__A_B"
    assert raw["rec_seq"] == "MKV"
    assert raw["rec_x"].shape == (3, 1280)
    assert raw["lig_pos"].shape == (2, 3, 3)


def test_pinder_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="PINDER data not found"):
        PinderDataset(str(tmp_path / "nope"))
