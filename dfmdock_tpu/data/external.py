"""Loaders for the reference's external training corpora (DIPS / PINDER).

These datasets are not bundled with either repository; the loaders implement
the reference's on-disk formats and fail with a clear message when the data
is absent:

- DIPS/DB5 preprocessed `.pt` (torch_geometric HeteroData with receptor/
  ligand x/pos/seq stores — datasets/ppi_mlsb_dataset.py:338-354): handled by
  data/convert.load_pt_complex (stub unpickler, no torch_geometric needed).
- PINDER per-complex gzip pickles + an ESM2 HDF5 sidecar
  (datasets/pinder_dataset.py:20-88): dicts with receptor/ligand sequence and
  backbone coords; embeddings fetched from the h5 by complex id.
"""
from __future__ import annotations

import gzip
import os
import pickle

import numpy as np


class DIPSDataset:
    """Directory of reference-format .pt complexes + a split list file.

    Mirrors datasets/ppi_mlsb_dataset.py's dips layout: ids like
    'ab/1abc.pdb1_0' -> file 'ab_1abc.pdb1_0.pt'.
    """

    def __init__(self, data_dir: str, list_file: str):
        if not os.path.isdir(data_dir):
            raise FileNotFoundError(
                f"DIPS data not found at {data_dir}. Preprocess with the "
                "reference pipeline or convert to npz via dfmdock_tpu.data.convert."
            )
        self.data_dir = data_dir
        with open(list_file) as f:
            self.ids = [l.strip() for l in f if l.strip()]

    def __len__(self):
        return len(self.ids)

    def load_raw(self, idx: int) -> dict:
        from dfmdock_tpu.data.convert import load_pt_complex

        _id = self.ids[idx]
        if "/" in _id:  # dips id mangling (ppi_mlsb_dataset.py:251-255)
            head, tail = _id.split("/", 1)
            _id = head + "_" + tail.rsplit(".", 1)[0]
        d = load_pt_complex(os.path.join(self.data_dir, _id + ".pt"))
        d["id"] = _id
        return d


class PinderDataset:
    """PINDER gzip-pickle complexes with an ESM2 HDF5 sidecar
    (datasets/pinder_dataset.py:20-88)."""

    def __init__(self, data_dir: str, ids: list[str] | None = None,
                 esm_h5: str | None = None):
        if not os.path.isdir(data_dir):
            raise FileNotFoundError(
                f"PINDER data not found at {data_dir}; download via pinder.core "
                "and preprocess per the reference pipeline."
            )
        self.data_dir = data_dir
        self.esm_h5 = esm_h5
        if ids is None:
            ids = sorted(
                f[: -len(".pkl.gz")] for f in os.listdir(data_dir) if f.endswith(".pkl.gz")
            )
        self.ids = ids

    def __len__(self):
        return len(self.ids)

    def load_raw(self, idx: int) -> dict:
        _id = self.ids[idx]
        with gzip.open(os.path.join(self.data_dir, _id + ".pkl.gz"), "rb") as f:
            d = pickle.load(f)
        out = {
            "id": _id,
            "rec_seq": d["rec_seq"],
            "lig_seq": d["lig_seq"],
            "rec_pos": np.asarray(d["rec_pos"], np.float32),
            "lig_pos": np.asarray(d["lig_pos"], np.float32),
        }
        if self.esm_h5:
            import h5py

            with h5py.File(self.esm_h5, "r") as h5:
                out["rec_x"] = np.asarray(h5[_id]["receptor"], np.float32)
                out["lig_x"] = np.asarray(h5[_id]["ligand"], np.float32)
        elif "rec_x" in d:
            out["rec_x"] = np.asarray(d["rec_x"], np.float32)
            out["lig_x"] = np.asarray(d["lig_x"], np.float32)
        return out
