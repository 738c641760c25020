"""Dataset utilities: npz complexes -> padded model batches.

Featurization matches reference datasets/ppi_dataset.py:249-328 (eval path):
node features = [ESM2 1280 | one-hot 21] (or one-hot only), res_id/asym_id
over the concatenated complex, no cropping at inference.
"""
from __future__ import annotations

import os

import numpy as np

from dfmdock_tpu.data.batching import pad_complex
from dfmdock_tpu.data.convert import load_npz_complex
from dfmdock_tpu.features.residues import sequence_to_onehot


def complex_to_batch(d: dict, pad_to: int | None = None, use_esm: bool = True):
    """d: dict with rec_x/rec_pos/rec_seq/lig_* -> padded batch dict (numpy)."""
    rec_oh = sequence_to_onehot(d["rec_seq"])
    lig_oh = sequence_to_onehot(d["lig_seq"])
    if use_esm:
        rec_x = np.concatenate([d["rec_x"], rec_oh], axis=-1)
        lig_x = np.concatenate([d["lig_x"], lig_oh], axis=-1)
    else:
        rec_x, lig_x = rec_oh, lig_oh
    b = pad_complex(rec_x, lig_x, d["rec_pos"], d["lig_pos"], pad_to=pad_to)
    # homodimer flag (docking_dataset.py:128-140, pinder_dataset.py:101-113):
    # carried through the batch like the reference's datasets do; the
    # reference's loss loads it but never consumes it (DFMDock.py:264-272)
    b["is_homomer"] = np.float32(d["rec_seq"] == d["lig_seq"])
    return b


class NPZDataset:
    """Complex-per-file npz dataset with an id list (mirrors PPIDataset's
    db5_test layout, ppi_dataset.py:239-247)."""

    def __init__(self, data_dir: str, list_file: str | None = None, use_esm: bool = True):
        self.data_dir = data_dir
        self.use_esm = use_esm
        if list_file is None:
            list_file = os.path.join(data_dir, "test.txt")
        if os.path.exists(list_file):
            with open(list_file) as f:
                self.ids = [l.strip() for l in f if l.strip()]
            self.ids = [
                i for i in self.ids if os.path.exists(os.path.join(data_dir, i + ".npz"))
            ]
        else:
            self.ids = sorted(
                f[:-4] for f in os.listdir(data_dir) if f.endswith(".npz")
            )

    def __len__(self):
        return len(self.ids)

    def load_raw(self, idx: int) -> dict:
        d = load_npz_complex(os.path.join(self.data_dir, self.ids[idx] + ".npz"))
        d["id"] = self.ids[idx]
        return d

    def __getitem__(self, idx: int):
        d = self.load_raw(idx)
        batch = complex_to_batch(d, use_esm=self.use_esm)
        batch["id"] = d["id"]
        batch["rec_seq"] = d["rec_seq"]
        batch["lig_seq"] = d["lig_seq"]
        return batch
