"""Convert the reference's preprocessed torch_geometric `.pt` complexes to npz.

The bundled DB5 test set (/root/reference/data/db5_test/*.pt) stores
HeteroData with `receptor`/`ligand` node stores: x [L,1280] ESM2-650M
per-residue representations, pos [L,3,3] N/CA/C backbone, seq (str).
torch_geometric is not installed here, so unpickling uses stub classes
injected under the torch_geometric module paths.

Output npz schema (one file per complex):
  rec_x [R,1280] f32, rec_pos [R,3,3] f32, rec_seq str
  lig_x [L,1280] f32, lig_pos [L,3,3] f32, lig_seq str
"""
from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np


def _install_pyg_stubs():
    if "torch_geometric" in sys.modules:
        return

    class _Store(dict):
        def __setstate__(self, state):
            self.update(state if isinstance(state, dict) else state.__dict__)

    class _HeteroData:
        def __setstate__(self, state):
            self.__dict__.update(state)

    mods = {"torch_geometric": types.ModuleType("torch_geometric")}
    for name in ["data", "data.hetero_data", "data.data", "data.storage"]:
        mods[f"torch_geometric.{name}"] = types.ModuleType(f"torch_geometric.{name}")
    mods["torch_geometric.data.hetero_data"].HeteroData = _HeteroData
    mods["torch_geometric.data.data"].Data = _HeteroData
    for cls in ["BaseStorage", "NodeStorage", "EdgeStorage", "GlobalStorage"]:
        setattr(mods["torch_geometric.data.storage"], cls, _Store)
    sys.modules.update(mods)


def load_pt_complex(path: str) -> dict:
    """Load one reference .pt complex into plain numpy arrays + strings."""
    _install_pyg_stubs()
    import torch  # local import: torch is heavyweight and CPU-only here

    data = torch.load(path, weights_only=False, map_location="cpu")
    stores = data._node_store_dict
    out = {}
    for chain in ("receptor", "ligand"):
        m = stores[chain]["_mapping"]
        prefix = "rec" if chain == "receptor" else "lig"
        out[f"{prefix}_x"] = m["x"].numpy().astype(np.float32)
        out[f"{prefix}_pos"] = m["pos"].numpy().astype(np.float32)
        out[f"{prefix}_seq"] = m["seq"]
    return out


def convert_file(pt_path: str, npz_path: str):
    d = load_pt_complex(pt_path)
    os.makedirs(os.path.dirname(npz_path) or ".", exist_ok=True)
    np.savez_compressed(
        npz_path,
        rec_x=d["rec_x"],
        rec_pos=d["rec_pos"],
        rec_seq=np.str_(d["rec_seq"]),
        lig_x=d["lig_x"],
        lig_pos=d["lig_pos"],
        lig_seq=np.str_(d["lig_seq"]),
    )


def load_npz_complex(path: str) -> dict:
    with np.load(path) as z:
        return {
            "rec_x": z["rec_x"],
            "rec_pos": z["rec_pos"],
            "rec_seq": str(z["rec_seq"]),
            "lig_x": z["lig_x"],
            "lig_pos": z["lig_pos"],
            "lig_seq": str(z["lig_seq"]),
        }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/reference/data/db5_test")
    ap.add_argument("--dst", default="data/db5_npz")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    names = sorted(f for f in os.listdir(args.src) if f.endswith(".pt"))
    for f in names:
        out = os.path.join(args.dst, f.replace(".pt", ".npz"))
        convert_file(os.path.join(args.src, f), out)
        print(f"{f} -> {out}")
    # carry the split list over
    src_list = os.path.join(args.src, "test.txt")
    if os.path.exists(src_list):
        with open(src_list) as fh:
            ids = [l.strip() for l in fh if l.strip()]
        kept = [i for i in ids if os.path.exists(os.path.join(args.dst, i + ".npz"))]
        with open(os.path.join(args.dst, "test.txt"), "w") as fh:
            fh.write("\n".join(kept) + "\n")


if __name__ == "__main__":
    main()
