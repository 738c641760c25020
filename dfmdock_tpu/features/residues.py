"""Amino-acid alphabet constants and one-hot sequence encoding (host-side numpy).

Standard AlphaFold residue ordering (reference src/utils/residue_constants.py:
855-928; Apache-2.0-derived constants re-stated from the published tables).
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

restypes = [
    "A", "R", "N", "D", "C", "Q", "E", "G", "H", "I",
    "L", "K", "M", "F", "P", "S", "T", "W", "Y", "V",
]
restype_order = {r: i for i, r in enumerate(restypes)}
restype_num = len(restypes)  # 20
restypes_with_x = restypes + ["X"]
restype_order_with_x = {r: i for i, r in enumerate(restypes_with_x)}

restype_1to3 = {
    "A": "ALA", "R": "ARG", "N": "ASN", "D": "ASP", "C": "CYS",
    "Q": "GLN", "E": "GLU", "G": "GLY", "H": "HIS", "I": "ILE",
    "L": "LEU", "K": "LYS", "M": "MET", "F": "PHE", "P": "PRO",
    "S": "SER", "T": "THR", "W": "TRP", "Y": "TYR", "V": "VAL",
    "X": "UNK",
}
restype_3to1 = {v: k for k, v in restype_1to3.items() if k != "X"}


def sequence_to_onehot(
    sequence: str,
    mapping: Mapping[str, int] | None = None,
    map_unknown_to_x: bool = True,
) -> np.ndarray:
    """[L] one-letter sequence -> [L, 21] float32 one-hot
    (residue_constants.py:885-928 semantics)."""
    if mapping is None:
        mapping = restype_order_with_x
    num_entries = max(mapping.values()) + 1
    out = np.zeros((len(sequence), num_entries), dtype=np.float32)
    for i, aa in enumerate(sequence):
        if map_unknown_to_x:
            if not (aa.isalpha() and aa.isupper()):
                raise ValueError(f"Invalid character in the sequence: {aa!r}")
            aa_id = mapping.get(aa, mapping["X"])
        else:
            aa_id = mapping[aa]
        out[i, aa_id] = 1.0
    return out


def sequence_to_indices(sequence: str) -> np.ndarray:
    """[L] int32 residue-type indices (21-way, unknown -> 20)."""
    return np.array(
        [restype_order_with_x.get(aa, restype_order_with_x["X"]) for aa in sequence],
        dtype=np.int32,
    )
