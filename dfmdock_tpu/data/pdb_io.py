"""Minimal dependency-free PDB reading/writing for backbone-level docking.

Reader mirrors the reference's biotite pipeline (inference_base.py:72-126):
ATOM records only, residues kept only when the full N/CA/C backbone is
present, sequence from 3-letter codes (unknown -> X).

Writer mirrors utils/pdb.py:55-111 (+ inference_mlsb.py:68-85): N/CA/C(/O/CB)
records with CB reconstructed from the backbone and O placed by ideal
geometry (place_fourth_atom).
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np

from dfmdock_tpu.features.residues import restype_1to3, restype_3to1


@dataclasses.dataclass
class PDBChainData:
    seq: str
    bb_coords: np.ndarray  # [L, 3, 3] N/CA/C
    aa_coords: np.ndarray  # [A, 3] all (non-hetero) atom coords
    atom_lines: list  # parsed atom records for round-trip output
    chain_ids: list


def parse_pdb(path: str, chains: list[str] | None = None) -> PDBChainData:
    """Parse ATOM records; keep residues with complete N/CA/C backbones.

    Residues are grouped by (chain_id, res_id, insertion_code). Altloc: first
    occurrence of each atom name wins.
    """
    residues: dict = {}
    order: list = []
    atom_records = []
    with open(path) as f:
        for line in f:
            if not line.startswith("ATOM"):
                continue
            chain_id = line[21]
            if chains is not None and chain_id not in chains:
                continue
            res_id = line[22:26].strip()
            icode = line[26]
            res_name = line[17:20].strip()
            atom_name = line[12:16].strip()
            xyz = (float(line[30:38]), float(line[38:46]), float(line[46:54]))
            key = (chain_id, res_id, icode)
            if key not in residues:
                residues[key] = {"name": res_name, "atoms": {}, "order": []}
                order.append(key)
            rec = residues[key]
            if atom_name not in rec["atoms"]:
                rec["atoms"][atom_name] = xyz
                rec["order"].append(atom_name)
            atom_records.append((key, atom_name, xyz, res_name, chain_id))

    seq_chars = []
    bb = []
    aa = []
    kept_lines = []
    chain_list = []
    kept_keys = set()
    for key in order:
        rec = residues[key]
        if {"N", "CA", "C"}.issubset(rec["atoms"]):
            kept_keys.add(key)
            seq_chars.append(restype_3to1.get(rec["name"], "X"))
            bb.append([rec["atoms"]["N"], rec["atoms"]["CA"], rec["atoms"]["C"]])
            chain_list.append(key[0])
    for key, atom_name, xyz, res_name, chain_id in atom_records:
        if key in kept_keys:
            aa.append(xyz)
            kept_lines.append((key, atom_name, res_name, chain_id))

    return PDBChainData(
        seq="".join(seq_chars),
        bb_coords=np.asarray(bb, np.float64).astype(np.float32),
        aa_coords=np.asarray(aa, np.float64).astype(np.float32),
        atom_lines=kept_lines,
        chain_ids=chain_list,
    )


# ---------------------------------------------------------------------------
# full-backbone reconstruction (CB + O)


def place_fourth_atom(a, b, c, length, planar, dihedral):
    """Ideal-geometry placement of a 4th atom (pdb.py:31-52). numpy [..., 3]."""
    bc = b - c
    bc = bc / np.linalg.norm(bc, axis=-1, keepdims=True)
    n = np.cross(b - a, bc)
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    m1, m2, m3 = bc, np.cross(n, bc), n
    d1 = length * math.cos(planar)
    d2 = length * math.sin(planar) * math.cos(dihedral)
    d3 = -length * math.sin(planar) * math.sin(dihedral)
    return c + m1 * d1 + m2 * d2 + m3 * d3


def get_full_coords(bb_coords: np.ndarray) -> np.ndarray:
    """[L, 3, 3] N/CA/C -> [L, 5, 3] N/CA/C/O/CB (inference_mlsb.py:68-85)."""
    N, CA, C = bb_coords[:, 0], bb_coords[:, 1], bb_coords[:, 2]
    b = CA - N
    c = C - CA
    a = np.cross(b, c)
    CB = -0.58273431 * a + 0.56802827 * b - 0.54067466 * c + CA
    O = place_fourth_atom(np.roll(N, -1, 0), CA, C, 1.231, 2.108, -3.142)
    return np.stack([N, CA, C, O, CB], axis=1)


def save_pdb(
    out_pdb: str,
    coords: np.ndarray,
    seq: str,
    b_factors: np.ndarray | None = None,
    delim: int | None = None,
    append: bool = False,
):
    """Write [L, A, 3] coords (A=3 N/CA/C or A=5 N/CA/C/O/CB) as a two-chain
    PDB; residues up to `delim` (inclusive) get chain A, the rest chain B
    (pdb.py:55-111)."""
    if delim is None:
        delim = -1
    atoms = ["N", "CA", "C", "O", "CB"][: coords.shape[1]]
    if b_factors is None:
        b_factors = np.zeros(coords.shape[0])
    mode = "a" if append else "w"
    with open(out_pdb, mode) as f:
        k = 0
        for r in range(coords.shape[0]):
            aa3 = restype_1to3.get(seq[r], "UNK")
            for a, atom in enumerate(atoms):
                if aa3 == "GLY" and atom == "CB":
                    continue
                x, y, z = coords[r, a]
                f.write(
                    "ATOM  %5d  %-3s %3s %s%4d    %8.3f%8.3f%8.3f  %4.2f %5.2f\n"
                    % (
                        k + 1,
                        atom,
                        aa3,
                        "A" if r <= delim else "B",
                        r + 1,
                        x,
                        y,
                        z,
                        1.0,
                        b_factors[r],
                    )
                )
                k += 1


def save_trajectory(out_pdb: str, traj_rec, traj_lig, rec_seq: str, lig_seq: str):
    """Multi-MODEL trajectory writer (inference_mlsb.py:130-159)."""
    with open(out_pdb, "w"):
        pass
    for i, (rec, lig) in enumerate(zip(traj_rec, traj_lig)):
        coords = np.concatenate([np.asarray(rec), np.asarray(lig)], axis=0)
        full = get_full_coords(coords)
        with open(out_pdb, "a") as f:
            f.write(f"MODEL        {i}\n")
        save_pdb(
            out_pdb,
            full,
            rec_seq + lig_seq,
            delim=len(rec_seq) - 1,
            append=True,
        )
        with open(out_pdb, "a") as f:
            f.write("ENDMDL\n")
