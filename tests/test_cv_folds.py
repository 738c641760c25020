"""The CV driver's split/aggregate logic (scripts/cv_folds.py) — pure host
code; the train/eval legs are exercised by the real runs in ckpts/db5_cv."""
import csv
import importlib.util
import os
import sys

import numpy as np


def _load_mod():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "cv_folds.py")
    spec = importlib.util.spec_from_file_location("cv_folds", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fold_splits_partition_all_ids():
    mod = _load_mod()
    splits = mod.fold_splits()
    assert len(splits) == 6
    flat = [i for s in splits for i in s]
    assert len(flat) == 24 and len(set(flat)) == 24
    assert all(len(s) == 4 for s in splits)


def test_aggregate_table(tmp_path, monkeypatch, capsys):
    mod = _load_mod()
    splits = mod.fold_splits()
    monkeypatch.setattr(mod, "CV_DIR", str(tmp_path))
    rng = np.random.RandomState(0)
    # fabricate holdout.csv for folds 0 and 1 (40 samples per complex);
    # make one complex's lowest-energy row its best DockQ
    for f in (0, 1):
        d = tmp_path / f"fold{f}"
        d.mkdir()
        with open(d / "holdout.csv", "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=["id", "DockQ", "energy"])
            w.writeheader()
            for cid in splits[f]:
                dq = rng.rand(40) * 0.5
                en = rng.randn(40)
                dq[np.argmin(en)] = 0.9  # min-energy pick = 0.9
                for q, e in zip(dq, en):
                    w.writerow({"id": cid, "DockQ": q, "energy": e})
    mod.aggregate()
    out = capsys.readouterr().out
    assert os.path.exists(tmp_path / "cv_table.csv")
    assert os.path.exists(tmp_path / "README.md")
    with open(tmp_path / "cv_table.csv") as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 8  # 2 folds x 4 complexes
    assert all(float(r["min_energy_pick"]) == 0.9 for r in rows)
    assert all(int(r["n_samples"]) == 40 for r in rows)
    # success counts in the README reflect the fabricated min-energy picks
    assert "acceptable (DockQ>=0.23): **8**" in out
