"""End-to-end CLI runs on CPU: dock --npz, sweep --ids, sweep --resume.

Full-size model config, 1-2 poses x 2 SDE steps on one small complex — slow
enough to be real, fast enough for CI (the conftest forces the CPU backend).
"""
import csv

def _read(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def test_cli_sweep_end_to_end_and_resume(tmp_path):
    from dfmdock_tpu.cli.sweep import main

    out = tmp_path / "sweep.csv"
    args = [
        "--ids", "7CEI", "--num-samples", "2", "--num-steps", "2",
        "--exact", "--out-csv", str(out), "--seed", "1",
    ]
    main(args)
    rows = _read(out)
    assert len(rows) == 2
    assert {"id", "DockQ", "energy", "num_clashes"} <= set(rows[0])
    assert rows[0]["id"] == "7CEI"

    # resume skips the finished complex: identical rows, no re-sampling
    main(args + ["--resume"])
    assert _read(out) == rows


def test_cli_sweep_energy_draws(tmp_path):
    """--energy-draws K replaces the ranking energy with a K-draw mean and
    keeps the single-draw value in energy_first_draw."""
    from dfmdock_tpu.cli.sweep import main

    out = tmp_path / "sweep_ed.csv"
    main([
        "--ids", "7CEI", "--num-samples", "2", "--num-steps", "2",
        "--exact", "--out-csv", str(out), "--seed", "1",
        "--energy-draws", "3",
    ])
    rows = _read(out)
    assert len(rows) == 2
    assert "energy_first_draw" in rows[0]
    for r in rows:
        assert r["energy"] != "" and r["energy_first_draw"] != ""


def test_cli_sweep_ids_beat_limit(tmp_path):
    """--ids must filter the FULL dataset before --limit truncates: 7CEI is
    alphabetically last, so applying the limit first would silently drop it
    and run zero complexes (round-2 review finding)."""
    from dfmdock_tpu.cli.sweep import main

    out = tmp_path / "ids_limit.csv"
    main([
        "--ids", "7CEI", "--limit", "1", "--gt-energy", "--exact",
        "--out-csv", str(out),
    ])
    (row,) = _read(out)
    assert row["id"] == "7CEI"


def test_cli_sweep_gt_energy_probe(tmp_path):
    """--gt-energy evaluates the native pose only (inference_mlsb.py:219-227):
    metrics must be the perfect-docking values."""
    from dfmdock_tpu.cli.sweep import main

    out = tmp_path / "gt.csv"
    main([
        "--ids", "7CEI", "--gt-energy", "--exact", "--out-csv", str(out),
    ])
    (row,) = _read(out)
    assert float(row["DockQ"]) > 0.99
    assert float(row["l_rmsd"]) < 1e-3
    assert row["energy"] != ""


def test_cli_dock_csv_batch(tmp_path):
    """CSV-batch input: (id, npz, -) rows (inference_base.py main loop)."""
    from dfmdock_tpu.cli.dock import main

    listing = tmp_path / "pairs.csv"
    listing.write_text("7CEI,data/db5_npz/7CEI.npz,-\n")
    out = tmp_path / "out"
    main([
        "--csv", str(listing), "--num-samples", "1", "--num-steps", "2",
        "--exact", "--out-dir", str(out),
    ])
    (row,) = _read(out / "metrics.csv")
    assert row["id"] == "7CEI"


def test_cli_dock_rank_by_confidence(tmp_path):
    """--rank-by icons selects the best pose by the interface
    self-consistency key and records icons/snorm columns."""
    import numpy as np

    from dfmdock_tpu.cli.dock import main

    out = tmp_path / "dock_rb"
    main([
        "--npz", "data/db5_npz/7CEI.npz", "--num-samples", "2",
        "--num-steps", "2", "--exact", "--out-dir", str(out), "--seed", "2",
        "--rank-by", "icons",
    ])
    rows = _read(out / "metrics.csv")
    assert {"icons", "snorm"} <= set(rows[0])
    icons = [float(r["icons"]) for r in rows]
    best = int(np.argmin(icons))
    # the written PDB is the icons-ranked best pose
    assert (out / f"7CEI_{best}.pdb").exists()


def test_cli_dock_npz_end_to_end(tmp_path):
    from dfmdock_tpu.cli.dock import main

    out = tmp_path / "dock"
    main([
        "--npz", "data/db5_npz/7CEI.npz", "--num-samples", "2",
        "--num-steps", "2", "--exact", "--out-dir", str(out), "--seed", "2",
    ])
    rows = _read(out / "metrics.csv")
    assert len(rows) == 2
    pdbs = list(out.glob("7CEI_*.pdb"))
    assert len(pdbs) == 1  # best pose only by default
    text = pdbs[0].read_text()
    assert text.startswith("MODEL") or "ATOM" in text


def test_cli_dock_rank_by_reranker(tmp_path):
    """--rank-by reranker scores poses with a fitted linear feature
    combination (fit_reranker.py deployment contract): t values are parsed
    back out of the weight JSON's column names, features are K-draw means
    z-scored within the complex, and the written PDB is the argmax pose."""
    import json

    import numpy as np

    from dfmdock_tpu.cli.dock import main

    weights = tmp_path / "w.json"
    weights.write_text(json.dumps({
        # a 2-t grid plus the clash count: exercises name->t parsing
        # (1em05 -> 1e-05), per-t score caching and the num_clashes column
        "features": ["energy_t0.1_mean", "energy_t1em05_mean",
                     "icons_t0.1_mean", "num_clashes"],
        "weights": [-1.0, -0.5, -0.25, -0.1],
        "ridge": 1.0,
    }))
    out = tmp_path / "dock_rr"
    main([
        "--npz", "data/db5_npz/7CEI.npz", "--num-samples", "2",
        "--num-steps", "2", "--exact", "--out-dir", str(out), "--seed", "2",
        "--rank-by", "reranker", "--reranker-weights", str(weights),
        "--reranker-draws", "2",
    ])
    rows = _read(out / "metrics.csv")
    assert "rerank_score" in rows[0]
    scores = [float(r["rerank_score"]) for r in rows]
    best = int(np.argmax(scores))
    assert (out / f"7CEI_{best}.pdb").exists()
    # with 2 poses, within-complex z-scoring makes the scores symmetric
    assert abs(scores[0] + scores[1]) < 1e-6


def test_cli_dock_reranker_default_weights_exist():
    """The committed CV reranker weights (the --rank-by reranker default)
    parse and carry only features the CLI can compute."""
    import json

    from dfmdock_tpu.cli.dock import main  # noqa: F401  (import side check)

    path = "ckpts/db5_cv/reranker_weights.json"
    with open(path) as f:
        spec = json.load(f)
    assert len(spec["features"]) == len(spec["weights"])
    for name in spec["features"]:
        assert name == "num_clashes" or (
            name.split("_t", 1)[0] in ("energy", "icons", "snorm")
            and name.endswith("_mean"))
