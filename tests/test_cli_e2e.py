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
