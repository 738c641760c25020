"""Host-side ranking analysis toolchain (scripts/ranking_analysis.py,
scripts/ranking_key_table.py) on a synthetic CSV with a known signal —
the aggregation the round-5 negative-result tables rest on."""
import csv
import importlib.util
import os

import numpy as np


def _load(name):
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_csv(path, n_poses=20, seed=0):
    """Two complexes: `good` where low energy <=> high DockQ (rho = -1),
    `anti` where the energy surface is inverted (rho = +1), plus a gt row
    per complex (below the decoy min for `good`, above it for `anti`)."""
    rng = np.random.default_rng(seed)
    rows = []
    for cid, sign in (("good", -1.0), ("anti", +1.0)):
        dq = np.sort(rng.uniform(0.0, 0.8, n_poses))
        energy = sign * dq * 10.0
        for i in range(n_poses):
            rows.append({
                "id": cid, "index": str(i), "DockQ": f"{dq[i]:.4f}",
                "c_rmsd": f"{(1 - dq[i]) * 20:.3f}",
                "energy": f"{energy[i]:.4f}",
                "energy_t0.1_mean": f"{energy[i]:.4f}",
                "num_clashes": "0",
            })
        e_gt = energy.min() - 1.0 if sign < 0 else energy.max() + 1.0
        rows.append({
            "id": cid, "index": "gt", "DockQ": "1.0", "c_rmsd": "0.0",
            "energy": f"{e_gt:.4f}", "energy_t0.1_mean": f"{e_gt:.4f}",
            "num_clashes": "0",
        })
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    return path


def test_analyze_directions_and_gt_margin(tmp_path):
    ra = _load("ranking_analysis")
    p = _write_csv(tmp_path / "ranking_exp.csv")

    rows = ra.load_rows([p])  # gt rows excluded from ranking stats
    assert set(rows) == {"good", "anti"}
    assert all(r["index"] != "gt" for rs in rows.values() for r in rs)

    per = ra.analyze(rows, energy_key="energy")
    assert per["good"]["rho_dockq"] < -0.99  # min-energy = best pose
    assert per["anti"]["rho_dockq"] > 0.99   # inverted surface
    assert per["good"]["top1"] == per["good"]["best"]
    assert per["anti"]["top1"] < per["anti"]["random"]

    agg = ra.summarize(per)
    assert agg["frac_rho_dockq_neg"] == 0.5

    m = ra.gt_margins([p], "energy")
    assert m["good"] < 0 < m["anti"]  # healthy vs inverted native margin


def test_key_table_renders_both_directions(tmp_path, capsys):
    rkt = _load("ranking_key_table")
    cv = tmp_path / "cv"
    (cv / "fold0").mkdir(parents=True)
    _write_csv(cv / "fold0" / "ranking_exp.csv")

    rkt.CV_DIR = str(cv)
    out = cv / "ranking_keys.md"
    rkt.main(["--folds", "0", "--out", str(out)])

    text = out.read_text()
    assert "| energy |" in text and "num_clashes" in text
    # the mean rho over {good:-1, anti:+1} is ~0 => direction column may or
    # may not appear; the margin section must report the energy key
    assert "margin health" in text
    assert "`energy_t1em05_mean`" in text or "`energy_t0.1_mean`" in text or "energy" in text
