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


def test_significance_ranks_match_scipy():
    """The permutation tool's tie-aware average ranks == scipy.rankdata
    (ties are the COMMON case in held-out DockQ columns)."""
    from scipy.stats import rankdata

    mod = _load("reranker_significance")
    rng = np.random.default_rng(3)
    for _ in range(5):
        x = rng.choice([0.0, 0.01, 0.02, 0.5], size=37)
        np.testing.assert_allclose(mod._ranks(x), rankdata(x))


def test_significance_detects_known_signal(tmp_path):
    """End-to-end on synthetic fold CSVs: an informative feature set gets
    the floor p-value; the same machinery runs clean with --reps small."""
    rng = np.random.default_rng(0)
    paths = []
    for f in range(3):
        rows = []
        for c in range(2):
            cid = f"f{f}c{c}"
            dq = rng.uniform(0.0, 0.8, 20)
            for i in range(20):
                rows.append({
                    "id": cid, "index": str(i), "DockQ": f"{dq[i]:.4f}",
                    # informative: low energy <=> high DockQ, mild noise
                    "energy_t0.1_mean":
                        f"{-10 * dq[i] + rng.normal(0, 0.5):.4f}",
                    "num_clashes": "0",
                })
        p = tmp_path / f"fold{f}.csv"
        with open(p, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        paths.append(str(p))

    mod = _load("reranker_significance")
    out = tmp_path / "report.md"
    mod.main(paths + ["--reps", "400", "--seed", "1", "--features",
                      "energy", "--out", str(out)])
    text = out.read_text()
    # observed mean rho must be strongly positive and at the permutation
    # floor p = 1/(B+1)
    import re

    m = re.search(r"mean Spearman rho \| \+(0\.\d+) \|.*\*\*(\S+)\*\*", text)
    assert m, text
    assert float(m.group(1)) > 0.5
    assert float(m.group(2)) <= 1.0 / 400
