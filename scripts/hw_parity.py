"""Standalone hardware kernel-regression gate (VERDICT r3 Weak #3).

Decouples compiled-kernel validation from bench runs: executes, on the real
TPU, in ~1-2 min warm:

  1. the N x t compiled-Pallas parity matrix (identical to bench.py's
     preamble gate: fused bf16 kernels vs the f32 XLA path over padded sizes
     {128, 256, 448(real 1AVX), 640} x t in {0.1, 0.5, 0.9});
  2. the edge-table Pallas builder (ops/edge_table.py) vs the XLA featurize
     (models/egnn.build_edge_table_xla) row-compared on VALID edges at
     several sizes — this is the Mosaic-lowering check interpret-mode tests
     cannot perform;
  3. approx_max_k vs lax.top_k exactness (recall AND index order) on the
     exact tensors models/edges.select_edges builds, at every padded width
     the pipeline uses (128/256/448/640) — the gate behind
     models/edges._APPROX_TOPK_VERIFIED_WIDTHS (ADVICE r3 medium);
  4. the fused selection kernel (ops/select_topk.py) bit-compared against
     select_edges at the same widths (+ a tiny-valid masked case).

Writes a JSON summary to stdout (and scripts/hw_parity_out.json); exits
non-zero on any failure.  ONE TPU process at a time (NOTES.md).

    python scripts/hw_parity.py
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402  (reuses _nets/_batch/_synthetic_batch/parity)

TOPK_WIDTHS = (128, 256, 448, 640)
KNN, SAMPLE = 20, 40


def split_fold_check():
    """The bf16 split residuals must be NONZERO under jit on this backend —
    the round-4 bug: excess-precision folding elided the convert-based split,
    truncating every one-hot gather to single bf16."""
    from dfmdock_tpu.ops.gather import gather_rows, split_bf16_3

    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(448, 8).astype(np.float32) * 30)
    _, m, l = jax.jit(split_bf16_3)(src)
    mid_nz = int((np.asarray(m, np.float32) != 0).sum())
    lo_nz = int((np.asarray(l, np.float32) != 0).sum())
    assert mid_nz > 1000 and lo_nz > 1000, (
        f"bf16 split folded on this backend (mid_nz={mid_nz}, lo_nz={lo_nz})")
    idx = jnp.asarray(rng.randint(0, 448, size=(448, 60)).astype(np.int32))
    out = np.asarray(jax.jit(gather_rows)(src, idx))
    err = float(np.abs(out - np.asarray(src)[np.asarray(idx)]).max())
    assert err == 0.0, f"gather_rows not exact on hardware (max err {err})"
    print(f"# split fold-proof: ok (mid_nz={mid_nz}, lo_nz={lo_nz}, "
          f"gather exact)", file=sys.stderr, flush=True)
    return {"mid_nz": mid_nz, "lo_nz": lo_nz, "gather_max_err": err}


def edge_table_hw_check():
    """Compiled (Mosaic-lowered) edge-table kernel vs XLA builder, valid
    edges only, at the real 1AVX size + two synthetic buckets."""
    from dfmdock_tpu.features.sixd import pairwise_ca_dist
    from dfmdock_tpu.models.edges import select_edges
    from dfmdock_tpu.models.egnn import build_edge_table_xla
    from dfmdock_tpu.ops.edge_table import build_edge_table
    from dfmdock_tpu.ops.fused_egcl import (
        R_CD, R_DB, R_IDX, R_MASK, R_OB, R_PB, R_RAD, R_RP, R_TB,
    )

    int_rows = {"db": R_DB, "ob": R_OB, "tb": R_TB, "pb": R_PB, "rp": R_RP,
                "idx": R_IDX}
    f32_rows = {"rad": R_RAD, "cdx": R_CD, "cdy": R_CD + 1, "cdz": R_CD + 2}

    _, real = bench._batch()
    cases = [("1AVX/448", real)]
    for n_pad in (128, 640):
        cases.append((f"synth/{n_pad}", bench._synthetic_batch(n_pad, seed=n_pad)))

    f_pl = jax.jit(lambda *a: build_edge_table(*a, normalize=True))
    f_xla = jax.jit(lambda *a: build_edge_table_xla(*a, normalize=True))

    out = {}
    for label, b in cases:
        idx, edge_mask = select_edges(
            jax.random.PRNGKey(11), pairwise_ca_dist(b["pos"]),
            b["node_mask"].astype(bool), knn=KNN, sample_size=SAMPLE,
        )
        args = (idx, edge_mask, b["pos"], b["res_id"], b["asym_id"])
        t_pl = np.asarray(f_pl(*args), np.float32)
        t_xla = np.asarray(f_xla(*args), np.float32)
        valid = np.asarray(edge_mask).reshape(-1) > 0.5
        res = {}
        n_valid = int(valid.sum())
        for name, r in int_rows.items():
            flips = int((t_pl[r].reshape(-1)[valid]
                         != t_xla[r].reshape(-1)[valid]).sum())
            res[name + "_bin_flips"] = flips
            # boundary flips are measure-zero on real geometry; allow a
            # handful per million edges, never on idx/mask/rp (exact paths)
            limit = 0 if name in ("idx", "rp") else max(2, n_valid // 200000)
            assert flips <= limit, (
                f"edge-table HW parity FAILED {label}: {name} {flips} flips "
                f"over {n_valid} valid edges (limit {limit})")
        for name, r in f32_rows.items():
            a, x = t_pl[r].reshape(-1)[valid], t_xla[r].reshape(-1)[valid]
            rel = float(np.abs(a - x).max() / (np.abs(x).max() + 1e-9))
            res[name + "_max_rel"] = round(rel, 9)
            assert rel < 1e-4, (
                f"edge-table HW parity FAILED {label}: {name} rel {rel}")
        mrow = (t_pl[R_MASK] != t_xla[R_MASK]).sum()
        assert mrow == 0, f"mask row differs at {label}"
        res["n_valid_edges"] = n_valid
        out[label] = res
        print(f"# edge-table {label}: ok ({n_valid} valid edges)",
              file=sys.stderr, flush=True)
    return out


def topk_exactness():
    """approx_max_k(recall_target=0.9999) vs lax.top_k on the two tensors
    select_edges actually reduces (knn over -dist; gumbel-perturbed sample
    logits), per padded width.  Exact = identical values AND indices."""
    from dfmdock_tpu.features.sixd import pairwise_ca_dist

    f_ex = jax.jit(lambda x, k: jax.lax.top_k(x, k), static_argnums=1)
    f_ap = jax.jit(
        lambda x, k: jax.lax.approx_max_k(x, k, recall_target=0.9999),
        static_argnums=1)

    out = {}
    for n_pad in TOPK_WIDTHS:
        b = bench._synthetic_batch(n_pad, seed=n_pad + 7)
        node_mask = b["node_mask"].astype(bool)
        dist = pairwise_ca_dist(b["pos"])
        masked_neg = jnp.where(node_mask[None, :], -dist, -1e30)

        ev, ei = f_ex(masked_neg, KNN)
        av, ai = f_ap(masked_neg, KNN)
        knn_ok = bool(np.array_equal(np.asarray(ei), np.asarray(ai))
                      and np.array_equal(np.asarray(ev), np.asarray(av)))

        kth = ev[:, -1:]
        logits = -3.0 * jnp.log(jnp.maximum(dist, 1e-10))
        logits = jnp.where(node_mask[None, :] & (masked_neg < kth),
                           logits, -1e30)
        g = jax.random.gumbel(jax.random.PRNGKey(n_pad), dist.shape)
        ev2, ei2 = f_ex(logits + g, SAMPLE)
        av2, ai2 = f_ap(logits + g, SAMPLE)
        samp_ok = bool(np.array_equal(np.asarray(ei2), np.asarray(ai2))
                       and np.array_equal(np.asarray(ev2), np.asarray(av2)))

        out[n_pad] = {"knn_exact": knn_ok, "sample_exact": samp_ok}
        print(f"# topk width {n_pad}: knn_exact={knn_ok} sample_exact={samp_ok}",
              file=sys.stderr, flush=True)
    return out


def select_topk_hw_check():
    """Compiled (Mosaic-lowered) fused selection kernel (ops/select_topk.py)
    vs the XLA select_edges, bit-compared at every padded width.  Full-graph
    widths must match exactly; a tiny-valid case checks the masked contract."""
    from dfmdock_tpu.features.sixd import pairwise_ca_dist
    from dfmdock_tpu.models.edges import select_edges
    from dfmdock_tpu.ops.select_topk import select_topk_fused

    f_ref = jax.jit(lambda k, d, m: select_edges(k, d, m, KNN, SAMPLE))
    f_pl = jax.jit(lambda k, d, m: select_topk_fused(k, d, m, KNN, SAMPLE))

    out = {}
    cases = [(n_pad, None) for n_pad in TOPK_WIDTHS] + [(128, 45)]
    for n_pad, n_valid in cases:
        b = bench._synthetic_batch(n_pad, seed=n_pad + 3)
        node_mask = b["node_mask"].astype(bool)
        if n_valid is not None:
            node_mask = node_mask & (jnp.arange(n_pad) < n_valid)
        dist = pairwise_ca_dist(b["pos"])
        key = jax.random.PRNGKey(n_pad + 1)
        ri, rm = f_ref(key, dist, node_mask)
        pi, pm = f_pl(key, dist, node_mask)
        mask_eq = bool(np.array_equal(np.asarray(rm), np.asarray(pm)))
        if n_valid is None:
            idx_eq = bool(np.array_equal(np.asarray(ri), np.asarray(pi)))
        else:
            m = np.asarray(rm) > 0.5
            idx_eq = bool(np.array_equal(np.asarray(ri)[m], np.asarray(pi)[m]))
        label = f"{n_pad}" + (f"/valid{n_valid}" if n_valid else "")
        out[label] = {"idx_exact": idx_eq, "mask_exact": mask_eq}
        assert idx_eq and mask_eq, f"select_topk HW parity FAILED at {label}"
        print(f"# select_topk width {label}: exact", file=sys.stderr, flush=True)
    return out


def main():
    t0 = time.time()
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        print(f"# WARNING: running on '{platform}', not TPU — Mosaic "
              f"lowering is NOT being validated", file=sys.stderr)

    try:
        sha = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        sha = None
    fast, slow, params = bench._nets()
    _, real = bench._batch()
    summary = {
        "platform": platform,
        "device": str(jax.devices()[0]),
        "git_sha": sha,
        "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "split_fold": split_fold_check(),
        "pallas_parity": bench.pallas_parity_check(fast, slow, params, real),
        "edge_table": edge_table_hw_check(),
        "approx_topk": topk_exactness(),
        "select_topk": select_topk_hw_check(),
        "wall_s": None,
    }
    summary["wall_s"] = round(time.time() - t0, 1)
    line = json.dumps(summary)
    with open(os.path.join(REPO, "scripts", "hw_parity_out.json"), "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
