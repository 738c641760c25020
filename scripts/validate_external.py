"""Readiness kit for the two external blockers (VERDICT r2 Missing #1/#2).

The reference's trained checkpoints (`checkpoints/dips/model_0.ckpt`,
`weights/pinder_0.ckpt` — absent from this mount, see
/root/reference/.MISSING_LARGE_BLOBS) and the ESM2-650M weights (no HF cache,
zero egress) are the only things standing between this framework and a real
DockQ-parity table.  This script turns "blocker lifted" into a ~10-minute
validation instead of a round of work:

  # A. a reference checkpoint appears:
  python scripts/validate_external.py --ckpt /path/model_0.ckpt --lineage mlsb
      -> converts the Lightning state_dict (utils/torch_convert.py),
         checks full-size forward parity vs the ACTUAL reference net
         (tests/_ref_oracle.py) with those weights,
         docks 1AVX on TPU and prints energy/DockQ,
         then (--sweep) runs the DB5 sweep for the DockQ table.

  # B. an ESM2-650M HF snapshot appears (e.g. rsync'd into ~/.cache/huggingface):
  python scripts/validate_external.py --esm facebook/esm2_t33_650M_UR50D
      -> loads it with local_files_only, embeds the DB5 sequences with the
         JAX ESM2 port (models/esm2.py), and reports per-residue cosine
         similarity against the reference's own bundled embeddings
         (data/db5_npz/*.npz `rec_x`/`lig_x` came from the reference's .pt
         files, i.e. real fairseq ESM2-650M outputs — the gold standard).
         Pass/fail gate: mean cosine >= 0.99.

Reference entry points being validated: inference_base.py:294-306 (ESM),
inference_base.py:611-614 / inference.py:511 (checkpoint loads).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def validate_ckpt(path: str, lineage: str, sweep: bool, num_samples: int) -> int:
    import numpy as np

    from dfmdock_tpu.utils.torch_convert import load_lightning_checkpoint

    print(f"[1/4] converting {path} ({lineage}) ...")
    params, hparams = load_lightning_checkpoint(path, lineage=lineage)
    n_leaves = len([x for x in _tree_leaves(params)])
    print(f"      ok: {n_leaves} weight tensors; hparams keys: {sorted(hparams)[:8]}")

    print("[2/4] full-size forward parity vs the actual reference net ...")
    rc = _forward_parity(path, lineage)
    if rc:
        return rc

    print("[3/4] docking 1AVX with the converted checkpoint (TPU) ...")
    out_dir = "/tmp/validate_external_dock"
    from dfmdock_tpu.cli import dock as dock_cli

    dock_cli.main([
        "--npz", os.path.join(REPO, "data/db5_npz/1AVX.npz"),
        "--ckpt", path, "--lineage", lineage,
        "--num-samples", str(num_samples), "--out-dir", out_dir,
    ])
    print(f"      wrote {out_dir}/metrics.csv")

    if sweep:
        print("[4/4] DB5 sweep for the DockQ parity table ...")
        from dfmdock_tpu.cli import sweep as sweep_cli

        sweep_cli.main([
            "--ckpt", path, "--lineage", lineage,
            "--num-samples", str(num_samples),
            "--out-csv", "/tmp/validate_external_sweep.csv",
        ])
        print("      wrote /tmp/validate_external_sweep.csv — compare its "
              "DockQ column against the paper's DB5 numbers")
    else:
        print("[4/4] skipped (pass --sweep for the full DB5 DockQ table)")
    return 0


def _tree_leaves(t):
    import jax

    return jax.tree_util.tree_leaves(t)


def _forward_parity(path: str, lineage: str) -> int:
    """Converted-weight forward vs the reference torch net at the shipped
    config, both loaded with the CHECKPOINT's weights (the same harness as
    tests/test_fullsize_parity.py, pointed at the real ckpt)."""
    import numpy as np

    if not os.path.isdir("/root/reference/src"):
        print("      SKIP: reference mount absent")
        return 0
    sys.path.insert(0, os.path.join(REPO, "tests"))
    sys.path.insert(0, "/root/reference/src")
    from test_reference_parity import (
        _install_graphnorm_stub,
        _jax_batch,
        _make_inputs,
        _torch_batch,
    )

    _install_graphnorm_stub()
    import jax
    import jax.numpy as jnp
    import torch

    from dfmdock_tpu.config import ModelConfig
    from dfmdock_tpu.utils.torch_convert import load_lightning_checkpoint

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k[len("net."):]: torch.as_tensor(v)
          for k, v in ckpt["state_dict"].items() if k.startswith("net.")}

    if lineage == "mlsb":
        from models.score_net_mlsb import ModelConfig as RefConfig, Score_Net

        ref = Score_Net(RefConfig(
            lm_embed_dim=1301, positional_embed_dim=66, spatial_embed_dim=100,
            contact_embed_dim=1, node_dim=256, edge_dim=128, inner_dim=128,
            depth=6, dropout=0.0, cut_off=20.0, normalize=True,
        )).eval()
        from dfmdock_tpu.models import ScoreNet as JaxNet
    else:
        from models.egnn_net import ModelConfig as RefConfig, EGNN_Net

        ref = EGNN_Net(RefConfig(
            lm_embed_dim=1301, positional_embed_dim=66, spatial_embed_dim=100,
            node_dim=256, edge_dim=128, inner_dim=128, depth=6, dropout=0.0,
            cut_off=20.0, normalize=True, agg="mean",
        )).eval()
        from dfmdock_tpu.models.egnn_net import EGNNNet as JaxNet

    missing, unexpected = ref.load_state_dict(sd, strict=False)
    if missing:
        print(f"      WARNING: ref net missing {len(missing)} keys "
              f"(e.g. {missing[:3]}) — config mismatch?")

    params, _ = load_lightning_checkpoint(path, lineage=lineage)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.RandomState(8)
    rec_x, lig_x, rec_pos, lig_pos = _make_inputs(seed=8)
    rec_x = rng.randn(rec_x.shape[0], 1301).astype(np.float32)
    lig_x = rng.randn(lig_x.shape[0], 1301).astype(np.float32)
    raw, t = (rec_x, lig_x, rec_pos, lig_pos), 0.55

    with torch.no_grad():
        ref_out = ref(_torch_batch(*raw, t), predict=True)
    net = JaxNet(ModelConfig(dropout=0.0))
    out = net.apply(params, _jax_batch(*raw, t), jax.random.PRNGKey(0),
                    predict=True)

    max_rel = {}
    for name in ("energy", "tr_score", "rot_score"):
        a = np.asarray(out[name], np.float32)
        r = np.asarray(ref_out[name].detach(), np.float32)
        max_rel[name] = float(np.abs(a - r).max() / (np.abs(r).max() + 1e-8))
    print(f"      max-rel per output: {max_rel}")
    bad = {k: v for k, v in max_rel.items() if v > 2e-2}
    if bad:
        print(f"      FAIL: outputs off tolerance: {bad}")
        return 1
    print("      ok")
    return 0


def validate_esm(name_or_path: str) -> int:
    import numpy as np

    from dfmdock_tpu.data.convert import load_npz_complex
    from dfmdock_tpu.models.esm2 import ESM2_650M, embed_sequence, load_hf_esm2

    print(f"[1/2] loading ESM2 weights from {name_or_path} (local only) ...")
    try:
        params = load_hf_esm2(name_or_path)
    except Exception as e:
        print(f"      FAIL: could not load weights: {e}")
        print("      (expected while the blocker holds: no HF cache on this "
              "machine and zero egress)")
        return 2
    print("      ok")

    print("[2/2] per-residue cosine similarity vs the reference's bundled "
          "embeddings (data/db5_npz, from the reference's own .pt files) ...")
    worst = 1.0
    for cid in ("1AVX", "7CEI"):
        raw = load_npz_complex(os.path.join(REPO, f"data/db5_npz/{cid}.npz"))
        for side in ("rec", "lig"):
            seq, gold = raw[f"{side}_seq"], raw[f"{side}_x"]
            emb = np.asarray(embed_sequence(params, seq, ESM2_650M))
            cos = (emb * gold).sum(-1) / (
                np.linalg.norm(emb, axis=-1) * np.linalg.norm(gold, axis=-1) + 1e-9
            )
            print(f"      {cid}/{side}: mean cos {cos.mean():.4f} "
                  f"min {cos.min():.4f} over {len(cos)} residues")
            worst = min(worst, float(cos.mean()))
    if worst < 0.99:
        print(f"FAIL: mean cosine {worst:.4f} < 0.99 — conversion or "
              "architecture mismatch")
        return 1
    print("ok: JAX ESM2 matches the reference's embeddings — "
          "cli/dock --pdb is fully validated")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--ckpt", help="path to a reference Lightning .ckpt")
    g.add_argument("--esm", help="HF model name or local path of an "
                                 "ESM2-650M snapshot")
    ap.add_argument("--lineage", choices=["mlsb", "dfmdock"], default="mlsb")
    ap.add_argument("--sweep", action="store_true",
                    help="also run the full DB5 sweep (slow)")
    ap.add_argument("--num-samples", type=int, default=40)
    args = ap.parse_args(argv)
    if args.ckpt:
        return validate_ckpt(args.ckpt, args.lineage, args.sweep, args.num_samples)
    return validate_esm(args.esm)


if __name__ == "__main__":
    raise SystemExit(main())
