"""Typed configuration for dfmdock_tpu.

One dataclass tree serves training and inference (replaces the reference's Hydra
config groups; shipped hyperparameters mirror
reference configs/model/score_model_mlsb.yaml and configs/inference.yaml).
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Score network hyperparameters (reference configs/model/score_model_mlsb.yaml:3-14)."""

    lm_embed_dim: int = 1301          # 1280 ESM2-650M + 21 one-hot
    positional_embed_dim: int = 66    # AF2-multimer relpos (clip +-32 + cross-chain class)
    spatial_embed_dim: int = 100      # 40 dist + 24 omega + 24 theta + 12 phi bins
    node_dim: int = 256
    edge_dim: int = 128
    inner_dim: int = 128
    depth: int = 6
    dropout: float = 0.1
    cut_off: float = 20.0             # energy-head pair mask cutoff (Angstrom)
    normalize: bool = True            # EGNN coord_diff normalization
    agg: str = "mean"                 # energy/force aggregation (DFMDock lineage)
    # Edge selection (reference score_net_mlsb.py:85-135): 20 nearest neighbours
    # (incl. self) + 40 inverse-cubic-distance samples per node.
    knn: int = 20
    sample_size: int = 40
    # MXU compute dtype for the big matmuls ('float32' or 'bfloat16'); params
    # and accumulations stay float32 either way.
    compute_dtype: str = "float32"
    # Fused Pallas EGCL message kernel on the inference (predict) path.
    use_pallas: bool = False
    # Build the packed [16, E] edge table (6D bins + relpos + coord geometry)
    # in one Pallas pass (ops/edge_table.py) instead of the XLA featurize.
    # Only consulted when use_pallas is on.
    edge_table_kernel: bool = False
    # Fused kNN + Gumbel-top-k edge selection (ops/select_topk.py) instead of
    # the two XLA sorts.  Only consulted when use_pallas is on.
    select_kernel: bool = False
    # mlsb Score_Net centers on the ligand-CA centroid inside the net
    # (score_net_mlsb.py:353-355); the older score_net.py twin does not
    # (its wrapper centers instead, score_model.py:61-78).
    center_in_net: bool = True

    @property
    def edges_per_node(self) -> int:
        return self.knn + self.sample_size

    @classmethod
    def fast(cls, **overrides) -> "ModelConfig":
        """The production inference fast path: bf16 MXU compute + the fused
        Pallas kernels whose hardware A/B has been won.  bench.py, the CLIs
        and the eval scripts all build their fast config here, so flipping a
        kernel default after its A/B is a one-line change.

        Kernel flags start False until scripts/{edge_table,select_topk}
        _bench.py prove them faster under the real Mosaic lowering
        (interpret mode cannot, NOTES.md round 3).

        edge_table_kernel=True: the corrected (fold-proof bf16-split)
        kernel wins its A/B — 1066.8-1081.6 steps/s vs 1009.9-1012.9 XLA
        at P=40 across three independent round-5 runs (~+6%; NOTES.md
        round 5, incl. the one outlier reading and why it's discounted).
        select_kernel stays False: -1.8% AND the in-sampler bit-parity
        gate fails (selections diverge over 40 steps)."""
        kw = dict(
            compute_dtype="bfloat16", use_pallas=True, edge_table_kernel=True
        )
        kw.update(overrides)
        return cls(**kw)


@dataclasses.dataclass(frozen=True)
class R3Config:
    """Translation VE-SDE (reference r3_diffuser.py:15-55)."""

    min_sigma: float = 0.1
    max_sigma: float = 30.0


@dataclasses.dataclass(frozen=True)
class SO3Config:
    """IGSO3 VE-SDE (reference so3_diffuser.py:139-369)."""

    num_omega: int = 1000
    num_sigma: int = 1000
    min_sigma: float = 0.1
    max_sigma: float = 1.5
    schedule: str = "logarithmic"
    cache_dir: str = ".cache/igso3"
    use_cached_score: bool = False
    expansion_L: int = 1000


@dataclasses.dataclass(frozen=True)
class DiffuserConfig:
    r3: R3Config = dataclasses.field(default_factory=R3Config)
    so3: SO3Config = dataclasses.field(default_factory=SO3Config)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """Training flags (reference configs/model/score_model_mlsb.yaml:30-41)."""

    lr: float = 1e-4
    weight_decay: float = 0.0
    perturb_tr: bool = True
    perturb_rot: bool = True
    separate_energy_loss: bool = True
    separate_tr_loss: bool = True
    separate_rot_loss: bool = True
    use_interface_loss: bool = True
    grad_energy: bool = False
    use_contrastive_loss: bool = False
    # contrastive-ranking knobs (round 4, VERDICT r3 #3).  Defaults keep the
    # reference construction (score_model_mlsb.py:177-185): weight 1, no
    # margin, the pair = gt vs THE score-matching noised pose at the shared t.
    contrastive_weight: float = 1.0
    contrastive_margin: float = 0.0
    # > 0: draw a SEPARATE t_c ~ U(eps, contrastive_t_max) and build the
    # negative(s) at t_c — small values make hard near-native negatives,
    # matching the regime where min-energy ranking actually operates
    contrastive_t_max: float = 0.0
    # > 1: K independent negatives at t_c, InfoNCE log(1 + sum exp(E_gt-E_i))
    contrastive_negatives: int = 1
    # > 0: ADDITIONAL over-buried negatives: the ligand translated toward the
    # receptor centroid by U(1, 5) A from the native pose.  Targets the
    # measured round-4 failure (gt_margin_probe: held-out energy rewards
    # over-contacted decoys BELOW the native) with the exact decoy family the
    # isotropic diffusion negatives rarely produce.
    contrastive_clash_negatives: int = 0
    # DFMDock-lineage extras (reference configs/model/DFMDock.yaml:39-52)
    crop_size: int = 1200
    use_confidence_loss: bool = False
    use_dist_loss: bool = False


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Reverse-SDE sampling (reference inference_base.py:390-468, configs/inference.yaml)."""

    num_steps: int = 40
    eps: float = 1e-3
    tr_noise_scale: float = 0.5
    rot_noise_scale: float = 0.5
    use_clash_force: bool = False
    noise_annealing: bool = False
    ode: bool = False
    perturb_tr: bool = True
    perturb_rot: bool = True
    # pose randomization: random SO(3) rotation + N(0, 30 A) translation
    # (reference inference_base.py:318-340)
    init_tr_sigma: float = 30.0
    # centering convention: 'ca' = ligand-CA centroid (inference_base.py:322,343),
    # 'bb' = all-backbone-atom mean (inference.py:224-225,245)
    center_mode: str = "ca"
    # 'em' = Euler-Maruyama (reference); 'heun' = 2nd-order Heun on the
    # probability-flow ODE (requires ode=True; 2 net evals/step, holds
    # quality at far fewer steps — new capability, no reference counterpart)
    integrator: str = "em"


@dataclasses.dataclass(frozen=True)
class DFMDockConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    diffuser: DiffuserConfig = dataclasses.field(default_factory=DiffuserConfig)
    experiment: ExperimentConfig = dataclasses.field(default_factory=ExperimentConfig)
    sampler: SamplerConfig = dataclasses.field(default_factory=SamplerConfig)


def _build(cls, d: dict):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            continue  # tolerate extra keys (e.g. Hydra _target_)
        t = fields[k].type
        sub = {
            "model": ModelConfig, "r3": R3Config, "so3": SO3Config,
            "diffuser": DiffuserConfig, "experiment": ExperimentConfig,
            "sampler": SamplerConfig,
        }.get(k)
        kwargs[k] = _build(sub, v) if (sub and isinstance(v, dict)) else v
    return cls(**kwargs)


def from_yaml(path: str) -> DFMDockConfig:
    """Load a config YAML (accepts this package's layout and the reference's
    Hydra model YAMLs with model/diffuser/experiment blocks)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    raw.pop("_target_", None)
    return _build(DFMDockConfig, raw)


def to_yaml(cfg, path: str):
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
