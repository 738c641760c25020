"""Import helpers for using the reference PyTorch code as a test oracle.

The reference at /root/reference (read-only) depends on packages absent from
this environment (esm, biotite, pytorch_lightning, hydra, omegaconf,
torch_geometric).  None of those packages' *behavior* is exercised by the
oracle paths we test (net forward, loss_fn math, EM sampler math), so stubs
with the documented semantics are installed before import:

- torch_geometric GraphNorm: the one stub with real math — PyG's documented
  normalization (same formula as dfmdock_tpu.models.modules.graph_norm).
- pytorch_lightning.LightningModule: torch.nn.Module + no-op
  save_hyperparameters + .device property (all Score_Model.loss_fn needs).
- esm / biotite / hydra / omegaconf / datasets.*: inert placeholders.
"""
import sys
import types

REF = "/root/reference/src"


def _module(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install_stubs():
    import torch

    class GraphNorm(torch.nn.Module):
        """PyG GraphNorm: y = g*(x - a*mean)/sqrt(var(x - a*mean) + eps) + b."""

        def __init__(self, dim, eps=1e-5):
            super().__init__()
            self.eps = eps
            self.weight = torch.nn.Parameter(torch.ones(dim))
            self.bias = torch.nn.Parameter(torch.zeros(dim))
            self.mean_scale = torch.nn.Parameter(torch.ones(dim))

        def forward(self, x, batch=None):
            mean = x.mean(0, keepdim=True)
            out = x - mean * self.mean_scale
            var = out.pow(2).mean(0, keepdim=True)
            return self.weight * out / (var + self.eps).sqrt() + self.bias

    class LightningModule(torch.nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

        @property
        def device(self):
            return torch.device("cpu")

        def log(self, *a, **k):
            pass

    _module("torch_geometric")
    _module("torch_geometric.nn")
    _module("torch_geometric.nn.norm", GraphNorm=GraphNorm)
    _module("torch_geometric.loader", DataLoader=object)
    _module("torch_geometric.data")
    _module("torch_geometric.data.hetero_data", HeteroData=object)
    _module("pytorch_lightning", LightningModule=LightningModule)
    _module("esm")
    _module("hydra", main=lambda *a, **k: (lambda f: f), utils=None)
    _module("omegaconf", DictConfig=dict, OmegaConf=None)
    _module("biotite")
    _module("biotite.structure")
    _module("biotite.structure.io")
    _module("biotite.structure.io.pdb", PDBFile=object)
    _module("datasets")
    _module("datasets.ppi_mlsb_dataset", PPIDataset=object)
    _module("datasets.docking_dataset", DockingDataset=object)
    _module("datasets.pinder_dataset", PinderDataset=object)
    _module("datasets.ppi_dataset", PPIDataset=object)

    if REF not in sys.path:
        sys.path.insert(0, REF)


def ref_score_model(net_cfg, so3_cache_dir, experiment_overrides=None):
    """Construct the reference Score_Model (mlsb lineage) with small IGSO3
    tables (the EM sampler only uses the closed-form diffusion_coef; tables
    matter only for forward_marginal in loss tests, where both sides use the
    same reduced resolution)."""
    install_stubs()
    from models.score_model_mlsb import Score_Model

    ns = types.SimpleNamespace
    exp = dict(
        lr=1e-4, weight_decay=0.0, grad_energy=False, separate_energy_loss=True,
        perturb_tr=True, separate_tr_loss=True, perturb_rot=True,
        separate_rot_loss=True, use_interface_loss=True,
        use_contrastive_loss=False,
    )
    exp.update(experiment_overrides or {})
    return Score_Model(net_cfg, _diffuser_conf(so3_cache_dir), ns(**exp))


def _diffuser_conf(so3_cache_dir):
    ns = types.SimpleNamespace
    return ns(
        r3=ns(min_sigma=0.1, max_sigma=30.0),
        so3=ns(
            num_omega=100, num_sigma=50, min_sigma=0.1, max_sigma=1.5,
            schedule="logarithmic", cache_dir=so3_cache_dir,
            use_cached_score=False,
        ),
    )


def ref_dfmdock_model(net_cfg, so3_cache_dir, experiment_overrides=None):
    """Construct the reference DFMDock (EGNN_Net lineage) Lightning module."""
    install_stubs()
    from models.DFMDock import DFMDock

    ns = types.SimpleNamespace
    exp = dict(
        lr=1e-4, weight_decay=0.0, crop_size=1200, grad_energy=True,
        separate_energy_loss=True, perturb_tr=True, separate_tr_loss=True,
        perturb_rot=True, separate_rot_loss=True, use_interface_loss=True,
        use_contrastive_loss=True, use_confidence_loss=True,
        use_dist_loss=True,
    )
    exp.update(experiment_overrides or {})
    return DFMDock(net_cfg, _diffuser_conf(so3_cache_dir), ns(**exp))


def capture_loss_draws(model, seed: int):
    """Reproduce the (t, tr, rot) draws the reference loss_fn will make when
    the global numpy/torch RNGs are seeded with `seed` — same calls on the
    same diffuser objects in the same order (score_model_mlsb.py:66-94 /
    DFMDock.py:78-101), so re-seeding before model.loss_fn(batch) yields
    exactly these values."""
    import numpy as np
    import torch

    np.random.seed(seed)
    torch.manual_seed(seed)
    eps = 1e-5
    t = (torch.rand(1) * (1.0 - eps) + eps).item()
    tr_scale = model.r3_diffuser.score_scaling(t)
    tr_update, tr_score_gt = model.r3_diffuser.forward_marginal(t)
    rot_scale = model.so3_diffuser.score_scaling(t)
    rot_update, rot_score_gt = model.so3_diffuser.forward_marginal(t)
    return {
        "t": t,
        "tr_scale": tr_scale,
        "tr_update": tr_update,
        "tr_score_gt": tr_score_gt,
        "rot_scale": float(rot_scale),
        "rot_update": rot_update,
        "rot_score_gt": rot_score_gt,
    }
