"""Reference-cost PyTorch baseline for benchmarking ONLY.

The repository has no published numbers and the reference's checkpoints are
absent from the mount (BASELINE.md), so the PyTorch operating point must be
*measured*.  This module is an independent re-implementation, written to match
the reference pipeline's computational profile (eager PyTorch, batch size 1,
dense O(N^2) featurization with one-hot [N,N,100]+[N,N,66] tensors, a flat
60*N edge list with index_add scatter aggregation, six EGNN layers, an [R,L]
energy head, and a sequential 40-step Euler-Maruyama loop) — NOT to share its
code.  Used by bench.py to produce the `vs_baseline` ratio.
"""
from __future__ import annotations

import math
import time

import numpy as np
import torch

NODE_DIM, EDGE_DIM, INNER_DIM, DEPTH = 256, 128, 128, 6
KNN, SAMPLE = 20, 40


def _mlp(sizes, bias=True, final_act=None):
    layers = []
    for a, b in zip(sizes[:-1], sizes[1:]):
        layers += [torch.nn.Linear(a, b, bias=bias), torch.nn.SiLU()]
    layers = layers[:-1]
    if final_act is not None:
        layers.append(final_act)
    return torch.nn.Sequential(*layers)


class BaselineNet(torch.nn.Module):
    """Same tensor shapes / op mix as the reference Score_Net hot path."""

    def __init__(self, feat_dim=1301):
        super().__init__()
        self.single = torch.nn.Linear(feat_dim, NODE_DIM, bias=False)
        self.spatial = torch.nn.Linear(100, EDGE_DIM, bias=False)
        self.positional = torch.nn.Linear(66, EDGE_DIM, bias=False)
        self.edge_mlps = torch.nn.ModuleList()
        self.node_mlps = torch.nn.ModuleList()
        self.atts = torch.nn.ModuleList()
        for _ in range(DEPTH):
            self.edge_mlps.append(
                _mlp([2 * NODE_DIM + 1 + EDGE_DIM, NODE_DIM, NODE_DIM], final_act=torch.nn.SiLU())
            )
            self.node_mlps.append(_mlp([2 * NODE_DIM, NODE_DIM, NODE_DIM]))
            self.atts.append(_mlp([NODE_DIM, 1], final_act=torch.nn.Sigmoid()))
        self.coord_head = _mlp([NODE_DIM, NODE_DIM, 1], bias=True)
        self.energy_head = torch.nn.Sequential(
            torch.nn.Linear(2 * NODE_DIM, NODE_DIM, bias=False),
            torch.nn.LayerNorm(NODE_DIM),
            torch.nn.SiLU(),
            torch.nn.Linear(NODE_DIM, 1, bias=False),
        )
        self.tr_mlp = _mlp([INNER_DIM + 1, INNER_DIM, 1], bias=False, final_act=torch.nn.Softplus())
        self.rot_mlp = _mlp([INNER_DIM + 1, INNER_DIM, 1], bias=False, final_act=torch.nn.Softplus())
        self.register_buffer("fourier_w", torch.randn(INNER_DIM // 2))

    def dense_pair_features(self, pos):
        """O(N^2) trig featurization + one-hot(100), as the reference does
        every forward pass."""
        n_at, ca, c_at = pos[:, 0], pos[:, 1], pos[:, 2]
        b = ca - n_at
        c = c_at - ca
        cb = -0.58273431 * torch.cross(b, c, dim=-1) + 0.56802827 * b - 0.54067466 * c + ca
        n = ca.shape[0]
        d = torch.cdist(ca, ca)

        def dihedral(a, b_, c_, d_):
            b1, b2, b3 = a - b_, b_ - c_, c_ - d_
            n1 = torch.nn.functional.normalize(torch.cross(b1, b2, dim=-1), dim=-1)
            n2 = torch.nn.functional.normalize(torch.cross(b2, b3, dim=-1), dim=-1)
            m1 = torch.cross(n1, torch.nn.functional.normalize(b2, dim=-1), dim=-1)
            return torch.atan2((m1 * n2).sum(-1), (n1 * n2).sum(-1)) * (180 / math.pi)

        CAi = ca[:, None].expand(n, n, 3)
        CAj = ca[None, :].expand(n, n, 3)
        CBi = cb[:, None].expand(n, n, 3)
        CBj = cb[None, :].expand(n, n, 3)
        Ni = n_at[:, None].expand(n, n, 3)
        omega = dihedral(CAi, CBi, CBj, CAj)
        theta = dihedral(Ni, CAi, CBi, CBj)
        v1 = CAi - CBi
        v2 = CBj - CBi
        phi = torch.acos(
            (v1 * v2).sum(-1) / (v1.norm(dim=-1) * v2.norm(dim=-1) + 1e-9)
        ) * (180 / math.pi)

        def binize(x, lo, hi, nb):
            bnd = torch.linspace(lo, hi, nb - 1)
            return (x[..., None] > bnd).sum(-1)

        keep = (d < 22.0) & ~torch.eye(n, dtype=bool)
        oh = [torch.nn.functional.one_hot(binize(d, 3.25, 50.75, 40), 40)]
        for x, nb, lo, hi in [(omega, 24, -180, 180), (theta, 24, -180, 180), (phi, 12, 0, 180)]:
            bins = binize(torch.nan_to_num(x), lo, hi, nb)
            bins[~keep] = 0
            oh.append(torch.nn.functional.one_hot(bins, nb))
        return torch.cat(oh, -1).float(), d

    def forward(self, x, pos, relpos_onehot, n_rec, t):
        node = self.single(x)
        pair_oh, d = self.dense_pair_features(pos)
        edge_dense = self.spatial(pair_oh) + self.positional(relpos_onehot)

        n = pos.shape[0]
        _, knn_idx = torch.topk(d, KNN, largest=False)
        probs = 1.0 / d.clamp(min=1e-9) ** 3
        probs.scatter_(1, knn_idx, 0.0)
        probs = probs / probs.sum(1, keepdim=True)
        samp_idx = torch.multinomial(probs, SAMPLE, replacement=False)
        idx = torch.cat([knn_idx, samp_idx], 1)
        src = torch.arange(n)[:, None].expand_as(idx).reshape(-1)
        dst = idx.reshape(-1)
        e_attr = edge_dense[src, dst]

        coord = pos[:, 1]
        h = node
        for layer in range(DEPTH):
            diff = coord[src] - coord[dst]
            radial = (diff**2).sum(-1, keepdim=True)
            diff = diff / (radial.sqrt() + 1.0)
            m = self.edge_mlps[layer](torch.cat([h[src], h[dst], radial, e_attr], -1))
            m = m * self.atts[layer](m)
            if layer == DEPTH - 1:
                w = self.coord_head(m).clamp(-2, 2)
                upd = torch.zeros_like(coord).index_add_(0, src, diff * w)
                cnt = torch.zeros(n, 1).index_add_(0, src, torch.ones(len(src), 1))
                mask = torch.zeros(n, 1)
                mask[n_rec:] = 1
                coord = coord + (upd / cnt.clamp(min=1)) * mask
            agg = torch.zeros(n, NODE_DIM).index_add_(0, src, m)
            h = h + self.node_mlps[layer](torch.cat([h, agg], -1))

        h_r, h_l = h[:n_rec], h[n_rec:]
        pair = torch.cat(
            [
                h_r[:, None].expand(-1, h_l.shape[0], -1),
                h_l[None, :].expand(h_r.shape[0], -1, -1),
            ],
            -1,
        )
        e = self.energy_head(pair).squeeze(-1)
        m2d = (d[:n_rec, n_rec:] < 20.0).float()
        energy = (e * m2d).sum() / (m2d.sum() + 1e-6)

        f = coord[n_rec:] - pos[n_rec:, 1]
        tr = f.mean(0, keepdim=True)
        rot = torch.cross(pos[n_rec:, 1], f, dim=-1).mean(0, keepdim=True)
        temb = torch.sigmoid(
            torch.cat(
                [torch.sin(t * self.fourier_w * 2 * math.pi), torch.cos(t * self.fourier_w * 2 * math.pi)],
                -1,
            )
        )[None]
        trn = tr.norm(keepdim=True)
        tr_score = tr / (trn + 1e-6) * self.tr_mlp(torch.cat([trn, temb], -1))
        rotn = rot.norm(keepdim=True)
        rot_score = rot / (rotn + 1e-6) * self.rot_mlp(torch.cat([rotn, temb], -1))
        return tr_score, rot_score, energy


@torch.no_grad()
def time_em_steps(rec_x, lig_x, rec_pos, lig_pos, num_steps=5):
    """Time `num_steps` sequential EM-style steps (model forward + rigid
    update), single pose, CPU — the reference's operating mode.
    Returns seconds per denoising step."""
    torch.manual_seed(0)
    n_rec = rec_x.shape[0]
    x = torch.from_numpy(np.concatenate([rec_x, lig_x])).float()
    pos = torch.from_numpy(np.concatenate([rec_pos, lig_pos])).float()
    n = x.shape[0]

    # relpos one-hot computed once per complex, as in the reference
    res_id = torch.arange(n)
    asym = torch.zeros(n, dtype=torch.long)
    asym[n_rec:] = 1
    off = (res_id[:, None] - res_id[None, :] + 32).clamp(0, 64)
    off = torch.where(asym[:, None] == asym[None, :], off, torch.tensor(65))
    relpos = torch.nn.functional.one_hot(off, 66).float()

    model = BaselineNet(x.shape[1]).eval()

    # warmup (allocator, threading)
    model(x, pos, relpos, n_rec, torch.tensor(0.9))

    start = time.perf_counter()
    for i in range(num_steps):
        t = torch.tensor(1.0 - i / max(num_steps, 1))
        tr_score, rot_score, energy = model(x, pos, relpos, n_rec, t)
        # rigid pose update (cost-representative)
        upd = 0.01 * tr_score.squeeze(0)
        center = pos[n_rec:, 1].mean(0)
        ang = 0.01 * rot_score.squeeze(0)
        th = ang.norm() + 1e-9
        k = ang / th
        Km = torch.tensor(
            [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
        )
        R = torch.eye(3) + torch.sin(th) * Km + (1 - torch.cos(th)) * (Km @ Km)
        pos[n_rec:] = (pos[n_rec:] - center) @ R.T + center + upd
    elapsed = time.perf_counter() - start
    return elapsed / num_steps
