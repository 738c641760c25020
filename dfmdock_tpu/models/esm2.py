"""ESM2 protein language model in pure JAX (inference).

The reference embeds chains with fairseq `esm2_t33_650M_UR50D` on the host
GPU (inference_base.py:294-306).  This is a from-scratch JAX implementation
of the ESM2 architecture (rotary attention, pre-LN blocks, token-dropout
rescaling) so embedding runs jitted on TPU, plus a converter from
HuggingFace `EsmModel` weights.  Numeric parity vs HF is tested with a
randomly initialized small config (no downloads needed).

ESM2-650M: 33 layers, hidden 1280, 20 heads, FFN 5120, vocab 33, rotary.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# The ESM alphabet (fairseq ordering; HF EsmTokenizer vocab matches).
ESM_TOKENS = [
    "<cls>", "<pad>", "<eos>", "<unk>",
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K", "Q", "N",
    "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O", ".", "-",
    "<null_1>", "<mask>",
]
TOKEN_TO_ID = {t: i for i, t in enumerate(ESM_TOKENS)}
CLS_ID, PAD_ID, EOS_ID, UNK_ID = 0, 1, 2, 3
MASK_ID = TOKEN_TO_ID["<mask>"]
MASK_RATIO_TRAIN = 0.15 * 0.8


@dataclasses.dataclass(frozen=True)
class ESM2Config:
    vocab_size: int = 33
    hidden_size: int = 1280
    num_layers: int = 33
    num_heads: int = 20
    intermediate_size: int = 5120
    layer_norm_eps: float = 1e-5
    token_dropout: bool = True


ESM2_650M = ESM2Config()


def tokenize(seq: str, pad_to: int | None = None) -> np.ndarray:
    """<cls> + residues + <eos> (+ <pad>...), as int32 ids."""
    ids = [CLS_ID] + [TOKEN_TO_ID.get(a, UNK_ID) for a in seq] + [EOS_ID]
    if pad_to is not None:
        ids += [PAD_ID] * (pad_to - len(ids))
    return np.asarray(ids, np.int32)


# ---------------------------------------------------------------------------
# forward


def _ln(p, x, eps):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _rotary(q, k):
    """HF ESM rotary embeddings over head_dim (inv_freq 10000^(-2i/d))."""
    # q, k: [L, heads, hd]
    L, _, hd = q.shape
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    t = jnp.arange(L, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)  # [L, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [L, hd]
    cos = jnp.cos(emb)[:, None, :]
    sin = jnp.sin(emb)[:, None, :]

    def rot_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    return q * cos + rot_half(q) * sin, k * cos + rot_half(k) * sin


def _attention(p, x, mask_bias, cfg: ESM2Config, dtype):
    L, H = x.shape
    nh = cfg.num_heads
    hd = H // nh
    ln = _ln(p["ln"], x, cfg.layer_norm_eps)
    q = _linear(p["q"], ln).reshape(L, nh, hd)
    k = _linear(p["k"], ln).reshape(L, nh, hd)
    v = _linear(p["v"], ln).reshape(L, nh, hd)
    q = q / jnp.sqrt(hd)
    q, k = _rotary(q, k)
    if dtype is not None:
        q, k, v = q.astype(dtype), k.astype(dtype), v.astype(dtype)
    scores = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32)
    scores = scores + mask_bias[None, None, :]
    probs = jax.nn.softmax(scores, -1)
    if dtype is not None:
        probs = probs.astype(dtype)
    ctx = jnp.einsum(
        "hqk,khd->qhd", probs, v, preferred_element_type=jnp.float32
    ).reshape(L, H)
    return x + _linear(p["out"], ctx)


def _ffn(p, x, cfg: ESM2Config):
    ln = _ln(p["ln"], x, cfg.layer_norm_eps)
    h = jax.nn.gelu(_linear(p["fc1"], ln), approximate=False)
    return x + _linear(p["fc2"], h)


def esm2_apply(params, tokens, cfg: ESM2Config = ESM2_650M, dtype=None):
    """tokens [L] int32 -> last hidden states [L, H] (f32).

    Matches HF EsmModel.forward(...).last_hidden_state for a single sequence
    (attention over non-pad positions; token-dropout rescale at eval).
    """
    attn_mask = (tokens != PAD_ID).astype(jnp.float32)
    x = params["embed"][tokens]
    if cfg.token_dropout:
        x = jnp.where((tokens == MASK_ID)[:, None], 0.0, x)
        src_len = attn_mask.sum()
        mask_ratio_obs = (tokens == MASK_ID).sum() / src_len
        x = x * (1 - MASK_RATIO_TRAIN) / (1 - mask_ratio_obs)
    x = x * attn_mask[:, None]

    mask_bias = (1.0 - attn_mask) * -1e9
    for layer in params["layers"]:
        x = _attention(layer["attn"], x, mask_bias, cfg, dtype)
        x = _ffn(layer["ffn"], x, cfg)
    x = _ln(params["final_ln"], x, cfg.layer_norm_eps)
    return x


def embed_sequence(params, seq: str, cfg: ESM2Config = ESM2_650M, dtype=None):
    """[L] sequence -> [L, H] per-residue embeddings (specials stripped)."""
    tokens = jnp.asarray(tokenize(seq))
    reps = esm2_apply(params, tokens, cfg, dtype)
    return reps[1 : len(seq) + 1]


# ---------------------------------------------------------------------------
# HF weight conversion


def convert_hf_esm(sd: dict, cfg: ESM2Config) -> dict:
    """HF EsmModel state_dict (numpy) -> params pytree."""
    t = lambda k: np.ascontiguousarray(np.asarray(sd[k]).T)
    a = lambda k: np.asarray(sd[k])

    def lin(name):
        return {"w": t(f"{name}.weight"), "b": a(f"{name}.bias")}

    def ln(name):
        return {"g": a(f"{name}.weight"), "b": a(f"{name}.bias")}

    layers = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        layers.append(
            {
                "attn": {
                    "ln": ln(f"{pre}.attention.LayerNorm"),
                    "q": lin(f"{pre}.attention.self.query"),
                    "k": lin(f"{pre}.attention.self.key"),
                    "v": lin(f"{pre}.attention.self.value"),
                    "out": lin(f"{pre}.attention.output.dense"),
                },
                "ffn": {
                    "ln": ln(f"{pre}.LayerNorm"),
                    "fc1": lin(f"{pre}.intermediate.dense"),
                    "fc2": lin(f"{pre}.output.dense"),
                },
            }
        )
    return {
        "embed": a("embeddings.word_embeddings.weight"),
        "layers": layers,
        "final_ln": ln("encoder.emb_layer_norm_after"),
    }


def load_hf_esm2(model_name: str = "facebook/esm2_t33_UR50D".replace("t33_", "t33_650M_"),
                 cfg: ESM2Config = ESM2_650M):
    """Load locally cached HF ESM2 weights and convert (no network)."""
    from transformers import EsmModel

    model = EsmModel.from_pretrained(model_name, local_files_only=True)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return convert_hf_esm(sd, cfg)
