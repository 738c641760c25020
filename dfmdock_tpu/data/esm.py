"""ESM2-650M per-residue embedding provider (pluggable).

The reference embeds sequences with facebook ESM2-650M at inference time
(inference_base.py:294-306, repr layer 33, special tokens stripped).  This
environment has zero network egress, so the provider resolves in order:

1. precomputed embeddings (the bundled DB5 npz files carry them);
2. a locally cached HuggingFace `facebook/esm2_t33_650M_UR50D`
   (transformers, local_files_only);
3. otherwise raises with instructions.

`one_hot_only` mode exists for models trained without ESM features
(ppi_dataset.py:281-286 use_esm=False path).
"""
from __future__ import annotations

import numpy as np

ESM_DIM = 1280
_HF_NAME = "facebook/esm2_t33_650M_UR50D"


class ESMProvider:
    """Lazy HF-transformers ESM2 wrapper (CPU torch)."""

    def __init__(self, model_name: str = _HF_NAME, device: str = "cpu"):
        self._model = None
        self._tok = None
        self.model_name = model_name
        self.device = device

    def _load(self):
        if self._model is not None:
            return
        try:
            import torch
            from transformers import AutoTokenizer, EsmModel

            self._tok = AutoTokenizer.from_pretrained(
                self.model_name, local_files_only=True
            )
            self._model = (
                EsmModel.from_pretrained(self.model_name, local_files_only=True)
                .to(self.device)
                .eval()
            )
        except Exception as e:  # pragma: no cover - environment dependent
            raise RuntimeError(
                f"ESM2 weights unavailable locally ({e}). Either provide "
                "precomputed embeddings (npz input with rec_x/lig_x), download "
                f"{self.model_name} into the HF cache, or run with "
                "--one-hot-only (requires a model trained without ESM)."
            ) from e

    def embed(self, seq: str) -> np.ndarray:
        """[L] sequence -> [L, 1280] float32 (last hidden layer, specials
        stripped — matches repr layer 33 of the fairseq esm API)."""
        self._load()
        import torch

        inputs = self._tok(seq, return_tensors="pt", add_special_tokens=True)
        with torch.no_grad():
            out = self._model(**{k: v.to(self.device) for k, v in inputs.items()})
        rep = out.last_hidden_state[0, 1:-1, :].cpu().numpy().astype(np.float32)
        assert rep.shape == (len(seq), ESM_DIM), rep.shape
        return rep


class JaxESMProvider:
    """Pure-JAX ESM2 (models/esm2.py) — embedding runs jitted on TPU.

    Weights still come from the locally cached HF checkpoint (converted once
    at construction)."""

    def __init__(self):
        import jax
        import jax.numpy as jnp

        from dfmdock_tpu.models.esm2 import ESM2_650M, load_hf_esm2

        self.cfg = ESM2_650M
        self.params = jax.tree_util.tree_map(jnp.asarray, load_hf_esm2())

    def embed(self, seq: str) -> np.ndarray:
        from dfmdock_tpu.models.esm2 import embed_sequence

        return np.asarray(embed_sequence(self.params, seq, self.cfg))


def get_provider(backend: str = "auto"):
    """'hf' -> torch CPU; 'jax' -> pure-JAX on the default device; 'auto'
    prefers jax and falls back to hf."""
    if backend == "hf":
        return ESMProvider()
    if backend == "jax":
        return JaxESMProvider()
    try:
        return JaxESMProvider()
    except Exception:
        return ESMProvider()


def embeddings_available() -> bool:
    try:
        ESMProvider()._load()
        return True
    except RuntimeError:
        return False
