"""Foundation-model feature label generation: extractor interface + PCA.

Parity targets: scripts/preprocessing/create_pe_dataset.py:420-526 (DINOv2
patch-feature extraction -> PCA reduction to 128-d -> bilinear resize to the
backbone feature resolution -> .npy labels) and
creste/utils/feature_extractor.py:54-109 (`compute_pca_reduction` via
torch.pca_lowrank over <=100k sampled feature vectors).

TPU-first design: PCA is a jitted jnp SVD over a statically-sized sample
matrix; the projection + resize is one fused jit. The foundation model
itself sits behind ``FeatureExtractor`` — a torch/transformers-backed
DINOv2 when weights are available locally, a seeded random-projection
extractor otherwise (tests, egress-free environments).
"""
from __future__ import annotations

from functools import partial
from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class FeatureExtractor(Protocol):
    feature_dim: int

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """[B, H, W, 3] float images -> [B, hp, wp, D] patch features."""
        ...


@partial(jax.jit, static_argnames=("k",))
def pca_fit(samples: Array, k: int = 128) -> tuple[Array, Array]:
    """Fit a k-dim PCA basis on [N, D] feature samples.

    Returns (mean [D], components [D, k]) — matches torch.pca_lowrank's
    centered-V usage (feature_extractor.py:54-69).
    """
    mean = jnp.mean(samples, axis=0)
    x = samples - mean
    # economy SVD of the centered sample matrix
    _, _, vt = jnp.linalg.svd(x, full_matrices=False)
    return mean, vt[:k].T


@partial(jax.jit, static_argnames=("out_hw",))
def pca_project_resize(
    feats: Array, mean: Array, components: Array,
    out_hw: tuple[int, int],
) -> Array:
    """[B, hp, wp, D] -> centered PCA projection [B, H, W, k] with bilinear
    resize to the backbone feature resolution (create_pe_dataset.py:441-510)."""
    proj = (feats - mean) @ components
    B, _, _, k = proj.shape
    return jax.image.resize(proj, (B,) + out_hw + (k,), "bilinear")


def sample_features(
    feats_list: list[np.ndarray], max_samples: int = 100_000, seed: int = 0
) -> np.ndarray:
    """Uniformly sample <= max_samples feature vectors across frames."""
    flat = np.concatenate([f.reshape(-1, f.shape[-1]) for f in feats_list])
    if len(flat) <= max_samples:
        return flat
    rng = np.random.default_rng(seed)
    return flat[rng.choice(len(flat), max_samples, replace=False)]


def pca_rgb_visualization(proj: np.ndarray) -> np.ndarray:
    """First 3 PCA channels -> [0,1] RGB (VIS_FEATS, create_pe_dataset.py:513)."""
    rgb = proj[..., :3]
    lo = rgb.min(axis=tuple(range(rgb.ndim - 1)), keepdims=True)
    hi = rgb.max(axis=tuple(range(rgb.ndim - 1)), keepdims=True)
    return (rgb - lo) / np.maximum(hi - lo, 1e-8)


class RandomProjectionExtractor:
    """Seeded stand-in extractor for egress-free environments/tests: patch
    features are a fixed random projection of 14x14 patch statistics, so
    outputs are deterministic and spatially coherent."""

    def __init__(self, feature_dim: int = 768, patch: int = 14, seed: int = 0):
        self.feature_dim = feature_dim
        self.patch = patch
        rng = np.random.default_rng(seed)
        self._w = rng.normal(size=(patch * patch * 3, feature_dim)).astype(
            np.float32
        ) / np.sqrt(patch * patch * 3)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        p = self.patch
        B, H, W, C = images.shape
        hp, wp = H // p, W // p
        x = images[:, : hp * p, : wp * p]
        x = x.reshape(B, hp, p, wp, p, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, hp, wp, p * p * C)
        return x @ self._w


class DinoV2Extractor:
    """DINOv2 patch features via HF transformers (torch-cpu backend).

    Used for real label generation when the pretrained weights are present
    in the local HF cache; raises ImportError/OSError otherwise (callers
    fall back to RandomProjectionExtractor)."""

    def __init__(self, model_name: str = "facebook/dinov2-base"):
        import torch
        from transformers import AutoImageProcessor, AutoModel

        self._torch = torch
        self.processor = AutoImageProcessor.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name).eval()
        self.feature_dim = self.model.config.hidden_size
        self.patch = self.model.config.patch_size

    def __call__(self, images: np.ndarray) -> np.ndarray:
        torch = self._torch
        with torch.no_grad():
            inputs = self.processor(
                images=[(im * 255).astype(np.uint8) for im in images],
                return_tensors="pt",
            )
            out = self.model(**inputs).last_hidden_state[:, 1:]  # drop CLS
            B = images.shape[0]
            hp = inputs["pixel_values"].shape[-2] // self.patch
            wp = inputs["pixel_values"].shape[-1] // self.patch
            return out.reshape(B, hp, wp, -1).numpy()


def build_extractor(name: str = "auto", **kwargs) -> FeatureExtractor:
    if name in ("auto", "dinov2"):
        try:
            return DinoV2Extractor(**kwargs)
        except Exception:
            if name == "dinov2":
                raise
    return RandomProjectionExtractor()
