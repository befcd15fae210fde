"""Neural quality metrics: DINOScore, CLIPScore, LPIPS, FID.

Parity targets (reference: starvector/metrics/compute_dino_score.py,
compute_clip_score.py, compute_LPIPS.py, compute_fid.py): cosine similarity
of DINOv2 mean-pooled features rescaled to [0,1]; CLIP image-text similarity;
VGG-based perceptual distance; Fréchet distance over InceptionV3/CLIP
features.

This image is zero-egress, so pretrained weights must exist locally. Each
calculator accepts `model_path` (a local HF checkpoint dir) or reads the
STARVECTOR_METRICS_DIR env var (expects subdirs dinov2-base /
clip-vit-base-patch32 / ...). Without weights they raise a clear error at
first use — the SVGMetrics config gates them off by default, matching the
reference's config-gated metric set (configs/metrics/*.yaml).

Feature extraction runs through torch (CPU in this image): these metrics are
eval-only and off the TPU hot path.
"""

from __future__ import annotations

import os

import numpy as np

from starvector_tpu.metrics.base_metric import BaseMetric


def _models_dir() -> str | None:
    return os.environ.get("STARVECTOR_METRICS_DIR")


def _resolve(model_path: str | None, subdir: str) -> str:
    if model_path:
        return model_path
    base = _models_dir()
    if base and os.path.isdir(os.path.join(base, subdir)):
        return os.path.join(base, subdir)
    raise FileNotFoundError(
        f"weights for {subdir} not found: pass model_path or set "
        "STARVECTOR_METRICS_DIR to a directory of local HF checkpoints "
        "(zero-egress image; weights cannot be downloaded)"
    )


class DINOScoreCalculator(BaseMetric):
    """Cosine similarity of mean-pooled DINOv2 features, rescaled to [0,1]
    (reference compute_dino_score.py:9-55)."""

    def __init__(self, config=None, model_path: str | None = None):
        super().__init__()
        self.config = config
        self.model_path = model_path
        self._model = None
        self.metric = self.calculate_DINOv2_similarity_score

    def _load(self):
        if self._model is None:
            import torch
            from transformers import AutoModel, AutoImageProcessor

            path = _resolve(self.model_path, "dinov2-base")
            self._processor = AutoImageProcessor.from_pretrained(path)
            self._model = AutoModel.from_pretrained(path).eval()
            self._torch = torch
        return self._model

    def get_embedding(self, image):
        model = self._load()
        inputs = self._processor(images=image, return_tensors="pt")
        with self._torch.no_grad():
            out = model(**inputs)
        return out.last_hidden_state.mean(dim=1)

    def calculate_DINOv2_similarity_score(self, **kwargs):
        f1 = self.get_embedding(kwargs["gt_im"])
        f2 = self.get_embedding(kwargs["gen_im"])
        sim = self._torch.nn.functional.cosine_similarity(f1, f2).item()
        return (sim + 1) / 2


class CLIPScoreCalculator(BaseMetric):
    """CLIP image-text score (reference compute_clip_score.py:11-50:
    torchmetrics CLIPScore semantics = 100 * max(cos(img, text), 0))."""

    def __init__(self, config=None, model_path: str | None = None):
        super().__init__()
        self.config = config
        self.model_path = model_path
        self._model = None
        self.metric = self.clip_score

    def _load(self):
        if self._model is None:
            import torch
            from transformers import CLIPModel, CLIPProcessor

            path = _resolve(self.model_path, "clip-vit-base-patch32")
            self._processor = CLIPProcessor.from_pretrained(path)
            self._model = CLIPModel.from_pretrained(path).eval()
            self._torch = torch
        return self._model

    def clip_score(self, **kwargs):
        model = self._load()
        inputs = self._processor(
            text=[kwargs["caption"]], images=kwargs["gen_im"],
            return_tensors="pt", padding=True, truncation=True,
        )
        with self._torch.no_grad():
            out = model(**inputs)
        img = out.image_embeds / out.image_embeds.norm(dim=-1, keepdim=True)
        txt = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
        return float(100 * (img * txt).sum(-1).clamp(min=0).item())


class LPIPSDistanceCalculator(BaseMetric):
    """Perceptual distance. The reference uses the `lpips` package's VGG
    variant (compute_LPIPS.py:9-55); with only local weights available this
    implementation computes the LPIPS-style normalized feature distance from
    any local vision backbone (default CLIP ViT) — same monotonic behavior,
    documented deviation."""

    def __init__(self, config=None, model_path: str | None = None):
        super().__init__()
        self.config = config
        self.model_path = model_path
        self._model = None
        self.metric = self.lpips

    def _load(self):
        if self._model is None:
            import torch
            from transformers import CLIPModel, CLIPProcessor

            path = _resolve(self.model_path, "clip-vit-base-patch32")
            self._processor = CLIPProcessor.from_pretrained(path)
            self._model = CLIPModel.from_pretrained(path).vision_model.eval()
            self._torch = torch
        return self._model

    def _feats(self, image):
        model = self._load()
        inputs = self._processor(images=image, return_tensors="pt")
        with self._torch.no_grad():
            out = model(inputs["pixel_values"], output_hidden_states=True)
        feats = []
        for h in out.hidden_states[1::4]:
            f = h / (h.norm(dim=-1, keepdim=True) + 1e-10)
            feats.append(f)
        return feats

    def lpips(self, **kwargs):
        fa = self._feats(kwargs["gt_im"])
        fb = self._feats(kwargs["gen_im"])
        d = sum(((a - b) ** 2).sum(-1).mean() for a, b in zip(fa, fb))
        return float(d / len(fa))


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between Gaussians (reference compute_fid.py:15-145)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


class FIDCalculator:
    """FID over a pluggable feature extractor (reference supports vendored
    InceptionV3 or CLIP ViT-B/32 features; here the extractor is a local
    CLIP checkpoint for both modes — torchvision/Inception weights are not
    shippable in this image)."""

    def __init__(self, model_name: str = "ViT-B/32", model_path: str | None = None):
        self.model_name = model_name
        self.model_path = model_path
        self._model = None
        self.class_name = self.__class__.__name__

    def reset(self):
        pass

    def _load(self):
        if self._model is None:
            import torch
            from transformers import CLIPModel, CLIPProcessor

            path = _resolve(self.model_path, "clip-vit-base-patch32")
            self._processor = CLIPProcessor.from_pretrained(path)
            self._model = CLIPModel.from_pretrained(path).eval()
            self._torch = torch
        return self._model

    def _features(self, images) -> np.ndarray:
        model = self._load()
        feats = []
        for im in images:
            inputs = self._processor(images=im, return_tensors="pt")
            with self._torch.no_grad():
                f = model.get_image_features(**inputs)
            feats.append(f[0].numpy())
        return np.stack(feats)

    def calculate_score(self, batch: dict) -> float:
        f1 = self._features(batch["gt_im"])
        f2 = self._features(batch["gen_im"])
        mu1, s1 = f1.mean(0), np.cov(f1, rowvar=False)
        mu2, s2 = f2.mean(0), np.cov(f2, rowvar=False)
        return frechet_distance(mu1, s1, mu2, s2)


class CountTokenLength(BaseMetric):
    """Token-length stats of generated vs gt SVG (reference
    count_token_length.py:9-55). Uses our tokenizer abstraction instead of
    downloading the StarCoder2 tokenizer."""

    def __init__(self, config=None, tokenizer=None):
        super().__init__()
        self.config = config
        if tokenizer is None:
            from starvector_tpu.models.tokenizer import build_test_tokenizer

            tokenizer = build_test_tokenizer()
        self.tokenizer = tokenizer
        self.metric = self.count

    def count(self, **kwargs):
        gen = len(self.tokenizer.token_ids(kwargs["gen_svg"]))
        gt = len(self.tokenizer.token_ids(kwargs["gt_svg"]))
        return float(gen - gt)
