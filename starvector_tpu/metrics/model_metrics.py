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
    """Perceptual distance with the REAL LPIPS-VGG net (metrics/lpips_vgg.py,
    reference compute_LPIPS.py:9-55) when its weights are available:
    `STARVECTOR_METRICS_DIR/lpips-vgg/{vgg16.pth, lpips_vgg.pth}` (torch
    state dicts: torchvision VGG16 features + lpips 'vgg' linear layers).
    Without them, falls back to an LPIPS-style normalized feature distance
    over a local CLIP ViT — monotonic stand-in, NOT comparable to paper
    LPIPS numbers (documented deviation)."""

    def __init__(self, config=None, model_path: str | None = None):
        super().__init__()
        self.config = config
        self.model_path = model_path
        self._model = None
        self._vgg_params = None
        self.metric = self.lpips

    # -- real LPIPS-VGG path --------------------------------------------------
    def _load_vgg(self):
        if self._vgg_params is not None:
            return self._vgg_params
        base = self.model_path or (
            os.path.join(_models_dir(), "lpips-vgg") if _models_dir() else None
        )
        if base and os.path.isdir(base):
            import torch

            from starvector_tpu.metrics import lpips_vgg

            vgg_sd = torch.load(
                os.path.join(base, "vgg16.pth"), map_location="cpu",
                weights_only=True,
            )
            lin_sd = torch.load(
                os.path.join(base, "lpips_vgg.pth"), map_location="cpu",
                weights_only=True,
            )
            self._vgg_params = lpips_vgg.from_torch_state_dicts(vgg_sd, lin_sd)
            return self._vgg_params
        return None

    def _load(self):
        if self._model is None:
            import torch
            from transformers import CLIPModel, CLIPProcessor

            path = _resolve(None, "clip-vit-base-patch32")
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
        vgg = self._load_vgg()
        if vgg is not None:
            from starvector_tpu.metrics import lpips_vgg

            x = lpips_vgg.preprocess([kwargs["gt_im"]])
            y = lpips_vgg.preprocess([kwargs["gen_im"]])
            return float(lpips_vgg.lpips_distance(vgg, x, y)[0])
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
    """FID over InceptionV3 pool3 features (the REAL FID network,
    metrics/inception_v3.py — reference inception.py:16-340) when
    `model_name='InceptionV3'` and a state dict exists at
    `STARVECTOR_METRICS_DIR/inception/inception_v3.pth` (pytorch-fid or
    torchvision naming). `model_name='ViT-B/32'` computes FID-CLIP over a
    local CLIP checkpoint (the reference's clip mode, compute_fid.py)."""

    def __init__(self, model_name: str = "ViT-B/32", model_path: str | None = None):
        self.model_name = model_name
        self.model_path = model_path
        self._model = None
        self._inception = None
        self.class_name = self.__class__.__name__

    def reset(self):
        pass

    def _load_inception(self):
        if self._inception is None:
            import torch

            from starvector_tpu.metrics import inception_v3

            path = self.model_path or _resolve(None, "inception")
            f = path if path.endswith(".pth") else os.path.join(
                path, "inception_v3.pth"
            )
            sd = torch.load(f, map_location="cpu", weights_only=True)
            self._inception = inception_v3.from_torch_state_dict(sd)
        return self._inception

    def _load(self):
        if self._model is None:
            import torch
            from transformers import CLIPModel, CLIPProcessor

            path = _resolve(
                self.model_path if self.model_name != "InceptionV3" else None,
                "clip-vit-base-patch32",
            )
            self._processor = CLIPProcessor.from_pretrained(path)
            self._model = CLIPModel.from_pretrained(path).eval()
            self._torch = torch
        return self._model

    def _features(self, images) -> np.ndarray:
        if self.model_name == "InceptionV3":
            from starvector_tpu.metrics import inception_v3

            params = self._load_inception()
            out = []
            for i in range(0, len(images), 16):
                x = inception_v3.preprocess(images[i:i + 16])
                out.append(np.asarray(inception_v3.features(params, x)))
            return np.concatenate(out)
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
