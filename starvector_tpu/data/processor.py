"""Image preprocessing: pad-to-square (white) → bicubic resize → CLIP-stat
normalization, channels-last for TPU.

Parity targets:
  * ImageTrainProcessor (reference: starvector/data/util.py:40-68) — RGBA →
    RGB over white, center pad-to-square with white, bicubic resize to
    `size`, normalize with CLIP stats
  * SimpleStarVectorProcessor image path (reference:
    starvector/model/starvector_arch.py:16-93) — same, but RGBA handled via
    plain convert("RGB")

Two implementations:
  * `ImageProcessor` — host-side, PIL bicubic (bit-parity with torchvision's
    Resize on PIL input); returns channels-last float32 numpy
  * `batch_preprocess_jax` — device-side batched pad/resize/normalize using
    jax.image.resize (cubic), for the serving fast path where throughput
    beats bit-parity (BASELINE north star: preprocessing on-device)
"""

from __future__ import annotations

import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


class ImageProcessor:
    """Host-side reference-parity processor. __call__ takes a PIL image and
    returns (size, size, 3) float32 channels-last."""

    def __init__(self, size: int = 224, mean=None, std=None,
                 rgba_mode: str = "white"):
        self.size = size
        self.mean = np.asarray(mean if mean is not None else CLIP_MEAN, np.float32)
        self.std = np.asarray(std if std is not None else CLIP_STD, np.float32)
        if rgba_mode not in ("white", "convert"):
            raise ValueError(rgba_mode)
        self.rgba_mode = rgba_mode

    def __call__(self, img) -> np.ndarray:
        from PIL import Image

        if img.mode == "RGBA":
            if self.rgba_mode == "white":
                bg = Image.new("RGB", img.size, (255, 255, 255))
                bg.paste(img, mask=img.split()[3])
                img = bg
            else:
                img = img.convert("RGB")
        elif img.mode != "RGB":
            img = img.convert("RGB")
        img = self._pad_to_square(img)
        img = img.resize((self.size, self.size), Image.BICUBIC)
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - self.mean) / self.std

    def _pad_to_square(self, img):
        from PIL import Image

        width, height = img.size
        max_dim = max(width, height)
        if width == height:
            return img
        left = (max_dim - width) // 2
        top = (max_dim - height) // 2
        bg = Image.new("RGB", (max_dim, max_dim), (255, 255, 255))
        bg.paste(img, (left, top))
        return bg

    def batch(self, images) -> np.ndarray:
        return np.stack([self(im) for im in images])


def processor_for_encoder(image_encoder_type: str, image_size: int | None = None):
    """Per-backend processor (reference image_encoder.py:17-47: CLIP stats
    for the clip tower; SigLIP towers use the HF siglip processor stats)."""
    if image_encoder_type == "clip":
        return ImageProcessor(size=image_size or 224)
    if image_encoder_type.startswith("siglip"):
        size = image_size or {"siglip_512": 512, "siglip_384": 384,
                              "siglip_256": 256}[image_encoder_type]
        return ImageProcessor(size=size, mean=SIGLIP_MEAN, std=SIGLIP_STD)
    return ImageProcessor(size=image_size or 224)


def batch_preprocess_jax(images, size: int, mean=CLIP_MEAN, std=CLIP_STD):
    """Device-side batched preprocessing: (B, H, W, 3) uint8/float in [0,255]
    → padded square → cubic resize → normalized (B, size, size, 3) float.
    All ops XLA-fusable; runs on TPU alongside the model."""
    import jax.numpy as jnp
    import jax

    x = jnp.asarray(images)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32)
    B, H, W, C = x.shape
    m = max(H, W)
    top = (m - H) // 2
    left = (m - W) // 2
    x = jnp.pad(
        x,
        ((0, 0), (top, m - H - top), (left, m - W - left), (0, 0)),
        constant_values=255.0,
    )
    x = jax.image.resize(x, (B, size, size, C), method="cubic")
    x = jnp.clip(x, 0.0, 255.0) / 255.0
    return (x - jnp.asarray(mean)) / jnp.asarray(std)
