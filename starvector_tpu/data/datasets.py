"""The six dataset families (reference: starvector/data/{dataset,stacksvg,
emojisvg,figrsvg,fontsvg,iconsvg}.py). Column conventions follow the
published SVG-Bench datasets: `Svg` + `Filename` (or `Id` for FigrSVG),
optional `Caption`, SVG-Stack adds `caption_blip2`/`caption_llava`."""

from __future__ import annotations

import random

from starvector_tpu.data.augmentation import SVGTransforms
from starvector_tpu.data.base import SVGDatasetBase

text2svg_captions = [
    "Draw an SVG of ",
    "Draw an SVG image of ",
    "Draw an SVG picture of ",
    "Generate an SVG of ",
    "Create an SVG of ",
    "Design an SVG of ",
    "Make an SVG of ",
]


class SVGDataset(SVGDatasetBase):
    """Generic dataset with palette color-change and model_name filter
    (reference dataset.py:7-42)."""

    def __init__(self, dataset_name, split, im_size, num_samples=-1, **kwargs):
        super().__init__(dataset_name, split, im_size, num_samples, **kwargs)
        self.color_changer = SVGTransforms(
            {"color_change": True,
             "colors": ["#ff0000", "#0000ff", "#00ff00", "#ffff00", "#000000"]}
        )
        select_dataset_name = kwargs.get("select_dataset_name", False)
        if select_dataset_name:
            self.data = self.data.filter(
                lambda ex: ex.get("model_name") == select_dataset_name
            )
        if num_samples not in (-1, None):
            self.data = self.data.select(range(num_samples))

    def __getitem__(self, idx):
        row = self.data[idx]
        svg, image = self.get_svg_and_image(row["Svg"], row["Filename"])
        return {"svg": svg, "image": image, "id": row["Filename"],
                "caption": row.get("Caption", "")}


class SVGStackDataset(SVGDatasetBase):
    """SVG-Stack with randomized caption templates (reference stacksvg.py)."""

    def __init__(self, dataset_name, split, im_size, num_samples=-1, **kwargs):
        super().__init__(dataset_name, split, im_size, num_samples, **kwargs)
        self.color_changer = SVGTransforms(
            {"color_change": True,
             "colors": ["#ff0000", "#0000ff", "#00ff00", "#ffff00", "#000000"]}
        )
        self.random_caption = kwargs.get("random_caption", True)
        select_dataset_name = kwargs.get("select_dataset_name", False)
        if select_dataset_name:
            self.data = self.data.filter(
                lambda ex: ex.get("model_name") == select_dataset_name
            )
        if num_samples not in (-1, None):
            self.data = self.data.select(range(num_samples))

    def __getitem__(self, idx):
        row = self.data[idx]
        svg, image = self.get_svg_and_image(row["Svg"], row["Filename"])
        caption_column = random.choice(["caption_blip2", "caption_llava"])
        caption = random.choice(text2svg_captions) + (row.get(caption_column) or "")
        return {"svg": svg, "image": image, "id": row["Filename"],
                "caption": caption}


class _SimpleSVGDataset(SVGDatasetBase):
    id_column = "Filename"

    def __init__(self, dataset_name, split, im_size, num_samples=-1, **kwargs):
        super().__init__(dataset_name, split, im_size, **kwargs)
        if num_samples not in (-1, None):
            self.data = self.data.select(range(num_samples))

    def __getitem__(self, idx):
        row = self.data[idx]
        svg, image = self.get_svg_and_image(row["Svg"], row[self.id_column])
        return {"svg": svg, "image": image, "id": row[self.id_column],
                "caption": row.get("Caption", "")}


class EmojiSVGDataset(_SimpleSVGDataset):
    """reference emojisvg.py:5-27"""


class FigrSVGDataset(_SimpleSVGDataset):
    """reference figrsvg.py:6-27 (Id column)"""

    id_column = "Id"


class FontSVGDataset(_SimpleSVGDataset):
    """reference fontsvg.py:6-28"""


class SVGIconsDataset(_SimpleSVGDataset):
    """reference iconsvg.py:6-38"""
