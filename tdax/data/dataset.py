"""Synthetic 6x6 color x shape dataset.

Behavioral contract: reference ``generate_dataset.py`` — 48 samples
(36 "bound" color x shape, 6 "color_only" colored cubes, 6 "shape_only"
grey shapes), each a 200x200 PNG of a 2-D primitive on a grey
background, plus a ``metadata.json`` with
``{id, image_path, prompt, type, color, shape}`` per sample
(generate_dataset.py:48-103).

Rendering stays host-side PIL (commodity work, SURVEY §2.2); everything
downstream of the PNGs is TPU-native.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

from PIL import Image, ImageDraw

from tdax.config import COLORS, NON_GREY_COLORS, SHAPES, DatasetConfig


def create_image(img_path: str, color_name: str, shape_name: str, size: int = 200) -> None:
    """Render one colored-shape PNG.

    Geometry matches reference generate_dataset.py:23-46: cube=rectangle,
    sphere=ellipse, pyramid/cone=triangles of differing base width,
    torus=thick ellipse outline, cylinder=rectangle+top ellipse.
    """
    img = Image.new("RGB", (size, size), color="grey")
    draw = ImageDraw.Draw(img)
    rgb = COLORS[color_name]
    s = size / 200.0  # scale factor relative to the reference 200px canvas

    def pt(x: float, y: float) -> tuple[float, float]:
        return (x * s, y * s)

    if shape_name == "cube":
        draw.rectangle([pt(50, 50), pt(150, 150)], fill=rgb, outline="black")
    elif shape_name == "sphere":
        draw.ellipse([pt(50, 50), pt(150, 150)], fill=rgb, outline="black")
    elif shape_name == "pyramid":
        draw.polygon([pt(100, 50), pt(50, 150), pt(150, 150)], fill=rgb, outline="black")
    elif shape_name == "cone":
        draw.polygon([pt(100, 50), pt(40, 150), pt(160, 150)], fill=rgb, outline="black")
    elif shape_name == "torus":
        draw.ellipse([pt(50, 50), pt(150, 150)], fill=None, outline=rgb, width=max(1, round(20 * s)))
    elif shape_name == "cylinder":
        draw.rectangle([pt(60, 50), pt(140, 150)], fill=rgb, outline="black")
        draw.ellipse([pt(60, 40), pt(140, 60)], fill=rgb, outline="black")
    else:
        raise ValueError(f"unknown shape: {shape_name!r}")

    img.save(img_path)


def _bound_entries(cfg: DatasetConfig) -> Iterable[dict]:
    for color in NON_GREY_COLORS:
        for shape in SHAPES:
            img_id = f"{color}_{shape}"
            yield {
                "id": img_id,
                "image_path": os.path.join(cfg.image_dir, f"{img_id}.png"),
                "prompt": f"a photo of a {color} {shape}",
                "type": "bound",
                "color": color,
                "shape": shape,
            }


def _color_only_entries(cfg: DatasetConfig) -> Iterable[dict]:
    for color in NON_GREY_COLORS:
        img_id = f"{color}_object"
        yield {
            "id": img_id,
            "image_path": os.path.join(cfg.image_dir, f"{img_id}.png"),
            "prompt": f"a photo of a {color} object",
            "type": "color_only",
            "color": color,
            "shape": "unknown",
        }


def _shape_only_entries(cfg: DatasetConfig) -> Iterable[dict]:
    for shape in SHAPES:
        img_id = f"grey_{shape}"
        yield {
            "id": img_id,
            "image_path": os.path.join(cfg.image_dir, f"{img_id}.png"),
            "prompt": f"a photo of a grey {shape}",
            "type": "shape_only",
            "color": "grey",
            "shape": shape,
        }


def generate_dataset(cfg: DatasetConfig | None = None, render: bool = True) -> list[dict]:
    """Generate images + metadata.json; returns the metadata list.

    Sample order and schema are identical to reference
    generate_dataset.py:48-103 (36 bound, then 6 color_only rendered as
    cubes, then 6 shape_only rendered grey).
    """
    cfg = cfg or DatasetConfig()
    os.makedirs(cfg.image_dir, exist_ok=True)

    metadata: list[dict] = []
    for entry in _bound_entries(cfg):
        if render:
            create_image(entry["image_path"], entry["color"], entry["shape"], cfg.image_size)
        metadata.append(entry)
    for entry in _color_only_entries(cfg):
        if render:
            create_image(entry["image_path"], entry["color"], "cube", cfg.image_size)
        metadata.append(entry)
    for entry in _shape_only_entries(cfg):
        if render:
            create_image(entry["image_path"], "grey", entry["shape"], cfg.image_size)
        metadata.append(entry)

    with open(cfg.metadata_path, "w") as f:
        json.dump(metadata, f, indent=2)
    return metadata
