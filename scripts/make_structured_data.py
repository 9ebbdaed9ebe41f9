"""Generate the STRUCTURED synthetic dataset for conditioning campaigns.

A CelebA-shaped tree (JPEGs + standard attribute file) where each of the 7
selected attribute bits (sample.config.json attr = [8,15,20,22,26,36,39])
controls a VISIBLE image property, so generator/adjuster conditioning can be
measured mechanically (scripts/verify_conditioning.py's `stat` regions):

    bit 0: red tint (channel 0, global)
    bit 1: green stripe, rows [d/4, d/2)
    bit 2: blue bottom half
    bit 3: bright center square
    bit 4: bright band, rows [d/8, d/4)
    bit 5: bright corner block [0, d/4)^2
    bit 6: GLOBAL brightness — the structurally-hard one (the reference's
           axis=None InstanceNorm removes per-sample global statistics;
           ROADMAP #7 / Config.cond_bias)

Usage: python scripts/make_structured_data.py <out_dir> [n_images] [dim]
"""

from __future__ import annotations

import os

import numpy as np


def make_image(rng: np.random.Generator, bits: np.ndarray, dim: int) -> np.ndarray:
    """One [0,255] uint8 image whose visible properties encode ``bits``."""
    # smooth low-frequency background so the model has texture to learn
    low = rng.uniform(0.25, 0.55, (8, 8, 3)).astype(np.float32)
    reps = dim // 8
    x = np.kron(low, np.ones((reps, reps, 1), np.float32))
    d = dim
    if bits[0] > 0:
        x[:, :, 0] += 0.25
    if bits[1] > 0:
        x[d // 4 : d // 2, :, 1] += 0.3
    if bits[2] > 0:
        x[d // 2 :, :, 2] += 0.3
    if bits[3] > 0:
        x[d // 3 : 2 * d // 3, d // 3 : 2 * d // 3, :] += 0.25
    if bits[4] > 0:
        x[d // 8 : d // 4, :, :] += 0.3
    if bits[5] > 0:
        x[: d // 4, : d // 4, :] += 0.3
    if bits[6] > 0:
        x += 0.2
    x += rng.normal(0, 0.02, x.shape).astype(np.float32)
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def generate(out_dir: str, n: int = 6400, dim: int = 128, attr_indices=(8, 15, 20, 22, 26, 36, 39), seed: int = 0) -> None:
    from PIL import Image

    img_dir = os.path.join(out_dir, "img")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = [str(n), " ".join(f"A{i}" for i in range(40))]
    for i in range(n):
        bits = np.where(rng.random(7) < 0.5, -1, 1)
        name = f"{i:06d}.jpg"
        Image.fromarray(make_image(rng, bits, dim)).save(
            os.path.join(img_dir, name), quality=95
        )
        row = np.full(40, -1, np.int64)
        row[list(attr_indices)] = bits
        lines.append(name + " " + " ".join(str(v) for v in row))
    with open(os.path.join(out_dir, "attrs.txt"), "w") as f:
        f.write("\n".join(lines))
    print(f"structured dataset: {n} images ({dim}x{dim}) -> {out_dir}")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Generate the structured synthetic CelebA-shaped dataset.")
    p.add_argument("out", nargs="?", default="/tmp/structured_celeba", help="output directory")
    p.add_argument("n", nargs="?", type=int, default=6400, help="number of images")
    p.add_argument("dim", nargs="?", type=int, default=128, help="square image size")
    a = p.parse_args()
    generate(a.out, a.n, a.dim)
