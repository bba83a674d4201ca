#!/usr/bin/env python3
"""Generates the bundled example images procedurally.

The reference ships photos (examples/golden_gate.jpg, starry_night.jpg);
this repo generates deterministic synthetic stand-ins with comparable
statistics — a structured "content" scene and a swirly high-texture "style"
image — so no third-party image assets are vendored.
"""

from pathlib import Path

import numpy as np
from PIL import Image

HERE = Path(__file__).parent


def content_image(h=600, w=800):
    """A geometric landscape: sky gradient, sun, hills, a bridge-like truss."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u, v = xx / w, yy / h
    img = np.zeros((h, w, 3), np.float32)
    # sky gradient
    img[..., 0] = 90 + 110 * (1 - v)
    img[..., 1] = 120 + 90 * (1 - v)
    img[..., 2] = 170 + 70 * (1 - v)
    # sun disc
    sun = ((u - 0.75) ** 2 + (v - 0.22) ** 2) < 0.006
    img[sun] = [250, 230, 180]
    # rolling hills
    horizon = 0.55 + 0.08 * np.sin(u * 9) + 0.04 * np.sin(u * 23 + 1.0)
    hills = v > horizon
    shade = 0.7 + 0.3 * np.sin(u * 40)
    img[hills] = 0
    img[..., 0] += hills * (60 + 40 * shade)
    img[..., 1] += hills * (110 + 50 * shade)
    img[..., 2] += hills * (50 + 30 * shade)
    # bridge truss: vertical pylons + deck + cables
    deck = (v > 0.48) & (v < 0.50)
    img[deck] = [180, 60, 50]
    for px in (0.30, 0.62):
        pylon = (np.abs(u - px) < 0.012) & (v > 0.18) & (v < 0.50)
        img[pylon] = [160, 50, 45]
        cable = np.abs((v - 0.48) - 1.4 * (u - px) ** 2 * 4) < 0.006
        img[cable & (v < 0.49) & (np.abs(u - px) < 0.25)] = [150, 45, 40]
    return np.clip(img, 0, 255).astype(np.uint8)


def style_image(h=600, w=750):
    """Swirling strokes over a night gradient — dense multiscale texture."""
    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u, v = xx / w, yy / h
    base = np.zeros((h, w, 3), np.float32)
    base[..., 0] = 20 + 40 * v
    base[..., 1] = 30 + 50 * v
    base[..., 2] = 80 + 90 * (1 - v)
    # swirls: layered rotated sinusoids
    swirl = np.zeros((h, w), np.float32)
    for k in range(6):
        ang = rng.uniform(0, np.pi)
        freq = rng.uniform(8, 42)
        phase = rng.uniform(0, 2 * np.pi)
        cu, cv = np.cos(ang), np.sin(ang)
        swirl += np.sin(freq * (u * cu + v * cv) +
                        4 * np.sin(3 * (u * cv - v * cu)) + phase) / (k + 1)
    base[..., 0] += 60 * swirl
    base[..., 1] += 70 * swirl
    base[..., 2] += 40 * swirl
    # star blobs
    for _ in range(14):
        cx, cy = rng.uniform(0.05, 0.95), rng.uniform(0.05, 0.6)
        r = rng.uniform(0.01, 0.04)
        d2 = (u - cx) ** 2 + (v - cy) ** 2
        glow = np.exp(-d2 / (2 * r * r))
        base[..., 0] += 160 * glow
        base[..., 1] += 150 * glow
        base[..., 2] += 60 * glow
    return np.clip(base, 0, 255).astype(np.uint8)


def main():
    Image.fromarray(content_image()).save(HERE / 'golden_gate.jpg', quality=90)
    Image.fromarray(style_image()).save(HERE / 'starry_night.jpg', quality=90)
    print('wrote', HERE / 'golden_gate.jpg', 'and', HERE / 'starry_night.jpg')


if __name__ == '__main__':
    main()
