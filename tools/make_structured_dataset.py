#!/usr/bin/env python3
"""Pose-consistent synthetic dataset: textured spheres raycast from a ring of
cameras (VERDICT round-2 #5).

The long-run evidence so far trained on unstructured noise, which can never
show the 3D-consistency loss producing 3D structure. This renders a dataset
with REAL multi-view statistics — a lambertian checker-textured sphere seen
from random yaw/pitch in the same ranges as the camera prior
(``configs``-style x_rotate/y_rotate), so a trained RGBD generator should
learn depth that tracks the silhouette and the camera sweep.

Raycasting (numpy, vectorised): camera at distance ``cam_dist`` looking at
the origin, pinhole rays, analytic ray-sphere intersection, lat-long checker
texture in two per-image random colours, single directional light. Writes
the ``images.npy`` cache format ``data/dataset.py`` loads ((N, 3, S, S)
uint8), matching the reference cache convention (``train_rgbd.py:56-67``).

Usage:
    python tools/make_structured_dataset.py --out /tmp/spheres --n 2000 --size 32
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def render_sphere(
    size: int,
    yaw: float,
    pitch: float,
    color_a,
    color_b,
    radius: float = 0.45,
    cam_dist: float = 1.3,
    fov: float = 0.9,
    checker: int = 6,
):
    """One (size, size, 3) float image in [0, 1] + its depth map.

    The camera orbits the origin (yaw around y, pitch around x) at
    ``cam_dist`` — the same orbit parameterisation the camera prior uses for
    its pose pairs (geometry/prior.py) — so dataset pose statistics match
    what the generator's prior will sample at train time.
    """
    # pixel grid -> camera rays (pinhole, looking down -z in camera frame)
    uv = (np.arange(size) + 0.5) / size * 2.0 - 1.0
    u, v = np.meshgrid(uv, uv)  # u: +x right, v: row index downward
    v = -v  # y up
    t = np.tan(fov / 2)
    dirs = np.stack([u * t, v * t, -np.ones_like(u)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    # camera-to-world: orbit position from (yaw, pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    rot_y = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rot_x = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    c2w = rot_y @ rot_x
    origin = c2w @ np.array([0.0, 0.0, cam_dist])
    dirs_w = dirs @ c2w.T

    # ray-sphere intersection at the origin: |o + t d|^2 = r^2
    b = 2.0 * dirs_w @ origin
    c = float(origin @ origin) - radius * radius
    disc = b * b - 4 * c
    hit = disc > 0
    t_hit = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0, cam_dist)

    p = origin + t_hit[..., None] * dirs_w  # hit points (miss rows masked below)
    n = p / radius  # unit normals
    # lat-long checker texture
    lat = np.arccos(np.clip(n[..., 1], -1, 1))
    lon = np.arctan2(n[..., 2], n[..., 0])
    cells = (np.floor(lat / np.pi * checker) + np.floor((lon + np.pi) / (2 * np.pi) * checker))
    tex = (cells % 2)[..., None]
    albedo = np.where(tex > 0, color_a, color_b)

    light = np.array([0.4, 0.7, 0.6])
    light = light / np.linalg.norm(light)
    shade = np.clip(n @ light, 0.0, 1.0) * 0.75 + 0.25
    img = albedo * shade[..., None]
    img = np.where(hit[..., None], img, 0.04)  # near-black background

    depth = np.where(hit, t_hit, cam_dist + radius * 2.0)
    return img.astype(np.float32), depth.astype(np.float32)


def make_dataset(n: int, size: int, seed: int = 0,
                 y_rotate: float = 3.1415, x_rotate: float = 0.3054):
    """(N, 3, size, size) uint8 — the images.npy cache layout."""
    rng = np.random.RandomState(seed)
    out = np.empty((n, 3, size, size), dtype=np.uint8)
    for i in range(n):
        yaw = rng.uniform(-y_rotate / 2, y_rotate / 2)
        pitch = rng.uniform(-x_rotate / 2, x_rotate / 2)
        color_a = rng.uniform(0.45, 1.0, size=3)
        color_b = rng.uniform(0.05, 0.55, size=3)
        img, _ = render_sphere(size, yaw, pitch, color_a, color_b,
                               radius=rng.uniform(0.38, 0.5))
        out[i] = (img.transpose(2, 0, 1) * 255).astype(np.uint8)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="dataset dir (gets images.npy)")
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--y_rotate", type=float, default=3.1415)
    ap.add_argument("--x_rotate", type=float, default=0.3054)
    args = ap.parse_args()

    data = make_dataset(args.n, args.size, args.seed, args.y_rotate, args.x_rotate)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "images.npy")
    np.save(path, data)
    print(f"wrote {path}: {data.shape} uint8, mean {data.mean():.1f}")


if __name__ == "__main__":
    main()
