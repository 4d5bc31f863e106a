"""BEV renderings: point-cloud occupancy + rotated box wireframes + GIFs.

Behavioral reference: liso/visu/{bbox_image.py, pcl_image.py} and the
animated-GIF track summaries of liso/tracker/tracking.py:365-500. Pure
numpy rasterisation (Bresenham lines), PIL for GIF encoding.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def pcl_occupancy_image(
    pcl_xy: np.ndarray, bev_range_m, grid_hw, background=0.0
) -> np.ndarray:
    """[N, 2] points -> float [H, W] occupancy."""
    h, w = grid_hw
    res = np.array([bev_range_m[0] / h, bev_range_m[1] / w])
    rc = np.floor(
        (pcl_xy + 0.5 * np.asarray(bev_range_m)) / res
    ).astype(int)
    ok = (rc[:, 0] >= 0) & (rc[:, 0] < h) & (rc[:, 1] >= 0) & (rc[:, 1] < w)
    img = np.full((h, w), background, np.float32)
    img[rc[ok, 0], rc[ok, 1]] = 1.0
    return img


def _draw_line(img: np.ndarray, p0, p1, color):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) + 1
    rr = np.linspace(p0[0], p1[0], n).round().astype(int)
    cc = np.linspace(p0[1], p1[1], n).round().astype(int)
    h, w = img.shape[:2]
    ok = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
    img[rr[ok], cc[ok]] = color


def draw_boxes_bev(
    img_rgb: np.ndarray,  # [H, W, 3] float 0..1 (modified in place)
    boxes: Dict[str, np.ndarray],  # pos/dims/rot arrays (valid-only)
    bev_range_m,
    color=(0.0, 1.0, 0.0),
) -> np.ndarray:
    h, w = img_rgb.shape[:2]
    res = np.array([bev_range_m[0] / h, bev_range_m[1] / w])
    for k in range(len(boxes["pos"])):
        cx, cy = boxes["pos"][k, :2]
        lx, wy = boxes["dims"][k, :2] * 0.5
        yaw = boxes["rot"][k, 0]
        c, s = np.cos(yaw), np.sin(yaw)
        corners = np.array(
            [[lx, wy], [-lx, wy], [-lx, -wy], [lx, -wy]]
        ) @ np.array([[c, s], [-s, c]]) + np.array([cx, cy])
        rc = (corners + 0.5 * np.asarray(bev_range_m)) / res
        for i in range(4):
            _draw_line(img_rgb, rc[i], rc[(i + 1) % 4], color)
        # heading tick from center to front edge midpoint
        front = 0.5 * (rc[0] + rc[3])
        center = (np.array([cx, cy]) + 0.5 * np.asarray(bev_range_m)) / res
        _draw_line(img_rgb, center, front, color)
    return img_rgb


def render_frame(
    pcl_xy: np.ndarray,
    boxes: Optional[Dict[str, np.ndarray]],
    bev_range_m,
    grid_hw=(512, 512),
    box_color=(0.0, 1.0, 0.0),
) -> np.ndarray:
    occ = pcl_occupancy_image(pcl_xy, bev_range_m, grid_hw)
    img = np.stack([occ * 0.6] * 3, -1)
    if boxes is not None and len(boxes["pos"]):
        draw_boxes_bev(img, boxes, bev_range_m, box_color)
    return img


def save_tracking_gif(
    frames: List[np.ndarray],  # list of [H, W, 3] float 0..1
    path,
    fps: int = 5,
) -> Path:
    """Animated GIF of a tracked sequence (tracking.py:417-473 writes these
    into TB as protobuf image summaries; a GIF on disk is the portable
    equivalent and can also be logged)."""
    from PIL import Image

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    imgs = [
        Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8))
        for f in frames
    ]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )
    return path
