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


# ---------------------------------------------------------------------------
# Range-image rendering (reference visu/bbox_image.py:19-152, consumed by
# slim/experiment.py:729-770 image summaries)
# ---------------------------------------------------------------------------
def range_project_points(
    pcl: np.ndarray,
    elevation_rad_max: float,
    elevation_rad_min: float,
    height: int,
    width: int,
):
    """[N, >=3] -> (row_idx, col_idx) int arrays on a spherical range
    image (elevation rows, azimuth columns)."""
    d_xy = np.linalg.norm(pcl[..., :2], axis=-1)
    elev = np.arctan2(pcl[..., 2], d_xy)
    elev_n = 1.0 - (
        np.clip(elev, elevation_rad_min, elevation_rad_max) - elevation_rad_min
    ) / (elevation_rad_max - elevation_rad_min)
    rows = np.clip(elev_n * height, 0, height - 1).astype(np.int32)
    azim = np.arctan2(pcl[..., 1], pcl[..., 0])
    cols = np.clip(
        (azim + np.pi) / (2 * np.pi) * width, 0, width - 1
    ).astype(np.int32)
    return rows, cols


def _rainbow(v: np.ndarray) -> np.ndarray:
    """Minimal gist_rainbow-style colormap (no matplotlib dependency)."""
    v = np.clip(v, 0.0, 1.0)
    h = (1.0 - v) * 0.8  # red -> violet
    i = (h * 6.0).astype(np.int32) % 6
    f = h * 6.0 - np.floor(h * 6.0)
    one = np.ones_like(f)
    lut = np.stack(
        [
            np.stack([one, f, 0 * f], -1),
            np.stack([1 - f, one, 0 * f], -1),
            np.stack([0 * f, one, f], -1),
            np.stack([0 * f, 1 - f, one], -1),
            np.stack([f, 0 * f, one], -1),
            np.stack([one, 0 * f, one], -1),
        ],
        axis=0,
    )
    return lut[i, np.arange(len(v))]


def render_pcl_range_image(
    pcls,
    elevation_rad_max: float = np.deg2rad(4.0),
    elevation_rad_min: float = np.deg2rad(-25.0),
    height: int = 128,
    width: int = 1024,
) -> np.ndarray:
    """List of [N, 3|4] clouds -> [B, H, W, 3] float images; color by
    intensity when available, else by normalized range."""
    out = np.zeros((len(pcls), height, width, 3), np.float32)
    for b, pcl in enumerate(pcls):
        pcl = np.asarray(pcl)
        if len(pcl) == 0:
            continue
        if pcl.shape[-1] >= 4:
            color = _rainbow(pcl[:, 3])
        else:
            rng_m = np.linalg.norm(pcl[:, :3], axis=-1)
            span = max(rng_m.max() - rng_m.min(), 1e-6)
            color = _rainbow((rng_m - rng_m.min()) / span)
        rows, cols = range_project_points(
            pcl, elevation_rad_max, elevation_rad_min, height, width
        )
        out[b, rows, cols] = color
    return out


def draw_boxes_on_range_image(
    img: np.ndarray,
    boxes: dict,
    elevation_rad_max: float = np.deg2rad(4.0),
    elevation_rad_min: float = np.deg2rad(-25.0),
    color=(1.0, 1.0, 1.0),
) -> np.ndarray:
    """Project each box's 8 corners into the range image and draw the
    wireframe (reference draw_boxes_on_2d_projection:96-152). boxes: flat
    dict with pos/dims/rot (+ optional valid)."""
    img = img.copy()
    h, w = img.shape[:2]
    valid = np.asarray(
        boxes.get("valid", np.ones(len(boxes["pos"]), bool))
    ).reshape(-1)
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]
    for i in np.flatnonzero(valid):
        c = boxes["pos"][i]
        d = boxes["dims"][i]
        yaw = float(np.reshape(boxes["rot"][i], (-1,))[0])
        sx, sy, sz = d / 2.0
        corners = np.array(
            [
                [sx, sy, -sz], [sx, -sy, -sz], [-sx, -sy, -sz], [-sx, sy, -sz],
                [sx, sy, sz], [sx, -sy, sz], [-sx, -sy, sz], [-sx, sy, sz],
            ]
        )
        ca, sa = np.cos(yaw), np.sin(yaw)
        R = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]])
        pts = corners @ R.T + c
        rows, cols = range_project_points(
            pts, elevation_rad_max, elevation_rad_min, h, w
        )
        for a, b_ in edges:
            n = 32
            rr = np.linspace(rows[a], rows[b_], n).astype(np.int32)
            cc = np.linspace(cols[a], cols[b_], n).astype(np.int32)
            if np.abs(cols[a] - cols[b_]) > w // 2:
                continue  # edge wraps around the azimuth seam
            img[np.clip(rr, 0, h - 1), np.clip(cc, 0, w - 1)] = color
    return img
