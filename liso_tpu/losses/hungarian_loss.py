"""Hungarian set loss for query detectors (jit-able).

Behavioral reference: liso/losses/hungarian_matching_loss.py:9-86 +
liso/kabsch/box_groundtruth_matching.py:10-80 (batched_match_bboxes =
scipy linear_sum_assignment over the padded distance matrix, 2 m threshold).
The optimal assignment runs through jax.pure_callback into scipy with fixed
shapes (cost matrices are tiny: K_queries x K_gt), everything else — focal
loss on matched-vs-unmatched queries, L1 on matched attributes — stays on
device.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from liso_tpu.losses.centerpoint_loss import focal_heatmap_loss
from liso_tpu.ops.boxes import Boxes

MAX_DIST = 1e5
DIST_MATCHING_THRESHOLD = 2.0


def _assign_host(cost: np.ndarray) -> np.ndarray:
    """[B, G, P] padded cost -> [B, G] matched pred idx (-1 unmatched)."""
    from scipy.optimize import linear_sum_assignment

    b, g, p = cost.shape
    out = -np.ones((b, g), np.int32)
    size = max(g, p)
    for i in range(b):
        padded = np.full((size, size), MAX_DIST, cost.dtype)
        padded[:g, :p] = cost[i]
        rows, cols = linear_sum_assignment(padded)
        for r, c in zip(rows, cols):
            if r < g and c < p and cost[i, r, c] < DIST_MATCHING_THRESHOLD:
                out[i, r] = c
    return out


def hungarian_matching_loss(
    gt: Boxes, pred: Boxes, train_attrs=("pos", "dims", "rot", "probs")
) -> Dict[str, jnp.ndarray]:
    """gt [B, G], pred [B, P] fixed-capacity Boxes (pred.probs are logits).
    Returns per-attribute losses."""
    b, g = gt.valid.shape
    p = pred.valid.shape[-1]
    dist = jnp.linalg.norm(
        gt.pos[:, :, None, :2] - pred.pos[:, None, :, :2], axis=-1
    )
    dist = jnp.where(gt.valid[:, :, None], dist, MAX_DIST)
    dist = jnp.where(pred.valid[:, None, :], dist, MAX_DIST)

    match = jax.pure_callback(
        _assign_host,
        jax.ShapeDtypeStruct((b, g), jnp.int32),
        jax.lax.stop_gradient(dist),  # assignment is discrete
        vmap_method="sequential",
    )
    matched = (match >= 0) & gt.valid  # [B, G]
    safe = jnp.maximum(match, 0)

    losses: Dict[str, jnp.ndarray] = {}
    if "probs" in train_attrs:
        is_matched_pred = jnp.zeros((b, p), bool)
        is_matched_pred = jax.vmap(
            lambda m, s, mk: m.at[s].set(mk)
        )(is_matched_pred, safe, matched)
        target = is_matched_pred.astype(jnp.float32)[..., None]
        losses["probs"] = focal_heatmap_loss(
            pred.probs,
            target,
            is_matched_pred,
            ignore_mask=~pred.valid,
        )
    n_match = jnp.maximum(matched.sum(), 1)
    for attr in ("pos", "dims", "rot"):
        if attr not in train_attrs:
            continue
        pv = jnp.take_along_axis(
            getattr(pred, attr), safe[..., None], axis=1
        )
        gv = getattr(gt, attr)
        err = jnp.abs(pv - gv).mean(-1)
        losses[attr] = jnp.where(matched, err, 0.0).sum() / n_match
    return losses
