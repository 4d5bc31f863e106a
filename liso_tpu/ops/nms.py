"""Rotated NMS on fixed-capacity box sets.

Reference: liso/utils/nms_iou.py:23-122 (perform_nms_on_shapes /
iou_based_nms over the iou3d_nms CUDA kernel with 64-bit suppression
bitmasks). Here: confidence sort -> one [K, K] rotated IoU matrix (ops.iou)
-> greedy suppression as a lax.fori_loop over rows -> top `post_max_boxes`
kept slots. Capacities match the reference config (1000 pre / 100 post,
liso_config.yml:27-28) but are arguments.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from liso_tpu.ops import iou as iou_ops
from liso_tpu.ops.boxes import Boxes


@partial(jax.jit, static_argnames=("post_max_boxes", "bev"))
def nms_boxes(
    boxes: Boxes,
    iou_threshold: float = 0.1,
    post_max_boxes: int = 100,
    bev: bool = True,
) -> Boxes:
    """Greedy rotated NMS on a single (unbatched) Boxes of capacity K.

    Returns Boxes with capacity `post_max_boxes`, sorted by confidence,
    invalid slots masked. vmap over a batch axis for batched use.
    """
    k = boxes.k
    conf = jnp.where(boxes.valid, boxes.probs[..., 0], -jnp.inf)
    order = jnp.argsort(-conf)
    b = boxes.take(order)
    conf = jnp.take_along_axis(conf, order, axis=-1)
    valid = b.valid & jnp.isfinite(conf)

    mat = (iou_ops.iou_matrix_bev if bev else iou_ops.iou_matrix_3d)(
        b.pos, b.dims, b.rot, b.pos, b.dims, b.rot, valid, valid
    )
    idx = jnp.arange(k)

    def body(i, suppressed):
        alive_i = (~suppressed[i]) & valid[i]
        kill = (mat[i] > iou_threshold) & (idx > i) & alive_i
        return suppressed | kill

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    keep = valid & ~suppressed
    # kept boxes are already confidence-sorted; compact them to the front
    rank = jnp.cumsum(keep) - 1
    slot = jnp.where(keep, rank, k)  # k = drop
    out_idx = jnp.full((post_max_boxes,), 0, jnp.int32)
    out_ok = jnp.zeros((post_max_boxes,), bool)
    # scatter: position slot -> source index
    src = jnp.arange(k, dtype=jnp.int32)
    in_cap = keep & (slot < post_max_boxes)
    tgt = jnp.where(in_cap, slot, post_max_boxes)
    out_idx = jnp.zeros((post_max_boxes + 1,), jnp.int32).at[tgt].set(src)[:post_max_boxes]
    out_ok = jnp.zeros((post_max_boxes + 1,), bool).at[tgt].set(True)[:post_max_boxes]
    return b.take(out_idx, valid=out_ok)


def batched_nms(boxes: Boxes, iou_threshold=0.1, post_max_boxes=100, bev=True):
    return jax.vmap(
        lambda bx: nms_boxes(bx, iou_threshold, post_max_boxes, bev=bev)
    )(boxes)
