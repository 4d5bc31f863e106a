"""Fixed-capacity 3D box container (reference: liso/kabsch/shape_utils.py:19-645).

The reference `Shape` is a torch/numpy dual-backend object with dynamic box
counts; here boxes are a registered JAX pytree with a static capacity `K` and
a `valid` mask, so every op on boxes is jit/vmap/shard_map friendly. Invalid
slots carry zeros (not NaN as in the reference padding) so arithmetic never
poisons gradients; consumers must mask by `valid`.

Conventions (identical to the reference):
  * pos  [..., K, 3]  box center (z = geometric center, NOT bottom)
  * dims [..., K, 3]  (length_x, width_y, height_z) in box frame
  * rot  [..., K, 1]  yaw about +z
  * probs[..., K, 1]  confidence
  * velo [..., K, 1]  scalar speed along box x-axis (reference uses [...,1])
  * valid[..., K]     bool slot mask
  * class_id [..., K, 1] int32 (UNKNOWN_CLASS_ID when not set)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from liso_tpu.ops import transforms as tr

UNKNOWN_CLASS_ID = jnp.iinfo(jnp.int32).max
INVALID_CLASS_ID = UNKNOWN_CLASS_ID - 1


@struct.dataclass
class Boxes:
    pos: jnp.ndarray
    dims: jnp.ndarray
    rot: jnp.ndarray
    probs: jnp.ndarray
    valid: jnp.ndarray
    velo: Optional[jnp.ndarray] = None
    class_id: Optional[jnp.ndarray] = None
    difficulty: Optional[jnp.ndarray] = None

    # ------------------------------------------------------------------
    @staticmethod
    def empty(k: int, batch: tuple = (), dtype=jnp.float32) -> "Boxes":
        z = lambda c: jnp.zeros(batch + (k, c), dtype)
        return Boxes(
            pos=z(3),
            dims=z(3),
            rot=z(1),
            probs=z(1),
            velo=z(1),
            valid=jnp.zeros(batch + (k,), bool),
            class_id=jnp.full(batch + (k, 1), UNKNOWN_CLASS_ID, jnp.int32),
            difficulty=jnp.zeros(batch + (k, 1), jnp.int32),
        )

    def with_defaults(self) -> "Boxes":
        """Fill optional fields so the pytree structure is uniform."""
        velo = self.velo if self.velo is not None else jnp.zeros_like(self.probs)
        class_id = (
            self.class_id
            if self.class_id is not None
            else jnp.full(self.probs.shape, UNKNOWN_CLASS_ID, jnp.int32)
        )
        difficulty = (
            self.difficulty
            if self.difficulty is not None
            else jnp.zeros(self.probs.shape, jnp.int32)
        )
        return self.replace(velo=velo, class_id=class_id, difficulty=difficulty)

    @property
    def k(self) -> int:
        return self.valid.shape[-1]

    @property
    def batch_shape(self):
        return self.valid.shape[:-1]

    # ------------------------------------------------------------------
    def poses(self) -> jnp.ndarray:
        """[..., K, 4, 4] sensor_T_box (reference Shape.get_poses:271)."""
        return tr.compose_matrix(t=self.pos, theta_z=self.rot[..., 0])

    def transform(self, new_T_old: jnp.ndarray) -> "Boxes":
        """Move boxes to a new frame; new_T_old is [..., 4, 4] (broadcast over
        K). Reference Shape.transform:472."""
        poses = new_T_old[..., None, :, :] @ self.poses()
        pos, yaw = tr.decompose_matrix(poses)
        return self.replace(pos=pos, rot=yaw[..., None])

    def points_in_box_mask(
        self,
        pcl: jnp.ndarray,
        bloat: float = 1.0,
        return_box_coords: bool = False,
    ):
        """[..., N, 3] points -> [..., N, K] bool membership
        (reference get_points_in_box_bool_mask:488). Invalid boxes give False.
        """
        box_T_sensor = tr.invert_pose(self.poses())  # [..., K, 4, 4]
        R = box_T_sensor[..., :3, :3]
        t = box_T_sensor[..., :3, 3]
        # [..., N, K, 3]
        p_box = jnp.einsum("...kij,...nj->...nki", R, pcl[..., :3]) + t[..., None, :, :]
        inside = jnp.all(
            jnp.abs(p_box) < 0.5 * bloat * self.dims[..., None, :, :], axis=-1
        )
        inside = inside & self.valid[..., None, :]
        if return_box_coords:
            return inside, p_box
        return inside

    def bev_corners(self) -> jnp.ndarray:
        """[..., K, 4, 2] BEV footprint corners (ccw in box frame)."""
        lx = self.dims[..., 0] * 0.5
        wy = self.dims[..., 1] * 0.5
        # corners in box frame
        cx = jnp.stack([lx, -lx, -lx, lx], axis=-1)
        cy = jnp.stack([wy, wy, -wy, -wy], axis=-1)
        c, s = jnp.cos(self.rot[..., 0]), jnp.sin(self.rot[..., 0])
        x = c[..., None] * cx - s[..., None] * cy + self.pos[..., 0:1]
        y = s[..., None] * cx + c[..., None] * cy + self.pos[..., 1:2]
        return jnp.stack([x, y], axis=-1)

    def corners(self) -> jnp.ndarray:
        """[..., K, 8, 3] full 3D corners (bottom 4 then top 4)."""
        bev = self.bev_corners()  # [..., K, 4, 2]
        z_lo = self.pos[..., 2:3] - 0.5 * self.dims[..., 2:3]
        z_hi = self.pos[..., 2:3] + 0.5 * self.dims[..., 2:3]
        lo = jnp.concatenate([bev, jnp.broadcast_to(z_lo[..., None, :], bev[..., :1].shape)], -1)
        hi = jnp.concatenate([bev, jnp.broadcast_to(z_hi[..., None, :], bev[..., :1].shape)], -1)
        return jnp.concatenate([lo, hi], axis=-2)

    # ------------------------------------------------------------------
    def mask_invalid(self) -> "Boxes":
        """Zero all attributes of invalid slots."""
        m = self.valid[..., None]

        def z(x):
            if x is None:
                return None
            return jnp.where(m, x, jnp.zeros_like(x)) if jnp.issubdtype(
                x.dtype, jnp.floating
            ) else jnp.where(m, x, jnp.full_like(x, INVALID_CLASS_ID))

        return Boxes(
            pos=jnp.where(m, self.pos, 0.0),
            dims=jnp.where(m, self.dims, 0.0),
            rot=jnp.where(m, self.rot, 0.0),
            probs=jnp.where(m, self.probs, 0.0),
            velo=None if self.velo is None else jnp.where(m, self.velo, 0.0),
            valid=self.valid,
            class_id=z(self.class_id),
            difficulty=None
            if self.difficulty is None
            else jnp.where(m, self.difficulty, 0),
        )

    def concatenate(self, other: "Boxes") -> "Boxes":
        """Concatenate along the K axis (reference Shape.cat)."""
        a, b = self.with_defaults(), other.with_defaults()
        cat2 = lambda x, y: jnp.concatenate([x, y], axis=-2)
        return Boxes(
            pos=cat2(a.pos, b.pos),
            dims=cat2(a.dims, b.dims),
            rot=cat2(a.rot, b.rot),
            probs=cat2(a.probs, b.probs),
            velo=cat2(a.velo, b.velo),
            valid=jnp.concatenate([a.valid, b.valid], axis=-1),
            class_id=cat2(a.class_id, b.class_id),
            difficulty=cat2(a.difficulty, b.difficulty),
        )

    def take(self, idx: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> "Boxes":
        """Gather box slots along K with index array idx [..., K']."""
        a = self.with_defaults()
        g = lambda x: jnp.take_along_axis(x, idx[..., None], axis=-2)
        new_valid = jnp.take_along_axis(a.valid, idx, axis=-1)
        if valid is not None:
            new_valid = new_valid & valid
        return Boxes(
            pos=g(a.pos),
            dims=g(a.dims),
            rot=g(a.rot),
            probs=g(a.probs),
            velo=g(a.velo),
            valid=new_valid,
            class_id=g(a.class_id),
            difficulty=g(a.difficulty),
        )

    def pad_to(self, k: int) -> "Boxes":
        """Pad (or truncate) the K axis to capacity k."""
        a = self.with_defaults()
        cur = a.k
        if cur == k:
            return a
        if cur > k:
            return jax.tree.map(lambda x: x[..., :k, :] if x.ndim == a.valid.ndim + 1 else x[..., :k], a)
        padn = k - cur

        def pad(x):
            if x.ndim == a.valid.ndim:  # valid
                return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, padn)])
            return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, padn), (0, 0)])

        return jax.tree.map(pad, a)


def boxes_from_numpy(d: dict) -> Boxes:
    """Build from a dict of numpy arrays (mined-DB / dataset format)."""
    return Boxes(
        pos=jnp.asarray(d["pos"], jnp.float32),
        dims=jnp.asarray(d["dims"], jnp.float32),
        rot=jnp.asarray(d["rot"], jnp.float32),
        probs=jnp.asarray(d["probs"], jnp.float32),
        velo=jnp.asarray(d["velo"], jnp.float32) if d.get("velo") is not None else None,
        valid=jnp.asarray(d["valid"], bool),
        class_id=jnp.asarray(d["class_id"], jnp.int32)
        if d.get("class_id") is not None
        else None,
    ).with_defaults()
