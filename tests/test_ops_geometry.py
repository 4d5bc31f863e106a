import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liso_tpu.ops import transforms as tr
from liso_tpu.ops.boxes import Boxes
from liso_tpu.ops.kabsch import symmetric_orthogonalization, weighted_kabsch


def rand_pose(rng):
    yaw = rng.uniform(-np.pi, np.pi)
    t = rng.uniform(-5, 5, size=3)
    return tr.compose_matrix(t=jnp.asarray(t, jnp.float32), theta_z=jnp.float32(yaw))


class TestTransforms:
    def test_compose_decompose_roundtrip(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            yaw = rng.uniform(-np.pi, np.pi)
            t = rng.uniform(-10, 10, 3).astype(np.float32)
            T = tr.compose_matrix(t=jnp.asarray(t), theta_z=jnp.float32(yaw))
            t2, yaw2 = tr.decompose_matrix(T)
            np.testing.assert_allclose(t2, t, atol=1e-5)
            assert abs(tr.normalize_angle(yaw2 - yaw)) < 1e-5

    def test_invert(self):
        rng = np.random.RandomState(1)
        T = rand_pose(rng)
        eye = T @ tr.invert_pose(T)
        np.testing.assert_allclose(eye, np.eye(4), atol=1e-5)

    def test_transform_points_roundtrip(self):
        rng = np.random.RandomState(2)
        T = rand_pose(rng)
        pts = jnp.asarray(rng.randn(17, 3), jnp.float32)
        back = tr.transform_points(tr.invert_pose(T), tr.transform_points(T, pts))
        np.testing.assert_allclose(back, pts, atol=1e-4)

    def test_batched_poses(self):
        yaws = jnp.asarray([0.0, np.pi / 2], jnp.float32)
        ts = jnp.zeros((2, 3))
        T = tr.compose_matrix(t=ts, theta_z=yaws)
        assert T.shape == (2, 4, 4)
        np.testing.assert_allclose(T[1, 0, 1], -1.0, atol=1e-6)

    def test_matrix_to_quaternion(self):
        rng = np.random.RandomState(3)
        for yaw in [0.0, 1.0, -2.5, np.pi]:
            R = tr.rot_z(jnp.float32(yaw))
            q = tr.matrix_to_quaternion(R)
            # quaternion for rot about z: (cos(yaw/2), 0, 0, sin(yaw/2))
            expect = np.array(
                [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)], np.float32
            )
            # q and -q encode the same rotation (ambiguous at yaw=pi)
            err = min(
                np.abs(np.asarray(q) - expect).max(),
                np.abs(np.asarray(q) + expect).max(),
            )
            assert err < 1e-5, (yaw, q, expect)


class TestBoxes:
    def test_points_in_box(self):
        boxes = Boxes(
            pos=jnp.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]]),
            dims=jnp.array([[4.0, 2.0, 2.0], [2.0, 2.0, 2.0]]),
            rot=jnp.array([[0.0], [np.pi / 2]]),
            probs=jnp.ones((2, 1)),
            valid=jnp.array([True, True]),
        )
        pts = jnp.array(
            [
                [0.0, 0.0, 0.0],  # in box 0
                [1.9, 0.9, 0.0],  # in box 0 (corner)
                [2.1, 0.0, 0.0],  # outside box 0 (x too big)
                [10.0, 0.9, 0.0],  # in box 1 (rotated: x-extent is now y)
                [10.95, 0.0, 0.0],  # box 1 rotated 90deg: width 2 along x
            ]
        )
        m = boxes.points_in_box_mask(pts)
        expect = np.array(
            [
                [True, False],
                [True, False],
                [False, False],
                [False, True],
                [False, True],
            ]
        )
        np.testing.assert_array_equal(np.asarray(m), expect)

    def test_invalid_box_gives_false(self):
        boxes = Boxes(
            pos=jnp.zeros((1, 3)),
            dims=jnp.full((1, 3), 100.0),
            rot=jnp.zeros((1, 1)),
            probs=jnp.ones((1, 1)),
            valid=jnp.array([False]),
        )
        m = boxes.points_in_box_mask(jnp.zeros((3, 3)))
        assert not np.asarray(m).any()

    def test_transform(self):
        boxes = Boxes(
            pos=jnp.array([[1.0, 0.0, 0.0]]),
            dims=jnp.ones((1, 3)),
            rot=jnp.zeros((1, 1)),
            probs=jnp.ones((1, 1)),
            valid=jnp.array([True]),
        )
        T = tr.compose_matrix(
            t=jnp.array([0.0, 0.0, 0.0]), theta_z=jnp.float32(np.pi / 2)
        )
        b2 = boxes.transform(T)
        np.testing.assert_allclose(b2.pos[0], [0.0, 1.0, 0.0], atol=1e-6)
        assert abs(b2.rot[0, 0] - np.pi / 2) < 1e-6

    def test_bev_corners(self):
        boxes = Boxes(
            pos=jnp.array([[0.0, 0.0, 0.0]]),
            dims=jnp.array([[4.0, 2.0, 1.0]]),
            rot=jnp.zeros((1, 1)),
            probs=jnp.ones((1, 1)),
            valid=jnp.array([True]),
        )
        c = np.asarray(boxes.bev_corners()[0])
        assert sorted(c[:, 0].tolist()) == [-2.0, -2.0, 2.0, 2.0]
        assert sorted(c[:, 1].tolist()) == [-1.0, -1.0, 1.0, 1.0]

    def test_concat_take_pad(self):
        a = Boxes.empty(3)
        b = Boxes.empty(2).replace(valid=jnp.array([True, False]))
        c = a.concatenate(b)
        assert c.k == 5
        assert np.asarray(c.valid).tolist() == [False] * 3 + [True, False]
        p = c.pad_to(8)
        assert p.k == 8 and not np.asarray(p.valid)[5:].any()


class TestKabsch:
    def test_symm_ortho_is_rotation(self):
        rng = np.random.RandomState(0)
        A = jnp.asarray(rng.randn(4, 3, 3), jnp.float32)
        R = symmetric_orthogonalization(A)
        eye = R @ jnp.swapaxes(R, -1, -2)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)

    def test_symm_ortho_grad_finite(self):
        rng = np.random.RandomState(1)
        A = jnp.asarray(rng.randn(3, 3), jnp.float32)
        g = jax.grad(lambda a: symmetric_orthogonalization(a).sum())(A)
        assert np.isfinite(np.asarray(g)).all()

    def test_recovers_rigid_motion(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(50, 3), jnp.float32)
        yaw = 0.7
        T_true = tr.compose_matrix(
            t=jnp.array([1.0, -2.0, 0.5]), theta_z=jnp.float32(yaw)
        )
        y = tr.transform_points(T_true, x)
        w = jnp.ones((50,))
        T, bad = weighted_kabsch(x, y, w)
        assert not bool(bad)
        np.testing.assert_allclose(T, T_true, atol=1e-4)

    def test_weighted_ignores_outliers(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(40, 3), jnp.float32)
        T_true = tr.compose_matrix(t=jnp.array([0.5, 0.0, 0.0]), theta_z=jnp.float32(0.3))
        y = tr.transform_points(T_true, x)
        y = y.at[:10].add(100.0)  # corrupt first 10
        w = jnp.ones((40,)).at[:10].set(0.0)
        T, _ = weighted_kabsch(x, y, w)
        np.testing.assert_allclose(T, T_true, atol=1e-4)

    def test_not_enough_points_flag(self):
        x = jnp.zeros((5, 3))
        w = jnp.zeros((5,)).at[0].set(1.0)
        T, bad = weighted_kabsch(x, x, w)
        assert bool(bad)
        assert np.isfinite(np.asarray(T)).all()

    def test_batched_slotted(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(2, 1, 30, 3), jnp.float32)
        w = jnp.asarray(rng.rand(2, 4, 30), jnp.float32)
        T, bad = weighted_kabsch(x, x, w)
        assert T.shape == (2, 4, 4, 4)
        np.testing.assert_allclose(
            T, np.tile(np.eye(4), (2, 4, 1, 1)), atol=1e-3
        )


def test_soft_box_membership():
    from liso_tpu.ops.soft_masks import soft_box_membership
    from liso_tpu.ops.boxes import Boxes
    import jax.numpy as jnp
    import numpy as np

    b = Boxes.empty(2)
    b = b.replace(
        pos=b.pos.at[0].set(jnp.asarray([5.0, 0.0, 0.0])),
        dims=b.dims.at[0].set(jnp.asarray([4.0, 2.0, 2.0])),
        valid=b.valid.at[0].set(True),
    )
    pts = jnp.asarray(
        [[5.0, 0.0, 0.0],   # box center -> weight ~1
         [5.0, 0.9, 0.0],   # near width edge -> intermediate
         [20.0, 0.0, 0.0]]  # far outside -> ~0
    )
    for fun in ("cauchy", "sigmoid"):
        w = np.asarray(soft_box_membership(b, pts, softness_fun=fun))
        assert w.shape == (3, 2)
        assert w[0, 0] > 0.85
        assert 0.05 < w[1, 0] < 0.9
        assert w[2, 0] < 0.01
        # invalid slot contributes nothing
        assert (w[:, 1] == 0).all()


def test_kabsch_fp32_matches_fp64_reference():
    """SURVEY hard part #3: the reference runs Kabsch SVD in float64
    (kabsch_mask.py:488-507); our fp32 formulation (pre-centering +
    weight-normalised covariance + UV^T) must match an independent fp64
    implementation on hard cases (tiny rotations, far-offset clouds,
    extreme weight imbalance)."""
    import numpy as np
    import jax.numpy as jnp
    from liso_tpu.ops.kabsch import weighted_kabsch

    def kabsch_fp64(x, y, w):
        w = np.asarray(w, np.float64)
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        cw = w.sum()
        mx = (x * w[:, None]).sum(0) / cw
        my = (y * w[:, None]).sum(0) / cw
        H = ((y - my) * w[:, None]).T @ (x - mx)
        U, _, Vt = np.linalg.svd(H)
        R = U @ Vt
        if np.linalg.det(R) < 0:  # proper rotation for these test cases
            R = U @ np.diag([1, 1, -1]) @ Vt
        t = my - R @ mx
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        return T

    rng = np.random.RandomState(0)
    cases = []
    # tiny rotation, far offset (fp32 catastrophic-cancellation territory)
    x = rng.randn(200, 3) * 2 + np.array([80.0, -60.0, 0.0])
    theta = 1e-3
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    cases.append((x, x @ R.T + [0.01, -0.02, 0.0], np.ones(200)))
    # extreme weight imbalance
    w = np.ones(200) * 1e-6
    w[:20] = 1.0
    cases.append((x, x @ R.T + 0.5, w))

    for x, y, w in cases:
        T32, _ = weighted_kabsch(
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(w, jnp.float32),
        )
        T64 = kabsch_fp64(x, y, w)
        assert np.allclose(np.asarray(T32)[:3, :3], T64[:3, :3], atol=2e-4), (
            np.abs(np.asarray(T32)[:3, :3] - T64[:3, :3]).max()
        )
        assert np.allclose(np.asarray(T32)[:3, 3], T64[:3, 3], atol=2e-2), (
            np.abs(np.asarray(T32)[:3, 3] - T64[:3, 3]).max()
        )
