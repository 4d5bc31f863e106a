import jax.numpy as jnp
import numpy as np
import pytest

from liso_tpu.ops.boxes import Boxes
from liso_tpu.ops.iou import iou_matrix_3d, iou_matrix_bev, rotated_intersection_area
from liso_tpu.ops.nms import nms_boxes

try:
    import shapely.affinity
    import shapely.geometry

    HAVE_SHAPELY = True
except Exception:  # pragma: no cover
    HAVE_SHAPELY = False


def bev5(cx, cy, lx, wy, r):
    return jnp.array([cx, cy, lx, wy, r], jnp.float32)


class TestRotatedIntersection:
    def test_identical(self):
        a = bev5(0, 0, 4, 2, 0.3)
        assert abs(float(rotated_intersection_area(a, a)) - 8.0) < 1e-4

    def test_disjoint(self):
        a = bev5(0, 0, 2, 2, 0.0)
        b = bev5(10, 0, 2, 2, 0.0)
        assert float(rotated_intersection_area(a, b)) == 0.0

    def test_half_overlap_axis_aligned(self):
        a = bev5(0, 0, 2, 2, 0.0)
        b = bev5(1, 0, 2, 2, 0.0)
        assert abs(float(rotated_intersection_area(a, b)) - 2.0) < 1e-4

    def test_45deg_cross(self):
        # unit square vs same square rotated 45deg -> regular octagon
        a = bev5(0, 0, 2, 2, 0.0)
        b = bev5(0, 0, 2, 2, np.pi / 4)
        expect = 8 * (np.sqrt(2) - 1)  # octagon area for s=2
        assert abs(float(rotated_intersection_area(a, b)) - expect) < 1e-3

    def test_contained(self):
        a = bev5(0, 0, 4, 4, 0.2)
        b = bev5(0, 0, 1, 1, 1.0)
        assert abs(float(rotated_intersection_area(a, b)) - 1.0) < 1e-4

    @pytest.mark.skipif(not HAVE_SHAPELY, reason="shapely unavailable")
    def test_random_vs_shapely(self):
        rng = np.random.RandomState(0)
        for _ in range(50):
            p = rng.uniform(-2, 2, 4)
            d = rng.uniform(0.5, 3, 4)
            r = rng.uniform(-np.pi, np.pi, 2)
            a = bev5(p[0], p[1], d[0], d[1], r[0])
            b = bev5(p[2], p[3], d[2], d[3], r[1])

            def poly(cx, cy, lx, wy, rr):
                sq = shapely.geometry.box(-lx / 2, -wy / 2, lx / 2, wy / 2)
                sq = shapely.affinity.rotate(sq, rr, use_radians=True)
                return shapely.affinity.translate(sq, cx, cy)

            expect = poly(*np.asarray(a)).intersection(poly(*np.asarray(b))).area
            got = float(rotated_intersection_area(a, b))
            assert abs(got - expect) < 1e-3, (got, expect)


def make_boxes(arr, probs=None, valid=None):
    arr = np.asarray(arr, np.float32)
    k = arr.shape[0]
    return Boxes(
        pos=jnp.asarray(np.concatenate([arr[:, :2], np.zeros((k, 1), np.float32)], -1)),
        dims=jnp.asarray(
            np.concatenate([arr[:, 2:4], np.ones((k, 1), np.float32)], -1)
        ),
        rot=jnp.asarray(arr[:, 4:5]),
        probs=jnp.asarray(
            probs if probs is not None else np.ones((k, 1), np.float32)
        ).reshape(k, 1),
        valid=jnp.asarray(valid if valid is not None else np.ones(k, bool)),
    )


class TestIoUMatrix:
    def test_bev_and_3d(self):
        b = make_boxes([[0, 0, 2, 2, 0.0], [1, 0, 2, 2, 0.0]])
        m = iou_matrix_bev(b.pos, b.dims, b.rot, b.pos, b.dims, b.rot, b.valid, b.valid)
        np.testing.assert_allclose(np.diag(np.asarray(m)), [1.0, 1.0], atol=1e-4)
        assert abs(float(m[0, 1]) - 2.0 / 6.0) < 1e-4
        m3 = iou_matrix_3d(b.pos, b.dims, b.rot, b.pos, b.dims, b.rot, b.valid, b.valid)
        np.testing.assert_allclose(np.asarray(m3), np.asarray(m), atol=1e-4)

    def test_invalid_masked(self):
        b = make_boxes([[0, 0, 2, 2, 0.0], [0, 0, 2, 2, 0.0]], valid=[True, False])
        m = iou_matrix_bev(b.pos, b.dims, b.rot, b.pos, b.dims, b.rot, b.valid, b.valid)
        assert float(m[0, 1]) == 0.0 and float(m[1, 0]) == 0.0


class TestNMS:
    def test_suppression_order(self):
        boxes = make_boxes(
            [
                [0, 0, 2, 2, 0.0],
                [0.1, 0, 2, 2, 0.0],  # overlaps 0, lower conf -> killed
                [5, 5, 2, 2, 0.0],  # disjoint, survives
            ],
            probs=np.array([[0.9], [0.8], [0.7]], np.float32),
        )
        out = nms_boxes(boxes, iou_threshold=0.1, post_max_boxes=3)
        v = np.asarray(out.valid)
        assert v.tolist() == [True, True, False]
        np.testing.assert_allclose(np.asarray(out.probs[v][:, 0]), [0.9, 0.7])

    def test_capacity_and_invalid(self):
        rng = np.random.RandomState(0)
        arr = np.concatenate(
            [rng.uniform(-50, 50, (64, 2)), rng.uniform(1, 3, (64, 2)),
             rng.uniform(-3, 3, (64, 1))], -1
        )
        valid = rng.rand(64) > 0.3
        boxes = make_boxes(arr, probs=rng.rand(64, 1).astype(np.float32), valid=valid)
        out = nms_boxes(boxes, iou_threshold=0.3, post_max_boxes=16)
        assert out.k == 16
        ov = np.asarray(out.valid)
        probs = np.asarray(out.probs[:, 0])
        kept = probs[ov]
        assert (np.diff(kept) <= 1e-6).all()  # sorted desc

    def test_keeps_highest_confidence(self):
        boxes = make_boxes(
            [[0, 0, 2, 2, 0.0], [0, 0, 2, 2, 0.0]],
            probs=np.array([[0.2], [0.9]], np.float32),
        )
        out = nms_boxes(boxes, iou_threshold=0.5, post_max_boxes=2)
        v = np.asarray(out.valid)
        assert v.sum() == 1
        assert abs(float(out.probs[0, 0]) - 0.9) < 1e-6
