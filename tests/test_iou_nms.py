import jax.numpy as jnp
import numpy as np

from liso_tpu.ops.boxes import Boxes
from liso_tpu.ops.iou import iou_matrix_3d, iou_matrix_bev, rotated_intersection_area
from liso_tpu.ops.nms import nms_boxes


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

    def test_random_vs_host_oracle(self):
        """Exact float64 Sutherland-Hodgman oracle (eval/iou_oracle.py, the
        iou3d_cpu.cpp port) vs the branch-free float32 TPU formulation —
        two independent algorithms must agree on random rotated pairs."""
        from liso_tpu.eval import iou_oracle

        rng = np.random.RandomState(7)
        for _ in range(100):
            p = rng.uniform(-2, 2, 4)
            d = rng.uniform(0.5, 3, 4)
            r = rng.uniform(-np.pi, np.pi, 2)
            a = bev5(p[0], p[1], d[0], d[1], r[0])
            b = bev5(p[2], p[3], d[2], d[3], r[1])
            expect = iou_oracle.rotated_intersection_area(
                np.asarray(a), np.asarray(b)
            )
            got = float(rotated_intersection_area(a, b))
            assert abs(got - expect) < 1e-3, (got, expect)

    def test_iou_matrices_vs_host_oracle(self):
        from liso_tpu.eval import iou_oracle

        rng = np.random.RandomState(3)
        ka, kb = 12, 9
        pos_a = rng.uniform(-5, 5, (ka, 3)).astype(np.float32)
        pos_b = rng.uniform(-5, 5, (kb, 3)).astype(np.float32)
        dims_a = rng.uniform(0.5, 4, (ka, 3)).astype(np.float32)
        dims_b = rng.uniform(0.5, 4, (kb, 3)).astype(np.float32)
        rot_a = rng.uniform(-np.pi, np.pi, (ka, 1)).astype(np.float32)
        rot_b = rng.uniform(-np.pi, np.pi, (kb, 1)).astype(np.float32)
        got_bev = np.asarray(
            iou_matrix_bev(pos_a, dims_a, rot_a, pos_b, dims_b, rot_b)
        )
        exp_bev = iou_oracle.iou_matrix_bev(
            pos_a, dims_a, rot_a, pos_b, dims_b, rot_b
        )
        np.testing.assert_allclose(got_bev, exp_bev, atol=2e-4)
        got_3d = np.asarray(
            iou_matrix_3d(pos_a, dims_a, rot_a, pos_b, dims_b, rot_b)
        )
        exp_3d = iou_oracle.iou_matrix_3d(
            pos_a, dims_a, rot_a, pos_b, dims_b, rot_b
        )
        np.testing.assert_allclose(got_3d, exp_3d, atol=2e-4)



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

    def test_keep_set_vs_host_oracle_random(self):
        """Device NMS keep SET == the float64 host-oracle greedy NMS on
        random clutter (VERDICT r3 item 7). Confidences are drawn without
        near-ties and thresholds checked away from any pairwise IoU so
        f32-vs-f64 rounding cannot legitimately flip a decision."""
        from liso_tpu.eval import iou_oracle

        rng = np.random.RandomState(11)
        k = 96
        arr = np.concatenate(
            [rng.uniform(-30, 30, (k, 2)), rng.uniform(1.5, 4, (k, 2)),
             rng.uniform(-np.pi, np.pi, (k, 1))], -1
        )
        probs = np.linspace(0.99, 0.01, k)[rng.permutation(k), None].astype(
            np.float32
        )
        valid = rng.rand(k) > 0.2
        boxes = make_boxes(arr, probs=probs, valid=valid)
        for thr in (0.1, 0.3, 0.5):
            out = nms_boxes(boxes, iou_threshold=thr, post_max_boxes=k)
            dev_kept = np.asarray(out.pos)[np.asarray(out.valid)]
            oracle_mask = iou_oracle.nms_keep_mask(
                np.asarray(boxes.pos), np.asarray(boxes.dims),
                np.asarray(boxes.rot), probs, valid, iou_threshold=thr,
            )
            ora_kept = np.asarray(boxes.pos)[oracle_mask]
            assert len(dev_kept) == len(ora_kept), (
                thr, len(dev_kept), len(ora_kept)
            )
            np.testing.assert_allclose(
                np.sort(dev_kept[:, 0]), np.sort(ora_kept[:, 0]), atol=1e-5
            )

    def test_keep_set_vs_host_oracle_at_reference_caps(self):
        """1000 pre-NMS / 100 post-NMS (liso_config.yml:27-28): the kept
        boxes and their order must match the host oracle exactly."""
        from liso_tpu.eval import iou_oracle

        rng = np.random.RandomState(5)
        k = 1000
        arr = np.concatenate(
            [rng.uniform(-50, 50, (k, 2)), rng.uniform(1.5, 4, (k, 2)),
             rng.uniform(-np.pi, np.pi, (k, 1))], -1
        )
        probs = np.linspace(0.999, 0.001, k)[rng.permutation(k), None].astype(
            np.float32
        )
        boxes = make_boxes(arr, probs=probs)
        out = nms_boxes(boxes, iou_threshold=0.3, post_max_boxes=100)
        ov = np.asarray(out.valid)
        dev_kept_pos = np.asarray(out.pos)[ov]
        dev_kept_probs = np.asarray(out.probs)[ov, 0]
        oracle_mask = iou_oracle.nms_keep_mask(
            np.asarray(boxes.pos), np.asarray(boxes.dims),
            np.asarray(boxes.rot), probs, np.ones(k, bool),
            iou_threshold=0.3, post_max_boxes=100,
        )
        ora_order = np.argsort(
            -probs[oracle_mask, 0], kind="stable"
        )
        ora_kept_pos = np.asarray(boxes.pos)[oracle_mask][ora_order]
        ora_kept_probs = probs[oracle_mask, 0][ora_order]
        assert len(dev_kept_pos) == len(ora_kept_pos)
        np.testing.assert_allclose(dev_kept_probs, ora_kept_probs, atol=0)
        np.testing.assert_allclose(dev_kept_pos, ora_kept_pos, atol=1e-5)

    def test_keeps_highest_confidence(self):
        boxes = make_boxes(
            [[0, 0, 2, 2, 0.0], [0, 0, 2, 2, 0.0]],
            probs=np.array([[0.2], [0.9]], np.float32),
        )
        out = nms_boxes(boxes, iou_threshold=0.5, post_max_boxes=2)
        v = np.asarray(out.valid)
        assert v.sum() == 1
        assert abs(float(out.probs[0, 0]) - 0.9) < 1e-6
