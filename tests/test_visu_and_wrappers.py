"""Visualisation + nuScenes-protocol wrapper tests."""
import numpy as np

from liso_tpu.eval.nuscenes_wrapper import NuscenesObjectDetectionMetrics
from liso_tpu.visu.bbox_image import (
    draw_boxes_bev,
    pcl_occupancy_image,
    render_frame,
    save_tracking_gif,
)
from liso_tpu.visu.flow_image import flow_to_rgb
from tests.test_eval_metrics import mk


def test_flow_to_rgb():
    flow = np.zeros((16, 16, 2), np.float32)
    flow[:8, :, 0] = 1.0
    rgb = flow_to_rgb(flow)
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
    # moving and still halves get different colors
    assert not np.array_equal(rgb[0, 0], rgb[15, 0])


def test_occupancy_and_boxes():
    pts = np.array([[0.0, 0.0], [5.0, 5.0], [100.0, 100.0]])
    img = pcl_occupancy_image(pts, (40.0, 40.0), (64, 64))
    assert img.sum() == 2  # out-of-range dropped
    rgb = np.zeros((64, 64, 3), np.float32)
    boxes = {
        "pos": np.array([[0.0, 0.0, 0.0]]),
        "dims": np.array([[8.0, 4.0, 2.0]]),
        "rot": np.array([[0.3]]),
    }
    draw_boxes_bev(rgb, boxes, (40.0, 40.0))
    assert rgb[..., 1].sum() > 10  # green wireframe drawn


def test_tracking_gif(tmp_path):
    frames = [
        render_frame(
            np.random.RandomState(i).uniform(-15, 15, (200, 2)),
            {
                "pos": np.array([[float(i), 0.0, 0.0]]),
                "dims": np.array([[4.0, 2.0, 1.5]]),
                "rot": np.array([[0.0]]),
            },
            (40.0, 40.0),
            grid_hw=(64, 64),
        )
        for i in range(4)
    ]
    p = save_tracking_gif(frames, tmp_path / "track.gif")
    assert p.exists() and p.stat().st_size > 500


def test_nuscenes_wrapper_perfect_prediction():
    m = NuscenesObjectDetectionMetrics()
    gt = mk([[0, 0, 0], [10, 5, 0]])
    m.update(gt, gt)
    out = m.compute()
    assert out["nusc/mAP"] > 0.95
    assert out["nusc/mATE"] < 1e-6
    assert out["nusc/NDS"] > 0.95


def test_nuscenes_wrapper_no_detections():
    m = NuscenesObjectDetectionMetrics()
    m.update(mk([[0, 0, 0]]), mk(np.zeros((0, 3))))
    out = m.compute()
    assert out["nusc/mAP"] == 0.0
    assert out["nusc/NDS"] < 0.45


def test_range_image_rendering():
    """visu/bbox_image.py:19-152 parity: spherical projection + box
    wireframes on the range image."""
    from liso_tpu.visu.bbox_image import (
        draw_boxes_on_range_image,
        range_project_points,
        render_pcl_range_image,
    )

    rng = np.random.RandomState(0)
    pcl = rng.uniform(-30, 30, (500, 4)).astype(np.float32)
    pcl[:, 2] = rng.uniform(-2, 1, 500)
    pcl[:, 3] = rng.rand(500)
    img = render_pcl_range_image([pcl], height=64, width=256)
    assert img.shape == (1, 64, 256, 3)
    assert img.max() > 0
    # a point straight ahead lands mid-azimuth
    rows, cols = range_project_points(
        np.array([[10.0, 0.0, 0.0]]), np.deg2rad(4), np.deg2rad(-25), 64, 256
    )
    assert abs(int(cols[0]) - 128) <= 1
    boxes = {
        "pos": np.array([[8.0, 0.0, 0.0]], np.float32),
        "dims": np.array([[4.0, 2.0, 1.5]], np.float32),
        "rot": np.zeros((1, 1), np.float32),
    }
    img2 = draw_boxes_on_range_image(img[0], boxes)
    assert (img2 != img[0]).any()


def test_augm_db_visualizer(tmp_path):
    """visu/visualize_box_augmentation_database.py parity: snippets render
    into tiled grid pages and log as TB images."""
    from liso_tpu.visu.augm_db_image import grid_of_snippets, render_box_snippet

    rng = np.random.RandomState(0)
    db = {"pcl_in_box_cosy": [], "boxes": [], "lidar_rows": [],
          "box_T_sensor": [], "unique_track_id": []}
    for i in range(10):
        pts = rng.uniform(-1.5, 1.5, (60, 4)).astype(np.float32)
        db["pcl_in_box_cosy"].append(pts)
        db["boxes"].append({"dims": np.array([4.0, 2.0, 1.5]),
                            "pos": np.zeros(3), "rot": np.zeros(1)})
    img = render_box_snippet(db["pcl_in_box_cosy"][0],
                             db["boxes"][0]["dims"])
    assert img.shape == (96, 96, 3) and img.max() > 0
    pages = grid_of_snippets(db, num_boxes=10, per_row=4)
    assert len(pages) == 1
    assert pages[0].shape == (96 * 3, 96 * 4, 3)
    # green box rectangle present
    assert (pages[0][..., 1] == 255).any()
    # empty DB degrades to no pages
    empty = {"pcl_in_box_cosy": [], "boxes": []}
    assert grid_of_snippets(empty) == []
