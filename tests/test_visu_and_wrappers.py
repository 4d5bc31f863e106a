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
    # devkit convention: no attribute labels -> attr error 1 -> score 0,
    # so a perfect no-attribute prediction tops out at NDS = 0.9
    # (pinned devkit-exact by test_nuscenes_devkit_cross_check)
    assert abs(out["nusc/NDS"] - 0.9) < 1e-6
    assert out["nusc/mAAE"] == 1.0


def test_nuscenes_wrapper_summary_plots(tmp_path):
    """Devkit-style per-class summary plots (PR + TP-error curves, the
    reference's nuscenes_metrics_wrapper.py:71-441 render path)."""
    m = NuscenesObjectDetectionMetrics()
    gt = mk([[0, 0, 0], [10, 5, 0]])
    m.update(gt, gt)
    paths = m.render_summary_plots(tmp_path)
    assert paths and all(p.exists() and p.stat().st_size > 0 for p in paths)


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


def test_pcl_image_helpers():
    """liso_tpu/visu/pcl_image.py vs hand-computed pixels (reference
    pcl_image.py:7-157 semantics incl. the 1 cm extent epsilon and the
    isotropic non-square scale)."""
    from liso_tpu.visu.pcl_image import (
        create_occupancy_pcl_image,
        create_topdown_f32_pcl_image_variable_extent,
        get_linear_bev_idx,
        pillarize_pointcloud,
        project_2d_pcl_to_rowcol_nonsquare_bev_range,
    )

    bev = np.array([8.0, 8.0], np.float32)
    res = np.array([8, 8], np.int32)
    pts = np.array(
        [[-4.0, -4.0], [0.0, 0.0], [3.999, 3.999], [100.0, -100.0]],
        np.float32,
    )
    rc = pillarize_pointcloud(pts, bev, res)
    assert rc.tolist() == [[0, 0], [4, 4], [7, 7], [7, 0]]  # clipped corner

    occ = create_occupancy_pcl_image(pts, bev, res)
    assert occ.shape == (8, 8, 1)
    assert occ[0, 0, 0] == 1.0 and occ[4, 4, 0] == 1.0
    assert occ.sum() == 4.0  # clipped point lands on (7,0)

    # non-square extent: isotropic scale = min factor
    cmin = np.array([0.0, 0.0], np.float32)
    cmax = np.array([10.0, 20.0], np.float32)
    grid = np.array([10, 20], np.int32)
    rc_f = project_2d_pcl_to_rowcol_nonsquare_bev_range(
        np.array([[5.0, 10.0]], np.float32), cmin, cmax, grid
    )
    assert np.allclose(rc_f, [[5.0, 10.0]])  # both factors are 1 px/m

    pcl4 = np.array(
        [
            [1.5, 2.5, 0.0, 0.0],
            [1.5, 2.5, 0.0, 0.0],  # same pixel, lower intensity
            [0.005, 5.0, 0.0, 0.0],  # inside epsilon shrink -> dropped
            [9.5, 19.5, 0.0, 0.0],
        ],
        np.float32,
    )
    inten = np.array([0.9, 0.4, 1.0, 0.2], np.float32)
    inside, lin = get_linear_bev_idx(pcl4, cmin, cmax, grid)
    assert inside.tolist() == [True, True, False, True]
    img, occ2 = create_topdown_f32_pcl_image_variable_extent(
        pcl4, inten, cmin, cmax, grid
    )
    assert img.shape == (10, 20) and occ2.shape == (10, 20)
    assert img[1, 2] == 0.9  # max of the colliding pair (deterministic)
    assert occ2[1, 2] and occ2[9, 19]
    assert occ2.sum() == 2


def test_visu_utils_cmap_and_batches():
    from liso_tpu.visu.pcl_image import apply_cmap, limit_visu_image_batches

    img = np.zeros((12, 4, 4, 3), np.float32)
    assert limit_visu_image_batches(img).shape[0] == 8
    assert limit_visu_image_batches(img[:3]).shape[0] == 3

    rgba = apply_cmap(np.linspace(-3, 5, 16).reshape(4, 4))
    assert rgba.shape == (4, 4, 4)
    assert rgba.min() >= 0.0 and rgba.max() <= 1.0
    flat = apply_cmap(np.zeros((4, 4)))  # ptp == 0 guard
    assert np.isfinite(flat).all()


def _batched_boxes(b=2, k=3, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "pos": rng.uniform(-30, 30, (b, k, 3)).astype(np.float32),
        "dims": np.full((b, k, 3), 3.0, np.float32),
        "rot": rng.uniform(-3, 3, (b, k, 1)).astype(np.float32),
        "probs": rng.uniform(0.1, 1.0, (b, k, 1)).astype(np.float32),
        "valid": np.array([[True, True, False], [True, False, False]]),
    }


def test_attribute_colored_box_image_and_text():
    from liso_tpu.visu.bbox_image import (
        attribute_colored_box_image, scalar_colored_box_img_w_text,
    )

    boxes = _batched_boxes()
    canvas = np.zeros((2, 64, 64), np.float32)
    scal = boxes["probs"][..., 0]
    rgb = attribute_colored_box_image(canvas, boxes, scal, (100.0, 100.0))
    assert rgb.shape == (2, 64, 64, 3)
    assert rgb.max() > 0  # some wireframe drawn
    # summer colormap keeps blue channel at 0.4 on colored pixels
    drawn = rgb[rgb.sum(-1) > 0]
    assert np.isclose(drawn[:, 2].min(), 0.4, atol=1e-5)

    txt = scalar_colored_box_img_w_text(
        canvas, boxes, scal, (100.0, 100.0), gt_boxes=boxes,
        max_num_images=2,
    )
    assert txt.shape == (2, 64, 64, 3)
    assert txt.max() <= 1.0 and txt.min() >= 0.0


def test_log_box_movement_panel():
    from liso_tpu.visu.bbox_image import log_box_movement

    boxes = _batched_boxes()
    rng = np.random.RandomState(1)
    pcl = rng.uniform(-40, 40, (2, 256, 3)).astype(np.float32)

    class Rec:
        def __init__(self):
            self.tags = []

        def add_image(self, tag, img, step):
            self.tags.append(tag)
            assert img.ndim == 3 and img.shape[-1] == 3

    rec = Rec()
    panel = log_box_movement(
        writer=rec,
        tag="val_images/batch0",
        global_step=7,
        pcl_t0=pcl,
        pred_boxes=boxes,
        gt_boxes=boxes,
        bev_range_m=(100.0, 100.0),
        pcl_t1=pcl,
        gt_boxes_t1=boxes,
        grid_hw=(64, 64),
    )
    # 3 panels (100-cap, 40-cap, t1 gt) stacked along H
    assert panel.shape == (2, 3 * 64, 64, 3)
    assert rec.tags == ["val_images/batch0/b0", "val_images/batch0/b1"]


def test_render_gt_boxes_with_predicted_logits():
    from liso_tpu.visu.bbox_image import render_gt_boxes_with_predicted_logits

    boxes = _batched_boxes()
    prob_map = np.random.RandomState(2).uniform(
        0, 1, (2, 64, 64, 1)
    ).astype(np.float32)
    img = render_gt_boxes_with_predicted_logits(
        prob_map, boxes, np.zeros((2, 64, 64), np.float32), (100.0, 100.0)
    )
    assert img.shape == (2, 64, 64, 3)
    assert img.max() > 0


def test_add_gif_writes_image_summary(tmp_path):
    """TBFactory.add_gif writes an animated-GIF image summary readable by
    the TB event loader (reference tracking.py:417-473 protobuf path)."""
    import glob
    import os

    from liso_tpu.utils.tb import TBFactory

    frames = [np.random.RandomState(i).rand(16, 16, 3) for i in range(3)]
    fac = TBFactory(tmp_path)
    w = fac("mine", "mining/")
    w.add_gif("tracked_sequence", frames, 1)
    w.flush()
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    ev = glob.glob(str(tmp_path / "mine" / "events*"))
    assert ev
    acc = EventAccumulator(os.path.dirname(ev[0]), size_guidance={"images": 0})
    acc.Reload()
    imgs = acc.Tags().get("images", [])
    assert "mining/tracked_sequence" in imgs
    # the stored bytes are an actual GIF (animated payload)
    blob = acc.Images("mining/tracked_sequence")[0].encoded_image_string
    assert blob[:6] in (b"GIF87a", b"GIF89a")
