"""Flow-cluster bootstrap detector + clustering op tests."""
import jax.numpy as jnp
import numpy as np

from liso_tpu.models.flow_cluster_detector import (
    FlowClusterCfg,
    detect_boxes_from_flow,
)
from liso_tpu.ops.bev import BevSetup, point_cell_ids
from liso_tpu.ops.clustering import cluster_stats, connected_components


def test_connected_components_separates_blobs():
    m = np.zeros((32, 32), bool)
    m[4:8, 4:8] = True
    m[20:26, 18:22] = True
    labels = np.asarray(connected_components(jnp.asarray(m), dilation=0))
    assert labels[5, 5] > 0 and labels[22, 20] > 0
    assert labels[5, 5] != labels[22, 20]
    assert (labels[~m] == 0).all()
    ids = np.unique(labels[labels > 0])
    assert len(ids) == 2


def test_connected_components_dilation_bridges_gap():
    m = np.zeros((32, 32), bool)
    m[10, 5:10] = True
    m[10, 12:16] = True  # 2-cell gap
    lab0 = np.asarray(connected_components(jnp.asarray(m), dilation=0))
    lab2 = np.asarray(connected_components(jnp.asarray(m), dilation=2))
    assert len(np.unique(lab0[lab0 > 0])) == 2
    assert len(np.unique(lab2[lab2 > 0])) == 1


def test_cluster_stats_moments():
    m = np.zeros((64, 64), bool)
    m[10:14, 20:40] = True  # 4 x 20 blob, major axis along columns
    labels = connected_components(jnp.asarray(m), dilation=0)
    st = cluster_stats(labels, k_max=8)
    v = np.asarray(st.valid)
    assert v.sum() == 1
    i = int(np.argmax(v))
    assert np.allclose(np.asarray(st.centroid_rc[i]), [11.5, 29.5], atol=0.01)
    # major axis ~ 20 cells * 4*sqrt(var)/len heuristic: regionprops gives
    # axis_major_length ~ 23 for a 20-wide rect
    assert 18 < float(st.axis_major[i]) < 26
    assert 3 < float(st.axis_minor[i]) < 6
    # orientation: major axis along cols -> +-pi/2 vs row axis
    assert abs(abs(float(st.orientation[i])) - np.pi / 2) < 0.05


def test_flow_cluster_detector_end_to_end():
    bev = BevSetup(bev_range_m=(40.0, 40.0), grid_size=(128, 128))
    rng = np.random.RandomState(0)
    n = 4096
    # static background + moving object cluster at (5, 2)
    bg = rng.uniform(-18, 18, (n - 512, 3)).astype(np.float32)
    bg[:, 2] = rng.uniform(-1.6, 0.2, len(bg))  # ground-plane-ish heights
    obj = rng.uniform(-1, 1, (512, 3)).astype(np.float32) * [2.0, 1.0, 0.6] + [
        5.0, 2.0, -0.7,
    ]
    pcl = np.concatenate([bg, obj]).astype(np.float32)
    flow = np.zeros_like(pcl)
    flow[-512:, 0] = 2.0  # moving 2 m/frame in +x
    valid = jnp.ones((n,), bool)
    cell, _, _ = point_cell_ids(jnp.asarray(pcl[:, :2]), bev, valid)

    boxes = detect_boxes_from_flow(
        jnp.asarray(pcl), valid, cell, jnp.asarray(flow),
        jnp.eye(4), jnp.asarray(pcl), valid,
        jnp.asarray(0.1), bev, FlowClusterCfg(),
    )
    bv = np.asarray(boxes.valid)
    assert bv.sum() >= 1, "no boxes detected"
    i = int(np.argmax(bv))
    pos = np.asarray(boxes.pos[i])
    assert np.linalg.norm(pos[:2] - [5.0, 2.0]) < 1.5, pos
    # z fitted from the points (object spans [-1.3, -0.1])
    assert -1.5 < pos[2] < 0.3, pos
    # speed ~ 2 m/frame
    assert 1.0 < float(boxes.velo[i, 0]) < 3.0
    # yaw aligned with +x motion
    rot = float(boxes.rot[i, 0])
    assert abs(np.arctan2(np.sin(rot), np.cos(rot))) < 0.6, rot


def test_flow_cluster_no_motion_no_boxes():
    bev = BevSetup(bev_range_m=(40.0, 40.0), grid_size=(64, 64))
    rng = np.random.RandomState(0)
    pcl = rng.uniform(-18, 18, (1024, 3)).astype(np.float32)
    valid = jnp.ones((1024,), bool)
    cell, _, _ = point_cell_ids(jnp.asarray(pcl[:, :2]), bev, valid)
    boxes = detect_boxes_from_flow(
        jnp.asarray(pcl), valid, cell, jnp.zeros((1024, 3)),
        jnp.eye(4), jnp.asarray(pcl), valid,
        jnp.asarray(0.1), bev, FlowClusterCfg(),
    )
    assert not np.asarray(boxes.valid).any()
