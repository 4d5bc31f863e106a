"""Golden cross-check: our AP implementation vs the REFERENCE's own
eval/od_metrics.py run in-process (torch-cpu), on identical scenarios.

The reference tree is imported through tests/ref_import_shims (stubs for
shapely/omegaconf/config_helper/iou3d_nms_cuda + the pre-1.9 sklearn
helper); only the distance-matching AP path is exercised, which touches
none of the stubbed code. Skipped when /root/reference is absent.
"""
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference tree not mounted"
)


def _boxes(k, seed):
    r = np.random.RandomState(seed)
    return {
        "pos": np.concatenate(
            [r.uniform(-30, 30, (k, 2)), r.uniform(-1, 1, (k, 1))], -1
        ),
        "dims": r.uniform(1, 4, (k, 3)),
        "rot": r.uniform(-3, 3, (k, 1)),
        "probs": r.uniform(0.05, 1, (k, 1)),
        "velo": r.uniform(0, 2, (k, 1)),
        "class_id": np.zeros((k, 1), np.int64),
    }


def _noisy(gt, seed, extra=3):
    r = np.random.RandomState(seed)
    k = len(gt["pos"])
    pred = {kk: v.copy() for kk, v in gt.items()}
    pred["pos"] = pred["pos"] + r.normal(0, 0.7, pred["pos"].shape)
    pred["probs"] = r.uniform(0.05, 1, (k, 1))
    fp = _boxes(extra, seed + 1000)
    return {kk: np.concatenate([pred[kk], fp[kk]]) for kk in pred}


@pytest.mark.parametrize("use_slow", [True, False])
def test_ap_values_match_reference_implementation(tmp_path, use_slow):
    import ref_import_shims

    ref_import_shims.install()
    import torch
    from liso.eval.od_metrics import ObjectDetectionMetrics as RefODM
    from liso.kabsch.shape_utils import Shape

    from liso_tpu.eval.od_metrics import ObjectDetectionMetrics as OurODM

    def shape(d):
        k = len(d["pos"])
        return Shape(
            pos=torch.tensor(d["pos"]),
            dims=torch.tensor(d["dims"]),
            rot=torch.tensor(d["rot"]),
            probs=torch.tensor(d["probs"]),
            valid=torch.ones(k, dtype=torch.bool),
            velo=torch.tensor(d["velo"]),
        )

    kw = dict(
        moving_velocity_thresh=0.5,
        use_slow_nuscenes_matching=use_slow,
        min_recall=0.1,
        min_precision=0.1,
        box_matching_criterion="dist",
    )
    ref = RefODM(**kw)
    ours = OurODM(**kw)
    for s in range(3):
        g = _boxes(6, s)
        p = _noisy(g, 100 + s)
        ref.update(
            non_batched_gt_boxes=shape(g),
            non_batched_pred_boxes=shape(p),
            sample_token=f"s{s}",
        )
        ours.update(g, p)

    md = ref.log(0, path=str(tmp_path))
    our = ours.compute()
    checked = 0
    for cat in ("overall", "moving", "still"):
        for th in (0.5, 1.0, 2.0, 4.0):
            ref_key = f"/dist/overall/{cat}/AP@{th:.1f}m"
            our_key = f"AP_overall_{cat}_dist@{th}"
            assert ref_key in md, ref_key
            assert our_key in our, our_key
            np.testing.assert_allclose(
                our[our_key], md[ref_key], rtol=0, atol=1e-9,
                err_msg=f"{our_key} vs {ref_key}",
            )
            checked += 1
    assert checked == 12


def test_weighted_kabsch_matches_reference():
    """ops/kabsch.weighted_kabsch vs the reference's torch
    weighted_pc_alignment (fp64 symm-ortho) on random weighted clouds."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    import torch
    from liso.slim.slim_loss.weighted_pc_alignment import (
        weighted_pc_alignment,
    )

    from liso_tpu.ops.kabsch import weighted_kabsch

    rng = np.random.RandomState(0)
    for seed in range(3):
        r = np.random.RandomState(seed)
        n = 64
        x = r.uniform(-10, 10, (n, 3))
        ang = r.uniform(-1, 1)
        R = np.array([
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ])
        t = r.uniform(-2, 2, 3)
        y = x @ R.T + t + r.normal(0, 0.05, (n, 3))
        w = r.uniform(0, 1, n)

        T_ref, nep_ref = weighted_pc_alignment(
            torch.tensor(x), torch.tensor(y), torch.tensor(w)
        )
        T_ours, nep_ours = weighted_kabsch(
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(w, jnp.float32),
        )
        np.testing.assert_allclose(
            np.asarray(T_ours)[:3], T_ref.numpy()[:3], rtol=0, atol=2e-4
        )
        assert bool(nep_ours) == bool(nep_ref)


def test_greedy_matcher_matches_reference():
    """tracker/matching.greedy_match_by_confidence vs the reference's
    slow_greedy_match_boxes_by_desending_confidence_by_dist — identical
    matched pairs and masks."""
    import ref_import_shims

    ref_import_shims.install()
    from liso.kabsch.box_groundtruth_matching import (
        slow_greedy_match_boxes_by_desending_confidence_by_dist as ref_match,
    )

    from liso_tpu.tracker.matching import greedy_match_by_confidence

    for seed in range(5):
        r = np.random.RandomState(seed)
        gt = r.uniform(-20, 20, (6, 3))
        pred = r.uniform(-20, 20, (9, 3))
        conf = r.uniform(0, 1, 9)
        ig, ip, dists, pm, gm = ref_match(gt, pred, conf, 4.0, match_in_nd=3)
        ours = greedy_match_by_confidence(gt, pred, conf, 4.0, match_in_nd=3)
        order_ref = np.argsort(ip)
        order_ours = np.argsort(ours.idxs_pred)
        np.testing.assert_array_equal(
            np.asarray(ig)[order_ref], ours.idxs_gt[order_ours]
        )
        np.testing.assert_array_equal(
            np.asarray(ip)[order_ref], ours.idxs_pred[order_ours]
        )
        np.testing.assert_array_equal(pm, ours.matched_preds_mask)
        np.testing.assert_array_equal(gm, ours.matched_gts_mask)


def test_box_fit_closeness_matches_reference():
    """tracker/box_fitting.fit_2d_box('closeness_to_edge') vs the
    reference's MODEST-derived fit — same rectangle (corner sets equal)."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    from liso.box_fitting.box_fitting import fit_2d_box_modest

    from liso_tpu.tracker.box_fitting import fit_2d_box

    def corners(center, l, w, yaw):
        c, s = np.cos(yaw), np.sin(yaw)
        Rm = np.array([[c, -s], [s, c]])
        pts = np.array([
            [l / 2, w / 2], [-l / 2, w / 2], [-l / 2, -w / 2], [l / 2, -w / 2]
        ])
        return pts @ Rm.T + np.asarray(center)[:2]

    for seed in range(3):
        r = np.random.RandomState(seed)
        # rectangle-ish cluster
        l_true, w_true = 4.2, 1.9
        yaw_true = r.uniform(0, np.pi / 2)
        n = 160
        edge = r.randint(0, 4, n)
        u = r.uniform(-0.5, 0.5, n)
        pts = np.zeros((n, 2))
        pts[edge == 0] = np.stack(
            [u[edge == 0] * l_true, np.full((edge == 0).sum(), w_true / 2)], -1
        )
        pts[edge == 1] = np.stack(
            [u[edge == 1] * l_true, np.full((edge == 1).sum(), -w_true / 2)], -1
        )
        pts[edge == 2] = np.stack(
            [np.full((edge == 2).sum(), l_true / 2), u[edge == 2] * w_true], -1
        )
        pts[edge == 3] = np.stack(
            [np.full((edge == 3).sum(), -l_true / 2), u[edge == 3] * w_true], -1
        )
        c, s = np.cos(yaw_true), np.sin(yaw_true)
        pts = pts @ np.array([[c, -s], [s, c]]).T + r.uniform(-5, 5, 2)
        pts3 = np.concatenate([pts, np.zeros((n, 1))], -1)

        center_ref, l_ref, w_ref, ry_ref = fit_2d_box_modest(
            pts3, "closeness_to_edge"
        )
        c_ours, l_ours, w_ours, yaw_ours = fit_2d_box(
            jnp.asarray(pts, jnp.float32), jnp.ones(n, bool),
            method="closeness_to_edge",
        )
        ref_corners = corners(center_ref, l_ref, w_ref, ry_ref)
        our_corners = corners(
            np.asarray(c_ours), float(l_ours), float(w_ours), float(yaw_ours)
        )
        # corner sets equal regardless of vertex ordering / 90-deg flips
        d = np.linalg.norm(
            ref_corners[:, None] - our_corners[None], axis=-1
        )
        assert d.min(axis=1).max() < 0.15, d.min(axis=1)


def test_flow_inlier_outlier_ratios_match_reference():
    """eval/flow_metrics inlier/outlier ratios vs the reference's
    slim/utils/metrics.get_inlier_outlier_ratios."""
    import ref_import_shims

    ref_import_shims.install()
    from liso.slim.utils.metrics import (
        compute_scene_flow_metrics_for_points_in_this_mask as ref_fn,
    )

    from liso_tpu.eval.flow_metrics import inlier_outlier_ratios

    for seed in range(3):
        r = np.random.RandomState(seed)
        n = 512
        gt = r.normal(0, 1.0, (n, 3))
        pred = gt + r.normal(0, 0.2, (n, 3))
        mask = r.rand(n) > 0.3
        ref = ref_fn(pred, gt, mask)
        ours = inlier_outlier_ratios(pred, gt, mask)
        np.testing.assert_allclose(ours["AccS"], ref["ACC3D_0_05"],
                                   rtol=1e-9)
        np.testing.assert_allclose(ours["AccR"], ref["ACC3D_0_1"],
                                   rtol=1e-9)
        np.testing.assert_allclose(ours["Outliers"], ref["Outliers3D"],
                                   rtol=1e-9)
        np.testing.assert_allclose(
            float(np.linalg.norm(pred - gt, axis=-1)[mask].mean()),
            ref["AEE"], rtol=1e-9,
        )


def test_track_smoothing_matches_reference():
    """tracker/smoothing.smooth_track_jerk vs the reference's torch Adam
    jerk smoother on the same noisy trajectory — both minimize the same
    (convex-ish) jerk + observation objective, so the converged smoothed
    positions must agree."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    import torch
    from liso.tracker.track_smoothing import smooth_track_jerk as ref_smooth

    from liso_tpu.tracker.smoothing import smooth_track_jerk as our_smooth

    r = np.random.RandomState(0)
    t = 12
    ts = np.arange(t, dtype=np.float64)
    truth = np.stack([2.0 * ts, 0.05 * ts**2, np.zeros(t)], -1)
    obs = truth + r.normal(0, 0.3, truth.shape)
    yaw = r.normal(0, 0.1, (t, 1))
    valid = np.ones(t, bool)

    ref_pos, _, _ = ref_smooth(
        torch.tensor(obs[None], dtype=torch.float32),
        torch.tensor(valid[None]),
        torch.tensor(yaw[None], dtype=torch.float32),
        time_between_frames_s=0.1,
        max_iters=2000,
    )
    our_pos, _, _ = our_smooth(
        jnp.asarray(obs[None], jnp.float32),
        jnp.asarray(valid[None]),
        jnp.asarray(yaw[None], jnp.float32),
        max_iters=2000,
    )
    ref_np = ref_pos.detach().numpy()[0]
    our_np = np.asarray(our_pos)[0]
    # same optimum within optimizer noise; both clearly denoise vs raw obs
    assert np.abs(ref_np - our_np).max() < 0.15, np.abs(ref_np - our_np).max()
    err_ours = np.linalg.norm(our_np[:, :2] - truth[:, :2], axis=-1).mean()
    err_obs = np.linalg.norm(obs[:, :2] - truth[:, :2], axis=-1).mean()
    assert err_ours < err_obs


def test_gaussian_centermap_matches_reference():
    """data/centermaps.render_gaussian_heatmaps vs the reference's
    batched_render_gaussian_kabsch_mask (peak-normalised variant used for
    the centermap targets)."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    from liso.kabsch.kabsch_mask import batched_render_gaussian_kabsch_mask

    from liso_tpu.data.centermaps import render_gaussian_heatmaps
    from liso_tpu.ops.bev import BevSetup, voxel_center_coords
    from liso_tpu.ops.boxes import Boxes

    r = np.random.RandomState(0)
    k = 3
    pos = np.concatenate(
        [r.uniform(-15, 15, (k, 2)), np.zeros((k, 1))], -1
    ).astype(np.float32)
    dims = r.uniform(1.5, 4.5, (k, 3)).astype(np.float32)
    rot = r.uniform(-3, 3, (k, 1)).astype(np.float32)

    bev = BevSetup((40.0, 40.0), (64, 64))
    ref = batched_render_gaussian_kabsch_mask(
        box_x=pos[None, :, 0], box_y=pos[None, :, 1],
        box_len=dims[None, :, 0], box_w=dims[None, :, 1],
        box_theta=rot[None, :, 0],
        bev_range_x=40.0, bev_range_y=40.0, img_shape=(64, 64),
        normalize_gaussian=False,  # the centermap-target variant
    )

    boxes = Boxes(
        pos=jnp.asarray(pos)[None], dims=jnp.asarray(dims)[None],
        rot=jnp.asarray(rot)[None],
        probs=jnp.ones((1, k, 1)), valid=jnp.ones((1, k), bool),
    ).with_defaults()
    ours = render_gaussian_heatmaps(boxes, voxel_center_coords(bev))
    np.testing.assert_allclose(
        np.asarray(ours)[0], np.asarray(ref)[0], rtol=0, atol=2e-4
    )


def test_se3_compose_decompose_matches_reference():
    """ops/transforms vs the reference torch_transformation helpers."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    import torch
    from liso.utils.torch_transformation import (
        torch_compose_matrix, torch_decompose_matrix,
    )

    from liso_tpu.ops.transforms import compose_matrix, decompose_matrix

    r = np.random.RandomState(0)
    tx = r.uniform(-5, 5, (2, 4))  # reference expects [batch, slots]
    ty = r.uniform(-5, 5, (2, 4))
    yaw = r.uniform(-3, 3, (2, 4))

    T_ref = torch_compose_matrix(
        t_x=torch.tensor(tx), t_y=torch.tensor(ty),
        theta_z=torch.tensor(yaw),
    )
    t3 = jnp.stack(
        [jnp.asarray(tx), jnp.asarray(ty), jnp.zeros_like(jnp.asarray(tx))],
        axis=-1,
    )
    T_ours = compose_matrix(t=t3, theta_z=jnp.asarray(yaw))
    np.testing.assert_allclose(
        np.asarray(T_ours), T_ref.numpy(), rtol=0, atol=1e-6
    )
    t_dec, yaw_dec = decompose_matrix(jnp.asarray(np.asarray(T_ours)))
    ref_t, ref_yaw = torch_decompose_matrix(T_ref.to(torch.float64))
    np.testing.assert_allclose(np.asarray(t_dec), ref_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(yaw_dec),
                               ref_yaw.numpy()[..., 0], atol=1e-6)


def test_movavg_threshold_matches_reference():
    """models/slim MovAvg state (fp32-exact EMA via expm1/log1p) vs the
    reference's float64-buffer MovingAverageThreshold on the same update
    stream — same histogram, same optimal threshold."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    import torch
    from liso.slim.slim_loss.movavg_cls_threshold import (
        MovingAverageThreshold,
    )

    from liso_tpu.models.slim import movavg_init, movavg_update, movavg_value

    num_train_samples, num_moving = 10, 50_000
    ref = MovingAverageThreshold(num_train_samples, num_moving,
                                 resolution=1000)
    ours = movavg_init(num_train_samples, num_moving=num_moving,
                       resolution=1000)

    r = np.random.RandomState(0)
    for step in range(5):
        m = 2048
        es = r.uniform(0, 2, m).astype(np.float32)
        ed = r.uniform(0, 2, m).astype(np.float32)
        dyn = r.uniform(0, 1, m).astype(np.float32)
        ref_thr = ref.update(
            torch.tensor(es), torch.tensor(ed), None, torch.tensor(dyn),
            training=True,
        )
        ours = movavg_update(
            ours, jnp.asarray(es), jnp.asarray(ed), jnp.asarray(dyn),
            jnp.ones(m, bool),
        )
        our_thr = float(movavg_value(ours))
        np.testing.assert_allclose(our_thr, float(ref_thr), rtol=0,
                                   atol=2e-5, err_msg=f"step {step}")
    # fp32 EMA vs the reference's float64 buffers: identical to within
    # single-precision accumulation noise
    np.testing.assert_allclose(
        np.asarray(ours.importance),
        ref.moving_average_importance.numpy(),
        rtol=1e-3, atol=1e-8,
    )


def test_box_decode_matches_reference():
    """models/box_decode.decode_box_maps vs the reference's
    box_pred_convention_to_gt_convention for every pos/dims/rot method."""
    import ref_import_shims

    ref_import_shims.install()
    from types import SimpleNamespace as NS

    import jax.numpy as jnp
    import torch
    from liso.kabsch.output_modification import (
        box_pred_convention_to_gt_convention,
    )

    from liso_tpu.models.box_decode import (
        BoxPredictionCfg, decode_box_maps, prediction_grid_centers,
    )
    from liso_tpu.ops.bev import BevSetup

    bev = BevSetup((40.0, 40.0), (16, 16))
    b, h, w = 2, 16, 16
    r = np.random.RandomState(0)

    for pos_m, dims_m, rot_m in (
        ("local_relative_offset", "predict_abs_size", "vector"),
        ("global_relative", "predict_aspect_ratio", "direct"),
        ("local_relative_offset", "predict_log_size", "class_bins"),
    ):
        rot_ch = {"vector": 2, "direct": 1, "class_bins": 36}[rot_m]
        dims_ch = {"predict_abs_size": 3, "predict_aspect_ratio": 2,
                   "predict_log_size": 3}[dims_m]
        # the reference's global_relative path multiplies pos by the 2-dim
        # bev range -> 2 position channels there, 3 for the offset path
        pos_ch = 2 if pos_m == "global_relative" else 3
        act = {  # activated maps (tanh'ed positions etc.)
            "pos": np.tanh(
                r.normal(0, 1, (b, h, w, pos_ch))
            ).astype(np.float32),
            "dims": np.abs(r.normal(1, 0.3, (b, h, w, dims_ch))).astype(
                np.float32
            ),
            "rot": r.normal(0, 1, (b, h, w, rot_ch)).astype(np.float32),
        }

        cfg = BoxPredictionCfg(
            position_method=pos_m, num_box_pos_dims=pos_ch,
            box_z_pos_prior_min=-1.5, box_z_pos_prior_max=-0.5,
            dimensions_method=dims_m, box_len_prior_min=1.0,
            box_len_prior_max=8.0, rotation_method=rot_m,
        )
        ours = decode_box_maps(
            {k: jnp.asarray(v) for k, v in act.items()}, cfg, bev
        )

        ref_cfg = NS(
            position_representation=NS(
                method=pos_m, num_box_pos_dims=pos_ch,
                box_z_pos_prior_min=-1.5, box_z_pos_prior_max=-0.5,
            ),
            dimensions_representation=NS(
                method=dims_m, box_len_prior_min=1.0, box_len_prior_max=8.0,
            ),
            rotation_representation=NS(method=rot_m, norm_vector_len=False),
            activations=NS(pos="tanh", dims="exp"),
        )
        data_cfg = NS(bev_range_m=(40.0, 40.0))
        centers = torch.tensor(prediction_grid_centers(bev, (h, w)))
        ref = box_pred_convention_to_gt_convention(
            {k: torch.tensor(v) for k, v in act.items()},
            ref_cfg, data_cfg, centers,
        )
        for k in ("pos", "dims", "rot"):
            np.testing.assert_allclose(
                np.asarray(ours[k]), ref[k].numpy(), rtol=1e-5, atol=1e-5,
                err_msg=f"{pos_m}/{dims_m}/{rot_m}:{k}",
            )


def test_flow_tracker_matches_reference():
    """tracker/tracker.FlowBasedBoxTracker vs the reference
    global_box_tracker on the same drive with identical flow-propagated
    box poses: identical track partitions and ages."""
    import ref_import_shims

    ref_import_shims.install()
    import torch
    from liso.kabsch.shape_utils import Shape
    from liso.tracker.global_box_tracker import (
        FlowBasedBoxTracker as RefTracker,
    )

    from liso_tpu.tracker.tracker import FlowBasedBoxTracker as OurTracker

    n_t = 6
    ref = RefTracker(use_propagated_boxes=True, box_matching_threshold_m=1.0)
    ours = OurTracker(box_matching_threshold_m=1.0)

    def w_T_sensor(t):
        T = np.eye(4)
        T[0, 3] = 1.0 * t  # ego +1 m/frame in world x
        return T

    def w_T_box(t):
        # two objects moving in WORLD coordinates
        poses = []
        for x0, y0, vx, vy in ((3.0, 2.0, 0.4, 0.0), (-5.0, -1.0, -0.3, 0.2)):
            T = np.eye(4)
            T[0, 3] = x0 + vx * t
            T[1, 3] = y0 + vy * t
            poses.append(T)
        return np.stack(poses)

    for t in range(n_t):
        s_T_w = np.linalg.inv(w_T_sensor(t))
        box_poses_t = s_T_w[None] @ w_T_box(t)
        pos = box_poses_t[:, :3, 3]
        k = len(pos)
        boxes = {
            "pos": pos.astype(np.float32),
            "dims": np.full((k, 3), 2.0, np.float32),
            "rot": np.zeros((k, 1), np.float32),
            "probs": np.full((k, 1), 0.9, np.float32),
            "velo": np.zeros((k, 1), np.float32),
            "valid": np.ones(k, bool),
        }
        # exact flow propagation: box pose at t-1 (t+1) in the t-1 (t+1)
        # sensor frame
        prop_past = np.linalg.inv(w_T_sensor(max(t - 1, 0)))[None] @ w_T_box(
            max(t - 1, 0)
        )
        prop_future = np.linalg.inv(
            w_T_sensor(min(t + 1, n_t - 1))
        )[None] @ w_T_box(min(t + 1, n_t - 1))
        # odometry: sensor(t) pose in sensor(t+1) coords? the reference
        # aggregates sti_T_stii into world poses; both trackers get the
        # same matrix
        odom = np.linalg.inv(w_T_sensor(t + 1)) @ w_T_sensor(t)
        shape = Shape(
            pos=torch.tensor(boxes["pos"]),
            dims=torch.tensor(boxes["dims"]),
            rot=torch.tensor(boxes["rot"]),
            probs=torch.tensor(boxes["probs"]),
            valid=torch.ones(k, dtype=torch.bool),
            velo=torch.tensor(boxes["velo"]),
        )
        ref.update(
            shape,
            torch.tensor(prop_future, dtype=torch.float64),
            torch.tensor(prop_past, dtype=torch.float64),
            torch.tensor(odom, dtype=torch.float64),
            per_box_extra_attributes_tii=[{"i": str(j)} for j in range(k)],
        )
        ours.update(boxes, prop_future, prop_past, odom,
                    per_box_extra=[{"i": str(j)} for j in range(k)])

    ref.run_tracker()
    ours.run_tracker()

    def canonical(ids_per_t):
        """Track ids -> first-appearance canonical labels."""
        mapping = {}
        out = []
        for ids in ids_per_t:
            row = []
            for i in np.asarray(ids).tolist():
                if i not in mapping:
                    mapping[i] = len(mapping)
                row.append(mapping[i])
            out.append(row)
        return out

    ref_ids = canonical([t.numpy() for t in ref.track_ids])
    our_ids = canonical(ours.track_ids)
    assert ref_ids == our_ids, (ref_ids, our_ids)
    # the reference derives ages from id occurrence counts
    # (get_all_unique_track_ids_and_lengths); partitions match, so compare
    # our per-detection ages against the id counts
    all_ref = np.concatenate([t.numpy() for t in ref.track_ids])
    uniq, counts = np.unique(all_ref, return_counts=True)
    lookup = dict(zip(uniq.tolist(), counts.tolist()))
    ref_ages = [
        [lookup[i] for i in t.numpy().tolist()] for t in ref.track_ids
    ]
    our_ages = [np.asarray(a).tolist() for a in ours.track_ages]
    assert ref_ages == our_ages, (ref_ages, our_ages)
    # both see 2 full-length tracks
    assert ref_ages[0] == [n_t, n_t]


def test_flow_tracker_coasting_matches_reference():
    """Same drive but with object B's detection MISSING at t=3: both
    trackers must coast through the gap and keep one identity."""
    import ref_import_shims

    ref_import_shims.install()
    import torch
    from liso.kabsch.shape_utils import Shape
    from liso.tracker.global_box_tracker import (
        FlowBasedBoxTracker as RefTracker,
    )

    from liso_tpu.tracker.tracker import FlowBasedBoxTracker as OurTracker

    n_t = 7
    drop_t = 3
    ref = RefTracker(use_propagated_boxes=True, box_matching_threshold_m=1.0)
    ours = OurTracker(box_matching_threshold_m=1.0)

    def w_T_sensor(t):
        T = np.eye(4)
        T[0, 3] = 1.0 * t
        return T

    def w_T_box(t, keep_all):
        poses = []
        specs = ((3.0, 2.0, 0.4, 0.0), (-5.0, -1.0, -0.3, 0.2))
        for j, (x0, y0, vx, vy) in enumerate(specs):
            if not keep_all and j == 1:
                continue
            T = np.eye(4)
            T[0, 3] = x0 + vx * t
            T[1, 3] = y0 + vy * t
            poses.append(T)
        return np.stack(poses)

    for t in range(n_t):
        keep_all = t != drop_t
        s_T_w = np.linalg.inv(w_T_sensor(t))
        box_poses_t = s_T_w[None] @ w_T_box(t, keep_all)
        pos = box_poses_t[:, :3, 3]
        k = len(pos)
        boxes = {
            "pos": pos.astype(np.float32),
            "dims": np.full((k, 3), 2.0, np.float32),
            "rot": np.zeros((k, 1), np.float32),
            "probs": np.full((k, 1), 0.9, np.float32),
            "velo": np.zeros((k, 1), np.float32),
            "valid": np.ones(k, bool),
        }
        prop_past = np.linalg.inv(w_T_sensor(max(t - 1, 0)))[None] @ w_T_box(
            max(t - 1, 0), keep_all
        )
        prop_future = np.linalg.inv(
            w_T_sensor(min(t + 1, n_t - 1))
        )[None] @ w_T_box(min(t + 1, n_t - 1), keep_all)
        odom = np.linalg.inv(w_T_sensor(t + 1)) @ w_T_sensor(t)
        shape = Shape(
            pos=torch.tensor(boxes["pos"]),
            dims=torch.tensor(boxes["dims"]),
            rot=torch.tensor(boxes["rot"]),
            probs=torch.tensor(boxes["probs"]),
            valid=torch.ones(k, dtype=torch.bool),
            velo=torch.tensor(boxes["velo"]),
        )
        ref.update(
            shape,
            torch.tensor(prop_future, dtype=torch.float64),
            torch.tensor(prop_past, dtype=torch.float64),
            torch.tensor(odom, dtype=torch.float64),
            per_box_extra_attributes_tii=[{"i": str(j)} for j in range(k)],
        )
        ours.update(boxes, prop_future, prop_past, odom,
                    per_box_extra=[{"i": str(j)} for j in range(k)])

    ref.run_tracker()
    ours.run_tracker()

    def canonical(ids_per_t):
        mapping = {}
        out = []
        for ids in ids_per_t:
            row = []
            for i in np.asarray(ids).tolist():
                if i not in mapping:
                    mapping[i] = len(mapping)
                row.append(mapping[i])
            out.append(row)
        return out

    ref_ids = canonical([t.numpy() for t in ref.track_ids])
    our_ids = canonical(ours.track_ids)
    assert ref_ids == our_ids, (ref_ids, our_ids)
    # object B keeps ONE identity across the gap in both trackers
    flat = [row for row in ref_ids]
    b_ids = {row[1] for row in flat if len(row) > 1}
    assert len(b_ids) == 1, ref_ids


def test_focal_heatmap_loss_matches_reference():
    """losses/centerpoint_loss.focal_heatmap_loss vs the reference's
    compute_focal_loss (with and without ignore regions)."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    import torch
    from liso.losses.centerpoint_loss import compute_focal_loss

    from liso_tpu.losses.centerpoint_loss import focal_heatmap_loss

    r = np.random.RandomState(0)
    b, h, w = 2, 16, 16
    logits = r.normal(0, 2, (b, h, w, 1)).astype(np.float32)
    gt_probs = r.uniform(0, 1, (b, h, w, 1)).astype(np.float32)
    center = r.rand(b, h, w) > 0.95
    gt_probs[center] = 1.0
    ignore = r.rand(b, h, w) > 0.9

    for ign in (None, ignore):
        ref = compute_focal_loss(
            torch.tensor(center)[..., None],
            torch.tensor(gt_probs),
            torch.tensor(logits),
            2.0, 0.5,
            None if ign is None else torch.tensor(ign)[..., None],
        )
        ours = focal_heatmap_loss(
            jnp.asarray(logits), jnp.asarray(gt_probs),
            jnp.asarray(center),
            None if ign is None else jnp.asarray(ign),
        )
        np.testing.assert_allclose(
            float(ours), float(ref), rtol=1e-5, atol=1e-6
        )


def test_bev_dynamic_flow_map_matches_reference():
    """models/flow_cluster_detector.bev_dynamicness_and_flow vs the
    reference's get_bev_dynamic_flow_map_from_pcl_flow_and_odom."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    import torch
    from liso.utils.bev_flow_utils import (
        get_bev_dynamic_flow_map_from_pcl_flow_and_odom,
    )

    from liso_tpu.models.flow_cluster_detector import (
        bev_dynamicness_and_flow,
    )
    from liso_tpu.ops.bev import BevSetup, point_cell_ids

    r = np.random.RandomState(0)
    n = 512
    bev = BevSetup((40.0, 40.0), (32, 32))
    pcl = r.uniform(-18, 18, (n, 3)).astype(np.float32)
    valid = r.rand(n) > 0.2
    flow = r.normal(0, 0.4, (n, 3)).astype(np.float32)
    odom = np.eye(4)
    odom[0, 3] = 0.8
    odom[:3, :3] = np.array([
        [np.cos(0.02), -np.sin(0.02), 0],
        [np.sin(0.02), np.cos(0.02), 0],
        [0, 0, 1],
    ])

    cell, _, rc = point_cell_ids(jnp.asarray(pcl[:, :2]), bev,
                                 jnp.asarray(valid))
    dyn_ours, flow_ours = bev_dynamicness_and_flow(
        jnp.asarray(pcl), jnp.asarray(valid), cell, jnp.asarray(flow),
        jnp.asarray(odom, jnp.float32), bev,
    )

    dyn_ref, flow_ref = get_bev_dynamic_flow_map_from_pcl_flow_and_odom(
        pcl_is_valid=torch.tensor(valid)[None],
        pcl=torch.tensor(pcl)[None],
        pillar_coors=torch.tensor(np.asarray(rc))[None],
        point_flow=torch.tensor(flow)[None],
        odom_ta_tb=torch.tensor(odom, dtype=torch.float64)[None],
        target_shape=(32, 32),
        return_nonrigid_bev_flow=True,
    )
    np.testing.assert_allclose(
        np.asarray(dyn_ours), dyn_ref.numpy()[0, ..., 0], rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(flow_ours), flow_ref.numpy()[0], rtol=1e-4, atol=1e-5
    )


def test_points_in_box_mask_matches_reference():
    """ops/boxes.points_in_box_mask vs Shape.get_points_in_box_bool_mask
    (drives the mining min-points filter, z fitting and ROI pooling)."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    import torch
    from liso.kabsch.shape_utils import Shape

    from liso_tpu.ops.boxes import Boxes

    r = np.random.RandomState(0)
    n, k = 2048, 5
    pcl = r.uniform(-20, 20, (n, 3)).astype(np.float32)
    pos = np.concatenate(
        [r.uniform(-15, 15, (k, 2)), r.uniform(-1, 1, (k, 1))], -1
    ).astype(np.float32)
    dims = r.uniform(1.5, 5.0, (k, 3)).astype(np.float32)
    rot = r.uniform(-3, 3, (k, 1)).astype(np.float32)

    shape = Shape(
        pos=torch.tensor(pos), dims=torch.tensor(dims),
        rot=torch.tensor(rot), probs=torch.ones(k, 1),
        valid=torch.ones(k, dtype=torch.bool),
    )
    for bloat in (1.0, 1.2):
        ref_mask = shape.get_points_in_box_bool_mask(
            torch.tensor(pcl), box_dims_bloat_factor=bloat
        )
        boxes = Boxes(
            pos=jnp.asarray(pos), dims=jnp.asarray(dims),
            rot=jnp.asarray(rot), probs=jnp.ones((k, 1)),
            valid=jnp.ones(k, bool),
        ).with_defaults()
        ours = boxes.points_in_box_mask(jnp.asarray(pcl), bloat=bloat)
        ref_np = ref_mask.numpy()
        ours_np = np.asarray(ours)
        assert ref_np.shape == ours_np.shape, (ref_np.shape, ours_np.shape)
        # identical membership except points within fp noise of a face
        disagree = np.flatnonzero((ref_np != ours_np).any(-1))
        assert len(disagree) <= max(1, n // 1000), len(disagree)
        assert ref_np.sum() > 0  # scenario actually covers boxes


def test_corr_block_lookup_matches_reference():
    """build_corr_pyramid + lookup_corr (and the MXU one-hot path) vs the
    reference's CorrBlock (all-pairs matmul pyramid + grid_sample window
    lookup with zero padding) on identical feature maps and coords —
    including out-of-bounds windows at the grid edges."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    import torch
    from liso.slim.model.raft_code.corr import CorrBlock

    from liso_tpu.models.raft import build_corr_pyramid, lookup_corr
    from liso_tpu.ops.corr_lookup_mm import (
        lookup_prepared_mm, prepare_corr_volumes_mm,
    )

    r = np.random.RandomState(0)
    b, h, w, c = 2, 16, 16, 32
    f0 = r.randn(b, h, w, c).astype(np.float32)
    f1 = r.randn(b, h, w, c).astype(np.float32)
    # coords spanning interior AND the edge region (within radius of the
    # border, where the padding semantics show)
    coords_rc = r.uniform(-1.0, h + 1.0, (b, h, w, 2)).astype(np.float32)

    ref_block = CorrBlock(
        torch.tensor(f0).permute(0, 3, 1, 2),
        torch.tensor(f1).permute(0, 3, 1, 2),
        num_levels=4, radius=3,
    )
    # reference coords are (x, y) = (col, row)
    coords_xy = torch.tensor(
        np.stack([coords_rc[..., 1], coords_rc[..., 0]], axis=1)
    )
    ref_out = ref_block(coords_xy).permute(0, 2, 3, 1).numpy()

    pyr = build_corr_pyramid(jnp.asarray(f0), jnp.asarray(f1), num_levels=4)
    ours_gather = np.asarray(lookup_corr(pyr, jnp.asarray(coords_rc), 3))
    ours_mm = np.asarray(
        lookup_prepared_mm(
            prepare_corr_volumes_mm(pyr), jnp.asarray(coords_rc), 3
        )
    )

    # tap ordering: reference windows iterate (dy, dx) like ours (row, col)
    np.testing.assert_allclose(ours_gather, ref_out, rtol=1e-4, atol=1e-4)
    # the bf16 one-hot path quantizes the volume
    np.testing.assert_allclose(ours_mm, ref_out, rtol=2e-2, atol=2e-2)


def test_upsample_matches_reference_interpolate():
    """models/raft.upsample_bilinear (interpolation matmuls) vs the
    reference's F.interpolate(..., align_corners=True) used by upflow_n."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from liso_tpu.models.raft import upsample_bilinear

    r = np.random.RandomState(0)
    x = r.randn(2, 6, 9, 3).astype(np.float32)
    ref = F.interpolate(
        torch.tensor(x).permute(0, 3, 1, 2), scale_factor=8,
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(upsample_bilinear(jnp.asarray(x), 8))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_poly_warmup_schedule_matches_reference():
    """utils/schedules.polynomial_decay_with_warmup vs the reference's
    torch LambdaLR schedule over the whole training range."""
    import ref_import_shims

    ref_import_shims.install()
    import torch
    from liso.utils.learning_rate import (
        get_polynomial_decay_schedule_with_warmup,
    )

    from liso_tpu.utils.schedules import polynomial_decay_with_warmup

    lr0, warm, total = 1e-4, 2000, 150_000
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    sched = get_polynomial_decay_schedule_with_warmup(
        opt, warm, total, lr_end=lr0 * 0.05
    )
    ours = polynomial_decay_with_warmup(lr0, warm, total,
                                        lr_end_factor=0.05)
    for step in (0, 1, 500, 2000, 2001, 75_000, 149_999, 150_000):
        ref_lr = lr0 * sched.lr_lambdas[0](step)
        np.testing.assert_allclose(
            float(ours(step)), ref_lr, rtol=1e-5, atol=1e-12,
            err_msg=f"step {step}",
        )


def test_small_encoder_weight_conversion_matches_reference():
    """SmallEncoder(torch_compat=True) loaded with a converted reference
    torch SmallEncoder checkpoint produces the same features — validates
    conv/norm conventions, the torch-aligned strided padding, and the
    dummy_in_filters downsample quirk."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    import torch
    from liso.slim.model.extractor import SmallEncoder as RefEncoder

    from liso_tpu.models.raft import SmallEncoder

    torch.manual_seed(0)
    ref = RefEncoder(output_dim=128, norm_fn="instance_affine").eval()

    def conv(w, b=None):
        out = {"kernel": jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))}
        if b is not None:
            out["bias"] = jnp.asarray(b.detach().numpy())
        return out

    def norm(m):
        return {"scale": jnp.asarray(m.weight.detach().numpy()),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    def block(rb):
        p = {
            "conv1": conv(rb.conv1.weight, rb.conv1.bias),
            "conv2": conv(rb.conv2.weight, rb.conv2.bias),
            "norm1": norm(rb.norm1),
            "norm2": norm(rb.norm2),
        }
        if rb.downsample is not None:
            p["down"] = conv(rb.downsample[0].weight, rb.downsample[0].bias)
            p["norm3"] = norm(rb.norm3)
        return p

    params = {
        "conv1": conv(ref.conv1.weight, ref.conv1.bias),
        "norm1": norm(ref.norm1),
        "layer1a": block(ref.layer1[0]),
        "layer1b": block(ref.layer1[1]),
        "layer2a": block(ref.layer2[0]),
        "layer2b": block(ref.layer2[1]),
        "layer3a": block(ref.layer3[0]),
        "layer3b": block(ref.layer3[1]),
        "conv2": conv(ref.conv2.weight, ref.conv2.bias),
    }

    r = np.random.RandomState(0)
    x = r.randn(2, 32, 48, 64).astype(np.float32)  # NHWC, 64 input ch
    with torch.no_grad():
        want = (
            ref(torch.tensor(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    enc = SmallEncoder(output_dim=128, torch_compat=True)
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_conv_gru_fused_gates_match_reference():
    """Our ConvGRU fuses convz+convr into one conv (concatenated output
    channels) — converting the reference's separate gate weights must
    reproduce its hidden state exactly."""
    import ref_import_shims

    ref_import_shims.install()
    import jax.numpy as jnp
    import torch
    from liso.slim.model.update import ConvGRU as RefGRU

    from liso_tpu.models.raft import ConvGRU

    torch.manual_seed(0)
    hidden, inp_dim = 96, 80
    ref = RefGRU(hidden_dim=hidden, input_dim=hidden + inp_dim).eval()

    def conv(w, b):
        return {"kernel": jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b.detach().numpy())}

    z = conv(ref.convz.weight, ref.convz.bias)
    rr = conv(ref.convr.weight, ref.convr.bias)
    params = {
        "convzr": {
            "kernel": jnp.concatenate([z["kernel"], rr["kernel"]], axis=-1),
            "bias": jnp.concatenate([z["bias"], rr["bias"]]),
        },
        "convq": conv(ref.convq.weight, ref.convq.bias),
    }

    r = np.random.RandomState(0)
    h = r.randn(2, 12, 16, hidden).astype(np.float32)
    x = r.randn(2, 12, 16, inp_dim).astype(np.float32)
    with torch.no_grad():
        want = (
            ref(torch.tensor(h).permute(0, 3, 1, 2),
                torch.tensor(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1).numpy()
        )
    gru = ConvGRU(hidden_dim=hidden)
    got = np.asarray(
        gru.apply({"params": params}, jnp.asarray(h), jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _ref_update_cfg():
    """Minimal cfg namespace for the reference SmallUpdateBlock/RAFT loop
    (the liso preset: predict_logits=True, static-aggregation weight on)."""
    from types import SimpleNamespace as NS

    return NS(
        model=NS(
            corr_cfg=NS(num_levels=4, search_radius=3),
            predict_weight_for_static_aggregation="sigmoid",
            flow_maps_archi="single",
        )
    )


def test_full_raft_checkpoint_conversion_replays_reference():
    """THE full-stack portability check (VERDICT r2 item 3): a complete
    reference RAFT state_dict (fnet + cnet + update_block) converted by
    models/torch_compat.convert_raft_state_dict reproduces the reference's
    per-iteration upsampled flow/logits/weight outputs end to end —
    reference loop semantics from raft_mod.py:124-259 driven by the
    reference's own CorrBlock/initialize_flow/upflow_n on torch-cpu."""
    import ref_import_shims

    ref_import_shims.install()
    import jax
    import jax.numpy as jnp
    import torch
    from liso.slim.model.extractor import SmallEncoder as RefEncoder
    from liso.slim.model.raft_code.corr import CorrBlock
    from liso.slim.model.raft_code.utils import (
        initialize_flow, upflow_n, uplogits_n,
    )
    from liso.slim.model.update import SmallUpdateBlock as RefUpdateBlock

    def change_flow_convention_from_raft2usfl(flow, resolution_adapter):
        # raft_mod.py:262-266 (not imported: raft_mod pulls in mmcv via the
        # pillar wrapper): (x, y) RAFT flow -> (row, col) meters
        return torch.flip(flow, dims=[1]) * resolution_adapter

    from liso_tpu.models.raft import RAFT
    from liso_tpu.models.torch_compat import convert_raft_state_dict

    torch.manual_seed(0)
    hdim, cdim = 96, 64
    fnet = RefEncoder(output_dim=128, norm_fn="instance_affine").eval()
    cnet = RefEncoder(output_dim=hdim + cdim, norm_fn="none").eval()
    update = RefUpdateBlock(cfg=_ref_update_cfg(), filters=hdim).eval()
    # the flow head's default init gives near-zero-mean deltas; scale it up
    # so iterations actually move the lookup coords (stresses the corr path)
    with torch.no_grad():
        update.static_flow_head.conv2.weight.mul_(20.0)

    grid, batch, iters = 128, 2, 6
    res_m = 0.2  # meters per full-res pixel
    r = np.random.RandomState(1)
    img = r.randn(batch, 64, grid, grid).astype(np.float32)
    img_t = torch.tensor(img)

    # --- reference forward (raft_mod.py:124-259 semantics) ---------------
    with torch.no_grad():
        fmap0, fmap1 = fnet(img_t), fnet(img_t * 0.5 + 0.1)
        corr_block = CorrBlock(fmap0, fmap1, num_levels=4, radius=3)
        cn = cnet(img_t)
        net, inp = torch.split(cn, [hdim, cdim], dim=1)
        net, inp = torch.tanh(net), torch.relu(inp)
        coords0 = initialize_flow(img_t, downscale_factor=8)
        coords1 = initialize_flow(img_t, downscale_factor=8)
        b, _, hc, wc = coords0.shape
        logits = torch.zeros((b, 4, hc, wc))
        wlog = torch.zeros((b, 1, hc, wc))
        res_adapter = torch.tensor([res_m * 8 / 8.0, res_m * 8 / 8.0])[
            None, :, None, None
        ]  # meters per FINAL-SCALE pixel (final_scale=1 -> res_m)
        want = []
        for _ in range(iters):
            corr = corr_block(coords1)
            flow = coords1 - coords0
            net, dflow, dlogits, dw = update(net, inp, corr, flow, logits, wlog)
            coords1 = coords1 + dflow
            logits = logits + dlogits
            wlog = wlog + dw
            up_flow = change_flow_convention_from_raft2usfl(
                upflow_n(coords1 - coords0, n=8), res_adapter
            )
            want.append(
                (
                    uplogits_n(logits, n=8).permute(0, 2, 3, 1).numpy(),
                    up_flow.permute(0, 2, 3, 1).numpy(),
                    uplogits_n(wlog, n=8).permute(0, 2, 3, 1).numpy(),
                )
            )

    # --- converted flax forward ------------------------------------------
    sd = {}
    for mod, pfx in ((fnet, "fnet."), (cnet, "cnet."), (update, "update_block.")):
        for k, v in mod.state_dict().items():
            sd[pfx + k] = v.numpy()
    params = convert_raft_state_dict(sd)

    raft = RAFT(
        num_iters=iters,
        joint_encoders=False,
        torch_compat=True,
        predict_logits=True,
        predict_weight_for_static_aggregation=True,
        resolution_m=res_m,
    )
    out = jax.jit(
        lambda p, a, b_: raft.apply(p, a, b_)
    )({"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)),
      jnp.asarray((img * 0.5 + 0.1).transpose(0, 2, 3, 1)))
    out = np.asarray(out)  # [iters, B, H, W, 9]

    assert out.shape == (iters, batch, grid, grid, 9)
    for it in range(iters):
        ref_logits, ref_flow, ref_wlog = want[it]
        np.testing.assert_allclose(
            out[it, ..., :4], ref_logits, rtol=1e-3, atol=2e-3,
            err_msg=f"logits iter {it}",
        )
        np.testing.assert_allclose(
            out[it, ..., 4:6], ref_flow, rtol=1e-3, atol=2e-3,
            err_msg=f"flow iter {it}",
        )
        # static and dynamic flow are the same tensor at the RAFT boundary
        np.testing.assert_allclose(out[it, ..., 6:8], out[it, ..., 4:6])
        np.testing.assert_allclose(
            out[it, ..., 8:9], ref_wlog, rtol=1e-3, atol=2e-3,
            err_msg=f"weight logits iter {it}",
        )


def test_nuscenes_devkit_cross_check(tmp_path):
    """Run the OFFICIAL vendored nuScenes devkit (accumulate/calc_ap/
    calc_tp/DetectionMetrics, exactly as liso/eval/
    nuscenes_metrics_wrapper.py:71-166 drives it with its custom
    movable-only config) on random GT/pred boxes, and pin our
    eval/nuscenes_wrapper.py mAP, NDS, and all five TP errors against it."""
    import ref_import_shims

    ref_import_shims.install_nuscenes_devkit()
    from nuscenes.eval.common.data_classes import EvalBoxes
    from nuscenes.eval.common.utils import center_distance
    from nuscenes.eval.detection.algo import accumulate, calc_ap, calc_tp
    from nuscenes.eval.detection.constants import TP_METRICS
    from nuscenes.eval.detection.data_classes import (
        DetectionBox, DetectionMetrics,
    )

    from liso_tpu.eval.nuscenes_wrapper import (
        NuscenesObjectDetectionMetrics, _yaw_to_quat_wxyz,
    )

    class _Cfg:  # nuscenes_metrics_wrapper.py:107-115 custom config
        class_range = {"movable": 50}
        class_names = ["movable"]
        dist_ths = [0.5, 1.0, 2.0, 4.0]
        dist_th_tp = 2.0
        min_recall = 0.1
        min_precision = 0.1
        mean_ap_weight = 5

        def serialize(self):
            return {}

    def to_devkit(b, token, is_gt):
        quats = _yaw_to_quat_wxyz(np.asarray(b["rot"])[:, 0])
        out = []
        for i in range(len(b["pos"])):
            kw = {}
            if not is_gt:
                kw["detection_score"] = float(b["probs"][i, 0])
            out.append(
                DetectionBox(
                    sample_token=token,
                    translation=tuple(float(x) for x in b["pos"][i]),
                    size=tuple(float(x) for x in b["dims"][i]),
                    rotation=tuple(float(x) for x in quats[i]),
                    velocity=(0.0, 0.0),
                    detection_name="movable",
                    num_pts=-1,
                    **kw,
                )
            )
        return out

    ours = NuscenesObjectDetectionMetrics(eval_movable_classes_as_one=True)
    gt_eb, pred_eb = EvalBoxes(), EvalBoxes()
    r = np.random.RandomState(7)
    for s in range(4):
        g = _boxes(6, 10 + s)
        p = _noisy(g, 200 + s, extra=4)
        # duplicate scores to exercise the devkit's tie-break ordering
        p["probs"][1::3] = p["probs"][0]
        g.pop("velo")  # reference protocol: velocity (0,0) on both sides
        p.pop("velo")
        tok = f"tok{s}"
        ours.update(g, p, sample_token=tok)
        gt_eb.add_boxes(sample_token=tok, boxes=to_devkit(g, tok, True))
        pred_eb.add_boxes(sample_token=tok, boxes=to_devkit(p, tok, False))

    cfg = _Cfg()
    metrics = DetectionMetrics(cfg)
    for th in cfg.dist_ths:
        md = accumulate(
            gt_eb, pred_eb, "movable", center_distance, th, {}, verbose=False
        )
        metrics.add_label_ap("movable", th, calc_ap(md, 0.1, 0.1))
        if th == cfg.dist_th_tp:
            for m in TP_METRICS:
                metrics.add_label_tp("movable", m, calc_tp(md, 0.1, m))

    ref = metrics.serialize()
    our = ours.compute()
    np.testing.assert_allclose(our["nusc/mAP"], ref["mean_ap"], atol=1e-12)
    np.testing.assert_allclose(our["nusc/NDS"], ref["nd_score"], atol=1e-12)
    for ref_name, our_name in (
        ("trans_err", "mATE"), ("scale_err", "mASE"), ("orient_err", "mAOE"),
        ("vel_err", "mAVE"), ("attr_err", "mAAE"),
    ):
        np.testing.assert_allclose(
            our[f"nusc/{our_name}"], ref["tp_errors"][ref_name], atol=1e-12,
            err_msg=our_name,
        )
    for th in cfg.dist_ths:
        np.testing.assert_allclose(
            our[f"nusc/AP_movable_overall_dist@{th}"],
            ref["label_aps"]["movable"][th], atol=1e-12,
        )


def test_onecycle_schedule_matches_torch_reference():
    """utils/schedules.onecycle vs torch OneCycleLR with the reference's
    mined-mode hyperparameters (liso_cli.py:806-820: pct_start 0.4,
    div_factor 10, final_div_factor 10, cosine annealing)."""
    import torch

    from liso_tpu.utils.schedules import onecycle

    max_lr, total = 1e-3, 502  # steps_per_round 250 x drop 2 + 2
    sched = onecycle(max_lr, total)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=max_lr)
    ref = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=total, pct_start=0.4,
        div_factor=10.0, final_div_factor=10.0,
    )
    ours, theirs = [], []
    for step in range(total):
        ours.append(float(sched(step)))
        theirs.append(ref.get_last_lr()[0])
        opt.step()
        ref.step()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-9)
