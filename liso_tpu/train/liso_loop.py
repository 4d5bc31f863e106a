"""LISO self-training rounds orchestration.

Behavioral reference: liso/kabsch/liso_cli.py:58-723 (main loop). Every
`steps_per_round` steps (and at step 0) the current detector — round 0: the
flow-cluster bootstrap — re-mines the box DB and augmentation DB over whole
drive sequences, the train dataset is rebuilt with the new DBs, and the
network + optimizer are optionally reset (drop_net_weights_every_nth_round,
liso_cli.py:166-178,687-696). Training itself is the jitted centermap-loss
detector step on mined + copy-pasted boxes.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from liso_tpu.data.augmentation import BoxAugmCfg, paste_boxes_into_sample
from liso_tpu.data.dataset import DataCfg, LidarDataset, pad_to
from liso_tpu.data.pipeline import Prefetcher
from liso_tpu.eval.run_val import mined_db_predictor, run_val
from liso_tpu.models.box_decode import BoxPredictionCfg
from liso_tpu.models.flow_cluster_detector import (
    FlowClusterCfg,
    detect_boxes_from_flow,
)
from liso_tpu.ops.bev import point_cell_ids
from liso_tpu.ops.boxes import Boxes
from liso_tpu.tracker.dbs import (
    save_augm_db,
    save_mined_boxes_db,
    shrink_augm_db,
)
from liso_tpu.tracker.mining import (
    Frame,
    MiningCfg,
    mine_sequence,
    union_proposals,
)
from liso_tpu.train.detector_train import DetectorTrainer
from liso_tpu.utils.tb import TBFactory


def frames_from_dataset(dataset: LidarDataset, idxs: List[int]) -> List[Frame]:
    frames = []
    # mining ALWAYS uses consecutive keys (t0->t1) and NO global geometric
    # augmentation: the reference mines with fixed time_delta on raw
    # samples, while __getitem__ applies the random skip-frame curriculum
    # (use_skip_frames="both") plus SE(2) jitter intended only for detector
    # training — mixing 0.1 s / 0.2 s pairs frame-by-frame corrupts
    # flow/odometry consistency along the mined sequence.
    saved_augm = dataset.augmentation
    dataset.augmentation = None
    # fixed capacity: every frame pads to n_max so the jitted per-frame
    # mining programs (_mine_frame_device, the bootstrap flow-cluster
    # detect) compile ONCE — variable-length clouds recompile per frame,
    # which costs ~40 s/frame through the TPU tunnel
    n_max = int(dataset.cfg.n_max)
    try:
        for i in idxs:
            s = dataset.get_pair(i, "t0", "t1")
            v = s.frame_t0.valid
            pcl, pvalid = pad_to(s.frame_t0.pcl[v], n_max)
            flow, _ = pad_to(s.flow_t0_t1[v], n_max)
            rows, _ = pad_to(s.frame_t0.rows[v], n_max)
            frames.append(
                Frame(
                    sample_id=s.sample_id,
                    pcl=pcl,
                    valid=pvalid,
                    flow=flow,
                    odom_ta_tb=np.asarray(s.odom_t0_t1, np.float64),
                    lidar_rows=rows,
                )
            )
    finally:
        dataset.augmentation = saved_augm
    return frames


def _pad_frame_points(frame: Frame, n_max: int):
    """Pad a mining Frame's cloud to n_max, preserving its own validity
    mask (frames_from_dataset already pads — padding rows must stay
    invalid; manually built Frames may be compact)."""
    pts, fresh = pad_to(frame.pcl, n_max)
    vals, _ = pad_to(frame.valid, n_max)
    return pts, vals.astype(bool) & fresh


def _to_plain(cfg_node):
    """Config/OmegaConf-ish tree -> plain dict for yaml dumps."""
    if hasattr(cfg_node, "items"):
        return {k: _to_plain(v) for k, v in cfg_node.items()}
    if isinstance(cfg_node, (list, tuple)):
        return [_to_plain(v) for v in cfg_node]
    return cfg_node


class LisoSelfTraining:
    def __init__(
        self,
        cfg,  # Config tree (liso_config.yml semantics)
        train_dataset_factory: Callable[[Optional[dict]], LidarDataset],
        val_dataset: Optional[LidarDataset],
        log_dir,
        data_cfg: DataCfg,
        world_size: int = 1,
        worker_id: int = 0,
    ):
        """world_size/worker_id > (1, 0): multi-host mode — every host runs
        the same rounds loop (replicated training), but mining shards
        sequences by `seq_idx % world_size == worker_id` and the per-worker
        DBs are merged through the shared log_dir (SURVEY §2.9: sequences
        are independent, DB aggregation is a host-side gather)."""
        assert 0 <= worker_id < world_size, (worker_id, world_size)
        self.world_size = int(world_size)
        self.worker_id = int(worker_id)
        self.cfg = cfg
        self.data_cfg = data_cfg
        self.bev = data_cfg.bev
        self.train_dataset_factory = train_dataset_factory
        self.val_dataset = val_dataset
        self.log_dir = Path(log_dir)
        self.tb = TBFactory(self.log_dir / "tb")
        # config text summary (reference logs the merged config as TB text)
        try:
            import yaml

            self.tb("train").add_text(
                "config", "```\n" + yaml.safe_dump(_to_plain(cfg)) + "\n```", 0
            )
        except Exception:
            pass

        tc = cfg.data.tracking_cfg
        self.mining_cfg_bootstrap = MiningCfg(
            min_track_age=int(tc.min_track_age),
            track_confidence_threshold=float(
                cfg.optimization.rounds.confidence_threshold_mined_boxes
            ),
            min_points_in_box=int(tc.min_points_in_box),
            box_matching_threshold_m=float(tc.track_matching_threshold_m),
            min_track_obj_speed_mps=float(
                tc.flow_cluster_detector_min_obj_speed_mps
            ),
            flow_cluster_min_travel_dist_m=float(
                tc.flow_cluster_detector_min_travel_dist_filter_m
            ),
            is_flow_cluster_detector=True,
            dims_quantile=0.95,
            fit_rot=bool(tc.fit_box_to_points.fit_rot),
            fit_pos=bool(tc.fit_box_to_points.fit_pos),
        )
        self.mining_cfg_detector = self.mining_cfg_bootstrap._replace(
            is_flow_cluster_detector=False,
            align_yaw_with_motion=bool(tc.align_predicted_boxes_using_flow),
            dims_quantile=0.6,
        )

        bp = cfg.box_prediction
        self.box_cfg = BoxPredictionCfg(
            position_method=bp.position_representation.method,
            num_box_pos_dims=int(bp.position_representation.num_box_pos_dims),
            box_z_pos_prior_min=float(bp.position_representation.box_z_pos_prior_min),
            box_z_pos_prior_max=float(bp.position_representation.box_z_pos_prior_max),
            dimensions_method=bp.dimensions_representation.method,
            box_len_prior_min=float(bp.dimensions_representation.box_len_prior_min),
            box_len_prior_max=float(bp.dimensions_representation.box_len_prior_max),
            rotation_method=bp.rotation_representation.method,
            activations=dict(bp.activations),
        )
        self.trainer = self._make_trainer()
        self.state = None
        self.round_idx = 0
        self.mined_db: Optional[dict] = None
        self.augm_db: Optional[dict] = None
        self._augm_db_final: Optional[dict] = None
        self.rng = np.random.RandomState(int(cfg.seed))
        self.box_augm_cfg = BoxAugmCfg(
            max_num_objs=int(cfg.data.augmentation.boxes.max_num_objs),
            use_raydrop_augm=bool(cfg.data.augmentation.boxes.use_raydrop_augm),
            max_scale_delta=float(cfg.data.augmentation.boxes.max_scale_delta),
        )

    def _make_trainer(self):
        opt = self.cfg.optimization
        # OneCycle spans the FULL reset period — steps_per_round x
        # drop_net_weights_every_nth_round (+2) — so rounds between weight
        # resets continue at a meaningful LR (min = max_lr/100), exactly
        # like the reference (liso_cli.py:806-820 get_optimizer_scheduler,
        # mined mode). Sizing it to one round starves every non-reset
        # round at ~0 LR and the self-training signal dies.
        if opt.rounds.active:
            drop = max(int(opt.rounds.drop_net_weights_every_nth_round), 1)
            steps = int(opt.rounds.steps_per_round) * drop + 2
        else:
            steps = int(opt.num_training_steps) + 2
        if self.cfg.network.name == "pointpillars":
            from liso_tpu.train.pointpillars_train import PointPillarsTrainer

            return PointPillarsTrainer(
                self.bev,
                max_lr=float(opt.learning_rate),
                total_steps=steps,
                nms_iou_threshold=float(self.cfg.nms_iou_threshold),
                post_max_boxes=int(
                    self.cfg.data.tracking_cfg.max_num_boxes_after_nms
                ),
                confidence_threshold=float(
                    opt.rounds.confidence_threshold_mined_boxes
                ),
            )
        if self.cfg.network.name == "pointrcnn":
            from liso_tpu.train.pointrcnn_train import PointRCNNTrainer

            return PointRCNNTrainer(
                self.bev,
                max_lr=float(opt.learning_rate),
                total_steps=steps,
                nms_iou_threshold=float(self.cfg.nms_iou_threshold),
                post_max_boxes=int(
                    self.cfg.data.tracking_cfg.max_num_boxes_after_nms
                ),
                confidence_threshold=float(
                    opt.rounds.confidence_threshold_mined_boxes
                ),
            )
        return DetectorTrainer(
            self.bev,
            network=self.cfg.network.name,
            box_cfg=self.box_cfg,
            max_lr=float(opt.learning_rate),
            total_steps=steps,
            nms_iou_threshold=float(self.cfg.nms_iou_threshold),
            post_max_boxes=int(
                self.cfg.data.tracking_cfg.max_num_boxes_after_nms
            ),
            confidence_threshold=float(
                self.cfg.optimization.rounds.confidence_threshold_mined_boxes
            ),
            use_baseline_parameters=bool(
                self.cfg.network.centerpoint.use_baseline_parameters
            ),
        )

    # ------------------------------------------------------------------
    def _bootstrap_detect_fn(self):
        # cached: proposal-union mining calls this every round, and the
        # jitted flow-cluster program is identical across rounds
        cached = getattr(self, "_fc_detect_cached", None)
        if cached is not None:
            return cached
        bev = self.bev
        fc_cfg = FlowClusterCfg(
            min_residual_flow_thresh_mps=1.0,
            k_max=int(self.cfg.data.tracking_cfg.max_num_boxes_after_nms),
        )

        # one jitted program per frame (point_cell_ids ran eagerly before:
        # each eager op is a separate ~30 ms RPC through the TPU tunnel)
        @jax.jit
        def _detect_jit(pcl, valid, flow, odom, td):
            cell, _, _ = point_cell_ids(pcl[:, :2], bev, valid)
            return detect_boxes_from_flow(
                pcl, valid, cell, flow, odom, pcl, valid, td, bev, fc_cfg
            )

        def detect(frame: Frame) -> Boxes:
            return _detect_jit(
                jnp.asarray(frame.pcl),
                jnp.asarray(frame.valid),
                jnp.asarray(frame.flow),
                jnp.asarray(frame.odom_ta_tb, jnp.float32),
                jnp.asarray(self.data_cfg.time_delta_s),
            )

        self._fc_detect_cached = detect
        return detect

    def _detector_detect_fn(self):
        trainer, state = self.trainer, self.state
        n_max = self.data_cfg.n_max

        def detect(frame: Frame) -> Boxes:
            pts, valid = _pad_frame_points(frame, n_max)
            boxes = trainer.predict_step(
                state, jnp.asarray(pts)[None], jnp.asarray(valid)[None]
            )
            return jax.tree.map(lambda x: x[0], boxes)

        return detect

    def _detector_detect_batch_fn(self, batch_size: int = 8):
        """Chunked mining inference: stack `batch_size` frames per
        predict_step dispatch (the last chunk pads by repeating its final
        frame so predict_step keeps ONE compiled shape). The reference mines
        at batch 1 per frame (tracking.py:639 DataLoader(batch_size=1)); on
        TPU the ~30 ms dispatch round-trip dominates a batch-1 detect, so
        batching frames is a near-linear mining speedup."""
        trainer, state = self.trainer, self.state
        n_max = self.data_cfg.n_max

        def detect_many(frames) -> list:
            out = []
            for i in range(0, len(frames), batch_size):
                chunk = frames[i : i + batch_size]
                n_real = len(chunk)
                while len(chunk) < batch_size:  # pad to the compiled shape
                    chunk = list(chunk) + [chunk[-1]]
                padded = [_pad_frame_points(f, n_max) for f in chunk]
                pts = jnp.asarray(np.stack([p for p, _ in padded]))
                valid = jnp.asarray(np.stack([v for _, v in padded]))
                boxes = trainer.predict_step(state, pts, valid)
                boxes = jax.device_get(boxes)
                out.extend(
                    jax.tree.map(lambda x: x[j], boxes) for j in range(n_real)
                )
            return out

        return detect_many

    # ------------------------------------------------------------------
    def mine(
        self, dataset: LidarDataset, world_size: Optional[int] = None,
        worker_id: Optional[int] = None, gather: bool = True,
    ) -> None:
        """liso_cli.py:180-272 mining trigger. Sequences are independent, so
        multi-host mining shards them by `seq_idx % world_size == worker_id`
        (the reference's embarrassingly-parallel job sharding, SURVEY §2.9);
        per-worker DBs are saved under the shared log_dir and merged by dict
        union / array concat once every worker's marker file appears.
        gather=False publishes this worker's shard without waiting for
        peers (the standalone mining CLI's offline-merge mode)."""
        world_size = self.world_size if world_size is None else world_size
        worker_id = self.worker_id if worker_id is None else worker_id
        t0 = time.time()
        bootstrap = self.round_idx == 0 or self.state is None
        detect_fn = (
            self._bootstrap_detect_fn()
            if bootstrap
            else self._detector_detect_fn()
        )
        detect_batch_fn = None if bootstrap else self._detector_detect_batch_fn()
        mcfg = (
            self.mining_cfg_bootstrap
            if self.round_idx == 0
            else self.mining_cfg_detector
        )
        union_on = bool(
            getattr(
                self.cfg.optimization.rounds, "mine_proposal_union", False
            )
        )
        if not bootstrap and union_on:
            # union flow-cluster proposals back into detector-mode mining
            # (see tracker/mining.union_proposals for the rationale)
            fc_detect = self._bootstrap_detect_fn()
            det_detect = detect_fn
            det_batch = detect_batch_fn
            thresh = float(
                self.cfg.data.tracking_cfg.track_matching_threshold_m
            )

            def detect_fn(frame):  # noqa: F811 — deliberate rebind
                return union_proposals(
                    det_detect(frame), fc_detect(frame), thresh
                )

            def detect_batch_fn(frames):  # noqa: F811
                prim = det_batch(frames)
                return [
                    union_proposals(p, fc_detect(f), thresh)
                    for p, f in zip(prim, frames)
                ]

        # reference stop conditions (tracking.py:594): keep consuming
        # sequences until enough tracks were mined or the timeout fires;
        # both unset => mine every sequence (the reference's default, where
        # min_num_boxes falls back to uint64 max, tracking.py:522-523)
        tc = self.cfg.data.tracking_cfg
        min_num_boxes = getattr(tc, "min_num_boxes", None)
        min_num_boxes = (
            float("inf") if min_num_boxes in (None, "None") else int(min_num_boxes)
        )
        timeout_s = getattr(tc, "timeout_s", None)
        timeout_at = (
            t0 + float(timeout_s)
            if timeout_s not in (None, "None")
            else float("inf")
        )
        mined: Dict[str, dict] = {}
        augm = None
        n_seqs = 0
        num_successful_tracks = 0
        sequences = [
            s
            for i, s in enumerate(self._sequences(dataset))
            if i % world_size == worker_id
        ]
        for seq in sequences:
            if num_successful_tracks >= min_num_boxes:
                print(
                    f"mining: reached min_num_boxes={min_num_boxes} after "
                    f"{n_seqs} sequences — stopping early"
                )
                break
            if time.time() > timeout_at:
                print(f"mining: timeout after {timeout_s}s — stopping early")
                break
            frames = frames_from_dataset(dataset, seq)
            result = mine_sequence(
                frames, detect_fn, mcfg, self.bev,
                detect_batch_fn=detect_batch_fn,
            )
            mined.update(result["mined_db"])
            num_successful_tracks += int(result["num_tracks"])
            if augm is None:
                augm = result["augm_db"]
            else:
                for k in augm:
                    augm[k].extend(result["augm_db"][k])
            n_seqs += 1
        if augm is None:
            # empty worker shard (fewer sequences than workers): degrade to
            # an empty DB so multi-host mining merges cleanly
            from liso_tpu.tracker.dbs import empty_augm_db

            augm = empty_augm_db()
        augm = shrink_augm_db(
            augm, float(self.cfg.data.tracking_cfg.max_augm_db_size_mb)
        )
        out = self.log_dir / f"mined_round_{self.round_idx}"
        if world_size > 1:
            # publish this worker's shard, then gather all workers' shards
            # through the shared log_dir (the marker file is written after
            # both DB files are flushed, so readers never see half-written
            # npz; reference analogue: the embarrassingly-parallel
            # --world_size job sharding, slim/experiment.py:331-353)
            from liso_tpu.tracker.dbs import finalize_augm_db

            save_mined_boxes_db(mined, out / f"tracked_worker{worker_id}")
            save_augm_db(augm, out / f"augm_db_worker{worker_id}")
            (out / f".done_worker{worker_id}").touch()
            if gather:
                mined, augm_final = self._gather_worker_dbs(out, world_size)
                self.mined_db = mined
                self.augm_db = None
                self._augm_db_final = augm_final
                if worker_id == 0:  # canonical merged DBs for resume/eval
                    save_mined_boxes_db(mined, out / "tracked")
                    out.mkdir(parents=True, exist_ok=True)
                    np.save(
                        out / "augm_db.npy", augm_final, allow_pickle=True
                    )
            else:  # offline-merge mode: keep only this worker's shard
                self.mined_db, self.augm_db = mined, augm
                self._augm_db_final = None
        else:
            self.mined_db, self.augm_db = mined, augm
            self._augm_db_final = None  # invalidate the stacked cache
            save_mined_boxes_db(mined, out / "tracked")
            save_augm_db(augm, out / "augm_db")
        # config + box-stats dumps next to the DBs (tracking.py:1938-1950)
        import yaml

        out.mkdir(parents=True, exist_ok=True)
        with open(out / "tracking_cfg.yaml", "w") as f:
            yaml.safe_dump(
                _to_plain(self.cfg.data.tracking_cfg), f, sort_keys=False
            )
        confs = np.concatenate(
            [
                np.asarray(v["raw_box"]["probs"]).reshape(-1)
                for v in mined.values()
                if len(v.get("track_id", ()))
            ]
            or [np.zeros(0, np.float32)]
        )
        stats = {
            "num_boxes": int(confs.size),
            "conf_mean": float(confs.mean()) if confs.size else 0.0,
            "conf_min": float(confs.min()) if confs.size else 0.0,
            "conf_max": float(confs.max()) if confs.size else 0.0,
        }
        with open(out / "tracked_box_stats.yaml", "w") as f:
            yaml.safe_dump(stats, f)
        n_boxes = sum(len(v["track_id"]) for v in mined.values())
        w = self.tb("train", "mining/")
        w.add_scalar("num_mined_boxes", n_boxes, self.round_idx)
        # augm-DB snippet grids (visualize_box_augmentation_database.py)
        from liso_tpu.visu.augm_db_image import grid_of_snippets

        for pi, page in enumerate(
            grid_of_snippets(augm, num_boxes=16, per_row=4)
        ):
            w.add_image(f"augm_db/snippets_{pi}", page, self.round_idx)
        # animated tracked-sequence summary (tracking.py:417-473) of a
        # sequence THIS worker actually mined (sharded mining: the global
        # first sequence belongs to worker 0 only); rendered once and
        # cached so the mining CLI's on-disk GIF reuses the frames
        self._last_seq_frames = (
            self.render_sequence_frames(
                dataset, max_frames=20, seq_idxs=sequences[0]
            )
            if sequences
            else []
        )
        w.add_gif(
            "tracked_sequence", self._last_seq_frames[:12], self.round_idx
        )
        w.add_scalar("mining_time_s", time.time() - t0, self.round_idx)
        print(
            f"round {self.round_idx}: mined {n_boxes} boxes over {n_seqs} "
            f"sequences in {time.time() - t0:.0f}s"
        )

    def _assert_replicas_in_sync(self, step: int,
                                 poll_s: float = 1.0,
                                 timeout_s: float = 600.0) -> None:
        """Multi-host training is LOCK-STEP replicated DP (SURVEY §2.9):
        every host trains the same model on identical batches (merged DBs,
        seed-deterministic loader order, per-(seed, epoch, idx) sample
        RNG — data/dataset.index_rng), so replica params must stay
        bit-identical. This rendezvous asserts it: each worker publishes a
        sha256 digest of its flattened params under the shared log_dir and
        compares against every peer's. A mismatch means a nondeterminism
        bug (divergent replicas would silently change mining semantics —
        the next round's merged DB would mix boxes from different
        detectors)."""
        if self.world_size <= 1 or self.state is None:
            return
        import hashlib

        h = hashlib.sha256()
        for leaf in jax.tree_util.tree_leaves(self.state.params):
            h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
        digest = h.hexdigest()
        out = self.log_dir / f"param_sync_step_{step}"
        out.mkdir(parents=True, exist_ok=True)
        mine_f = out / f"digest_worker{self.worker_id}"
        mine_f.write_text(digest)
        deadline = time.time() + timeout_s
        peers = {}
        missing = set(range(self.world_size)) - {self.worker_id}
        while missing:
            for i in list(missing):
                f = out / f"digest_worker{i}"
                if f.exists():
                    peers[i] = f.read_text()
                    missing.discard(i)
            if missing:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"param sync at step {step}: workers "
                        f"{sorted(missing)} never published digests"
                    )
                time.sleep(poll_s)
        bad = {i: d for i, d in peers.items() if d != digest}
        assert not bad, (
            f"replica divergence at step {step}: worker {self.worker_id} "
            f"params digest {digest[:12]} != workers "
            f"{ {i: d[:12] for i, d in bad.items()} } — lock-step DP "
            f"requires bit-identical replicas"
        )

    def _gather_worker_dbs(self, out: Path, world_size: int,
                           poll_s: float = 2.0, timeout_s: float = 3600.0):
        """Wait for every worker's `.done_worker{i}` marker under `out`,
        then merge the mined dicts (disjoint sequence shards — plain dict
        union) and the finalized augm DBs (array concat with track-id
        re-offsetting)."""
        from liso_tpu.tracker.dbs import (
            load_mined_boxes_db,
            merge_finalized_augm_dbs,
        )

        deadline = time.time() + timeout_s
        missing = set(range(world_size))
        while missing:
            missing = {
                i for i in missing if not (out / f".done_worker{i}").exists()
            }
            if not missing:
                break
            if time.time() > deadline:
                raise TimeoutError(
                    f"sharded mining gather: workers {sorted(missing)} did "
                    f"not publish DBs under {out} within {timeout_s}s"
                )
            time.sleep(poll_s)
        mined = merge_mined_dbs(
            [
                load_mined_boxes_db(out / f"tracked_worker{i}.npz")
                for i in range(world_size)
            ]
        )
        augm = merge_finalized_augm_dbs(
            [
                np.load(out / f"augm_db_worker{i}.npy", allow_pickle=True).item()
                for i in range(world_size)
            ]
        )
        return mined, augm

    def render_sequence_frames(
        self, dataset: LidarDataset, max_frames: int = 20, grid_hw=(256, 256),
        seq_idxs=None,
    ):
        """BEV frames of one sequence with the mined boxes drawn (consumed
        by the TB GIF summary and the mining CLI). seq_idxs defaults to the
        first sequence — pass the worker's own shard when mining is
        distributed."""
        from liso_tpu.eval.run_val import mined_db_predictor
        from liso_tpu.visu.bbox_image import render_frame

        seq = (
            seq_idxs if seq_idxs is not None else self._sequences(dataset)[0]
        )[:max_frames]
        frames = frames_from_dataset(dataset, seq)
        predict = mined_db_predictor(self.mined_db or {})
        images = []
        for f in frames:
            pred = predict({"sample_id": [f.sample_id]})
            v = pred["valid"][0]
            boxes = {
                k: np.asarray(x[0])[v]
                for k, x in pred.items()
                if k != "valid"
            }
            images.append(
                render_frame(
                    np.asarray(f.pcl)[np.asarray(f.valid, bool)][:, :2],
                    boxes if len(boxes["pos"]) else None,
                    self.bev.bev_range_m,
                    grid_hw=grid_hw,
                )
            )
        return images

    def _sequences(self, dataset: LidarDataset) -> List[List[int]]:
        try:
            n = getattr(dataset, "num_sequences", 1)
            return [
                dataset.get_consecutive_sample_idxs_for_sequence(i)
                for i in range(n)
            ]
        except NotImplementedError:
            return [list(range(len(dataset)))]

    # ------------------------------------------------------------------
    def _prepare_batch(self, batch: dict):
        """Copy-paste augmentation + target assembly (host), then device."""
        pcl = np.array(batch["pcl_t0"])
        valid = np.array(batch["valid_t0"])
        targets = {k: np.array(v) for k, v in batch["target_boxes"].items()}
        has_augm = self._augm_db_final is not None or (
            self.augm_db is not None and len(self.augm_db["boxes"]) > 0
        )
        if has_augm and self.cfg.data.augmentation.boxes.active:
            if self._augm_db_final is None:  # stack once per mining round
                from liso_tpu.tracker.dbs import finalize_augm_db

                self._augm_db_final = finalize_augm_db(self.augm_db)
            db = self._augm_db_final
            if len(db["boxes"].get("pos", ())) == 0:
                db = None  # resume-loaded DB fully filtered: nothing to paste
        else:
            db = None
        if db is not None:
            b, n_max = valid.shape
            for i in range(b):
                base = pcl[i][valid[i]]
                rows = np.zeros(len(base), np.int64)
                new_pcl, _, pasted = paste_boxes_into_sample(
                    base, rows, db, self.rng, self.bev.bev_range_m,
                    self.box_augm_cfg,
                )
                p_padded, v_padded = pad_to(new_pcl, n_max)
                pcl[i], valid[i] = p_padded, v_padded
                if len(pasted["pos"]):
                    k_slots = targets["pos"].shape[1]
                    kv = int(targets["valid"][i].sum())
                    n_add = min(len(pasted["pos"]), k_slots - kv)
                    for key in ("pos", "dims", "rot", "probs", "velo"):
                        if key in targets:
                            targets[key][i, kv : kv + n_add] = pasted[key][:n_add]
                    targets["valid"][i, kv : kv + n_add] = True
        boxes = Boxes(
            pos=jnp.asarray(targets["pos"]),
            dims=jnp.asarray(targets["dims"]),
            rot=jnp.asarray(targets["rot"]),
            probs=jnp.asarray(targets["probs"]),
            velo=jnp.asarray(targets.get("velo")),
            valid=jnp.asarray(targets["valid"]),
        ).with_defaults()
        return jnp.asarray(pcl), jnp.asarray(valid), boxes

    # ------------------------------------------------------------------
    def run(self, total_steps: Optional[int] = None, fast_test: bool = False,
            start_step: int = 0):
        """start_step > 0 resumes mid-run (reference liso_cli.py:742-789:
        step parsed from the checkpoint, mined DBs reused instead of
        re-mined; optax schedules need no replay — pure functions of the
        restored step)."""
        opt = self.cfg.optimization
        total_steps = total_steps or int(opt.num_training_steps)
        steps_per_round = (
            int(opt.rounds.steps_per_round) if opt.rounds.active else total_steps
        )
        drop_every = int(opt.rounds.drop_net_weights_every_nth_round)
        val_every = int(self.cfg.validation.val_every_n_steps)

        dataset = self.train_dataset_factory(None)
        loader = None
        train_iter = None
        metrics_hist = []

        if start_step:
            # resume mid-round: rebuild the loader from the restored DBs;
            # mining re-triggers at the NEXT round boundary with the same
            # round_idx a fresh run would have there (a boundary-aligned
            # resume re-mines for the new round, not the completed one)
            self.round_idx = -(-start_step // steps_per_round)
            dataset = self.train_dataset_factory(self.mined_db)
            loader = Prefetcher(
                dataset,
                batch_size=int(self.cfg.data.batch_size),
                num_workers=int(self.cfg.data.num_workers) or 1,
            )
            train_iter = iter(loader)

        for step in range(start_step, total_steps):
            if step % steps_per_round == 0:
                # round boundary rendezvous: replicas must agree BEFORE
                # mining, or the merged DB mixes different detectors
                self._assert_replicas_in_sync(step)
                self.mine(dataset)
                if self.mined_db is not None and self.val_dataset is not None:
                    val_loader = Prefetcher(
                        self.val_dataset, batch_size=1, shuffle=False,
                        num_workers=2,
                    )
                    mined_metrics = run_val(
                        iter(val_loader),
                        mined_db_predictor(self.mined_db),
                        max_batches=4 if fast_test else None,
                    )
                    self.tb("val", "mined_boxes/").add_scalars(
                        {k: v for k, v in mined_metrics.items()
                         if k.startswith(("mAP", "AP_overall_overall"))},
                        step,
                    )
                dataset = self.train_dataset_factory(self.mined_db)
                loader = Prefetcher(
                    dataset,
                    batch_size=int(self.cfg.data.batch_size),
                    num_workers=int(self.cfg.data.num_workers) or 1,
                )
                train_iter = iter(loader)
                if (
                    self.round_idx > 0
                    and drop_every > 0
                    and self.round_idx % drop_every == 0
                ):
                    print(f"round {self.round_idx}: resetting net + optimizer")
                    self.state = None
                self.round_idx += 1

            t_data0 = time.time()
            try:
                batch = next(train_iter)
            except StopIteration:
                train_iter = iter(loader)
                batch = next(train_iter)

            pts, valid, target = self._prepare_batch(batch)
            t_data = time.time() - t_data0
            if self.state is None:
                self.state = self.trainer.init_state(
                    jax.random.PRNGKey(int(self.cfg.seed) + self.round_idx),
                    pts, valid,
                )
            t_fwd0 = time.time()
            self.state, metrics = self.trainer.train_step(
                self.state, pts, valid, target
            )
            metrics_hist.append(float(metrics["loss/total"]))
            t_fwdbwd = time.time() - t_fwd0  # loss read above syncs
            self.tb.global_step = step
            if step % int(self.cfg.logging.log_interval) == 0:
                w = self.tb("train", "loss/")
                w.add_scalars(
                    {k: float(v) for k, v in metrics.items()}, step
                )
                # per-step wall-clock timers (liso_cli.py:621-633)
                wt = self.tb("train", "timing/")
                wt.add_scalar("dataloading_s", t_data, step)
                wt.add_scalar("fwd_bwd_s", t_fwdbwd, step)

            # multi-host: training is LOCK-STEP replicated (identical
            # merged DBs + seed-deterministic loader + per-index sample
            # RNG => bit-identical replicas, asserted at round
            # boundaries), so only worker 0 validates and checkpoints
            if (val_every and step > 0 and step % val_every == 0
                    and self.worker_id == 0):
                self.validate(step, fast_test)
            save_every = int(self.cfg.checkpoint.save_model_every)
            if (save_every and step > 0 and step % save_every == 0
                    and self.worker_id == 0):
                self.save(step)
        self._assert_replicas_in_sync(total_steps)
        if self.state is not None and self.worker_id == 0:
            self.save(total_steps)
        return metrics_hist

    def save(self, step: int):
        """Detector checkpoint {network, optimizer, step} like the
        reference's <step>.pth (liso_cli.py:726-739); optax schedules need
        no replay — they are pure functions of the restored step."""
        from liso_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(self.log_dir / "ckpts", step, self.state)

    def restore(self, ckpt_dir, example_pts, example_valid):
        """liso_cli.py:742-789 resume: restore the latest checkpoint into a
        freshly-initialised state template, plus the newest mined/augm DBs
        saved next to it (mined DBs ARE self-training state,
        liso_cli.py:221-226 reuses existing DB files on resume)."""
        from liso_tpu.utils.checkpoint import latest_step, restore_checkpoint

        from liso_tpu.utils.checkpoint import check_checkpoint_config_sanity

        ckpt_dir = Path(ckpt_dir)
        check_checkpoint_config_sanity(ckpt_dir, self.cfg)
        step = latest_step(ckpt_dir)
        assert step is not None, f"no checkpoints under {ckpt_dir}"
        template = self.trainer.init_state(
            jax.random.PRNGKey(0), example_pts, example_valid
        )
        self.state = restore_checkpoint(ckpt_dir, step, template)
        rounds = sorted(
            ckpt_dir.parent.glob("mined_round_*"),
            key=lambda p: int(p.name.rsplit("_", 1)[-1]),
        )
        from liso_tpu.tracker.dbs import load_augm_db, load_mined_boxes_db

        # newest COMPLETE round wins; a round dir left half-written by an
        # interrupted mine() must not make the run unresumable
        for rd in reversed(rounds):
            try:
                self.mined_db = load_mined_boxes_db(rd / "tracked.npz")
            except (FileNotFoundError, OSError, ValueError):
                continue
            try:
                # loaded DBs are already in the finalized (stacked) form
                self._augm_db_final = load_augm_db(rd / "augm_db.npy")
            except (FileNotFoundError, OSError, ValueError):
                pass
            break
        return step

    def validate(self, step: int, fast_test: bool = False):
        if self.val_dataset is None:
            return {}
        loader = Prefetcher(
            self.val_dataset, batch_size=1, shuffle=False, num_workers=2
        )
        # cap mid-training validation like the reference's num_val_steps
        # batches (liso_cli.py:665-684); 0/absent = full val set
        num_val = int(getattr(self.cfg.validation, "num_val_steps", 0) or 0)
        max_batches = 4 if fast_test else (num_val or None)
        trainer, state = self.trainer, self.state

        def predict(batch):
            boxes = trainer.predict_step(
                state, jnp.asarray(batch["pcl_t0"]),
                jnp.asarray(batch["valid_t0"]),
            )
            return {
                "pos": np.asarray(boxes.pos),
                "dims": np.asarray(boxes.dims),
                "rot": np.asarray(boxes.rot),
                "probs": np.asarray(boxes.probs),
                "velo": np.asarray(boxes.velo),
                "valid": np.asarray(boxes.valid),
            }

        metrics = run_val(
            iter(loader), predict, max_batches=max_batches,
            writer=self.tb("val", "detector/"), global_step=step,
            bev_range_m=self.bev.bev_range_m,
        )
        self.tb("val", "detector/").add_scalars(
            {k: v for k, v in metrics.items()
             if k.startswith(("mAP", "AP_overall_overall", "ATE", "AOE"))},
            step,
        )
        # second eval pass over the TRAINING distribution (val-on-train,
        # reference liso_cli.py:665-684 + main_utils.py:323-463): the
        # factory without mined boxes yields GT targets for measurement
        num_vot = int(
            getattr(self.cfg.validation, "num_val_on_train_steps", 0) or 0
        )
        if num_vot:
            vot_ds = self.train_dataset_factory(None)
            vot_loader = Prefetcher(
                vot_ds, batch_size=1, shuffle=False, num_workers=2
            )
            vot_metrics = run_val(
                iter(vot_loader), predict,
                max_batches=4 if fast_test else num_vot,
                writer=self.tb("val_on_train", "detector/"),
                global_step=step, bev_range_m=self.bev.bev_range_m,
            )
            self.tb("val_on_train", "detector/").add_scalars(
                {k: v for k, v in vot_metrics.items()
                 if k.startswith(("mAP", "AP_overall_overall", "ATE", "AOE"))},
                step,
            )
            metrics.update(
                {f"val_on_train/{k}": v for k, v in vot_metrics.items()
                 if k.startswith("mAP")}
            )
        return metrics


def merge_mined_dbs(dbs: List[Dict[str, dict]]) -> Dict[str, dict]:
    """Merge per-worker mined DBs (host-side gather — sequences are
    disjoint so keys never collide)."""
    out: Dict[str, dict] = {}
    for db in dbs:
        out.update(db)
    return out
