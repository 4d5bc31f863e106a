"""Full LISO self-training loop smoke test (the reference's --fast-test
analogue, SURVEY.md §4): 2 rounds x few steps over a synthetic drive,
exercising mining, DB rebuild, detector training, and validation."""
import numpy as np
import pytest

from liso_tpu.data.dataset import DataCfg
from liso_tpu.data.synthetic import SyntheticDataset
from liso_tpu.ops.bev import BevSetup
from liso_tpu.train.liso_loop import LisoSelfTraining
from liso_tpu.utils.config import parse_config

CFG_PATH = "liso_tpu/config/liso_config.yml"


@pytest.fixture(scope="module")
def fast_cfg():
    cfg = parse_config(
        CFG_PATH,
        extra_cfg_args=["centerpoint"],
        key_value_updates=[
            ["optimization", "rounds", "active", "true"],
            ["optimization", "rounds", "steps_per_round", "3"],
            ["optimization", "rounds", "drop_net_weights_every_nth_round", "2"],
            ["optimization", "num_training_steps", "6"],
            ["optimization", "learning_rate", "0.001"],
            ["data", "batch_size", "2"],
            ["data", "num_workers", "2"],
            ["data", "tracking_cfg", "min_track_age", "2"],
            ["data", "tracking_cfg", "min_points_in_box", "5"],
            ["data", "tracking_cfg", "flow_cluster_detector_min_travel_dist_filter_m", "1.0"],
            ["validation", "val_every_n_steps", "4"],
            ["data", "augmentation", "boxes", "active", "true"],
        ],
    )
    return cfg


def test_full_self_training_loop(fast_cfg, tmp_path):
    bev = BevSetup((40.0, 40.0), (64, 64))
    dcfg = DataCfg(
        bev=bev, n_max=4096, m_max=12288, k_max_boxes=16,
        use_skip_frames="never",
    )

    def factory(mined_db):
        return SyntheticDataset(dcfg, n_frames=8, mined_boxes_db=mined_db)

    val_ds = SyntheticDataset(dcfg, n_frames=4, seed=1)
    loop = LisoSelfTraining(
        fast_cfg, factory, val_ds, tmp_path, data_cfg=dcfg
    )
    losses = loop.run(total_steps=6, fast_test=True)
    assert len(losses) == 6
    assert np.isfinite(losses).all()
    # 2 mining rounds happened; the bootstrap round produced boxes (the
    # round-1 detector has only trained 3 steps, so its re-mining may be
    # empty — same as the reference fast-test)
    assert loop.round_idx == 2
    from liso_tpu.tracker.dbs import load_mined_boxes_db

    db0 = load_mined_boxes_db(tmp_path / "mined_round_0" / "tracked.npz")
    n_mined = sum(len(v["track_id"]) for v in db0.values())
    assert n_mined > 0, "bootstrap mining produced no boxes"
    assert (tmp_path / "mined_round_1" / "augm_db.npy").exists()
    # final validation runs: val metrics, the val-on-train second pass
    # (reference liso_cli.py:665-684) and PR/ROC/TP-FP curve banks in the
    # TB logdir (reference od_metrics.py:547-1396)
    metrics = loop.validate(6, fast_test=True)
    assert any(k.startswith("mAP") for k in metrics)
    assert any(k.startswith("val_on_train/") for k in metrics), (
        "val-on-train second eval pass missing"
    )
    assert (tmp_path / "tb" / "val_on_train").exists()
    for w in loop.tb._writers.values():
        getattr(w, "flush", lambda: None)()
    val_events = list((tmp_path / "tb" / "val").glob("events*"))
    assert val_events
    # the PR-curve plugin writes distinctive tags into the event file
    blob = b"".join(p.read_bytes() for p in val_events)
    assert b"pr_curves" in blob or b"curves/" in blob, (
        "no curve summaries found in the val TB event files"
    )


def test_mining_frames_use_fixed_consecutive_keys_and_no_augm():
    """VERDICT r1 bug 3: mining must not inherit the random skip-frame
    curriculum (t0->t2 pairs) or the global SE(2) augmentation — frames
    must always be the raw t0->t1 pair, deterministically."""
    from liso_tpu.train.liso_loop import frames_from_dataset

    bev = BevSetup((40.0, 40.0), (64, 64))
    dcfg = DataCfg(
        bev=bev, n_max=4096, m_max=12288, use_skip_frames="both"
    )
    calls = []

    class SpyDataset(SyntheticDataset):
        def _build(self, content, idx, a, b, dt):
            calls.append((a, b, self.augmentation is None))
            return super()._build(content, idx, a, b, dt)

    def fake_augm(content, rng):  # would jitter geometry if ever applied
        raise AssertionError("augmentation must be disabled during mining")

    ds = SpyDataset(dcfg, n_frames=6)
    ds.augmentation = fake_augm
    f1 = frames_from_dataset(ds, [0, 1, 2])
    assert calls == [("t0", "t1", True)] * 3
    assert ds.augmentation is fake_augm  # restored afterwards
    # deterministic: a second pass yields identical odometry + flow
    f2 = frames_from_dataset(ds, [0, 1, 2])
    for a, b in zip(f1, f2):
        np.testing.assert_array_equal(a.odom_ta_tb, b.odom_ta_tb)
        np.testing.assert_array_equal(a.flow, b.flow)


def test_mining_cli_end_to_end(tmp_path):
    """Standalone mining CLI (reference tracker/tracking.py:main): bootstrap
    mining on the synthetic source, DBs + GIF + mined-box eval."""
    from liso_tpu.cli.mining_cli import main

    log_dir = main(["--fast-test", "--summary_dir", str(tmp_path)])
    mined = list(log_dir.glob("mined_round_0/tracked*"))
    augm = list(log_dir.glob("mined_round_0/augm_db*"))
    assert mined and augm
    assert (log_dir / "tracked_sequence.gif").exists()
    assert (log_dir / "mined_round_0" / "tracking_cfg.yaml").exists()


def test_mining_min_num_boxes_stops_early(fast_cfg, tmp_path):
    """tracking.py:594 stop condition: once enough tracks are mined (here:
    0, so immediately) no further sequence is consumed."""
    import copy

    cfg = copy.deepcopy(fast_cfg)
    cfg.data.tracking_cfg.min_num_boxes = 0
    bev = BevSetup((40.0, 40.0), (64, 64))
    dcfg = DataCfg(
        bev=bev, n_max=4096, m_max=12288, k_max_boxes=16,
        use_skip_frames="never",
    )

    def factory(mined_db):
        return SyntheticDataset(dcfg, n_frames=4, mined_boxes_db=mined_db)

    val_ds = SyntheticDataset(dcfg, n_frames=2, seed=1)
    loop = LisoSelfTraining(cfg, factory, val_ds, tmp_path, data_cfg=dcfg)
    ds = factory(None)
    loop.mine(ds)
    n_mined = sum(len(v["track_id"]) for v in loop.mined_db.values())
    assert n_mined == 0
    assert len(loop.augm_db["pcl_in_box_cosy"]) == 0


def test_mine_sequence_batched_detection_matches_per_frame():
    """detect_batch_fn precomputation must reproduce the per-frame path
    exactly (same mined DB)."""
    from liso_tpu.tracker.mining import Frame, MiningCfg, mine_sequence
    from liso_tpu.ops.boxes import Boxes
    import jax.numpy as jnp

    bev = BevSetup((40.0, 40.0), (64, 64))
    rng = np.random.RandomState(0)
    n, T = 512, 6
    base = rng.uniform(-15, 15, (n, 4)).astype(np.float32)
    frames = []
    for t in range(T):
        pcl = base.copy()
        # a dense moving cluster the fake detector will box
        pcl[:64, :3] = rng.uniform(-1, 1, (64, 3)) * 0.8 + np.array(
            [5.0 + 0.5 * t, 0.0, 0.0], np.float32
        )
        flow = np.zeros((n, 3), np.float32)
        flow[:64, 0] = 0.5
        frames.append(
            Frame(
                sample_id=f"s{t}",
                pcl=pcl,
                valid=np.ones(n, bool),
                flow=flow,
                odom_ta_tb=np.eye(4),
            )
        )

    def fake_det(frame):
        t = int(frame.sample_id[1:])
        return Boxes(
            pos=jnp.asarray([[5.0 + 0.5 * t, 0.0, 0.0]], jnp.float32),
            dims=jnp.asarray([[2.0, 2.0, 2.0]], jnp.float32),
            rot=jnp.asarray([[0.0]], jnp.float32),
            probs=jnp.asarray([[0.9]], jnp.float32),
            valid=jnp.asarray([True]),
        )

    cfg = MiningCfg(
        min_track_age=2, min_points_in_box=5, smoothing_iters=50,
        flow_cluster_min_travel_dist_m=0.5, is_flow_cluster_detector=False,
    )
    out_a = mine_sequence(frames, fake_det, cfg, bev)
    out_b = mine_sequence(
        frames, fake_det, cfg, bev,
        detect_batch_fn=lambda fs: [fake_det(f) for f in fs],
    )
    assert out_a["num_tracks"] == out_b["num_tracks"] > 0
    for sid in out_a["mined_db"]:
        np.testing.assert_allclose(
            out_a["mined_db"][sid]["lidar_T_box"],
            out_b["mined_db"][sid]["lidar_T_box"],
        )


class TwoSeqSynthetic(SyntheticDataset):
    """The synthetic drive split into 2 sequences so sharded mining gives
    each worker a disjoint shard (seq_idx % world_size)."""

    num_sequences = 2

    def get_consecutive_sample_idxs_for_sequence(self, s):
        m = len(self) // 2
        return list(range(m)) if s % 2 == 0 else list(range(m, len(self)))


def test_sharded_mining_inside_rounds_loop(fast_cfg, tmp_path):
    """VERDICT r3 item 3c: world_size/worker_id flow through the rounds
    loop — each worker mines only its sequence shard, publishes it under
    the SHARED log_dir, and every worker continues training from the
    MERGED DB (not a per-worker re-mine of everything)."""
    import threading

    bev = BevSetup((40.0, 40.0), (64, 64))
    dcfg = DataCfg(
        bev=bev, n_max=4096, m_max=12288, k_max_boxes=16,
        use_skip_frames="never",
    )

    def factory(db):
        return TwoSeqSynthetic(dcfg, n_frames=8, mined_boxes_db=db)

    mined_seqs = []  # which sequences each worker actually mined

    class SpyLoop(LisoSelfTraining):
        def _sequences(self, dataset):
            seqs = super()._sequences(dataset)
            return seqs

    loops = [
        SpyLoop(
            fast_cfg, factory, None, tmp_path, data_cfg=dcfg,
            world_size=2, worker_id=w,
        )
        for w in range(2)
    ]
    errors = []

    def run(w):
        try:
            # total_steps=2 < steps_per_round: exactly one mining round
            loops[w].run(total_steps=2)
        except Exception as e:  # pragma: no cover
            errors.append((w, e))

    threads = [threading.Thread(target=run, args=(w,)) for w in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    # both workers ended up with the same merged DB
    counts = [
        sum(len(v["track_id"]) for v in lp.mined_db.values()) for lp in loops
    ]
    assert counts[0] == counts[1] > 0, counts

    # each worker's published shard only covers its own sequences, and the
    # merged DB covers BOTH halves of the drive
    from liso_tpu.tracker.dbs import load_mined_boxes_db

    out = tmp_path / "mined_round_0"
    shard0 = load_mined_boxes_db(out / "tracked_worker0.npz")
    shard1 = load_mined_boxes_db(out / "tracked_worker1.npz")
    ds = factory(None)
    first_half = {f"synth0_{t:04d}" for t in range(4)}
    with_boxes = lambda db: {
        k for k, v in db.items() if len(v["track_id"])
    }
    assert with_boxes(shard0) <= first_half
    assert with_boxes(shard1).isdisjoint(first_half)
    merged_ids = with_boxes(loops[0].mined_db)
    assert merged_ids & first_half and merged_ids - first_half

    # canonical merged DB was written by worker 0
    merged_on_disk = load_mined_boxes_db(out / "tracked.npz")
    assert sum(len(v["track_id"]) for v in merged_on_disk.values()) == counts[0]

    # the augm DBs merged with disjoint re-offset track ids: the merged
    # unique-id count equals the sum of per-worker unique counts (a track
    # contributes several snippets, so ids repeat WITHIN a worker)
    w_dbs = [
        np.load(out / f"augm_db_worker{w}.npy", allow_pickle=True).item()
        for w in range(2)
    ]
    n_unique_workers = sum(
        len(np.unique(d["unique_track_id"])) for d in w_dbs
    )
    tids = loops[0]._augm_db_final["unique_track_id"]
    assert len(np.unique(tids)) == n_unique_workers


def test_trainer_schedule_spans_reset_period(fast_cfg, tmp_path):
    """Reference parity (liso_cli.py:806-820): the detector OneCycle spans
    steps_per_round x drop_net_weights_every_nth_round (+2), so the round
    between weight resets still trains at a meaningful LR (>= max_lr/100,
    NOT an annealed-to-zero tail)."""
    bev = BevSetup((40.0, 40.0), (64, 64))
    dcfg = DataCfg(bev=bev, n_max=2048, m_max=4096, k_max_boxes=8)
    loop = LisoSelfTraining(
        fast_cfg, lambda db: SyntheticDataset(dcfg, n_frames=4), None,
        tmp_path, data_cfg=dcfg,
    )
    spr = int(fast_cfg.optimization.rounds.steps_per_round)
    drop = int(fast_cfg.optimization.rounds.drop_net_weights_every_nth_round)
    max_lr = float(fast_cfg.optimization.learning_rate)
    sched = loop.trainer.lr_schedule
    # LR at the END of the reset period (last trained step) is the torch
    # min_lr = max_lr / (div_factor * final_div_factor) = max_lr / 100
    lr_end = float(sched(spr * drop - 1))
    assert lr_end >= max_lr / 100.0 * 0.99, (lr_end, max_lr)
    # and the peak is reached inside the period
    peak = max(float(sched(s)) for s in range(spr * drop))
    assert abs(peak - max_lr) / max_lr < 0.05, (peak, max_lr)


def test_loop_with_proposal_union(tmp_path):
    """Rounds with optimization.rounds.mine_proposal_union: round-1 mining
    feeds the tracker the union of detector + flow-cluster proposals
    (tracker/mining.union_proposals) — recall can't ratchet below the
    bootstrap's. Smoke: the union path runs end to end and round-1 mining
    still produces a DB at least as large as detector-only would on a
    barely-trained net."""
    cfg = parse_config(
        CFG_PATH,
        extra_cfg_args=["centerpoint"],
        key_value_updates=[
            ["optimization", "rounds", "active", "true"],
            ["optimization", "rounds", "steps_per_round", "3"],
            ["optimization", "rounds", "drop_net_weights_every_nth_round", "2"],
            ["optimization", "rounds", "mine_proposal_union", "true"],
            ["optimization", "num_training_steps", "6"],
            ["optimization", "learning_rate", "0.001"],
            ["data", "batch_size", "2"],
            ["data", "num_workers", "0"],
            ["data", "tracking_cfg", "min_track_age", "2"],
            ["data", "tracking_cfg", "min_points_in_box", "5"],
            ["data", "tracking_cfg",
             "flow_cluster_detector_min_travel_dist_filter_m", "1.0"],
            ["validation", "val_every_n_steps", "0"],
            ["data", "augmentation", "boxes", "active", "true"],
        ],
    )
    bev = BevSetup((40.0, 40.0), (64, 64))
    dcfg = DataCfg(
        bev=bev, n_max=4096, m_max=12288, k_max_boxes=16,
        use_skip_frames="never",
    )

    def factory(mined_db):
        return SyntheticDataset(dcfg, n_frames=8, mined_boxes_db=mined_db)

    val_ds = SyntheticDataset(dcfg, n_frames=4, seed=1)
    loop = LisoSelfTraining(cfg, factory, val_ds, tmp_path, data_cfg=dcfg)
    losses = loop.run(total_steps=6, fast_test=True)
    assert np.isfinite(losses).all()
    assert loop.round_idx == 2
    from liso_tpu.tracker.dbs import load_mined_boxes_db

    db0 = load_mined_boxes_db(tmp_path / "mined_round_0" / "tracked.npz")
    db1 = load_mined_boxes_db(tmp_path / "mined_round_1" / "tracked.npz")
    n0 = sum(len(v["track_id"]) for v in db0.values())
    n1 = sum(len(v["track_id"]) for v in db1.values())
    assert n0 > 0
    # with flow-cluster proposals unioned in, the 3-step net's re-mining
    # keeps at least the flow-cluster-recoverable tracks
    assert n1 > 0, "union mining lost every bootstrap-recoverable track"
