"""nuScenes / Waymo / AV2 dataset readers over the shared ETL npy format."""
import numpy as np
import pytest

from liso_tpu.data.dataset import DataCfg
from liso_tpu.data.nuscenes import NuscenesDataset
from liso_tpu.data.synthetic import SyntheticSequence
from liso_tpu.data.waymo import AV2Dataset, WaymoDataset
from liso_tpu.ops.bev import BevSetup

CFG = DataCfg(bev=BevSetup((40.0, 40.0), (64, 64)), n_max=4096, m_max=12288,
              use_skip_frames="never")


def write_samples(d, names, category="car"):
    d.mkdir(parents=True, exist_ok=True)
    seq = SyntheticSequence(n_frames=len(names) + 2, seed=0)
    for t, name in enumerate(names):
        content = seq.sample_dict(t)
        content["name"] = name
        boxes = content["gt"]["boxes"]
        k = len(boxes["pos"])
        poses = np.tile(np.eye(4)[None], (k, 1, 1))
        poses[:, :3, 3] = boxes["pos"]
        content["gt"]["objects_t0"] = {
            "poses": poses,
            "size": boxes["dims"],
            "category": np.array([category] * k),
        }
        np.save(d / name, content)


def test_nuscenes_dataset(tmp_path):
    names = [f"scene-0001_{t:04d}" for t in range(3)] + [
        f"scene-0002_{t:04d}" for t in range(2)
    ]
    write_samples(tmp_path / "nuscenes" / "train", names, category="car")
    ds = NuscenesDataset(CFG, tmp_path, mode="train")
    assert len(ds) == 5
    assert ds.num_sequences == 2
    assert len(ds.get_consecutive_sample_idxs_for_sequence(0)) == 3
    s = ds[0]
    assert s.gt_boxes is not None and s.gt_boxes["valid"].sum() == 2
    assert (s.gt_boxes["class_id"][s.gt_boxes["valid"]] == 0).all()


def test_waymo_dataset_downsample(tmp_path):
    names = [f"segment1_{t:04d}" for t in range(6)]
    write_samples(tmp_path / "waymo", names, category="TYPE_VEHICLE")
    ds = WaymoDataset(CFG, tmp_path, downsample_factor=2)
    assert len(ds) == 3  # every 2nd frame kept (waymo_downsample_factor)
    s = ds[0]
    assert s.gt_boxes["valid"].sum() == 2


def test_waymo_sign_class_ignored(tmp_path):
    names = ["segment2_0000"]
    write_samples(tmp_path / "waymo", names, category="TYPE_SIGN")
    ds = WaymoDataset(CFG, tmp_path, downsample_factor=1)
    s = ds[0]
    # signs are not movable -> filtered out of GT
    assert s.gt_boxes is None or s.gt_boxes["valid"].sum() == 0


def test_av2_dataset_log_grouping(tmp_path):
    for log in ("log_a", "log_b"):
        write_samples(tmp_path / "av2" / log, [f"{t:04d}" for t in range(2)],
                      category="REGULAR_VEHICLE")
    ds = AV2Dataset(CFG, tmp_path)
    assert len(ds) == 4
    assert ds.num_sequences == 2
    s = ds[0]
    assert s.gt_boxes["valid"].sum() == 2


def test_missing_root_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        NuscenesDataset(CFG, tmp_path / "nope")
    with pytest.raises(FileNotFoundError):
        WaymoDataset(CFG, tmp_path / "nope")


def test_build_datasets_source_dispatch(tmp_path):
    """CLI source dispatch covers all dataset families (reference
    main_utils.get_datasets:323-463)."""
    from liso_tpu.cli.slim_cli import build_datasets, make_train_dataset
    from liso_tpu.utils.config import parse_config
    from liso_tpu.cli.common import DEFAULT_CFG

    write_samples(tmp_path / "nuscenes" / "train",
                  ["scene-0001_0000", "scene-0001_0001"])
    write_samples(tmp_path / "waymo", ["segment1_0000", "segment1_0001"],
                  category="TYPE_VEHICLE")
    write_samples(tmp_path / "av2" / "log_a", ["0000", "0001"],
                  category="REGULAR_VEHICLE")
    write_samples(tmp_path / "kitti_raw",
                  ["2011_09_26_0001_0000", "2011_09_26_0001_0001"])

    for source, overlay in (
        ("nuscenes", "nuscenes"), ("waymo", "waymo"), ("av2", "av2"),
        ("kitti", "kitti"),
    ):
        cfg = parse_config(str(DEFAULT_CFG), [overlay], None)
        cfg.data.source = source
        for fam in ("kitti", "nuscenes", "waymo", "av2"):
            cfg.data.paths[fam]["local"] = str(tmp_path)
        train, val, bev = build_datasets(cfg, fast_test=True)
        assert len(train) >= 1, source
        # mined-db train rebuild path used by the rounds loop
        ds = make_train_dataset(cfg, train.cfg, fast_test=True, mined_db={})
        assert len(ds) >= 1, source
