"""Input-pipeline scale proof (VERDICT r1 item 9): measure Prefetcher
batch-assembly throughput at AV2 bench scale (65k-point samples, batch 8)
and report the implied stall against a given device step time.

  python benchmarks/input_pipeline_bench.py [--workers N] [--batches N]
"""
import argparse
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")


from liso_tpu.data.dataset import DataCfg
from liso_tpu.data.pipeline import Prefetcher
from liso_tpu.data.synthetic import SyntheticDataset
from liso_tpu.ops.bev import BevSetup


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--n_max", type=int, default=65536)
    ap.add_argument("--device_step_ms", type=float, default=122.0)
    args = ap.parse_args(argv)

    bev = BevSetup((120.0, 120.0), (920, 920))
    cfg = DataCfg(bev=bev, n_max=args.n_max, m_max=2 * args.n_max,
                  k_max_boxes=64)
    # Spill pre-generated sample dicts to disk and load them back per
    # access: measures the REAL path (npy read + crop/ground/pad/collate),
    # not the synthetic generator (real datasets read these dicts from the
    # ETL output with np.load, e.g. data/kitti.py)
    import tempfile

    import numpy as np

    n_frames = 16
    gen = SyntheticDataset(cfg, n_frames=n_frames, n_points=args.n_max)
    spool = tempfile.mkdtemp(prefix="liso_pipe_bench_")
    for i in range(n_frames):
        np.save(f"{spool}/{i}.npy", gen.load_sample_dict(i),
                allow_pickle=True)

    class DiskBacked(SyntheticDataset):
        def load_sample_dict(self, idx: int) -> dict:
            return np.load(f"{spool}/{idx}.npy", allow_pickle=True).item()

    ds = DiskBacked(cfg, n_frames=n_frames, n_points=256)  # tiny generator

    def epochs():
        while True:
            loader = Prefetcher(ds, batch_size=args.batch_size,
                                num_workers=args.workers)
            yield from iter(loader)

    it = epochs()
    next(it)  # warm caches / worker spin-up
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += 1
        if n >= args.batches:
            break
    dt = (time.perf_counter() - t0) / max(n, 1)
    fps = args.batch_size / dt
    stall = max(0.0, dt * 1e3 - args.device_step_ms)
    print(
        f"workers={args.workers} batch={args.batch_size} n_max={args.n_max}: "
        f"{dt*1e3:.0f} ms/batch ({fps:.1f} samples/s) -> stall vs "
        f"{args.device_step_ms:.0f} ms device step: {stall:.0f} ms "
        f"({100*stall/args.device_step_ms:.0f}%)"
    )


if __name__ == "__main__":
    main()
