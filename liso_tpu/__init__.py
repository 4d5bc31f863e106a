"""liso_tpu — TPU-native rebuild of the LISO lidar-only self-supervised
3D object detection pipeline (reference: baurst/liso, ECCV 2024).

Design principles (TPU-first, not a port):
  * fixed-capacity padded tensors with validity masks everywhere
    (points -> [N_max, 4] + mask, boxes -> [K_max, ...] + mask)
  * all hot ops (pillarization, kNN, Kabsch, rotated IoU/NMS, clustering)
    are jit-able XLA programs, several with Pallas kernels
  * data parallelism via jax.sharding.Mesh + shard_map over ICI
  * the self-training loop (mine -> track -> refit -> retrain) keeps
    device inference batched while track bookkeeping stays host-side numpy
"""

__version__ = "0.1.0"
