"""All box decode conventions (output_modification.py parity)."""
import jax.numpy as jnp
import numpy as np

from liso_tpu.models.box_decode import (
    BoxPredictionCfg,
    apply_activations,
    decode_box_maps,
    flatten_to_boxes,
)
from liso_tpu.ops.bev import BevSetup

BEV = BevSetup((40.0, 40.0), (8, 8))


def raw_maps(cfg, b=1, h=8, w=8, fill=0.0):
    return {
        name: jnp.full((b, h, w, c), fill, jnp.float32)
        for name, c in cfg.head_channels()
    }


def test_global_relative_position():
    cfg = BoxPredictionCfg(
        position_method="global_relative",
        dimensions_method="predict_abs_size",
        rotation_method="direct",
        activations={"pos": "tanh", "dims": "softplus", "rot": "none",
                     "probs": "none"},
    )
    maps = raw_maps(cfg)
    maps["pos"] = maps["pos"].at[0, 0, 0].set(jnp.asarray([0.5, -0.25, 0.0]))
    dec = decode_box_maps(apply_activations(maps, cfg), cfg, BEV)
    # tanh then * bev_range * 0.6 (output_modification.py:11-16)
    exp = np.tanh([0.5, -0.25]) * 40.0 * 0.6
    assert np.allclose(np.asarray(dec["pos"][0, 0, 0, :2]), exp, atol=1e-5)


def test_local_relative_offset_position():
    cfg = BoxPredictionCfg()  # centerpoint preset
    maps = raw_maps(cfg)
    dec = decode_box_maps(apply_activations(maps, cfg), cfg, BEV)
    # zero offsets -> positions are the prediction-grid cell centers
    pos = np.asarray(dec["pos"][0])
    assert np.allclose(pos[0, 0, :2], [-17.5, -17.5], atol=1e-5)
    assert np.allclose(pos[7, 7, :2], [17.5, 17.5], atol=1e-5)
    # zero z logit -> prior midpoint (-1.5, -0.5) -> -1.0
    assert np.allclose(pos[..., 2], -1.0, atol=1e-5)


def test_aspect_ratio_dims():
    cfg = BoxPredictionCfg(
        dimensions_method="predict_aspect_ratio",
        activations={"pos": "none", "dims": "sigmoid", "rot": "none",
                     "probs": "none"},
        rotation_method="direct",
        position_method="global_absolute",
    )
    maps = raw_maps(cfg)  # sigmoid(0) = 0.5
    dec = decode_box_maps(apply_activations(maps, cfg), cfg, BEV)
    # scale 0.5 -> len = 2 + 0.5*(8-2) = 5; width = len * aspect_inv(0.5)
    d = np.asarray(dec["dims"][0, 0, 0])
    assert np.allclose(d[:2], [5.0, 2.5], atol=1e-5)


def test_log_size_dims():
    cfg = BoxPredictionCfg(
        dimensions_method="predict_log_size",
        activations={"pos": "none", "dims": "none", "rot": "none",
                     "probs": "none"},
        rotation_method="direct",
        position_method="global_absolute",
    )
    maps = raw_maps(cfg)
    maps["dims"] = maps["dims"].at[...].set(jnp.log(jnp.asarray([4.0, 2.0, 1.5])))
    dec = decode_box_maps(apply_activations(maps, cfg), cfg, BEV)
    assert np.allclose(np.asarray(dec["dims"][0, 0, 0]), [4, 2, 1.5], atol=1e-4)


def test_vector_rotation():
    cfg = BoxPredictionCfg(rotation_method="vector",
                           position_method="global_absolute",
                           dimensions_method="predict_abs_size",
                           activations={"pos": "none", "dims": "none",
                                        "rot": "none", "probs": "none"})
    maps = raw_maps(cfg)
    yaw = 0.7
    maps["rot"] = maps["rot"].at[...].set(
        jnp.asarray([np.sin(yaw), np.cos(yaw)])
    )
    dec = decode_box_maps(apply_activations(maps, cfg), cfg, BEV)
    assert np.allclose(np.asarray(dec["rot"][0, 0, 0, 0]), yaw, atol=1e-5)


def test_class_bins_rotation():
    cfg = BoxPredictionCfg(rotation_method="class_bins",
                           position_method="global_absolute",
                           dimensions_method="predict_abs_size",
                           activations={"pos": "none", "dims": "none",
                                        "rot": "none", "probs": "none"})
    maps = raw_maps(cfg)
    assert maps["rot"].shape[-1] == 36
    maps["rot"] = maps["rot"].at[..., 9].set(5.0)  # bin 9 -> 9 * 10deg
    dec = decode_box_maps(apply_activations(maps, cfg), cfg, BEV)
    assert np.allclose(np.asarray(dec["rot"][0, 0, 0, 0]),
                       9 * 2 * np.pi / 36, atol=1e-5)


def test_flatten_capacity():
    cfg = BoxPredictionCfg()
    dec = decode_box_maps(apply_activations(raw_maps(cfg), cfg), cfg, BEV)
    boxes = flatten_to_boxes(dec)
    assert boxes.k == 64 and boxes.pos.shape == (1, 64, 3)
