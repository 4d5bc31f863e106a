"""BoxLearner facade: network selection + activation + decode.

Behavioral reference: liso/networks/simple_net/simple_net.py:29-170. Wraps a
detector network (centerpoint / transfusion / echo_gt; pointpillars has its
own anchor pipeline) and applies the per-attribute activations and box decode
to produce (flat Boxes, decoded maps, activated maps)."""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from liso_tpu.models.box_decode import (
    BoxPredictionCfg,
    apply_activations,
    decode_box_maps,
    flatten_to_boxes,
)
from liso_tpu.models.centerpoint import CenterPointNet
from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.boxes import Boxes


class BoxLearner(nn.Module):
    bev: BevSetup
    box_cfg: BoxPredictionCfg = BoxPredictionCfg()
    network: str = "centerpoint"
    hid_dim: int = 64
    use_baseline_parameters: bool = True
    compute_dtype: object = None
    num_decoder_layers: int = 1  # transfusion_net.py:49

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        valid: jnp.ndarray,
        gt_boxes: Optional[Boxes] = None,
        train: bool = False,
        prepared=None,  # shared pillar prep (prepare_pillar_inputs)
        pillar_image=None,  # (img, occ) from fused_scatter_images
        point_feats_only: bool = False,
    ) -> Tuple[Boxes, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], Any]:
        if self.network == "echo_gt":
            # debug network returning ground truth (simple_net.py:78-82)
            assert gt_boxes is not None
            return gt_boxes, {}, {}, None
        if self.network == "centerpoint":
            net = CenterPointNet(
                self.bev,
                head_channels=self.box_cfg.head_channels(),
                hid_dim=self.hid_dim,
                use_baseline_parameters=self.use_baseline_parameters,
                dtype=self.compute_dtype,
                name="model",
            )
        elif self.network == "transfusion":
            from liso_tpu.models.transfusion import TransFusionNet

            net = TransFusionNet(
                self.bev,
                head_channels=self.box_cfg.head_channels(),
                hid_dim=self.hid_dim,
                num_decoder_layers=self.num_decoder_layers,
                dtype=self.compute_dtype,
                name="model",
            )
        else:
            raise NotImplementedError(self.network)
        aux = {}
        if self.network != "centerpoint" and (
            point_feats_only or pillar_image is not None
        ):
            # only the centerpoint path consumes these; failing loudly
            # beats silently re-encoding the cloud / returning a 4-tuple
            raise NotImplementedError(
                "point_feats_only/pillar_image require network='centerpoint'"
                f", got {self.network!r}"
            )
        if self.network == "transfusion":
            raw_maps, occ, tf_aux = net(points, valid, train=train)
            aux["heatmap"] = tf_aux["dense_heatmap"]
            aux["layer_maps"] = tf_aux["layer_maps"]
            aux["query_heatmap_score"] = tf_aux["query_heatmap_score"]
        elif point_feats_only:
            return net(points, valid, train=train, prepared=prepared,
                       point_feats_only=True)
        else:
            raw_maps, occ = net(points, valid, train=train,
                                prepared=prepared, pillar_image=pillar_image)
        aux["occupancy"] = occ
        activated = apply_activations(raw_maps, self.box_cfg)
        decoded = decode_box_maps(activated, self.box_cfg, self.bev)
        flat_boxes = flatten_to_boxes(decoded)
        return flat_boxes, decoded, activated, aux
