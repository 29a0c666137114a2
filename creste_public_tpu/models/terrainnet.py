"""TerrainNet: RGBD backbone -> BEV splat -> multi-head BEV decoder.

Parity target: creste/models/terrainnet.py:24-350. Stage-2 composite model:
DistillationBackbone (or plain DepthCompletion) encodes RGBD, the splat
projects ``splat_key`` features into the 256x256 BEV grid, and the
InpaintingResNet18MultiHead decoder emits SAM-instance embeddings, dynamic
class logits and elevation. Optional ConvGRU temporal aggregation and the
training-time movability double-forward are supported.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from creste_public_tpu.models.blocks.resnet import InpaintingResNet18MultiHead
from creste_public_tpu.models.blocks.splat import Camera2MapMulti
from creste_public_tpu.models.depth_completion import DepthCompletion
from creste_public_tpu.models.distillation import DistillationBackbone

Array = Any

_BACKBONES = {
    "DistillationBackbone": DistillationBackbone,
    "DepthCompletion": DepthCompletion,
}


class TerrainNet(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(
        self,
        rgbd: Array,
        p2p: Array,
        mv_mask: Array | None = None,
        train: bool = False,
        temporal_hidden: list | None = None,
        bos: bool = True,
        pose: Array | None = None,
    ) -> dict[str, Array]:
        """
        Args:
          rgbd: [B, N, H, W, 4] RGBD frames.
          p2p: [B, N, 4, 4] pixel->point transforms.
          mv_mask: optional [B, N, H, W] immovable mask (training).
          pose: optional [B, N, 4, 4] per-frame SE(3) poses, required when
            ``temporal_layer.net_kwargs.rnn_config.use_pose`` — forwarded
            to MergeUnit for pose-warped hidden state (the reference
            carries the same plumbing commented out at rnn.py:59-127).

        Returns the merged NHWC tensor dict (depth_*, dino_*, bev_*,
        inpainting_*_preds/features, elevation_preds, ...).
        """
        cfg = self.cfg
        vision_cfg = cfg["vision_backbone"]
        cls_name = vision_cfg.get("class_name", "DistillationBackbone")
        backbone = _BACKBONES[cls_name](cfg, name="depthcomp")

        B, N, H, W, C = rgbd.shape
        if cls_name == "DistillationBackbone":
            outputs = dict(backbone(rgbd, p2p, train=train))
        else:
            outputs = dict(backbone(rgbd.reshape(B * N, H, W, C), train=train))

        splat_key = cfg["camera_projector"].get("splat_key", "depth_preds_feats")
        assert splat_key in outputs, f"Expected {splat_key} in backbone outputs"
        feats = outputs[splat_key]
        Hs, Ws, Z = feats.shape[-3], feats.shape[-2], feats.shape[-1]
        # group by the actual frame count (temporal mode feeds N > views)
        depth = outputs["depth_preds_metric"].reshape(B, N, Hs, Ws)
        feats = feats.reshape(B, N, Hs, Ws, Z)

        cam2map = Camera2MapMulti(
            cfg["camera_projector"], scatter_mode="mean", name="cam2map"
        )
        use_movability = bool(cfg.get("use_movability", False))
        if train and use_movability:
            # anchor view splat + multiview masked splat (terrainnet.py:310-319)
            outputs.update(
                cam2map(depth[:, 0:1], feats[:, 0:1], p2p[:, 0:1], train=train)
            )
            if mv_mask is not None:
                outputs.update(
                    cam2map(depth, feats, p2p, mv_mask=mv_mask, train=train)
                )
        else:
            outputs.update(cam2map(depth, feats, p2p, train=train))

        if cfg.get("use_temporal", False):
            from creste_public_tpu.models.blocks.convgru import MergeUnit

            t_cfg = cfg["temporal_layer"]["net_kwargs"]
            ns = outputs["bev_features"].shape[0] // B
            rnn_cfg = t_cfg.get("rnn_config", None) or {}
            pose_bt = None
            if rnn_cfg.get("use_pose", False):
                if pose is None:
                    raise ValueError(
                        "rnn_config.use_pose=True needs a 'pose' batch key "
                        "threaded into TerrainNet ([B, N, 4, 4]); the "
                        "reference's model-level plumbing is commented out "
                        "at rnn.py:59-127 — pass pose=batch['pose']"
                    )
                pose_bt = pose.reshape(B * ns, 4, 4)
            merged = MergeUnit(t_cfg, name="temporal_layer")(
                outputs["bev_features"], t=ns, train=train,
                hidden=temporal_hidden, bos=bos, pose=pose_bt,
            )
            if isinstance(merged, tuple):
                merged, hidden = merged
                outputs["temporal_hidden"] = hidden
            outputs["merged_bev_features"] = merged.reshape(
                B, ns, *merged.shape[1:]
            )[:, -1]

        bev_cfg = cfg.get("bev_classifier", None)
        if bev_cfg is not None:
            decoder = InpaintingResNet18MultiHead(
                num_classes=tuple(bev_cfg["net_kwargs"]["num_classes"]),
                output_prefix=tuple(bev_cfg["net_kwargs"]["output_prefix"]),
                input_key=bev_cfg["net_kwargs"].get("input_key", "bev_features"),
                learnable_loss_weight=bev_cfg["net_kwargs"].get(
                    "learnable_loss_weight", False
                ),
                merged_heads=bev_cfg["net_kwargs"].get(
                    "merged_heads", False
                ),
                name="bevclassifier",
            )
            if train and use_movability and mv_mask is not None:
                outputs.update(decoder(outputs, train=train))
                outputs.update(decoder(outputs, key_suffix="_mv", train=train))
            else:
                outputs.update(decoder(outputs, train=train))
        return outputs
