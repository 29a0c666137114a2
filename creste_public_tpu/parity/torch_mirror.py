"""Pure-torch mirrors of the reference models (golden parity oracles).

Every module here reproduces the corresponding reference module's numerics
with torch's own kernels and the reference's state_dict key names, so
state_dicts emitted by ``training.torch_import.export_torch_style`` (and, by
construction, the reference's released checkpoints after the standard
`model.` strip) load with ``load_state_dict(strict=...)``.

Reference targets (file:line into /root/reference):
  - EffNet / Up / static same padding: creste/models/blocks/effnet.py:8-98
    + efficientnet_pytorch's Conv2dStaticSamePadding / extract_endpoints
    semantics (the 224-image-size padding chain).
  - MultiLayerConv / ConvEncoder / ConvLayer / MultiScaleFCN:
    creste/models/blocks/conv.py:5,37,63,88
  - DepthCompletion metric depth: creste/models/depth.py:60-100 +
    creste/utils/depth_utils.py (convert_to_metric_depth_differentiable)
  - VisionEncoder: creste/models/vision_encoder.py:8
  - Camera2World / Camera2MapMulti / splat_soft:
    creste/models/blocks/splat_projection.py:12-354
  - InpaintingResNet18MultiHead / DeconvHead (torchvision resnet18 basic
    blocks, zero_init_residual): creste/models/blocks/inpainting.py:9-109
  - VIN value iteration: creste/models/blocks/vin.py:21-155
  - MultiPosConLoss (single rank): creste/models/losses/supcon_loss.py:56-116
  - DistillationBackbone heads: creste/models/distillation.py:18-208

These are *test oracles*: written for clarity and exact semantics, not speed.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

# ---------------------------------------------------------------------------
# EfficientNet-b0 (static same padding, 224-nominal chain)
# ---------------------------------------------------------------------------

B0_STAGES = [
    # (num_repeat, kernel, stride, expand, in_ch, out_ch)
    (1, 3, 1, 1, 32, 16),
    (2, 3, 2, 6, 16, 24),
    (2, 5, 2, 6, 24, 40),
    (3, 3, 2, 6, 40, 80),
    (3, 5, 1, 6, 80, 112),
    (4, 5, 2, 6, 112, 192),
    (1, 3, 1, 6, 192, 320),
]
SE_RATIO = 0.25


def _same_pad_amounts(in_hw, k, s):
    ih, iw = in_hw
    oh, ow = math.ceil(ih / s), math.ceil(iw / s)
    pad_h = max((oh - 1) * s + k - ih, 0)
    pad_w = max((ow - 1) * s + k - iw, 0)
    # F.pad order: (left, right, top, bottom)
    return (pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2)


class Conv2dStaticSamePadding(nn.Conv2d):
    """Conv with padding precomputed from a *nominal* image size
    (efficientnet_pytorch utils.Conv2dStaticSamePadding semantics)."""

    def __init__(self, in_ch, out_ch, kernel_size, stride=1, image_size=None,
                 bias=False, groups=1):
        super().__init__(in_ch, out_ch, kernel_size, stride=stride,
                         padding=0, bias=bias, groups=groups)
        assert image_size is not None
        self._static_pad = _same_pad_amounts(image_size, kernel_size, stride)

    def forward(self, x):
        x = F.pad(x, self._static_pad)
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class TorchMBConvBlock(nn.Module):
    """Mobile inverted bottleneck (efficientnet_pytorch MBConvBlock, eval)."""

    def __init__(self, in_ch, out_ch, kernel, stride, expand, image_size):
        super().__init__()
        self.in_ch, self.out_ch, self.stride = in_ch, out_ch, stride
        c = in_ch * expand
        bn = lambda ch: nn.BatchNorm2d(ch, momentum=0.01, eps=1e-3)
        if expand != 1:
            self._expand_conv = nn.Conv2d(in_ch, c, 1, bias=False)
            self._bn0 = bn(c)
        self._depthwise_conv = Conv2dStaticSamePadding(
            c, c, kernel, stride=stride, image_size=image_size, groups=c)
        self._bn1 = bn(c)
        n_sq = max(1, int(in_ch * SE_RATIO))
        self._se_reduce = nn.Conv2d(c, n_sq, 1, bias=True)
        self._se_expand = nn.Conv2d(n_sq, c, 1, bias=True)
        self._project_conv = nn.Conv2d(c, out_ch, 1, bias=False)
        self._bn2 = bn(out_ch)

    def forward(self, x):
        inp = x
        if hasattr(self, "_expand_conv"):
            x = F.silu(self._bn0(self._expand_conv(x)))
        x = F.silu(self._bn1(self._depthwise_conv(x)))
        se = F.adaptive_avg_pool2d(x, 1)
        se = self._se_expand(F.silu(self._se_reduce(se)))
        x = torch.sigmoid(se) * x
        x = self._bn2(self._project_conv(x))
        if self.stride == 1 and self.in_ch == self.out_ch:
            x = x + inp  # no drop-connect at eval
        return x


class TorchEffNetTrunk(nn.Module):
    """Stem (padding from the REAL image size — the reference swaps the stem,
    effnet.py:41-44) + 16 MBConv blocks on the 224-nominal padding chain, with
    efficientnet_pytorch's extract_endpoints semantics."""

    def __init__(self, in_ch=4, image_size=(512, 612), stage_repeats=None):
        super().__init__()
        self._conv_stem = Conv2dStaticSamePadding(
            in_ch, 32, 3, stride=2, image_size=image_size)
        self._bn0 = nn.BatchNorm2d(32, momentum=0.01, eps=1e-3)
        blocks = []
        nominal = (112, 112)  # 224-chain after the stride-2 stem
        for (rep, k, s, e, cin, cout) in B0_STAGES:
            if stage_repeats is not None:
                rep = min(rep, stage_repeats)
            for r in range(rep):
                stride = s if r == 0 else 1
                blocks.append(TorchMBConvBlock(
                    cin if r == 0 else cout, cout, k, stride, e, nominal))
                nominal = (math.ceil(nominal[0] / stride),
                           math.ceil(nominal[1] / stride))
        self._blocks = nn.ModuleList(blocks)

    def extract_endpoints(self, x):
        endpoints = {}
        x = F.silu(self._bn0(self._conv_stem(x)))
        prev = x
        for idx, block in enumerate(self._blocks):
            x = block(x)
            if prev.size(2) > x.size(2):
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            elif idx == len(self._blocks) - 1:
                endpoints[f"reduction_{len(endpoints) + 1}"] = x
            prev = x
        return endpoints


class TorchUp(nn.Module):
    """Reference Up (effnet.py:8-28)."""

    def __init__(self, inC, outC, scale_factor=2):
        super().__init__()
        self.up = nn.Upsample(scale_factor=scale_factor, mode="bilinear",
                              align_corners=False)
        self.conv = nn.Sequential(
            nn.Conv2d(inC, outC, 3, padding=1, bias=False),
            nn.BatchNorm2d(outC),
            nn.ReLU(inplace=True),
            nn.Conv2d(outC, outC, 3, padding=1, bias=False),
            nn.BatchNorm2d(outC),
            nn.ReLU(inplace=True),
        )

    def forward(self, x1, x2):
        x1 = self.up(x1)
        return self.conv(torch.cat([x2, x1], dim=1))


class TorchEffNet(nn.Module):
    """Reference EffNet (effnet.py:31-98) on the hand-built b0 trunk."""

    def __init__(self, inC, outC, image_size, downsample,
                 return_2nd_last_layer_output=True,
                 apply_final_batch_norm=False, stage_repeats=None):
        super().__init__()
        self.trunk = TorchEffNetTrunk(inC, tuple(image_size),
                                      stage_repeats=stage_repeats)
        channels = [320, 112, 40, 24, 16, inC]

        scaled = [tuple(image_size)]
        for _ in range(5):
            scaled.insert(0, (scaled[0][0] // 2, scaled[0][1] // 2))

        scale = 32 // downsample
        i = 0
        C = channels[0]
        while scale > 1:
            if not (scaled[i + 1][0] % 2 or scaled[i + 1][1] % 2):
                sf = 2
            else:
                sf = (scaled[i + 1][0] / scaled[i][0],
                      scaled[i + 1][1] / scaled[i][1])
            scale //= 2
            i += 1
            C += channels[i]
            setattr(self, f"up{i}", TorchUp(C, C, sf))
        self.n_ups = i
        self.conv = nn.Conv2d(C, outC, 1)
        self.apply_final_batch_norm = apply_final_batch_norm
        if apply_final_batch_norm:
            self.bn = nn.BatchNorm2d(outC)
        self.return_2nd_last_layer_output = return_2nd_last_layer_output

    def forward(self, x):
        endpoints = self.trunk.extract_endpoints(x)
        endpoints["reduction_0"] = x
        n = 5
        x = endpoints[f"reduction_{n}"]
        for i in range(1, self.n_ups + 1):
            x = getattr(self, f"up{i}")(x, endpoints[f"reduction_{n - i}"])
        y = self.conv(x)
        if self.apply_final_batch_norm:
            y = F.relu(self.bn(y))
        if self.return_2nd_last_layer_output:
            return y, x
        return y


class TorchVisionEncoder(nn.Module):
    """Reference VisionEncoder (vision_encoder.py:8-49): `.model` = EffNet."""

    def __init__(self, vision_cfg):
        super().__init__()
        eff = vision_cfg["effnet_cfgs"]
        self.model = TorchEffNet(
            inC=int(eff["in_channels"]), outC=int(eff["out_channels"]),
            image_size=tuple(eff["image_size"]),
            downsample=int(eff["downsample"]),
            return_2nd_last_layer_output=False,
            stage_repeats=eff.get("stage_repeats", None))

    def forward(self, x):
        return self.model(x)


# ---------------------------------------------------------------------------
# Generic conv stacks (conv.py)
# ---------------------------------------------------------------------------


class TorchMultiLayerConv(nn.Module):
    """Reference MultiLayerConv (conv.py:5-32): `.model` Sequential."""

    def __init__(self, cfg):
        super().__init__()
        kernels = list(cfg["kernels"])
        paddings = list(cfg["paddings"])
        dims = list(cfg["dims"])
        strides = list(cfg.get("stride", [1] * len(kernels)))
        norm = cfg.get("norm_type", None)
        m = []
        for i, k in enumerate(kernels):
            m.append(nn.Conv2d(dims[i], dims[i + 1], k, padding=paddings[i],
                               stride=strides[i]))
            if norm == "batch_norm":
                m.append(nn.BatchNorm2d(dims[i + 1]))
            m.append(nn.ReLU())
        self.model = nn.Sequential(*m)

    def forward(self, x):
        return self.model(x)


class TorchConvEncoder(nn.Module):
    """Reference ConvEncoder (conv.py:37-58): `.convs` Sequential."""

    def __init__(self, cfg):
        super().__init__()
        kernels = list(cfg["kernels"])
        paddings = list(cfg["paddings"])
        dims = list(cfg["dims"])
        norm = cfg.get("norm_type", None)
        m = []
        for i, k in enumerate(kernels):
            m.append(nn.Conv2d(dims[i], dims[i + 1], k, padding=paddings[i]))
            if norm == "batch_norm":
                m.append(nn.BatchNorm2d(dims[i + 1]))
            m.append(nn.ReLU())
        self.convs = nn.Sequential(*m)

    def forward(self, x):
        return self.convs(x)


class TorchConvLayer(nn.Sequential):
    """Reference ConvLayer (conv.py:63-85): named conv/norm/relu children."""

    def __init__(self, in_ch, out_ch, kernel=3, stride=1, bn=False,
                 norm_type="batch_norm", relu=True, bias=False):
        super().__init__()
        self.add_module("conv", nn.Conv2d(in_ch, out_ch, kernel, stride=stride,
                                          padding=kernel // 2, bias=bias))
        if bn:
            assert norm_type == "batch_norm"
            self.add_module("norm", nn.BatchNorm2d(out_ch))
        if relu:
            self.add_module("relu", nn.ReLU(inplace=True))


class TorchMultiScaleFCN(nn.Module):
    """Reference MultiScaleFCN (conv.py:88-161)."""

    def __init__(self, cfg):
        super().__init__()

        def stack(sub):
            kernels = list(sub["kernels"])
            dims = list(sub["dims"])
            strides = list(sub.get("stride", [1] * len(kernels)))
            return nn.Sequential(*[
                TorchConvLayer(dims[i], dims[i + 1], kernel=k,
                               stride=strides[i], bn=True,
                               norm_type=sub.get("norm_type", "batch_norm"))
                for i, k in enumerate(kernels)
            ])

        self.prepool = stack(cfg["prepool"])
        self.skip = stack(cfg["skip"])
        trunk_cfg = cfg["trunk"]
        trunk = [nn.MaxPool2d(2, 2)]
        dims = list(trunk_cfg["dims"])
        for i, k in enumerate(trunk_cfg["kernels"]):
            trunk.append(TorchConvLayer(dims[i], dims[i + 1], kernel=k))
            if trunk_cfg.get("norm_type") == "batch_norm":
                trunk.append(nn.BatchNorm2d(dims[i + 1]))
            trunk.append(nn.ReLU(inplace=True))
        trunk.append(nn.Upsample(scale_factor=2, mode="bilinear",
                                 align_corners=False))
        self.trunk = nn.Sequential(*trunk)
        self.postpool = stack(cfg["postpool"])

    def forward(self, x):
        x = self.prepool(x)
        skip = self.skip(x)
        t = self.trunk(x)
        return self.postpool(torch.cat([t, skip], dim=1))


# ---------------------------------------------------------------------------
# Depth completion
# ---------------------------------------------------------------------------


def torch_metric_depth_from_logits(logits, depth_min, depth_max, num_bins):
    """convert_to_metric_depth_differentiable (depth_utils.py:300-313):
    softmax expectation over linspace bin values. logits: [B, D, H, W]."""
    probs = F.softmax(logits, dim=1)
    values = torch.linspace(depth_min, depth_max, num_bins,
                            dtype=logits.dtype).view(1, -1, 1, 1)
    return (probs * values).sum(dim=1)


class TorchDepthCompletion(nn.Module):
    """Reference DepthCompletion (depth.py:17-159)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.vision_backbone = TorchVisionEncoder(cfg["vision_backbone"])
        self.depth_head = TorchMultiLayerConv(cfg["depth_head"])

    def forward(self, x):
        disc = self.cfg["discretize"]
        feats = self.vision_backbone(x)
        logits = self.depth_head(feats)
        metric_mm = torch_metric_depth_from_logits(
            logits, float(disc["depth_min"]), float(disc["depth_max"]),
            int(disc["num_bins"]))
        out = {
            "depth_preds_logits": logits,
            "depth_preds_metric": metric_mm / 1000.0,
            "depth_preds_bins": logits.argmax(dim=1),
        }
        if self.cfg["vision_backbone"].get("return_feats", True):
            out["depth_preds_feats"] = feats
        return out


class TorchDistillationBackbone(nn.Module):
    """Reference DistillationBackbone core path (distillation.py:18-208):
    DepthCompletion + dino_head (+ optional learnable PE map / pe_head)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.depthcomp = TorchDepthCompletion(cfg)
        dino_cfg = cfg["distillation_head"]["feature_head"]
        self.dino_head = TorchMultiLayerConv(dino_cfg)
        pe_cfg = cfg.get("pe_map", None)
        self.pe_cfg = pe_cfg
        if pe_cfg is not None:
            fdn = int(cfg["fdn_embed_dim"])
            self.learnable_pe_map = nn.Parameter(
                0.05 * torch.randn(1, fdn // 2, int(pe_cfg["height"]),
                                   int(pe_cfg["width"])))
            mods = [nn.Conv2d(fdn // 2, fdn, 1, bias=True)]
            if pe_cfg.get("use_norm", False):
                mods.append(nn.BatchNorm2d(fdn))
            self.pe_head = nn.Sequential(*mods)

    def forward(self, rgbd):
        """rgbd: [B*V, 4, H, W] -> dict (single-view core path)."""
        out = dict(self.depthcomp(rgbd))
        feats = out["depth_preds_feats"]
        dino_feats = self.dino_head(feats)
        if self.pe_cfg is not None:
            _, _, Hs, Ws = feats.shape
            pe = F.interpolate(self.learnable_pe_map, size=(Hs, Ws),
                               mode="bilinear", align_corners=False)
            pe = self.pe_head(pe)
            out["dino_pe"] = pe
            out["dino_pefree_feats"] = dino_feats
            out["dino_pe_feats"] = dino_feats + pe
        else:
            out["dino_pe_feats"] = dino_feats
        return out


# ---------------------------------------------------------------------------
# Camera2MapMulti splat (splat_projection.py:12-354)
# ---------------------------------------------------------------------------


class TorchCamera2MapMulti(nn.Module):
    def __init__(self, cfg, scatter_mode="mean"):
        super().__init__()
        self.cfg = cfg
        self.scatter_mode = scatter_mode
        self.min_weight = 1.0
        self.NC = int(cfg.get("num_cams", 1))
        pcr = torch.tensor(list(cfg["point_cloud_range"]), dtype=torch.float32)
        self.register_buffer("min_bound", pcr[:3].reshape(1, -1),
                             persistent=False)
        self.register_buffer("max_bound", pcr[3:].reshape(1, -1),
                             persistent=False)
        self.register_buffer("voxel_size",
                             torch.tensor(list(cfg["voxel_size"]),
                                          dtype=torch.float32),
                             persistent=False)
        self.grid_size = (
            int(round(float(pcr[3] - pcr[0]) / float(self.voxel_size[0]))),
            int(round(float(pcr[4] - pcr[1]) / float(self.voxel_size[1]))),
        )
        self.register_buffer("lidar2map", torch.tensor([
            [0, -1, 0, -float(pcr[0])],
            [-1, 0, 0, -float(pcr[1])],
            [0, 0, -1, -float(pcr[2])],
            [0, 0, 0, 1]], dtype=torch.float32), persistent=False)
        zdim = int(cfg["z_embed_dim"])
        self.z_proj = nn.Sequential(
            nn.Linear(1, zdim * 2, bias=True), nn.ReLU(),
            nn.Linear(zdim * 2, zdim, bias=True), nn.ReLU())
        self.vision_fusion = TorchConvEncoder(cfg["vision_fusion"])

    @staticmethod
    def cam2world(depth, p2p):
        """Camera2World (splat_projection.py:12-51): [u*d, v*d, d, 1] @ p2p^T.

        depth: [B, N, H, W]; p2p: [B, N, 4, 4] -> xyz [B, N, 3, H, W]."""
        B, N, H, W = depth.shape
        v, u = torch.meshgrid(torch.arange(H, dtype=depth.dtype),
                              torch.arange(W, dtype=depth.dtype),
                              indexing="ij")
        pix = torch.stack([u * depth, v * depth, depth,
                           torch.ones_like(depth)], dim=-1)  # [B,N,H,W,4]
        xyz = torch.einsum("bnij,bnhwj->bnhwi", p2p, pix)[..., :3]
        return xyz.permute(0, 1, 4, 2, 3)

    def splat_soft(self, points_2d, points_features, grid_size):
        """Bilinear 4-corner scatter onto the BEV grid.

        Semantics pinned against the reference's own splat_soft
        (splat_projection.py:262-354) by tests/test_reference_exec.py:
        every point votes into the four cells surrounding it with
        bilinear weights; corners falling off the grid are redirected to
        cell 0 carrying zero weight (so they change nothing); 'mean'
        normalizes by the accumulated vote mass clamped from below;
        'max' is an amax against a zeros-initialized accumulator.

        Formulation: one vectorized pass over an explicit corner axis
        (4x the points, a single scatter per tensor) instead of a
        per-corner loop.
        """
        H, W = grid_size
        ba, C, n = points_features.shape
        base = points_2d.floor()
        frac = points_2d - base
        # corner offsets [4, 2] in (x, y); per-axis weight is (1 - frac)
        # for the low corner and frac for the high corner
        corner = points_2d.new_tensor(
            [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
        per_axis = torch.where(
            corner.view(1, 1, 4, 2) > 0,
            frac[:, :, None, :], 1.0 - frac[:, :, None, :])
        w4 = per_axis.prod(dim=-1)                       # [ba, n, 4]
        cell = base[:, :, None, :] + corner              # [ba, n, 4, 2]
        inb = ((cell >= 0)
               & (cell < points_2d.new_tensor([float(W), float(H)]))
               ).all(dim=-1)
        flat = (cell[..., 1] * W + cell[..., 0]).long() * inb  # OOB -> 0
        w4 = w4 * inb.type_as(w4)

        flat = flat.reshape(ba, n * 4)
        w4 = w4.reshape(ba, n * 4)
        densities = points_features.new_zeros(ba, H * W)
        densities.scatter_add_(1, flat, w4)

        votes = points_features[:, :, :, None] * w4.view(ba, 1, n, 4)
        votes = votes.reshape(ba, C, n * 4)
        idx = flat[:, None, :].expand(ba, C, n * 4)
        features = points_features.new_zeros(ba, C, H * W)
        if self.scatter_mode in ("mean", "sum"):
            features.scatter_add_(2, idx, votes)
            if self.scatter_mode == "mean":
                features = features / densities[:, None, :].clamp(
                    self.min_weight)
        elif self.scatter_mode == "max":
            features = features.scatter_reduce(
                2, idx, votes, reduce="amax", include_self=True)
        else:
            raise ValueError(self.scatter_mode)
        return features, densities[:, :, None]

    def forward(self, depth, feats, p2p, mv_mask=None):
        """depth [B,N,H,W], feats [B,N,F,H,W], p2p [B,N,4,4]."""
        B, N, Fc, H, W = feats.shape
        xyz = self.cam2world(depth, p2p)  # [B,N,3,H,W]
        z = xyz[:, :, 2].permute(0, 1, 2, 3).reshape(B * N * H * W, 1)
        z_feats = self.z_proj(z).view(B, N, H, W, -1).permute(0, 1, 4, 2, 3)
        feats = torch.cat([feats, z_feats], dim=2)
        feats = self.vision_fusion(feats.view(B * N, -1, H, W))
        C = feats.shape[1]
        feats = feats.view(B, N, C, H, W)

        pts = xyz.permute(0, 1, 3, 4, 2).reshape(B * N, H * W, 3)
        mask = torch.all((pts < self.max_bound) & (pts >= self.min_bound),
                         dim=2, keepdim=True)
        mask = mask.view(B, N, 1, H, W)
        suffix = ""
        if mv_mask is not None:
            mask = mask * mv_mask.unsqueeze(2)
            suffix = "_mv"
        feats = feats * mask

        NS = N // self.NC
        xyz_f = xyz.permute(0, 1, 3, 4, 2).reshape(B * NS,
                                                   self.NC * H * W, 3)
        feats_f = feats.permute(0, 1, 3, 4, 2).reshape(
            B, NS, self.NC * H * W, C).permute(0, 1, 3, 2).reshape(
            B * NS, C, self.NC * H * W)
        ones = torch.ones_like(xyz_f[:, :, :1])
        pts_h = torch.cat([xyz_f, ones], dim=2)
        mapped = (self.lidar2map @ pts_h.permute(0, 2, 1)).permute(0, 2, 1)
        xy = mapped[:, :, :2] / self.voxel_size[:2]

        sf, sd = self.splat_soft(xy, feats_f, self.grid_size)
        Hg, Wg = self.grid_size
        return {
            f"bev_features{suffix}": sf.view(B * NS, C, Hg, Wg),
            f"bev_densities{suffix}": sd.view(B * NS, Hg, Wg, 1).permute(
                0, 3, 1, 2),
            f"bev_coords{suffix}": xy,
        }


# ---------------------------------------------------------------------------
# ResNet18 BEV decoder (inpainting.py)
# ---------------------------------------------------------------------------


class TorchBasicBlock(nn.Module):
    """torchvision BasicBlock key layout (conv1/bn1/conv2/bn2/downsample)."""

    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        nn.init.zeros_(self.bn2.weight)  # zero_init_residual=True
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_ch))
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + identity)


class TorchDeconvHead(nn.Module):
    """Reference DeconvHead (inpainting.py:52-68)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.up1 = TorchUp(in_ch, 256, scale_factor=4)
        self.up2 = nn.Sequential(
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False),
            nn.Conv2d(256, 128, 3, padding=1, bias=False),
            nn.BatchNorm2d(128),
            nn.ReLU(inplace=True))
        self.proj = nn.Conv2d(128, out_ch, 1)

    def forward(self, x1, x2):
        x = self.up1(x1, x2)
        x = self.up2(x)
        return self.proj(x), x


class TorchInpaintingResNet18MultiHead(nn.Module):
    """Reference InpaintingResNet18MultiHead (inpainting.py:70-109)."""

    def __init__(self, num_input_features, num_classes, output_prefix,
                 input_key="bev_features", learnable_loss_weight=False):
        super().__init__()
        self.input_key = input_key
        self.output_prefix = list(output_prefix)
        self.conv1 = nn.Conv2d(num_input_features, 64, 7, stride=2, padding=3,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64),
                                    TorchBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TorchBasicBlock(64, 128, 2),
                                    TorchBasicBlock(128, 128))
        self.layer3 = nn.Sequential(TorchBasicBlock(128, 256, 2),
                                    TorchBasicBlock(256, 256))
        self.out_heads = nn.ModuleList(
            [TorchDeconvHead(64 + 256, n) for n in num_classes])
        if learnable_loss_weight:
            self.log_var = nn.Parameter(torch.zeros(1))
        else:
            self.log_var = None

    def forward(self, tensor_dict, key_suffix=""):
        x = tensor_dict[f"{self.input_key}{key_suffix}"]
        x = F.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x)
        x = self.layer2(x1)
        x = self.layer3(x)
        ret = {}
        for head, prefix in zip(self.out_heads, self.output_prefix):
            pred, fea = head(x, x1)
            p = f"{prefix}{key_suffix}" if prefix == "inpainting_sam" else prefix
            ret[f"{p}_preds"] = pred
            ret[f"{p}_features"] = fea
        if self.log_var is not None:
            ret["log_variance"] = self.log_var
        return ret


# ---------------------------------------------------------------------------
# Temporal MergeUnit / ConvGRU (rnn.py:8-146, convgru.py:13-120)
# ---------------------------------------------------------------------------


class TorchConvGRUCell(nn.Module):
    """Reference ConvGRUCell (convgru.py:13-90): GRU/MRU gating."""

    def __init__(self, input_dim, hidden_dim, kernel_size=(1, 1),
                 cell_type="GRU"):
        super().__init__()
        self.cell_type = cell_type
        self.hidden_dim = hidden_dim
        pad = (kernel_size[0] // 2, kernel_size[1] // 2)
        gate_out = hidden_dim + hidden_dim * (cell_type == "GRU")
        self.conv_gates = nn.Conv2d(input_dim + hidden_dim, gate_out,
                                    kernel_size, padding=pad, bias=True)
        self.conv_can = nn.Conv2d(input_dim + hidden_dim, hidden_dim,
                                  kernel_size, padding=pad, bias=True)

    def forward(self, x, h):
        combined = torch.cat([x, h], dim=1)
        gates = self.conv_gates(combined)
        if self.cell_type == "GRU":
            gamma, beta = torch.split(gates, self.hidden_dim, dim=1)
            reset = torch.sigmoid(gamma)
            update = torch.sigmoid(beta)
        else:  # MRU
            reset = update = torch.sigmoid(gates)
        cand = torch.tanh(self.conv_can(torch.cat([x, reset * h], dim=1)))
        return (1 - update) * h + update * cand


class TorchConvGRU(nn.Module):
    """Reference ConvGRU stack (convgru.py:120-320, pose-free path):
    `.cell_list` ModuleList, batch-first [B, T, C, H, W]."""

    def __init__(self, input_dim, hidden_dims, kernel_size=(1, 1),
                 cell_type="GRU"):
        super().__init__()
        cells = []
        for i, hd in enumerate(hidden_dims):
            cin = input_dim if i == 0 else hidden_dims[i - 1]
            cells.append(TorchConvGRUCell(cin, hd, kernel_size, cell_type))
        self.cell_list = nn.ModuleList(cells)

    def forward(self, x, hidden_state=None):
        B, T = x.shape[:2]
        outs, lasts = x, []
        for li, cell in enumerate(self.cell_list):
            h = (hidden_state[li] if hidden_state is not None
                 else x.new_zeros(B, cell.hidden_dim, *x.shape[-2:]))
            ys = []
            for t in range(T):
                h = cell(outs[:, t], h)
                ys.append(h)
            outs = torch.stack(ys, dim=1)
            lasts.append(h)
        return outs, lasts


class TorchMergeUnit(nn.Module):
    """Reference MergeUnit (rnn.py:8-146): optional bias-free 1x1 ConvLayer
    + grouped batch-folded ConvGRU with bos reset."""

    def __init__(self, cfg):
        super().__init__()
        rnn_in = cfg.get("rnn_input_channels", None)
        self.pre_rnn_conv = (
            TorchConvLayer(int(cfg["input_channels"]), int(rnn_in),
                           kernel=1, bn=True)
            if rnn_in is not None else None
        )
        rc = cfg.get("rnn_config", None)
        self.rnn_cfg = rc
        if rc is not None:
            self.groups = int(rc.get("groups", 1))
            cin = int(rnn_in if rnn_in is not None
                      else cfg["input_channels"]) // self.groups
            hidden = [int(h) // self.groups for h in rc["hidden_dims"]]
            self.rnn = TorchConvGRU(cin, hidden,
                                    tuple(rc.get("kernel_size", (1, 1))),
                                    rc.get("cell_type", "GRU"))

    def forward(self, x, t=1, hidden_state=None):
        """x: [B*T, C, H, W]; returns ([B*T, C', H, W], hidden list)."""
        if self.pre_rnn_conv is not None:
            x = self.pre_rnn_conv(x)
        if self.rnn_cfg is None:
            return x, None
        bt, c, h, w = x.shape
        b = bt // t
        g = self.groups
        if g > 1:
            x = x.reshape(b, t, g, c // g, h, w).transpose(1, 2).reshape(
                b * g, t, c // g, h, w)
        else:
            x = x.reshape(b, t, c, h, w)
        ys, lasts = self.rnn(x, hidden_state)
        cl = ys.shape[2]
        if g > 1:
            ys = ys.reshape(b, g, t, cl, h, w).transpose(1, 2)
        ys = ys.reshape(bt, -1, h, w)
        return ys, [s.detach() for s in lasts]


# ---------------------------------------------------------------------------
# VIN (vin.py)
# ---------------------------------------------------------------------------


def vin_action_kernels(num_actions=8):
    """The reference's fixed `w` buffer (vin.py:36-46): [A, 1, 3, 3]."""
    w = torch.zeros(num_actions, 1, 3, 3)
    left = [[1, 0], [0, 0], [0, 1], [2, 0], [0, 2], [2, 1], [2, 2], [1, 2]]
    center = [[0, 0], [0, 1], [0, 2], [1, 0], [1, 2], [2, 0], [2, 1], [2, 2]]
    right = [[0, 1], [0, 2], [1, 2], [0, 0], [2, 2], [1, 0], [2, 0], [2, 1]]
    for i in range(num_actions):
        w[i, 0, left[i][0], left[i][1]] += 0.1
        w[i, 0, center[i][0], center[i][1]] += 0.8
        w[i, 0, right[i][0], right[i][1]] += 0.1
    return w


def torch_value_iteration(r, threshold=1e-3, discount=0.99, max_iters=100000):
    """Reference value_iteration_manual (vin.py:48-80). r: [B, 1, H, W]."""
    w = vin_action_kernels().to(r.dtype)

    def eval_q(v):
        return F.conv2d(r + v * discount, w, stride=1, padding=1)

    v = torch.zeros_like(r)
    for _ in range(max_iters):
        q = eval_q(v)
        new_v = q.max(dim=1, keepdim=True)[0]
        delta = (new_v - v).abs().max().item()
        v = new_v
        if delta <= threshold:
            break
    q = eval_q(v)
    policy = q - q.max(dim=1, keepdim=True)[0]
    exps = torch.exp(policy)
    return v, exps / exps.sum(dim=1, keepdim=True), q


class TorchVIN(nn.Module):
    """Reference VIN forward (vin.py:94-155), reward path + optional solve."""

    def __init__(self, reward_cfg, qvalue_cfg):
        super().__init__()
        self.reward_cfg = reward_cfg
        self.discount = float(qvalue_cfg.get("discount", 0.95))
        self.r = TorchMultiScaleFCN(reward_cfg["net_kwargs"])

    def forward(self, feat_map, S=None, solve_mdp=False):
        input_view = torch.cat([feat_map[k] for k in
                                self.reward_cfg["input_keys"]], dim=1)
        Ho, Wo = input_view.shape[-2:]
        ds = int(self.reward_cfg["ds"])
        input_view = F.max_pool2d(input_view, kernel_size=ds, stride=ds)
        B, C, H, W = input_view.shape
        input_view = input_view[:, :, :H // 2, :].detach()
        r = self.r(input_view)
        with torch.no_grad():
            full_r = torch.zeros(B, 1, Ho, Wo, dtype=r.dtype)
            full_r[:, :, :Ho // 2, :] = F.interpolate(
                r, size=(Ho // 2, Wo), mode="bilinear", align_corners=False)
        prefix = self.reward_cfg["output_prefix"][0]
        out = {prefix: r, f"{prefix}_full": full_r, "input_view": input_view}
        if solve_mdp:
            with torch.no_grad():
                v, policy, q = torch_value_iteration(
                    r, threshold=1e-3, discount=self.discount)
            out.update({"policy": policy, "q_estimate": q,
                        "value_estimate": v})
        return out


# ---------------------------------------------------------------------------
# TerrainNet composite (terrainnet.py:24-350, inference path)
# ---------------------------------------------------------------------------


class TorchTerrainNet(nn.Module):
    """Stage-2 composite mirror: depthcomp -> splat -> BEV decoder."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        cls_name = cfg["vision_backbone"].get("class_name",
                                              "DistillationBackbone")
        if cls_name == "DistillationBackbone":
            self.depthcomp = TorchDistillationBackbone(cfg)
        else:
            self.depthcomp = TorchDepthCompletion(cfg)
        self.cam2map = TorchCamera2MapMulti(cfg["camera_projector"],
                                            scatter_mode="mean")
        bev = cfg["bev_classifier"]["net_kwargs"]
        nin = bev.get("num_input_features",
                      cfg["camera_projector"]["vision_fusion"]["dims"][-1])
        self.bevclassifier = TorchInpaintingResNet18MultiHead(
            nin, list(bev["num_classes"]), list(bev["output_prefix"]),
            input_key=bev.get("input_key", "bev_features"),
            learnable_loss_weight=bev.get("learnable_loss_weight", False))

    def forward(self, rgbd, p2p):
        """rgbd: [B, N, 4, H, W]; p2p: [B, N, 4, 4]."""
        B, N, C, H, W = rgbd.shape
        outputs = dict(self.depthcomp(rgbd.view(B * N, C, H, W)))
        splat_key = self.cfg["camera_projector"].get("splat_key",
                                                     "depth_preds_feats")
        feats = outputs[splat_key]
        Z, Hs, Ws = feats.shape[-3], feats.shape[-2], feats.shape[-1]
        depth = outputs["depth_preds_metric"].view(B, N, Hs, Ws)
        feats = feats.view(B, N, Z, Hs, Ws)
        outputs.update(self.cam2map(depth, feats, p2p))
        outputs.update(self.bevclassifier(outputs))
        return outputs


class TorchMaxEntIRLReward(nn.Module):
    """Stage-3 inference mirror (lfd.py:314-392 with solve_mdp=False):
    frozen TerrainNet backbone + VIN reward head — the deployed graph
    (scripts/runtime/compile.py:160-210)."""

    def __init__(self, cfg):
        super().__init__()
        self.backbone = TorchTerrainNet(cfg["vision_backbone"])
        self.traversability_head = TorchVIN(
            cfg["traversability_head"]["net_kwargs"]["reward_cfg"],
            cfg["traversability_head"]["net_kwargs"]["qvalue_cfg"])

    def forward(self, rgbd, p2p):
        outputs = self.backbone(rgbd, p2p)
        outputs.update(self.traversability_head(outputs, solve_mdp=False))
        return outputs


# ---------------------------------------------------------------------------
# Expected SVF propagation (lfd.py:56-70, 156-232)
# ---------------------------------------------------------------------------


def svf_transition_kernels(num_actions=8):
    """The reference's inverse-transition buffer (lfd.py:56-70): one unit
    tap per action at the `center` position. [A, 1, 3, 3]."""
    w = torch.zeros(num_actions, 1, 3, 3)
    center = [[2, 2], [2, 1], [2, 0], [1, 2], [1, 0], [0, 2], [0, 1], [0, 0]]
    for i in range(num_actions):
        w[i, 0, center[i][0], center[i][1]] = 1.0
    return w


def torch_expected_svf(policy, s0, s1, horizon, zero_terminal_state=False,
                       temperature=None):
    """Reference expected_state_visitation_frequency core loop
    (lfd.py:190-232): depthwise inverse-transition conv propagation.

    policy: [B, A, H, W]; s0/s1: [B] linear states. Returns mu [B, H, W].
    """
    B, A, H, W = policy.shape
    n = H * W
    if temperature is not None:
        logits = policy - policy.max(dim=1, keepdim=True)[0]
        policy = F.softmax(logits / temperature, dim=1)
    w = svf_transition_kernels(A)
    mu = torch.zeros(B, horizon, n)
    mu[torch.arange(B), 0, s0] = 1.0
    for t in range(1, horizon):
        if zero_terminal_state:
            mu[torch.arange(B), t - 1, s1] = 0.0
        prev = mu[:, t - 1].clone().view(B, 1, H, W)
        policy_mu = policy * prev
        new_mu = F.conv2d(policy_mu, w, stride=1, padding=1, groups=A)
        mu[:, t] = new_mu.sum(dim=1).view(B, n)
    return mu.sum(dim=1).view(B, H, W)


def torch_compute_expert_visitation(xy, map_ds, map_sz):
    """Reference MaxEntIRLLoss.compute_expert_visitation
    (loss_utils.py:1055-1116, second definition): data-dependent
    max_steps = ceil(max segment length), per-segment linspace
    interpolation, final-pose append, scatter ones, clamp to 1.

    xy: [B, T, 2] full-res BEV (row, col). Returns [B, H, W] in {0, 1}.
    """
    H, W = map_sz
    pts = xy.float() / map_ds
    start, end = pts[:, :-1], pts[:, 1:]
    distances = torch.norm(end - start, dim=-1)
    max_steps = int(torch.ceil(distances).long().max().item())
    t = torch.linspace(0, 1, max_steps).view(1, 1, -1, 1)
    interp = start.unsqueeze(2) + t * (end - start).unsqueeze(2)
    interp = interp.reshape(pts.shape[0], -1, 2)
    interp = torch.cat([interp, pts[:, -1:]], dim=1)
    x = interp[:, :, 0].clamp(0, H - 1).long()
    y = interp[:, :, 1].clamp(0, W - 1).long()
    lin = x * W + y
    counts = torch.zeros(pts.shape[0], H * W)
    counts.scatter_add_(1, lin, torch.ones_like(lin, dtype=torch.float32))
    counts[counts > 1] = 1
    return counts.view(-1, H, W)


# ---------------------------------------------------------------------------
# MultiPosConLoss, single rank (supcon_loss.py:56-116)
# ---------------------------------------------------------------------------


def torch_multi_pos_con_loss(feats, labels, temperature=0.1,
                             class_weights=None):
    """Single-rank reference MultiPosConLoss on [M, Z] feats, [M] labels."""
    feats = F.normalize(feats, dim=-1, p=2)
    M = feats.shape[0]
    mask = torch.eq(labels.view(-1, 1), labels.view(1, -1)).float()
    logits_mask = torch.scatter(torch.ones_like(mask), 1,
                                torch.arange(M).view(-1, 1), 0)
    mask = mask * logits_mask
    logits = feats @ feats.T / temperature
    logits = logits - (1 - logits_mask) * 1e9
    logits = logits - logits.max(dim=-1, keepdim=True)[0].detach()
    p = mask / mask.sum(1, keepdim=True).clamp(min=1.0)
    q = F.log_softmax(logits, dim=-1)
    loss = torch.sum(p * q, dim=-1)
    if class_weights is not None:
        loss = loss * class_weights[labels]
    return -loss.mean()


# ---------------------------------------------------------------------------
# state_dict loading helper
# ---------------------------------------------------------------------------


def load_exported_state_dict(module: nn.Module, sd: dict, prefix: str = "",
                             strip: str = "model.", strict: bool = True):
    """Load an export_torch_style state_dict (keys 'model.<ref path>') into a
    mirror module. `prefix` selects a submodule's keys (e.g. 'depthcomp.')."""
    out = {}
    for k, v in sd.items():
        if strip and k.startswith(strip):
            k = k[len(strip):]
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        out[k] = torch.as_tensor(np.asarray(v))
    missing, unexpected = module.load_state_dict(out, strict=False)
    real_missing = [m for m in missing if "num_batches_tracked" not in m]
    if strict and (real_missing or unexpected):
        raise KeyError(f"missing={real_missing} unexpected={unexpected}")
    return missing, unexpected
