"""Terminal parity oracle: execute the REFERENCE'S OWN code.

The golden chain elsewhere in this repo is flax <-> parity/torch_mirror.py,
both authored here — a shared misreading of the reference would be invisible
to it. These tests close that loop: dependency-free reference functions are
AST-extracted from /root/reference source text AT TEST TIME (never copied
into the repo) and executed with stubbed imports, then asserted equal to
BOTH the torch mirror and the flax/JAX implementation on randomized inputs:

    reference == torch_mirror == flax

Covered (VERDICT round-2 item #1):
  value_iteration_manual       creste/models/blocks/vin.py:48-80 (+ w build 36-46)
  splat_soft mean/sum/max      creste/models/blocks/splat_projection.py:262-354
  expected SVF propagation     creste/models/lfd.py:156-277 (+ kernels 59-70)
  compute_expert_visitation    creste/utils/loss_utils.py:1055-1116
  MultiPosConLoss single-rank  creste/models/losses/supcon_loss.py:25-116
  ConvGRUCell GRU/MRU          creste/models/blocks/convgru.py:13-90
  create_trapezoidal_fov_mask  creste/utils/train_utils.py:511-560
  earliest_pose_in_fov         creste/utils/train_utils.py:765-800
  convert_poses_to_tf          creste/datasets/coda_helpers.py:74-87
  bin_depths UD/LID/SID        creste/utils/depth_utils.py:346-384
  CrossEntropyDepth/SmoothL1*  creste/utils/loss_utils.py:477-603
"""
from __future__ import annotations

import ast
import math
import textwrap
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional  # noqa: F401  (exposed as F to extracted code)

from creste_public_tpu.data import calib
from creste_public_tpu.losses import manager as lm
from creste_public_tpu.losses.supcon import multi_pos_con_loss
from creste_public_tpu.models.blocks.convgru import ConvGRUCell
from creste_public_tpu.ops.rasterize import rasterize_trajectory
from creste_public_tpu.ops.splat import splat_bilinear
from creste_public_tpu.ops.svf import expected_svf, greedy_rollout, sharpen_policy
from creste_public_tpu.ops.value_iteration import bellman_kernels, value_iteration
from creste_public_tpu.parity import torch_mirror as tm
from creste_public_tpu.utils import depth as du_jax
from creste_public_tpu.utils import geometry

REF_ROOT = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF_ROOT.exists(), reason="reference checkout not available"
)


# ---------------------------------------------------------------------------
# AST extraction machinery (reads reference source text; copies nothing)
# ---------------------------------------------------------------------------


def _read(rel: str) -> str:
    return (REF_ROOT / rel).read_text()


def _find(body, name):
    cands = [
        n
        for n in body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
        and n.name == name
    ]
    assert cands, f"definition {name!r} not found"
    return cands[-1]  # duplicate defs: last wins (matches exec semantics)


def extract_def(rel: str, qualname: str) -> str:
    """Dedented source of a top-level def/class or Class.method."""
    src = _read(rel)
    node: ast.AST = ast.parse(src)
    for part in qualname.split("."):
        node = _find(node.body, part)
    return textwrap.dedent(ast.get_source_segment(src, node))


def _stmt_lists(stmts):
    yield stmts
    for s in stmts:
        for field in ("body", "orelse", "finalbody"):
            sub = getattr(s, field, None)
            if sub:
                yield from _stmt_lists(sub)


def extract_kernel_block(rel: str, classname: str, first_target="left") -> str:
    """Source of the contiguous ``__init__`` statements from the
    ``left = [...]`` table assignment through the following for-loop — the
    reference builds its fixed conv-kernel buffers inline in ``__init__``
    (vin.py:38-46, lfd.py:60-70)."""
    src = _read(rel)
    cls = _find(ast.parse(src).body, classname)
    init = _find(cls.body, "__init__")
    for stmts in _stmt_lists(init.body):
        for i, s in enumerate(stmts):
            if isinstance(s, ast.Assign) and any(
                isinstance(t, ast.Name) and t.id == first_target for t in s.targets
            ):
                j = next(
                    k for k in range(i, len(stmts)) if isinstance(stmts[k], ast.For)
                )
                return "\n".join(
                    textwrap.dedent(ast.get_source_segment(src, x))
                    for x in stmts[i : j + 1]
                )
    raise AssertionError(f"kernel block not found in {classname}.__init__")


def extract_buffer_literal(rel: str, classname: str, name: str):
    """literal_eval the list inside ``self.register_buffer(name,
    torch.tensor([...]))``."""
    src = _read(rel)
    cls = _find(ast.parse(src).body, classname)
    for node in ast.walk(cls):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "register_buffer"
            and node.args
            and isinstance(node.args[0], ast.Constant)
            and node.args[0].value == name
        ):
            return ast.literal_eval(node.args[1].args[0])
    raise AssertionError(f"buffer {name!r} not found in {classname}")


def base_ns(**extra) -> dict:
    ns = {
        "torch": torch,
        "nn": torch.nn,
        "F": torch.nn.functional,
        "np": np,
        "math": math,
        "DEBUG_MODE": False,
    }
    ns.update(extra)
    return ns


def exec_def(rel: str, qualname: str, ns: dict | None = None, **extra):
    ns = ns if ns is not None else base_ns(**extra)
    code = compile(extract_def(rel, qualname), f"<ref:{rel}:{qualname}>", "exec")
    exec(code, ns)
    return ns[qualname.split(".")[-1]], ns


def plain_cfg(d):
    """Deep plain-dict copy of an AttrCfg/dict tree."""
    if isinstance(d, dict):
        return {k: plain_cfg(v) for k, v in d.items()}
    return d


class AttrCfg(dict):
    """OmegaConf-DictConfig stand-in for executing reference classes:
    attribute access + .get on nested dicts. Children are wrapped AT
    CONSTRUCTION because CPython's **-expansion reads dict storage
    directly, bypassing any overridden __getitem__."""

    def __init__(self, d=()):
        super().__init__({
            k: AttrCfg(v)
            if isinstance(v, dict) and not isinstance(v, AttrCfg) else v
            for k, v in dict(d).items()})

    def __getattr__(self, k):
        try:
            return dict.__getitem__(self, k)
        except KeyError:
            raise AttributeError(k)

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, AttrCfg):
            v = AttrCfg(v)
        dict.__setitem__(self, k, v)

    def get(self, k, default=None):
        v = dict.get(self, k, default)
        if isinstance(v, dict) and not isinstance(v, AttrCfg):
            v = AttrCfg(v)
        return v


# Signature adapters: the reference composites instantiate submodules via
# globals()[name](cfg-attr-style, ...); these present the reference
# constructor/call signatures over the mirror modules (which the module
# goldens pin against reference code) so composite classes execute with
# only the EffNet-trunk/splat leaves stubbed.


class MirrorDistillationBackbone(tm.TorchDistillationBackbone):
    def __init__(self, model_cfg):
        super().__init__(plain_cfg(model_cfg))

    def forward(self, x):
        B, N, C, H, W = x.shape
        return super().forward(x.reshape(B * N, C, H, W))


class MirrorCamera2MapMulti(tm.TorchCamera2MapMulti):
    def __init__(self, cfg, mode="bilinear", scatter_mode="mean"):
        super().__init__(plain_cfg(cfg), scatter_mode=scatter_mode)

    def forward(self, args):
        return super().forward(*args)


class MirrorInpainting(tm.TorchInpaintingResNet18MultiHead):
    def __init__(self, num_input_features, num_classes,
                 norm_layer="batch_norm", **kw):
        super().__init__(
            num_input_features, list(num_classes),
            list(kw.pop("output_prefix")),
            input_key=kw.pop("input_key", "bev_features"),
            learnable_loss_weight=kw.pop("learnable_loss_weight", False))


def composite_ns(**extra):
    """base_ns + the stubs every composite-class exec needs."""
    import contextlib
    import os as _os

    @contextlib.contextmanager
    def open_dict(c):
        yield c

    ns = base_ns(
        os=_os,
        DictConfig=dict,
        OmegaConf=types.SimpleNamespace(
            to_object=plain_cfg, create=lambda d: AttrCfg(plain_cfg(d))),
        open_dict=open_dict,
        DEBUG_TERRAINNET=False,
        SAVE_VISUALS=False,
        DEBUG_VIN=0,
        DEBUG_GOAL_ONLY_FEATURE=0,
        DEBUG_INPUTS=0,
        GaussianBlur=None,
        visualize_bev_policy=None,
        visualize_bev_label=None,
        FSC_LABEL_DIR=None,
        DistillationBackbone=MirrorDistillationBackbone,
        DepthCompletion=tm.TorchDepthCompletion,
        FoundationBackbone=None,
        Camera2MapMulti=MirrorCamera2MapMulti,
        MergeUnit=tm.TorchMergeUnit,
        InpaintingResNet18MultiHead=MirrorInpainting,
        MultiLayerPerceptron=None,
        convert_to_metric_depth=None,
        bin_depths=None,
        save_depth_color_image=None,
        resize_and_center_crop=None,
    )
    ns.update(extra)
    return ns


def ref_deploy_inputs(h, w, seed=11, depth_scale=3000.0):
    """Deterministic NCHW rgbd + p2p pair for composite-graph goldens."""
    rng = np.random.default_rng(seed)
    rgbd = rng.uniform(0, 1, (1, 1, 4, h, w)).astype(np.float32)
    rgbd[:, :, 3] *= depth_scale
    fx = fy = 0.9 * w
    kinv = np.array([[1 / fx, 0, -w / 2 / fx], [0, 1 / fy, -h / 2 / fy],
                     [0, 0, 1.0]])
    rot = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    p2p = np.eye(4, dtype=np.float32)
    p2p[:3, :3] = (rot @ kinv / 4).astype(np.float32)
    return rgbd, np.tile(p2p, (1, 1, 1, 1))


class _TorchScatterStub:
    """5-line torch_scatter stand-in for splat max mode: empty cells stay at
    the zero init, occupied cells take a pure max of src (torch_scatter
    semantics)."""

    @staticmethod
    def scatter(src, index, dim, reduce, dim_size):
        assert reduce == "max"
        shape = list(src.shape)
        shape[dim] = dim_size
        out = src.new_zeros(shape)
        return out.scatter_reduce(dim, index, src, reduce="amax", include_self=False)


def _dist_stub():
    def all_gather(out_list, tensor, async_op=False):
        out_list[0].copy_(tensor)

    return types.SimpleNamespace(
        nn=types.SimpleNamespace(all_gather=lambda t: [t]),
        all_gather=all_gather,
        get_world_size=lambda: 1,
        is_available=lambda: False,
        is_initialized=lambda: False,
    )


class _TorchProxy:
    """torch with ``distributed`` swapped for a single-rank stub."""

    def __init__(self, dist):
        self.distributed = dist

    def __getattr__(self, item):
        return getattr(torch, item)


def t2n(x):
    return x.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# VIN value iteration (vin.py:36-80)
# ---------------------------------------------------------------------------


def _ref_vin_kernels() -> torch.Tensor:
    blk = extract_kernel_block("creste/models/blocks/vin.py", "VIN")
    me = types.SimpleNamespace(
        w=torch.zeros(8, 1, 3, 3), qvalue_cfg=types.SimpleNamespace(dims=[1, 8])
    )
    exec(compile(blk, "<ref:vin-kernels>", "exec"), base_ns(self=me))
    return me.w


def test_reference_value_iteration():
    w_ref = _ref_vin_kernels()
    # mirror kernels == reference kernels
    np.testing.assert_array_equal(t2n(w_ref), t2n(tm.vin_action_kernels()))
    # flax kernels (HWIO) == reference kernels
    np.testing.assert_allclose(
        np.transpose(bellman_kernels(), (3, 2, 0, 1)), t2n(w_ref), atol=0
    )

    vi_ref, _ = exec_def("creste/models/blocks/vin.py", "VIN.value_iteration_manual")
    torch.manual_seed(0)
    r = torch.randn(2, 1, 16, 24) * 0.5
    me = types.SimpleNamespace(w=w_ref)
    v_ref, pol_ref, q_ref = vi_ref(me, r, None, threshold=1e-3, discount=0.99)
    v_m, pol_m, q_m = tm.torch_value_iteration(r, threshold=1e-3, discount=0.99)
    np.testing.assert_allclose(t2n(v_ref), t2n(v_m), atol=1e-6)
    np.testing.assert_allclose(t2n(pol_ref), t2n(pol_m), atol=1e-6)
    np.testing.assert_allclose(t2n(q_ref), t2n(q_m), atol=1e-6)

    r_j = jnp.asarray(t2n(r).transpose(0, 2, 3, 1))  # NCHW -> NHWC
    v_j, pol_j, q_j = value_iteration(
        r_j, discount=0.99, threshold=1e-3, backend="xla"
    )
    # values are O(r_max/(1-gamma)) ~ 100: compare relatively for v/q
    np.testing.assert_allclose(
        np.asarray(v_j)[..., 0], t2n(v_ref)[:, 0], rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pol_j).transpose(0, 3, 1, 2), t2n(pol_ref), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(q_j).transpose(0, 3, 1, 2), t2n(q_ref), rtol=1e-5, atol=1e-4
    )

    # the TPU Pallas kernel (interpret mode) directly vs the reference's
    # own loop — its per-batch-element convergence test stops each element
    # at its own delta<threshold, so the bound is the residual tail
    # movement (<= threshold*gamma/(1-gamma) in the worst case, far
    # tighter in practice on bounded rewards)
    v_p, pol_p, q_p = value_iteration(
        r_j, discount=0.99, threshold=1e-3, backend="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(v_p)[..., 0], t2n(v_ref)[:, 0], rtol=1e-4, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(pol_p).transpose(0, 3, 1, 2), t2n(pol_ref), atol=2e-4
    )


# ---------------------------------------------------------------------------
# splat_soft (splat_projection.py:262-354)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["mean", "sum", "max"])
def test_reference_splat_soft(mode):
    fn, _ = exec_def(
        "creste/models/blocks/splat_projection.py",
        "Camera2MapMulti.splat_soft",
        torch_scatter=_TorchScatterStub(),
    )
    torch.manual_seed(1)
    B, P, Fd, H, W = 2, 300, 5, 12, 10
    # includes out-of-bounds points on every edge
    pts = torch.rand(B, P, 2) * torch.tensor([W + 2.0, H + 2.0]) - 1.0
    feats = torch.randn(B, Fd, P)
    grid = torch.tensor([H, W])

    me = types.SimpleNamespace(scatter_mode=mode, min_weight=1.0)
    vf_ref, vd_ref = fn(me, (pts, feats, grid))

    me2 = types.SimpleNamespace(scatter_mode=mode, min_weight=1.0)
    vf_m, vd_m = tm.TorchCamera2MapMulti.splat_soft(me2, pts, feats, grid)
    np.testing.assert_allclose(t2n(vf_ref), t2n(vf_m), atol=1e-5)
    np.testing.assert_allclose(
        t2n(vd_ref).reshape(B, -1), t2n(vd_m).reshape(B, -1), atol=1e-5
    )

    feats_j = jnp.asarray(t2n(feats).transpose(0, 2, 1))  # [B, P, F]
    vf_j, vd_j = splat_bilinear(jnp.asarray(t2n(pts)), feats_j, (H, W), mode=mode)
    np.testing.assert_allclose(
        np.asarray(vf_j).transpose(0, 2, 1), t2n(vf_ref), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(vd_j), t2n(vd_ref).reshape(B, -1), atol=1e-4
    )


# ---------------------------------------------------------------------------
# Expected SVF propagation + greedy rollout (lfd.py:59-70, 156-277)
# ---------------------------------------------------------------------------


def _ref_svf_kernels() -> torch.Tensor:
    blk = extract_kernel_block("creste/models/lfd.py", "MaxEntIRL")
    me = types.SimpleNamespace(
        transition_probs=torch.zeros(8, 1, 3, 3),
        traversability_head_cfg={
            "net_kwargs": {"qvalue_cfg": {"dims": [1, 8]}}
        },
    )
    exec(compile(blk, "<ref:svf-kernels>", "exec"), base_ns(self=me))
    return me.transition_probs


@pytest.mark.parametrize(
    "method,zero_terminal", [("sharpen", True), ("sharpen", False), ("none", True)]
)
def test_reference_expected_svf(method, zero_terminal):
    w_ref = _ref_svf_kernels()
    np.testing.assert_array_equal(t2n(w_ref), t2n(tm.svf_transition_kernels()))

    ns = base_ns()
    epif, _ = exec_def("creste/utils/train_utils.py", "earliest_pose_in_fov", ns)
    s2c, _ = exec_def("creste/models/lfd.py", "MaxEntIRL._state_to_coord", ns)
    c2s, _ = exec_def("creste/models/lfd.py", "MaxEntIRL._coord_to_state", ns)
    ns["tu"] = types.SimpleNamespace(earliest_pose_in_fov=epif)
    svf_fn, _ = exec_def(
        "creste/models/lfd.py",
        "MaxEntIRL.expected_state_visitation_frequency",
        ns,
    )

    torch.manual_seed(2)
    B, A, H, W, T, ds, temp = 2, 8, 14, 20, 10, 2, 0.5
    policy = torch.rand(B, A, H, W) + 1e-3
    policy = policy / policy.sum(dim=1, keepdim=True)

    fov = torch.zeros(1, 1, H, W)
    fov[:, :, 4:, :] = 1.0  # rows >= 4 are inside the FOV

    # expert SE(2) poses on the full-res grid (positions scaled by ds)
    expert = torch.eye(3).repeat(B, T, 1, 1)
    rows = torch.stack(
        [torch.linspace(1, H - 2, T), torch.linspace(2, H - 3, T)]
    )  # [B, T]
    cols = torch.stack(
        [torch.linspace(3, W - 4, T), torch.linspace(W - 3, 2, T)]
    )
    expert[:, :, 0, 2] = rows * ds
    expert[:, :, 1, 2] = cols * ds

    me = types.SimpleNamespace(
        action_horizon=T,
        policy_cfg={"method": method, "temperature": temp},
        zero_terminal_state=zero_terminal,
        transition_probs=w_ref,
        traversability_head_cfg={"net_kwargs": {"reward_cfg": {"ds": ds}}},
        fov_mask=fov,
        map_size=[H, W],
        dynamics=torch.tensor(
            extract_buffer_literal("creste/models/lfd.py", "MaxEntIRL", "dynamics")
        ),
    )
    me._state_to_coord = lambda s, vectorized=False: s2c(me, s, vectorized)
    me._coord_to_state = lambda c, vectorized=False: c2s(me, c, vectorized)

    out_ref = svf_fn(me, policy.clone(), expert)
    mu_ref = out_ref["exp_svf"]

    # Recompute S0/S1 the reference's way for the mirror/flax calls
    S = (expert[:, :, :2, 2] // ds).long()
    S[:, :, 0].clamp_(0, H - 1)
    S[:, :, 1].clamp_(0, W - 1)
    S0 = epif(S, fov)
    S1 = S[:, -1, :2]
    s0_lin = S0[:, 0] * W + S0[:, 1]
    s1_lin = S1[:, 0] * W + S1[:, 1]

    # our geometry.earliest_pose_in_fov agrees with the reference's
    S0_j = geometry.earliest_pose_in_fov(
        jnp.asarray(t2n(S)), jnp.asarray(t2n(fov[0, 0]).astype(bool))
    )
    np.testing.assert_array_equal(np.asarray(S0_j), t2n(S0))

    mu_m = tm.torch_expected_svf(
        policy, s0_lin, s1_lin, T, zero_terminal_state=zero_terminal,
        temperature=temp if method == "sharpen" else None,
    )
    np.testing.assert_allclose(t2n(mu_ref), t2n(mu_m), atol=1e-5)

    pol_j = jnp.asarray(t2n(policy).transpose(0, 2, 3, 1))  # NHWA
    pol_sharp = sharpen_policy(pol_j, temp) if method == "sharpen" else pol_j
    mu_j = expected_svf(
        pol_sharp,
        jnp.asarray(t2n(s0_lin)),
        jnp.asarray(t2n(s1_lin)),
        horizon=T,
        zero_terminal_state=zero_terminal,
    )
    np.testing.assert_allclose(np.asarray(mu_j), t2n(mu_ref), atol=1e-4)

    # greedy rollout (lfd.py:230-248): argmax uses the UN-sharpened policy
    states_j, grid_j = greedy_rollout(pol_j, jnp.asarray(t2n(s0_lin)), horizon=T)
    np.testing.assert_array_equal(np.asarray(states_j), t2n(out_ref["state_preds"]))
    np.testing.assert_allclose(
        np.asarray(grid_j), t2n(out_ref["state_preds_grid"]), atol=0
    )


# ---------------------------------------------------------------------------
# Expert trajectory rasterisation (loss_utils.py:1055-1116, last def wins)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("se2_input", [True, False])
def test_reference_compute_expert_visitation(se2_input):
    fn, _ = exec_def(
        "creste/utils/loss_utils.py", "MaxEntIRLLoss.compute_expert_visitation"
    )
    torch.manual_seed(3)
    B, T, H, W, ds = 2, 8, 16, 24, 2.0
    xy = torch.rand(B, T, 2) * torch.tensor([H * ds - 1.0, W * ds - 1.0])
    if se2_input:
        gt = torch.eye(3).repeat(B, T, 1, 1)
        gt[:, :, 0, 2] = xy[..., 0]
        gt[:, :, 1, 2] = xy[..., 1]
    else:
        gt = xy
    _, counts_ref = fn(gt, ds, (H, W))

    counts_m = tm.torch_compute_expert_visitation(xy, ds, (H, W))
    np.testing.assert_allclose(t2n(counts_ref), t2n(counts_m), atol=0)

    # match the reference's data-dependent interpolation density exactly
    pts = xy / ds
    dist = torch.norm(pts[:, 1:] - pts[:, :-1], dim=-1)
    max_steps = int(torch.ceil(dist).long().max().item())
    counts_j = rasterize_trajectory(
        jnp.asarray(t2n(xy)), ds, (H, W), max_steps=max_steps
    )
    np.testing.assert_allclose(np.asarray(counts_j), t2n(counts_ref), atol=0)


# ---------------------------------------------------------------------------
# MultiPosConLoss, single rank (supcon_loss.py:25-116)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("weighted", [False, True])
def test_reference_multi_pos_con_loss(weighted):
    dist = _dist_stub()
    ns = base_ns(dist=dist)
    ns["torch"] = _TorchProxy(dist)
    for name in (
        "is_dist_avail_and_initialized",
        "get_rank",
        "compute_cross_entropy",
        "stablize_logits",
        "concat_all_gather",
        "MultiPosConLoss",
    ):
        exec_def("creste/models/losses/supcon_loss.py", name, ns)

    torch.manual_seed(4)
    M, Z, C = 48, 16, 5
    feats = torch.randn(M, Z)
    labels = torch.randint(0, C, (M,))
    cw = torch.rand(C) + 0.5 if weighted else None

    ref_loss = ns["MultiPosConLoss"](temperature=0.1, class_weights=cw)(
        {"feats": feats, "labels": labels}
    )["loss"]
    mirror_loss = tm.torch_multi_pos_con_loss(
        feats, labels, temperature=0.1, class_weights=cw
    )
    np.testing.assert_allclose(float(ref_loss), float(mirror_loss), atol=1e-6)

    flax_loss = multi_pos_con_loss(
        jnp.asarray(t2n(feats)),
        jnp.asarray(t2n(labels)),
        valid=jnp.ones(M, bool),
        temperature=0.1,
        class_weights=None if cw is None else jnp.asarray(t2n(cw)),
    )
    np.testing.assert_allclose(float(flax_loss), float(ref_loss), atol=1e-5)


# ---------------------------------------------------------------------------
# ConvGRU cell (convgru.py:13-90)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cell_type", ["GRU", "MRU"])
def test_reference_convgru_cell(cell_type):
    from torch.autograd import Variable

    cls, _ = exec_def(
        "creste/models/blocks/convgru.py", "ConvGRUCell", Variable=Variable
    )
    torch.manual_seed(5)
    B, Cin, Ch, H, W = 2, 6, 4, 8, 10
    ref_cell = cls((H, W), Cin, Ch, (3, 3), True, torch.FloatTensor, cell_type)
    x = torch.randn(B, Cin, H, W)
    h = torch.randn(B, Ch, H, W)
    with torch.no_grad():
        out_ref = ref_cell(x, h)

    mirror = tm.TorchConvGRUCell(Cin, Ch, (3, 3), cell_type)
    mirror.load_state_dict(ref_cell.state_dict())
    with torch.no_grad():
        out_m = mirror(x, h)
    np.testing.assert_allclose(t2n(out_ref), t2n(out_m), atol=1e-6)

    params = {
        "conv_gates": {
            "kernel": t2n(ref_cell.conv_gates.weight).transpose(2, 3, 1, 0),
            "bias": t2n(ref_cell.conv_gates.bias),
        },
        "conv_can": {
            "kernel": t2n(ref_cell.conv_can.weight).transpose(2, 3, 1, 0),
            "bias": t2n(ref_cell.conv_can.bias),
        },
    }
    cell_j = ConvGRUCell(hidden_dim=Ch, kernel=(3, 3), cell_type=cell_type)
    out_j = cell_j.apply(
        {"params": params},
        jnp.asarray(t2n(x).transpose(0, 2, 3, 1)),
        jnp.asarray(t2n(h).transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), t2n(out_ref), atol=1e-5
    )


# ---------------------------------------------------------------------------
# Geometry helpers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape,params",
    [
        ((128, 128), (70, 70, 0, 100)),  # lfd.py:47-52 (map fov)
        ((128, 128), (70, 70, 7, 200)),  # dataset frustum defaults
        ((64, 96), (50, 40, 10, 50)),  # function defaults
    ],
)
def test_reference_trapezoidal_fov_mask(shape, params):
    fn, _ = exec_def("creste/utils/train_utils.py", "create_trapezoidal_fov_mask")
    H, W = shape
    ref = fn(H, W, *params)
    ours = geometry.create_trapezoidal_fov_mask(H, W, *params)
    np.testing.assert_array_equal(t2n(ref).astype(bool), ours)


def test_reference_earliest_pose_in_fov_fallback():
    fn, _ = exec_def("creste/utils/train_utils.py", "earliest_pose_in_fov")
    torch.manual_seed(6)
    B, T, H, W = 3, 6, 12, 16
    mask = torch.zeros(1, 1, H, W)
    mask[:, :, 6:, 4:12] = 1.0
    expert = torch.randint(0, min(H, W), (B, T, 2))
    expert[1] = 0  # batch element with NO pose in the fov -> (H-1, W//2)
    ref = fn(expert, mask)
    ours = geometry.earliest_pose_in_fov(
        jnp.asarray(t2n(expert)), jnp.asarray(t2n(mask[0, 0]).astype(bool))
    )
    np.testing.assert_array_equal(np.asarray(ours), t2n(ref))


def test_reference_convert_poses_to_tf():
    from scipy.spatial.transform import Rotation as R

    fn, _ = exec_def("creste/datasets/coda_helpers.py", "convert_poses_to_tf", R=R)
    rng = np.random.default_rng(7)
    n = 16
    rows = np.zeros((n, 8))
    rows[:, 0] = rng.uniform(0, 1e6, n)  # ts
    rows[:, 1:4] = rng.normal(size=(n, 3)) * 10  # xyz
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    rows[:, 4:8] = q  # qw qx qy qz
    ref = fn(rows)
    ours = calib.poses_to_matrices(rows)
    np.testing.assert_allclose(ours, ref, atol=1e-10)


# ---------------------------------------------------------------------------
# Depth binning + loss formulas (depth_utils.py:346-384, loss_utils.py:477-603)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["UD", "LID"])
@pytest.mark.parametrize("target", [False, True])
def test_reference_bin_depths(mode, target):
    fn, _ = exec_def("creste/utils/depth_utils.py", "bin_depths")
    torch.manual_seed(8)
    d = torch.rand(2, 40, 50) * 30000.0 - 1000.0  # includes out-of-range values
    d[0, 0, 0] = float("nan")
    d[0, 0, 1] = float("inf")
    ref = fn(d.clone(), mode, 300.0, 25600.0, 128, target=target)
    ours = du_jax.bin_depths(
        jnp.asarray(t2n(d)), mode, 300.0, 25600.0, 128, target=target
    )
    if target:
        np.testing.assert_array_equal(np.asarray(ours), t2n(ref))
    else:
        np.testing.assert_allclose(np.asarray(ours), t2n(ref), atol=1e-3, rtol=1e-6)


class _Cfg(dict):
    """Reference loss configs are OmegaConf nodes: attribute + item access."""

    @property
    def name(self):
        return self["name"]


def _exec_loss_class(name: str):
    ns = base_ns(du=types.SimpleNamespace())
    exec_def("creste/utils/depth_utils.py", "bin_depths", ns)
    ns["du"] = types.SimpleNamespace(bin_depths=ns["bin_depths"])
    exec_def("creste/utils/loss_utils.py", "Loss", ns)
    exec_def("creste/utils/loss_utils.py", name, ns)
    return ns[name]


def test_reference_cross_entropy_depth_loss():
    cls = _exec_loss_class("CrossEntropyDepth")
    disc = {"mode": "UD", "depth_min": 300.0, "depth_max": 25600.0, "num_bins": 32}
    cfg = _Cfg(
        name="CrossEntropyDepth", pred_key="p", lab_key="l", discretize=dict(disc)
    )
    torch.manual_seed(9)
    B, S, H, W, C = 2, 1, 12, 16, 32
    gt = torch.rand(B, S, H, W) * 30000.0
    gt[0, 0, :2] = 0.0  # invalid (below depth_min -> bin index < 0)
    pred = torch.randn(B * S, C, H, W)
    ref_losses, ref_meta = cls(cfg).loss({"p": pred, "l": gt})

    ours = lm.CrossEntropyDepth(
        {"name": "CrossEntropyDepth", "pred_key": "p", "lab_key": "l",
         "discretize": dict(disc)}
    )
    j_losses, j_meta = ours.loss(
        {"p": jnp.asarray(t2n(pred).transpose(0, 2, 3, 1)), "l": jnp.asarray(t2n(gt))},
        {},
    )
    np.testing.assert_allclose(
        float(j_losses["depth/cls_loss"]), float(ref_losses["depth/cls_loss"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        float(j_meta["depth/acc"]), float(ref_meta["depth/acc"]), atol=1e-6
    )


def test_reference_smooth_l1_depth_loss():
    cls = _exec_loss_class("SmoothL1Depth")
    disc = {"mode": "UD", "depth_min": 300.0, "depth_max": 25600.0, "num_bins": 32}
    cfg = _Cfg(
        name="SmoothL1Depth", pred_key="p", lab_key="l",
        discretize=dict(disc), beta=0.5,
    )
    torch.manual_seed(10)
    B, S, H, W = 2, 1, 12, 16
    gt = torch.rand(B, S, H, W) * 30000.0
    gt[1, 0, 3] = 0.0
    pred = torch.rand(B * S, H, W) * 25.0
    ref_losses, _ = cls(cfg).loss({"p": pred, "l": gt})

    ours = lm.SmoothL1Depth(
        {"name": "SmoothL1Depth", "pred_key": "p", "lab_key": "l",
         "discretize": dict(disc), "beta": 0.5}
    )
    j_losses, _ = ours.loss(
        {"p": jnp.asarray(t2n(pred)), "l": jnp.asarray(t2n(gt))}, {}
    )
    np.testing.assert_allclose(
        float(j_losses["depth/reg_loss"]), float(ref_losses["depth/reg_loss"]),
        atol=1e-5,
    )


def test_reference_mse_overlap_only():
    """MSELoss overlap_only=True (loss_utils.py:617-647 ->
    train_utils.py:355-440): anchor-view dense MSE + per-batch-summed MSE
    over aug pixels whose BEV coord is within 1 of any anchor pixel."""
    ns = base_ns(DEBUG_LOSS=False, DEBUG_AUGMENTATION=False)
    overlap_fn, _ = exec_def(
        "creste/utils/train_utils.py", "compute_pixel_bevoverlap_loss", ns
    )
    ns["tu"] = types.SimpleNamespace(compute_pixel_bevoverlap_loss=overlap_fn)
    exec_def("creste/utils/loss_utils.py", "Loss", ns)
    mse_cls, _ = exec_def("creste/utils/loss_utils.py", "MSELoss", ns)

    torch.manual_seed(12)
    B, V, Z, H, W = 2, 3, 4, 8, 10
    pred = torch.randn(B, V, Z, H, W)
    gt = torch.randn(B, V, Z, H, W)
    # BEV coords spread widely so only some aug pixels overlap the anchor
    coords = torch.rand(B, V, H * W, 2) * 40.0

    cfg = _Cfg(
        name="MSELoss", pred_key="outputs/dino_pe_feats", lab_key="g",
        overlap_only=True,
    )
    td = {
        "outputs/dino_pe_feats": pred,
        "g": gt,
        "outputs/bev_coords": coords.view(B, V * H * W, 2),
    }
    ref_losses, _ = mse_cls(cfg).loss(td)
    hits_frac = float(
        (torch.cdist(coords[:, 0], coords[:, 1:].reshape(B, -1, 2)) < 1)
        .any(dim=1).float().mean()
    )
    assert 0.0 < hits_frac < 1.0, "fixture must exercise a partial overlap"

    ours = lm.MSELoss(
        {"name": "MSELoss", "pred_key": "p", "lab_key": "l",
         "overlap_only": True, "coords_key": "c"}
    )
    j_losses, _ = ours.loss(
        {"p": jnp.asarray(t2n(pred).transpose(0, 1, 3, 4, 2)),
         "l": jnp.asarray(t2n(gt).transpose(0, 1, 3, 4, 2)),
         "c": jnp.asarray(t2n(coords).reshape(B, V * H * W, 2))},
        {},
    )
    np.testing.assert_allclose(
        float(j_losses["loss"]), float(ref_losses["loss"]), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("absolute,take_grad", [(True, False), (False, False), (True, True)])
def test_reference_smooth_l1_loss(absolute, take_grad):
    cls = _exec_loss_class("SmoothL1")
    cfg = _Cfg(
        name="SmoothL1", pred_key="p", lab_key="l", beta=1.0,
        absolute=absolute, take_grad=take_grad,
    )
    torch.manual_seed(11)
    B, C, H, W = 2, 2, 10, 12
    gt = torch.randn(B, C, H, W) * 2.0
    gt[0, 0, 0, 0] = float("nan")
    gt[1, 1, 2, 3] = float("inf")
    pred = torch.randn(B, C, H, W)
    ref_losses, _ = cls(cfg).loss({"p": pred, "l": gt.clone()})

    ours = lm.SmoothL1(
        {"name": "SmoothL1", "pred_key": "p", "lab_key": "l", "beta": 1.0,
         "absolute": absolute, "take_grad": take_grad}
    )
    j_losses, _ = ours.loss(
        {"p": jnp.asarray(t2n(pred).transpose(0, 2, 3, 1)),
         "l": jnp.asarray(t2n(gt).transpose(0, 2, 3, 1))},
        {},
    )
    np.testing.assert_allclose(
        float(j_losses["val"]), float(ref_losses["val"]), atol=1e-5
    )


# ---------------------------------------------------------------------------
# Remaining loss families (loss_utils.py:650-734, 379-474, 1261-1404;
# balancedsupcon_loss.py) — instantiate the extracted reference classes
# ---------------------------------------------------------------------------


def test_reference_pefree_mse_loss():
    ns = base_ns(DEBUG_LOSS=False)
    exec_def("creste/utils/loss_utils.py", "Loss", ns)
    cls, _ = exec_def("creste/utils/loss_utils.py", "PEFreeMSELoss", ns)
    torch.manual_seed(13)
    B, V, Z, H, W = 2, 3, 6, 10, 12
    pred = torch.randn(B * V, Z, H, W)
    density = torch.rand(B * V, 1, H, W) * 2.0
    cfg = _Cfg(name="PEFreeMSELoss", pred_key="p", lab_key="d",
               num_views=V - 1, density_threshold=1e-3)
    ref_losses, _ = cls(cfg).loss({"p": pred, "d": density})

    ours = lm.PEFreeMSELoss(
        {"name": "PEFreeMSELoss", "pred_key": "p", "lab_key": "d",
         "num_views": V - 1, "density_threshold": 1e-3}
    )
    j_losses, _ = ours.loss(
        {"p": jnp.asarray(t2n(pred).transpose(0, 2, 3, 1)),
         "d": jnp.asarray(t2n(density).transpose(0, 2, 3, 1))},
        {},
    )
    np.testing.assert_allclose(
        float(j_losses["loss"]), float(ref_losses["loss"]), rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.parametrize("variant", ["count_bins", "class_dim_weighted"])
def test_reference_bev_cross_entropy_loss(variant, tmp_path):
    ns = base_ns(DEBUG_LOSS=False)
    exec_def("creste/utils/loss_utils.py", "Loss", ns)
    cls, _ = exec_def("creste/utils/loss_utils.py", "CrossEntropy", ns)
    torch.manual_seed(14)
    B, C, H, W = 2, 6, 12, 16
    pred = torch.randn(B, C, H, W)
    fov = torch.rand(B, H, W) > 0.3
    cfg = dict(name="CrossEntropy", num_class=C, pred_key="p", lab_key="l",
               mask_key="m", task="3d_ssc")
    if variant == "count_bins":
        gt = torch.randint(0, 5, (B, C, H, W)).float()  # count bins
        cfg["ignore_index"] = 0
        cfg["class_dim"] = -1
    else:
        ids = torch.randint(0, C, (B, H, W)).float()
        gt = torch.stack([torch.zeros_like(ids), ids], dim=1)  # [B, 2, H, W]
        cfg["class_dim"] = 1
        wfile = tmp_path / "w.txt"
        np.savetxt(wfile, np.linspace(10.0, 60.0, C))
        cfg["class_weights"] = str(wfile)
    td = {"p": pred, "l": gt, "m": fov}
    ref_losses, ref_meta = cls(_Cfg(cfg)).loss(td)

    ours = lm.CrossEntropy(dict(cfg))
    j_losses, j_meta = ours.loss(
        {"p": jnp.asarray(t2n(pred).transpose(0, 2, 3, 1)),
         "l": jnp.asarray(t2n(gt).transpose(0, 2, 3, 1)),
         "m": jnp.asarray(t2n(fov))},
        {},
    )
    (ref_loss,) = ref_losses.values()
    (j_loss,) = j_losses.values()
    np.testing.assert_allclose(float(j_loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)
    (ref_acc,) = ref_meta.values()
    (j_acc,) = j_meta.values()
    np.testing.assert_allclose(float(j_acc), float(ref_acc), atol=1e-5)


def test_reference_bc_action_loss():
    ns = base_ns()
    exec_def("creste/utils/loss_utils.py", "Loss", ns)
    cls, _ = exec_def("creste/utils/loss_utils.py", "BCActionLoss", ns)
    torch.manual_seed(15)
    B, T = 3, 8
    pred = torch.rand(B, T, 8) * 0.98 + 0.01  # valid BCE probabilities
    gt = torch.eye(3).repeat(B, T, 1, 1)
    walk = torch.cumsum(torch.randint(-1, 2, (B, T, 2)).float(), dim=1)
    gt[:, :, 0, 2] = walk[..., 0]
    gt[:, :, 1, 2] = walk[..., 1]
    cfg = _Cfg(name="BCActionLoss", pred_key="p", lab_key="l", fov_key="f")
    ref_losses, _ = cls(cfg).loss({"p": pred, "l": gt, "f": None})

    ours = lm.BCActionLoss(
        {"name": "BCActionLoss", "pred_key": "p", "lab_key": "l"}
    )
    j_losses, _ = ours.loss(
        {"p": jnp.asarray(t2n(pred)), "l": jnp.asarray(t2n(gt))}, {}
    )
    np.testing.assert_allclose(
        float(j_losses["bc_action_loss"]),
        float(ref_losses["bc_action_loss"]), rtol=1e-5, atol=1e-6,
    )


def test_reference_trex_loss():
    ns = base_ns()
    exec_def("creste/utils/loss_utils.py", "Loss", ns)
    cls, _ = exec_def("creste/utils/loss_utils.py", "TREXLoss", ns)
    torch.manual_seed(16)
    B, N, T, H, W = 2, 3, 6, 16, 24
    pred = torch.randn(B, 1, H, W)
    # one preferred (rank 0) per sample -> the reference's repeat-pairing
    # equals the full cartesian product
    rng = np.random.default_rng(16)
    cf = []
    for b in range(B):
        cf.append({
            "trajectories": rng.uniform(0, 2 * min(H, W), (N, T, 2)),
            "rank": np.array([0, 1, 2]),
        })
    cfg = _Cfg(name="TREXLoss", pred_key="p", lab_key="c", fov_key="f",
               map_ds=2, map_sz=[H, W], l1_reg=0.1)
    ref_losses, _ = cls(cfg).loss({"p": pred, "c": cf, "f": None})

    ours = lm.TREXLoss(
        {"name": "TREXLoss", "pred_key": "p", "lab_key": "c",
         "map_ds": 2, "map_sz": [H, W], "l1_reg": 0.1}
    )
    cf_padded = {
        "trajectories": jnp.asarray(
            np.stack([c["trajectories"] for c in cf]), jnp.float32),
        "rank": jnp.asarray(np.stack([c["rank"] for c in cf])),
        "valid": jnp.ones((B, N), bool),
    }
    j_losses, _ = ours.loss(
        {"p": jnp.asarray(t2n(pred).transpose(0, 2, 3, 1)), "c": cf_padded},
        {},
    )
    np.testing.assert_allclose(
        float(j_losses["trex_loss"]), float(ref_losses["trex_loss"]),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.parametrize("loss_type", ["l_spread", "sup_con"])
def test_reference_bal_contrastive_loss(loss_type):
    from creste_public_tpu.losses.balancedsupcon import bal_contrastive_loss

    ns = base_ns()
    for name in ("UnagiLoss", "UnagiContrastiveLoss", "weighted_logsumexp",
                 "BalContrastiveLoss"):
        exec_def("creste/models/losses/balancedsupcon_loss.py", name, ns)
    torch.manual_seed(17)
    B, V, Z = 12, 3, 8
    feats = torch.nn.functional.normalize(torch.randn(B, V, Z), dim=-1)
    labels = torch.randint(0, 3, (B,))
    ref_loss = ns["BalContrastiveLoss"](views=V, type=loss_type, temp=0.5)(
        feats, labels
    )

    j_loss = bal_contrastive_loss(
        jnp.asarray(t2n(feats)), jnp.asarray(t2n(labels)),
        temperature=0.5, loss_type=loss_type,
    )
    np.testing.assert_allclose(float(j_loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("ssc", [False, True])
def test_reference_vicreg_loss(ssc, monkeypatch):
    """VicregLoss (loss_utils.py:737-969) executed against the flax
    implementation. The reference's loss() carries an unconditional
    ``import pdb; pdb.set_trace()`` before the final sum (:943-944) — the
    path is dead in production, so this golden stubs sys.modules['pdb'] to
    execute it. Deterministic regime: per-label caps admit every masked
    pixel, so the reference's randperm selections are complete,
    permutation-invariant sets."""
    import sys

    stub = types.ModuleType("pdb")
    stub.set_trace = lambda *a, **k: None
    monkeypatch.setitem(sys.modules, "pdb", stub)

    ns = base_ns(DEBUG_VICREG_LOSS=False)
    exec_def("creste/utils/utils.py", "remap_labels_in_batch", ns)
    ns["utils"] = types.SimpleNamespace(
        remap_labels_in_batch=ns["remap_labels_in_batch"]
    )
    exec_def("creste/utils/loss_utils.py", "Loss", ns)
    exec_def("creste/utils/loss_utils.py", "VicregLoss", ns)

    torch.manual_seed(21)
    B, Z, H, W = 2, 6, 10, 12
    C = 4
    pred = torch.randn(B, Z, H, W)
    pred_mv = torch.randn(B, Z, H, W)
    fov = torch.rand(B, H, W) > 0.3
    if ssc:
        lab_key = "inputs/3d_ssc_label"
        gt = torch.rand(B, 1, C, H, W)  # count bins; float -> unique argmax
    else:
        lab_key = "l"
        gt = torch.randint(0, C, (B, 1, H, W))

    cfg = _Cfg(
        name="VicregLoss", task="fsc", pred_key="p", pred_mv_key="pm",
        lab_key=lab_key, sim_coeff=0.5, std_coeff=1.3, cov_coeff=0.7,
        max_samples_per_label=2000, max_variance_samples=1000,
    )
    ref = ns["VicregLoss"](cfg)
    ref_losses, _ = ref.loss(
        {"p": pred, "pm": pred_mv, lab_key: gt, "inputs/fov_mask": fov}
    )

    ours = lm.VicregLoss(
        {"name": "VicregLoss", "pred_key": "p", "pred_mv_key": "pm",
         "lab_key": lab_key, "sim_coeff": 0.5, "std_coeff": 1.3,
         "cov_coeff": 0.7, "max_samples_per_label": 2000,
         "max_variance_samples": 1000, "sample_budget": 128,
         "variance_budget": 256}
    )
    gt_j = (
        jnp.asarray(t2n(gt)[:, 0].transpose(0, 2, 3, 1))
        if ssc else jnp.asarray(t2n(gt)[:, 0])
    )
    j_losses, j_meta = ours.loss(
        {"p": jnp.asarray(t2n(pred).transpose(0, 2, 3, 1)),
         "pm": jnp.asarray(t2n(pred_mv).transpose(0, 2, 3, 1)),
         lab_key: gt_j,
         "inputs/fov_mask": jnp.asarray(t2n(fov))},
        {},
    )
    np.testing.assert_allclose(
        float(j_losses["vicreg_loss"]), float(ref_losses["fsc/vicreg_loss"]),
        rtol=1e-4, atol=1e-5,
    )
    for ours_key, ref_key in [
        ("vicreg/sim", "fsc/vicreg_sim_loss"),
        ("vicreg/std", "fsc/vicreg_std_loss"),
        ("vicreg/cov", "fsc/vicreg_cov_loss"),
    ]:
        np.testing.assert_allclose(
            float(j_meta[ours_key]), float(ref_losses[ref_key]),
            rtol=1e-4, atol=1e-5, err_msg=ours_key,
        )


# ---------------------------------------------------------------------------
# Camera2World + _points_to_voxels (the geometry leg of the flagship graph)
# ---------------------------------------------------------------------------


class _BufSelf:
    """nn.Module stand-in: register_buffer(name, val) -> attribute."""

    def register_buffer(self, name, val):
        setattr(self, name, val)


def _exec_register_buffers(rel: str, classname: str, names, ns):
    """Execute the reference's own ``self.register_buffer(...)`` statements
    from ``classname.__init__`` (in source order) against ns['self']."""
    src = _read(rel)
    cls = _find(ast.parse(src).body, classname)
    init = _find(cls.body, "__init__")
    want = set(names)
    for stmts in _stmt_lists(init.body):
        for s in stmts:
            v = getattr(s, "value", None)
            if (
                isinstance(s, ast.Expr)
                and isinstance(v, ast.Call)
                and isinstance(v.func, ast.Attribute)
                and v.func.attr == "register_buffer"
                and isinstance(v.args[0], ast.Constant)
                and v.args[0].value in want
            ):
                code = textwrap.dedent(ast.get_source_segment(src, s))
                exec(compile(code, f"<buf:{v.args[0].value}>", "exec"), ns)


def test_reference_camera2world():
    """Camera2World.forward (splat_projection.py:12-51): [u*d, v*d, d, 1]
    homogeneous rays through the 4x4 p2p matrix, vs backproject_depth."""
    cls, _ = exec_def(
        "creste/models/blocks/splat_projection.py", "Camera2World"
    )
    torch.manual_seed(3)
    B, N, H, W = 2, 2, 6, 9
    depth = torch.rand(B, N, H, W) * 20.0
    p2p = torch.randn(B, N, 4, 4) * 0.3
    p2p[..., 3, :] = torch.tensor([0.0, 0.0, 0.0, 1.0])
    ref = cls()((depth, p2p))  # [B, N, 3, H, W]

    ours = geometry.backproject_depth(
        jnp.asarray(t2n(depth)), jnp.asarray(t2n(p2p))
    )  # [B, N, H, W, 3]
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 1, 4, 2, 3), t2n(ref),
        rtol=1e-5, atol=1e-4,
    )


def test_reference_points_to_voxels():
    """_points_to_voxels (splat_projection.py:175-189) with the lidar2map /
    voxel_size buffers built by the reference's own register_buffer
    statements (:66-88) — pins both the axis-swap matrix literal and the
    voxel division against lidar_to_map_matrix + points_to_voxels."""
    ns = base_ns()
    stub = _BufSelf()
    ns["self"] = stub
    ns["model_cfg"] = types.SimpleNamespace(
        point_cloud_range=[-12.8, -12.8, -2.0, 12.8, 12.8, 1.0],
        voxel_size=[0.1, 0.1, 3.0],
    )
    _exec_register_buffers(
        "creste/models/blocks/splat_projection.py", "Camera2MapMulti",
        ("point_cloud_range", "max_bound", "min_bound", "voxel_size",
         "lidar2map"),
        ns,
    )
    fn, _ = exec_def(
        "creste/models/blocks/splat_projection.py",
        "Camera2MapMulti._points_to_voxels",
    )

    # the fixed map matrix itself must match the reference's literal
    ours_mat = geometry.lidar_to_map_matrix(t2n(stub.min_bound)[0])
    np.testing.assert_allclose(ours_mat, t2n(stub.lidar2map), atol=0)

    torch.manual_seed(4)
    pts = (torch.rand(3, 50, 3) - 0.5) * 30.0
    ref = fn(stub, pts)  # [B, 50, 2]

    ours = geometry.points_to_voxels(
        jnp.asarray(t2n(pts)),
        jnp.asarray(ours_mat),
        jnp.asarray(t2n(stub.voxel_size)[:2]),
    )
    np.testing.assert_allclose(np.asarray(ours), t2n(ref), rtol=1e-5,
                               atol=1e-4)


def test_reference_metric_depth_differentiable():
    """convert_to_metric_depth_differentiable (depth_utils.py:300-313):
    softmax-expectation over linspace bin centres, and the /1000
    mm->m step of DepthCompletion._convert_to_metric_depth (depth.py:100)."""
    fn, _ = exec_def(
        "creste/utils/depth_utils.py", "convert_to_metric_depth_differentiable"
    )
    torch.manual_seed(5)
    B, D, H, W = 2, 32, 8, 10
    logits = torch.randn(B, D, H, W) * 2.0
    ref = fn(logits, "UD", 300.0, 25600.0, D) / 1000.0

    ours = du_jax.metric_depth_from_logits(
        jnp.asarray(t2n(logits).transpose(0, 2, 3, 1)),
        "UD", 300.0, 25600.0, D,
    ) / 1000.0
    np.testing.assert_allclose(
        np.asarray(ours), t2n(ref), rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------------------
# MaxEntIRLLoss.loss end-to-end with use_fov_mask=True (the shipped
# traversability config: terrainnet_maxentirlcf_msfcn_sam2dynsemelev.yaml:91)
# ---------------------------------------------------------------------------


def test_reference_maxent_irl_loss_fov_e2e():
    """Execute the reference's FULL MaxEntIRLLoss.loss (loss_utils.py:
    1118-1259) — fov resize_and_crop, expert + counterfactual rasterization,
    alpha mixing, differentiable fov masking of the reward, and the
    second-order gradient penalty — and assert loss, every meta field, AND
    d(loss)/d(state_features) match our flax MaxEntIRLLoss.

    The gradient comparison pins the subtlety that the reference masks
    reward_preds BEFORE autograd.grad, so the penalty sees (0-1)^2
    contributions outside the FOV (loss_utils.py:1193-1216).

    Each walk opens with a calibration segment of length 31.5 reward-grid
    cells so the reference's data-dependent ``max_steps = ceil(max dist)``
    equals our static 32: both sides then interpolate the identical
    ``linspace(0, 1, 32)`` points on every segment and the rasterized grids
    match bit-exactly (out-of-range coords clamp identically on both
    sides)."""
    rac, _ = exec_def("creste/utils/train_utils.py", "resize_and_crop")
    cev, _ = exec_def(
        "creste/utils/loss_utils.py", "MaxEntIRLLoss.compute_expert_visitation"
    )
    ns = base_ns(
        DEBUG_MAXENT_LOSS=False,
        tu=types.SimpleNamespace(resize_and_crop=rac),
    )
    loss_fn, _ = exec_def("creste/utils/loss_utils.py", "MaxEntIRLLoss.loss", ns)

    B, H, W, C, T = 2, 16, 24, 5, 12
    ds = 2.0
    rng = np.random.default_rng(11)

    def walk(t_steps):
        start = rng.uniform([2 * ds, 2 * ds], [(H - 2) * ds, (W - 2) * ds])
        steps = rng.uniform(-0.9, 0.9, (t_steps - 1, 2)) * ds
        # calibration segment: dist / ds == 31.5 -> ceil == 32 == our static
        # max_steps, making reference and jax interpolation grids identical
        steps[0] = (31.5 / np.sqrt(2.0)) * ds
        return np.cumsum(np.vstack([start[None], steps]), 0).astype(np.float32)

    xy = np.stack([walk(T) for _ in range(B)])  # [B, T, 2] full-res BEV
    gt = np.tile(np.eye(3, dtype=np.float32), (B, T, 1, 1))
    gt[:, :, 0, 2] = xy[..., 0]
    gt[:, :, 1, 2] = xy[..., 1]

    exp_svf = rng.uniform(0, 1, (B, H, W)).astype(np.float32)
    fov = (rng.uniform(0, 1, (B, 4 * H, 2 * W)) > 0.3)
    w_r = rng.normal(0, 1, (C,)).astype(np.float32)
    sf = rng.normal(0, 1, (B, C, H, W)).astype(np.float32)

    # batch 0 carries counterfactuals (2 of 3 ranked worse), batch 1 none
    cf0 = np.stack([walk(6) for _ in range(3)])  # [3, 6, 2]
    cf_list = [{"trajectories": cf0, "rank": np.array([0, 1, 2])}, None]

    self_ns = types.SimpleNamespace(
        pred_key="p", lab_key="l", fov_key="f", cf_key="c",
        map_ds=ds, map_sz=(H, W), maxent_weight=0.7, reward_weight=0.3,
        alpha=0.4, use_fov_mask=True, compute_expert_visitation=cev,
    )
    sf_t = torch.tensor(sf, requires_grad=True)
    reward_t = (sf_t * torch.tensor(w_r).view(1, C, 1, 1)).sum(1, keepdim=True)
    td_ref = {
        "p": torch.tensor(exp_svf), "l": torch.tensor(gt),
        "f": torch.tensor(fov), "c": cf_list,
        "outputs/traversability_preds": reward_t,
        "outputs/input_view": sf_t,
    }
    ld_ref, meta_ref = loss_fn(self_ns, td_ref)
    ref_total = ld_ref["maxentirl_loss"]
    ref_total.backward()
    ref_grad = t2n(sf_t.grad)

    cfg = {"name": "MaxEntIRLLoss", "weight": 1.0, "map_ds": ds,
           "map_sz": [H, W], "maxent_weight": 0.7, "reward_weight": 0.3,
           "alpha": 0.4, "use_fov_mask": True,
           "pred_key": "p", "lab_key": "l", "fov_key": "f", "cf_key": "c"}
    ours = lm.MaxEntIRLLoss(cfg)
    w_j = jnp.asarray(w_r)
    reward_fn = lambda iv: jnp.sum(iv * w_j, axis=-1, keepdims=True)  # noqa: E731
    cf_pad = {
        "trajectories": jnp.asarray(
            np.stack([cf0, np.zeros_like(cf0)])),  # [B, 3, 6, 2]
        "rank": jnp.asarray(np.array([[0, 1, 2], [0, 0, 0]], np.int32)),
        "valid": jnp.asarray(
            np.array([[True, True, True], [False, False, False]])),
    }

    def total_j(iv):
        td = {
            "p": jnp.asarray(exp_svf), "l": jnp.asarray(gt),
            "f": jnp.asarray(fov), "c": cf_pad,
            "outputs/traversability_preds": reward_fn(iv),
            "outputs/input_view": iv,
        }
        ld, meta = ours(td, {"reward_fn": reward_fn})
        w, v = ld["maxentirl_loss"]
        return w * v, meta

    iv_j = jnp.asarray(sf.transpose(0, 2, 3, 1))
    (total, meta_j), grad_j = jax.value_and_grad(total_j, has_aux=True)(iv_j)

    np.testing.assert_allclose(float(total), float(t2n(ref_total)),
                               rtol=1e-5, atol=1e-6)
    for k in ("reward_penalty", "mean_expected_svf_rewards",
              "mean_svf_rewards", "sum_cf_rewards", "sum_opt_rewards"):
        np.testing.assert_allclose(
            float(meta_j[k]), float(t2n(meta_ref[k])),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(grad_j).transpose(0, 3, 1, 2), ref_grad,
        rtol=1e-4, atol=1e-6,
    )


# ---------------------------------------------------------------------------
# MergeUnit + stacked ConvGRU end-to-end across chunks (rnn.py:8-146 +
# convgru.py:13-365) — pre-RNN ConvLayer, channel groups folded to batch,
# 2-layer recurrence, bos reset, detached cross-chunk hidden carry
# ---------------------------------------------------------------------------


class _CudaFreeTorch:
    """torch proxy whose .cuda.FloatTensor is the CPU FloatTensor (the
    reference hardcodes dtype=torch.cuda.FloatTensor in rnn.py:48)."""

    cuda = types.SimpleNamespace(FloatTensor=torch.FloatTensor)

    def __getattr__(self, item):
        return getattr(torch, item)


def test_reference_merge_unit_e2e():
    from torch.autograd import Variable

    gru_ns = base_ns(Variable=Variable)
    for name in ("ConvGRUCell", "ConvGRUCellSimple", "ConvGRU"):
        exec_def("creste/models/blocks/convgru.py", name, gru_ns)
    conv_layer, _ = exec_def("creste/models/blocks/conv.py", "ConvLayer")
    mu_ns = base_ns(
        torch=_CudaFreeTorch(),
        convgru=types.SimpleNamespace(ConvGRU=gru_ns["ConvGRU"]),
        conv=types.SimpleNamespace(ConvLayer=conv_layer),
    )
    merge_cls, _ = exec_def("creste/models/blocks/rnn.py", "MergeUnit", mu_ns)

    B, T, H, W, Cin = 2, 3, 6, 6, 12
    rnn_in, groups = 8, 2
    hidden_dims = [8, 8]
    rnn_cfg = {
        "hidden_dims": hidden_dims, "input_size": (H, W),
        "kernel_size": (3, 3), "groups": groups, "cell_type": "GRU",
    }
    ref = merge_cls(Cin, rnn_input_channels=rnn_in, rnn_config=rnn_cfg)
    ref.eval()

    rng = np.random.default_rng(7)

    def rnd(*shape):
        return rng.normal(0, 0.5, shape).astype(np.float32)

    # one parameter set, written into BOTH models
    w_pre = rnd(rnn_in, Cin, 1, 1)
    bn_scale, bn_bias = rnd(rnn_in), rnd(rnn_in)
    bn_mean, bn_var = rnd(rnn_in) * 0.3, rng.uniform(
        0.5, 1.5, rnn_in).astype(np.float32)
    cells = []
    cin_g = rnn_in // groups
    for hd in (h // groups for h in hidden_dims):
        cells.append({
            "gates_w": rnd(2 * hd, cin_g + hd, 3, 3), "gates_b": rnd(2 * hd),
            "can_w": rnd(hd, cin_g + hd, 3, 3), "can_b": rnd(hd),
        })
        cin_g = hd

    with torch.no_grad():
        ref.pre_rnn_conv.conv.weight.copy_(torch.tensor(w_pre))
        ref.pre_rnn_conv.norm.weight.copy_(torch.tensor(bn_scale))
        ref.pre_rnn_conv.norm.bias.copy_(torch.tensor(bn_bias))
        ref.pre_rnn_conv.norm.running_mean.copy_(torch.tensor(bn_mean))
        ref.pre_rnn_conv.norm.running_var.copy_(torch.tensor(bn_var))
        for cell, cw in zip(ref.rnn.cell_list, cells):
            cell.conv_gates.weight.copy_(torch.tensor(cw["gates_w"]))
            cell.conv_gates.bias.copy_(torch.tensor(cw["gates_b"]))
            cell.conv_can.weight.copy_(torch.tensor(cw["can_w"]))
            cell.conv_can.bias.copy_(torch.tensor(cw["can_b"]))

    from creste_public_tpu.models.blocks.convgru import MergeUnit

    variables = {
        "params": {
            "pre_rnn_conv": {"kernel": w_pre.transpose(2, 3, 1, 0)},
            "pre_rnn_bn": {"scale": bn_scale, "bias": bn_bias},
            "rnn": {
                f"cell_{i}": {
                    "conv_gates": {
                        "kernel": cw["gates_w"].transpose(2, 3, 1, 0),
                        "bias": cw["gates_b"],
                    },
                    "conv_can": {
                        "kernel": cw["can_w"].transpose(2, 3, 1, 0),
                        "bias": cw["can_b"],
                    },
                }
                for i, cw in enumerate(cells)
            },
        },
        "batch_stats": {"pre_rnn_bn": {"mean": bn_mean, "var": bn_var}},
    }
    ours = MergeUnit({"rnn_input_channels": rnn_in, "rnn_config": rnn_cfg})

    x1 = rnd(B * T, Cin, H, W)
    x2 = rnd(B * T, Cin, H, W)
    bos1 = torch.tensor([True] + [False] * (T - 1)).repeat(B)
    bos2 = torch.zeros(B * T, dtype=torch.bool)

    with torch.no_grad():
        out1_ref = ref(torch.tensor(x1), t=T, bos=bos1)
        out2_ref = ref(torch.tensor(x2), t=T, bos=bos2)

    out1_j, hid = ours.apply(
        variables, jnp.asarray(x1.transpose(0, 2, 3, 1)), t=T, bos=True
    )
    out2_j, _ = ours.apply(
        variables, jnp.asarray(x2.transpose(0, 2, 3, 1)), t=T,
        hidden=hid, bos=False,
    )

    # carried hidden between chunks matches the reference's detached state
    for h_j, h_ref in zip(hid, ref.hidden_state):
        assert np.asarray(h_j).shape[0] == B * groups
    np.testing.assert_allclose(
        np.asarray(out1_j).transpose(0, 3, 1, 2), t2n(out1_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out2_j).transpose(0, 3, 1, 2), t2n(out2_ref), atol=2e-5
    )


# ---------------------------------------------------------------------------
# TerrainNet.load_weights checkpoint surgery (terrainnet.py:111-261): the
# Lightning-prefix strip, stage-1 key rewrite, per-mode key dropping, and
# the 6 freeze policies — vs surgery.STAGE_SUBMODULE graft semantics,
# surgery.LOAD_SETTING_SKIP_RESTORE, and optim.LOAD_SETTING_FROZEN
# ---------------------------------------------------------------------------

_TN_PARAMS = [
    "depthcomp.depthcomp.vision.conv.weight",
    "depthcomp.depthcomp.depth_head.0.weight",
    "depthcomp.dino_head.0.weight",
    "cam2map.z_proj.0.weight",
    "cam2map.vision_fusion.weight",
    "merge.pre_rnn_conv.conv.weight",
    "bevclassifier.conv1.weight",
    "bevclassifier.out_heads.0.up1.conv.weight",
    "bevclassifier.out_heads.0.up2.1.weight",
    "bevclassifier.out_heads.0.proj.weight",
    "bevclassifier.out_heads.1.up2.1.weight",
    "bevclassifier.out_heads.1.proj.weight",
    "bevclassifier.out_heads.2.up1.conv.weight",
    "bevclassifier.out_heads.2.up2.1.weight",
    "bevclassifier.out_heads.2.proj.weight",
]


def _tn_flax_path(ref_name: str) -> str:
    """Map a reference torch param name onto our flax path convention."""
    p = ref_name
    for i in range(3):
        p = p.replace(f"bevclassifier.out_heads.{i}.", f"bevclassifier/head_{i}/")
    return p.replace(".", "/").replace("weight", "kernel")


class _TNParam:
    def __init__(self):
        self.requires_grad = True


class _TNStub:
    """TerrainNet stand-in exposing exactly what load_weights touches."""

    def __init__(self, load_setting, head_channels,
                 vision_class="DistillationBackbone"):
        self._params = {n: _TNParam() for n in _TN_PARAMS}
        self.vision_cfg = {"class_name": vision_class}
        self.load_setting = load_setting
        heads = []
        for i, c in enumerate(head_channels):
            sub = [n for n in _TN_PARAMS
                   if n.startswith(f"bevclassifier.out_heads.{i}.")]
            heads.append(types.SimpleNamespace(
                proj=types.SimpleNamespace(out_channels=c),
                named_parameters=(
                    lambda s=sub: [(n, self._params[n]) for n in s]
                ),
            ))
        self.bevclassifier = types.SimpleNamespace(out_heads=heads)
        self.loaded = None
        self.strict = None

    def named_parameters(self):
        return list(self._params.items())

    def load_state_dict(self, sd, strict=False):
        self.loaded = set(sd.keys())
        self.strict = strict


def _exec_load_weights(tmp_path, state_keys, load_setting, head_channels,
                       vision_class="DistillationBackbone"):
    fn, _ = exec_def(
        "creste/models/terrainnet.py", "TerrainNet.load_weights",
        DEBUG_TERRAINNET=False,
    )
    ckpt = tmp_path / f"ckpt_{load_setting}.pt"
    torch.save({"state_dict": {k: torch.zeros(1) for k in state_keys}}, ckpt)
    stub = _TNStub(load_setting, head_channels, vision_class)
    fn(stub, str(ckpt))
    return stub


def test_reference_load_weights_stage1_rewrite(tmp_path):
    """Stage-1 ckpts rewrite depthcomp./dino_head. under a second depthcomp.
    prefix (terrainnet.py:125-141) — exactly prefixing the whole stage-1
    tree with STAGE_SUBMODULE['ssc'], i.e. our subtree graft."""
    from creste_public_tpu.training.surgery import STAGE_SUBMODULE

    stage1 = [
        "depthcomp.vision.conv.weight",
        "depthcomp.depth_head.0.weight",
        "dino_head.0.weight",
    ]
    keys = ["model." + k for k in stage1] + ["model.loss.0.logvar"]
    stub = _exec_load_weights(tmp_path, keys, "strict", (32, 6, 2))
    assert stub.strict is True
    prefix = STAGE_SUBMODULE["ssc"]
    assert stub.loaded == {f"{prefix}.{k}" for k in stage1}

    # FoundationBackbone models skip the rewrite entirely (:140)
    stub = _exec_load_weights(
        tmp_path, keys, "strict", (32, 6, 2), vision_class="FoundationBackbone"
    )
    assert stub.loaded == set(stage1)


@pytest.mark.parametrize("head_channels", [(32, 6, 2), (32, 6, 1)])
@pytest.mark.parametrize("mode", [
    "strict", "strict_freeze", "strict_unfreezesplat",
    "ft_semantic_head", "ft_decoders_all", "ft_decoders_partial",
])
def test_reference_load_weights_modes(tmp_path, mode, head_channels):
    """Execute each load_setting branch of the reference's own load_weights
    on a stage-2-shaped ckpt; assert the loaded-key set matches our
    restore/skip rules and the requires_grad partition matches our freeze
    predicates — including ft_semantic_head's selection of decoder heads by
    proj.out_channels==1 (NOT by position) and ft_decoders_* keeping fresh
    init for the dropped subtrees."""
    from creste_public_tpu.training.optim import (
        LOAD_SETTING_FROZEN, ParamsPredFactory,
    )
    from creste_public_tpu.training.surgery import LOAD_SETTING_SKIP_RESTORE

    keys = ["model." + n for n in _TN_PARAMS] + ["model.loss.0.logvar"]
    stub = _exec_load_weights(tmp_path, keys, mode, head_channels)

    strict_modes = {"strict", "strict_freeze"}
    assert stub.strict is (mode in strict_modes)

    # per-key restore decision
    skip = LOAD_SETTING_SKIP_RESTORE.get(mode, lambda p: False)
    for n in _TN_PARAMS:
        assert (n in stub.loaded) == (not skip(_tn_flax_path(n))), n
    # loss keys are dropped only by the strict* branches
    drops_loss = mode in {"strict", "strict_freeze", "strict_unfreezesplat"}
    assert ("loss.0.logvar" in stub.loaded) == (not drops_loss)

    # requires_grad partition vs our freeze predicate
    pred = LOAD_SETTING_FROZEN[mode]
    if isinstance(pred, ParamsPredFactory):
        params = {"bevclassifier": {
            f"head_{i}": {"proj": {"kernel": np.zeros((1, 1, 128, c))}}
            for i, c in enumerate(head_channels)
        }}
        pred = pred(params)
    for n, p in stub.named_parameters():
        ours_trainable = pred is None or not pred(_tn_flax_path(n))
        assert p.requires_grad == ours_trainable, (mode, n)


# ---------------------------------------------------------------------------
# MultiScaleFCN reward head (conv.py:88-161) — the module the fused Pallas
# deployment kernels (ops/reward_pallas.py) also implement
# ---------------------------------------------------------------------------


def test_reference_multiscale_fcn_reward_head():
    """Execute the reference's OWN ConvLayer + MultiScaleFCN classes at the
    production head config; assert reference == flax == fused-pallas with
    the same weights and randomized BN statistics."""
    from creste_public_tpu.config import presets
    from creste_public_tpu.models.blocks.convnets import MultiScaleFCN
    from creste_public_tpu.ops.reward_pallas import msfcn_fused_apply

    ns = base_ns()
    exec_def("creste/models/blocks/conv.py", "ConvLayer", ns)
    ref_cls, _ = exec_def("creste/models/blocks/conv.py", "MultiScaleFCN", ns)

    head_cfg = presets.traversability_model_config().to_dict()[
        "traversability_head"]["net_kwargs"]["reward_cfg"]["net_kwargs"]

    def sub_ns(d):
        return types.SimpleNamespace(
            kernels=list(d["kernels"]), dims=list(d["dims"]),
            stride=list(d["stride"]), norm_type=d["norm_type"])

    cfg_ns = types.SimpleNamespace(
        prepool=sub_ns(head_cfg["prepool"]), skip=sub_ns(head_cfg["skip"]),
        trunk=sub_ns(head_cfg["trunk"]), postpool=sub_ns(head_cfg["postpool"]))
    ref = ref_cls(cfg_ns).eval()

    model = MultiScaleFCN(head_cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 128, 40)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    # randomize BN stats so the running-average path is exercised
    bs = jax.tree_util.tree_map(
        lambda v: jnp.abs(v + 0.3 * np.float32(rng.standard_normal(v.shape))),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    params, stats = variables["params"], variables["batch_stats"]

    def load_conv_bn(layer, pname):
        w = np.asarray(params[pname]["Conv_0"]["kernel"])  # HWIO
        layer.conv.weight.data = torch.tensor(w.transpose(3, 2, 0, 1))
        layer.norm.weight.data = torch.tensor(
            np.asarray(params[pname]["BatchNorm_0"]["scale"]))
        layer.norm.bias.data = torch.tensor(
            np.asarray(params[pname]["BatchNorm_0"]["bias"]))
        layer.norm.running_mean.data = torch.tensor(
            np.asarray(stats[pname]["BatchNorm_0"]["mean"]))
        layer.norm.running_var.data = torch.tensor(
            np.asarray(stats[pname]["BatchNorm_0"]["var"]))

    for i in range(len(head_cfg["prepool"]["kernels"])):
        load_conv_bn(ref.prepool[i], f"prepool_{i}")
    for i in range(len(head_cfg["skip"]["kernels"])):
        load_conv_bn(ref.skip[i], f"skip_{i}")
    for i in range(len(head_cfg["postpool"]["kernels"])):
        load_conv_bn(ref.postpool[i], f"postpool_{i}")
    for i in range(len(head_cfg["trunk"]["kernels"])):
        conv = ref.trunk[1 + 3 * i]
        w = np.asarray(params[f"trunk_{i}"]["Conv_0"]["kernel"])
        conv.conv.weight.data = torch.tensor(w.transpose(3, 2, 0, 1))
        bn = ref.trunk[2 + 3 * i]
        bn.weight.data = torch.tensor(
            np.asarray(params[f"trunk_bn_{i}"]["scale"]))
        bn.bias.data = torch.tensor(
            np.asarray(params[f"trunk_bn_{i}"]["bias"]))
        bn.running_mean.data = torch.tensor(
            np.asarray(stats[f"trunk_bn_{i}"]["mean"]))
        bn.running_var.data = torch.tensor(
            np.asarray(stats[f"trunk_bn_{i}"]["var"]))

    with torch.no_grad():
        out_ref = ref(torch.tensor(np.asarray(x).transpose(0, 3, 1, 2)))
    out_ref = np.asarray(out_ref).transpose(0, 2, 3, 1)

    out_flax = np.asarray(model.apply(variables, x, False))
    np.testing.assert_allclose(out_flax, out_ref, rtol=1e-4, atol=1e-4)

    out_fused = np.asarray(msfcn_fused_apply(variables, x, interpret=True))
    np.testing.assert_allclose(out_fused, out_ref, rtol=1e-4, atol=1e-4)


def test_reference_inpainting_resnet_multihead_wiring():
    """Execute the reference's OWN Inpainting/DeconvHead/
    InpaintingResNet18MultiHead classes (inpainting.py:9-109) + effnet.Up
    (effnet.py:8-29), with torchvision.resnet18 stubbed by the mirror's
    BasicBlock trunk (the only non-executable dependency). Strict
    state_dict interchange pins the parameter naming, and outputs must
    match the mirror bit-for-bit (shared trunk) — closing the wiring gap
    the module-level mirror golden left open."""
    ns = base_ns(prefix_dict=lambda p, d, seprator="/": {
        f"{p}{seprator}{k}": v for k, v in d.items()})
    exec_def("creste/models/blocks/effnet.py", "Up", ns)

    def fake_resnet18(**kwargs):
        return types.SimpleNamespace(
            bn1=torch.nn.BatchNorm2d(64),
            relu=torch.nn.ReLU(inplace=True),
            layer1=torch.nn.Sequential(tm.TorchBasicBlock(64, 64),
                                       tm.TorchBasicBlock(64, 64)),
            layer2=torch.nn.Sequential(tm.TorchBasicBlock(64, 128, 2),
                                       tm.TorchBasicBlock(128, 128)),
            layer3=torch.nn.Sequential(tm.TorchBasicBlock(128, 256, 2),
                                       tm.TorchBasicBlock(256, 256)),
        )

    ns["torchvision"] = types.SimpleNamespace(
        models=types.SimpleNamespace(
            resnet=types.SimpleNamespace(resnet18=fake_resnet18)))
    exec_def("creste/models/blocks/inpainting.py", "Inpainting", ns)
    exec_def("creste/models/blocks/inpainting.py", "DeconvHead", ns)
    ref_cls, _ = exec_def(
        "creste/models/blocks/inpainting.py", "InpaintingResNet18MultiHead",
        ns)

    num_classes = [6, 3, 1]
    ref = ref_cls(32, num_classes, input_key="bev_features",
                  output_prefix=["inpainting_sam", "inpainting_sam_dynamic",
                                 "elevation"]).eval()
    mirror = tm.TorchInpaintingResNet18MultiHead(
        32, num_classes,
        ["inpainting_sam", "inpainting_sam_dynamic", "elevation"]).eval()

    # strict naming interchange: every mirror param/buffer loads into the
    # reference module and vice versa
    missing = ref.load_state_dict(mirror.state_dict(), strict=False)
    assert not missing.missing_keys, missing.missing_keys
    assert not missing.unexpected_keys, missing.unexpected_keys

    torch.manual_seed(0)
    x = torch.randn(2, 32, 32, 32)
    with torch.no_grad():
        # full forward(): covers the Inpainting.forward prefix_dict
        # key-naming wiring, not just the head math
        ref_out = ref({"bev_features": x})
        mirror_out = mirror({"bev_features": x})
    ref_keys = {k for k, v in ref_out.items() if isinstance(v, torch.Tensor)}
    m_keys = {k for k, v in mirror_out.items()
              if isinstance(v, torch.Tensor)}
    assert ref_keys == m_keys, ref_keys ^ m_keys
    for k in sorted(ref_keys):
        np.testing.assert_array_equal(t2n(ref_out[k]), t2n(mirror_out[k]),
                                      err_msg=k)


def test_reference_cnnmlp_action_head():
    """Execute the reference's OWN MultiLayerConv + MultiLayerPerceptron +
    CnnMLP (cnnmlp.py:8-74, conv.py:5-32) against the flax CnnMLP with
    shared weights: early-fusion concat order, conv/BN/ReLU stacking,
    flatten layout, and the ReLU-after-every-Linear MLP (incl. the last)."""
    from creste_public_tpu.models.blocks.cnnmlp import CnnMLP

    class AttrDict(dict):
        __getattr__ = dict.__getitem__

    ns = base_ns(prefix_dict=lambda p, d, seprator="_": {
        f"{p}{seprator}{k}": v for k, v in d.items()})
    exec_def("creste/models/blocks/conv.py", "MultiLayerConv", ns)
    exec_def("creste/models/blocks/cnnmlp.py", "MultiLayerPerceptron", ns)
    ref_cls, _ = exec_def("creste/models/blocks/cnnmlp.py", "CnnMLP", ns)

    cnn_kwargs = {"dims": [6, 8], "kernels": [3], "paddings": [1],
                  "stride": [2], "norm_type": "batch_norm"}
    mlp_dims = [8 * 4 * 4, 16, 8]
    cfg = {
        "input_keys": ["a", "b"],
        "cnn_cfg": {"name": "MultiLayerConv",
                    "net_kwargs": AttrDict(cnn_kwargs)},
        "mlp_cfg": {"name": "MultiLayerPerceptron",
                    "net_kwargs": {"dims": mlp_dims}},
        "out_horizon": 4,
        "output_prefix": ["bc"],
    }
    ref = ref_cls(**cfg).eval()

    model = CnnMLP(cfg)
    rng = np.random.default_rng(5)
    a = rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
    b = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           {"a": jnp.asarray(a), "b": jnp.asarray(b)})
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    # flax -> torch weight copy (conv HWIO -> OIHW; Dense [in,out] -> [out,in])
    conv = ref.conv_layers.model[0]
    conv.weight.data = torch.tensor(np.asarray(
        params["conv"]["Conv_0"]["kernel"]).transpose(3, 2, 0, 1))
    conv.bias.data = torch.tensor(np.asarray(params["conv"]["Conv_0"]["bias"]))
    bn = ref.conv_layers.model[1]
    bnp = params["conv"]["BatchNorm_0"]
    bns = stats["conv"]["BatchNorm_0"]
    bn.weight.data = torch.tensor(np.asarray(bnp["scale"]))
    bn.bias.data = torch.tensor(np.asarray(bnp["bias"]))
    bn.running_mean.data = torch.tensor(np.asarray(bns["mean"]))
    bn.running_var.data = torch.tensor(np.asarray(bns["var"]))
    for i in range(2):
        lin = ref.mlp_head.model[2 * i]
        lin.weight.data = torch.tensor(np.asarray(
            params["mlp"][f"fc_{i}"]["kernel"]).T)
        lin.bias.data = torch.tensor(np.asarray(
            params["mlp"][f"fc_{i}"]["bias"]))

    out_flax = np.asarray(model.apply(
        variables, {"a": jnp.asarray(a), "b": jnp.asarray(b)}))

    # NHWC -> NCHW inputs; torch flattens CHW-major, flax HWC-major — the
    # MLP consumes a permutation-equivalent flatten, so compare through
    # the torch layout by permuting the flax conv features identically
    with torch.no_grad():
        tin = {"a": torch.tensor(a.transpose(0, 3, 1, 2)),
               "b": torch.tensor(b.transpose(0, 3, 1, 2))}
        tconv = ref.conv_layers(torch.cat([tin["a"], tin["b"]], dim=1))
        tout = ref(tin)["bc_preds"]

    # conv trunk parity (layout-adjusted)
    from creste_public_tpu.models.blocks.convnets import MultiLayerConv

    fconv = np.asarray(MultiLayerConv(AttrDict(cnn_kwargs), name="conv").apply(
        {"params": params["conv"], "batch_stats": stats["conv"]},
        jnp.asarray(np.concatenate([a, b], -1)), False))
    np.testing.assert_allclose(fconv.transpose(0, 3, 1, 2), t2n(tconv),
                               rtol=1e-4, atol=1e-5)

    # head parity: feed the torch-flattened features through the flax MLP
    flat_torch_order = t2n(tconv).reshape(2, -1)
    from creste_public_tpu.models.blocks.cnnmlp import MultiLayerPerceptron

    fmlp = np.asarray(MultiLayerPerceptron(tuple(mlp_dims), name="mlp").apply(
        {"params": params["mlp"]}, jnp.asarray(flat_torch_order)))
    np.testing.assert_allclose(
        fmlp.reshape(2, 4, 2), t2n(tout), rtol=1e-4, atol=1e-5)
    assert out_flax.shape == (2, mlp_dims[-1])


def test_reference_effnet_wrapper_wiring():
    """Execute the reference's OWN EffNet wrapper class (effnet.py:31-98):
    the Up-chain channel accumulation, odd-size endpoint scale_factor
    arithmetic, endpoint indexing (reduction_5 down to reduction_0 = the
    raw input), and the 1x1 projection — with efficientnet_pytorch stubbed
    by the mirror's trunk (the only non-executable dependency). Mirror
    outputs must match bit-for-bit under a strict state_dict interchange."""
    ns = base_ns()
    exec_def("creste/models/blocks/effnet.py", "Up", ns)

    class _FromPretrained:
        @staticmethod
        def from_pretrained(name):
            t = tm.TorchEffNetTrunk(in_ch=3, image_size=(64, 80))
            t.set_swish = lambda *a, **k: None
            return t

    def get_same_padding_conv2d(image_size):
        def make(in_ch, out_ch, kernel_size, stride, bias):
            return tm.Conv2dStaticSamePadding(
                in_ch, out_ch, kernel_size, stride, image_size, bias=bias)

        return make

    ns["EfficientNet"] = _FromPretrained
    ns["utils"] = types.SimpleNamespace(
        get_same_padding_conv2d=get_same_padding_conv2d)
    ref_cls, _ = exec_def("creste/models/blocks/effnet.py", "EffNet", ns)

    ref = ref_cls("efficientnet-b0", 4, 24, (64, 80), downsample=4).eval()
    mirror = tm.TorchEffNet(4, 24, (64, 80), downsample=4).eval()
    res = ref.load_state_dict(mirror.state_dict(), strict=False)
    assert not res.missing_keys, res.missing_keys
    assert not res.unexpected_keys, res.unexpected_keys

    torch.manual_seed(0)
    x = torch.randn(1, 4, 64, 80)
    with torch.no_grad():
        y_ref, feat_ref = ref(x)
        y_m, feat_m = mirror(x)
    np.testing.assert_array_equal(t2n(y_ref), t2n(y_m))
    np.testing.assert_array_equal(t2n(feat_ref), t2n(feat_m))


def test_reference_terrainnet_composite_wiring():
    """Execute the reference's OWN TerrainNet composite class
    (terrainnet.py:24-351): the depthcomp -> splat -> BEV-decoder wiring,
    the [B, N] view/reshape handling, splat_key plumbing, and output-dict
    key contract — submodules provided by the mirror classes through
    signature adapters. Strict state_dict interchange + bit-exact outputs
    vs TorchTerrainNet."""
    from creste_public_tpu.config import presets

    cfg = presets.tiny_terrainnet_config().to_dict()
    ns = composite_ns()
    ref_cls, _ = exec_def("creste/models/terrainnet.py", "TerrainNet", ns)

    ref = ref_cls(AttrCfg(cfg)).eval()
    mirror = tm.TorchTerrainNet(cfg).eval()
    res = ref.load_state_dict(mirror.state_dict(), strict=False)
    assert not res.missing_keys, res.missing_keys
    assert not res.unexpected_keys, res.unexpected_keys

    h, w = cfg["vision_backbone"]["effnet_cfgs"]["image_size"]
    rgbd, p2p = ref_deploy_inputs(h, w, seed=9)
    with torch.no_grad():
        ref_out = ref((torch.tensor(rgbd), torch.tensor(p2p)))
        m_out = mirror(torch.tensor(rgbd), torch.tensor(p2p))

    ref_keys = {k for k, v in ref_out.items() if isinstance(v, torch.Tensor)}
    m_keys = {k for k, v in m_out.items() if isinstance(v, torch.Tensor)}
    # the key CONTRACT, not just the intersection: a naming divergence in
    # any head must fail, not silently drop out of the comparison
    assert ref_keys == m_keys, ref_keys ^ m_keys
    assert "bev_features" in ref_keys and "elevation_preds" in ref_keys
    for k in sorted(ref_keys):
        np.testing.assert_array_equal(t2n(ref_out[k]), t2n(m_out[k]),
                                      err_msg=k)


def test_reference_maxent_irl_deployed_graph():
    """Execute the reference's FULL deployed inference graph from its own
    source: MaxEntIRL (lfd.py:21-115,314-331, solve_mdp=False) ->
    TerrainNet (terrainnet.py) -> VIN (vin.py) -> MultiScaleFCN (conv.py),
    leaf-stubbed only at the EffNet trunk / splat (mirror modules via
    signature adapters). Outputs must match the mirror's deployed graph
    (TorchMaxEntIRLReward) bit-exactly — and that mirror is golden-tested
    vs flax at <=1e-3 (the north star), so reference == mirror == flax
    closes over the whole deployment graph."""
    from creste_public_tpu.config import presets

    cfg = presets.tiny_traversability_config().to_dict()
    cfg["solve_mdp"] = False
    cfg["vision_backbone"].setdefault("weights_path", "")
    cfg["vision_backbone"].setdefault("ckpt_path", "")

    fov_fn, _ = exec_def("creste/utils/train_utils.py",
                         "create_trapezoidal_fov_mask")
    ns = composite_ns(
        tu=types.SimpleNamespace(create_trapezoidal_fov_mask=fov_fn),
        np=np,
        optim=None,
        DEBUG_MODE=0,
    )
    exec_def("creste/models/blocks/conv.py", "ConvLayer", ns)
    exec_def("creste/models/blocks/conv.py", "MultiScaleFCN", ns)
    exec_def("creste/models/terrainnet.py", "TerrainNet", ns)
    exec_def("creste/models/blocks/vin.py", "VIN", ns)
    ref_cls, _ = exec_def("creste/models/lfd.py", "MaxEntIRL", ns)

    ref = ref_cls(AttrCfg(cfg)).eval()
    mirror = tm.TorchMaxEntIRLReward(cfg).eval()

    res = ref.load_state_dict(mirror.state_dict(), strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    # reference-only constants the mirror bakes in instead: the VIN Bellman
    # buffer, the MDP dynamics table, and (policy 'pp') transition probs
    allowed = {"dynamics", "transition_probs", "traversability_head.w"}
    assert set(res.missing_keys) <= allowed, res.missing_keys

    h, w = cfg["vision_backbone"]["vision_backbone"]["effnet_cfgs"][
        "image_size"]
    rgbd, p2p = ref_deploy_inputs(h, w, seed=11)
    with torch.no_grad():
        ref_out = ref((torch.tensor(rgbd), torch.tensor(p2p)))
        m_out = mirror(torch.tensor(rgbd), torch.tensor(p2p))

    ref_keys = {k for k, v in ref_out.items() if isinstance(v, torch.Tensor)}
    m_keys = {k for k, v in m_out.items() if isinstance(v, torch.Tensor)}
    assert ref_keys == m_keys, ref_keys ^ m_keys
    assert "traversability_preds" in ref_keys
    assert "traversability_preds_full" in ref_keys
    for k in sorted(ref_keys):
        np.testing.assert_array_equal(t2n(ref_out[k]), t2n(m_out[k]),
                                      err_msg=k)


def test_reference_distillation_backbone_wiring():
    """Execute the reference's OWN DistillationBackbone class
    (distillation.py:18-207) single-view core path with its dino_head
    built from the reference's OWN MultiLayerConv (conv.py:5-32) —
    only DepthCompletion is mirror-stubbed. Strict state_dict
    interchange + bit-exact outputs vs TorchDistillationBackbone,
    incl. the learnable PE map interpolate->pe_head->add path."""
    from creste_public_tpu.config import presets

    cfg = presets.tiny_pefree_config().to_dict()
    # mirror models the single-view core path; the multiview splat is
    # covered by the cam2map/splat goldens
    cfg["multiview_distillation"] = False
    cfg.setdefault("weights_path", "")
    cfg.setdefault("ckpt_path", "")

    ns = composite_ns(MSNet2D=None)  # stereo trunk unused in this config
    exec_def("creste/models/blocks/conv.py", "MultiLayerConv", ns)
    ref_cls, _ = exec_def(
        "creste/models/distillation.py", "DistillationBackbone", ns)

    ref = ref_cls(AttrCfg(cfg)).eval()
    # reference quirk: camproj_cfg is only assigned under
    # multiview_distillation, yet forward's pe_map branch reads it — the
    # single-view+pe_map combination is unreachable as shipped (their
    # config sets multiview True); bind the attribute to execute it
    ref.camproj_cfg = None
    mirror = tm.TorchDistillationBackbone(cfg).eval()
    res = ref.load_state_dict(mirror.state_dict(), strict=False)
    assert not res.missing_keys, res.missing_keys
    assert not res.unexpected_keys, res.unexpected_keys

    h, w = cfg["vision_backbone"]["effnet_cfgs"]["image_size"]
    rgbd, _ = ref_deploy_inputs(h, w, seed=13)
    x = torch.tensor(rgbd)  # [B, V=1, 4, H, W]
    with torch.no_grad():
        ref_out = ref(x)
        m_out = mirror(x.reshape(1, 4, h, w))

    ref_keys = {k for k, v in ref_out.items() if isinstance(v, torch.Tensor)}
    m_keys = {k for k, v in m_out.items() if isinstance(v, torch.Tensor)}
    assert ref_keys == m_keys, ref_keys ^ m_keys
    assert {"dino_pe", "dino_pefree_feats", "dino_pe_feats",
            "depth_preds_metric"} <= ref_keys
    for k in sorted(ref_keys):
        a, b = t2n(ref_out[k]), t2n(m_out[k])
        # reference views some outputs as [B, V, ...]; same bytes at V=1
        np.testing.assert_array_equal(a.reshape(b.shape), b, err_msg=k)


def test_reference_depth_completion_wiring():
    """Execute the reference's OWN DepthCompletion class (depth.py:17-160)
    with its own MultiLayerConv depth head AND its own
    convert_to_metric_depth_differentiable (depth_utils.py) — only the
    VisionEncoder's EffNet trunk is mirror-backed. Strict state_dict
    interchange + bit-exact outputs vs TorchDepthCompletion (logits,
    softmax-expectation metric depth, argmax bins, feats)."""
    from creste_public_tpu.config import presets

    cfg = presets.tiny_pefree_config().to_dict()
    cfg["vision_backbone"].setdefault("weights_path", "")

    metric_fn, _ = exec_def("creste/utils/depth_utils.py",
                            "convert_to_metric_depth_differentiable")

    class _VisionEncoder(tm.TorchVisionEncoder):
        def __init__(self, vision_cfg):
            super().__init__(plain_cfg(vision_cfg))

    ns = composite_ns(
        VisionEncoder=_VisionEncoder,
        convert_to_metric_depth_differentiable=metric_fn,
        DEBUG_DEPTH=False,
    )
    exec_def("creste/models/blocks/conv.py", "MultiLayerConv", ns)
    ref_cls, _ = exec_def("creste/models/depth.py", "DepthCompletion", ns)

    ref = ref_cls(AttrCfg(cfg)).eval()
    mirror = tm.TorchDepthCompletion(cfg).eval()
    res = ref.load_state_dict(mirror.state_dict(), strict=False)
    assert not res.missing_keys, res.missing_keys
    assert not res.unexpected_keys, res.unexpected_keys

    h, w = cfg["vision_backbone"]["effnet_cfgs"]["image_size"]
    rgbd, _ = ref_deploy_inputs(h, w, seed=17)
    x = torch.tensor(rgbd.reshape(1, 4, h, w))
    with torch.no_grad():
        ref_out = ref(x)
        m_out = mirror(x)

    for k in ("depth_preds_logits", "depth_preds_metric",
              "depth_preds_bins", "depth_preds_feats"):
        assert k in ref_out and k in m_out, k
        np.testing.assert_array_equal(t2n(ref_out[k]), t2n(m_out[k]),
                                      err_msg=k)
