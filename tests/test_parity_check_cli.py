"""End-to-end parity_check.py run against a real torch checkpoint.

Closes the round-1 gap "parity_check.py has never run with real weights":
the pure-torch mirror (parity/torch_mirror.py) acts as the reference — its
state_dict is saved as a Lightning-style checkpoint, its forward outputs
become the expected pickle, and the CLI must import the checkpoint through
convert_torch_state_dict and match the reward map to <=1e-3.

This exercises the torch->flax IMPORT direction on genuine torch tensors
(the golden tests cover flax->torch export).
"""
import pickle
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

from creste_public_tpu.config import presets
from creste_public_tpu.models import MaxEntIRL
from creste_public_tpu.parity import torch_mirror as tm
from creste_public_tpu.training.torch_import import (
    convert_torch_state_dict,
    export_torch_style,
    merge_into_variables,
)


def test_parity_check_cli_with_torch_checkpoint(tmp_path, capsys, monkeypatch):
    cfg = presets.tiny_traversability_config()
    cfg_d = cfg.to_dict()
    cfg_d["solve_mdp"] = False

    # 1. a randomized flax model defines the weights; the torch mirror
    #    loads them and BECOMES the reference checkpoint
    from tests.test_golden_torch import make_inputs, randomize_variables

    model = MaxEntIRL(cfg_d)
    rgbd, p2p = make_inputs(cfg.vision_backbone)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(rgbd), jnp.asarray(p2p), None, False)
    variables = randomize_variables(variables, seed=11)

    mirror = tm.TorchMaxEntIRLReward(cfg_d)
    tm.load_exported_state_dict(mirror, export_torch_style(variables))
    mirror.eval()

    ckpt_path = tmp_path / "reference.ckpt"
    torch.save(
        {"state_dict": {f"model.{k}": v
                        for k, v in mirror.state_dict().items()}},
        ckpt_path,
    )

    # 2. reference outputs from the torch mirror forward
    with torch.no_grad():
        tout = mirror(
            torch.from_numpy(np.transpose(rgbd[:, 0], (0, 3, 1, 2))
                             ).unsqueeze(1),
            torch.from_numpy(p2p))
    expected = {"traversability_preds":
                tout["traversability_preds"].numpy()}
    expected_path = tmp_path / "expected.pkl"
    with open(expected_path, "wb") as f:
        pickle.dump(expected, f)
    sample_path = tmp_path / "sample.pkl"
    with open(sample_path, "wb") as f:
        pickle.dump({"rgbd": rgbd, "p2p": p2p}, f)

    # 3. the import path must reconstruct the weights: convert + merge,
    #    then the CLI itself end to end
    sd = {k: np.asarray(v) for k, v in mirror.state_dict().items()}
    params, stats, unmatched = convert_torch_state_dict(sd, strip_prefixes=())
    real_unmatched = [k for k in unmatched
                      if "num_batches_tracked" not in k]
    assert not real_unmatched, f"unmatched torch keys: {real_unmatched[:8]}"
    merged = merge_into_variables(variables, params, stats,
                                  require_match=False)
    out = model.apply(merged, jnp.asarray(rgbd), jnp.asarray(p2p), None,
                      False)
    got = np.transpose(np.asarray(out["traversability_preds"]), (0, 3, 1, 2))
    dev = float(np.abs(got - expected["traversability_preds"]).max())
    assert dev <= 1e-3, f"import-direction reward deviation {dev:.2e}"

    # 4. the CLI end to end
    sys.path.insert(0, "scripts/runtime")
    import importlib

    parity_check = importlib.import_module("parity_check")
    monkeypatch.setattr(sys, "argv", [
        "parity_check.py", "--ckpt", str(ckpt_path), "--tiny",
        "--sample", str(sample_path), "--expected", str(expected_path),
    ])
    parity_check.main()
    printed = capsys.readouterr().out
    assert "FAIL" not in printed
    assert "worst deviation" in printed


def test_parity_check_cli_with_torchscript_trace(tmp_path, capsys, monkeypatch):
    """The RELEASED artifact is a TorchScript trace, not a state_dict
    (download_weights.sh:20-21). `parity_check.py --trace` must pull the
    weights out of the trace's state_dict AND execute the trace itself as
    the reference output (VERDICT r2 #7)."""
    from tests.test_golden_torch import make_inputs, randomize_variables

    cfg = presets.tiny_traversability_config()
    cfg_d = cfg.to_dict()
    cfg_d["solve_mdp"] = False

    model = MaxEntIRL(cfg_d)
    rgbd, p2p = make_inputs(cfg.vision_backbone)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(rgbd), jnp.asarray(p2p), None, False)
    variables = randomize_variables(variables, seed=23)

    mirror = tm.TorchMaxEntIRLReward(cfg_d)
    tm.load_exported_state_dict(mirror, export_torch_style(variables))
    mirror.eval()

    # trace exactly as the reference compiles (compile.py:197: strict=False
    # because the output is a dict)
    rgbd_t = torch.from_numpy(
        np.transpose(rgbd, (0, 1, 4, 2, 3))).contiguous()
    p2p_t = torch.from_numpy(p2p)
    with torch.no_grad():
        traced = torch.jit.trace(mirror, (rgbd_t, p2p_t), strict=False)
    trace_path = tmp_path / "creste_rgbd_trace.pt"
    torch.jit.save(traced, str(trace_path))

    sample_path = tmp_path / "sample.pkl"
    with open(sample_path, "wb") as f:
        pickle.dump({"rgbd": rgbd, "p2p": p2p}, f)

    sys.path.insert(0, "scripts/runtime")
    import importlib

    parity_check = importlib.import_module("parity_check")
    monkeypatch.setattr(sys, "argv", [
        "parity_check.py", "--ckpt", str(trace_path), "--trace", "--tiny",
        "--sample", str(sample_path),
    ])
    parity_check.main()
    printed = capsys.readouterr().out
    assert "FAIL" not in printed
    assert "traversability_preds" in printed
    assert "worst deviation" in printed
