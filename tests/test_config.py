"""Config composition + CLI group-override tests."""
import os

import pytest

from creste_public_tpu.config.config import Config, compose, compose_cli

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


def test_compose_root_groups():
    cfg = compose("ssc_sam", CONFIG_DIR)
    assert cfg["stage"] == "ssc"
    assert cfg["model"]["bev_classifier"]["net_kwargs"]["num_classes"] == [32, 6, 2]
    assert cfg["trainer"]["max_epochs"] == 50
    assert cfg["dataset"]["name"] == "synthetic"


def test_cli_group_selection_and_dotted_override():
    cfg = compose_cli(
        "ssc_sam", CONFIG_DIR,
        ["trainer=smoke", "model=ssc_sam/tiny", "model.batch_size=3",
         "dataset=synthetic_tiny"],
    )
    assert cfg["trainer"]["max_steps"] == 2
    assert cfg["model"]["batch_size"] == 3
    assert cfg["model"]["vision_backbone"]["effnet_cfgs"]["image_size"] == [64, 80]
    assert cfg["dataset"]["train"]["grid"] == 32


def test_all_roots_compose():
    for root in ("distillation", "ssc_sam", "traversability"):
        cfg = compose(root, CONFIG_DIR)
        assert "model" in cfg and "trainer" in cfg and "dataset" in cfg
        assert "loss" in cfg["model"]


def test_attribute_access_and_update():
    c = Config({"a": {"b": 1}})
    assert c.a.b == 1
    c2 = Config(c)
    c2["a"]["b"] = 2
    assert c2.a.b == 2


def test_appended_group_composes():
    """CLI groups absent from the root defaults append (hydra +group=opt;
    the reference's visualize group, configs/visualize/*)."""
    import os

    from creste_public_tpu.config.config import compose_cli

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = compose_cli("distillation", cfg_dir,
                      ["visualize=effnet_distillation"])
    assert "visualize" in cfg
    assert cfg["visualize"]["every_n_epochs"] == 1
