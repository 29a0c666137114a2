from creste_public_tpu.config.config import (
    Config,
    compose,
    load_yaml,
    apply_overrides,
)

__all__ = ["Config", "compose", "load_yaml", "apply_overrides"]
