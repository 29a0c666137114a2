"""Golden parity harness: pure-torch mirrors of the reference models.

The north-star fidelity target (BASELINE.md: <=1e-3 reward-map deviation vs
the PyTorch reference) needs an *independent* numerical oracle. Everything in
``creste_public_tpu.parity.torch_mirror`` re-implements the reference's
modules in plain torch (no efficientnet_pytorch / torchvision / torch_scatter
— none are installed), using torch's own conv / BN / bilinear-resize kernels
and the reference's exact module names, so state_dicts produced by
``training.torch_import.export_torch_style`` load directly and outputs can be
diffed layer by layer against the flax models.

torch is imported lazily; the core framework never depends on it.
"""
