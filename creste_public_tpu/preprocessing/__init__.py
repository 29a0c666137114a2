"""Offline label-generation pipeline (TPU/XLA-native replacements).

Mirrors the reference's scripts/preprocessing stack (SURVEY §2.5) as a
library: every hot numeric kernel is a jitted op in
``creste_public_tpu.ops`` (depth z-buffer, IDW infill, elevation binning +
gap-scan, PCA reduction); the modules here orchestrate file I/O, pose
chains and split logic on the host. The CLI wrappers live in
``scripts/preprocessing``.
"""
