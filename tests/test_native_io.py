"""Native IO core vs PIL reference decode."""
import os
import time

import numpy as np
import pytest

from creste_public_tpu.data import native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="libcreste_io.so not built"
)


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("io")
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    jpg = str(d / "img.jpg")
    Image.fromarray(rgb).save(jpg, quality=95)
    depth = rng.integers(0, 30000, (48, 64)).astype(np.uint16)
    png = str(d / "depth.png")
    Image.fromarray(depth).save(png)
    flo = rng.normal(size=(1000,)).astype(np.float32)
    binp = str(d / "cloud.bin")
    flo.tofile(binp)
    return jpg, png, binp, rgb, depth, flo


def test_jpeg_matches_pil(files):
    from PIL import Image

    jpg, _, _, _, _, _ = files
    ours = native_io.decode_jpeg(jpg)
    ref = np.asarray(Image.open(jpg).convert("RGB"))
    assert ours.shape == ref.shape
    # independent IDCT implementations may round differently by ±1
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_png16_exact(files):
    _, png, _, _, depth, _ = files
    ours = native_io.decode_png16(png)
    np.testing.assert_array_equal(ours, depth)


def test_bin_read_exact(files):
    _, _, binp, _, _, flo = files
    out = native_io.read_bin(binp, max_floats=2000)
    np.testing.assert_array_equal(out, flo)


def test_assemble_rgbd_fused(files):
    jpg, png, _, _, depth, _ = files
    out = native_io.assemble_rgbd(jpg, png)
    assert out.shape == (48, 64, 4)
    assert out.dtype == np.float32
    assert 0.0 <= out[..., :3].min() and out[..., :3].max() <= 1.0
    np.testing.assert_array_equal(out[..., 3], depth.astype(np.float32))
    # no-depth form
    out2 = native_io.assemble_rgbd(jpg, None)
    assert (out2[..., 3] == 0).all()


def test_parallel_assembler(files):
    jpg, png, _, _, _, _ = files
    asm = native_io.ParallelAssembler(num_threads=4)
    batch = asm.assemble_batch([(jpg, png)] * 8)
    assert batch.shape == (8, 48, 64, 4)
    assert np.allclose(batch[0], batch[7])
    asm.close()


def test_epoch_loader_abandonment_no_leak():
    """Abandoning an epoch mid-iteration must wind the producer down (the
    bounded put aborts on stop) instead of leaking a blocked thread."""
    import threading
    import time

    from creste_public_tpu.data.dataloader import EpochLoader
    from creste_public_tpu.data.synthetic import SyntheticCodaDataset

    ds = SyntheticCodaDataset(cfg={"image_size": [64, 80], "grid": 32,
                                   "map_range": 1.6, "fdn_dim": 16,
                                   "length": 12})
    dl = EpochLoader(ds, 2, prefetch=1, num_workers=2)
    base = threading.active_count()
    for trial in range(5):
        it = dl.epoch(trial)
        next(it)
        it.close()
    time.sleep(2.0)
    assert threading.active_count() - base <= 2
    assert sum(1 for _ in dl.epoch(99)) == 6
