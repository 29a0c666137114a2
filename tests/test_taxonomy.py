"""Label taxonomy tables + SSC/SOC count-bin loaders."""
import numpy as np

from creste_public_tpu.data import taxonomy as T


def test_table_shapes():
    assert len(T.SEM_CLASSES) == 25
    assert len(T.OBJ_CLASSES) == 60
    assert T.NUM_SEM_REMAPPED == 18
    assert T.NUM_OBJ_REMAPPED == 32
    assert T.SEM_REMAP.shape == (25,)
    assert T.OBJ_REMAP.shape == (60,)
    # unlabeled stays class 0 in both taxonomies
    assert T.SEM_CLASSES["unlabeled"] == (0, 0)
    assert T.SEM_REMAP[0] == 0 and T.OBJ_REMAP[0] == 0


def test_sem_remap_merges_tilings():
    # all four tiling variants collapse onto one remapped id
    tile_ids = [T.SEM_REMAP[T.SEM_CLASSES[n][0]] for n in (
        "light marbiling tiling", "dark marble tiling", "porcelain tile",
        "blond marble tiling",
    )]
    assert len(set(tile_ids)) == 1
    assert T.SEM_REMAP_NAMES[tile_ids[0]] == "tiling"


def test_remap_and_sum_channels_counts_conserved():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 5, (6, 6, 25)).astype(np.float32)
    out = T.remap_and_sum_channels(counts, T.SEM_REMAP)
    assert out.shape == (6, 6, 18)
    np.testing.assert_allclose(out.sum(-1), counts.sum(-1))


def test_ssc_soc_bin_loaders(tmp_path):
    from creste_public_tpu.data.coda_dataset import CodaDataset

    root = tmp_path / "coda"
    (root / "splits").mkdir(parents=True)
    (root / "splits" / "train.txt").write_text("0 0\n")
    g = 8
    ssc_dir = root / "3d_ssc" / "0"
    ssc_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    ssc = rng.integers(0, 3, (g, g, 25)).astype(np.int64)
    ssc.tofile(ssc_dir / "0.bin")
    soc_dir = root / "3d_soc" / "0"
    soc_dir.mkdir(parents=True)
    soc = rng.integers(0, 3, (g, g, 60)).astype(np.uint16)
    soc.tofile(soc_dir / "0.bin")

    ds = CodaDataset({"root": str(root), "grid": g, "map_range": 0.4,
                      "horizon": 4}, split="train")
    out_ssc = ds._load_count_bin("3d_ssc", "0", 0, remap="sem")
    assert out_ssc.shape == (g, g, 18)
    np.testing.assert_allclose(out_ssc.sum(-1), ssc.sum(-1).astype(np.float32))
    out_soc = ds._load_count_bin("3d_soc", "0", 0, remap="obj")
    assert out_soc.shape == (g, g, 32)
    np.testing.assert_allclose(out_soc.sum(-1), soc.sum(-1).astype(np.float32))
