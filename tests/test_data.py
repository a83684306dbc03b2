"""Data pipeline tests against the synthetic fixture: dataset semantics
(splits, multiplier, timestamp pairs, change labels, input modes), scene
cache correctness, augmentation behaviour (incl. importance-crop via
integral image), loader determinism, and the device augmentation graph."""

import numpy as np
import pytest

from multimodal_siamese_cd_tpu import geofiles
from multimodal_siamese_cd_tpu.config import load_cfg
from multimodal_siamese_cd_tpu.data import augmentations as aug
from multimodal_siamese_cd_tpu.data.cache import SceneCache
from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
from multimodal_siamese_cd_tpu.data.loader import TrainLoader, collate
from multimodal_siamese_cd_tpu.data.synthetic import (
    TEST_AOIS,
    TRAIN_AOIS,
    UNLABELED_AOIS,
    VAL_AOIS,
    fixture_cfg_overrides,
)


@pytest.fixture()
def cfg(fixture_dataset, tmp_path):
    import os

    c = load_cfg("debug")
    c.merge_from_list(fixture_cfg_overrides())
    c.PATHS.OUTPUT = str(tmp_path)
    c.PATHS.DATASET = str(fixture_dataset)
    os.makedirs(tmp_path, exist_ok=True)
    return c


def test_pipeline_on_gdal_layout_tifs(cfg, fixture_dataset, tmp_path):
    """Rewrite every fixture tif in GDAL-style layouts the repo's own
    writer never emits — big-endian tiled LZW, striped deflate with the
    FLOATING-POINT predictor (3), planar-separate PackBits — and prove the
    cache+dataset pipeline serves IDENTICAL items. This pins the 'real
    GDAL data will be the first thing to break' risk end to end, not just
    at the codec layer."""
    import shutil

    from test_geotiff_foreign import forge_tiff

    tree = tmp_path / "gdal_ds"
    shutil.copytree(fixture_dataset, tree)
    shutil.rmtree(tree / ".cache_tpu", ignore_errors=True)
    layouts = [
        dict(tiled=True, tile=(16, 16), compression=5, order=">"),
        dict(compression=8, predictor=3),
        dict(compression=32773, planar=2),
    ]
    tifs = sorted(tree.rglob("*.tif"))
    assert tifs
    for i, tif in enumerate(tifs):
        img, _, _ = geofiles.read_tif(tif)
        forge_tiff(tif, np.asarray(img, np.float32), **layouts[i % 3])

    cfg2 = cfg.clone()
    cfg2.PATHS.DATASET = str(tree)
    kw = dict(no_augmentations=True, dataset_mode="first_last",
              disable_multiplier=True, disable_unlabeled=True)
    ds_a = MultimodalCDDataset(cfg, "validation", **kw)
    ds_b = MultimodalCDDataset(cfg2, "validation", **kw)
    assert len(ds_a) == len(ds_b) > 0
    for i in range(len(ds_a)):
        a, b = ds_a[i], ds_b[i]
        for key in ("x_t1", "x_t2", "y_change"):
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)


def test_split_selection_and_multiplier(cfg):
    ds = MultimodalCDDataset(cfg, "training")
    # 2 train AOIs x multiplier 2
    assert len(ds) == 2 * 2
    assert set(ds.get_aoi_ids()) == set(TRAIN_AOIS)
    ds_val = MultimodalCDDataset(cfg, "validation", disable_multiplier=True)
    assert len(ds_val) == len(VAL_AOIS)
    ds_test = MultimodalCDDataset(cfg, "test", disable_multiplier=True)
    assert set(ds_test.get_aoi_ids()) == set(TEST_AOIS)


def test_unlabeled_inclusion(cfg):
    cfg.DATALOADER.INCLUDE_UNLABELED = True
    ds = MultimodalCDDataset(cfg, "training", disable_multiplier=True)
    assert len(ds) == len(TRAIN_AOIS) + len(UNLABELED_AOIS)
    assert sum(ds.labeled) == len(TRAIN_AOIS)
    ds2 = MultimodalCDDataset(cfg, "training", disable_multiplier=True,
                              disable_unlabeled=True)
    assert len(ds2) == len(TRAIN_AOIS)


def test_item_structure_and_input_modes(cfg):
    for mode, channels in [("s1s2", 6), ("s1", 2), ("s2", 4)]:
        cfg.DATALOADER.INPUT_MODE = mode
        ds = MultimodalCDDataset(cfg, "training", disable_multiplier=True)
        item = ds[0]
        s = cfg.AUGMENTATION.CROP_SIZE
        assert item["x_t1"].shape == (s, s, channels)
        assert item["x_t2"].shape == (s, s, channels)
        assert item["y_change"].shape == (s, s, 1)
        assert item["is_labeled"] is True
        assert item["x_t1"].dtype == np.float32
        assert 0.0 <= item["x_t1"].min() and item["x_t1"].max() <= 1.0  # clip+nan_to_num
        assert (item["year_t1"], item["month_t1"]) <= (item["year_t2"], item["month_t2"])


def test_first_last_mode_and_change_label(cfg, fixture_dataset):
    ds = MultimodalCDDataset(cfg, "training", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True)
    item = ds[0]
    aoi = item["aoi_id"]
    meta = geofiles.load_json(fixture_dataset / "metadata.json")[aoi]
    assert (item["year_t1"], item["month_t1"]) == (meta[0]["year"], meta[0]["month"])
    assert (item["year_t2"], item["month_t2"]) == (meta[-1]["year"], meta[-1]["month"])
    # change = construction only: b_t1==0 & b_t2==1
    b1, _, _ = geofiles.read_tif(
        fixture_dataset / aoi / "buildings" /
        f"buildings_{aoi}_{item['year_t1']}_{item['month_t1']:02d}.tif")
    b2, _, _ = geofiles.read_tif(
        fixture_dataset / aoi / "buildings" /
        f"buildings_{aoi}_{item['year_t2']}_{item['month_t2']:02d}.tif")
    expected = np.logical_and(b1 == 0, b2 == 1).astype(np.float32)
    np.testing.assert_array_equal(item["y_change"], expected)


def test_building_labels_included(cfg):
    cfg.DATALOADER.INCLUDE_BUILDING_LABELS = True
    ds = MultimodalCDDataset(cfg, "training", disable_multiplier=True)
    item = ds[0]
    s = cfg.AUGMENTATION.CROP_SIZE
    assert item["y_sem_t1"].shape == (s, s, 1)
    assert item["y_sem_t2"].shape == (s, s, 1)
    assert set(np.unique(item["y_sem_t1"])) <= {0.0, 1.0}


def test_unlabeled_items_zero_change(cfg):
    cfg.DATALOADER.INCLUDE_UNLABELED = True
    ds = MultimodalCDDataset(cfg, "training", disable_multiplier=True)
    idx = ds.labeled.index(False)
    item = ds.get(idx, np.random.default_rng(0))
    assert item["is_labeled"] is False
    assert item["y_change"].sum() == 0


def test_scene_cache_matches_direct_decode(cfg, fixture_dataset):
    meta = geofiles.load_json(fixture_dataset / "metadata.json")
    direct = SceneCache(fixture_dataset, meta, cfg.DATALOADER.S1_BANDS,
                        cfg.DATALOADER.S2_BANDS, enabled=False)
    cached = SceneCache(fixture_dataset, meta, cfg.DATALOADER.S1_BANDS,
                        cfg.DATALOADER.S2_BANDS, dtype="float32", enabled=True)
    aoi = TRAIN_AOIS[0]
    ts = meta[aoi][0]
    for mod in ("s1", "s2", "buildings"):
        a = direct.load(aoi, mod, ts["year"], ts["month"])
        b = cached.load(aoi, mod, ts["year"], ts["month"])
        np.testing.assert_array_equal(a, b)
    # float16 cache is within quantization error
    c16 = SceneCache(fixture_dataset, meta, cfg.DATALOADER.S1_BANDS,
                     cfg.DATALOADER.S2_BANDS, dtype="float16", enabled=True)
    a = direct.load(aoi, "s2", ts["year"], ts["month"])
    b = c16.load(aoi, "s2", ts["year"], ts["month"])
    assert np.abs(a - b).max() < 5e-4


def test_importance_crop_weighting_matches_reference_distribution():
    """choose_crop_offset must weight candidates by (window sum + 5) exactly
    like the reference's materialized-crop scoring: with a deterministic rng
    replayed, the chosen offset equals a brute-force reimplementation."""
    rng_label = np.random.default_rng(0)
    change = (rng_label.uniform(size=(50, 60)) > 0.9).astype(np.float32)
    for trial in range(10):
        fast = aug.choose_crop_offset(change, 50, 60, 16,
                                      np.random.default_rng(trial),
                                      importance=True)
        # brute-force replay with an identical generator
        r = np.random.default_rng(trial)
        ys = r.integers(0, 50 - 16, size=aug.IMPORTANCE_SAMPLE_SIZE)
        xs = r.integers(0, 60 - 16, size=aug.IMPORTANCE_SAMPLE_SIZE)
        sums = np.array([change[y:y + 16, x:x + 16].sum()
                         for y, x in zip(ys, xs)])
        weights = (sums + aug.IMPORTANCE_BALANCING)
        weights = weights / weights.sum()
        idx = r.choice(aug.IMPORTANCE_SAMPLE_SIZE, p=weights)
        assert fast == (int(ys[idx]), int(xs[idx]))


def test_importance_crop_prefers_positive_regions():
    """A change map with one positive blob: importance crops should hit the
    blob far more often than uniform crops (weights ∝ sum + 5)."""
    change = np.zeros((100, 100, 1), np.float32)
    change[10:30, 10:30] = 1.0
    imgs = np.zeros((100, 100, 2), np.float32)
    rng = np.random.default_rng(2)
    crop = aug.ImportanceRandomCrop(20, rng)
    hits = sum(crop((imgs, imgs, change))[2].sum() > 0 for _ in range(200))
    rng_u = np.random.default_rng(2)
    ucrop = aug.UniformCrop(20, rng_u)
    hits_uniform = sum(ucrop((imgs, imgs, change))[2].sum() > 0 for _ in range(200))
    assert hits > hits_uniform * 1.5


def test_rotate_never_identity():
    rng = np.random.default_rng(0)
    rot = aug.RandomRotate(rng)
    x = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    for _ in range(20):
        out, _, _ = rot((x, x, x))
        assert not np.array_equal(out, x)  # k ∈ {1,2,3}, never 0


def test_geometric_ops_apply_jointly(cfg):
    """Flips/rotations must transform imagery and labels identically."""
    rng = np.random.default_rng(5)
    flip = aug.RandomFlip(rng)
    x = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    a, b, c = flip((x, x.copy(), x.copy()))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_loader_determinism_and_shapes(cfg):
    ds = MultimodalCDDataset(cfg, "training", return_stack=True)
    loader1 = TrainLoader(ds, batch_size=2, num_workers=2, seed=3)
    loader2 = TrainLoader(ds, batch_size=2, num_workers=0, seed=3)
    b1 = next(iter(loader1))
    b2 = next(iter(loader2))
    s = cfg.AUGMENTATION.CROP_SIZE
    # planar wire: 12 imagery (2x2 S1 + 2x4 S2) + 2 buildings + 1 change
    assert b1["stack"].shape == (2, 15, s, s)
    assert b1["is_labeled"].shape == (2,)
    # threaded and synchronous loaders produce identical batches
    np.testing.assert_array_equal(b1["stack"], b2["stack"])
    assert b1["aoi_id"] == b2["aoi_id"]
    assert len(loader1) == len(ds) // 2


def test_loader_epochs_differ(cfg):
    ds = MultimodalCDDataset(cfg, "training", return_stack=True)
    loader = TrainLoader(ds, batch_size=2, num_workers=0, seed=3)
    e1 = next(iter(loader))
    e2 = next(iter(loader))
    assert not np.array_equal(e1["stack"], e2["stack"])


def test_collate_mixed_keys():
    items = [{"x_t1": np.zeros((4, 4, 2), np.float32), "is_labeled": True,
              "aoi_id": "a", "year_t1": 2019},
             {"x_t1": np.ones((4, 4, 2), np.float32), "is_labeled": False,
              "aoi_id": "b", "year_t1": 2020}]
    batch = collate(items)
    assert batch["x_t1"].shape == (2, 4, 4, 2)
    np.testing.assert_array_equal(batch["is_labeled"], [1.0, 0.0])
    assert batch["aoi_id"] == ["a", "b"]


def test_device_augment_distributions():
    """Device graph: geometric ops move imagery and labels identically;
    photometric ops touch imagery only; values stay in [0, 1]."""
    import jax

    rng = np.random.default_rng(0)
    base = rng.uniform(size=(8, 16, 16, 1)).astype(np.float32)
    stack = np.concatenate([base, base.copy(), base.copy()], axis=-1)  # 2 img ch + 1 label ch
    out = aug.device_augment_batch(
        stack, jax.random.PRNGKey(0), flip=True, rotate=True,
        color_shift=False, gamma=False, n_img_channels=2)
    out = np.asarray(out)
    np.testing.assert_allclose(out[..., 0], out[..., 2], rtol=1e-6)

    out2 = np.asarray(aug.device_augment_batch(
        stack, jax.random.PRNGKey(1), flip=False, rotate=False,
        color_shift=True, gamma=True, n_img_channels=2))
    np.testing.assert_array_equal(out2[..., 2], stack[..., 2])  # labels untouched
    assert not np.array_equal(out2[..., 0], stack[..., 0])
    assert out2.min() >= 0.0 and out2.max() <= 1.0


def test_device_augment_dihedral_membership():
    """Every augmented sample must be one of the 8 dihedral transforms of
    its input (flips ∘ rot90^k closure)."""
    import jax

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(16, 8, 8, 3)).astype(np.float32)
    out = np.asarray(aug.device_augment_batch(
        x, jax.random.PRNGKey(3), flip=True, rotate=True,
        color_shift=False, gamma=False, n_img_channels=3))

    def dihedral(m):
        for k in range(4):
            r = np.rot90(m, k, axes=(0, 1))
            yield r
            yield np.flip(r, axis=1)

    for b in range(16):
        assert any(np.allclose(out[b], d) for d in dihedral(x[b]))


def test_device_rot90_matches_numpy():
    import jax

    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    out = np.asarray(aug.device_augment_batch(
        x, jax.random.PRNGKey(0), flip=False, rotate=True,
        color_shift=False, gamma=False, n_img_channels=3))
    for b in range(2):
        assert any(np.array_equal(out[b], np.rot90(x[b], k, axes=(0, 1)))
                   for k in (1, 2, 3))


def test_process_loader_matches_sync(cfg):
    """Process-pool workers must produce byte-identical batches to the
    synchronous path (dataset pickles across the fork; per-batch seeds are
    schedule-independent)."""
    ds = MultimodalCDDataset(cfg, "training", return_stack=True, crop_only=True)
    sync = TrainLoader(ds, batch_size=2, num_workers=0, seed=5)
    proc = TrainLoader(ds, batch_size=2, num_workers=1, seed=5,
                       worker_type="process")
    try:
        b_sync = next(iter(sync))
        b_proc = next(iter(proc))
        np.testing.assert_array_equal(b_sync["stack"], b_proc["stack"])
        assert b_sync["aoi_id"] == b_proc["aoi_id"]
    finally:
        proc.close()


def test_cache_key_changes_with_bands(cfg, fixture_dataset):
    """Changing the band selection must produce a different cache entry
    (the key hashes bands + timestamps + dtype), never stale data."""
    meta = geofiles.load_json(fixture_dataset / "metadata.json")
    a = SceneCache(fixture_dataset, meta, [0, 1], [2, 1, 0, 3])
    b = SceneCache(fixture_dataset, meta, [1, 0], [2, 1, 0, 3])
    assert a._cache_key(TRAIN_AOIS[0], "s1") != b._cache_key(TRAIN_AOIS[0], "s1")
    ts = meta[TRAIN_AOIS[0]][0]
    s_a = a.load(TRAIN_AOIS[0], "s1", ts["year"], ts["month"])
    s_b = b.load(TRAIN_AOIS[0], "s1", ts["year"], ts["month"])
    np.testing.assert_array_equal(s_a[..., 0], s_b[..., 1])  # band order swapped


def test_cache_key_changes_when_source_tif_changes(cfg, fixture_dataset,
                                                   tmp_path):
    """Rewriting a source GeoTIFF (re-download, regenerated fixture) must
    invalidate the cache entry: the key fingerprints file size+mtime, so a
    fresh SceneCache serves the NEW pixels instead of stale cached ones."""
    import os
    import shutil

    tree = tmp_path / "ds"
    shutil.copytree(fixture_dataset, tree)
    # other tests cache straight into fixture_dataset; drop the copied
    # generations so the lineage counts below see only THIS test's builds
    shutil.rmtree(tree / ".cache_tpu", ignore_errors=True)
    meta = geofiles.load_json(tree / "metadata.json")
    aoi = TRAIN_AOIS[0]
    ts = meta[aoi][0]
    cache = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    before = cache.load(aoi, "s1", ts["year"], ts["month"])

    tif = tree / aoi / "s1" / f"s1_{aoi}_{ts['year']}_{ts['month']:02d}.tif"
    img, transform, crs = geofiles.read_tif(tif)
    geofiles.write_tif(tif, np.clip(img * 0.5, 0, 1), transform, crs)
    os.utime(tif, ns=(os.stat(tif).st_mtime_ns + 10**9,) * 2)

    fresh = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    after = fresh.load(aoi, "s1", ts["year"], ts["month"])
    np.testing.assert_allclose(after, np.clip(before * 0.5, 0, 1), atol=1e-6)

    # the superseded generation is pruned — exactly one (aoi, s1) entry
    # remains, else every re-download leaks a full packed copy forever
    gens = sorted(fresh.cache_dir.glob(f"{aoi}_s1_*.npy"))
    assert len(gens) == 1
    assert gens[0].name == fresh._cache_key(aoi, "s1") + ".npy"


def test_cache_prune_spares_other_configs_generations(cfg, fixture_dataset,
                                                      tmp_path):
    """Two configs (different bands/dtype) sharing one dataset dir must
    each keep a live cache: pruning by bare (aoi, modality) made every
    alternation between such runs delete the other's packed arrays and
    pay a full re-decode — the exact cost the cache exists to avoid. Only
    generations with the SAME config hash but a stale source fingerprint
    are superseded."""
    import os
    import shutil

    tree = tmp_path / "ds"
    shutil.copytree(fixture_dataset, tree)
    shutil.rmtree(tree / ".cache_tpu", ignore_errors=True)  # see above
    meta = geofiles.load_json(tree / "metadata.json")
    aoi = TRAIN_AOIS[0]
    ts = meta[aoi][0]
    cache_a = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    a_before = cache_a.load(aoi, "s1", ts["year"], ts["month"])
    cache_b = SceneCache(tree, meta, [0], [2, 1, 0, 3], dtype="float16")
    cache_b.load(aoi, "s1", ts["year"], ts["month"])

    # B's build must not have pruned A's generation — and vice versa on a
    # fresh alternation back to A's config
    key_a = cache_a._cache_key(aoi, "s1")
    key_b = cache_b._cache_key(aoi, "s1")
    live = {p.name for p in cache_a.cache_dir.glob(f"{aoi}_s1_*.npy")}
    assert live == {key_a + ".npy", key_b + ".npy"}

    # a source rewrite still prunes within each config's own lineage
    tif = tree / aoi / "s1" / f"s1_{aoi}_{ts['year']}_{ts['month']:02d}.tif"
    img, transform, crs = geofiles.read_tif(tif)
    geofiles.write_tif(tif, np.clip(img * 0.25, 0, 1), transform, crs)
    os.utime(tif, ns=(os.stat(tif).st_mtime_ns + 10**9,) * 2)
    fresh_a = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    fresh_a.load(aoi, "s1", ts["year"], ts["month"])
    live = {p.name for p in fresh_a.cache_dir.glob(f"{aoi}_s1_*.npy")}
    assert fresh_a._cache_key(aoi, "s1") + ".npy" in live
    assert key_a + ".npy" not in live          # superseded lineage pruned
    assert key_b + ".npy" in live              # other config untouched
    del a_before


def test_cache_prune_sweeps_legacy_and_stale_tmp_files(cfg, fixture_dataset,
                                                       tmp_path):
    """The pruner retires (a) legacy single-hash generations from before
    the two-hash key format (never loadable again — they'd leak hundreds
    of MB each forever) and (b) builder tmp files older than an hour (a
    SIGKILLed builder's partial write), while leaving FRESH tmps alone
    (they may belong to a live concurrent builder)."""
    import os
    import shutil

    tree = tmp_path / "ds"
    shutil.copytree(fixture_dataset, tree)
    shutil.rmtree(tree / ".cache_tpu", ignore_errors=True)
    meta = geofiles.load_json(tree / "metadata.json")
    aoi = TRAIN_AOIS[0]
    ts = meta[aoi][0]
    cache_dir = tree / ".cache_tpu"
    cache_dir.mkdir()
    legacy_npy = cache_dir / f"{aoi}_s1_{'ab' * 5}.npy"
    legacy_npy.write_bytes(b"old")
    (cache_dir / f"{aoi}_s1_{'ab' * 5}.json").write_text("{}")
    stale_tmp = cache_dir / f"{aoi}_s1_{'cd' * 10}_x.npy.123.deadbeef"
    stale_tmp.write_bytes(b"partial")
    os.utime(stale_tmp, (1, 1))  # ancient mtime
    fresh_tmp = cache_dir / f"{aoi}_s1_{'ef' * 10}_y.npy.456.cafebabe"
    fresh_tmp.write_bytes(b"inflight")
    other_aoi_legacy = cache_dir / f"{TRAIN_AOIS[1]}_s1_{'ab' * 5}.npy"
    other_aoi_legacy.write_bytes(b"old")  # different aoi: untouched

    cache = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    cache.load(aoi, "s1", ts["year"], ts["month"])  # build -> prune
    assert not legacy_npy.exists()
    assert not (cache_dir / f"{aoi}_s1_{'ab' * 5}.json").exists()
    assert not stale_tmp.exists()
    assert fresh_tmp.exists()
    assert other_aoi_legacy.exists()


def test_cache_load_retries_when_generation_pruned_mid_read(
        cfg, fixture_dataset, tmp_path, monkeypatch):
    """A concurrent source re-download can retire THIS process's keyed
    generation between its existence check and its np.load (the other
    process builds the new key and prunes ours). The load must re-key
    from fresh source stats and retry once instead of crashing."""
    import shutil

    from multimodal_siamese_cd_tpu.data import cache as cache_mod

    tree = tmp_path / "ds"
    shutil.copytree(fixture_dataset, tree)
    meta = geofiles.load_json(tree / "metadata.json")
    aoi = TRAIN_AOIS[0]
    ts = meta[aoi][0]
    seed = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    before = seed.load(aoi, "s1", ts["year"], ts["month"])

    fails = {"n": 1}
    orig_npload = np.load

    def flaky_load(*a, **kw):
        if fails["n"]:
            fails["n"] -= 1
            raise FileNotFoundError(a[0] if a else "pruned")
        return orig_npload(*a, **kw)

    monkeypatch.setattr(cache_mod.np, "load", flaky_load)
    fresh = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    got = fresh.load(aoi, "s1", ts["year"], ts["month"])
    np.testing.assert_array_equal(got, before)
    assert fails["n"] == 0


def test_cache_self_heals_corrupt_entry(cfg, fixture_dataset, tmp_path):
    """A corrupt packed cache file is REGENERABLE — the cache must rebuild
    it transparently instead of surfacing an opaque np.load error."""
    import shutil

    tree = tmp_path / "ds"
    shutil.copytree(fixture_dataset, tree)
    meta = geofiles.load_json(tree / "metadata.json")
    aoi = TRAIN_AOIS[0]
    ts = meta[aoi][0]
    cache = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    before = cache.load(aoi, "s1", ts["year"], ts["month"])

    name = cache._cache_key(aoi, "s1")
    (cache.cache_dir / f"{name}.npy").write_bytes(b"corrupt" * 10)

    fresh = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    after = fresh.load(aoi, "s1", ts["year"], ts["month"])
    np.testing.assert_array_equal(after, before)


def test_cache_concurrent_heal_rebuilds_once(cfg, fixture_dataset, tmp_path,
                                             monkeypatch):
    """Two threads hitting the same corrupt entry: the second healer must
    double-check under the lock instead of unlinking the first healer's
    fresh rebuild (the build path's benign race is destructive here — a
    skipped re-read lets T2 delete the file between T1's rebuild and T1's
    post-heal np.load)."""
    import shutil
    import threading

    from multimodal_siamese_cd_tpu.data import cache as cache_mod

    tree = tmp_path / "ds"
    shutil.copytree(fixture_dataset, tree)
    meta = geofiles.load_json(tree / "metadata.json")
    aoi = TRAIN_AOIS[0]
    ts = meta[aoi][0]
    seed_cache = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    before = seed_cache.load(aoi, "s1", ts["year"], ts["month"])
    name = seed_cache._cache_key(aoi, "s1")
    (seed_cache.cache_dir / f"{name}.npy").write_bytes(b"corrupt" * 10)

    builds = []
    state_lock = threading.Lock()
    orig_build = SceneCache._build

    def counting_build(self, *a, **kw):
        with state_lock:
            builds.append(threading.get_ident())
        return orig_build(self, *a, **kw)

    # The destructive window is only open while BOTH threads have failed
    # np.load on the (still-present) corrupt file but neither holds the
    # entry lock yet — naturally microseconds wide, so pin the schedule:
    # the first np.load failure of each thread blocks until both threads
    # have failed, THEN they race to the lock. The loser's only correct
    # move is the under-lock re-read; the pre-fix code unlinked the
    # winner's fresh rebuild and built again.
    failed, both_failed = set(), threading.Event()
    orig_npload = np.load

    def synced_load(*a, **kw):
        try:
            return orig_npload(*a, **kw)
        except Exception:
            tid = threading.get_ident()
            with state_lock:
                if tid not in failed:
                    failed.add(tid)
                    if len(failed) >= 2:
                        both_failed.set()
            both_failed.wait(timeout=30)
            raise

    monkeypatch.setattr(SceneCache, "_build", counting_build)
    monkeypatch.setattr(cache_mod.np, "load", synced_load)
    # fresh lock table so both threads contend on THIS entry's lock
    monkeypatch.setattr(cache_mod, "_locks", {})

    results, errors = [], []

    def heal():
        c = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
        try:
            results.append(c.load(aoi, "s1", ts["year"], ts["month"]))
        except Exception as e:  # pragma: no cover - the regression itself
            errors.append(e)

    threads = [threading.Thread(target=heal) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert errors == []
    assert len(builds) == 1, "second healer must reuse the fresh rebuild"
    for got in results:
        np.testing.assert_array_equal(got, before)


def test_cache_heal_never_unlinks_current_generation(cfg, fixture_dataset,
                                                     tmp_path, monkeypatch):
    """Healing must repair by ATOMIC REPLACE, never by unlink+rebuild.

    The in-process lock table cannot serialize healer PROCESSES (loader
    pool workers share one cache dir): with an unlink in the heal path,
    one process's unlink can land between another's os.replace and its
    post-heal np.load — deleting a fresh rebuild and crashing the path
    whose purpose is transparent healing. Non-destructiveness + _build's
    atomic replace make heal safe under any process interleaving."""
    import shutil

    from multimodal_siamese_cd_tpu.data import cache as cache_mod

    tree = tmp_path / "ds"
    shutil.copytree(fixture_dataset, tree)
    meta = geofiles.load_json(tree / "metadata.json")
    aoi = TRAIN_AOIS[0]
    ts = meta[aoi][0]
    seed_cache = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    before = seed_cache.load(aoi, "s1", ts["year"], ts["month"])
    name = seed_cache._cache_key(aoi, "s1")
    entry_names = {f"{name}.npy", f"{name}.json"}
    (seed_cache.cache_dir / f"{name}.npy").write_bytes(b"corrupt" * 10)

    unlinked = []
    orig_unlink = cache_mod.Path.unlink

    def spying_unlink(self, *a, **kw):
        unlinked.append(self.name)
        return orig_unlink(self, *a, **kw)

    monkeypatch.setattr(cache_mod.Path, "unlink", spying_unlink)
    healer = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    got = healer.load(aoi, "s1", ts["year"], ts["month"])
    np.testing.assert_array_equal(got, before)
    destructive = entry_names & set(unlinked)
    assert not destructive, (
        f"heal unlinked the current generation: {destructive}")


def test_cache_build_skips_sampler_ineligible_timestamps(cfg,
                                                         fixture_dataset,
                                                         tmp_path):
    """Metadata may flag timestamps the sampler can never request (other
    modality absent; buildings at masked timestamps). The cache build must
    not decode — or require the existence of — those files, matching the
    reference's read-on-demand tolerance."""
    import shutil

    tree = tmp_path / "ds"
    shutil.copytree(fixture_dataset, tree)
    meta = geofiles.load_json(tree / "metadata.json")
    aoi = TRAIN_AOIS[0]
    ghost = dict(meta[aoi][0])
    ghost.update(year=2030, month=1, s1=True, s2=False, buildings=False,
                 masked=False)   # s1-only: sampler needs s1 AND s2
    masked = dict(meta[aoi][0])
    masked.update(year=2030, month=2, s1=True, s2=True, buildings=True,
                  masked=True)   # masked: buildings never requested
    meta[aoi] = meta[aoi] + [ghost, masked]
    # the masked timestamp's imagery IS sampler-eligible (unlabeled path
    # allows masked) — write those files; leave the ghost's s1 and the
    # masked timestamp's buildings MISSING
    src_ts = meta[aoi][0]
    for mod in ("s1", "s2"):
        src = tree / aoi / mod / f"{mod}_{aoi}_{src_ts['year']}_{src_ts['month']:02d}.tif"
        shutil.copy(src, tree / aoi / mod / f"{mod}_{aoi}_2030_02.tif")
    geofiles.write_json(tree / "metadata.json", meta)

    cache = SceneCache(tree, meta, [0, 1], [2, 1, 0, 3], dtype="float32")
    ts = meta[aoi][0]
    # builds must succeed despite the missing ghost-s1 / masked-buildings
    for mod in ("s1", "s2", "buildings"):
        cache.load(aoi, mod, ts["year"], ts["month"])
    # the masked timestamp's imagery is packed (unlabeled-eligible)
    cache.load(aoi, "s1", 2030, 2)
    # the ghost timestamp is in no pack
    _, index = cache._load_packed(aoi, "s1")
    assert (2030, 1) not in index
    _, bindex = cache._load_packed(aoi, "buildings")
    assert (2030, 2) not in bindex


def test_corrupt_tif_raises_cleanly(cfg, fixture_dataset, tmp_path):
    import shutil

    tree = tmp_path / "ds"
    shutil.copytree(fixture_dataset, tree)
    aoi = TRAIN_AOIS[0]
    victim = next((tree / aoi / "s1").glob("*.tif"))
    victim.write_bytes(b"not a tiff at all")
    cfg2 = cfg.clone()
    cfg2.PATHS.DATASET = str(tree)
    cfg2.DATALOADER.CACHE_DIR = str(tmp_path / "cache")
    ds = MultimodalCDDataset(cfg2, "training", disable_multiplier=True)
    with pytest.raises(ValueError, match="TIFF"):
        ds[0]


def test_scene_smaller_than_crop_raises(cfg):
    cfg.AUGMENTATION.CROP_SIZE = 4096
    ds = MultimodalCDDataset(cfg, "training", disable_multiplier=True)
    with pytest.raises(ValueError, match="smaller than"):
        ds[0]


def test_prefetch_to_device_delivers_all_batches():
    """Async prefetch must deliver every batch and terminate — including
    when the producer finishes while the queue is full (the end-sentinel
    must not be dropped)."""
    from multimodal_siamese_cd_tpu.data.loader import prefetch_to_device

    batches = [{"stack": np.full((1, 2, 2, 1), i, np.float32), "i": i}
               for i in range(7)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert [b["i"] for b in out] == list(range(7))
    np.testing.assert_array_equal(np.asarray(out[3]["stack"]),
                                  batches[3]["stack"])


def test_prefetch_to_device_early_abandon():
    """Abandoning consumption mid-stream (the DEBUG break) must stop the
    producer promptly rather than staging the remaining epoch."""
    import time

    from multimodal_siamese_cd_tpu.data.loader import prefetch_to_device

    pulled = []

    def slow_source():
        for i in range(1000):
            pulled.append(i)
            yield {"stack": np.zeros((1, 2, 2, 1), np.float32), "i": i}

    stream = prefetch_to_device(slow_source(), size=2)
    next(stream)
    stream.close()
    time.sleep(0.3)
    assert len(pulled) < 20  # producer stopped, didn't run the whole epoch


def test_prefetch_to_device_propagates_errors():
    from multimodal_siamese_cd_tpu.data.loader import prefetch_to_device

    def bad_source():
        yield {"stack": np.zeros((1, 2, 2, 1), np.float32)}
        raise RuntimeError("loader exploded")

    stream = prefetch_to_device(bad_source(), size=2)
    next(stream)
    with pytest.raises(RuntimeError, match="loader exploded"):
        list(stream)


def test_window_count_offset_matches_label_plane():
    """choose_crop_offset with a window_count callable (the loader's
    O(crop²) no-materialized-plane path) must pick the same offset as the
    label2d path for identical generators — same draw order, same weights."""
    rng_label = np.random.default_rng(3)
    b1 = (rng_label.uniform(size=(50, 60, 1)) > 0.8).astype(np.float16)
    b2 = np.maximum(b1, (rng_label.uniform(size=(50, 60, 1)) > 0.8)).astype(np.float16)
    plane = (b2 > b1)[..., 0]
    for trial in range(10):
        via_plane = aug.choose_crop_offset(
            plane, 50, 60, 16, np.random.default_rng(trial), importance=True)
        via_window = aug.choose_crop_offset(
            None, 50, 60, 16, np.random.default_rng(trial), importance=True,
            window_count=lambda y, x, s: np.count_nonzero(
                b2[y:y + s, x:x + s] > b1[y:y + s, x:x + s]))
        assert via_plane == via_window


def test_inplace_batch_assembly_matches_collate(cfg):
    """The stack_spec()/out= fast path (samples assembled straight into one
    preallocated batch buffer) must produce bit-identical batches to the
    per-sample-dict collate path, including label-slot zeroing for
    unlabeled samples over the np.empty-backed buffer."""
    from multimodal_siamese_cd_tpu.data.loader import _assemble_batch

    cfg.DATALOADER.TRAINING_MULTIPLIER = 4
    cfg.DATALOADER.INCLUDE_UNLABELED = True
    ds = MultimodalCDDataset(cfg, "training", return_stack=True,
                             crop_only=True)
    spec = ds.stack_spec()
    assert spec is not None

    class _NoSpec:  # same dataset, spec hidden -> forces the collate path
        def __init__(self, d):
            self.d = d

        def get(self, i, rng):
            return self.d.get(i, rng)

    labeled_flags = np.asarray(ds.labeled, bool)
    idx = np.concatenate([np.flatnonzero(labeled_flags)[:3],
                          np.flatnonzero(~labeled_flags)[:3]])
    fast = _assemble_batch(ds, 11, 0, 2, idx)
    slow = _assemble_batch(_NoSpec(ds), 11, 0, 2, idx)
    assert fast["stack"].dtype == slow["stack"].dtype
    np.testing.assert_array_equal(fast["stack"], slow["stack"])
    np.testing.assert_array_equal(fast["is_labeled"], slow["is_labeled"])
    # unlabeled rows must have all-zero label planes despite np.empty
    (c, s, _), _ = spec
    n_img = c - 3
    unlab = fast["is_labeled"] == 0.0
    if unlab.any():
        assert np.all(fast["stack"][unlab][:, n_img:] == 0.0)
    # eval-style datasets advertise no spec (no fixed crop layout)
    ev = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last")
    assert ev.stack_spec() is None


def test_threaded_loader_releases_consumed_batches(cfg):
    """The epoch iterator must drop each completed Future immediately: a
    Future retains its result, so keeping the per-epoch futures list intact
    pins EVERY consumed batch (~31 MB each in production) for the whole
    epoch — measured as a 4-6x loader slowdown from allocator churn within
    a few batches (round-3 soak finding). Pin via weakref: a consumed
    batch's array must be collectable after a few more batches arrive."""
    import gc
    import weakref

    cfg.DATALOADER.TRAINING_MULTIPLIER = 8  # enough batches per epoch
    ds = MultimodalCDDataset(cfg, "training", return_stack=True,
                             crop_only=True)
    loader = TrainLoader(ds, batch_size=2, num_workers=1, seed=5)
    it = iter(loader)
    first = next(it)
    ref = weakref.ref(first["stack"])
    del first
    for _ in range(3):
        next(it)
    gc.collect()
    assert ref() is None, "consumed batch still pinned by the futures list"


def test_eval_wire_matches_items_exactly(cfg):
    """eval_wire's planar padded wires must carry exactly the item path's
    values: imagery (after device-side transpose+upcast), construction-only
    change labels, and the valid mask — for every eval scene and both
    INPUT_MODEs the shipped configs use."""
    for mode in ("fusion", "s2"):
        cfg.DATALOADER.INPUT_MODE = mode
        ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                                 dataset_mode="first_last",
                                 disable_multiplier=True,
                                 disable_unlabeled=True)
        for i in range(len(ds)):
            w = ds.eval_wire(i, bucket=64)
            item = ds[i]
            h, wd = item["x_t1"].shape[:2]
            assert w["shape"] == (h, wd)
            assert w["x1"].shape[1] % 64 == 0 and w["x1"].shape[2] % 64 == 0
            for wk, ik in (("x1", "x_t1"), ("x2", "x_t2")):
                hwc = np.moveaxis(w[wk], 0, -1).astype(np.float32)
                np.testing.assert_array_equal(hwc[:h, :wd], item[ik],
                                              err_msg=f"{mode}/{wk}")
                assert not hwc[h:].any() and not hwc[:, wd:].any()
            np.testing.assert_array_equal(
                w["y"][:h, :wd].astype(np.float32), item["y_change"][..., 0])
            assert not w["y"][h:].any() and not w["y"][:, wd:].any()
            assert w["valid"][:h, :wd].all()
            assert not w["valid"][h:].any() and not w["valid"][:, wd:].any()


def test_eval_wire_refuses_augmentation_mode(cfg):
    """An aug-mode item is a random crop; eval_wire must refuse so
    run_measurer's fast-path gate cannot silently switch the evaluated
    surface from crops to full scenes based on the SCENE_CACHE perf knob."""
    ds = MultimodalCDDataset(cfg, "validation", dataset_mode="first_last",
                             disable_multiplier=True, disable_unlabeled=True)
    assert not ds.no_augmentations and ds.cache.enabled
    assert ds.eval_wire(0) is None


def test_eval_wire_disabled_cache_falls_back(cfg):
    cfg.DATALOADER.SCENE_CACHE = False
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last",
                             disable_multiplier=True, disable_unlabeled=True)
    assert ds.eval_wire(0) is None


def test_hard_fixture_statistics(tmp_path):
    """The hard-mode fixture must reproduce SpaceNet7-realistic statistics
    (round-5 benchmark): per-pair change prevalence in 0.3-2% of pixels,
    a pre-existing building stock (change-free confusers), unlabeled
    clutter, and imagery in the [0,1] contract the dataset expects."""
    from multimodal_siamese_cd_tpu.data.synthetic import generate_hard_dataset

    aois = {"L15-hardA": True, "L15-hardU": False}
    generate_hard_dataset(tmp_path, aois=aois, scene_size=(192, 192))

    files = sorted((tmp_path / "L15-hardA" / "buildings").iterdir())
    masks = [geofiles.read_tif(f)[0].squeeze() for f in files]
    assert len(masks) == 4
    for t1 in range(len(masks)):
        for t2 in range(t1 + 1, len(masks)):
            prevalence = ((masks[t1] == 0) & (masks[t2] == 1)).mean()
            assert 0.003 <= prevalence <= 0.02, (t1, t2, prevalence)
    # pre-existing stock: labeled at t0, so never part of any change target
    assert masks[0].mean() >= 0.015
    # change is CLUSTERED in growth zones (the ImportanceRandomCrop regime):
    # a majority of crop-sized windows must carry zero change even for the
    # widest (t0, t3) pair (measured 64-88% across seeds; pin a safe floor)
    ch = (masks[0] == 0) & (masks[-1] == 1)
    zero = total = 0
    for i in range(0, ch.shape[0] - 64 + 1, 32):
        for j in range(0, ch.shape[1] - 64 + 1, 32):
            total += 1
            zero += not ch[i:i + 64, j:j + 64].any()
    assert zero / total >= 0.5, f"change not clustered: {zero}/{total}"
    # footprints only grow (the change definition t1==0 AND t2==1 needs it)
    for a, b in zip(masks, masks[1:]):
        assert not ((a == 1) & (b == 0)).any()

    for mod in ("s1", "s2"):
        arr = geofiles.read_tif(
            sorted((tmp_path / "L15-hardA" / mod).iterdir())[0])[0]
        assert np.isfinite(arr).all() and arr.min() >= 0 and arr.max() <= 1
    # unlabeled AOI ships imagery but no label rasters
    assert not (tmp_path / "L15-hardU" / "buildings").exists()
    assert (tmp_path / "L15-hardU" / "s1").is_dir()
