"""Aux subsystem tests: resume-from-checkpoint, logging facade, distributed
helpers, visualization/PNG, spacenet7 + dataset_helpers utilities."""

import json
import os

import jax
import numpy as np
import pytest

from multimodal_siamese_cd_tpu import (
    checkpoints,
    dataset_helpers,
    png,
    train_lib,
    visualization,
    wandb_compat,
)
from multimodal_siamese_cd_tpu.config import load_cfg
from multimodal_siamese_cd_tpu.data.synthetic import fixture_cfg_overrides
from multimodal_siamese_cd_tpu.parallel import process_shard
from multimodal_siamese_cd_tpu.trainers import ProfilerHook, _create_or_resume


@pytest.fixture()
def cfg(fixture_dataset, tmp_path):
    c = load_cfg("debug")
    c.merge_from_list(fixture_cfg_overrides())
    c.MODEL.TOPOLOGY = [4, 8]
    c.MODEL.TYPE = "siameseunet"
    c.TRAINER.PRECISION = "fp32"
    c.PATHS.OUTPUT = str(tmp_path)
    c.PATHS.DATASET = str(fixture_dataset)
    os.makedirs(tmp_path, exist_ok=True)
    return c


def test_resume_from_checkpoint(cfg):
    _, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    checkpoints.save_checkpoint(state, epoch=3, step=77, cfg=cfg)
    cfg.TRAINER.RESUME_CHECKPOINT = 3
    model, state2, start_step = _create_or_resume(cfg)
    assert start_step == 77
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_create_without_resume(cfg):
    model, state, start_step = _create_or_resume(cfg)
    assert start_step == 0


def test_resume_latest_picks_newest_epoch(cfg):
    """RESUME_CHECKPOINT 'latest' discovers the highest-epoch checkpoint
    without anyone naming it (VERDICT r4 item 4: restart the same command
    after preemption)."""
    _, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    for epoch, step in [(1, 10), (3, 30), (2, 20)]:
        checkpoints.save_checkpoint(state, epoch=epoch, step=step, cfg=cfg)
    # distractors: another experiment's checkpoint, a crash-partial tmp file
    net_dir = checkpoints.checkpoint_file(cfg, 1).parent
    (net_dir / 'other_checkpoint9.pt').write_bytes(b'x')
    (net_dir / f'{cfg.NAME}_checkpoint4.pt.tmp123').write_bytes(b'x')
    (net_dir / f'{cfg.NAME}_checkpointfinal.pt').write_bytes(b'x')
    assert checkpoints.latest_checkpoint_epoch(cfg) == 3
    cfg.TRAINER.RESUME_CHECKPOINT = 'latest'
    _, _, start_step = _create_or_resume(cfg)
    assert start_step == 30


def test_resume_latest_cold_start(cfg):
    """'latest' with no checkpoint directory (or an empty one) is a cold
    start at step 0, not an error."""
    cfg.TRAINER.RESUME_CHECKPOINT = 'latest'
    _, _, start_step = _create_or_resume(cfg)
    assert start_step == 0
    # empty networks/ dir (exists, no checkpoints) also cold-starts
    checkpoints.checkpoint_file(cfg, 1).parent.mkdir(parents=True)
    _, _, start_step = _create_or_resume(cfg)
    assert start_step == 0


def test_loader_set_epoch_continues_schedule(cfg):
    """A resumed run must continue the data schedule, not replay it:
    set_epoch(n) makes the next iteration draw epoch n's shuffle order —
    identical to what an unbroken run's (n+1)-th epoch would see."""
    from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
    from multimodal_siamese_cd_tpu.data.loader import TrainLoader

    ds = MultimodalCDDataset(cfg, "training", return_stack=True,
                             crop_only=True)

    def loader():
        return TrainLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                           num_workers=0, seed=cfg.SEED)

    unbroken = loader()
    for _ in range(3):  # consume epochs 0..2
        list(unbroken)
    want = [b["stack"] for b in unbroken]           # epoch 3

    resumed = loader()
    resumed.set_epoch(3)
    got = [b["stack"] for b in resumed]
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    # and epoch 3's order differs from a replayed epoch 0
    replay = [b["stack"] for b in loader()]
    assert any(not np.array_equal(a, b) for a, b in zip(want, replay))


def test_execution_plan_realigns_on_misaligned_resume(cfg, capsys):
    """A resume step that is not a multiple of the scan window k would make
    global_step % LOG_FREQ == 0 unreachable (evals and loss logs silently
    never fire); the plan must fall back to k=1."""
    from multimodal_siamese_cd_tpu.data.loader import TrainLoader
    from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
    from multimodal_siamese_cd_tpu.trainers import _execution_plan
    from multimodal_siamese_cd_tpu.parallel import data_mesh

    cfg.DEBUG = False
    cfg.LOG_FREQ = 100
    cfg.TRAINER.STEPS_PER_EXECUTION = 4
    cfg.DATALOADER.TRAINING_MULTIPLIER = 8
    ds = MultimodalCDDataset(cfg, "training", return_stack=True,
                             crop_only=True)
    loader = TrainLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                         num_workers=0, seed=cfg.SEED)
    assert len(loader) % 4 == 0
    model, _ = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    mesh = data_mesh(jax.devices()[:1])
    k, _, _ = _execution_plan(cfg, model, "supervised", mesh, loader,
                              start_step=0)
    assert k == 4
    k, _, _ = _execution_plan(cfg, model, "supervised", mesh, loader,
                              start_step=10)
    assert k == 1
    assert "not a multiple" in capsys.readouterr().out


def test_profiler_hook_noop_without_dir(cfg):
    hook = ProfilerHook(cfg)
    for step in range(50):
        hook.step(step)
    hook.close()  # no trace dir configured: must be a clean no-op


def test_log_window_records_time_and_train_time(cfg, tmp_path):
    """The in-epoch LOG_FREQ window must log the reference 'time' metric
    plus the beyond-reference 'train_time' (window minus in-window evals),
    with 0 < train_time <= time — the instrumentation lifecycle_run.py uses
    to check steps/s against bench.py."""
    from multimodal_siamese_cd_tpu import trainers

    cfg.DEBUG = False
    cfg.TRAINER.EPOCHS = 1
    cfg.TRAINER.BATCH_SIZE = 2
    cfg.DATALOADER.TRAINING_MULTIPLIER = 10   # 2 AOIs x 10 / 2 = 10 steps
    cfg.LOG_FREQ = 5                          # two in-epoch windows
    cfg.SAVE_CHECKPOINTS = []
    wandb_compat.init(cfg.NAME, mode="jsonl", out_dir=cfg.PATHS.OUTPUT)
    trainers.run_supervised(cfg)
    wandb_compat.finish()
    lines = [json.loads(l) for l in
             (tmp_path / "logs" / f"{cfg.NAME}.jsonl").read_text().splitlines()]
    windows = [r for r in lines if "train_time" in r]
    assert len(windows) == 2, [sorted(r) for r in lines]
    for w in windows:
        assert w["step"] % cfg.LOG_FREQ == 0
        assert 0 < w["train_time"] <= w["time"], w
    # the window evals logged their F1 records at the same steps
    for split in ("training", "validation"):
        steps = [r["step"] for r in lines if f"{split} F1" in r]
        assert set(w["step"] for w in windows) <= set(steps), (split, lines)


def test_lifecycle_plan_uses_config_batch():
    """tools/lifecycle_run.py must derive its kill/seam schedule from the
    regime CONFIG's batch size — the semisup experiment grid pins
    TRAINER.BATCH_SIZE 4, so its epoch is twice what a batch-8 assumption
    predicts (the round-4 first semisup attempt SIGKILLed an epoch early)."""
    from conftest import import_tool

    lifecycle_run = import_tool("lifecycle_run")

    sup = lifecycle_run.plan("supervised", 128, 100, 3)
    assert sup == {"batch": 8, "steps_per_epoch": 624,
                   "resume_epoch": 2, "seam_step": 1300}
    semi = lifecycle_run.plan("semisupervised", 128, 100, 3)
    # 59 train AOIs (39 labeled + 20 unlabeled) x 128 / batch 4
    assert semi == {"batch": 4, "steps_per_epoch": 1888,
                    "resume_epoch": 2, "seam_step": 3800}
    # explicit --batch overrides the config value
    assert lifecycle_run.plan("semisupervised", 128, 100, 3,
                              batch=8)["steps_per_epoch"] == 944
    # the seam window must exist inside the final epoch
    with pytest.raises(AssertionError):
        lifecycle_run.plan("supervised", 2, 100, 3)  # 9-step epochs

    # window_rates counts each window's REAL step coverage: the trainer's
    # train_time accumulator resets at epoch starts too, so an epoch-first
    # window covers fewer than LOG_FREQ steps; each phase's first window
    # (jit compile) is dropped
    recs = [{"step": s, "train_time": 10.0}
            for s in (100, 200, 300, 400, 500)]
    # steps/epoch 312: the step-400 window only covers 400-312=88 steps
    assert lifecycle_run.window_rates(recs, 312, 8) == \
        [80.0, 80.0, 8 * 88 / 10.0, 80.0]
    # post-resume phase counts from the resume step and drops its first
    # (recompile-contaminated) window
    b = [{"step": s, "train_time": 10.0} for s in (700, 800)]
    assert lifecycle_run.window_rates(b, 312, 8, start_step=624) == [80.0]


def test_lifecycle_dataset_generation_is_atomic(tmp_path, monkeypatch):
    """An interrupted multi-minute generation must not dead-end the tool:
    ensure_dataset generates into a .partial sibling and renames, so the
    foreign-tree guard (refuse to delete what this tool didn't write) never
    fires on the tool's own half-written output."""
    from conftest import import_tool

    lifecycle_run = import_tool("lifecycle_run")
    for name in ("TRAIN", "VAL", "TEST", "UNLAB"):
        monkeypatch.setattr(lifecycle_run, name, [f"L15-tiny{name}"])

    root = tmp_path / "ds"
    lifecycle_run.ensure_dataset(root, 32)
    marker = root / "lifecycle_gen_params.json"
    assert marker.exists() and not root.with_name("ds.partial").exists()

    # idempotent: same params -> no regeneration (marker mtime unchanged)
    before = marker.stat().st_mtime_ns
    lifecycle_run.ensure_dataset(root, 32)
    assert marker.stat().st_mtime_ns == before

    # changed params -> regenerates over its own tree
    lifecycle_run.ensure_dataset(root, 48)
    assert json.loads(marker.read_text())["scene"] == 48

    # an interrupted generation (simulated: stale .partial + marker-less
    # root) still succeeds — .partial is swept, root is foreign-guarded
    (root.with_name("ds.partial")).mkdir()
    marker.unlink()
    with pytest.raises(SystemExit, match="refusing to overwrite"):
        lifecycle_run.ensure_dataset(root, 32)


def test_jsonl_logging_sink(tmp_path):
    wandb_compat.init("runx", config={"A": 1}, mode="jsonl", out_dir=tmp_path)
    wandb_compat.log({"loss": 0.5, "step": 1})
    wandb_compat.log({"loss": np.float32(0.25), "step": 2})
    wandb_compat.finish()
    lines = [json.loads(l) for l in
             (tmp_path / "logs" / "runx.jsonl").read_text().splitlines()]
    assert lines[0]["_event"] == "init"
    assert lines[1]["loss"] == 0.5
    assert lines[2]["loss"] == 0.25


def test_jsonl_log_type_fidelity(tmp_path):
    wandb_compat.init("runt", config=None, mode="jsonl", out_dir=tmp_path)
    wandb_compat.log({"step": 3, "flag": True, "loss": np.float32(0.5),
                      "vec": np.arange(3), "name": "x"})
    wandb_compat.finish()
    rec = [json.loads(l) for l in
           (tmp_path / "logs" / "runt.jsonl").read_text().splitlines()][-1]
    assert rec["step"] == 3 and isinstance(rec["step"], int)
    assert rec["flag"] is True
    assert rec["loss"] == 0.5
    assert rec["vec"] == [0, 1, 2]   # arrays log as lists, not TypeError
    assert rec["name"] == "x"


def test_jsonl_reinit_closes_previous_run(tmp_path):
    r1 = wandb_compat.init("one", config=None, mode="jsonl", out_dir=tmp_path)
    wandb_compat.log({"a": 1})
    # second init WITHOUT finish(): must close run one's file handle
    wandb_compat.init("two", config=None, mode="jsonl", out_dir=tmp_path)
    assert r1.file is None
    wandb_compat.log({"b": 2})
    wandb_compat.finish()
    assert json.loads((tmp_path / "logs" / "one.jsonl").read_text()
                      .splitlines()[-1])["a"] == 1
    assert json.loads((tmp_path / "logs" / "two.jsonl").read_text()
                      .splitlines()[-1])["b"] == 2


def test_every_python_file_compiles():
    """Byte-compile every .py in the repo (tools/ probes and offline
    scripts are not imported by the suite — this catches syntax rot from
    partial edits without executing anything)."""
    import py_compile
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    files = [p for d in ("multimodal_siamese_cd_tpu", "tools", "tests", ".")
             for p in (repo / d).glob("*.py")] + \
            list((repo / "multimodal_siamese_cd_tpu").glob("*/*.py"))
    assert len(files) > 60
    for f in files:
        py_compile.compile(str(f), doraise=True)


def test_process_shard_single_host():
    sl = process_shard(10)
    assert sl == slice(0, 10)


def test_process_shard_balanced(monkeypatch):
    from multimodal_siamese_cd_tpu.parallel import distributed

    def shards(n_items, n_proc):
        out = []
        for i in range(n_proc):
            monkeypatch.setattr(distributed.jax, "process_count", lambda: n_proc)
            monkeypatch.setattr(distributed.jax, "process_index", lambda i=i: i)
            out.append(process_shard(n_items))
        return out

    for n_items, n_proc in [(4, 3), (10, 4), (3, 3), (7, 8), (0, 2), (16, 8)]:
        sls = shards(n_items, n_proc)
        covered = []
        for sl in sls:
            covered.extend(range(n_items)[sl])
        # partition: disjoint, ordered, complete
        assert covered == list(range(n_items))
        sizes = [len(range(n_items)[sl]) for sl in sls]
        # balanced: sizes differ by at most one...
        assert max(sizes) - min(sizes) <= 1
        # ...and nobody idles when there is enough work to go round
        if n_items >= n_proc:
            assert min(sizes) >= 1


def test_partial_coordinator_spec_raises(monkeypatch):
    from multimodal_siamese_cd_tpu.parallel import distributed

    monkeypatch.setattr(distributed, "_initialized", False)
    monkeypatch.setenv("MSCD_DISTRIBUTED", "1")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1234")
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="partial coordinator spec"):
        distributed.maybe_initialize_distributed()
    assert not distributed._initialized


def test_png_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(20, 30, 3), dtype=np.uint8)
    f = png.write_png(tmp_path / "x.png", img)
    back = png.read_png(f)
    np.testing.assert_array_equal(back, img)


def test_imagery_panel_per_input_mode():
    """Display helpers must honor DATALOADER.INPUT_MODE: items carry ONLY
    the configured modalities, so the old fixed [:, :, n_s1:] slice
    truncated 's2' configs (IndexError inside optical_rgb) and showed
    optical bands as SAR for 's1'."""
    from multimodal_siamese_cd_tpu.config import CfgNode

    rng = np.random.default_rng(0)

    def cfg_for(mode):
        return CfgNode({"DATALOADER": {"INPUT_MODE": mode,
                                       "S1_BANDS": [0, 1],
                                       "S2_BANDS": [0, 1, 2, 3]}})

    x_s1s2 = rng.uniform(size=(8, 9, 6)).astype(np.float32)
    s1, s2 = visualization.split_modalities(x_s1s2, cfg_for("s1s2"))
    np.testing.assert_array_equal(s1, x_s1s2[:, :, :2])
    np.testing.assert_array_equal(s2, x_s1s2[:, :, 2:])

    x_s2 = rng.uniform(size=(8, 9, 4)).astype(np.float32)
    s1, s2 = visualization.split_modalities(x_s2, cfg_for("s2"))
    assert s1 is None
    np.testing.assert_array_equal(s2, x_s2)
    panel = visualization.imagery_panel(x_s2, cfg_for("s2"))
    np.testing.assert_array_equal(
        panel, visualization.optical_rgb(x_s2))   # all 4 S2 bands kept

    x_s1 = rng.uniform(size=(8, 9, 2)).astype(np.float32)
    s1, s2 = visualization.split_modalities(x_s1, cfg_for("s1"))
    assert s2 is None
    np.testing.assert_array_equal(s1, x_s1)
    panel = visualization.imagery_panel(x_s1, cfg_for("s1"))
    assert panel.shape == (8, 9, 3)               # SAR grayscale, no crash


def test_png_decodes_via_libpng(tmp_path):
    """Foreign-implementation pin for the PNG writer (the LZW lesson:
    self-roundtrips prove nothing about interop): libpng16's simplified
    API must decode our output bit-exactly. Skipped when libpng16 is not
    on the system."""
    import ctypes

    try:
        lp = ctypes.CDLL("libpng16.so.16")
    except OSError:
        pytest.skip("libpng16 not available")

    class PngImage(ctypes.Structure):
        _fields_ = [("opaque", ctypes.c_void_p),
                    ("version", ctypes.c_uint32),
                    ("width", ctypes.c_uint32),
                    ("height", ctypes.c_uint32),
                    ("format", ctypes.c_uint32),
                    ("flags", ctypes.c_uint32),
                    ("colormap_entries", ctypes.c_uint32),
                    ("warning_or_error", ctypes.c_uint32),
                    ("message", ctypes.c_char * 64)]

    lp.png_image_begin_read_from_file.argtypes = [
        ctypes.POINTER(PngImage), ctypes.c_char_p]
    lp.png_image_finish_read.argtypes = [
        ctypes.POINTER(PngImage), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p]

    img = np.random.default_rng(0).integers(
        0, 256, size=(37, 53, 3), dtype=np.uint8)
    f = png.write_png(tmp_path / "x.png", img)

    im = PngImage()
    im.version = 1
    assert lp.png_image_begin_read_from_file(
        ctypes.byref(im), str(f).encode()) != 0, im.message
    assert (im.width, im.height) == (53, 37)
    im.format = 2  # PNG_FORMAT_RGB
    buf = ctypes.create_string_buffer(im.width * im.height * 3)
    assert lp.png_image_finish_read(
        ctypes.byref(im), None, buf, 0, None) != 0, im.message
    got = np.frombuffer(buf.raw, np.uint8).reshape(im.height, im.width, 3)
    np.testing.assert_array_equal(got, img)


def test_visualization_panels():
    img = np.random.default_rng(0).uniform(size=(10, 12, 6)).astype(np.float32)
    rgb = visualization.optical_rgb(img)
    assert rgb.shape == (10, 12, 3) and rgb.dtype == np.uint8
    sar = visualization.sar_gray(img)
    assert sar.shape == (10, 12, 3)
    pred = np.array([[1, 1, 0], [0, 1, 0]])
    gt = np.array([[1, 0, 0], [0, 1, 1]])
    cls = visualization.get_misclassifications(pred, gt)
    np.testing.assert_array_equal(cls, [[1, 2, 0], [0, 1, 3]])
    colored = visualization.classification_rgb(cls)
    assert colored.shape == (2, 3, 3)
    grid = visualization.compose_grid([[rgb, sar], [colored]])
    assert grid.ndim == 3 and grid.shape[2] == 3


def test_dataset_helpers_on_fixture(fixture_dataset):
    aois = dataset_helpers.aoi_ids(str(fixture_dataset))
    assert len(aois) == 5
    aoi = aois[0]
    ts = dataset_helpers.get_timeseries(str(fixture_dataset), aoi)
    assert len(ts) == 3
    assert dataset_helpers.length_timeseries(str(fixture_dataset), aoi) == 3
    assert dataset_helpers.duration_timeseries(str(fixture_dataset), aoi) == 2
    assert dataset_helpers.date2index([2019, 1]) == 0
    assert dataset_helpers.date2str([2019, 3]) == "19-03"
    labeled = [a for a in aois
               if dataset_helpers.metadata(str(fixture_dataset))[a][0]["buildings"]]
    change = dataset_helpers.generate_change_label(str(fixture_dataset), labeled[0])
    assert change.dtype == np.uint8 and change.sum() > 0
    transform, crs = dataset_helpers.get_geo(str(fixture_dataset), aoi)
    assert str(crs) == "EPSG:4326"


def test_split_generators(fixture_dataset):
    train, test = dataset_helpers.generate_train_test_split(
        str(fixture_dataset), split=0.4, seed=7)
    assert set(train) | set(test) == set(dataset_helpers.aoi_ids(str(fixture_dataset)))
    assert not set(train) & set(test)


def test_training_validation_split_legacy_sequence(tmp_path):
    """The split generator must reproduce the reference's legacy global
    MT19937 draw (np.random.seed(7); np.random.rand — reference
    spacenet7_helpers.py:84-89) so regenerated splits assign AOIs exactly
    as the shipped config lists were produced."""
    import numpy as np

    from multimodal_siamese_cd_tpu import spacenet7

    aois = [f"L15-{i:04d}E-0001N_{i}_0_13" for i in range(10)]
    for a in aois:
        (tmp_path / "train" / a).mkdir(parents=True)

    training, validation = spacenet7.training_validation_split(str(tmp_path))

    # the legacy stream for seed 7 (stable across numpy versions: MT19937)
    expected_rand = np.array([0.07630829, 0.77991879, 0.43840923, 0.72346518,
                              0.97798951, 0.53849587, 0.50112046, 0.07205113,
                              0.26843898, 0.4998825])
    np.testing.assert_allclose(np.random.RandomState(7).rand(10),
                               expected_rand, atol=1e-8)
    exp_val = [a for a, r in zip(sorted(aois), expected_rand) if r <= 0.3]
    exp_train = [a for a, r in zip(sorted(aois), expected_rand) if r > 0.3]
    assert validation == exp_val
    assert training == exp_train
    # global numpy RNG state must not be touched by the generator
    state_before = np.random.get_state()[1][:4].tolist()
    spacenet7.training_validation_split(str(tmp_path))
    assert np.random.get_state()[1][:4].tolist() == state_before


def test_generate_train_test_split_legacy_sequence(tmp_path):
    """Same reproduction-faithfulness guarantee as the spacenet7 split:
    the train/test generator draws the reference's legacy MT19937 stream
    (reference dataset_helpers.py:174-186), so the same (dataset, seed)
    yields the reference's exact partition."""
    import json

    import numpy as np

    aois = [f"L15-{i:04d}E-0001N_{i}_0_13" for i in range(10)]
    (tmp_path / "metadata.json").write_text(
        json.dumps({a: [] for a in aois}))

    train, test = dataset_helpers.generate_train_test_split(
        str(tmp_path), split=0.3, seed=7)

    expected_rand = np.random.RandomState(7).rand(10)
    assert test == [a for a, r in zip(sorted(aois), expected_rand) if r <= 0.3]
    assert train == [a for a, r in zip(sorted(aois), expected_rand) if r > 0.3]
    # private stream: the global numpy RNG must stay untouched
    state_before = np.random.get_state()[1][:4].tolist()
    dataset_helpers.generate_train_test_split(str(tmp_path))
    assert np.random.get_state()[1][:4].tolist() == state_before


def test_study_area_records(tmp_path):
    """upload_study_area's pure core: per-AOI records carry the config-driven
    split/labeled tags and the origin from the first masked image's affine
    transform (exported schema of reference upload_study_area.py:15-44)."""
    import numpy as np

    import upload_study_area
    from multimodal_siamese_cd_tpu import geofiles
    from multimodal_siamese_cd_tpu.config import load_cfg

    aois = {"train": ["aoiA", "aoiB", "aoiC"], "test": ["aoiD"]}
    origin = {"aoiA": 10.0, "aoiB": 20.0, "aoiC": 30.0, "aoiD": 40.0}
    for dataset, ids in aois.items():
        for a in ids:
            t = (1.0, 0.0, origin[a], 0.0, -1.0, origin[a] + 1)
            geofiles.write_tif(
                tmp_path / dataset / a / "images_masked" / f"{a}_m.tif",
                np.zeros((4, 4, 3), np.uint8), t, "EPSG:3857")

    cfg = load_cfg("base")
    cfg.DATASET.TRAINING_IDS = ["aoiA"]
    cfg.DATASET.VALIDATION_IDS = ["aoiB"]
    cfg.DATASET.TEST_IDS = ["aoiD"]

    records = upload_study_area.study_area_records(cfg, str(tmp_path))
    by_id = {r["aoi_id"]: r for r in records}
    assert set(by_id) == {"aoiA", "aoiB", "aoiC", "aoiD"}
    assert (by_id["aoiA"]["split"], by_id["aoiA"]["labeled"]) == ("training", 1)
    assert (by_id["aoiB"]["split"], by_id["aoiB"]["labeled"]) == ("validation", 1)
    # aoiC is on no list -> unlabeled training pool
    assert (by_id["aoiC"]["split"], by_id["aoiC"]["labeled"]) == ("training", 0)
    assert (by_id["aoiD"]["split"], by_id["aoiD"]["labeled"]) == ("test", 1)
    assert by_id["aoiB"]["x"] == 20.0 and by_id["aoiB"]["y"] == 21.0
    assert by_id["aoiA"]["crs"] == "EPSG:3857"
    # the export spec is contractual
    assert upload_study_area.EXPORT_SPEC["fileNamePrefix"] == "siamese_ssl_aoi_ids"
    assert upload_study_area.EXPORT_SPEC["fileFormat"] == "GeoJSON"


def test_metadata_argument_parser_contract():
    import upload_study_area

    args = upload_study_area.metadata_argument_parser().parse_known_args(
        ["-s", "/data/sn7", "KEY", "VALUE"])[0]
    assert args.spacenet7_dir == "/data/sn7"
    assert args.config_file == "base"
    assert args.opts == ["KEY", "VALUE"]


def test_bitmap_font_rendering():
    import numpy as np

    from multimodal_siamese_cd_tpu import bitmap_font

    mask = bitmap_font.render_text("A1")
    assert mask.shape == (7, 11)  # two 5-wide glyphs + 1 px space
    assert mask.any()
    # 'I' center column is lit through the middle rows
    i_mask = bitmap_font.render_text("I")
    assert i_mask[3, 2] and not i_mask[3, 0]
    # unknown characters fall back to '?'
    assert np.array_equal(bitmap_font.render_text("é"),
                          bitmap_font.render_text("?"))

    img = np.full((30, 60, 3), 255, np.uint8)
    bitmap_font.draw_text(img, "OK", 2, 2, scale=2, color=(255, 0, 0))
    assert (img == [255, 0, 0]).all(axis=-1).any()
    # clipping at the edge must not raise
    bitmap_font.draw_text(img, "CLIPPED", 28, 55, scale=2)


def test_compose_grid_annotations(tmp_path):
    import numpy as np

    from multimodal_siamese_cd_tpu import png, visualization

    panels = [[np.full((40, 40, 3), 200, np.uint8) for _ in range(3)]
              for _ in range(2)]
    plain = visualization.compose_grid(panels)
    annotated = visualization.compose_grid(
        panels, col_titles=["t1", "t2", "GT"], row_labels=["aoi_a", "aoi_b"],
        title="model comparison")
    # annotation strips make the figure strictly larger and add dark pixels
    assert annotated.shape[0] > plain.shape[0]
    assert annotated.shape[1] > plain.shape[1]
    assert (annotated == 0).any() and not (plain == 0).any()
    out = visualization.save_figure(
        tmp_path / "fig.png", panels, col_titles=["t1", "t2", "GT"],
        row_labels=["aoi_a", "aoi_b"], title="model comparison")
    round_trip = png.read_png(out)
    assert round_trip.shape[:2] == annotated.shape[:2]
    assert np.array_equal(round_trip[..., :3], annotated)


def test_bench_payload_contract():
    """Pin the driver-facing bench.py JSON payload: primary metric, all
    three regime keys, per-regime vs_torch ratios against the recorded
    torch baselines, and JSON-serializability."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    results = {"supervised": {"value": 333.7},
               "dualtask": {"value": 199.2},
               "semisupervised": {"value": 165.1}}
    payload = bench.build_payload(results, "supervised")
    assert payload["metric"] == "train_patches_per_sec_per_chip"
    assert payload["value"] == 333.7
    assert payload["unit"] == "patches/sec/chip"
    assert set(payload["regimes"]) == set(results)
    assert set(payload["vs_torch"]) == set(results)
    for regime, rec in results.items():
        expect = rec["value"] / bench.TORCH_REFERENCE_PATCHES_PER_SEC[regime]
        assert payload["vs_torch"][regime] == pytest.approx(expect, rel=0.01)
    assert payload["vs_baseline"] == pytest.approx(333.7 / 0.216, rel=0.01)
    assert payload["vs_torch"]["supervised"] == pytest.approx(
        payload["vs_baseline"], rel=0.01)
    json.dumps(payload)  # single-line parseable


def test_model_scaling_collective_parser():
    """tools/model_scaling.py must parse collectives out of OPTIMIZED
    TPU HLO, whose shapes carry layout groups like ``{0:T(128)S(1)}`` —
    parens inside the layout broke the original shape regex and reported
    ZERO collectives for a step that all-reduces 46 MiB (round-5 bug).
    Operand REFERENCES (``get-tuple-element(%all-reduce.N)``) must not
    count; async ``-start``/``-done`` pairs must count exactly once."""
    from conftest import import_tool

    ms = import_tool("model_scaling")

    hlo = "\n".join([
        "ENTRY %main () -> f32[] {",
        # variadic sync all-reduce, TPU layouts (the regression shape)
        "  %all-reduce.256 = (bf16[2,3,128,128]{2,3,1,0:T(8,128)(2,1)S(1)},"
        " bf16[128]{0:T(128)S(1)}) all-reduce(%a, %b), replica_groups={}",
        # operand reference: must NOT count as a collective
        "  %get-tuple-element.1 = bf16[128]{0:T(128)S(1)}"
        " get-tuple-element(%all-reduce.256), index=1",
        # async pair: -start carries the shapes, -done must not double-count
        "  %all-gather-start.3 = f32[8,16]{1,0:T(8,128)}"
        " all-gather-start(%c), dimensions={0}",
        "  %all-gather-done.3 = f32[8,16]{1,0:T(8,128)}"
        " all-gather-done(%all-gather-start.3)",
        "  ROOT %reduce-scatter.9 = f32[4]{0} reduce-scatter(%d)",
        "}",
    ])
    out = ms.collective_bytes(hlo)
    assert out["all-reduce"]["count"] == 1
    assert out["all-reduce"]["bytes"] == 2 * (2 * 3 * 128 * 128 + 128)
    assert out["all-gather"] == {"count": 1, "bytes": 4 * 8 * 16}
    assert out["reduce-scatter"] == {"count": 1, "bytes": 16}
