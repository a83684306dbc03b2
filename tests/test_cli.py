"""Subprocess smoke tests of the top-level CLI scripts — the reference CLI
contract end to end on the synthetic fixture (CPU backend)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

FIXTURE_OVERRIDES = [
    "MODEL.TOPOLOGY", "[4,8]",
    "AUGMENTATION.CROP_SIZE", "32",
    "DATALOADER.TRAINING_MULTIPLIER", "2",
    "TRAINER.BATCH_SIZE", "2",
    "TRAINER.PRECISION", "fp32",
    "TRAINER.EPOCHS", "1",
    "LOG_FREQ", "100",
    "DATASET.TRAINING_IDS",
    "['L15-0331E-1257N_1327_3160_13','L15-0361E-1300N_1446_2989_13']",
    "DATASET.VALIDATION_IDS", "['L15-0358E-1220N_1433_3310_13']",
    "DATASET.TEST_IDS", "['L15-0357E-1223N_1429_3296_13']",
    "DATASET.UNLABELED_IDS", "['L15-0369E-1244N_1479_3214_13']",
]


def run_cli(script: str, argv: list, timeout: int = 600) -> str:
    """Run a top-level script in a subprocess with the CPU backend forced
    (the host sitecustomize pins the TPU platform, so the override must be
    a config.update after jax import)."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import runpy, sys\n"
        f"sys.argv = {[script] + argv!r}\n"
        f"runpy.run_path({script!r}, run_name='__main__')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, f"{script} failed:\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout + proc.stderr


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, fixture_dataset):
    out = tmp_path_factory.mktemp("cli_out")
    return {"out": str(out), "data": str(fixture_dataset)}


def test_train_supervised_and_assessment_roundtrip(workdir):
    argv = ["-c", "siamese", "-p", "proj", "-o", workdir["out"],
            "-d", workdir["data"]] + FIXTURE_OVERRIDES + [
            "SAVE_CHECKPOINTS", "[1]", "INFERENCE_CHECKPOINT", "1"]
    out = run_cli("train_supervised.py", argv)
    assert "Starting epoch 1/1" in out
    assert "saving network" in out
    ckpt = Path(workdir["out"]) / "networks" / "siamese_checkpoint1.pt"
    assert ckpt.exists()
    # JSONL logging sink captured the eval metrics
    log = Path(workdir["out"]) / "logs" / "siamese.jsonl"
    assert any("validation F1" in line for line in log.read_text().splitlines())

    out = run_cli("assessment_change.py",
                  ["-c", "siamese", "-o", workdir["out"], "-d", workdir["data"],
                   "-r", "test"] + FIXTURE_OVERRIDES + [
                   "INFERENCE_CHECKPOINT", "1"])
    assert "F1 score:" in out


def test_train_semisupervised_cli(workdir):
    argv = ["-c", "siamese_mmcr_alpha0500", "-p", "proj", "-o", workdir["out"],
            "-d", workdir["data"]] + FIXTURE_OVERRIDES + [
            "SAVE_CHECKPOINTS", "[]"]
    out = run_cli("train_semisupervised.py", argv)
    assert "Starting epoch 1/1" in out


def test_train_dualtask_and_assessment_semantics(workdir):
    argv = ["-c", "dtsiamese", "-p", "proj", "-o", workdir["out"],
            "-d", workdir["data"]] + FIXTURE_OVERRIDES + [
            "SAVE_CHECKPOINTS", "[1]", "INFERENCE_CHECKPOINT", "1"]
    out = run_cli("train_supervised_dualtask.py", argv)
    assert "saving network" in out
    out = run_cli("assessment_semantics.py",
                  ["-c", "dtsiamese", "-o", workdir["out"], "-d", workdir["data"],
                   "-r", "validation"] + FIXTURE_OVERRIDES + [
                   "INFERENCE_CHECKPOINT", "1"])
    assert "--Change--" in out and "--Change Sem--" in out and "--Sem--" in out


def test_preprocessing_cli(tmp_path, fixture_dataset):
    import shutil

    tree = tmp_path / "ds"
    shutil.copytree(fixture_dataset, tree)
    (tree / "metadata.json").unlink()
    out = run_cli("preprocessing.py", ["-d", str(tree)])
    assert "metadata.json written" in out
    meta = json.loads((tree / "metadata.json").read_text())
    aoi = "L15-0331E-1257N_1327_3160_13"
    assert meta[aoi][0]["s1"] is True
    assert meta[aoi][0]["buildings"] is True
    unl = "L15-0369E-1244N_1479_3214_13"
    assert meta[unl][0]["buildings"] is False


def test_qualitative_scripts_s2_config(workdir, monkeypatch):
    """In-process drive of the figure scripts on an INPUT_MODE 's2' config
    (baseline_siamese) — the case where the old fixed ``[:, :, n_s1:]``
    slice truncated real bands (IndexError inside optical_rgb) before the
    split_modalities fix."""
    from pathlib import Path

    import qualitative_comparison as qc
    import sanity_check
    from multimodal_siamese_cd_tpu import (checkpoints, experiment_manager,
                                           trainers)
    from multimodal_siamese_cd_tpu.data import synthetic

    small = ["MODEL.TOPOLOGY", "[4,8]", "AUGMENTATION.CROP_SIZE", "32",
             "TRAINER.PRECISION", "fp32"]

    orig_manual = experiment_manager.setup_cfg_manual

    def manual_with_fixture(name, out, dsd):
        c = orig_manual(name, out, dsd)
        c.merge_from_list(synthetic.fixture_cfg_overrides() + small)
        return c

    cfg = manual_with_fixture("baseline_siamese", Path(workdir["out"]),
                              Path(workdir["data"]))
    assert cfg.DATALOADER.INPUT_MODE == "s2"
    model, state, _ = trainers._create_or_resume(cfg)
    checkpoints.save_checkpoint(state, cfg.INFERENCE_CHECKPOINT, 0, cfg)

    monkeypatch.setattr(qc.experiment_manager, "setup_cfg_manual",
                        manual_with_fixture)
    aois = list(synthetic.TEST_AOIS[:1])
    f1 = qc.qualitative_comparison(["baseline_siamese"], workdir["out"],
                                   workdir["data"], aois)
    assert f1.exists()
    f2 = qc.qualitative_comparison_zoom(["baseline_siamese"], workdir["out"],
                                        workdir["data"], aois, [(0, 0, 16)],
                                        colored=True)
    assert f2.exists()

    orig_load = experiment_manager.load_cfg

    def load_with_fixture(name):
        c = orig_load(name)
        c.merge_from_list(synthetic.fixture_cfg_overrides() + small)
        return c

    monkeypatch.setattr(sanity_check.experiment_manager, "load_cfg",
                        load_with_fixture)
    files = sanity_check.sanity_check_dataset(
        "baseline_siamese", workdir["data"], n_samples=1,
        out_dir=str(Path(workdir["out"]) / "sanity"))
    assert files and files[0].exists()


def test_graft_entry_dryrun():
    code = (
        "import os\n"
        "os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')+' --xla_force_host_platform_device_count=8'\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import __graft_entry__ as g\n"
        # smoke subset: the 6 trace-coverage-critical surfaces. The later
        # surfaces each have a dedicated in-suite test (test_train_lib /
        # test_multihost); the driver's own dryrun still runs "all".
        "g.dryrun_multichip(8, surfaces='smoke')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip OK" in proc.stdout
