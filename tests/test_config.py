"""Config system tests: _BASE_ inheritance, CLI overrides, parity of every
shipped config with the reference experiment definitions."""

from pathlib import Path

import pytest

from multimodal_siamese_cd_tpu import config as cfg_mod
from multimodal_siamese_cd_tpu.config import CfgNode, load_cfg, new_config

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


def _load(name: str) -> CfgNode:
    c = new_config()
    c.merge_from_file(CONFIG_DIR / f"{name}.yaml")
    return c


def test_attribute_access_and_nesting():
    c = CfgNode({"A": {"B": 1}, "C": [1, 2]})
    assert c.A.B == 1
    assert c.C == [1, 2]
    c.A.D = "x"
    assert c["A"]["D"] == "x"
    with pytest.raises(AttributeError):
        _ = c.MISSING


def test_base_inheritance_child_wins():
    c = _load("debug")
    assert c.DEBUG is True            # child override
    assert c.TRAINER.LR == 1e-4       # inherited
    assert c.MODEL.TOPOLOGY == [64, 128, 256, 512]
    assert len(c.DATASET.TRAINING_IDS) == 39   # two-level _BASE_ chain via splits.yaml


def test_sci_notation_floats_quoted_vs_bare(tmp_path):
    # PyYAML's YAML-1.1 resolver leaves a bare `1e-4` as a string (its float
    # regex demands a dot and a signed exponent); the reference relies on
    # fvcore coercing it. Our SafeLoader subclass resolves it at the YAML
    # layer, which is the only place the quoted/bare distinction is visible.
    f = tmp_path / "c.yaml"
    f.write_text(
        'LR: 1e-4\n'
        'BIG: 2E5\n'
        'DOTTED: 1.5e-3\n'
        'QUOTED: "7E2"\n'
        'NAME: run_1e5\n'          # not a number — must stay a string
        'VERSION: "12"\n'
    )
    c = cfg_mod.load_yaml_with_base(f)
    assert c.LR == 1e-4 and isinstance(c.LR, float)
    assert c.BIG == 2e5 and isinstance(c.BIG, float)
    assert c.DOTTED == 1.5e-3
    assert c.QUOTED == "7E2"       # user quoting is honored
    assert c.NAME == "run_1e5"
    assert c.VERSION == "12"
    # CLI override values decode as Python literals (reference yacs
    # _decode_cfg_value semantics), not YAML
    c.A = None
    c.B = None
    c.merge_from_list(["A", "3e-2", "B", "hello"])
    assert c.A == 3e-2 and isinstance(c.A, float)
    assert c.B == "hello"


def test_merge_from_list_yaml11_traps_stay_strings():
    # YAML-1.1 would mangle these (no->False, 010->octal 8, 1:30->90,
    # bare dates -> datetime.date); the reference's literal_eval decode
    # keeps them as the strings the user typed.
    c = CfgNode({k: None for k in "ABCDE"})
    c.merge_from_list([
        "A", "no",
        "B", "010",
        "C", "1:30",
        "D", "2021-01-01",
        "E", "on",
    ])
    assert c.A == "no"
    assert c.B == "010"
    assert c.C == "1:30"
    assert c.D == "2021-01-01"
    assert c.E == "on"


def test_merge_from_list_rejects_path_through_scalar():
    c = CfgNode({"MODEL": {"TYPE": "siameseunet"}})
    with pytest.raises(KeyError, match="MODEL.TYPE"):
        c.merge_from_list(["MODEL.TYPE.NAME", "x"])
    assert c.MODEL.TYPE == "siameseunet"   # untouched by the failed merge


def test_merge_from_list_rejects_unknown_keys():
    """yacs parity: a typo'd override must raise, not silently create a
    dead key and train at the default (reference merge_from_list asserts
    'Non-existent key' regardless of new_allowed)."""
    c = CfgNode({"TRAINER": {"LR": 1e-4}})
    with pytest.raises(KeyError, match="TRAINER.LRATE"):
        c.merge_from_list(["TRAINER.LRATE", "0.001"])     # typo'd leaf
    with pytest.raises(KeyError, match="TRANIER.LR"):
        c.merge_from_list(["TRANIER.LR", "0.001"])        # typo'd section
    assert c.TRAINER.LR == 1e-4


def test_merge_from_list_accepts_extension_keys():
    """This framework's own knobs are settable via CLI even when the
    loaded YAML never mentions them (config.EXTENSION_KEYS)."""
    c = CfgNode({"TRAINER": {"LR": 1e-4}})
    c.merge_from_list(["TRAINER.GRAD_ACCUM", "4",
                       "MODEL.REMAT", "True",
                       "DATALOADER.SCENE_CACHE", "False"])
    assert c.TRAINER.GRAD_ACCUM == 4
    assert c.MODEL.REMAT is True
    assert c.DATALOADER.SCENE_CACHE is False
    for key in cfg_mod.EXTENSION_KEYS:
        assert key.count(".") == 1


def test_extension_keys_cover_every_cfg_get_read():
    """Anti-drift: every ``cfg.<NS>.get("KEY", default)`` knob in the
    package must be in config.EXTENSION_KEYS (else a documented knob
    raises 'Non-existent config key' from the CLI) and vice versa (else
    the allowlist advertises a knob nothing reads)."""
    import re
    from pathlib import Path

    pkg = Path(cfg_mod.__file__).parent
    pat = re.compile(
        r"\.(?P<ns>TRAINER|MODEL|DATALOADER|AUGMENTATION|CONSISTENCY_TRAINER"
        r"|DATASET|PATHS)\s*\.get\(\s*['\"](?P<key>[A-Z_0-9]+)['\"]")
    read = set()
    for py in pkg.rglob("*.py"):
        for m in pat.finditer(py.read_text()):
            read.add(f"{m.group('ns')}.{m.group('key')}")
    # knobs the shipped YAML already declares are NOT extension keys
    declared = set()
    for yaml_file in (Path(cfg_mod.__file__).parent.parent / "configs").glob("*.yaml"):
        import yaml as _yaml
        data = _yaml.safe_load(yaml_file.read_text()) or {}
        for ns, sub in data.items():
            if isinstance(sub, dict):
                declared |= {f"{ns}.{k}" for k in sub}
    needed = read - declared
    missing = needed - set(cfg_mod.EXTENSION_KEYS)
    assert not missing, f"missing from EXTENSION_KEYS: {sorted(missing)}"
    # staleness check is leaf-level: some knobs are read through an alias
    # (cache.py's `dl = cfg.DATALOADER; dl.get("SCENE_CACHE", ...)`) that
    # the namespaced regex cannot see
    leaf_pat = re.compile(r"\.get\(\s*['\"]([A-Z_0-9]+)['\"]")
    leaves_read = set()
    for py in pkg.rglob("*.py"):
        leaves_read |= set(leaf_pat.findall(py.read_text()))
    stale = {k for k in cfg_mod.EXTENSION_KEYS
             if k.split(".", 1)[1] not in leaves_read}
    assert not stale, f"stale in EXTENSION_KEYS (no .get() reads them): {sorted(stale)}"


def test_base_path_expanduser(tmp_path, monkeypatch):
    home = tmp_path / "home"
    home.mkdir()
    (home / "base.yaml").write_text("X: 1\n")
    monkeypatch.setenv("HOME", str(home))
    child = tmp_path / "child.yaml"
    child.write_text('_BASE_: "~/base.yaml"\nY: 2\n')
    c = cfg_mod.load_yaml_with_base(child)
    assert c.X == 1 and c.Y == 2


def test_cyclic_base_raises(tmp_path):
    f = tmp_path / "self.yaml"
    f.write_text('_BASE_: "self.yaml"\nX: 1\n')
    with pytest.raises(ValueError, match="Cyclic"):
        cfg_mod.load_yaml_with_base(f)


def test_merge_from_list_types():
    c = _load("base")
    c.merge_from_list([
        "TRAINER.LR", "5e-3",
        "TRAINER.BATCH_SIZE", "16",
        "MODEL.TYPE", "siameseunet",
        "DEBUG", "True",
        "MODEL.TOPOLOGY", "[8, 16]",
    ])
    assert c.TRAINER.LR == 5e-3
    assert c.TRAINER.BATCH_SIZE == 16
    assert c.MODEL.TYPE == "siameseunet"
    assert c.DEBUG is True
    assert c.MODEL.TOPOLOGY == [8, 16]


def test_every_config_loads():
    names = sorted(p.stem for p in CONFIG_DIR.glob("*.yaml") if p.stem != "splits")
    assert len(names) >= 29
    for name in names:
        c = _load(name)
        assert c.SEED == 7
        assert c.MODEL.OUT_CHANNELS == 1


# Expected values transcribed from the reference experiment definitions.
EXPECTED = {
    "base": dict(type="unet", bs=8, alpha=0.1, debug=False, gamma=False),
    "debug": dict(type="unet", bs=8, alpha=0.1, debug=True, gamma=False),
    "unet": dict(type="unet", bs=8, alpha=0.1, debug=True, gamma=False),
    "siamese": dict(type="siameseunet", bs=8, alpha=0.1, debug=False, gamma=False),
    "baseline_dualstream": dict(type="dualstreamunet", bs=8, alpha=0.1, debug=False, gamma=False),
    "baseline_dualstream_gamma": dict(type="dualstreamunet", bs=8, alpha=0.1, debug=False, gamma=True),
    "baseline_unet": dict(type="unet", bs=8, alpha=0.1, debug=True, gamma=False, in_ch=4, input_mode="s2"),
    "baseline_unet_gamma": dict(type="unet", bs=8, alpha=0.1, debug=False, gamma=True, in_ch=4, input_mode="s2"),
    "baseline_siamese": dict(type="siameseunet", bs=8, alpha=0.1, debug=True, gamma=False, in_ch=4, input_mode="s2"),
    "baseline_siamese_gamma": dict(type="siameseunet", bs=8, alpha=0.1, debug=False, gamma=True, in_ch=4, input_mode="s2"),
    "dtsiamese": dict(type="dtsiameseunet", bs=8, alpha=0.1, debug=False, gamma=False, bld=True),
    "dtsiamese_ssl": dict(type="dtsiameseunet", bs=8, alpha=0.1, debug=False, gamma=False, bld=True, unl=True, unl_val=True),
    "dtsiamese_ssl_test": dict(type="dtsiameseunet", bs=8, alpha=0.1, debug=False, gamma=False, bld=True, unl=True),
    "siamese_mmcr_base": dict(type="whatevernet", bs=4, alpha=0.0, debug=False, gamma=False, unl=True),
    "siamese_mmcr_alpha0100": dict(type="whatevernet", bs=4, alpha=0.1, debug=False, gamma=False, unl=True),
    "siamese_mmcr_alpha0100_gamma": dict(type="whatevernet", bs=4, alpha=0.1, debug=False, gamma=True, unl=True),
    "siamese_mmcr_alpha0500": dict(type="whatevernet", bs=4, alpha=0.5, debug=False, gamma=False, unl=True),
    "siamese_mmcr_alpha0500_gamma": dict(type="whatevernet", bs=4, alpha=0.5, debug=False, gamma=True, unl=True),
    "siamese_mmcr_alpha0500_16batch": dict(type="whatevernet", bs=16, alpha=0.5, debug=False, gamma=False, unl=True),
    "siamese_mmcr_alpha0900": dict(type="whatevernet", bs=4, alpha=0.9, debug=False, gamma=False, unl=True),
    "siamese_mmcr_alpha0900_gamma": dict(type="whatevernet", bs=4, alpha=0.9, debug=False, gamma=True, unl=True),
    "siamese_mmcr_alpha0990": dict(type="whatevernet", bs=4, alpha=0.99, debug=False, gamma=False, unl=True),
    "siamese_mmcr_alpha0990_gamma": dict(type="whatevernet", bs=4, alpha=0.99, debug=False, gamma=True, unl=True),
    "unet_mmcr_base": dict(type="whatevernet2", bs=8, alpha=0.0, debug=False, gamma=False, unl=True),
    "unet_mmcr_alpha0500": dict(type="whatevernet2", bs=8, alpha=0.5, debug=False, gamma=False, unl=True),
    "unet_mmcr_alpha0900": dict(type="whatevernet2", bs=8, alpha=0.9, debug=False, gamma=False, unl=True),
    "unet_mmcr_alpha0990": dict(type="whatevernet2", bs=8, alpha=0.99, debug=False, gamma=False, unl=True),
    "unet_mmrc_alpha0100": dict(type="whatevernet2", bs=8, alpha=0.1, debug=False, gamma=False, unl=True),
    "whatevernet_debug": dict(type="whatevernet", bs=2, alpha=0.9, debug=True, gamma=False, unl=True, topo=[64, 128]),
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_config_parity(name):
    e = EXPECTED[name]
    c = _load(name)
    assert c.MODEL.TYPE == e["type"]
    assert c.TRAINER.BATCH_SIZE == e["bs"]
    assert c.CONSISTENCY_TRAINER.LOSS_FACTOR == pytest.approx(e["alpha"])
    assert c.DEBUG is e["debug"]
    assert c.AUGMENTATION.GAMMA_CORRECTION is e["gamma"]
    assert c.MODEL.IN_CHANNELS == e.get("in_ch", 3)
    assert c.DATALOADER.INPUT_MODE == e.get("input_mode", "s1s2")
    assert c.DATALOADER.INCLUDE_BUILDING_LABELS is e.get("bld", False)
    assert c.DATALOADER.INCLUDE_UNLABELED is e.get("unl", False)
    assert c.DATALOADER.INCLUDE_UNLABELED_VALIDATION is e.get("unl_val", False)
    assert c.MODEL.TOPOLOGY == e.get("topo", [64, 128, 256, 512])
    # invariants across all configs
    assert c.DATALOADER.S1_BANDS == [0, 1]
    assert c.DATALOADER.S2_BANDS == [2, 1, 0, 3]
    assert c.AUGMENTATION.CROP_SIZE == 256
    assert c.MODEL.LOSS_TYPE == "PowerJaccardLoss"


def test_setup_cfg_cli(tmp_path, monkeypatch):
    from multimodal_siamese_cd_tpu.parsers import training_argument_parser

    out = tmp_path / "out"
    data = tmp_path / "data"
    out.mkdir()
    data.mkdir()
    monkeypatch.chdir(Path(__file__).resolve().parent.parent)
    args = training_argument_parser().parse_known_args([
        "-c", "debug", "-p", "proj", "-o", str(out), "-d", str(data),
        "TRAINER.LR", "0.01",
    ])[0]
    c = cfg_mod.setup_cfg(args)
    assert c.NAME == "debug"
    assert c.PATHS.OUTPUT == str(out)
    assert c.PATHS.DATASET == str(data)
    assert c.TRAINER.LR == 0.01


def test_load_cfg_by_name(monkeypatch):
    monkeypatch.chdir(Path(__file__).resolve().parent.parent)
    c = load_cfg("siamese")
    assert c.NAME == "siamese"
    assert c.MODEL.TYPE == "siameseunet"


def test_pickle_roundtrip():
    import pickle

    c = _load("base")
    c2 = pickle.loads(pickle.dumps(c))
    assert c2.TRAINER.LR == c.TRAINER.LR
    assert isinstance(c2.MODEL, CfgNode)
