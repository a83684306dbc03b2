"""Dataset preprocessing CLI: build metadata.json for a processed dataset tree.

The reference preprocessing.py is a 14-line stub whose declared intent is
``create_metadata_file`` (reference preprocessing.py:7-12); this implements
it: scan ``{root}/{aoi}/{s1,s2,buildings}`` for
``{mod}_{aoi}_{year}_{month:02d}.tif`` files and emit the metadata.json
schema the dataset consumes (utils/datasets.py:115-119: per-AOI list of
``{year, month, s1, s2, buildings, masked}`` records).

CLI contract kept (utils/parsers.py:22-31): ``python preprocessing.py -d
<dataset-dir>``.
"""

from pathlib import Path

from multimodal_siamese_cd_tpu import geofiles, parsers


def _scan_modality(aoi_dir: Path, modality: str) -> set:
    folder = aoi_dir / modality
    dates = set()
    if folder.exists():
        for f in folder.glob(f"{modality}_*.tif"):
            parts = f.stem.split("_")
            dates.add((int(parts[-2]), int(parts[-1])))
    return dates


def create_metadata_file(dataset_path: str) -> dict:
    root = Path(dataset_path)
    bad = {}
    bad_file = root / "bad_data.json"
    if bad_file.exists():
        bad = geofiles.load_json(bad_file)

    metadata = {}
    for aoi_dir in sorted(p for p in root.iterdir() if p.is_dir()
                          and not p.name.startswith(".")):
        aoi_id = aoi_dir.name
        s1 = _scan_modality(aoi_dir, "s1")
        s2 = _scan_modality(aoi_dir, "s2")
        buildings = _scan_modality(aoi_dir, "buildings")
        all_dates = sorted(s1 | s2 | buildings, key=lambda d: d[0] * 12 + d[1])
        if not all_dates:
            continue
        bad_dates = {tuple(d) for d in bad.get(aoi_id, [])}
        metadata[aoi_id] = [
            {
                "year": year,
                "month": month,
                "s1": (year, month) in s1,
                "s2": (year, month) in s2,
                "buildings": (year, month) in buildings,
                "masked": (year, month) in bad_dates,
            }
            for year, month in all_dates
        ]

    geofiles.write_json(root / "metadata.json", metadata)
    print(f"metadata.json written for {len(metadata)} AOIs under {root}")
    return metadata


if __name__ == "__main__":
    args = parsers.preprocess_argument_parser().parse_known_args()[0]
    create_metadata_file(args.dataset)
