"""Google Earth Engine study-area export CLI.

Port of the reference upload_study_area.py:15-61: exports a
FeatureCollection of AOI centroids tagged with split/labeled flags to
Drive. The ``earthengine-api`` is optional in this environment; the CLI
errors cleanly when it is missing. Centroid extraction reads the affine
transform's translation (c, f) from the first masked-image GeoTIFF.
"""

import argparse
from pathlib import Path

from multimodal_siamese_cd_tpu import experiment_manager, geofiles, spacenet7

try:
    import ee
except ImportError:
    ee = None


def get_centroid(aoi_id: str, spacenet7_path: str, dataset: str):
    folder = Path(spacenet7_path) / dataset / aoi_id / 'images_masked'
    files = [f for f in folder.glob('**/*') if f.is_file()]
    _, transform, crs = geofiles.read_tif(files[0])
    _, _, c, _, _, f, *_ = transform
    return ee.Geometry.Point(coords=[c, f], proj=str(crs)).transform()


def upload_study_area(spacenet7_path: str, config_name: str = 'base') -> None:
    cfg = experiment_manager.load_cfg(config_name)
    train_aoi_ids = spacenet7.get_all_aoi_ids(spacenet7_path, 'train')
    test_aoi_ids = spacenet7.get_all_aoi_ids(spacenet7_path, 'test')
    features = []
    for aoi_id in train_aoi_ids + test_aoi_ids:
        centroid = get_centroid(aoi_id, spacenet7_path,
                                'train' if aoi_id in train_aoi_ids else 'test')
        if aoi_id in cfg.DATASET.TRAINING_IDS:
            split, labeled = 'training', 1
        elif aoi_id in cfg.DATASET.VALIDATION_IDS:
            split, labeled = 'validation', 1
        elif aoi_id in cfg.DATASET.TEST_IDS:
            split, labeled = 'test', 1
        else:
            split, labeled = 'training', 0
        features.append(ee.Feature(centroid, {'aoi_id': aoi_id, 'split': split,
                                              'labeled': labeled}))

    fc = ee.FeatureCollection(features)
    dl_task = ee.batch.Export.table.toDrive(
        collection=fc,
        description='siameseSSLstudyArea',
        folder='siamese_ssl',
        fileNamePrefix='siamese_ssl_aoi_ids',
        fileFormat='GeoJSON',
    )
    dl_task.start()


def metadata_argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Experiment Args")
    parser.add_argument('-s', "--spacenet7-dir", dest='spacenet7_dir',
                        required=True, help="path to SpaceNet7 dataset")
    parser.add_argument('-c', "--config-file", dest='config_file',
                        required=False, default="base", help="path to config file")
    parser.add_argument(
        "opts",
        help="Modify config options using the command-line",
        default=None,
        nargs=argparse.REMAINDER,
    )
    return parser


if __name__ == '__main__':
    if ee is None:
        raise SystemExit("earthengine-api is not installed; "
                         "`pip install earthengine-api` to use this script.")
    ee.Initialize()
    args = metadata_argument_parser().parse_known_args()[0]
    upload_study_area(args.spacenet7_dir, args.config_file)
