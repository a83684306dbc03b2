"""Command-line argument parsers.

The CLI contract is kept identical to the reference (utils/parsers.py:5-31
and the inline parsers in assessment_change.py:64-80,
assessment_semantics.py:155-171, qualitative_comparison.py:170-186):
``-c/--config-file -p/--project -o/--output-dir -d/--dataset-dir``
plus a trailing REMAINDER ``opts`` list of config overrides.
"""

import argparse


def training_argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Experiment Args")
    parser.add_argument('-c', "--config-file", dest='config_file', required=True,
                        help="path to config file")
    parser.add_argument('-p', "--project", dest='project', required=True,
                        help="w&b project")
    parser.add_argument('-o', "--output-dir", dest='output_dir', required=True,
                        help="path to output directory")
    parser.add_argument('-d', "--dataset-dir", dest='dataset_dir', default="",
                        required=True, help="path to output directory")
    parser.add_argument(
        "opts",
        help="Modify config options using the command-line",
        default=None,
        nargs=argparse.REMAINDER,
    )
    return parser


def preprocess_argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Experiment Args")
    parser.add_argument('-d', "--dataset", dest='dataset', required=True,
                        help="path to dataset")
    parser.add_argument(
        "opts",
        help="Modify config options using the command-line",
        default=None,
        nargs=argparse.REMAINDER,
    )
    return parser


def assessment_argument_parser() -> argparse.ArgumentParser:
    """Shared by assessment_change.py / assessment_semantics.py (their inline
    parsers are identical apart from the default run type, which callers set
    via ``set_defaults``)."""
    parser = argparse.ArgumentParser(description="Experiment Args")
    parser.add_argument('-c', "--config-file", dest='config_file', required=True,
                        help="path to config file")
    parser.add_argument('-o', "--output-dir", dest='output_dir', required=True,
                        help="path to output directory")
    parser.add_argument('-d', "--dataset-dir", dest='dataset_dir', default="",
                        required=True, help="path to output directory")
    parser.add_argument('-r', "--run-type", dest='run_type', default="test",
                        required=False, help="run type")
    parser.add_argument(
        "opts",
        help="Modify config options using the command-line",
        default=None,
        nargs=argparse.REMAINDER,
    )
    return parser


def comparison_argument_parser() -> argparse.ArgumentParser:
    """qualitative_comparison.py takes ``-c`` as a list of config names
    (reference: qualitative_comparison.py:174)."""
    parser = argparse.ArgumentParser(description="Experiment Args")
    parser.add_argument('-c', '--config-files', nargs='+', required=True,
                        help="path to config file")
    parser.add_argument('-o', "--output-dir", dest='output_dir', required=True,
                        help="path to output directory")
    parser.add_argument('-d', "--dataset-dir", dest='dataset_dir', default="",
                        required=True, help="path to output directory")
    parser.add_argument('-r', "--run-type", dest='run_type', default="test",
                        required=False, help="run type")
    parser.add_argument(
        "opts",
        help="Modify config options using the command-line",
        default=None,
        nargs=argparse.REMAINDER,
    )
    return parser


def metadata_argument_parser() -> argparse.ArgumentParser:
    """upload_study_area.py contract (reference upload_study_area.py:47-61):
    ``-s/--spacenet7-dir`` (required), ``-c/--config-file`` (default 'base'),
    trailing REMAINDER ``opts``."""
    parser = argparse.ArgumentParser(description="Experiment Args")
    parser.add_argument('-s', "--spacenet7-dir", dest='spacenet7_dir',
                        required=True, help="path to SpaceNet7 dataset")
    parser.add_argument('-c', "--config-file", dest='config_file',
                        required=False, default="base",
                        help="path to config file")
    parser.add_argument(
        "opts",
        help="Modify config options using the command-line",
        default=None,
        nargs=argparse.REMAINDER,
    )
    return parser
