#!/usr/bin/env python
"""Build the optional native decode extension in place.

Compiles native/fastcodecs.c into
``multimodal_siamese_cd_tpu/_fastcodecs.<abi>.so`` with setuptools.
Everything works without it (pure-Python fallbacks in geotiff.py); run this
once per environment for fast LZW/PackBits decode:

    python tools/build_native.py
"""

import shutil
import sys
import sysconfig
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    from setuptools import Distribution, Extension
    from setuptools.command.build_ext import build_ext

    ext = Extension(
        "multimodal_siamese_cd_tpu._fastcodecs",
        sources=[str(REPO / "native" / "fastcodecs.c")],
        extra_compile_args=["-O3"],
    )
    dist = Distribution({"name": "fastcodecs", "ext_modules": [ext]})
    cmd = build_ext(dist)
    cmd.build_lib = tempfile.mkdtemp(prefix="fastcodecs_build_")
    cmd.build_temp = tempfile.mkdtemp(prefix="fastcodecs_tmp_")
    cmd.finalize_options()
    cmd.run()

    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    built = Path(cmd.build_lib) / "multimodal_siamese_cd_tpu" / f"_fastcodecs{suffix}"
    target = REPO / "multimodal_siamese_cd_tpu" / f"_fastcodecs{suffix}"
    shutil.copy2(built, target)
    print(f"built {target}")

    sys.path.insert(0, str(REPO))
    from multimodal_siamese_cd_tpu import _fastcodecs  # noqa: F401

    assert _fastcodecs.packbits_decode(bytes([1, 7, 7])) == bytes([7, 7])
    print("import + smoke test OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
