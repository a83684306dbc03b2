#!/usr/bin/env python
"""Regenerate the libtiff-written ground-truth fixtures in tests/data/.

These fixtures pin the GeoTIFF decode paths against a FOREIGN
implementation (the LZW lesson: self-roundtrips of an encoder/decoder
pair prove nothing about interop — both sides of this repo's pair carried
the same early-change off-by-one until a libtiff-written file exposed it).

Each fixture is written through libtiff.so.6 via ctypes with a
deterministic numpy draw; the matching tests regenerate the same draw and
require bit-exact decode:

  libtiff_lzw.tif                 4x8192 u8, one LZW strip — crosses every
                                  code-width boundary + the 4094 CLEAR
                                  (tests/test_geotiff.py::test_lzw_read_libtiff_fixture)
  libtiff_lzw_pred2_u16.tif       4x3000 u16, LZW + predictor 2
  libtiff_deflate_pred2_u16.tif   4x3000 u16, deflate + predictor 2
  libtiff_fp_pred3_f32x3.tif      5x300x3 f32, deflate + fp predictor 3
  libtiff_fp_pred3_f64.tif        4x200 f64, deflate + fp predictor 3
  libtiff_bigtiff_pred2_u16x2.tif 6x500x2 u16 BigTIFF ("w8"), deflate +
                                  predictor 2, 3-row strips

Run: ``python tools/gen_libtiff_fixtures.py`` (needs libtiff.so.6; writes
into tests/data/). All files are written in one process — an earlier
revision claimed multiple opens corrupt libtiff's allocator and forked a
subprocess per file, but that was measured FALSE (6 sequential writer
sessions in one process produce byte-identical files to subprocess-per-
file, and tools/difffuzz_geotiff.py runs hundreds of open/write/read
cycles per process through the same fixed-signature ctypes pattern).
"""

import ctypes
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / "tests" / "data"


def write_one(path: Path, data: np.ndarray, comp: int, spp: int,
              predictor: int = 1, rows_per_strip: int | None = None,
              big: bool = False) -> None:
    lt = ctypes.CDLL("libtiff.so.6")
    lt.TIFFOpen.restype = ctypes.c_void_p
    lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lt.TIFFWriteScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_uint32, ctypes.c_uint16]
    lt.TIFFClose.argtypes = [ctypes.c_void_p]

    def setfield(tif, tag, val):
        f = lt.TIFFSetField
        f.restype = ctypes.c_int
        f.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_int]
        return f(tif, tag, val)

    h, w = data.shape[0], data.shape[1] // spp
    tif = lt.TIFFOpen(str(path).encode(), b"w8" if big else b"w")
    assert tif, f"libtiff refused {path}"
    setfield(tif, 256, w)
    setfield(tif, 257, h)
    setfield(tif, 258, data.dtype.itemsize * 8)
    setfield(tif, 277, spp)
    setfield(tif, 259, comp)
    setfield(tif, 262, 1)
    setfield(tif, 284, 1)
    setfield(tif, 278, rows_per_strip or h)
    if predictor != 1:
        setfield(tif, 317, predictor)
    if data.dtype.kind == "f":
        setfield(tif, 339, 3)
    elif data.dtype.itemsize > 1:
        setfield(tif, 339, 1)
    for r in range(h):
        buf = np.ascontiguousarray(data[r]).tobytes()
        assert lt.TIFFWriteScanline(tif, buf, r, 0) == 1, f"row {r} of {path}"
    lt.TIFFClose(tif)


# name -> (draw recipe, libtiff params); draws MUST match the tests
def _specs():
    lzw = np.random.default_rng(0).integers(0, 256, (4, 8192), np.uint8)
    r2 = np.random.default_rng(2)
    r2.integers(0, 256, (4, 6000), np.uint8)   # session draw order kept:
    r2.integers(0, 256, (4, 6000), np.uint8)   # two u8 probes preceded u16
    lzw_u16 = r2.integers(0, 65536, (4, 3000)).astype(np.uint16)
    def_u16 = r2.integers(0, 65536, (4, 3000)).astype(np.uint16)
    r5 = np.random.default_rng(5)
    r5.uniform(-10, 10, (5, 700))              # f32 single-band probe draw
    fp32x3 = r5.uniform(-10, 10, (5, 300, 3)).astype(np.float32)
    fp64 = r5.uniform(-10, 10, (4, 200)).astype(np.float64)
    big = np.random.default_rng(6).integers(0, 65536, (6, 500, 2)).astype(np.uint16)
    return [
        ("libtiff_lzw.tif", lzw, dict(comp=5, spp=1)),
        ("libtiff_lzw_pred2_u16.tif", lzw_u16, dict(comp=5, spp=1, predictor=2)),
        ("libtiff_deflate_pred2_u16.tif", def_u16, dict(comp=8, spp=1, predictor=2)),
        ("libtiff_fp_pred3_f32x3.tif", fp32x3.reshape(5, 900),
         dict(comp=8, spp=3, predictor=3)),
        ("libtiff_fp_pred3_f64.tif", fp64, dict(comp=8, spp=1, predictor=3)),
        ("libtiff_bigtiff_pred2_u16x2.tif", big.reshape(6, 1000),
         dict(comp=8, spp=2, predictor=2, rows_per_strip=3, big=True)),
    ]


def main() -> int:
    DATA.mkdir(parents=True, exist_ok=True)
    for name, data, kw in _specs():
        write_one(DATA / name, data, **kw)
        print(f"wrote {DATA / name}")
    # verify every fixture decodes bit-exactly through the repo codec
    sys.path.insert(0, str(REPO))
    from multimodal_siamese_cd_tpu import geotiff

    for name, data, kw in _specs():
        back, _ = geotiff.imread(DATA / name)
        want = data.reshape(data.shape[0], -1, kw["spp"])
        assert np.array_equal(back, want.astype(back.dtype)), name
        print(f"verified {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
