#!/usr/bin/env python
"""Differential fuzz of the in-repo GeoTIFF codec against libtiff.so.6.

Randomized two-direction interop campaign (the LZW early-change lesson:
self-roundtrip tests of a codec pair prove nothing about interoperability —
only a foreign implementation's bytes do, see geotiff.py history):

  A. libtiff WRITES a random layout drawn from the full parameter lattice
     (dtype x compression x predictor x planar x strips/tiles x endianness
     x classic/BigTIFF) -> this repo's ``geotiff.imread`` must decode
     bit-identically to libtiff's OWN read-back of the same file.
  B. this repo's ``geotiff.imwrite`` writes (its strips/chunky/LE
     envelope, random strip heights) -> libtiff scanline reads must
     reproduce the original array.

Direction A's oracle is libtiff's READER, not the original array, because
libtiff's writer is not always self-consistent: a big-endian file with the
floating-point predictor (3) is UNRECOVERABLE — libtiff's encoder swabs
samples before the byte-plane split while its decoder (and so GDAL) never
swabs after reassembly, so even libtiff reads back garbage (campaign find,
2026-08-18; see geotiff._undo_fp_predictor notes). The interop contract
worth pinning is "decode exactly like libtiff decodes".

Any mismatch/exception dumps the offending file + spec into --keep-dir and
counts as a failure. Exits non-zero on any failure.

    python tools/difffuzz_geotiff.py --n 500 --seed 0

A bounded deterministic slice runs in the suite
(tests/test_geotiff_foreign.py::test_differential_fuzz_vs_libtiff).
"""
from __future__ import annotations

import argparse
import ctypes
import json
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_siamese_cd_tpu import geotiff  # noqa: E402

TAG = dict(width=256, length=257, bits=258, comp=259, photo=262, spp=277,
           rps=278, planar=284, predictor=317, tilew=322, tilel=323,
           sfmt=339)
COMP = dict(none=1, lzw=5, deflate=8, packbits=32773)
SFMT = {"u": 1, "i": 2, "f": 3}


class LibTiff:
    """Minimal ctypes surface over libtiff.so.6 (write + scanline read)."""

    def __init__(self) -> None:
        lt = ctypes.CDLL("libtiff.so.6")
        lt.TIFFOpen.restype = ctypes.c_void_p
        lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        for fn in ("TIFFWriteScanline", "TIFFReadScanline"):
            getattr(lt, fn).argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_uint32, ctypes.c_uint16]
            getattr(lt, fn).restype = ctypes.c_int
        for fn in ("TIFFWriteTile", "TIFFReadTile"):
            getattr(lt, fn).argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_uint32, ctypes.c_uint32,
                                        ctypes.c_uint32, ctypes.c_uint16]
            getattr(lt, fn).restype = ctypes.c_int32
        lt.TIFFClose.argtypes = [ctypes.c_void_p]
        # spp>3 without ExtraSamples etc. warn loudly; the layouts are
        # deliberate, so route warnings to /dev/null
        lt.TIFFSetWarningHandler.restype = ctypes.c_void_p
        lt.TIFFSetWarningHandler.argtypes = [ctypes.c_void_p]
        lt.TIFFSetWarningHandler(None)
        self.lt = lt

    def _set(self, tif, tag: int, val: int) -> None:
        f = self.lt.TIFFSetField
        f.restype = ctypes.c_int
        f.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_int]
        if f(tif, tag, val) != 1:
            raise RuntimeError(f"TIFFSetField({tag}, {val}) failed")

    def write(self, path: Path, arr: np.ndarray, spec: dict) -> None:
        """Write (H, W, C) ``arr`` in the layout described by ``spec``."""
        h, w, c = arr.shape
        arr = np.ascontiguousarray(arr)
        tif = self.lt.TIFFOpen(str(path).encode(), spec["mode"].encode())
        if not tif:
            raise RuntimeError(f"TIFFOpen({spec['mode']}) failed")
        try:
            self._set(tif, TAG["width"], w)
            self._set(tif, TAG["length"], h)
            self._set(tif, TAG["bits"], arr.dtype.itemsize * 8)
            self._set(tif, TAG["spp"], c)
            self._set(tif, TAG["photo"], 1)
            self._set(tif, TAG["sfmt"], SFMT[arr.dtype.kind])
            self._set(tif, TAG["planar"], spec["planar"])
            self._set(tif, TAG["comp"], COMP[spec["comp"]])
            if spec["predictor"] != 1:
                self._set(tif, TAG["predictor"], spec["predictor"])
            if spec["tile"]:
                tw, th = spec["tile"]
                self._set(tif, TAG["tilew"], tw)
                self._set(tif, TAG["tilel"], th)
                pad_h, pad_w = -h % th, -w % tw
                padded = np.pad(arr, ((0, pad_h), (0, pad_w), (0, 0)))
                for s in range(c if spec["planar"] == 2 else 1):
                    for y in range(0, h, th):
                        for x in range(0, w, tw):
                            block = padded[y:y + th, x:x + tw]
                            buf = (np.ascontiguousarray(block[:, :, s])
                                   if spec["planar"] == 2 else
                                   np.ascontiguousarray(block)).tobytes()
                            if self.lt.TIFFWriteTile(
                                    tif, buf, x, y, 0, s) < 0:
                                raise RuntimeError(
                                    f"TIFFWriteTile({x},{y},{s}) failed")
            else:
                self._set(tif, TAG["rps"], spec["rps"])
                if spec["planar"] == 2:
                    for s in range(c):
                        for r in range(h):
                            buf = np.ascontiguousarray(arr[r, :, s]).tobytes()
                            if self.lt.TIFFWriteScanline(tif, buf, r, s) != 1:
                                raise RuntimeError(
                                    f"TIFFWriteScanline({r},{s}) failed")
                else:
                    for r in range(h):
                        buf = np.ascontiguousarray(arr[r]).tobytes()
                        if self.lt.TIFFWriteScanline(tif, buf, r, 0) != 1:
                            raise RuntimeError(
                                f"TIFFWriteScanline({r}) failed")
        finally:
            self.lt.TIFFClose(tif)

    def read_scanlines(self, path: Path, h: int, w: int, c: int,
                       dtype: np.dtype) -> np.ndarray:
        """Scanline-read a chunky strip-organized file back as (H, W, C)."""
        return self.read(path, h, w, c, dtype, planar=1, tile=None)

    def read(self, path: Path, h: int, w: int, c: int, dtype: np.dtype,
             planar: int = 1, tile: tuple[int, int] | None = None
             ) -> np.ndarray:
        """Read any layout this fuzzer writes back as native (H, W, C) —
        the direction-A oracle (libtiff's reader semantics)."""
        tif = self.lt.TIFFOpen(str(path).encode(), b"r")
        if not tif:
            raise RuntimeError("TIFFOpen(r) failed")
        try:
            out = np.empty((h, w, c), dtype)
            samples = range(c) if planar == 2 else (0,)
            spb = 1 if planar == 2 else c  # samples per block
            if tile is not None:
                tw, th = tile
                buf = ctypes.create_string_buffer(
                    th * tw * spb * dtype.itemsize)
                for s in samples:
                    for y in range(0, h, th):
                        for x in range(0, w, tw):
                            if self.lt.TIFFReadTile(tif, buf, x, y, 0, s) < 0:
                                raise RuntimeError(
                                    f"TIFFReadTile({x},{y},{s}) failed")
                            block = np.frombuffer(
                                buf.raw, dtype).reshape(th, tw, spb)
                            rows = min(th, h - y)
                            cols = min(tw, w - x)
                            dst = out[y:y + rows, x:x + cols]
                            if planar == 2:
                                dst[:, :, s] = block[:rows, :cols, 0]
                            else:
                                dst[:] = block[:rows, :cols]
            else:
                buf = ctypes.create_string_buffer(w * spb * dtype.itemsize)
                for s in samples:
                    for r in range(h):
                        if self.lt.TIFFReadScanline(tif, buf, r, s) != 1:
                            raise RuntimeError(
                                f"TIFFReadScanline({r},{s}) failed")
                        row = np.frombuffer(buf.raw, dtype).reshape(w, spb)
                        if planar == 2:
                            out[r, :, s] = row[:, 0]
                        else:
                            out[r] = row
            return out
        finally:
            self.lt.TIFFClose(tif)


def random_spec(rng: np.random.Generator) -> dict:
    """One point in the libtiff-writable layout lattice our reader claims."""
    kind = rng.choice(["u1", "u2", "u4", "i1", "i2", "i4", "f4", "f8"])
    dtype = np.dtype(kind[0] + kind[1])
    comp = str(rng.choice(["none", "lzw", "deflate", "packbits"]))
    predictor = 1
    if comp in ("lzw", "deflate"):
        if dtype.kind == "f":
            predictor = int(rng.choice([1, 3]))
        else:
            predictor = int(rng.choice([1, 2]))
    h = int(rng.integers(1, 70))
    w = int(rng.integers(1, 70))
    c = int(rng.integers(1, 6))
    tile = None
    if rng.random() < 0.4:
        tile = (int(rng.choice([16, 32, 48])), int(rng.choice([16, 32])))
    mode = str(rng.choice(["wl", "wb", "w8", "wb8"]))
    return dict(dtype=dtype.str, shape=(h, w, c), comp=comp,
                predictor=predictor, planar=int(rng.choice([1, 2])),
                tile=tile, rps=int(rng.integers(1, h + 4)), mode=mode)


def random_array(rng: np.random.Generator, spec: dict) -> np.ndarray:
    dtype = np.dtype(spec["dtype"])
    shape = tuple(spec["shape"])
    if dtype.kind == "f":
        # scale exercises all byte planes of the fp predictor
        return (rng.uniform(-1e4, 1e4, shape).astype(dtype))
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, shape, dtype=dtype,
                        endpoint=True)


def _native_bytes(a: np.ndarray) -> bytes:
    """Bit pattern in little-endian layout (byteswap preserves NaN bits,
    unlike astype value conversion)."""
    a = np.ascontiguousarray(a)
    if a.dtype.byteorder == ">":
        a = a.byteswap()
    return a.tobytes()


def run_case_a(lt: LibTiff, rng: np.random.Generator, tmp: Path) -> dict:
    """libtiff writes -> our reader must bit-match libtiff's own read-back
    (see module docstring for why the original array is not the oracle)."""
    spec = random_spec(rng)
    arr = random_array(rng, spec)
    f = tmp / "a.tif"
    lt.write(f, arr, spec)
    got, _ = geotiff.imread(f)
    want = lt.read(f, *arr.shape, np.dtype(spec["dtype"]),
                   planar=spec["planar"], tile=spec["tile"])
    ok = (got.shape == want.shape
          and _native_bytes(got) == _native_bytes(want))
    return dict(direction="A", spec=spec, ok=bool(ok), file=f)


def run_case_b(lt: LibTiff, rng: np.random.Generator, tmp: Path) -> dict:
    """our writer -> libtiff scanline read must bit-match."""
    kind = str(rng.choice(["u1", "u2", "u4", "i2", "i4", "f4", "f8"]))
    dtype = np.dtype(kind[0] + kind[1])
    h, w = int(rng.integers(1, 70)), int(rng.integers(1, 70))
    c = int(rng.integers(1, 6))
    spec = dict(dtype=dtype.str, shape=(h, w, c),
                comp=str(rng.choice(["none", "deflate"])),
                rps=int(rng.integers(1, h + 4)))
    arr = random_array(rng, spec)
    f = tmp / "b.tif"
    geotiff.imwrite(f, arr, compression=spec["comp"],
                    rows_per_strip=spec["rps"])
    got = lt.read_scanlines(f, h, w, c, dtype)
    return dict(direction="B", spec=spec,
                ok=bool(np.array_equal(got, arr)), file=f)


def run_campaign(n: int, seed: int, keep_dir: Path | None = None,
                 verbose: bool = True, use_native: bool = True) -> list[dict]:
    """Run ``n`` random cases; returns the list of failure records.

    ``use_native=False`` disables the C decode kernels for the campaign so
    the pure-Python LZW/PackBits fallbacks face the same foreign bytes —
    they are an independent code path, not a wrapper over the C one."""
    lt = LibTiff()
    rng = np.random.default_rng(seed)
    failures = []
    saved_native = geotiff._fastcodecs
    if not use_native:
        geotiff._fastcodecs = None
    try:
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            failures.extend(_run_cases(lt, rng, tmp, n, seed, keep_dir,
                                       verbose))
    finally:
        geotiff._fastcodecs = saved_native
    return failures


def _run_cases(lt: LibTiff, rng: np.random.Generator, tmp: Path, n: int,
               seed: int, keep_dir: Path | None, verbose: bool) -> list[dict]:
    failures = []
    for i in range(n):
        case = run_case_b if rng.random() < 0.3 else run_case_a
        name = "a.tif" if case is run_case_a else "b.tif"
        # a case that raises before (re)writing its file must not point the
        # failure record at the PREVIOUS case's leftover bytes
        (tmp / name).unlink(missing_ok=True)
        try:
            res = case(lt, rng, tmp)
        except Exception as e:  # decoder/writer crash == failure too
            res = dict(direction=case.__name__[-1].upper(),
                       spec="exception", ok=False,
                       error=f"{type(e).__name__}: {e}",
                       file=tmp / name)
        if not res["ok"]:
            rec = {k: v for k, v in res.items() if k != "file"}
            rec["case"] = i
            if keep_dir is not None:
                keep_dir.mkdir(parents=True, exist_ok=True)
                kept = keep_dir / f"fail_{seed}_{i}.tif"
                if Path(res["file"]).exists():
                    shutil.copy(res["file"], kept)
                    rec["kept"] = str(kept)
            failures.append(rec)
            if verbose:
                print(f"FAIL case {i}: {json.dumps(rec, default=str)}")
    return failures


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--n", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--keep-dir", type=Path, default=Path("/tmp/difffuzz_geotiff"))
    p.add_argument("--pure-python", action="store_true",
                   help="disable the C decode kernels: fuzz the pure-Python "
                        "LZW/PackBits fallbacks (an independent code path)")
    args = p.parse_args()
    failures = run_campaign(args.n, args.seed, args.keep_dir,
                            use_native=not args.pure_python)
    print(json.dumps({"cases": args.n, "seed": args.seed,
                      "native": not args.pure_python,
                      "failures": len(failures)}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
