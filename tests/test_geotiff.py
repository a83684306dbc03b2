"""GeoTIFF codec + geofiles API tests: write/read roundtrips across dtypes
and compressions, LZW/PackBits/predictor decode, georeferencing, mosaicking."""

import struct
import zlib
from pathlib import Path

import numpy as np
import pytest

from multimodal_siamese_cd_tpu import geofiles, geotiff
from multimodal_siamese_cd_tpu.geotiff import CRS, Affine


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.int32,
                                   np.float32, np.float64])
@pytest.mark.parametrize("compression", ["none", "deflate"])
def test_roundtrip_dtypes(tmp_path, dtype, compression):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        arr = rng.standard_normal((37, 23, 3)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, size=(37, 23, 3)).astype(dtype)
    f = tmp_path / "x.tif"
    geotiff.imwrite(f, arr, compression=compression)
    back, meta = geotiff.imread(f)
    np.testing.assert_array_equal(back, arr)
    assert meta["transform"] is None


def test_roundtrip_2d_and_bool(tmp_path):
    arr = (np.arange(64).reshape(8, 8) % 2).astype(bool)
    f = tmp_path / "b.tif"
    geotiff.imwrite(f, arr)
    back, _ = geotiff.imread(f)
    assert back.shape == (8, 8, 1)
    np.testing.assert_array_equal(back[:, :, 0], arr.astype(np.uint8))


def test_multi_strip_roundtrip(tmp_path):
    arr = np.arange(100 * 7 * 2, dtype=np.uint16).reshape(100, 7, 2)
    f = tmp_path / "s.tif"
    geotiff.imwrite(f, arr, rows_per_strip=9)
    back, _ = geotiff.imread(f)
    np.testing.assert_array_equal(back, arr)


def test_georeferencing_roundtrip(tmp_path):
    arr = np.zeros((5, 5), dtype=np.float32)
    t = Affine.from_origin(-122.5, 37.8, 0.001, 0.001)
    f = tmp_path / "geo.tif"
    geotiff.imwrite(f, arr, transform=t, crs="EPSG:4326")
    _, meta = geotiff.imread(f)
    assert meta["crs"] == CRS(4326)
    got = meta["transform"]
    assert tuple(got) == pytest.approx(tuple(t))
    # projected CRS path
    geotiff.imwrite(f, arr, transform=t, crs=32633)
    _, meta = geotiff.imread(f)
    assert meta["crs"] == CRS(32633)


def test_flipped_transform_roundtrip(tmp_path):
    """An axis-flipped (south-up) transform cannot be expressed as
    PixelScale+Tiepoint — the writer must route it through
    ModelTransformation instead of silently mirroring the georeferencing
    on read-back."""
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    f = tmp_path / "flip.tif"
    for t in (Affine(0.5, 0.0, 10.0, 0.0, 0.5, 20.0),    # e > 0 (south-up)
              Affine(-0.5, 0.0, 10.0, 0.0, -0.5, 20.0)):  # a < 0
        geotiff.imwrite(f, arr, transform=t, crs=4326)
        _, meta = geotiff.imread(f)
        assert tuple(meta["transform"]) == pytest.approx(tuple(t))


def test_writer_unsupported_compression_raises(tmp_path):
    arr = np.zeros((2, 2, 1), np.uint8)
    with pytest.raises(ValueError, match="lzw"):
        geotiff.imwrite(tmp_path / "x.tif", arr, compression="lzw")


def test_affine_unpacking_order():
    t = Affine(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    _, _, c, _, _, f, *_ = t
    assert (c, f) == (3.0, 6.0)  # upload_study_area.py:11 unpack pattern
    assert t * (0, 0) == (3.0, 6.0)


def test_big_endian_read(tmp_path):
    """Hand-assemble a minimal big-endian striped TIFF and read it."""
    h, w = 3, 4
    arr = np.arange(h * w, dtype=">u2").reshape(h, w)
    data = arr.tobytes()
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (277, 3, 1, 1), (278, 3, 1, h), (339, 3, 1, 1),
    ]
    data_offset = 8 + 2 + 12 * (len(entries) + 2) + 4
    entries += [(273, 4, 1, data_offset), (279, 4, 1, len(data))]
    entries.sort()
    buf = b"MM" + struct.pack(">HI", 42, 8) + struct.pack(">H", len(entries))
    for tag, typ, count, value in entries:
        fmt = ">HHI" + ("HH" if typ == 3 else "I")
        vals = (tag, typ, count) + ((value, 0) if typ == 3 else (value,))
        buf += struct.pack(fmt, *vals)
    buf += struct.pack(">I", 0) + data
    f = tmp_path / "be.tif"
    f.write_bytes(buf)
    back, _ = geotiff.imread(f)
    np.testing.assert_array_equal(back[:, :, 0], arr.astype(np.uint16))


def _write_with_compression(tmp_path, payload_rows, comp_code, compressed):
    """Minimal little-endian single-strip uint8 TIFF with given compression."""
    h, w = len(payload_rows), len(payload_rows[0])
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, comp_code),
        (262, 3, 1, 1), (277, 3, 1, 1), (278, 3, 1, h), (317, 3, 1, 1),
    ]
    data_offset = 8 + 2 + 12 * (len(entries) + 2) + 4
    entries += [(273, 4, 1, data_offset), (279, 4, 1, len(compressed))]
    entries.sort()
    buf = b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        fmt = "<HHI" + ("HH" if typ == 3 else "I")
        vals = (tag, typ, count) + ((value, 0) if typ == 3 else (value,))
        buf += struct.pack(fmt, *vals)
    buf += struct.pack("<I", 0) + compressed
    f = tmp_path / "c.tif"
    f.write_bytes(buf)
    return f


def test_packbits_read(tmp_path):
    rows = [[5] * 10 + [1, 2, 3]]
    raw = bytes(rows[0])
    # PackBits: run of 10 fives, then 3 literals
    compressed = bytes([257 - 10, 5, 2, 1, 2, 3])
    f = _write_with_compression(tmp_path, rows, 32773, compressed)
    back, _ = geotiff.imread(f)
    np.testing.assert_array_equal(back[0, :, 0], np.frombuffer(raw, np.uint8))


def _lzw_encode_reference(data: bytes) -> bytes:
    """Tiny TIFF-LZW encoder (test-only) to exercise the decoder."""
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    nbits = 9
    out_bits = []

    def emit(code, n):
        out_bits.extend(((code >> (n - 1 - k)) & 1) for k in range(n))

    emit(CLEAR, nbits)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w = w + c
        else:
            emit(table[w], nbits)
            table[w + c] = next_code
            next_code += 1
            if next_code >= 4094:  # spec: reset before codes overflow 12 bits
                emit(CLEAR, nbits)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                nbits = 9
            # TIFF early change, encoder side: the DECODER's table lags one
            # entry and widens at 511/1023/2047, so the encoder must write
            # wider from its 512th/1024th/2048th entry on (libtiff-pinned:
            # a stream encoded here decodes bit-exactly via libtiff.so.6)
            elif next_code == (1 << nbits) and nbits < 12:
                nbits += 1
            w = c
    if w:
        emit(table[w], nbits)
    emit(EOI, nbits)
    while len(out_bits) % 8:
        out_bits.append(0)
    return bytes(
        int("".join(map(str, out_bits[i:i + 8])), 2) for i in range(0, len(out_bits), 8)
    )


def test_lzw_read(tmp_path):
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 8, size=200, dtype=np.uint8).tobytes()
    compressed = _lzw_encode_reference(raw)
    f = _write_with_compression(tmp_path, [list(raw)], 5, compressed)
    back, _ = geotiff.imread(f)
    np.testing.assert_array_equal(back[0, :, 0], np.frombuffer(raw, np.uint8))


def test_lzw_read_libtiff_fixture():
    """Decode a GENUINE libtiff-written LZW TIFF (tests/data/libtiff_lzw.tif:
    4x8192 random bytes, one strip — crosses every code-width boundary
    (511/1023/2047) AND the 4094-entry CLEAR reset). Round 3 found that both
    shipped decoders widened the code width one code early: the self-
    round-trip suite passed (the test encoder mirrored the bug at sizes
    that never crossed a boundary) while every real libtiff/GDAL LZW file
    raised 'Corrupt LZW stream'. This fixture pins interop with the real
    world, independent of the in-repo encoder."""
    f = Path(__file__).parent / "data" / "libtiff_lzw.tif"
    back, _ = geotiff.imread(f)
    want = np.random.default_rng(0).integers(0, 256, size=(4, 8192),
                                             dtype=np.uint8)
    np.testing.assert_array_equal(back[:, :, 0], want)


@pytest.mark.parametrize("name", ["libtiff_lzw_pred2_u16.tif",
                                  "libtiff_deflate_pred2_u16.tif"])
def test_libtiff_predictor2_u16_fixtures(name):
    """libtiff-written predictor-2 16-bit fixtures (4x3000 random u16, one
    strip): predictor differencing is per-SAMPLE, and 16-bit samples are
    where a per-byte implementation would silently corrupt — pin the
    decode against real libtiff bytes (generated via ctypes libtiff.so.6,
    same session that pinned the LZW early-change rule)."""
    f = Path(__file__).parent / "data" / name
    back, _ = geotiff.imread(f)
    want = np.random.default_rng(2)  # same stream the generator drew from
    want.integers(0, 256, (4, 6000), np.uint8)   # lzw_pred2_u8 draw
    want.integers(0, 256, (4, 6000), np.uint8)   # def_pred2_u8 draw
    lzw_u16 = want.integers(0, 65536, (4, 3000)).astype(np.uint16)
    def_u16 = want.integers(0, 65536, (4, 3000)).astype(np.uint16)
    expect = lzw_u16 if "lzw" in name else def_u16
    np.testing.assert_array_equal(back[:, :, 0], expect)


@pytest.mark.parametrize("name,shape,dt", [
    ("libtiff_fp_pred3_f32x3.tif", (5, 300, 3), np.float32),
    ("libtiff_fp_pred3_f64.tif", (4, 200, 1), np.float64),
])
def test_libtiff_fp_predictor3_fixtures(name, shape, dt):
    """libtiff-written FLOATING-POINT predictor (3) fixtures: byte-plane
    transposition + byte-wise differencing, deflate-compressed — the
    layout GDAL emits for float rasters with PREDICTOR=3. Decoded values
    must be bit-exact vs the generator's draw."""
    f = Path(__file__).parent / "data" / name
    back, _ = geotiff.imread(f)
    rng = np.random.default_rng(5)
    f1 = rng.uniform(-10, 10, size=(5, 700)).astype(np.float32)
    f3 = rng.uniform(-10, 10, size=(5, 300, 3)).astype(np.float32)
    f64 = rng.uniform(-10, 10, size=(4, 200)).astype(np.float64)
    del f1
    want = f3 if "f32" in name else f64[:, :, None]
    assert back.shape == shape and back.dtype == dt
    np.testing.assert_array_equal(back, want)


def test_libtiff_bigtiff_fixture():
    """libtiff-written ("w8") BigTIFF: u64 IFD layout, 20-byte entries,
    predictor-2 deflate u16x2 in 3-row strips — what GDAL emits with
    BIGTIFF=YES / for rasters beyond 4 GiB."""
    f = Path(__file__).parent / "data" / "libtiff_bigtiff_pred2_u16x2.tif"
    back, _ = geotiff.imread(f)
    want = np.random.default_rng(6).integers(
        0, 65536, size=(6, 500, 2)).astype(np.uint16)
    np.testing.assert_array_equal(back, want)


def test_lzw_roundtrip_across_width_boundaries(tmp_path):
    """40 KB of incompressible data through the libtiff-pinned test encoder
    and BOTH decoders: crosses 9->10->11->12 bits and the CLEAR reset.
    (The old 200-byte fixture never left 9-bit codes, which is how the
    early-change off-by-one survived.)"""
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=40000, dtype=np.uint8).tobytes()
    enc = _lzw_encode_reference(raw)
    assert geotiff._lzw_decode_py(enc) == raw
    if geotiff._fastcodecs is not None:
        assert geotiff._fastcodecs.lzw_decode(enc, 0) == raw


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_writer_output_decodes_via_libtiff(tmp_path, dtype):
    """Foreign-implementation pin for the WRITER: real libtiff must decode
    imwrite's striped deflate output bit-exactly (the reference stack
    reads rasters through GDAL/libtiff, so our written tifs must be
    readable there). Skipped when libtiff is not on the system."""
    import ctypes

    try:
        lt = ctypes.CDLL("libtiff.so.6")
    except OSError:
        pytest.skip("libtiff not available")
    lt.TIFFOpen.restype = ctypes.c_void_p
    lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lt.TIFFReadScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_uint32, ctypes.c_uint16]
    lt.TIFFClose.argtypes = [ctypes.c_void_p]

    rng = np.random.default_rng(4)
    if dtype is np.float32:
        arr = rng.uniform(0, 1, size=(9, 31, 3)).astype(np.float32)
    else:
        arr = rng.integers(0, np.iinfo(dtype).max + 1,
                           size=(9, 31, 3)).astype(dtype)
    f = tmp_path / "w.tif"
    geotiff.imwrite(f, arr, compression="deflate")

    tif = lt.TIFFOpen(str(f).encode(), b"r")
    assert tif, "libtiff refused to open our file"
    row_bytes = 31 * 3 * arr.dtype.itemsize
    buf = ctypes.create_string_buffer(row_bytes)
    rows = []
    for r in range(9):
        assert lt.TIFFReadScanline(tif, buf, r, 0) == 1, f"row {r}"
        rows.append(np.frombuffer(buf.raw, arr.dtype).reshape(31, 3).copy())
    lt.TIFFClose(tif)
    np.testing.assert_array_equal(np.stack(rows), arr)


def test_predictor2_deflate_read(tmp_path):
    vals = np.array([10, 12, 11, 11, 15], dtype=np.uint8)
    diffs = np.diff(vals, prepend=vals[:1].astype(np.int16)).astype(np.uint8)
    diffs[0] = vals[0]
    compressed = zlib.compress(diffs.tobytes())
    entries_file = _write_with_compression(tmp_path, [list(vals)], 8, compressed)
    # patch predictor tag from 1 -> 2
    raw = bytearray(entries_file.read_bytes())
    idx = raw.find(struct.pack("<HHI", 317, 3, 1))
    raw[idx + 8:idx + 10] = struct.pack("<H", 2)
    entries_file.write_bytes(bytes(raw))
    back, _ = geotiff.imread(entries_file)
    np.testing.assert_array_equal(back[0, :, 0], vals)


def test_not_a_tiff(tmp_path):
    f = tmp_path / "nope.tif"
    f.write_bytes(b"PNG whatever")
    with pytest.raises(ValueError, match="byte order"):
        geotiff.imread(f)


# --- geofiles API ------------------------------------------------------------

def test_read_tif_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        geofiles.read_tif(tmp_path / "missing.tif")


def test_read_write_tif_roundtrip(tmp_path):
    arr = np.random.default_rng(1).uniform(size=(16, 16, 3)).astype(np.float32)
    t = Affine.from_origin(10, 50, 0.01, 0.01)
    f = tmp_path / "sub" / "x.tif"
    geofiles.write_tif(f, arr, t, "EPSG:4326")
    back, transform, crs = geofiles.read_tif(f)
    np.testing.assert_array_equal(back, arr)
    assert str(crs) == "EPSG:4326"
    assert tuple(transform) == pytest.approx(tuple(t))


def test_patch_helpers():
    from pathlib import Path

    f = Path("pred_aoi_0000000512-0000000256.tif")
    assert geofiles.get_coords(f) == [512, 256]
    assert geofiles.basename_from_file(f) == "pred_aoi"
    assert geofiles.id2yx("512-256") == (512, 256)


def test_combine_tif_patches(tmp_path):
    t = Affine.from_origin(0, 0, 1, 1)
    full = np.arange(8 * 8, dtype=np.int8).reshape(8, 8, 1)
    for i in (0, 4):
        for j in (0, 4):
            geofiles.write_tif(tmp_path / f"mosaic_{i:010d}-{j:010d}.tif",
                               full[i:i + 4, j:j + 4], t, "EPSG:4326")
    geofiles.combine_tif_patches(tmp_path, "mosaic")
    back, _, _ = geofiles.read_tif(tmp_path / "mosaic.tif")
    np.testing.assert_array_equal(back, full)


def test_json_roundtrip(tmp_path):
    data = {"a": [1, 2], "b": {"c": "x"}}
    f = tmp_path / "m.json"
    geofiles.write_json(f, data)
    assert geofiles.load_json(f) == data
    # corrupt JSON errors must NAME the file (a bare JSONDecodeError gives
    # a position but no hint which metadata file to fix)
    f.write_text("{broken")
    with pytest.raises(ValueError, match="m.json"):
        geofiles.load_json(f)


# --- synthetic fixture --------------------------------------------------------

def test_fixture_dataset(fixture_dataset):
    from multimodal_siamese_cd_tpu.data import synthetic

    meta = geofiles.load_json(fixture_dataset / "metadata.json")
    assert set(meta) == set(synthetic.TRAIN_AOIS + synthetic.VAL_AOIS +
                            synthetic.TEST_AOIS + synthetic.UNLABELED_AOIS)
    aoi = synthetic.TRAIN_AOIS[0]
    ts0 = meta[aoi][0]
    s1, transform, crs = geofiles.read_tif(
        fixture_dataset / aoi / "s1" / f"s1_{aoi}_{ts0['year']}_{ts0['month']:02d}.tif")
    assert s1.shape[2] == synthetic.N_S1_BANDS
    assert np.isnan(s1).any()  # NaN payload for nan_to_num coverage
    bld, _, _ = geofiles.read_tif(
        fixture_dataset / aoi / "buildings" /
        f"buildings_{aoi}_{ts0['year']}_{ts0['month']:02d}.tif")
    assert set(np.unique(bld)) <= {0, 1}
    # unlabeled AOIs have no buildings dir
    unl = synthetic.UNLABELED_AOIS[0]
    assert not (fixture_dataset / unl / "buildings").exists()
    assert meta[unl][0]["buildings"] is False
    # change exists between first and last timestamp
    last = meta[aoi][-1]
    bld2, _, _ = geofiles.read_tif(
        fixture_dataset / aoi / "buildings" /
        f"buildings_{aoi}_{last['year']}_{last['month']:02d}.tif")
    change = np.logical_and(bld == 0, bld2 == 1)
    assert change.sum() > 0


def test_native_codecs_match_python():
    """When the optional C extension is built, its LZW/PackBits decoders must
    be byte-identical to the pure-Python fallbacks on random payloads."""
    try:
        from multimodal_siamese_cd_tpu import _fastcodecs
    except ImportError:
        pytest.skip("native extension not built")
    rng = np.random.default_rng(0)
    for size in (0, 1, 17, 5000, 200000):
        raw = rng.integers(0, 12, size=size, dtype=np.uint8).tobytes()
        compressed = _lzw_encode_reference(raw)
        assert _fastcodecs.lzw_decode(compressed) == \
            geotiff._lzw_decode_py(compressed) == raw
    # packbits: runs + literals
    payload = bytes([257 - 30, 9, 4, 1, 2, 3, 4, 5, 128, 257 - 2, 0])
    assert _fastcodecs.packbits_decode(payload) == \
        geotiff._packbits_decode_py(payload)
