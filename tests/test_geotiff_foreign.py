"""GeoTIFF codec hardening: foreign (GDAL-typical) layouts and corrupt files.

The reference reads rasters through rasterio/GDAL, which accepts anything
(reference utils/geofiles.py:8-17). Real SpaceNet7/Sentinel tiles are
GDAL-written: tiled, planar-separate, predictor-on-deflate/LZW, sometimes
sparse (SPARSE_OK=TRUE blocks with offset 0). This suite forges those
layouts byte-by-byte with an independent writer and checks the in-repo
codec decodes them exactly — and that structurally corrupt input
(truncation, offsets beyond EOF, forged headers, codec bitstream garbage,
decompression bombs) fails with a clean ValueError/NotImplementedError,
never an IndexError/struct.error/hang (fuzzed below).
"""

import struct
import zlib

import numpy as np
import pytest

from multimodal_siamese_cd_tpu import geotiff

from test_geotiff import _lzw_encode_reference


# ---------------------------------------------------------------------------
# An independent TIFF forger (deliberately NOT the repo writer) able to emit
# the GDAL layout space: strips/tiles x chunky/planar x compression x
# predictor x endianness x sparse blocks.
# ---------------------------------------------------------------------------

def _packbits_encode(data: bytes) -> bytes:
    """Literal-only PackBits (valid, if not maximally compact)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i:i + 128]
        out += bytes([len(chunk) - 1]) + chunk
    return bytes(out)


def _compress_block(raw: bytes, compression: int) -> bytes:
    if compression == 1:
        return raw
    if compression == 5:
        return _lzw_encode_reference(raw)
    if compression in (8, 32946):
        return zlib.compress(raw)
    if compression == 32773:
        return _packbits_encode(raw)
    raise AssertionError(compression)


def _apply_predictor2(block: np.ndarray) -> np.ndarray:
    """Horizontal differencing over a (rows, cols, samples) block."""
    out = block.copy()
    out[:, 1:] = block[:, 1:] - block[:, :-1]
    return out


def _apply_predictor3_bytes(block: np.ndarray) -> bytes:
    """Floating-point predictor (3) encode over a (rows, cols, samples)
    float block: per row, MSB..LSB byte planes, then byte-wise horizontal
    differencing at the sample stride (inverse of the decoder; layout per
    libtiff tif_predict.c)."""
    rows, cols, spp = block.shape
    item = block.dtype.itemsize
    le = np.ascontiguousarray(block.astype(block.dtype.newbyteorder("<")))
    byts = np.frombuffer(le.tobytes(), np.uint8).reshape(rows, cols * spp, item)
    planes = np.transpose(byts[:, :, ::-1], (0, 2, 1))  # MSB-first planes
    flat = planes.reshape(rows, item * cols * spp)
    g = flat.reshape(rows, flat.shape[1] // spp, spp).astype(np.int16)
    d = np.diff(g, axis=1, prepend=g[:, :1]).astype(np.uint8)
    d[:, 0] = g[:, 0].astype(np.uint8)
    return d.reshape(rows, flat.shape[1]).tobytes()


def forge_tiff(path, arr, *, order="<", tiled=False, tile=(16, 16),
               rows_per_strip=None, planar=1, compression=1, predictor=1,
               sparse_blocks=(), extra_entries=(), override_entries=(),
               magic=42, big=False,
               drop_blocks=0, pad_last_strip=False):
    """Write ``arr`` (H, W, C) as a TIFF in an arbitrary GDAL-style layout."""
    arr = np.asarray(arr)
    h, w, c = arr.shape
    dt = arr.dtype.newbyteorder(order)

    # carve blocks: list of (rows, cols, samples) arrays, plane-major when
    # planar == 2 (all blocks of sample 0, then sample 1, ...)
    blocks = []
    planes = [arr[:, :, [p]] for p in range(c)] if planar == 2 else [arr]
    for plane in planes:
        if tiled:
            th, tw = tile
            for ti in range(-(-h // th)):
                for tj in range(-(-w // tw)):
                    full = np.zeros((th, tw, plane.shape[2]), arr.dtype)
                    part = plane[ti * th:ti * th + th, tj * tw:tj * tw + tw]
                    full[:part.shape[0], :part.shape[1]] = part
                    blocks.append(full)
        else:
            rps = rows_per_strip or h
            for s in range(-(-h // rps)):
                strip = plane[s * rps:(s + 1) * rps]
                if pad_last_strip and strip.shape[0] < rps:
                    # spec-legal writer variant: the final strip encoded at
                    # full RowsPerStrip (rows past the image edge undefined)
                    full = np.zeros((rps, *strip.shape[1:]), arr.dtype)
                    full[:strip.shape[0]] = strip
                    strip = full
                blocks.append(strip)

    payloads = []
    for b in blocks:
        if predictor == 3:
            raw = _apply_predictor3_bytes(b.astype(arr.dtype))
        else:
            if predictor == 2:
                b = _apply_predictor2(b.astype(arr.dtype))
            raw = b.astype(dt).tobytes()
        payloads.append(_compress_block(raw, compression))

    spp = c
    bits = arr.dtype.itemsize * 8
    fmt_code = {"u": 1, "i": 2, "f": 3}[arr.dtype.kind]

    entries = [
        (256, 4, [w]), (257, 4, [h]),
        (258, 3, [bits] * spp), (259, 3, [compression]), (262, 3, [1]),
        (277, 3, [spp]), (284, 3, [planar]), (339, 3, [fmt_code] * spp),
    ]
    if predictor != 1:
        entries.append((317, 3, [predictor]))
    if tiled:
        entries.append((322, 4, [tile[1]]))
        entries.append((323, 4, [tile[0]]))
        off_tag, cnt_tag = 324, 325
    else:
        entries.append((278, 4, [rows_per_strip or h]))
        off_tag, cnt_tag = 273, 279
    n_blocks = len(payloads) - drop_blocks
    entries.append((off_tag, 4, [0] * n_blocks))       # placeholder
    entries.append((cnt_tag, 4, [len(p) if i not in sparse_blocks else 0
                                 for i, p in enumerate(payloads[:n_blocks])]))
    entries.extend(extra_entries)
    for tag, typ, values in override_entries:
        entries = [e for e in entries if e[0] != tag]
        entries.append((tag, typ, list(values)))
    entries.sort(key=lambda e: e[0])

    type_size = {3: 2, 4: 4, 12: 8}
    type_fmt = {3: "H", 4: "I", 12: "d"}

    # BigTIFF layout: 16-byte header, u64 entry count, 20-byte entries
    # with 8-byte inline values, u64 overflow/next offsets
    header = 16 if big else 8
    ifd_size = (8 + 20 * len(entries) + 8) if big \
        else (2 + 12 * len(entries) + 4)
    inline_cap = 8 if big else 4
    pos = header + ifd_size
    # lay out overflow values
    locs = []
    for tag, typ, values in entries:
        total = type_size[typ] * len(values)
        if total <= inline_cap:
            locs.append(None)
        else:
            locs.append(pos)
            pos += total + (total & 1)
    data_start = pos
    offsets = []
    for i, p in enumerate(payloads[:n_blocks]):
        if i in sparse_blocks:
            offsets.append(0)
        else:
            offsets.append(pos)
            pos += len(p)
    for i, (tag, typ, values) in enumerate(entries):
        if tag == off_tag:
            entries[i] = (tag, typ, offsets)

    out = bytearray()
    bom = b"II" if order == "<" else b"MM"
    if big:
        out += bom + struct.pack(order + "HHHQ", 43, 8, 0, header)
        out += struct.pack(order + "Q", len(entries))
    else:
        out += bom + struct.pack(order + "HI", magic, header)
        out += struct.pack(order + "H", len(entries))
    for (tag, typ, values), loc in zip(entries, locs):
        if big:
            out += struct.pack(order + "HHQ", tag, typ, len(values))
        else:
            out += struct.pack(order + "HHI", tag, typ, len(values))
        if loc is None:
            inline = struct.pack(order + type_fmt[typ] * len(values), *values)
            out += inline.ljust(inline_cap, b"\0")
        else:
            out += struct.pack(order + ("Q" if big else "I"), loc)
    out += struct.pack(order + ("Q" if big else "I"), 0)
    for (tag, typ, values), loc in zip(entries, locs):
        if loc is not None:
            assert len(out) == loc, (tag, len(out), loc)
            data = struct.pack(order + type_fmt[typ] * len(values), *values)
            out += data + (b"\0" if len(data) & 1 else b"")
    assert len(out) == data_start
    for i, p in enumerate(payloads[:n_blocks]):
        if i not in sparse_blocks:
            out += p
    path.write_bytes(bytes(out))
    return path


def _demo_array(h=37, w=29, c=3, dtype=np.uint16, seed=0):
    rng = np.random.default_rng(seed)
    info = np.iinfo(dtype) if np.issubdtype(dtype, np.integer) else None
    if info:
        return rng.integers(0, min(info.max, 4000), (h, w, c)).astype(dtype)
    return rng.normal(size=(h, w, c)).astype(dtype)


# ---------------------------------------------------------------------------
# GDAL-typical layout matrix
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("planar", [1, 2])
@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
def test_layout_matrix_decodes_exactly(tmp_path, tiled, planar, compression):
    arr = _demo_array()
    f = forge_tiff(tmp_path / "t.tif", arr, tiled=tiled, planar=planar,
                   compression=compression,
                   rows_per_strip=None if tiled else 10)
    back, _ = geotiff.imread(f)
    np.testing.assert_array_equal(back, arr)


@pytest.mark.parametrize("compression", [5, 8])
@pytest.mark.parametrize("planar", [1, 2])
def test_predictor2_combinations(tmp_path, compression, planar):
    """GDAL's PREDICTOR=2 with LZW and deflate, chunky and separate."""
    arr = _demo_array(dtype=np.uint16)
    f = forge_tiff(tmp_path / "p.tif", arr, tiled=True, tile=(16, 16),
                   planar=planar, compression=compression, predictor=2)
    back, _ = geotiff.imread(f)
    np.testing.assert_array_equal(back, arr)


def test_big_endian_tiled_predictor2(tmp_path):
    arr = _demo_array(dtype=np.uint16)
    f = forge_tiff(tmp_path / "mm.tif", arr, order=">", tiled=True,
                   compression=8, predictor=2)
    back, _ = geotiff.imread(f)
    np.testing.assert_array_equal(back, arr)


def test_float32_strips_deflate(tmp_path):
    arr = _demo_array(dtype=np.float32)
    f = forge_tiff(tmp_path / "f.tif", arr, compression=8, rows_per_strip=7)
    back, _ = geotiff.imread(f)
    np.testing.assert_array_equal(back, arr)


@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
@pytest.mark.parametrize("planar", [1, 2])
def test_writer_padded_final_strip_decodes(tmp_path, compression, planar):
    """A final strip encoded at FULL RowsPerStrip (rows past the image edge
    undefined per spec — some writers pad rather than truncate; libtiff/GDAL
    read these by truncating) must decode exactly, not trip the
    decompression-bomb guard. Regression: the guard's cap used the
    image-clamped last-strip size, rejecting a 65-row deflate image whose
    64-row-strip writer padded the 1-row tail to 64 rows."""
    # dims chosen so the padded strip (64x1024 f32 = 256 KiB) exceeds the
    # old clamped cap (2*1-row + 64 KiB slack) — the regression must trip it
    arr = _demo_array(65, 1024, 2, dtype=np.float32)
    f = forge_tiff(tmp_path / "p.tif", arr, compression=compression,
                   planar=planar, rows_per_strip=64, pad_last_strip=True)
    back, _ = geotiff.imread(f)
    np.testing.assert_array_equal(back, arr)


@pytest.mark.parametrize("tiled", [False, True])
def test_sparse_blocks_read_as_zeros(tmp_path, tiled):
    """GDAL SPARSE_OK=TRUE: blocks with offset/count 0 are implicit zeros."""
    arr = _demo_array(48, 48, 1, dtype=np.uint8)
    f = forge_tiff(tmp_path / "s.tif", arr, tiled=tiled, tile=(16, 16),
                   rows_per_strip=16, compression=1, sparse_blocks={1, 2})
    back, _ = geotiff.imread(f)
    expect = arr.copy()
    if tiled:  # 3x3 tile grid, row-major: tiles 1,2 are top row cols 1,2
        expect[0:16, 16:32] = 0
        expect[0:16, 32:48] = 0
    else:      # strips 1,2 are rows 16..48
        expect[16:48] = 0
    np.testing.assert_array_equal(back, expect)


def test_unknown_tag_type_is_skipped(tmp_path):
    """libtiff semantics: an IFD entry with an unknown field type is ignored
    (GDAL writes vendor tags with exotic types)."""
    arr = _demo_array(8, 8, 1, dtype=np.uint8)
    f = forge_tiff(tmp_path / "u.tif", arr)
    raw = bytearray(f.read_bytes())
    # patch a harmless entry's type to an unknown code (13): tag 262
    n = struct.unpack_from("<H", raw, 8)[0]
    for i in range(n):
        tag, typ = struct.unpack_from("<HH", raw, 10 + 12 * i)
        if tag == 262:
            struct.pack_into("<H", raw, 10 + 12 * i + 2, 13)
    f.write_bytes(bytes(raw))
    back, _ = geotiff.imread(f)
    np.testing.assert_array_equal(back, arr)


# ---------------------------------------------------------------------------
# Loud, clean rejection
# ---------------------------------------------------------------------------

def test_corrupt_bigtiff_raises_valueerror(tmp_path):
    """BigTIFF is now decoded (libtiff-pinned fixture in test_geotiff.py);
    structurally corrupt BigTIFF must still fail with clean ValueErrors."""
    f = tmp_path / "big.tif"
    # valid header, empty IFD -> no dimensions
    f.write_bytes(b"II" + struct.pack("<HHHQ", 43, 8, 0, 16) + b"\0" * 64)
    with pytest.raises(ValueError, match="dimensions"):
        geotiff.imread(f)
    # wrong offset size
    f.write_bytes(b"II" + struct.pack("<HHHQ", 43, 4, 0, 16) + b"\0" * 64)
    with pytest.raises(ValueError, match="offset size"):
        geotiff.imread(f)
    # forged u64 entry count (would loop ~forever without the cap)
    f.write_bytes(b"II" + struct.pack("<HHHQ", 43, 8, 0, 16)
                  + struct.pack("<Q", 1 << 40) + b"\0" * 64)
    with pytest.raises(ValueError, match="entry count"):
        geotiff.imread(f)
    # IFD offset beyond EOF
    f.write_bytes(b"II" + struct.pack("<HHHQ", 43, 8, 0, 1 << 30))
    with pytest.raises(ValueError, match="out of bounds"):
        geotiff.imread(f)


def test_not_a_tiff(tmp_path):
    f = tmp_path / "x.tif"
    f.write_bytes(b"PNG\x00 not a tiff at all")
    with pytest.raises(ValueError, match="byte order"):
        geotiff.imread(f)


def test_truncated_file_raises_valueerror(tmp_path):
    arr = _demo_array(32, 32, 2, dtype=np.uint16)
    f = forge_tiff(tmp_path / "t.tif", arr, compression=8, rows_per_strip=8)
    whole = f.read_bytes()
    for frac in (0.05, 0.3, 0.6, 0.95):
        f.write_bytes(whole[:int(len(whole) * frac)])
        with pytest.raises(ValueError):
            geotiff.imread(f)


def test_block_offset_beyond_eof(tmp_path):
    arr = _demo_array(16, 16, 1, dtype=np.uint8)
    f = forge_tiff(tmp_path / "b.tif", arr, rows_per_strip=16)
    raw = bytearray(f.read_bytes())
    n = struct.unpack_from("<H", raw, 8)[0]
    for i in range(n):
        tag, typ, cnt = struct.unpack_from("<HHI", raw, 10 + 12 * i)
        if tag == 273:  # strip offset (inline, count 1)
            struct.pack_into("<I", raw, 10 + 12 * i + 8, 1 << 30)
    f.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="beyond end of file"):
        geotiff.imread(f)


def test_short_offset_table(tmp_path):
    arr = _demo_array(48, 16, 1, dtype=np.uint8)
    f = forge_tiff(tmp_path / "short.tif", arr, rows_per_strip=16,
                   drop_blocks=1)
    with pytest.raises(ValueError, match="offset table"):
        geotiff.imread(f)


def test_predictor3_on_integer_samples_rejected(tmp_path):
    """Predictor 3 is float-only per spec; on integer samples it means a
    corrupt/forged header, not a decodable layout (valid float predictor-3
    files are pinned by the libtiff fixtures in test_geotiff.py)."""
    arr = _demo_array(8, 8, 1, dtype=np.uint16)
    f = forge_tiff(tmp_path / "p3.tif", arr, predictor=3)
    with pytest.raises(ValueError, match="predictor 3"):
        geotiff.imread(f)


def test_heterogeneous_bits_rejected(tmp_path):
    """Per-channel bit depths differ: frombuffer with one dtype would
    silently interleave garbage — must reject loudly."""
    arr = _demo_array(8, 8, 2, dtype=np.uint8)
    f = forge_tiff(tmp_path / "hb.tif", arr,
                   override_entries=[(258, 3, [8, 16])])
    with pytest.raises(ValueError, match="BitsPerSample"):
        geotiff.imread(f)


def test_palette_photometric_rejected(tmp_path):
    """Palette-color files decode to colormap INDICES, not intensities —
    reject instead of serving wrong pixel values."""
    arr = _demo_array(8, 8, 1, dtype=np.uint8)
    f = forge_tiff(tmp_path / "pal.tif", arr,
                   override_entries=[(262, 3, [3])])
    with pytest.raises(ValueError, match="Photometric"):
        geotiff.imread(f)


def test_forged_huge_dimensions_rejected(tmp_path):
    """A ~200-byte file claiming a 140000^2 image as one sparse tile: the
    structural block-count check is satisfied (1 tile, 1 offset), so only
    an explicit plausibility cap turns the would-be multi-GiB allocation
    (OOM-kill under overcommit) into a clean ValueError."""
    arr = _demo_array(16, 16, 1, dtype=np.uint8)
    f = forge_tiff(tmp_path / "huge.tif", arr, tiled=True, tile=(16, 16),
                   sparse_blocks=(0,),
                   override_entries=[(256, 4, [140000]), (257, 4, [140000]),
                                     (322, 4, [140000]), (323, 4, [140000])])
    with pytest.raises(ValueError, match="implausible|cap"):
        geotiff.imread(f)


def test_user_defined_geokey_yields_no_crs(tmp_path):
    """GeoKey 32767 is 'user-defined' per spec — must NOT be minted into a
    bogus EPSG:32767 that a read-modify-write would re-emit."""
    arr = _demo_array(8, 8, 1, dtype=np.uint8)
    f = forge_tiff(tmp_path / "udcrs.tif", arr,
                   extra_entries=[(34735, 3, [1, 1, 0, 2,
                                              1024, 0, 1, 1,
                                              3072, 0, 1, 32767])])
    _, meta = geotiff.imread(f)
    assert meta.get("crs") is None


def test_writer_refuses_4gib(tmp_path, monkeypatch):
    """Classic TIFF offsets are 32-bit: a would-be >4 GiB file must be
    refused loudly, not written with wrapped offsets."""
    class FakeBig(bytes):
        def __len__(self):
            return (1 << 31) + 100

    monkeypatch.setattr(geotiff.zlib, "compress",
                        lambda data, level=6: FakeBig())
    arr = np.zeros((64, 64, 1), np.uint8)
    with pytest.raises(ValueError, match="4 GiB"):
        geotiff.imwrite(tmp_path / "huge.tif", arr, rows_per_strip=16)


def test_deflate_bomb_guarded(tmp_path):
    """A tiny block that inflates far beyond its declared image size must
    raise, not balloon memory."""
    arr = _demo_array(8, 8, 1, dtype=np.uint8)
    f = forge_tiff(tmp_path / "bomb.tif", arr, compression=8)
    raw = bytearray(f.read_bytes())
    bomb = zlib.compress(b"\0" * (64 << 20), 9)  # 64 MiB of zeros, ~64 KiB
    n = struct.unpack_from("<H", raw, 8)[0]
    for i in range(n):
        tag, typ, cnt = struct.unpack_from("<HHI", raw, 10 + 12 * i)
        pos = 10 + 12 * i + 8
        if tag == 273:
            struct.pack_into("<I", raw, pos, len(raw))
        elif tag == 279:
            struct.pack_into("<I", raw, pos, len(bomb))
    f.write_bytes(bytes(raw) + bomb)
    with pytest.raises(ValueError, match="inflates beyond"):
        geotiff.imread(f)


# ---------------------------------------------------------------------------
# Fuzzing: mutations and raw codec input must never escape
# (ValueError, NotImplementedError) or hang.
# ---------------------------------------------------------------------------

ALLOWED = (ValueError, NotImplementedError)


@pytest.mark.parametrize("big,order,planar,compression,predictor", [
    (True, "<", 1, 5, 2),
    (True, ">", 2, 8, 1),
    (True, "<", 1, 8, 3),
])
def test_bigtiff_layouts_decode_exactly(tmp_path, big, order, planar,
                                        compression, predictor):
    """Forged BigTIFF in GDAL-style layouts (incl. the fp predictor on
    float data) decodes exactly through the u64 IFD parser."""
    dtype = np.float32 if predictor == 3 else np.uint16
    arr = _demo_array(24, 24, 2, dtype=dtype)
    f = forge_tiff(tmp_path / "bt.tif", arr, big=big, order=order,
                   tiled=True, tile=(16, 16), planar=planar,
                   compression=compression, predictor=predictor)
    back, _ = geotiff.imread(f)
    np.testing.assert_array_equal(back, arr)


@pytest.mark.parametrize("big", [False, True])
def test_mutation_fuzz_reader(tmp_path, big):
    arr = _demo_array(24, 24, 2, dtype=np.uint16)
    base = forge_tiff(tmp_path / "fz.tif", arr, big=big, tiled=True,
                      tile=(16, 16), compression=5, predictor=2).read_bytes()
    rng = np.random.default_rng(42)
    f = tmp_path / "m.tif"
    ok = bad = 0
    for _ in range(400):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 9))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        if rng.random() < 0.2:
            buf = buf[:int(rng.integers(8, len(buf)))]
        f.write_bytes(bytes(buf))
        try:
            geotiff.imread(f)
            ok += 1
        except ALLOWED:
            bad += 1
    assert ok + bad == 400  # nothing else escaped


def test_random_codec_input_fuzz():
    """Raw garbage into every decoder implementation: clean errors only,
    bounded output under a limit."""
    rng = np.random.default_rng(7)
    impls = [geotiff._lzw_decode_py, geotiff._packbits_decode_py]
    if geotiff._fastcodecs is not None:
        impls += [geotiff._fastcodecs.lzw_decode,
                  geotiff._fastcodecs.packbits_decode]
    for _ in range(300):
        blob = rng.integers(0, 256, size=int(rng.integers(0, 400)),
                            dtype=np.uint8).tobytes()
        for impl in impls:
            try:
                out = impl(blob, 1 << 16)
                assert len(out) <= 1 << 16
            except ALLOWED:
                pass


def test_codec_limit_is_enforced():
    """A valid stream expanding beyond the limit raises in every impl."""
    run = bytes([257 - 128, 7] * 64)  # PackBits: 64 runs of 128 sevens
    lzw = _lzw_encode_reference(b"\x01" * 4096)
    cases = [(geotiff._packbits_decode_py, run),
             (geotiff._lzw_decode_py, lzw)]
    if geotiff._fastcodecs is not None:
        cases += [(geotiff._fastcodecs.packbits_decode, run),
                  (geotiff._fastcodecs.lzw_decode, lzw)]
    for impl, stream in cases:
        assert len(impl(stream, 0)) >= 4096  # no limit: fine
        with pytest.raises(ValueError):
            impl(stream, 100)


def test_fuzz_valid_lzw_roundtrip_all_impls():
    """Both LZW implementations agree with the reference encoder on random
    payloads (table growth through width changes, KwKwK cases)."""
    rng = np.random.default_rng(11)
    for _ in range(25):
        n = int(rng.integers(1, 6000))
        raw = rng.integers(0, int(rng.integers(2, 256)), size=n,
                           dtype=np.uint8).tobytes()
        stream = _lzw_encode_reference(raw)
        assert geotiff._lzw_decode_py(stream) == raw
        if geotiff._fastcodecs is not None:
            assert geotiff._fastcodecs.lzw_decode(stream) == raw


def test_corrupt_deflate_block_raises_valueerror(tmp_path):
    """zlib.error is NOT a ValueError: bitstream corruption in a deflate
    block must be normalized to the module's corrupt-input contract."""
    arr = _demo_array(16, 16, 1, dtype=np.uint8)
    f = forge_tiff(tmp_path / "d.tif", arr, compression=8)
    raw = bytearray(f.read_bytes())
    raw[-10] ^= 0xFF  # flip bits inside the compressed block
    f.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="deflate"):
        geotiff.imread(f)


def test_truncated_deflate_stream_raises(tmp_path):
    """A deflate block whose stream ends mid-way (input fully consumed,
    decompressor not at eof) must raise, not be silently accepted short."""
    arr = _demo_array(16, 16, 1, dtype=np.uint8)
    f = forge_tiff(tmp_path / "t.tif", arr, compression=8)
    raw = bytearray(f.read_bytes())
    # shorten the block byte count so the stream cuts off mid-deflate
    n = struct.unpack_from("<H", raw, 8)[0]
    for i in range(n):
        tag, typ, cnt = struct.unpack_from("<HHI", raw, 10 + 12 * i)
        if tag == 279:
            count = struct.unpack_from("<I", raw, 10 + 12 * i + 8)[0]
            struct.pack_into("<I", raw, 10 + 12 * i + 8, max(2, count - 6))
    f.write_bytes(bytes(raw))
    with pytest.raises(ValueError):
        geotiff.imread(f)


@pytest.mark.parametrize("use_native", [True, False],
                         ids=["c-kernels", "pure-python"])
def test_differential_fuzz_vs_libtiff(tmp_path, use_native):
    """Bounded slice of the randomized differential campaign against
    libtiff.so.6 (tools/difffuzz_geotiff.py): libtiff writes random points
    of the layout lattice (dtype x compression x predictor x planar x
    strips/tiles x endianness x classic/BigTIFF) and imread must bit-match
    libtiff's own read-back; our writer's files must scanline-read back
    exactly. Runs once through the C decode kernels and once with them
    disabled (the pure-Python LZW/PackBits fallbacks are an independent
    code path). The full campaign runs thousands of cases offline; this
    pins the harness + a deterministic sample in the suite."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    difffuzz = pytest.importorskip("difffuzz_geotiff")
    try:
        difffuzz.LibTiff()
    except OSError:
        pytest.skip("libtiff.so.6 not available")
    failures = difffuzz.run_campaign(40, seed=1234, keep_dir=tmp_path,
                                     verbose=False, use_native=use_native)
    assert failures == []
