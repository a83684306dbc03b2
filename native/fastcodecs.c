/* Native decode kernels for the GeoTIFF codec's hot paths.
 *
 * Python's per-code LZW loop costs ~1 µs/code; the cache builder decodes
 * every strip of every scene once, so LZW-compressed datasets spend minutes
 * in pure Python. This extension implements TIFF-variant LZW (MSB-first
 * bit packing, early code-width change) and PackBits in C, exposed through
 * the CPython API (pybind11 is not available in this image).
 *
 * Built by tools/build_native.py into multimodal_siamese_cd_tpu/_fastcodecs*.so;
 * geotiff.py falls back to the pure-Python implementations when absent.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* ---------------- TIFF LZW ---------------- */

#define LZW_CLEAR 256
#define LZW_EOI 257
#define LZW_MAX_CODES 4096

typedef struct {
    uint16_t prev;    /* previous code in the chain, 0xFFFF for roots */
    uint8_t first;    /* first byte of the expansion */
    uint8_t suffix;   /* last byte of the expansion */
    uint32_t length;  /* expansion length */
} LzwEntry;

static int lzw_expand(const LzwEntry *table, uint16_t code, uint8_t *dst,
                      uint32_t len) {
    /* writes the expansion of `code` (known length `len`) into dst */
    uint32_t i = len;
    while (code != 0xFFFF) {
        if (i == 0) return -1;
        dst[--i] = table[code].suffix;
        code = table[code].prev;
    }
    return i == 0 ? 0 : -1;
}

static PyObject *py_lzw_decode(PyObject *self, PyObject *args) {
    /* lzw_decode(data, limit=0): `limit` > 0 is a HARD output cap — a
     * stream expanding beyond it raises ValueError (decompression-bomb
     * guard; the caller passes a loose bound over the block's true size). */
    Py_buffer src;
    Py_ssize_t expected = 0;
    if (!PyArg_ParseTuple(args, "y*|n", &src, &expected)) return NULL;

    const uint8_t *data = (const uint8_t *)src.buf;
    Py_ssize_t nbytes = src.len;

    Py_ssize_t cap = expected > 0 ? expected : (nbytes * 3 + 64);
    uint8_t *out = (uint8_t *)PyMem_Malloc(cap);
    if (!out) { PyBuffer_Release(&src); return PyErr_NoMemory(); }
    Py_ssize_t out_len = 0;

    LzwEntry table[LZW_MAX_CODES];
    uint32_t next_code = 258, nbits = 9;
    for (int i = 0; i < 256; i++) {
        table[i].prev = 0xFFFF; table[i].first = (uint8_t)i;
        table[i].suffix = (uint8_t)i; table[i].length = 1;
    }

    uint64_t bitbuf = 0; int bitcnt = 0;
    Py_ssize_t pos = 0;
    uint16_t prev_code = 0xFFFF;

    for (;;) {
        while (bitcnt < (int)nbits && pos < nbytes) {
            bitbuf = (bitbuf << 8) | data[pos++];
            bitcnt += 8;
        }
        if (bitcnt < (int)nbits) break; /* ran out of bits */
        uint16_t code = (uint16_t)((bitbuf >> (bitcnt - (int)nbits)) &
                                   ((1u << nbits) - 1));
        bitcnt -= (int)nbits;

        if (code == LZW_EOI) break;
        if (code == LZW_CLEAR) {
            next_code = 258; nbits = 9; prev_code = 0xFFFF;
            continue;
        }

        uint32_t entry_len;
        uint8_t entry_first;
        if (prev_code == 0xFFFF) {
            if (code > 255) goto corrupt;
            entry_len = 1; entry_first = table[code].first;
        } else if (code < next_code) {
            entry_len = table[code].length;
            entry_first = table[code].first;
            if (next_code < LZW_MAX_CODES) {
                table[next_code].prev = prev_code;
                table[next_code].first = table[prev_code].first;
                table[next_code].suffix = entry_first;
                table[next_code].length = table[prev_code].length + 1;
                next_code++;
            }
        } else if (code == next_code && next_code < LZW_MAX_CODES) {
            /* KwKwK case */
            entry_len = table[prev_code].length + 1;
            entry_first = table[prev_code].first;
            table[next_code].prev = prev_code;
            table[next_code].first = entry_first;
            table[next_code].suffix = entry_first;
            table[next_code].length = entry_len;
            next_code++;
        } else {
            goto corrupt;
        }

        if (out_len + (Py_ssize_t)entry_len > cap) {
            if (expected > 0) goto too_big;
            Py_ssize_t newcap = cap * 2 + entry_len;
            uint8_t *grown = (uint8_t *)PyMem_Realloc(out, newcap);
            if (!grown) { PyMem_Free(out); PyBuffer_Release(&src);
                          return PyErr_NoMemory(); }
            out = grown; cap = newcap;
        }
        if (lzw_expand(table, code, out + out_len, entry_len) != 0)
            goto corrupt;
        out_len += entry_len;
        prev_code = code;

        /* TIFF early change, decoder side (libtiff tif_lzw.c rule): widen
         * when next_code — the next free slot — is one from the boundary,
         * i.e. at 511/1023/2047 entries the following code is one bit
         * wider. (`+ 2` widened a code early and desynced on every real
         * libtiff/GDAL stream; verified against libtiff.so.6.) */
        if (next_code + 1 >= (1u << nbits) && nbits < 12) nbits++;
    }

    {
        PyObject *res = PyBytes_FromStringAndSize((const char *)out, out_len);
        PyMem_Free(out);
        PyBuffer_Release(&src);
        return res;
    }

corrupt:
    PyMem_Free(out);
    PyBuffer_Release(&src);
    PyErr_SetString(PyExc_ValueError, "Corrupt LZW stream");
    return NULL;

too_big:
    PyMem_Free(out);
    PyBuffer_Release(&src);
    PyErr_SetString(PyExc_ValueError,
                    "Corrupt LZW stream: output exceeds the block limit");
    return NULL;
}

/* ---------------- PackBits ---------------- */

static PyObject *py_packbits_decode(PyObject *self, PyObject *args) {
    /* packbits_decode(data, limit=0): `limit` > 0 is a HARD output cap
     * (same contract as lzw_decode). */
    Py_buffer src;
    Py_ssize_t expected = 0;
    if (!PyArg_ParseTuple(args, "y*|n", &src, &expected)) return NULL;
    const uint8_t *data = (const uint8_t *)src.buf;
    Py_ssize_t n = src.len;

    Py_ssize_t cap = expected > 0 ? expected : (n * 2 + 64);
    uint8_t *out = (uint8_t *)PyMem_Malloc(cap);
    if (!out) { PyBuffer_Release(&src); return PyErr_NoMemory(); }
    Py_ssize_t out_len = 0, i = 0;

    while (i < n) {
        uint8_t h = data[i++];
        Py_ssize_t run, lit;
        if (h < 128) {
            lit = (Py_ssize_t)h + 1;
            if (i + lit > n) lit = n - i;
            if (out_len + lit > cap) {
                if (expected > 0) goto too_big;
                cap = cap * 2 + lit;
                uint8_t *g = (uint8_t *)PyMem_Realloc(out, cap);
                if (!g) { PyMem_Free(out); PyBuffer_Release(&src);
                          return PyErr_NoMemory(); }
                out = g;
            }
            memcpy(out + out_len, data + i, lit);
            out_len += lit; i += lit;
        } else if (h > 128) {
            if (i >= n) break;
            run = 257 - (Py_ssize_t)h;
            if (out_len + run > cap) {
                if (expected > 0) goto too_big;
                cap = cap * 2 + run;
                uint8_t *g = (uint8_t *)PyMem_Realloc(out, cap);
                if (!g) { PyMem_Free(out); PyBuffer_Release(&src);
                          return PyErr_NoMemory(); }
                out = g;
            }
            memset(out + out_len, data[i++], run);
            out_len += run;
        } /* h == 128: no-op */
    }

    {
        PyObject *res = PyBytes_FromStringAndSize((const char *)out, out_len);
        PyMem_Free(out);
        PyBuffer_Release(&src);
        return res;
    }

too_big:
    PyMem_Free(out);
    PyBuffer_Release(&src);
    PyErr_SetString(PyExc_ValueError,
                    "Corrupt PackBits stream: output exceeds the block limit");
    return NULL;
}

static PyMethodDef Methods[] = {
    {"lzw_decode", py_lzw_decode, METH_VARARGS,
     "TIFF-variant LZW decode (MSB-first, early change)."},
    {"packbits_decode", py_packbits_decode, METH_VARARGS,
     "PackBits (RLE) decode."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastcodecs",
    "Native TIFF decode kernels.", -1, Methods,
};

PyMODINIT_FUNC PyInit__fastcodecs(void) {
    return PyModule_Create(&moduledef);
}
