"""C-speed decoderbufs RowMessage batch decoder (the fast-proto seam's
first-party implementation).

The pure-Python codec in ``proto.py`` is the floor: one Python loop per
message (honest r3/r4 perf_weak).  This module compiles a ~300-line C
translation unit AT RUNTIME with the system C compiler (cc -O2 -shared),
loads it via ctypes, and decodes one WHOLE ARROW BATCH per C call into
columnar outputs (struct-of-arrays + string arenas) that pyarrow assembles
zero-loop into the same schema ``proto.make_proto_batches`` produces.

Scope split (keeps the C trivially verifiable):

* C handles the hot shapes: header varints (txid/commit_time/op/table),
  string / int32 / int64 / bool / bytes(base64) / missing datums — i.e.
  every datum kind whose canonical text rendering is trivially
  byte-identical to the Python codec.
* Messages containing float/double/point datums, ``new_typeinfo``, or the
  R-convention (op<0) are FLAGGED and re-decoded by the pure-Python codec
  (Python's shortest-roundtrip float repr has no 5-line C equivalent, and
  those rows are rare: schema events + exotic typed columns).  The two
  paths are spliced by position, so output order is exact.

Executor story: the .so is compiled ONCE driver-side into a shared cache
dir; the closure shipped to executors carries only the PATH + pure-Python
wrapper code (ctypes handles are process-local and lazily dlopen'd), which
is exactly right for local[N] and for clusters whose nodes share the
artifact path (ship it with --files otherwise).

Install with :func:`enable_native_proto` (or let ``parse_events``'s proto
mode auto-enable it, falling back silently to pure Python when no C
compiler exists).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_C_SOURCE = r"""
#include <stdint.h>
#include <string.h>
#include <stdio.h>

/* decoderbufs RowMessage wire decode, batch form.
   Field map (public pg_logicaldec.proto):
     RowMessage: 1=transaction_id(varint) 2=commit_time(varint)
                 3=table(len) 4=op(varint; negative=UNKNOWN)
                 5=new_tuple(len,repeated) 6=old_tuple(len,repeated)
                 7=new_typeinfo(len,repeated -> python fallback)
     DatumMessage: 1=column_name(len) 3=int32 4=int64 5=float(f32)
                 6=double(f64) 7=bool 8=string(len) 9=bytes(len)
                 10=point(len) 11=missing(varint)
   float/double/point -> python fallback (shortest-repr rendering). */

static const char B64[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

typedef struct {
    const uint8_t *p, *end;
} rd_t;

static int rd_varint(rd_t *r, uint64_t *out) {
    uint64_t v = 0; int shift = 0;
    while (r->p < r->end && shift < 64) {
        uint8_t b = *r->p++;
        v |= (uint64_t)(b & 0x7f) << shift;
        if (!(b & 0x80)) { *out = v; return 0; }
        shift += 7;
    }
    return 1;
}

static int rd_skip(rd_t *r, int wire) {
    uint64_t v;
    switch (wire) {
    case 0: return rd_varint(r, &v);
    case 1: if (r->end - r->p < 8) return 1; r->p += 8; return 0;
    case 2: if (rd_varint(r, &v)) return 1;
            if ((uint64_t)(r->end - r->p) < v) return 1; r->p += v; return 0;
    case 5: if (r->end - r->p < 4) return 1; r->p += 4; return 0;
    default: return 1;
    }
}

/* arena writer: returns start offset or -1 on overflow */
static int32_t arena_put(uint8_t *arena, int32_t cap, int32_t *used,
                         const uint8_t *src, int32_t len) {
    if (*used + len > cap) return -1;
    memcpy(arena + *used, src, len);
    *used += len;
    return *used - len;
}

#define OP_I 0
#define OP_U 1
#define OP_D 2
#define OP_B 3
#define OP_C 4
#define OP_OTHER 5

/* returns 0 ok, 1 arena overflow, 2 datum-count overflow */
int decode_rowmsg_batch(
    const uint8_t *data, const int32_t *offsets, int32_t n,
    int32_t headers_only,
    int64_t *txid, uint8_t *txid_valid, int64_t *ct, uint8_t *ct_valid,
    int8_t *opx, uint8_t *needs_py,
    uint8_t *tab_arena, int32_t tab_cap, int32_t *tab_off, uint8_t *tab_valid,
    int32_t *new_counts, int32_t *old_counts,
    uint8_t *nk_arena, int32_t nk_cap, int32_t *nk_off,
    uint8_t *nv_arena, int32_t nv_cap, int32_t *nv_off, uint8_t *nv_valid,
    uint8_t *ok_arena, int32_t ok_cap, int32_t *ok_off,
    uint8_t *ov_arena, int32_t ov_cap, int32_t *ov_off, uint8_t *ov_valid,
    int32_t dat_cap, int32_t *n_new_out, int32_t *n_old_out)
{
    int32_t nk_used = 0, nv_used = 0, ok_used = 0, ov_used = 0, tab_used = 0;
    int32_t n_new = 0, n_old = 0;
    char tmp[32];

    tab_off[0] = 0;
    if (!headers_only) { nk_off[0] = 0; nv_off[0] = 0; ok_off[0] = 0; ov_off[0] = 0; }

    for (int32_t i = 0; i < n; i++) {
        rd_t r = { data + offsets[i], data + offsets[i + 1] };
        txid[i] = 0; ct[i] = 0; txid_valid[i] = 0; ct_valid[i] = 0;
        opx[i] = OP_OTHER; needs_py[i] = 0;
        tab_valid[i] = 0;
        new_counts[i] = 0; old_counts[i] = 0;
        int32_t tab_start = tab_used;

        while (r.p < r.end) {
            uint64_t tag;
            if (rd_varint(&r, &tag)) { needs_py[i] = 1; break; }
            int field = (int)(tag >> 3), wire = (int)(tag & 7);
            uint64_t v;
            if (field == 1 && wire == 0) {
                if (rd_varint(&r, &v)) { needs_py[i] = 1; break; }
                txid[i] = (int64_t)v; txid_valid[i] = 1;
            } else if (field == 2 && wire == 0) {
                if (rd_varint(&r, &v)) { needs_py[i] = 1; break; }
                ct[i] = (int64_t)v; ct_valid[i] = 1;
            } else if (field == 3 && wire == 2) {
                if (rd_varint(&r, &v) || (uint64_t)(r.end - r.p) < v) {
                    needs_py[i] = 1; break;
                }
                if (arena_put(tab_arena, tab_cap, &tab_used, r.p,
                              (int32_t)v) < 0) return 1;
                tab_valid[i] = 1;
                r.p += v;
            } else if (field == 4 && wire == 0) {
                if (rd_varint(&r, &v)) { needs_py[i] = 1; break; }
                int64_t sv = (int64_t)v;
                if (sv < 0) { needs_py[i] = 1; }       /* R convention */
                else if (sv == 0) opx[i] = OP_I;
                else if (sv == 1) opx[i] = OP_U;
                else if (sv == 2) opx[i] = OP_D;
                else if (sv == 3) opx[i] = OP_B;
                else if (sv == 4) opx[i] = OP_C;
                else opx[i] = OP_OTHER;
            } else if ((field == 5 || field == 6) && wire == 2) {
                if (rd_varint(&r, &v) || (uint64_t)(r.end - r.p) < v) {
                    needs_py[i] = 1; break;
                }
                if (headers_only) { r.p += v; continue; }
                /* ---- DatumMessage submessage ---- */
                rd_t d = { r.p, r.p + v };
                r.p += v;
                const uint8_t *name_p = 0; int32_t name_len = 0;
                const uint8_t *sval_p = 0; int32_t sval_len = -1;
                int is_b64 = 0;
                int64_t ival = 0;
                int bval = 0;
                int missing = 0;
                int dat_bad = 0;
                /* last-field-wins across value arms (python codec parity
                   on oneof-violating wires): 0 none, 1 str, 2 b64,
                   3 int, 4 bool */
                int kind = 0;
                while (d.p < d.end) {
                    uint64_t dtag;
                    if (rd_varint(&d, &dtag)) { dat_bad = 1; break; }
                    int df = (int)(dtag >> 3), dw = (int)(dtag & 7);
                    uint64_t dv;
                    if (df == 1 && dw == 2) {
                        if (rd_varint(&d, &dv) ||
                            (uint64_t)(d.end - d.p) < dv) { dat_bad = 1; break; }
                        name_p = d.p; name_len = (int32_t)dv; d.p += dv;
                    } else if ((df == 3 || df == 4) && dw == 0) {
                        if (rd_varint(&d, &dv)) { dat_bad = 1; break; }
                        ival = (int64_t)dv; kind = 3;
                    } else if (df == 7 && dw == 0) {
                        if (rd_varint(&d, &dv)) { dat_bad = 1; break; }
                        bval = dv ? 1 : 0; kind = 4;
                    } else if (df == 8 && dw == 2) {
                        if (rd_varint(&d, &dv) ||
                            (uint64_t)(d.end - d.p) < dv) { dat_bad = 1; break; }
                        sval_p = d.p; sval_len = (int32_t)dv; is_b64 = 0;
                        kind = 1;
                        d.p += dv;
                    } else if (df == 9 && dw == 2) {
                        if (rd_varint(&d, &dv) ||
                            (uint64_t)(d.end - d.p) < dv) { dat_bad = 1; break; }
                        sval_p = d.p; sval_len = (int32_t)dv; is_b64 = 2;
                        kind = 2;
                        d.p += dv;
                    } else if (df == 11 && dw == 0) {
                        if (rd_varint(&d, &dv)) { dat_bad = 1; break; }
                        missing = dv ? 1 : 0;
                    } else if (df == 5 || df == 6 || df == 10) {
                        /* float/double/point: python renders these */
                        dat_bad = 1; break;
                    } else {
                        if (rd_skip(&d, dw)) { dat_bad = 1; break; }
                    }
                }
                if (dat_bad) { needs_py[i] = 1; continue; }
                if (!name_p) continue;           /* nameless datum: dropped */
                /* python codec parity: datum_missing AND no-value-arm
                   datums fold to an ABSENT key, not a null map value */
                if (missing || kind == 0) continue;
                int is_new = (field == 5);
                uint8_t *k_arena = is_new ? nk_arena : ok_arena;
                int32_t  k_cap   = is_new ? nk_cap   : ok_cap;
                int32_t *k_used  = is_new ? &nk_used : &ok_used;
                int32_t *k_off   = is_new ? nk_off   : ok_off;
                uint8_t *v_arena = is_new ? nv_arena : ov_arena;
                int32_t  v_cap   = is_new ? nv_cap   : ov_cap;
                int32_t *v_used  = is_new ? &nv_used : &ov_used;
                int32_t *v_off   = is_new ? nv_off   : ov_off;
                uint8_t *v_valid = is_new ? nv_valid : ov_valid;
                int32_t *ndat    = is_new ? &n_new   : &n_old;
                if (*ndat + 1 > dat_cap) return 2;
                if (arena_put(k_arena, k_cap, k_used, name_p, name_len) < 0)
                    return 1;
                if (kind == 1) {
                    if (arena_put(v_arena, v_cap, v_used, sval_p,
                                  sval_len) < 0) return 1;
                    v_valid[*ndat] = 1;
                } else if (kind == 2) {
                    int32_t out_len = 4 * ((sval_len + 2) / 3);
                    if (*v_used + out_len > v_cap) return 1;
                    uint8_t *o = v_arena + *v_used;
                    int32_t j = 0;
                    for (; j + 2 < sval_len; j += 3) {
                        uint32_t w = (sval_p[j] << 16) | (sval_p[j+1] << 8)
                                     | sval_p[j+2];
                        *o++ = B64[(w >> 18) & 63]; *o++ = B64[(w >> 12) & 63];
                        *o++ = B64[(w >> 6) & 63];  *o++ = B64[w & 63];
                    }
                    if (j < sval_len) {
                        uint32_t w = sval_p[j] << 16;
                        int two = (j + 1 < sval_len);
                        if (two) w |= sval_p[j+1] << 8;
                        *o++ = B64[(w >> 18) & 63]; *o++ = B64[(w >> 12) & 63];
                        *o++ = two ? B64[(w >> 6) & 63] : '=';
                        *o++ = '=';
                    }
                    *v_used += out_len;
                    v_valid[*ndat] = 1;
                } else if (kind == 3) {
                    int len = snprintf(tmp, sizeof tmp, "%lld",
                                       (long long)ival);
                    if (arena_put(v_arena, v_cap, v_used,
                                  (const uint8_t *)tmp, len) < 0) return 1;
                    v_valid[*ndat] = 1;
                } else {
                    const char *bs = bval ? "true" : "false";
                    if (arena_put(v_arena, v_cap, v_used,
                                  (const uint8_t *)bs,
                                  bval ? 4 : 5) < 0) return 1;
                    v_valid[*ndat] = 1;
                }
                (*ndat)++;
                k_off[*ndat] = *k_used;
                v_off[*ndat] = *v_used;
                if (is_new) new_counts[i]++; else old_counts[i]++;
            } else if (field == 7 && wire == 2) {
                needs_py[i] = 1;                 /* typeinfo: python path */
                if (rd_skip(&r, wire)) break;
            } else {
                if (rd_skip(&r, wire)) { needs_py[i] = 1; break; }
            }
        }
        tab_off[i + 1] = tab_used;
        (void)tab_start;
    }
    *n_new_out = n_new;
    *n_old_out = n_old;
    return 0;
}
"""


_LOCK = threading.Lock()
_LIB_CACHE: dict[str, ctypes.CDLL] = {}


def build_native_decoder(cache_dir: str | None = None) -> str:
    """Compile the C decoder once; return the .so path (content-addressed,
    so a code change recompiles and old artifacts never get misloaded)."""
    cache = cache_dir or os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "logicaldecoding_spark_native"
    )
    os.makedirs(cache, exist_ok=True)
    tag = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    so_path = os.path.join(cache, f"rowmsg_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    c_path = os.path.join(cache, f"rowmsg_{tag}.c")
    with _LOCK:
        if os.path.exists(so_path):
            return so_path
        with open(c_path, "w") as f:
            f.write(_C_SOURCE)
        tmp_so = so_path + ".tmp"
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path],
            check=True, capture_output=True,
        )
        os.replace(tmp_so, so_path)  # atomic: workers never see a torn .so
    return so_path


def _lib(so_path: str) -> ctypes.CDLL:
    lib = _LIB_CACHE.get(so_path)
    if lib is None:
        lib = ctypes.CDLL(so_path)
        lib.decode_rowmsg_batch.restype = ctypes.c_int
        _LIB_CACHE[so_path] = lib
    return lib


class NativeUtf8Error(RuntimeError):
    """A decoded string region is not valid UTF-8 — the pure-Python codec
    raises UnicodeDecodeError on such wires, so the native path must not
    silently admit the bytes; callers fall the whole batch back to
    Python."""


def decode_batch_native(so_path: str, payload, lsn=None,
                        headers_only: bool = False):
    """Decode one pyarrow binary array of RowMessage payloads via the C
    library; returns the columnar pieces.  Pure numpy/pyarrow assembly —
    the only per-row Python runs over the (rare) flagged rows, which the
    CALLER re-decodes with the pure-Python codec and splices by position.

    ``headers_only`` skips ALL datum work C-side (fields 5/6 are
    length-skipped): the marker/tagging paths need only (txid, op).

    Returns (batch_dict, needs_py_idx) where batch_dict holds arrays:
    txid (Int64 w/ nulls), ct(us, Int64 w/ nulls), op (str array),
    table (StringArray w/ nulls), new_tuple/old_tuple (MapArrays w/
    nulls; None in headers_only mode)."""
    import numpy as np
    import pyarrow as pa

    arr = payload
    if arr.null_count:
        raise ValueError("null payloads unsupported")
    # normalize to a zero-offset binary array view
    if arr.offset != 0:
        arr = arr.combine_chunks() if hasattr(arr, "combine_chunks") else arr
        arr = pa.concat_arrays([arr])  # re-slices to offset 0
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32,
                            count=len(arr) + 1 + arr.offset)
    if arr.offset:
        offsets = offsets[arr.offset:]
    data_buf = bufs[2]
    data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None \
        else np.zeros(1, dtype=np.uint8)
    n = len(arr)
    total = int(offsets[-1] - offsets[0])

    lib = _lib(so_path)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i32 = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.POINTER(ctypes.c_int64)
    i8 = ctypes.POINTER(ctypes.c_int8)

    def ptr(a, t):
        return a.ctypes.data_as(t)

    txid = np.zeros(n, dtype=np.int64)
    txid_valid = np.zeros(n, dtype=np.uint8)
    ct = np.zeros(n, dtype=np.int64)
    ct_valid = np.zeros(n, dtype=np.uint8)
    opx = np.zeros(n, dtype=np.int8)
    needs = np.zeros(n, dtype=np.uint8)
    tab_off = np.zeros(n + 1, dtype=np.int32)
    tab_valid = np.zeros(n, dtype=np.uint8)
    new_counts = np.zeros(n, dtype=np.int32)
    old_counts = np.zeros(n, dtype=np.int32)

    if headers_only:
        # datum streams never written: tiny arenas, table arena still real
        arena_cap = max(total + 64 * n + 1024, 1 << 12)
        dat_cap = 8
    else:
        arena_cap = max(total * 2 + 64 * n + 1024, 1 << 16)
        dat_cap = max(total // 4 + n + 16, 1 << 12)
    for _attempt in range(4):
        tab_arena = np.empty(arena_cap, dtype=np.uint8)
        nk = np.empty(arena_cap, dtype=np.uint8)
        nv = np.empty(arena_cap, dtype=np.uint8)
        ok = np.empty(arena_cap, dtype=np.uint8)
        ov = np.empty(arena_cap, dtype=np.uint8)
        nk_off = np.zeros(dat_cap + 1, dtype=np.int32)
        nv_off = np.zeros(dat_cap + 1, dtype=np.int32)
        ok_off = np.zeros(dat_cap + 1, dtype=np.int32)
        ov_off = np.zeros(dat_cap + 1, dtype=np.int32)
        nv_valid = np.zeros(dat_cap, dtype=np.uint8)
        ov_valid = np.zeros(dat_cap, dtype=np.uint8)
        n_new = ctypes.c_int32(0)
        n_old = ctypes.c_int32(0)
        rc = lib.decode_rowmsg_batch(
            ptr(data, u8), ptr(np.ascontiguousarray(offsets), i32),
            ctypes.c_int32(n), ctypes.c_int32(1 if headers_only else 0),
            ptr(txid, i64), ptr(txid_valid, u8),
            ptr(ct, i64), ptr(ct_valid, u8),
            ptr(opx, i8), ptr(needs, u8),
            ptr(tab_arena, u8), ctypes.c_int32(arena_cap), ptr(tab_off, i32),
            ptr(tab_valid, u8),
            ptr(new_counts, i32), ptr(old_counts, i32),
            ptr(nk, u8), ctypes.c_int32(arena_cap), ptr(nk_off, i32),
            ptr(nv, u8), ctypes.c_int32(arena_cap), ptr(nv_off, i32),
            ptr(nv_valid, u8),
            ptr(ok, u8), ctypes.c_int32(arena_cap), ptr(ok_off, i32),
            ptr(ov, u8), ctypes.c_int32(arena_cap), ptr(ov_off, i32),
            ptr(ov_valid, u8),
            ctypes.c_int32(dat_cap),
            ctypes.byref(n_new), ctypes.byref(n_old),
        )
        if rc == 0:
            break
        if rc == 1:
            arena_cap *= 4
        elif rc == 2:
            dat_cap *= 4
        else:  # pragma: no cover
            raise RuntimeError(f"native decoder rc={rc}")
    else:  # pragma: no cover
        raise RuntimeError("native decoder could not size its buffers")

    def _strings(arena, off_arr, count, valid=None):
        off = pa.py_buffer(np.ascontiguousarray(off_arr[:count + 1]))
        dat = pa.py_buffer(arena[:int(off_arr[count])].tobytes())
        if valid is None:
            out_a = pa.Array.from_buffers(pa.utf8(), count, [None, off, dat])
        else:
            bitmap = pa.py_buffer(
                np.packbits(valid[:count].astype(bool), bitorder="little")
            )
            out_a = pa.Array.from_buffers(pa.utf8(), count,
                                          [bitmap, off, dat])
        try:
            out_a.validate(full=True)  # UTF-8 check (python codec parity)
        except pa.lib.ArrowInvalid as e:
            raise NativeUtf8Error(str(e)) from e
        return out_a

    def _maps(counts, keys, vals):
        ends = np.cumsum(counts, dtype=np.int64)
        # null map when a message carried no datums of this side (the
        # python codec's `new or None` rule); pyarrow's convention: a None
        # at offsets[j] nulls element j, the FINAL offset must be non-null.
        # Built as one masked int32 array — the per-row Python list this
        # replaces was 80%+ of the whole assembly wall (r6 microbench).
        offs_np = np.empty(len(counts) + 1, dtype=np.int32)
        offs_np[0] = 0
        offs_np[1:] = ends
        mask = np.empty(len(counts) + 1, dtype=bool)
        np.equal(counts, 0, out=mask[:-1])
        mask[-1] = False  # final offset must be non-null
        offs = pa.array(offs_np, pa.int32(), mask=mask)
        return pa.MapArray.from_arrays(offs, keys, vals)

    new_maps = old_maps = None
    if not headers_only:
        nn, no = int(n_new.value), int(n_old.value)
        new_keys = _strings(nk, nk_off, nn)
        new_vals = _strings(nv, nv_off, nn, nv_valid)
        old_keys = _strings(ok, ok_off, no)
        old_vals = _strings(ov, ov_off, no)
        new_maps = _maps(new_counts, new_keys, new_vals)
        old_maps = _maps(old_counts, old_keys, old_vals)
    table = _strings(tab_arena, tab_off, n, tab_valid)
    op_lookup = np.array(["I", "U", "D", "B", "C", "?"])
    ops = pa.array(op_lookup[np.clip(opx, 0, 5)], pa.string())

    out = {
        # python codec parity: absent wire fields decode to NULL, not 0
        "txid": pa.array(txid, pa.int64(),
                         mask=~txid_valid.astype(bool)),
        "ct": pa.array(ct, pa.int64(), mask=~ct_valid.astype(bool)),
        "op": ops,
        "table": table,
        "new": new_maps,
        "old": old_maps,
    }
    return out, np.nonzero(needs)[0]


def make_native_full_batch(so_path: str):
    """Factory for the ``full_batch`` seam: (lsn, payload) arrow arrays ->
    RecordBatch in proto.parse's output schema.  Rare flagged rows are
    re-decoded with the pure-Python codec and spliced by position."""

    def full_batch(lsn, payload):
        import numpy as np
        import pyarrow as pa

        from .parse import _CHANGE_T, _MAP_T, _OUT_ARROW_SCHEMA, _TYPEINFO_T
        from .proto import decode_row_message

        try:
            cols, slow_idx = decode_batch_native(so_path, payload)
        except NativeUtf8Error:
            # invalid UTF-8 somewhere in the batch: the python codec is the
            # arbiter (it raises per message) — decode the whole batch there
            cols, slow_idx = None, np.arange(len(payload))
        n = len(payload)
        if cols is None:
            lsn_np = lsn.cast(pa.int64()).to_numpy(zero_copy_only=False)
            events = [decode_row_message(p.as_py()) for p in payload]
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(lsn_np, pa.int64()),
                    pa.array([e["txid"] for e in events], pa.int64()),
                    pa.array([e["seq"] for e in events], pa.int32()),
                    pa.array([e["ct"] for e in events], pa.int64()),
                    pa.array([e["op"] for e in events], pa.string()),
                    pa.array([e["table"] for e in events], pa.string()),
                    pa.array([e["new"] for e in events], _MAP_T),
                    pa.array([e["old"] for e in events], _MAP_T),
                    pa.array([e["change"] for e in events], _CHANGE_T),
                    pa.array([e["typeinfo"] for e in events], _TYPEINFO_T),
                ],
                schema=_OUT_ARROW_SCHEMA,
            )
        seq = pa.array(np.zeros(n, dtype=np.int32), pa.int32())
        change = pa.nulls(n, _CHANGE_T)
        typeinfo = pa.nulls(n, _TYPEINFO_T)
        fast = pa.RecordBatch.from_arrays(
            [
                lsn.cast(pa.int64()), cols["txid"], seq, cols["ct"],
                cols["op"], cols["table"],
                cols["new"].cast(_MAP_T), cols["old"].cast(_MAP_T),
                change, typeinfo,
            ],
            schema=_OUT_ARROW_SCHEMA,
        )
        if len(slow_idx) == 0:
            return fast
        # python-decode the flagged rows, splice by original position
        lsn_np = lsn.cast(pa.int64()).to_numpy(zero_copy_only=False)
        events = [
            decode_row_message(payload[int(i)].as_py()) for i in slow_idx
        ]
        slow = pa.RecordBatch.from_arrays(
            [
                pa.array([int(lsn_np[i]) for i in slow_idx], pa.int64()),
                pa.array([e["txid"] for e in events], pa.int64()),
                pa.array([e["seq"] for e in events], pa.int32()),
                pa.array([e["ct"] for e in events], pa.int64()),
                pa.array([e["op"] for e in events], pa.string()),
                pa.array([e["table"] for e in events], pa.string()),
                pa.array([e["new"] for e in events], _MAP_T),
                pa.array([e["old"] for e in events], _MAP_T),
                pa.array([e["change"] for e in events], _CHANGE_T),
                pa.array([e["typeinfo"] for e in events], _TYPEINFO_T),
            ],
            schema=_OUT_ARROW_SCHEMA,
        )
        fast_idx = np.setdiff1d(np.arange(n), slow_idx)
        tbl = pa.Table.from_batches([fast]).take(fast_idx)
        stbl = pa.Table.from_batches([slow])
        merged = pa.concat_tables([tbl, stbl])
        order = np.argsort(np.concatenate([fast_idx, slow_idx]),
                           kind="stable")
        return merged.take(order).combine_chunks().to_batches()[0]

    return full_batch


def make_native_header_batch(so_path: str):
    """Factory for the ``header_batch`` seam: payload arrow array ->
    (txid Int64 pa.Array — nullable, python-codec parity — and op string
    pa.Array).  Uses the C decoder's headers_only mode: datum bodies are
    length-skipped, never parsed."""

    def header_batch(payload):
        import pyarrow as pa

        from .proto import decode_row_header

        try:
            cols, slow_idx = decode_batch_native(so_path, payload,
                                                 headers_only=True)
        except NativeUtf8Error:  # invalid utf8 in a TABLE name: go python
            cols, slow_idx = None, range(len(payload))
        if cols is None or len(slow_idx):
            txid = (cols["txid"].to_pylist() if cols is not None
                    else [None] * len(payload))
            ops = (cols["op"].to_pylist() if cols is not None
                   else ["?"] * len(payload))
            for i in slow_idx:  # rare: R/typeinfo/malformed rows
                t, o = decode_row_header(payload[int(i)].as_py())
                txid[int(i)] = t
                ops[int(i)] = o
            return pa.array(txid, pa.int64()), pa.array(ops, pa.string())
        return cols["txid"], cols["op"]

    return header_batch


def enable_native_proto(cache_dir: str | None = None) -> str:
    """Compile (cached) + install the C batch decoders through the
    fast-proto seam; returns the .so path.  Raises if no C compiler is
    available — call sites that want best-effort use
    :func:`try_enable_native_proto`."""
    from . import proto

    so_path = build_native_decoder(cache_dir)
    proto.set_fast_decoders(
        full_batch=make_native_full_batch(so_path),
        header_batch=make_native_header_batch(so_path),
    )
    return so_path


def try_enable_native_proto(cache_dir: str | None = None) -> str | None:
    """Best-effort enable; returns the .so path or None (no compiler /
    compile failure / disabled via LOGICALDECODING_NO_NATIVE_PROTO=1)."""
    if os.environ.get("LOGICALDECODING_NO_NATIVE_PROTO") == "1":
        return None
    try:
        return enable_native_proto(cache_dir)
    except Exception:
        return None
