"""Native extension loader: compiles the C++ HNSW builder on first use.

ctypes-based (no pybind11 in this environment). The shared library is
compiled once into ``native/build/`` and cached; set
``VECTORLITE_NO_NATIVE=1`` to force the pure-Python fallback.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

logger = logging.getLogger("vectorlite_tpu.native")

_HERE = Path(__file__).parent
_BUILD_DIR = _HERE / "build"
_SRC = _HERE / "hnsw_builder.cpp"
_LIB_PATH = _BUILD_DIR / "libhnsw_builder.so"

_STAMP_PATH = _BUILD_DIR / "isa.stamp"

_VLC_SRC = _HERE / "vlc_emit.cpp"
_VLC_LIB_PATH = _BUILD_DIR / "libvlc_emit.so"

_lock = threading.Lock()
_lib = None
_load_failed = False
_vlc_lib = None
_vlc_load_failed = False


def _isa_fingerprint() -> str:
    """Host vector-ISA fingerprint. A -march=native .so cached in the
    repo can SIGILL when the checkout moves to a host without the same
    extensions (NFS home, copied container layer); the stamp forces a
    recompile there instead."""
    import platform
    import re

    try:
        text = Path("/proc/cpuinfo").read_text()
        m = re.search(r"^flags\s*:\s*(.*)$", text, re.M)
        if m:
            relevant = {"sse4_2", "avx", "avx2", "fma", "avx512f"}
            flags = sorted(set(m.group(1).split()) & relevant)
            if flags:
                return platform.machine() + ":" + "-".join(flags)
    except OSError:
        pass
    return platform.machine()


def _compile() -> None:
    _BUILD_DIR.mkdir(exist_ok=True)
    base = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-funroll-loops",
        "-fopenmp-simd",
        "-pthread",
        str(_SRC),
        "-o",
        str(_LIB_PATH),
    ]
    # -march=native unlocks the AVX-512/AVX2 distance kernels; fall back
    # to the baseline ISA (scalar multi-accumulator loops) if the local
    # toolchain rejects it (e.g. unusual cross-compile environments).
    for extra in (["-march=native"], []):
        cmd = base[:1] + extra + base[1:]
        logger.info("compiling native hnsw builder: %s", " ".join(cmd))
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            _STAMP_PATH.write_text(_isa_fingerprint())
            return
        except subprocess.CalledProcessError:
            if not extra:
                raise


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    p = c.POINTER
    lib.hnsw_new.restype = c.c_void_p
    lib.hnsw_new.argtypes = [c.c_int32] * 5 + [c.c_uint64]
    lib.hnsw_free.argtypes = [c.c_void_p]
    lib.hnsw_bind.argtypes = [
        c.c_void_p,
        p(c.c_float),
        p(c.c_float),
        p(c.c_float),
        p(c.c_int32),
        p(c.c_int32),
        c.c_int64,
    ]
    lib.hnsw_insert_batch.argtypes = [c.c_void_p, c.c_int64, c.c_int64]
    lib.hnsw_insert_batch_parallel.argtypes = [
        c.c_void_p,
        c.c_int64,
        c.c_int64,
        c.c_int32,
    ]
    lib.hnsw_search_batch.argtypes = [
        c.c_void_p,
        p(c.c_float),
        c.c_int64,
        c.c_int32,
        p(c.c_int32),
        p(c.c_float),
        p(c.c_int32),
        c.c_int32,
    ]
    lib.hnsw_insert_leveled.argtypes = [c.c_void_p, c.c_int64, c.c_int32]
    lib.hnsw_set_keep_pruned.argtypes = [c.c_void_p, c.c_int32]
    lib.hnsw_draw_levels.argtypes = [c.c_void_p, c.c_int64, p(c.c_int32)]
    lib.hnsw_bulk_link_heuristic_l0.argtypes = [
        c.c_void_p,
        p(c.c_int64),
        c.c_int64,
        c.c_int32,
        p(c.c_int32),
        p(c.c_float),
        c.c_int32,  # worker threads (1 = single-threaded)
    ]
    lib.hnsw_refine_l0.argtypes = [c.c_void_p, c.c_int32, c.c_int32]
    lib.hnsw_entry.restype = c.c_int64
    lib.hnsw_entry.argtypes = [c.c_void_p]
    lib.hnsw_top_level.restype = c.c_int32
    lib.hnsw_top_level.argtypes = [c.c_void_p]
    lib.hnsw_num_nodes.restype = c.c_int64
    lib.hnsw_num_nodes.argtypes = [c.c_void_p]
    lib.hnsw_num_upper_levels.restype = c.c_int32
    lib.hnsw_num_upper_levels.argtypes = [c.c_void_p]
    lib.hnsw_get_upper.argtypes = [
        c.c_void_p,
        c.c_int32,
        p(c.c_int32),
        c.c_int64,
    ]
    lib.hnsw_descend.restype = c.c_int64
    lib.hnsw_descend.argtypes = [c.c_void_p, p(c.c_float)]
    lib.hnsw_descend_batch.argtypes = [
        c.c_void_p,
        p(c.c_float),
        c.c_int64,
        p(c.c_int64),
    ]
    lib.hnsw_search.restype = c.c_int32
    lib.hnsw_search.argtypes = [
        c.c_void_p,
        p(c.c_float),
        c.c_int32,
        p(c.c_int32),
        p(c.c_float),
    ]
    lib.hnsw_restore.argtypes = [
        c.c_void_p,
        c.c_int64,
        c.c_int64,
        c.c_int32,
        c.c_int32,
        p(c.c_int32),
    ]
    lib.hnsw_drain_dirty.restype = c.c_int64
    lib.hnsw_drain_dirty.argtypes = [c.c_void_p, p(c.c_int32), c.c_int64]
    lib.hnsw_dirty_count.restype = c.c_int64
    lib.hnsw_dirty_count.argtypes = [c.c_void_p]
    try:
        # absent only from a pre-round-3 cached .so (mtime staleness
        # recompiles those); don't lose the whole lib over it
        lib.flat_rescore_f64.argtypes = [
            p(c.c_double),  # vals [cap, D]
            p(c.c_double),  # norms [cap] (cosine only; else null)
            p(c.c_double),  # q [B, D]
            p(c.c_int64),  # slots [B, K]
            p(c.c_double),  # out [B, K]
            c.c_int64,  # D
            c.c_int64,  # B
            c.c_int64,  # K
            c.c_int32,  # metric: 0=cos 1=euc 2=dot 3=l1
        ]
    except AttributeError:
        pass
    return lib


def _bind_vlc(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    p = c.POINTER
    lib.vlc_fmt_f64.restype = c.c_int32
    lib.vlc_fmt_f64.argtypes = [c.c_double, c.c_char_p]
    lib.vlc_emit_f64_elems.restype = c.c_int64
    lib.vlc_emit_f64_elems.argtypes = [
        p(c.c_double),
        c.c_int64,
        c.c_int32,
        c.c_int32,
        c.c_char_p,
        c.c_int64,
    ]
    lib.vlc_emit_i64_elems.restype = c.c_int64
    lib.vlc_emit_i64_elems.argtypes = [
        p(c.c_int64),
        c.c_int64,
        c.c_int32,
        c.c_int32,
        c.c_char_p,
        c.c_int64,
    ]
    lib.vlc_emit_rows.restype = c.c_int64
    lib.vlc_emit_rows.argtypes = [
        p(c.c_uint64),  # ids
        p(c.c_double),  # vals [n, d]
        c.c_int64,  # n_rows
        c.c_int64,  # d
        c.c_char_p,  # texts (raw utf-8, concatenated)
        p(c.c_int64),  # text_offs [n+1]
        c.c_char_p,  # metas (pre-rendered fragments, concatenated)
        p(c.c_int64),  # meta_offs [n+1]
        c.c_int32,  # elem_indent
        c.c_int32,  # last_no_comma
        c.c_char_p,  # out
        c.c_int64,  # out_cap
    ]
    lib.vlc_emit_keyed_arrays.restype = c.c_int64
    lib.vlc_emit_keyed_arrays.argtypes = [
        c.c_char_p,  # keys (raw utf-8, concatenated)
        p(c.c_int64),  # key_offs [n+1]
        p(c.c_double),  # vals (concatenated)
        p(c.c_int64),  # lens [n]
        c.c_int64,  # n
        c.c_int32,  # elem_indent
        c.c_int32,  # last_no_comma
        c.c_char_p,  # out
        c.c_int64,  # out_cap
    ]
    lib.vlc_parse_doc.restype = c.c_int32
    lib.vlc_parse_doc.argtypes = [
        c.c_char_p,  # doc
        c.c_int64,  # len
        c.c_char_p,  # nonce
        c.c_void_p,  # skel buffer
        c.c_int64,  # skel cap
        p(c.c_double),  # dvals
        c.c_int64,  # dcap
        p(c.c_int64),  # ivals
        c.c_int64,  # icap
        p(c.c_int64),  # lens
        c.c_int64,  # lens cap
        p(c.c_int64),  # out_counts[4]
    ]
    return lib


def load_vlc():
    """Return the bound .vlc emitter CDLL, or None when unavailable.

    The emitter is ISA-independent (no -march=native), so there is no
    fingerprint stamp — mtime staleness only.
    """
    global _vlc_lib, _vlc_load_failed
    if _vlc_lib is not None:
        return _vlc_lib
    if _vlc_load_failed or os.environ.get("VECTORLITE_NO_NATIVE") == "1":
        return None
    with _lock:
        if _vlc_lib is not None:
            return _vlc_lib
        try:
            if not _VLC_LIB_PATH.exists() or (
                _VLC_SRC.stat().st_mtime > _VLC_LIB_PATH.stat().st_mtime
            ):
                _BUILD_DIR.mkdir(exist_ok=True)
                cmd = [
                    "g++",
                    "-O3",
                    "-std=c++17",
                    "-shared",
                    "-fPIC",
                    str(_VLC_SRC),
                    "-o",
                    str(_VLC_LIB_PATH),
                ]
                logger.info("compiling native vlc emitter: %s", " ".join(cmd))
                subprocess.run(cmd, check=True, capture_output=True)
            _vlc_lib = _bind_vlc(ctypes.CDLL(str(_VLC_LIB_PATH)))
        except Exception as e:  # noqa: BLE001
            logger.warning(
                "native vlc emitter unavailable (%s); "
                "falling back to pure Python",
                e,
            )
            _vlc_load_failed = True
            return None
    return _vlc_lib


def load():
    """Return the bound CDLL, or None when unavailable/disabled."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or os.environ.get("VECTORLITE_NO_NATIVE") == "1":
        return None
    with _lock:
        if _lib is not None:
            return _lib
        try:
            stale = not _LIB_PATH.exists() or (
                _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
            )
            if not stale:
                try:
                    stale = _STAMP_PATH.read_text() != _isa_fingerprint()
                except OSError:
                    stale = True  # pre-stamp cache: rebuild once
            if stale:
                _compile()
            _lib = _bind(ctypes.CDLL(str(_LIB_PATH)))
        except Exception as e:  # noqa: BLE001
            logger.warning(
                "native hnsw builder unavailable (%s); "
                "falling back to pure Python",
                e,
            )
            _load_failed = True
            return None
    return _lib
