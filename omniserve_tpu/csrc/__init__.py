"""Native host-prep library: build-on-first-use + ctypes bindings.

Compiled with the system g++ into ``_host_prep.so`` next to the source
(no pybind11 in the image; plain C ABI + ctypes). Falls back to the
pure-numpy implementations if no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_prep.cc")
_SO = os.path.join(_DIR, "_host_prep.so")
_HASH = _SO + ".src-sha256"   # content hash of the source the .so was
                              # built from (mtimes don't survive git)

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _src_digest() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> bool:
    # build to a per-process temp path and os.replace (atomic) into place:
    # concurrent worker processes racing g++ on one output path could
    # leave a truncated .so whose hash file validates forever
    tmp = f"{_SO}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _SO)
        with open(_HASH, "w") as f:
            f.write(_src_digest())
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _stale() -> bool:
    if not os.path.exists(_SO):
        return True
    try:
        with open(_HASH) as f:
            return f.read().strip() != _src_digest()
    except OSError:
        return True


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if _stale():
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        # corrupt/foreign-arch binary: rebuild once instead of silently
        # using the numpy path forever (the hash file says "fresh")
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.pad_block_tables.argtypes = [
        i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int32, i32p
    ]
    lib.build_decode_batch.restype = ctypes.c_int
    lib.build_decode_batch.argtypes = [
        ctypes.c_int, ctypes.c_int,
        i32p, i32p, i32p, i32p, i32p, i32p, i32p,
        ctypes.c_int, ctypes.c_int,
        i32p, i32p, i8p, i32p, i32p, i32p, ctypes.c_int,
    ]
    lib.pack_prefill.argtypes = [
        ctypes.c_int, i32p, i32p, i32p, i32p, i32p, i32p
    ]
    _lib = lib
    return _lib


def _p32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _p8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


def pad_block_tables(tables: List[List[int]], width: int,
                     fill: int = 0) -> np.ndarray:
    """Ragged tables -> dense [n, width] int32."""
    n = len(tables)
    out = np.empty((n, width), np.int32)
    lib = get_lib()
    if lib is None:
        out.fill(fill)
        for i, t in enumerate(tables):
            out[i, : min(len(t), width)] = t[:width]
        return out
    flat = np.ascontiguousarray(
        np.concatenate([np.asarray(t, np.int32) for t in tables])
        if tables else np.zeros(0, np.int32)
    )
    lens = np.asarray([len(t) for t in tables], np.int32)
    lib.pad_block_tables(_p32(flat), _p32(lens), n, width,
                         np.int32(fill), _p32(out))
    return out


def build_decode_batch(
    entries, page_size: int, b_pad: int, w: int, sw: int,
    max_new_pages: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray,
           np.ndarray, int]:
    """entries: list of (slot, token, position, table, streaming_table).

    Returns (token_ids, positions, active(bool), bt, st, new_pages, n_new).
    """
    n = len(entries)
    token_ids = np.zeros(b_pad, np.int32)
    positions = np.zeros(b_pad, np.int32)
    active8 = np.zeros(b_pad, np.int8)
    bt = np.zeros((b_pad, w), np.int32)
    st = np.zeros((b_pad, sw), np.int32)
    new_pages = np.full(max_new_pages, -1, np.int32)
    lib = get_lib()
    if lib is None:
        n_new = 0
        for slot, token, pos, tbl, stbl in entries:
            token_ids[slot] = token
            positions[slot] = pos
            active8[slot] = 1
            bt[slot, : min(len(tbl), w)] = tbl[:w]
            st[slot, : min(len(stbl), sw)] = stbl[:sw]
            if pos % page_size == 0 and n_new < max_new_pages:
                pg = pos // page_size
                if pg < len(tbl):
                    new_pages[n_new] = tbl[pg]
                    n_new += 1
        return (token_ids, positions, active8.astype(bool), bt, st,
                new_pages, n_new)
    slots = np.asarray([e[0] for e in entries], np.int32)
    toks = np.asarray([e[1] for e in entries], np.int32)
    poss = np.asarray([e[2] for e in entries], np.int32)
    tbl_lens = np.asarray([len(e[3]) for e in entries], np.int32)
    stbl_lens = np.asarray([len(e[4]) for e in entries], np.int32)
    tbl_flat = np.ascontiguousarray(
        np.concatenate([np.asarray(e[3], np.int32) for e in entries])
        if n else np.zeros(0, np.int32)
    )
    stbl_flat = np.ascontiguousarray(
        np.concatenate([np.asarray(e[4], np.int32) for e in entries])
        if n else np.zeros(0, np.int32)
    )
    n_new = lib.build_decode_batch(
        n, page_size, _p32(slots), _p32(toks), _p32(poss),
        _p32(tbl_flat), _p32(tbl_lens), _p32(stbl_flat), _p32(stbl_lens),
        w, sw, _p32(token_ids), _p32(positions), _p8(active8), _p32(bt),
        _p32(st), _p32(new_pages), max_new_pages,
    )
    return (token_ids, positions, active8.astype(bool), bt, st, new_pages,
            int(n_new))
