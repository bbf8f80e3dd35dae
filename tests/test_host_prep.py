"""Native host-prep library vs numpy fallback equivalence."""

import numpy as np
import pytest

from omniserve_tpu import csrc


def test_library_builds():
    lib = csrc.get_lib()
    assert lib is not None, "g++ build of _host_prep.so failed"


def test_pad_block_tables():
    tables = [[1, 2, 3], [7], [], [4, 5, 6, 8, 9]]
    out = csrc.pad_block_tables(tables, width=4, fill=-1)
    want = np.array([[1, 2, 3, -1], [7, -1, -1, -1], [-1] * 4,
                     [4, 5, 6, 8]], np.int32)
    np.testing.assert_array_equal(out, want)


def test_build_decode_batch_matches_fallback():
    rng = np.random.default_rng(0)
    entries = []
    for i in range(12):
        tbl = rng.integers(0, 100, size=rng.integers(1, 6)).tolist()
        stbl = rng.integers(0, 100, size=rng.integers(1, 3)).tolist()
        pos = int(rng.integers(0, 300))
        entries.append((i, int(rng.integers(0, 1000)), pos, tbl, stbl))
    # one entry exactly on a page boundary
    entries[3] = (3, 42, 128, [11, 22, 33], [5])

    args = dict(page_size=128, b_pad=16, w=8, sw=4, max_new_pages=8)
    native = csrc.build_decode_batch(entries, **args)

    lib_save = csrc._lib
    csrc._lib = None
    tried_save = csrc._tried
    csrc._tried = True  # force fallback
    try:
        fallback = csrc.build_decode_batch(entries, **args)
    finally:
        csrc._lib = lib_save
        csrc._tried = tried_save

    for a, b in zip(native, fallback):
        if isinstance(a, np.ndarray):
            np.testing.assert_array_equal(a, b)
        else:
            assert a == b
