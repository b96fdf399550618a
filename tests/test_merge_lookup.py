"""merge_lookup (merge-path sorted-into-sorted positions) vs numpy oracle."""
import numpy as np
import pytest

from tpu3dwsis.ops.merge_lookup import merge_lookup


@pytest.mark.parametrize("m,q,chunk", [(1000, 3000, 256), (4096, 4096, 128),
                                       (77, 300, 256), (5000, 130, 64)])
def test_matches_searchsorted(m, q, chunk):
    rng = np.random.default_rng(m * q)
    table = np.unique(rng.choice(m * 8, size=m, replace=False)).astype(np.int32)
    table = np.sort(table)
    # queries: half sampled from the table (hits), half random (misses)
    qs = np.concatenate([
        rng.choice(table, q // 2),
        rng.integers(0, m * 8, q - q // 2).astype(np.int32),
    ]).astype(np.int32)
    qs = np.sort(qs)

    pos, found = merge_lookup(table, qs, chunk=chunk)
    pos, found = np.asarray(pos), np.asarray(found)

    ref_pos = np.searchsorted(table, qs, side="left")
    ref_found = (ref_pos < len(table)) & (table[np.minimum(ref_pos, len(table) - 1)] == qs)
    np.testing.assert_array_equal(found, ref_found)
    np.testing.assert_array_equal(pos[ref_found], ref_pos[ref_found])
    # miss positions also follow searchsorted-left (clipped to m-1)
    np.testing.assert_array_equal(pos, np.minimum(ref_pos, len(table) - 1))


def test_duplicate_queries_and_sentinel_tail():
    table = np.array([2, 5, 9, 100, 2**30, 2**30 + 1], np.int32)
    qs = np.array([0, 2, 2, 3, 5, 5, 5, 9, 101, 2**30, 2**30 + 7, 2**30 + 7],
                  np.int32)
    pos, found = merge_lookup(table, qs, chunk=4)
    ref = np.searchsorted(table, qs, side="left")
    np.testing.assert_array_equal(np.asarray(pos), np.minimum(ref, len(table) - 1))
    np.testing.assert_array_equal(
        np.asarray(found),
        (ref < len(table)) & (table[np.minimum(ref, len(table) - 1)] == qs),
    )
