"""FastSS edit-distance-1 pair join (ops/fuzzyjoin.py): lossless blocking
+ vectorized verification vs a brute-force reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from etl_ray.ops.fuzzyjoin import _deletion_signatures, _lev_le1_mask


def _lev(a: str, b: str) -> int:
    # tiny reference DP, test-only
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = min(d[j] + 1, d[j - 1] + 1,
                      prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return d[n]


def test_lev_le1_mask_matches_reference_dp():
    rng = np.random.default_rng(3)
    alpha = list("abcd")
    strs = ["".join(rng.choice(alpha, rng.integers(0, 6)))
            for _ in range(300)]
    a = np.asarray(strs[:150], dtype="U")
    b = np.asarray(strs[150:], dtype="U")
    got = _lev_le1_mask(a, b)
    for x, y, g in zip(a, b, got):
        ref = min(_lev(str(x), str(y)), 2)
        assert g == ref, (x, y, g, ref)


def test_deletion_signatures_complete_for_lev1():
    # every lev<=1 pair must share a signature (lossless blocking)
    rng = np.random.default_rng(7)
    alpha = list("ab")
    strs = sorted({"".join(rng.choice(alpha, rng.integers(1, 5)))
                   for _ in range(60)})
    arr = np.asarray(strs, dtype="U")
    rows, sigs = _deletion_signatures(arr)
    by_row = {}
    for r, s in zip(rows, sigs):
        by_row.setdefault(int(r), set()).add(str(s))
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            if _lev(strs[i], strs[j]) <= 1:
                assert by_row[i] & by_row[j], (strs[i], strs[j])


@pytest.mark.usefixtures("ray_session")
def test_edit1_pairs_end_to_end():
    import ray.data as rd

    from etl_ray.ops.fuzzyjoin import edit1_pairs

    names = ["kitten", "sitten", "mitten", "kitte", "kittens",
             "banana", "banane", "apple", "apple"]
    df = pd.DataFrame({"id": np.arange(len(names), dtype=np.int64),
                       "name": names})
    out = edit1_pairs(rd.from_arrow(pa.Table.from_pandas(df)),
                      id_col="id", text_col="name").to_pandas()
    got = {(r.id_a, r.id_b): r.dist for r in out.itertuples()}
    exp = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = _lev(names[i], names[j])
            if d <= 1:
                exp[(i, j)] = d
    assert got == exp
    assert got[(7, 8)] == 0  # identical strings, distinct ids
