"""Boundary-integer property tests for the plan-time dispatch/sizing
scalars (VERDICT r12 #8): `choose_jaccard_path`, `srp_recall_bands`,
`srp_adaptive_bits`, `ivf_adaptive_stride`, `lsh_adaptive_bits`.

These functions all derive a plan shape from a 1-scalar count, and
each has an integer-exact SQL twin replayed in the driver oracle
(length(bin(x)) for bit_length, ceil(sqrt(count(*))), a (w -> b)
VALUES lookup). An off-by-one at a power-of-two or overflow boundary
would diverge Spark from its oracle at a corpus size no sf ever hits
— exactly the silent class a property test at the boundaries kills.

No SparkSession needed: every function under test is pure.
"""

from __future__ import annotations

import math
import warnings

import pytest

BOUNDARY_NS = sorted(
    {1, 2, 3}
    | {2**k for k in range(1, 33)}
    | {2**k - 1 for k in range(2, 33)}
    | {2**k + 1 for k in range(1, 33)}
    | {2**31 - 1, 2**31, 2**31 + 1, 2**40, 2**52}
)


@pytest.mark.parametrize("n", BOUNDARY_NS)
def test_srp_adaptive_bits_boundaries(n):
    from hgn_spark.operators.dedup import SRP_MAX_BITS, srp_adaptive_bits

    got = srp_adaptive_bits(n)
    # the clamp bounds always hold
    assert 2 <= got <= SRP_MAX_BITS
    # integer-exact reference: 2 * ceil(log2 n) with exact arithmetic
    want = max(2, min(SRP_MAX_BITS, 2 * max(0, (n - 1).bit_length())))
    # libm log2 of an exact power of two is exact; elsewhere ceil(log2)
    # equals bit_length(n-1). Assert against the exact form so a future
    # libm-rounding surprise in the Python side shows up here.
    assert got == want, n


@pytest.mark.parametrize("n", BOUNDARY_NS)
def test_ivf_adaptive_stride_boundaries(n):
    from hgn_spark.operators.similarity import ivf_adaptive_stride

    s = ivf_adaptive_stride(n)
    # defining property of ceil(sqrt(n)), checked in exact integers
    assert s >= 1
    assert s * s >= n, n
    assert (s - 1) * (s - 1) < n, n


@pytest.mark.parametrize(
    "n", [n for n in BOUNDARY_NS if n <= 2**40]
)
def test_srp_recall_bands_boundaries(n):
    from hgn_spark.operators.dedup import SRP_MAX_BANDS, srp_recall_bands

    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        bits, b = srp_recall_bands(n)
    w = bits // b
    assert bits == b * w
    # width is the integer-exact ceil(log2 n), floored at 2
    assert w == max(2, (max(n, 2) - 1).bit_length()), n
    assert 1 <= b <= SRP_MAX_BANDS
    p = 1.0 - math.acos(0.9) / math.pi
    if b < SRP_MAX_BANDS:
        # un-capped: b is the minimal band count meeting the design
        # recall (minimality = one fewer band misses it)
        assert 1.0 - (1.0 - p**w) ** b >= 0.95, n
        if b > 1:
            assert 1.0 - (1.0 - p**w) ** (b - 1) < 0.95, n
        assert not wlist, n
    else:
        # budget binds -> the truncation must be LOUD (r13: the r12
        # cap was silent, which is how a revoked design recall shipped)
        want = math.ceil(math.log(0.05) / math.log(1.0 - p**w))
        if want > SRP_MAX_BANDS:
            assert len(wlist) == 1, n
            assert "band budget" in str(wlist[0].message)


def test_srp_recall_bands_cap_cannot_move_driver_hashes():
    """The r13 budget raise (64 -> SRP_MAX_BANDS) must not change any
    (w, b) pair the driver oracle's VALUES lookup covers: for every
    w <= SRP_RECALL_MAX_W the un-capped b_want stays under the OLD cap,
    so the raise is provably invisible at every driver scale."""
    from hgn_spark.operators.dedup import (
        SRP_RECALL_MAX_PLANES,
        SRP_RECALL_MAX_W,
        srp_recall_bands,
    )

    for w in range(2, SRP_RECALL_MAX_W + 1):
        n = (1 << (w - 1)) + 1  # smallest corpus with this width
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            bits, b = srp_recall_bands(n)
        assert bits // b == w
        assert b < 64, (w, b)  # under the OLD cap -> identical sizing
        assert not wlist
        assert bits <= SRP_RECALL_MAX_PLANES


def test_srp_recall_bands_binding_region_is_quantified():
    """Past the budget the function must still return a buildable
    configuration AND the warning must carry the effective recall —
    the number a deployment decides with."""
    from hgn_spark.operators.dedup import SRP_MAX_BANDS, srp_recall_bands

    n = 10**11  # the 100 TB tier: b_want ~ 927 > 256
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        bits, b = srp_recall_bands(n)
    assert b == SRP_MAX_BANDS
    assert len(wlist) == 1
    msg = str(wlist[0].message)
    assert "expected recall" in msg and "0.9" in msg
    # and an explicit larger budget removes the truncation
    with warnings.catch_warnings(record=True) as wlist2:
        warnings.simplefilter("always")
        bits2, b2 = srp_recall_bands(n, max_bands=1024)
    assert b2 > SRP_MAX_BANDS and not wlist2


@pytest.mark.parametrize(
    "max_df,df_cap,want",
    [
        (0, 16, "exact"),
        (16, 16, "exact"),        # boundary: equality stays exact
        (17, 16, "capped"),       # first over-cap df flips the path
        (2**31 - 1, 16, "capped"),
        (2**31, 2**31, "exact"),
        (2**31 + 1, 2**31, "capped"),
        (1, 1, "exact"),
        (2, 1, "capped"),
    ],
)
def test_choose_jaccard_path_boundaries(max_df, df_cap, want):
    from hgn_spark.operators.dedup import choose_jaccard_path

    assert choose_jaccard_path(max_df, df_cap) == want


@pytest.mark.parametrize("n", [n for n in BOUNDARY_NS if n >= 2])
def test_lsh_adaptive_bits_boundaries(n):
    from hgn_spark.operators.similarity import (
        LSH_MAX_BITS,
        LSH_TARGET_BUCKET,
        lsh_adaptive_bits,
    )

    got = lsh_adaptive_bits(n)
    assert 1 <= got <= LSH_MAX_BITS
    # integer-exact reference: ceil(log2(n / target)) via bit_length
    # of the ceiling-divided quotient
    q = -(-n // LSH_TARGET_BUCKET)  # ceil div
    want = max(1, min(LSH_MAX_BITS, max(0, (q - 1).bit_length())))
    assert got == want, n
