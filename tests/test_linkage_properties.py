"""Property-based checks for the linkage operator: blocked fuzzy
matching must equal the brute-force result restricted to co-blocked
pairs — perfect precision, and completeness within the blocking."""

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abc", min_size=1, max_size=4)


def _lev(a: str, b: str) -> int:
    # classic DP, reference implementation
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(_word, st.integers(min_value=0, max_value=2)),
        min_size=2,
        max_size=10,
    )
)
def test_fuzzy_pairs_equals_bruteforce_within_blocks(spark, rows):
    from python_plugins_spark.operators.linkage import fuzzy_pairs

    data = [(i, t, b) for i, (t, b) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, t string, blk int")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "t", [["blk"]], max_dist=1).collect()
    }
    want = set()
    for (ia, ta, ba), (ib, tb, bb) in itertools.combinations(data, 2):
        if ba == bb and _lev(ta, tb) <= 1:
            want.add((min(ia, ib), max(ia, ib), _lev(ta, tb)))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(_word, _word, st.integers(min_value=0, max_value=1)),
        min_size=2,
        max_size=8,
    )
)
def test_fuzzy_pairs_multipass_is_union_of_passes(spark, rows):
    """Two blocking passes must produce exactly the deduplicated union
    of each pass run alone."""
    from python_plugins_spark.operators.linkage import fuzzy_pairs

    data = [(i, t, b, s) for i, (t, b, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, t string, b1 string, b2 int")

    def run(blocks):
        return {
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_pairs(df, "id", "t", blocks, max_dist=1).collect()
        }

    assert run([["b1"], ["b2"]]) == run([["b1"]]) | run([["b2"]])


# ---------------------------------------------- wrangler properties

@settings(max_examples=15, deadline=None)
@given(
    vals=st.lists(
        st.text(alphabet="ab.|c", min_size=0, max_size=8), min_size=1, max_size=6
    ),
    n=st.integers(min_value=1, max_value=5),
)
def test_wrangler_mask_preserves_length(spark, vals, n):
    from python_plugins_spark.operators.wrangler import wrangle

    df = spark.createDataFrame([(v,) for v in vals], "s string")
    out = [r.s for r in wrangle(df, [f"mask-last-n s {n}"]).collect()]
    assert sorted(len(o) for o in out) == sorted(len(v) for v in vals)
    for o in out:
        assert o.endswith("*" * min(n, len(o))) or len(o) == 0


@settings(max_examples=15, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=5),
            st.text(alphabet="cd", min_size=1, max_size=5),
        ),
        min_size=1,
        max_size=5,
    ),
    delim=st.sampled_from([".", "|", "+", "-", ","]),
)
def test_wrangler_split_literal_delimiter(spark, pairs, delim):
    """split-to-columns must treat regex metacharacters as literal
    delimiters (the review-pass fix)."""
    from python_plugins_spark.operators.wrangler import wrangle

    rows = [(a + delim + b, a, b) for a, b in pairs]
    df = spark.createDataFrame(rows, "s string, ea string, eb string")
    out = wrangle(df, [f'split-to-columns s "{delim}" ga gb']).collect()
    for r in out:
        assert r.ga == r.ea and r.gb == r.eb, (r.s, delim)
