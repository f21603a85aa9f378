"""Property-based tests (hypothesis) — coverage the reference's suite lacks.

Two kinds:
* pure-Python properties (pattern detector, regex translation) — cheap,
  many examples
* Spark-backed properties (iterable codec round-trip, search vs a pandas
  reference emulation) — few examples, each a real plan execution
"""

import math
import re

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from intake_esm_spark.plans.predicates import is_pattern, to_java_regex
from intake_esm_spark.plans.query import Query
from intake_esm_spark.plans import predicates
from intake_esm_spark.sources import catalog_io

identifier = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127),
    min_size=1,
    max_size=8,
)


@given(st.text(alphabet=st.characters(blacklist_characters="*?$^\\", max_codepoint=127), max_size=30))
def test_is_pattern_false_without_wildcards(s):
    assert is_pattern(s) is False


@given(
    st.text(alphabet=st.characters(blacklist_characters="*?$^\\", max_codepoint=127), max_size=10),
    st.sampled_from(["*", "?", "$", "^"]),
)
def test_is_pattern_true_with_wildcard(prefix, wc):
    assert is_pattern(prefix + wc) is True


@given(identifier)
def test_java_regex_matches_python_for_literals(s):
    """For plain literals (no metachars) the translated pattern must match
    exactly the strings Python re matches (substring search semantics)."""
    pat = to_java_regex(s)
    assert pat == s


@settings(max_examples=10, deadline=None)
@given(
    st.lists(identifier, min_size=1, max_size=5, unique=True),
    st.sampled_from(["list", "tuple", "set"]),
)
def test_iterable_codec_round_trip(spark, values, kind):
    """serialize-with-container-kind -> decode -> same elements."""
    if kind == "list":
        cell = "[" + ", ".join(f"'{v}'" for v in values) + "]"
    elif kind == "tuple":
        body = ", ".join(f"'{v}'" for v in values)
        cell = f"({body},)" if len(values) == 1 else f"({body})"
    else:
        cell = "{" + ", ".join(f"'{v}'" for v in values) + "}"
    df = spark.createDataFrame([(cell,)], ["v"])
    out = df.select(catalog_io.decode_iterable_column("v")).collect()[0]["v"]
    assert sorted(out) == sorted(values)


def _pandas_reference_search(df, query):
    """The reference's search semantics re-implemented on pandas as an
    oracle (OR within column, AND across, NaN -> isnull, pattern -> regex
    substring search)."""
    import numpy as np

    if not query:
        return df.iloc[0:0]
    mask = np.ones(len(df), dtype=bool)
    for col, values in query.items():
        local = np.zeros(len(df), dtype=bool)
        for v in values:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                local |= df[col].isnull().to_numpy()
            elif isinstance(v, str) and is_pattern(v):
                local |= df[col].str.contains(v, regex=True, na=False).to_numpy()
            else:
                local |= (df[col] == v).fillna(False).to_numpy()
        mask &= local
    return df[mask]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a1", "b2", "c3", None]),
            st.sampled_from(["X", "Y", "Z"]),
        ),
        min_size=1,
        max_size=12,
    ),
    st.dictionaries(
        st.sampled_from(["u", "v"]),
        st.lists(
            st.sampled_from(["a1", "b2", "X", "Y", "^a.*", None]),
            min_size=1,
            max_size=2,
            unique_by=lambda x: str(x),
        ),
        min_size=1,
        max_size=2,
    ),
)
def test_search_matches_pandas_reference(spark, rows, query):
    pdf = pd.DataFrame(rows, columns=["u", "v"])
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notnull(pdf), None))
    q = Query.normalize(query, ["u", "v"])
    got = sorted(
        (tuple("<null>" if x is None else x for x in r))
        for r in predicates.search(sdf, q).collect()
    )
    exp_df = _pandas_reference_search(pdf, q.query)
    exp = sorted(
        tuple("<null>" if (x is None or (isinstance(x, float) and math.isnan(x))) else x for x in r)
        for r in exp_df.itertuples(index=False, name=None)
    )
    assert got == exp


def _pandas_reference_division(df, query, require_all_on):
    """Literal re-implementation of the reference's division semantics
    (_search.py:61-99) on pandas, used as the oracle: group by
    require_all_on, keep groups whose key-tuple set contains the full
    Cartesian product of the remaining query values."""
    import itertools

    sub = {c: v for c, v in query.items() if c not in require_all_on}
    keys = list(sub)
    if not keys:
        return df
    condition = set(itertools.product(*[tuple(v) for v in sub.values()]))
    kept = []
    for _, group in df.groupby(require_all_on):
        index = {tuple(r) for r in group[keys].itertuples(index=False, name=None)}
        if condition.issubset(index):
            kept.append(group)
    return pd.concat(kept) if kept else df.iloc[0:0]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.sampled_from(["a", "b"]),
            st.sampled_from(["x", "y", "z"]),
        ),
        min_size=1,
        max_size=14,
    ),
    st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=2, unique=True),
    st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=2, unique=True),
)
def test_division_matches_pandas_reference(spark, rows, vals_u, vals_v):
    """Spark require_all_on == the reference's pandas algorithm for random
    frames and random two-column conditions grouped by g."""
    from intake_esm_spark.operators.division import apply_require_all_on

    pdf = pd.DataFrame(rows, columns=["g", "u", "v"])
    query = {"u": list(vals_u), "v": list(vals_v)}
    q = Query.normalize(query, ["g", "u", "v"], require_all_on=["g"])
    sdf = spark.createDataFrame(pdf)
    searched = predicates.search(sdf, q)
    got = sorted(
        tuple(r) for r in apply_require_all_on(searched, q).collect()
    )
    searched_pd = _pandas_reference_search(pdf, q.query)
    exp = sorted(
        tuple(r)
        for r in _pandas_reference_division(searched_pd, q.query, ["g"]).itertuples(
            index=False, name=None
        )
    )
    assert got == exp


def test_query_normalize_scalar_vs_list_equivalence():
    q1 = Query.normalize({"a": "x"}, ["a"])
    q2 = Query.normalize({"a": ["x"]}, ["a"])
    assert q1.query == q2.query


@given(st.sampled_from([re.IGNORECASE, re.DOTALL, re.MULTILINE, re.IGNORECASE | re.DOTALL]))
def test_compiled_pattern_flags_translate(flags):
    pat = re.compile("ab.c", flags)
    out = to_java_regex(pat)
    assert out.startswith("(?")
    if flags & re.IGNORECASE:
        assert "i" in out[: out.index(")")]


# -- round-4 operator properties ---------------------------------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)).filter(lambda p: p[0] != p[1]),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_connected_components_equals_union_find(spark, pairs):
    """Hypothesis-generated pair graphs: the large-star/small-star
    fixpoint must equal a driver-side union-find on every graph."""
    from intake_esm_spark.operators import dedup

    if not pairs:
        return
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in {x for p in pairs for x in p}}
    got = {
        r["doc_id"]: r["component_id"]
        for r in dedup.connected_components(
            spark.createDataFrame(list(pairs), "id_a long, id_b long")
        ).collect()
    }
    assert got == expected


from hypothesis import example


@given(
    st.text(
        # control characters INCLUDED (only NUL excluded — parameter
        # binding chokes on it): Java-\s vs RE2-\s divergence lives at
        # U+000B, which a Cc blacklist would silently exempt
        alphabet=st.characters(min_codepoint=1, max_codepoint=127),
        max_size=120,
    )
)
@example("see https://a.b\x0bnext")  # the \s-portability regression shape
@example("pi is 3.14159265 and id 12345678")  # must NOT phone-redact
@example("call +44 20 7946 0958 or (555) 123-4567")
@settings(max_examples=40, deadline=None)
def test_redaction_portable_java_vs_re2(spark, text):
    """Arbitrary ASCII text (control chars included): the redaction chain
    must produce the SAME output under Spark's Java regex and DuckDB's
    RE2 — the portability contract the text_redact oracle rests on."""
    from intake_esm_spark.functions import text as tx
    from pyspark.sql import functions as F

    import duckdb

    got = (
        spark.createDataFrame([(text,)], "text string")
        .select(tx.redact_pii(F.col("text")))
        .collect()[0][0]
    )
    cur = text
    for _, pattern, token in tx.REDACTION_PATTERNS:
        cur = duckdb.execute(
            "SELECT regexp_replace(?, ?, ?, 'g')", [cur, pattern, token]
        ).fetchone()[0]
    assert got == cur


# --- structural line dedup vs a pure-python reference -----------------------

_line_text = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=6), min_size=1, max_size=5
).map(lambda ls: "\n".join(ls))


def _norm_line(line: str) -> str:
    return re.sub(r"\s+", " ", line.lower()).strip()


def _ref_line_dedup(docs: dict, min_doc_freq: int, keep: str) -> dict:
    """Driver-side reference implementation of line_dedup."""
    from collections import defaultdict

    holders = defaultdict(set)
    for did, text in docs.items():
        for line in text.split("\n"):
            holders[_norm_line(line)].add(did)
    first = {fp: min(ds) for fp, ds in holders.items()}
    out = {}
    for did, text in docs.items():
        kept = []
        for line in text.split("\n"):
            fp = _norm_line(line)
            ok = len(holders[fp]) < min_doc_freq
            if keep == "first":
                ok = ok or first[fp] == did
            if ok:
                kept.append(line)
        out[did] = "\n".join(kept)
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=9), _line_text, min_size=1, max_size=6
    ),
    st.integers(min_value=2, max_value=3),
    st.sampled_from(["none", "first"]),
)
def test_line_dedup_matches_python_reference(spark, docs, min_doc_freq, keep):
    from intake_esm_spark.operators import structural

    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in structural.line_dedup(
            df, min_doc_freq=min_doc_freq, keep=keep
        ).collect()
    }
    assert got == _ref_line_dedup(docs, min_doc_freq, keep)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.sampled_from(["s0", "s1", "s2"]),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.lists(
        st.floats(min_value=0.1, max_value=5.0, allow_nan=False),
        min_size=2,
        max_size=2,
    ),
)
def test_mixture_rates_feasible_and_binding(spark, rows, weights):
    """Rates are in (0, 1], the binding source keeps everything, and the
    realized masses are within one row of the target proportions' cap."""
    from intake_esm_spark.operators import mixing

    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    present = {s for _, s in rows}
    wmap = dict(zip(["s0", "s1"], weights))
    if not (present & set(wmap)):
        return
    rates = mixing.source_mixture_rates(df, wmap).collect()
    assert rates  # at least the intersecting sources
    by_src = {r["source"]: r for r in rates}
    assert all(0.0 < r["rate"] <= 1.0 for r in rates)
    # the binding source (min mass/target_w) has rate exactly 1.0
    binding = min(rates, key=lambda r: r["mass"] / r["target_w"])
    assert binding["rate"] == pytest.approx(1.0)
    # realized mass never exceeds the feasibility cap w_s * T
    t = min(r["mass"] / r["target_w"] for r in rates)
    for r in rates:
        assert r["rate"] * r["mass"] <= r["target_w"] * t + 1e-9


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.sampled_from([1.0, 2.0, 3.0, 5.0, 8.0]), min_size=1, max_size=12),
    st.lists(st.sampled_from([1.0, 2.0, 4.0, 5.0, 9.0]), min_size=1, max_size=12),
)
def test_ks_statistic_equals_python_ecdf(spark, xs, ys):
    """Hypothesis-generated tied samples: the operator's D must equal
    the max pooled-ECDF gap computed driver-side (exact rationals)."""
    from intake_esm_spark.operators.experiment import ks_test_report

    rows = [("t", v) for v in xs] + [("c", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_test_report(df, "g", "v", "t", "c").collect()[0]
    n1, n2 = len(xs), len(ys)
    vals = sorted(set(xs + ys))
    d_num = max(
        abs(
            sum(1 for x in xs if x <= v) * n2
            - sum(1 for y in ys if y <= v) * n1
        )
        for v in vals
    )
    assert r["d_stat"] == round(d_num / (n1 * n2), 6)
    assert (r["n_treat"], r["n_control"]) == (n1, n2)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "dd", "ee", "f", "g", "hh"]),
        min_size=1,
        max_size=60,
    )
)
def test_cm_overestimate_property(spark, stream):
    """Every streamed item's estimate >= its exact count, on arbitrary
    streams and a deliberately collision-prone 8-bucket width."""
    from collections import Counter

    from intake_esm_spark.operators.sketch import cm_estimate, cm_sketch

    df = spark.createDataFrame([(v,) for v in stream], "it string")
    sk = cm_sketch(df, "it", depth=3, width=8)
    probes = spark.createDataFrame([(v,) for v in set(stream)], "it string")
    est = {
        r["it"]: r["cm_est"]
        for r in cm_estimate(sk, probes, "it", depth=3, width=8).collect()
    }
    exact = Counter(stream)
    for item, n in exact.items():
        assert est[item] >= n
        assert est[item] <= len(stream)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False).map(
            lambda v: round(v, 3)
        ),
        min_size=2,
        max_size=20,
    ),
    st.sampled_from([2.0, 3.0]),
)
def test_mad_flags_equal_python_reference(spark, vals, k):
    """MAD outlier flags must equal a statistics.median reference
    (type-7 median of an even list = midpoint — the quantile_cont
    semantics the operator pins)."""
    import statistics

    from intake_esm_spark.operators.profiling import mad_outliers

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        (r["x"], r["is_outlier"])
        for r in mad_outliers(df, "x", k=k).collect()
    ]
    med = statistics.median(vals)
    mad = statistics.median([abs(v - med) for v in vals])
    for v, flag in got:
        expected = mad > 0 and abs(v - med) > k * mad
        assert flag == expected, (v, med, mad, k)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1,
        max_size=16,
    ).filter(lambda ps: any(a != b for a, b in ps))
)
def test_link_pred_equals_bruteforce(spark, pairs):
    """Jaccard link prediction must equal brute-force neighborhood math
    on hypothesis-generated graphs (self-loops/duplicates included)."""
    from intake_esm_spark.operators.graph import link_prediction_jaccard

    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    expected = {}
    for i, u in enumerate(nodes):
        for w in nodes[i + 1:]:
            if (u, w) in edges:
                continue
            cn = len(adj[u] & adj[w])
            if cn >= 1:
                expected[(u, w)] = round(cn / len(adj[u] | adj[w]), 6)
    got = {
        (r["src"], r["dst"]): r["jaccard"]
        for r in link_prediction_jaccard(
            spark.createDataFrame(list(pairs), "src long, dst long"),
            k=1000,
        ).collect()
    }
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-50, max_value=50).map(float),
            st.none(),
        ),
        min_size=1,
        max_size=60,
    ),
    desc=st.booleans(),
    n_buckets=st.sampled_from([2, 7, 64]),
)
def test_bucketed_rank_equals_window_row_number(spark, vals, desc, n_buckets):
    """ranks.global_rank == unpartitioned row_number() over the same
    total order, for ANY value multiset (heavy ties), null placement
    (NULLS FIRST asc / LAST desc), direction, and bucket fan-out —
    the exactness contract the round-10 rewrites stand on."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.ranks import global_rank

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, v double")
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id").asc()]
    expect = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    got = {
        r["id"]: r["__rank"]
        for r in global_rank(
            df, "v", ["id"], descending=desc, n_buckets=n_buckets
        ).collect()
    }
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    n_rows=st.integers(min_value=1, max_value=40),
    n_tiles=st.integers(min_value=2, max_value=9),
)
def test_ntile_from_rank_equals_sql_ntile(spark, n_rows, n_tiles):
    """ranks.ntile_from_rank reproduces F.ntile's remainder rule for
    every (N, n) shape — including N < n where each row sits alone."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.ranks import ntile_from_rank

    df = spark.range(1, n_rows + 1).withColumnRenamed("id", "rk")
    w = Window.orderBy("rk")
    out = df.select(
        "rk",
        F.ntile(n_tiles).over(w).alias("expect"),
        ntile_from_rank(
            F.col("rk"), F.lit(n_rows).cast("bigint"), n_tiles
        ).alias("got"),
    ).collect()
    for r in out:
        assert r["got"] == r["expect"], (n_rows, n_tiles, r)


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            # a heavy mass point plus scattered values — the modal-value
            # regime tie_fanout exists for
            st.just(7.0),
            st.integers(min_value=-50, max_value=50).map(float),
            st.none(),
        ),
        min_size=1,
        max_size=60,
    ),
    desc=st.booleans(),
)
def test_tie_fanout_rank_equals_window_row_number(spark, vals, desc):
    """global_rank(tie_fanout=True) == unpartitioned row_number() for
    ANY multiset — the round-11 exactness contract: fan-out is an
    execution-only re-bucketing (heavy values sub-bucket by the
    tiebreak), so results must be byte-identical with it on or off."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.ranks import global_rank

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, v double")
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id").asc()]
    expect = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    got = {
        r["id"]: r["__rank"]
        for r in global_rank(
            df, "v", ["id"], descending=desc, tie_fanout=True
        ).collect()
    }
    assert got == expect


def test_tie_fanout_spreads_modal_value_over_many_buckets(spark):
    """The round-11 skew contract: a ≥90%-tied frame must fan out to
    MANY buckets under tie_fanout (value-only bucketing collapses it
    into one — the single-task window the r10 verdict flagged), in both
    directions, while the plain path documents the collapse it fixes."""
    from intake_esm_spark.operators.ranks import _with_bucket

    rows = [(i, 1.0 if i < 950 else float(i % 37)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id int, v double")
    for desc in (False, True):
        fanned = (
            _with_bucket(df, "v", ["id"], desc, 64, None, True)
            .groupBy("__bkt")
            .count()
            .collect()
        )
        assert len(fanned) > 32, len(fanned)
        # no bucket holds a modal-sized run any more
        assert max(r["count"] for r in fanned) < 200, fanned
        plain = (
            _with_bucket(df, "v", ["id"], desc, 64, None, False)
            .groupBy("__bkt")
            .count()
            .collect()
        )
        assert max(r["count"] for r in plain) >= 950  # the flagged collapse


def test_ntile_from_rank_exact_at_huge_frame_sizes(spark):
    """Round-11 ADVICE fix: tile ids stay exact when rank·(q+1)
    approaches and exceeds 2⁵³ — the double-division candidates are
    corrected by exact BIGINT product comparisons, checked here against
    Python big-int ntile arithmetic at frame sizes no window could
    materialize."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.ranks import ntile_from_rank

    def py_ntile(rank: int, n: int, t: int) -> int:
        q, rem = divmod(n, t)
        head = rem * (q + 1)
        if rank <= head:
            return -(-rank // (q + 1))
        return rem + -(-(rank - head) // q)

    n_tiles = 7
    n_rows = (1 << 55) + 3  # q+1 near 2^52: rank/(q+1) rounds at ulp
    q1 = n_rows // n_tiles + 1
    ranks = []
    for tile_edge in range(1, n_tiles + 1):
        for off in (-2, -1, 0, 1, 2):  # straddle every tile boundary
            r = min(max(1, tile_edge * q1 + off), n_rows)
            ranks.append(r)
    ranks += [1, n_rows, n_rows - 1, (1 << 53) - 1, (1 << 53) + 1]
    df = spark.createDataFrame([(r,) for r in ranks], "rk long")
    out = df.select(
        "rk",
        ntile_from_rank(
            F.col("rk"), F.lit(n_rows).cast("bigint"), n_tiles
        ).alias("got"),
    ).collect()
    for r in out:
        assert r["got"] == py_ntile(r["rk"], n_rows, n_tiles), r


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.floats(
                min_value=-50, max_value=50,
                allow_nan=False, allow_infinity=False,
            ),
            st.floats(
                min_value=-50, max_value=50,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=4,
        max_size=40,
    )
)
def test_spearman_invariant_under_monotone_transform(spark, vals):
    """Spearman depends only on the RANKS: applying a strictly
    increasing transform to either margin must leave rho unchanged —
    the defining property that distinguishes it from Pearson, checked
    for any value multiset including heavy ties (values round to 1dp
    so ties are common)."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.groupstats import spearman_report

    rows = [(round(x, 1), round(y, 1)) for x, y in vals]
    df = spark.createDataFrame(rows, "x double, y double")
    base = spearman_report(df, "x", "y").collect()[0]
    # strictly increasing: exp(x/25) preserves order (and all ties)
    tdf = df.select(F.exp(F.col("x") / 25).alias("x"), "y")
    trans = spearman_report(tdf, "x", "y").collect()[0]
    assert trans["rho"] == base["rho"]
    assert trans["n_rows"] == base["n_rows"]


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.floats(
                min_value=-50, max_value=50,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=6,
        max_size=40,
    )
)
def test_kruskal_invariant_under_monotone_transform(spark, vals):
    """Kruskal-Wallis is a rank statistic: strictly increasing
    transforms of the outcome leave H unchanged exactly (same midranks,
    same tie pattern)."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.groupstats import (
        kruskal_wallis_report,
    )

    rows = [(g, round(x, 1)) for g, x in vals]
    df = spark.createDataFrame(rows, "g string, x double")
    base = kruskal_wallis_report(df, "g", "x").collect()[0]
    tdf = df.select("g", (F.col("x") * 3 + 1000).alias("x"))
    trans = kruskal_wallis_report(tdf, "g", "x").collect()[0]
    assert trans["h_stat"] == base["h_stat"]
    assert trans["n_units"] == base["n_units"]


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.floats(
                min_value=0.1, max_value=100,
                allow_nan=False, allow_infinity=False,
            ),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=50,
    ),
    p=st.sampled_from([0.1, 0.5, 0.9, 1.0]),
)
def test_weighted_quantile_equals_searchsorted(spark, vals, p):
    """weighted_quantiles == the left-continuous inverse weighted CDF
    computed by numpy searchsorted, for any (value, weight) multiset
    and probability."""
    import numpy as np

    from intake_esm_spark.operators.profiling import weighted_quantiles

    rows = [(round(v, 2), float(w)) for v, w in vals]
    df = spark.createDataFrame(rows, "v double, w double")
    got = weighted_quantiles(df, "v", "w", [p]).collect()[0]
    agg = {}
    for v, w in rows:
        agg[v] = agg.get(v, 0.0) + w
    ks = sorted(agg)
    cw = np.cumsum([agg[k] for k in ks])
    idx = int(np.searchsorted(cw, p * cw[-1], side="left"))
    assert got["quantile"] == pytest.approx(ks[idx], abs=1e-9)
    assert got["n_rows"] == len(rows)


@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(min_value=3, max_value=60),
    alpha=st.sampled_from([0.05, 0.1, 0.25]),
)
def test_conformal_coverage_guarantee_holds_empirically(spark, n, alpha):
    """The split-conformal rank: on the calibration set itself, the
    share of residuals ≤ q_hat is at least k/(n+1) — the finite-sample
    guarantee the k = ⌈(n+1)(1−α)⌉ order statistic exists to provide
    (when k ≤ n; otherwise q_hat is null by contract)."""
    import numpy as np

    from intake_esm_spark.operators.evaluation import conformal_interval

    rng = np.random.RandomState(n)
    y = rng.normal(0, 1, n).round(3)
    pred = (y + rng.normal(0, 0.5, n)).round(3)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(y, pred)],
        "y double, p double",
    )
    row = conformal_interval(df, "y", "p", alpha=alpha).collect()[0]
    k = math.ceil((n + 1) * (1 - alpha))
    assert row["k_rank"] == k
    if k > n:
        assert row["q_hat"] is None
    else:
        r = np.round(np.abs(y - pred), 6)
        assert (r <= row["q_hat"]).mean() >= k / (n + 1) - 1e-12
