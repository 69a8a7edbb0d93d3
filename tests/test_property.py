"""Property-based tests (hypothesis): operators vs independent pure-Python
reference implementations on randomized inputs — the class of edge cases
hand-written fixtures miss (duplicate timestamps, empty sides, degenerate
keys).  Example counts are kept small: each example is a Spark action."""

import hashlib

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ROW = st.tuples(st.integers(0, 3), st.integers(0, 30))  # (key, ts)


@settings(**SETTINGS)
@given(
    left=st.lists(_ROW, min_size=1, max_size=12),
    right=st.lists(_ROW, min_size=0, max_size=12),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    from dipper_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], ["lid", "k", "ts"]
    )
    rdf = spark.createDataFrame(
        [(100 + i, k, t) for i, (k, t) in enumerate(right)],
        ["rid", "k", "rts"],
    ) if right else spark.createDataFrame([], "rid long, k long, rts long")
    got = {
        r.lid: (r.asof.rid if r.asof else None)
        for r in asof_join(ldf, rdf, "k", "ts", "rts", tiebreak="rid").collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [
            (rt, 100 + j)
            for j, (rk, rt) in enumerate(right)
            if rk == k and rt <= t
        ]
        expected = max(cands)[1] if cands else None  # max ts, then max rid
        assert got[i] == expected, (i, k, t, cands)


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=8),
        min_size=1,
        max_size=6,
    )
)
def test_rolling_fingerprint_matches_python_fold(spark, docs):
    from dipper_spark.functions.text import rolling_fingerprint

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.f
        for r in df.select("doc_id", rolling_fingerprint("text").alias("f")).collect()
    }
    mod, base = 1_000_000_007, 131
    for i, toks in enumerate(docs):
        acc = 0
        for t in toks:
            acc = (acc * base + int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % mod) % mod
        assert got[i] == acc


@settings(**SETTINGS)
@given(ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=40, unique=True))
def test_weighted_sample_membership_is_pure_hash_predicate(spark, ids):
    from dipper_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    kept = {r.doc_id for r in weighted_sample(df, "doc_id", F.lit(0.5)).collect()}
    for i in ids:
        frac = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 16**8
        assert (i in kept) == (frac < 0.5)


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=12
    ).filter(lambda es: all(a != b for a, b in es))
)
def test_connected_components_match_union_find(spark, edges):
    from dipper_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, ["id_1", "id_2"])
    got = {r.id: r.component for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for node, comp in got.items():
        assert comp == find(node), (node, edges)


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=8
    ),
    n=st.integers(2, 4),
)
def test_exploded_ngrams_equals_array_form(spark, docs, n):
    """The explode-first fast path and the array<string> column form are the
    same operator: identical (id, ngram) multisets on arbitrary text."""
    from collections import Counter

    from dipper_spark.functions.text import tokens, word_shingles
    from dipper_spark.operators.util import exploded_word_ngrams

    df = spark.createDataFrame(list(enumerate(docs)), ["id", "text"])
    fast = Counter(
        (r.id, r.sh)
        for r in exploded_word_ngrams(df, ["id"], "text", n=n, out="sh").collect()
    )
    slow = Counter(
        (r.id, r.sh)
        for r in df.select(
            "id", F.explode(word_shingles(tokens("text"), n)).alias("sh")
        ).collect()
    )
    assert fast == slow


@settings(**SETTINGS)
@given(ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=30, unique=True))
def test_epoch_shuffle_is_permutation(spark, ids):
    """Every input row appears exactly once, positions are dense per shard,
    and the assignment matches the pure-python md5 draw."""
    import hashlib

    from dipper_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    rows = epoch_shuffle(df, "doc_id", n_shards=4, seed="px").collect()
    assert sorted(r.doc_id for r in rows) == sorted(ids)
    for s in {r.shard for r in rows}:
        pos = sorted(r.pos for r in rows if r.shard == s)
        assert pos == list(range(1, len(pos) + 1))
    for r in rows:
        h = hashlib.md5(f"px:{r.doc_id}".encode()).hexdigest()
        assert r.shard == int(h[:8], 16) % 4


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
                                   whitelist_characters=".-@:/#"),
            min_size=0, max_size=80,
        ),
        min_size=1, max_size=12,
    )
)
def test_pii_redaction_idempotent_and_clean(spark, texts):
    """redact(redact(x)) == redact(x), and a redacted string never still
    matches any PII pattern — for arbitrary text including '@'/'.'/'-'
    soup that skirts the pattern edges."""
    import re

    from dipper_spark.operators.cleaning import PII_PATTERNS, redact_pii

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "t"])
    once = df.select("id", redact_pii("t").alias("r"))
    twice = once.select("id", redact_pii("r").alias("r"))
    a = {r.id: r.r for r in once.collect()}
    b = {r.id: r.r for r in twice.collect()}
    assert a == b
    for v in a.values():
        for pat in PII_PATTERNS.values():
            assert re.search(pat, v) is None, (v, pat)


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from([f"w{i}" for i in range(12)]), min_size=0, max_size=35),
        min_size=1, max_size=10,
    ),
    maxdf=st.integers(1, 3),
)
def test_strip_boilerplate_matches_pure_python(spark, docs, maxdf):
    """The distributed strip equals the obvious single-process reference:
    chunk each doc into full 10-token windows, drop chunks whose
    DISTINCT-doc frequency exceeds maxdf, rejoin survivors in order."""
    from collections import Counter

    from dipper_spark.operators.cleaning import strip_boilerplate_chunks

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.id: (r.n_chunks, r.n_dropped, r.clean_text)
        for r in strip_boilerplate_chunks(df, "doc_id", "text", 10, maxdf).collect()
    }
    # pure-python mirror
    chunks = {
        i: [" ".join(toks[j * 10:(j + 1) * 10]) for j in range(len(toks) // 10)]
        for i, toks in enumerate(docs)
    }
    dfreq = Counter()
    for i, cs in chunks.items():
        for c in set(cs):
            dfreq[c] += 1
    expect = {}
    for i, cs in chunks.items():
        if not cs:
            continue
        kept = [c for c in cs if dfreq[c] <= maxdf]
        expect[i] = (len(cs), len(cs) - len(kept), " ".join(kept))
    assert got == expect


@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1023.0, allow_nan=False, width=32),
        min_size=5, max_size=120,
    )
)
def test_histogram_quantile_within_one_bin_of_exact(spark, values):
    """Property: the sketch estimate is >= the exact percentile and within
    one bin width above it (upper-edge estimator over [lo, hi))."""
    import math

    from dipper_spark.operators.sketches import histogram_quantiles

    n_bins, lo, hi = 64, 0.0, 1024.0
    width = (hi - lo) / n_bins
    df = spark.createDataFrame([("g", float(v)) for v in values], ["grp", "v"])
    [r] = histogram_quantiles(
        df, "v", ["grp"], {"p50": 0.5}, lo=lo, hi=hi, n_bins=n_bins
    ).collect()
    xs = sorted(values)
    # exact p50 by the sketch's own definition: smallest x with
    # cum-count >= 0.5 * n
    exact = xs[math.ceil(0.5 * len(xs)) - 1]
    assert r.p50 >= exact
    assert r.p50 - exact <= width + 1e-9


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12),
        min_size=1, max_size=8,
    )
)
def test_collapse_runs_idempotent_and_matches_python(spark, docs):
    """Property: run-collapse equals the pure-Python groupby scrub and is
    IDEMPOTENT (collapsing a collapsed stream changes nothing)."""
    from itertools import groupby

    from dipper_spark.functions.text import tokens
    from dipper_spark.operators.cleaning import collapse_token_runs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = collapse_token_runs(tokens("text"))
    got = {
        r.doc_id: r.kept
        for r in df.select("doc_id", kept.alias("kept")).collect()
    }
    for i, toks in enumerate(docs):
        expect = [k for k, _ in groupby(toks)]
        assert got[i] == expect, (toks, got[i])
    # idempotence: re-collapse the collapsed text
    df2 = spark.createDataFrame(
        [(i, " ".join(v)) for i, v in got.items()], ["doc_id", "text"]
    )
    got2 = {
        r.doc_id: r.kept
        for r in df2.select(
            "doc_id", collapse_token_runs(tokens("text")).alias("kept")
        ).collect()
    }
    assert got2 == got


@settings(**SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=2, max_size=30,
    )
)
def test_spearman_bounds_and_scipy_free_reference(spark, pairs):
    """Property: rho matches a pure-Python TRUE tie-aware Spearman
    (Pearson correlation of average ranks — not the 1 - 6Σd²/(n(n²-1))
    shortcut, which is only valid without ties), is always in [-1, 1],
    and is NULL when either column is constant (variance 0)."""
    from dipper_spark.operators.aggregates import spearman_rho

    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in pairs], ["g", "a", "b"]
    )
    [r] = spearman_rho(df, "g", "a", "b").collect()

    def avg_ranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        ranks = [0.0] * len(xs)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
                j += 1
            for t in range(i, j + 1):
                ranks[order[t]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    ra = avg_ranks([a for a, _ in pairs])
    rb = avg_ranks([b for _, b in pairs])
    n = len(pairs)
    sa, sb = sum(ra), sum(rb)
    saa = sum(x * x for x in ra)
    sbb = sum(x * x for x in rb)
    sab = sum(x * y for x, y in zip(ra, rb))
    var_a = n * saa - sa * sa
    var_b = n * sbb - sb * sb
    if var_a <= 0 or var_b <= 0:
        assert r.rho is None
    else:
        import math

        expect = round((n * sab - sa * sb) / math.sqrt(var_a * var_b), 6)
        assert r.rho == expect
        # Pearson-on-ranks is ALWAYS bounded, ties or not
        assert -1.0 <= r.rho <= 1.0
