"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding near-dup.

These are the beyond-reference operators (BASELINE.json north star): the
reference's only dedup is triple-set semantics (A1); a 100 TB corpus needs
content near-dup detection.  All stages are relational — shingle explodes,
hash-aggregations, and equi-joins — so they shuffle on content keys and scale
horizontally; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dipper_spark.functions.text import token_chunks, tokens, word_shingles
from dipper_spark.operators.util import ensure_parallelism


def exact_dedup(df: DataFrame, id_col: str, key: Column, min_group: int = 1) -> DataFrame:
    """Exact/canonical-key dedup: groups by a content key, electing the
    minimum id as canonical representative.

    Returns (key, canonical_id, n_dups).  ``min_group=2`` keeps only actual
    duplicate groups.  One hash-agg shuffle on the content key.
    """
    out = (
        df.groupBy(key.alias("dup_key"))
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_dups"))
    )
    return out.filter(F.col("n_dups") >= min_group) if min_group > 1 else out


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) long table over DISTINCT word n-grams per doc."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(tokens(text_col), n))).alias("shingle"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity >= threshold.

    Inverted-index formulation in two stages:

    1. **candidates** — self-equi-join on the shingle (docs sharing no shingle
       never meet).  With ``max_doc_freq`` set, shingles appearing in more
       than that many documents are dropped from the index FIRST (broadcast
       anti-join against the small hot-shingle table) — one boilerplate
       shingle shared by 1M docs would otherwise mint 10¹² candidate rows.
    2. **verify** — exact Jaccard by COUNTING: the candidate self-join
       meets each pair once per shared kept shingle (groupBy count), the
       hot remainder comes from per-doc hot arrays bounded by the hot
       table, so pruning never distorts the similarity value of a
       surfaced pair and full sets never ship.

    Approximation contract: with pruning on, a pair whose ONLY shared
    shingles are hot ones is missed (pure-boilerplate duplicates) — the
    standard doc-frequency-pruning trade; ``minhash_lsh_pairs`` bounds
    candidates by construction instead.  ``max_doc_freq=None`` is exact.
    """
    sets = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(tokens(text_col), n)).alias("sh_set"),
    )
    return jaccard_pairs_from_sets(sets, threshold=threshold, max_doc_freq=max_doc_freq)


def jaccard_pairs_from_sets(
    sets: DataFrame,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """:func:`jaccard_pairs` body over a pre-built ``(id, sh_set)`` frame —
    the composition surface: an audit that derives several dedup signals
    from ONE tokenize pass (see ``q_dedup_agreement``) hands each operator
    its frame instead of re-scanning the corpus per signal.

    ``checkpoint=False`` when the caller hands in an ALREADY materialized
    frame (``q_lsh_recall`` shares one checkpointed sets frame between the
    exact-truth and LSH pipelines) — a second eager checkpoint would copy
    the partitions for nothing."""
    if checkpoint:
        sets = sets.localCheckpoint(eager=True)
    if max_doc_freq is None:
        # exact path: the intersection count falls straight out of the
        # inverted-index self-join's groupBy — no set payloads shuffle and no
        # candidate distinct is needed.  The shingle stream feeds three
        # concurrent consumers (sizes + both self-join sides), which is why
        # the sets frame was checkpointed above — without it each consumer
        # re-runs the regex tokenizer over the corpus
        sh = sets.select("id", F.explode("sh_set").alias("shingle"))
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_1"), F.col("b.id").alias("id_2"))
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        j = (
            inter.join(sizes.withColumnRenamed("id", "id_1").withColumnRenamed("n_sh", "n_1"), "id_1")
            .join(sizes.withColumnRenamed("id", "id_2").withColumnRenamed("n_sh", "n_2"), "id_2")
            .withColumn(
                "jaccard",
                F.col("n_common") / (F.col("n_1") + F.col("n_2") - F.col("n_common")),
            )
        )
        return j.filter(F.col("jaccard") >= threshold).select("id_1", "id_2", "jaccard")
    # ---- pruned (100 TB) path ----------------------------------------
    # one tokenization pass: the shingle sets feed the doc-freq
    # aggregation, both sides of the candidate self-join, the size dim AND
    # the hot-correction dim — these branches run as concurrent stages, so
    # an EAGER localCheckpoint is the only way they share the computed
    # partitions instead of each re-running the regex tokenizer (lazy
    # checkpointing measured no faster at sf0.1; the durable 100 TB analog
    # is a parquet staging write of the shingle sets).
    #
    # Count, don't intersect: the kept-index self-join already meets each
    # candidate pair once per SHARED KEPT SHINGLE, so groupBy(id_1, id_2)
    # counts |A∩B ∩ kept| directly — replacing the former distinct +
    # full-set array_intersect verify, whose per-pair scan of two ~200-
    # string arrays dominated the query (4.3s of 11s at sf0.1).  The full
    # intersection is kept_common + |hotA ∩ hotB|, where the per-doc HOT
    # arrays are bounded by the (vocabulary-small) hot-shingle table, so
    # the only per-doc payloads that ever ship are longs and hot arrays —
    # the full sets never leave their scan.
    sh = sets.select("id", F.explode("sh_set").alias("shingle"))
    # hot feeds BOTH the anti-join (kept index) and the semi-join (per-doc
    # hot arrays); without an eager checkpoint each consumer re-runs the
    # full-shingle-stream doc-freq shuffle (guide §2.4: remove duplicate
    # exchanges).  The frame is vocabulary-small by construction.
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") > max_doc_freq)
        .select("shingle")
        .localCheckpoint(eager=True)
    )
    kept = sh.join(F.broadcast(hot), "shingle", "left_anti")
    # posting-list pair generation (round 14, guide §2.3): the kept index
    # groups into per-shingle postings — every posting BOUNDED by
    # construction (kept shingles have doc_freq <= max_doc_freq; the hot
    # table removed the rest) — and each posting emits its id_1 < id_2
    # pairs directly (sorted array + posexplode + slice: exactly
    # c(c-1)/2 rows, no candidate blowup, no filter).  The explicit
    # repartition ships the RAW (id, shingle) pairs once so the
    # collect_list builds entirely post-exchange (partial_collect_list
    # buffers would otherwise ship the same payload with array framing).
    # Same pair multiset, same counts: each pair still meets once per
    # shared kept shingle.  Measured trade: at sf0.1 the FORMER self-join
    # was planned as a BroadcastHashJoin (AQE broadcasts the <10 MB kept
    # index) and beat this by ~0.3-0.6 s/query — a regime that cannot
    # exist at 100 TB where the kept index is corpus-sized and the join
    # degrades to a two-exchange sort-merge; at sf1.0, where the
    # broadcast can no longer fire, this form wins 27-33% wall on all
    # three consumer queries (interleaved fresh-JVM A/B, see
    # OPTIMIZATION_r14.md §3).
    pair_common = (
        kept.repartition(F.col("shingle"))
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("id")).alias("_ids"))
        .filter(F.size("_ids") >= 2)
        .select(F.posexplode("_ids").alias("_pos", "id_1"), F.col("_ids"))
        .select(
            "id_1",
            F.explode(
                F.slice("_ids", F.col("_pos") + 2, F.size("_ids"))
            ).alias("id_2"),
        )
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("kept_common"))
    )
    sizes = sets.select("id", F.size("sh_set").alias("n_sh"))
    # consumed twice (the id_1 and id_2 hot-correction joins): checkpoint so
    # the semi-join + collect pass runs once; bounded by docs owning at
    # least one hot shingle
    hot_sets = (
        sh.join(F.broadcast(hot), "shingle", "left_semi")
        .groupBy("id")
        .agg(F.collect_list("shingle").alias("hot_sh"))
        .localCheckpoint(eager=True)
    )
    ver = (
        pair_common.join(
            sizes.select(F.col("id").alias("id_1"), F.col("n_sh").alias("n_1")), "id_1"
        )
        .join(sizes.select(F.col("id").alias("id_2"), F.col("n_sh").alias("n_2")), "id_2")
        .join(
            hot_sets.select(F.col("id").alias("id_1"), F.col("hot_sh").alias("hot_1")),
            "id_1", "left",
        )
        .join(
            hot_sets.select(F.col("id").alias("id_2"), F.col("hot_sh").alias("hot_2")),
            "id_2", "left",
        )
    )
    hot_common = F.when(
        F.col("hot_1").isNotNull() & F.col("hot_2").isNotNull(),
        F.size(F.array_intersect("hot_1", "hot_2")),
    ).otherwise(F.lit(0))
    n_common = F.col("kept_common") + hot_common
    union = F.col("n_1") + F.col("n_2") - n_common
    return (
        ver.withColumn("jaccard", n_common / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric shingle containment |A∩B| / |A| >= threshold — the
    quote/subset detector (a short doc embedded in a long one scores high
    containment but low Jaccard, so symmetric dedup misses it).

    Ordered pairs by design: (A in B) and (B in A) are different findings.
    Same two-stage discipline as :func:`jaccard_pairs`:

    1. **candidates** — inverted-index self-equi-join on the shingle.  With
       ``max_doc_freq`` set, shingles in more than that many docs are dropped
       from the index FIRST (broadcast anti-join against the small hot table)
       — the 100 TB guard: one boilerplate shingle in 1M docs would mint
       10¹² candidate rows.
    2. **verify** — exact containment by COUNTING (the
       :func:`jaccard_pairs` discipline: self-join meet count + per-doc
       hot-array remainder); the denominator is the contained side's full
       set size, so pruning never distorts the value of a surfaced pair.

    Approximation contract mirrors ``jaccard_pairs``: with pruning on, a
    pair whose ONLY shared shingles are hot ones is missed;
    ``max_doc_freq=None`` is exact.
    """
    sets = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(tokens(text_col), n)).alias("sh_set"),
    )
    if max_doc_freq is None:
        # exact path: intersection count falls out of the inverted-index
        # self-join's groupBy; only the contained side's size is joined back.
        # sets feeds three concurrent consumers (sizes + both join sides) —
        # checkpoint once so the tokenizer runs once (jaccard discipline)
        sets = sets.localCheckpoint(eager=True)
        sh = sets.select("id", F.explode("sh_set").alias("shingle"))
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") != F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_1"), F.col("b.id").alias("id_2"))
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        cont = F.col("n_common") / F.col("n_sh").cast("double")
        return (
            inter.join(F.broadcast(sizes.withColumnRenamed("id", "id_1")), "id_1")
            .filter(cont >= threshold)
            .select("id_1", "id_2", cont.alias("containment"))
        )
    # ---- pruned (100 TB) path: candidates on the cooled index, counted
    # verification (see jaccard_pairs_from_sets — the kept-index self-join
    # meets each ordered pair once per shared kept shingle, so the groupBy
    # count IS |A∩B ∩ kept|; the hot correction joins the vocabulary-
    # bounded per-doc hot arrays; full sets never ship).
    sets = sets.localCheckpoint(eager=True)
    sh = sets.select("id", F.explode("sh_set").alias("shingle"))
    # hot feeds BOTH the anti-join (kept index) and the semi-join (per-doc
    # hot arrays); without an eager checkpoint each consumer re-runs the
    # full-shingle-stream doc-freq shuffle (guide §2.4: remove duplicate
    # exchanges).  The frame is vocabulary-small by construction.
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") > max_doc_freq)
        .select("shingle")
        .localCheckpoint(eager=True)
    )
    kept = sh.join(F.broadcast(hot), "shingle", "left_anti")
    # posting-list pair generation — the jaccard_pairs_from_sets shape
    # (see there for the why: ONE shuffle of the kept index instead of
    # two + two sorts; postings bounded by max_doc_freq).  Ordered pairs
    # here: (A in B) and (B in A) are different findings, so the filter
    # keeps id_1 != id_2 exactly like the former join condition.
    pair_common = (
        kept.repartition(F.col("shingle"))
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("id")).alias("_ids"))
        .filter(F.size("_ids") >= 2)
        .select(F.posexplode("_ids").alias("_pos", "_lo"), F.col("_ids"))
        .select(
            "_lo",
            F.explode(
                F.slice("_ids", F.col("_pos") + 2, F.size("_ids"))
            ).alias("_hi"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("_lo").alias("id_1"), F.col("_hi").alias("id_2")),
                    F.struct(F.col("_hi").alias("id_1"), F.col("_lo").alias("id_2")),
                )
            ).alias("_p")
        )
        .select("_p.id_1", "_p.id_2")
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("kept_common"))
    )
    sizes = sets.select("id", F.size("sh_set").alias("n_sh"))
    # consumed twice (the id_1 and id_2 hot-correction joins): checkpoint so
    # the semi-join + collect pass runs once; bounded by docs owning at
    # least one hot shingle
    hot_sets = (
        sh.join(F.broadcast(hot), "shingle", "left_semi")
        .groupBy("id")
        .agg(F.collect_list("shingle").alias("hot_sh"))
        .localCheckpoint(eager=True)
    )
    ver = (
        pair_common.join(
            sizes.select(F.col("id").alias("id_1"), F.col("n_sh").alias("n_1")), "id_1"
        )
        .join(
            hot_sets.select(F.col("id").alias("id_1"), F.col("hot_sh").alias("hot_1")),
            "id_1", "left",
        )
        .join(
            hot_sets.select(F.col("id").alias("id_2"), F.col("hot_sh").alias("hot_2")),
            "id_2", "left",
        )
    )
    hot_common = F.when(
        F.col("hot_1").isNotNull() & F.col("hot_2").isNotNull(),
        F.size(F.array_intersect("hot_1", "hot_2")),
    ).otherwise(F.lit(0))
    cont = (F.col("kept_common") + hot_common) / F.col("n_1").cast("double")
    return (
        ver.withColumn("containment", cont)
        .filter(F.col("containment") >= threshold)
        .select("id_1", "id_2", "containment")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_perm: int = 8
) -> DataFrame:
    """MinHash signatures: perm k = min over shingles of md5('k:' || shingle).

    Hex-string min is a valid min-wise hash (uniform over the md5 space) and
    is engine-portable (identical md5/ordering in any SQL engine — the
    property the oracle check needs).  One explode + one groupBy computing all
    K mins as parallel aggregates — a single shuffle regardless of K.
    """
    sets = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(tokens(text_col), n)).alias("sh_set"),
    )
    return _signatures_from_sets(sets, num_perm).drop("sh_set")


def _signatures_from_sets(sets: DataFrame, num_perm: int) -> DataFrame:
    """Per-row ``array_min(transform(...))`` — zero shuffle: each permutation
    min is computed inside the row, so signature building is a pure map stage
    (vs the naive explode + groupBy which shuffles every shingle)."""
    # SQL-text lambdas, NOT F.transform(python_lambda): pyspark 4.1 reuses
    # lambda-variable ids across multiple higher-order functions in one
    # select, silently mixing the k values (verified — per-expression results
    # differ from the combined select).  expr() parses each lambda into its
    # own scope.
    sigs = [
        F.expr(f"array_min(transform(sh_set, s -> md5(concat('{k}:', s))))").alias(f"mh{k}")
        for k in range(num_perm)
    ]
    return sets.select("id", "sh_set", *sigs)


def _band_keys(signatures: DataFrame, num_perm: int, rows_per_band: int) -> DataFrame:
    """(id, band, key) rows: each band of ``rows_per_band`` signature slots
    hashed to its bucket key."""
    n_bands = num_perm // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                    )
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select("id", F.explode(bands).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def lsh_candidate_pairs(signatures: DataFrame, num_perm: int = 8, rows_per_band: int = 2) -> DataFrame:
    """LSH banding: hash each band of ``rows_per_band`` signature slots;
    docs colliding in ANY band become candidate pairs.

    Relational form: explode (band_idx, band_key) then self-equi-join — the
    shuffle key is the band hash, so candidate generation is linear in
    collisions, never all-pairs.
    """
    exploded = _band_keys(signatures, num_perm, rows_per_band)
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_1"), F.col("b.id").alias("id_2"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH near-dup detection with exact-Jaccard verification.

    candidates (LSH, ~linear) → verify TRUE Jaccard only on candidates via
    array_intersect on per-doc shingle sets.  The verify join is proportional
    to candidates, not to corpus².
    """
    # one scan: shingle sets feed BOTH the signatures (map-side array_min,
    # no shuffle) and the exact-Jaccard verification join
    df = ensure_parallelism(df)
    sets = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(tokens(text_col), n)).alias("sh_set"),
    )
    return minhash_lsh_pairs_from_sets(
        sets, num_perm=num_perm, rows_per_band=rows_per_band, threshold=threshold
    )


def minhash_lsh_pairs_from_sets(
    sets: DataFrame,
    num_perm: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.8,
    checkpoint: bool = True,
) -> DataFrame:
    """:func:`minhash_lsh_pairs` body over a pre-built ``(id, sh_set)``
    frame — the ``jaccard_pairs_from_sets`` composition surface.  The sets
    frame feeds three concurrent consumers (the signature map pass and both
    sides of the verify join), so it is eagerly checkpointed once here;
    ``checkpoint=False`` when the caller already materialized it."""
    if checkpoint:
        sets = sets.localCheckpoint(eager=True)
    sigs = _signatures_from_sets(sets, num_perm).drop("sh_set")
    cands = lsh_candidate_pairs(sigs, num_perm, rows_per_band)
    # the verify join partitions the shingle sets by id once; a
    # candidate-filtered payload pass (as in jaccard_pairs' pruned path)
    # was measured SLOWER here — deriving the candidate-id dim re-runs the
    # signature map-pass plus a band-occupancy shuffle, which costs more
    # than shuffling the sets (AQE broadcast-converts the candidate side
    # when it is small anyway)
    withsets = (
        cands.join(sets.select(F.col("id").alias("id_1"), F.col("sh_set").alias("set_1")), "id_1")
        .join(sets.select(F.col("id").alias("id_2"), F.col("sh_set").alias("set_2")), "id_2")
    )
    inter = F.size(F.array_intersect("set_1", "set_2"))
    union = F.size("set_1") + F.size("set_2") - inter
    return (
        withsets.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> Column | DataFrame:
    """SimHash over distinct tokens: bit j of md5(token)'s leading nibbles
    votes +1/-1; the sign of each bit-sum forms the fingerprint.

    Bit extraction stays in hex-string space (strpos into '0123456789abcdef'
    then shift/mask) — engine-portable, no hex→int casting.  One explode +
    one groupBy with ``bits`` parallel sums.
    """
    assert bits % 4 == 0 and bits <= 32
    tok = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )
    return simhash_from_tokens(tok, bits)


def simhash_from_tokens(tok: DataFrame, bits: int = 16) -> DataFrame:
    """:func:`simhash` body over a pre-exploded ``(id, tok)`` frame of
    DISTINCT tokens per doc — composition surface, see
    ``jaccard_pairs_from_sets``."""
    assert bits % 4 == 0 and bits <= 32
    h = F.md5(F.col("tok"))
    hexdigits = "0123456789abcdef"
    votes = []
    for j in range(bits):
        nib = F.substring(h, j // 4 + 1, 1)
        bit = F.shiftright(F.instr(F.lit(hexdigits), nib) - 1, j % 4).bitwiseAND(F.lit(1))
        votes.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"v{j}"))
    sums = tok.groupBy("id").agg(*votes)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select("id", fp.cast("long").alias("simhash"))


def simhash_pairs(sim: DataFrame, max_hamming: int = 3, bits: int = 16) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, via pigeonhole bit-band
    blocking: split the ``bits``-bit fingerprint into ``max_hamming + 1``
    bands — distance <= k forces at least one band to match exactly — then
    equi-join on (band index, band value) and verify true Hamming distance on
    the candidates only.

    This is the same shuffle discipline as LSH banding: the join key is the
    band value, candidate volume is bounded by band-bucket collisions, never
    all-pairs.  Only when ``max_hamming >= bits`` (every pair can qualify, so
    no band is guaranteed to match) does it fall back to the exact all-pairs
    form — a verification-scale setting, not a production one.
    """
    # the banded (or all-pairs) self-join consumes the fingerprint frame
    # twice; without an eager checkpoint both sides re-run the upstream
    # tokenize + bits-wide vote aggregation (guide §1.2).  The frame is
    # node-sized — (id, simhash) longs — so materializing it is cheap.
    #
    # Width pin (round 14, guide §2.5 — the centroid_neardup discipline):
    # the vote aggregation's output is BYTE-small, so AQE coalesces it to
    # 1-2 partitions before the checkpoint freezes that layout; the banded
    # self-join's probe + bit_count verify then run as 1-2 TASKS of dense
    # compute (measured at sf1.0: the whole 50k-doc band join serialized
    # on 2 cores, 53 s — the reason q_dedup_agreement's 8c/32c ratio was
    # 0.98).  REPARTITION_BY_NUM on the unique id is deterministic, never
    # AQE-coalesced, skew-free, and scale-adaptive via defaultParallelism.
    sim = sim.repartition(
        sim.sparkSession.sparkContext.defaultParallelism, "id"
    ).localCheckpoint(eager=True)
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    n_bands = max_hamming + 1
    if n_bands > bits:
        a, b = sim.alias("a"), sim.alias("b")
        return (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .withColumn("hamming", ham.cast("long"))
            .filter(F.col("hamming") <= max_hamming)
            .select(F.col("a.id").alias("id_1"), F.col("b.id").alias("id_2"), "hamming")
        )
    # band widths as equal as possible: the first (bits % n_bands) bands get
    # one extra bit
    base, extra = divmod(bits, n_bands)
    bands, offset = [], 0
    for j in range(n_bands):
        width = base + (1 if j < extra else 0)
        mask = (1 << width) - 1
        bands.append(
            F.struct(
                F.lit(j).alias("band"),
                F.shiftright("simhash", offset).bitwiseAND(F.lit(mask)).alias("val"),
            )
        )
        offset += width
    banded = sim.select("id", "simhash", F.explode(F.array(*bands)).alias("bk")).select(
        "id", "simhash", F.col("bk.band").alias("band"), F.col("bk.val").alias("val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_1"), F.col("b.id").alias("id_2"), ham.cast("long").alias("hamming"))
        # a pair can collide in several bands → dedup AFTER the verify filter
        # so the distinct runs on the (small) accepted set
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Train/test decontamination: flag training documents that share word
    n-gram shingles with a benchmark/eval corpus.

    Beyond-reference operator (the standard pretraining-data hygiene sweep:
    benchmark n-grams appearing verbatim in training text).  Shape:

    1. the benchmark's distinct shingles form a **broadcast dim** — eval
       suites are tiny relative to a 100 TB training corpus, so the overlap
       test is a map-side semi-join; the corpus is scanned once, no
       corpus-side shuffle of text;
    2. the per-document shingle total is computed **map-side** on the
       un-exploded row (``F.size`` of the distinct shingle array) in a
       second scan branch, and the (small, contamination-sized) hit counts
       broadcast back onto it — so the ONLY shuffle anywhere is the
       hit-count groupBy over the matched (doc, shingle) rows, whose cost
       scales with contamination, not corpus size.

       (Deliberately NOT computed by carrying ``size(_shingles)`` through
       the explode of the same array: Catalyst collapses that projection
       into the Generate node and re-evaluates the whole shingle expression
       per exploded row — measured ~5× slower at sf0.1.)

    Returns (id, n_hits, n_shingles, hit_frac) for documents with at least
    ``min_hits`` matching shingles, ordered nowhere (callers sort).  ``n=8``
    word-grams is the common published decontamination granularity; lower it
    for aggressive matching.
    """
    bench = (
        benchmark.select(F.explode(F.array_distinct(word_shingles(tokens(text_col), n))).alias("shingle"))
        .distinct()
    )
    staged = ensure_parallelism(docs)
    hits = (
        staged.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(word_shingles(tokens(text_col), n))).alias("shingle"),
        )
        .join(F.broadcast(bench), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )
    totals = staged.select(
        F.col(id_col).alias("id"),
        F.size(F.array_distinct(word_shingles(tokens(text_col), n))).alias("n_shingles"),
    )
    return totals.join(F.broadcast(hits), "id").select(
        "id", "n_hits", "n_shingles",
        F.round(F.col("n_hits") / F.col("n_shingles"), 6).alias("hit_frac"),
    )


def chunk_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 10,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Chunk-level (RefinedWeb line-dedup-style) duplication profile: split
    each document into non-overlapping ``chunk_tokens``-token chunks and flag
    chunks whose exact text occurs in >= ``min_doc_freq`` documents.

    Beyond-reference operator.  Shape (the exact, fully-relational form):

    1. per-doc DISTINCT chunk explode → (id, chunk) long table;
    2. chunk document-frequency by hash-agg (map-side partial combine — a
       chunk repeated across a partition pre-aggregates before the shuffle);
    3. doc-freq joined back on the chunk key (one shuffle; duplicated-chunk
       volume, not corpus volume, survives the filter);
    4. per-doc duplicated-chunk counts re-joined to the map-side chunk
       totals.  Unlike decontaminate's hit side (contamination-sized by
       nature), a boilerplate-heavy corpus can have MOST docs carrying a
       duplicated chunk — so the re-join is a plain equi-join on the id and
       AQE broadcast-converts it only when the hit side actually is small.

    Unlike MinHash/SimHash this is EXACT — the unit is the verbatim chunk —
    which is why production pipelines run it alongside fuzzy dedup: it
    removes boilerplate segments fuzzy doc-level dedup keeps.  Returns
    (id, n_chunks, n_dup, dup_frac) for documents with >= 1 duplicated
    chunk; docs shorter than one chunk are excluded (no denominator).
    """
    staged = ensure_parallelism(df)
    # EAGER checkpoint (round 14): the chunked frame feeds THREE branches
    # (chunk doc-freq, the dup-hit join, per-doc totals), and the
    # size-filter on the DERIVED chunks column was being pushed below the
    # parallelizing exchange into the parquet scan, where it re-evaluated
    # the full tokenize+chunk expression per row on the scan's (few)
    # input splits — profiled at sf1.0 as two 2-task stages of 7 s each
    # while 30 cores idled.  Materializing (id, chunks) once runs the
    # tokenizer exactly once at full width and leaves the filter a
    # trivial array-length test over the checkpoint (guide §1.2/§2.5;
    # the cleaning.py precedent — the durable 100 TB analog is a parquet
    # staging write of the chunked corpus).
    base = staged.select(
        F.col(id_col).alias("id"),
        F.array_distinct(token_chunks(tokens(text_col), chunk_tokens)).alias("chunks"),
    ).filter(F.size("chunks") > 0).localCheckpoint(eager=True)
    ex = base.select("id", F.explode("chunks").alias("chunk"))
    dfreq = ex.groupBy("chunk").agg(F.count(F.lit(1)).alias("dfreq"))
    hits = (
        ex.join(dfreq.filter(F.col("dfreq") >= min_doc_freq), "chunk")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    totals = base.select("id", F.size("chunks").cast("long").alias("n_chunks"))
    return totals.join(hits, "id").select(
        "id",
        "n_chunks",
        F.col("n_dup").cast("long").alias("n_dup"),
        F.round(F.col("n_dup") / F.col("n_chunks"), 6).alias("dup_frac"),
    )


def duplicated_substring_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = 10,
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact-substring dedup spans — the window-hash form of the
    suffix-array pass from Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"): find the maximal per-document token
    ranges covered by ``window_tokens``-token substrings that occur at
    least ``min_occurrences`` times CORPUS-WIDE (total occurrences, so
    within-document repeats count), the spans that pass would cut.

    Beyond-reference operator.  Shape, fully relational:

    1. per-doc overlapping window keys — one ``transform`` over the start
       sequence, one posexplode: n_tokens rows total, same volume as any
       shingle op;
    2. corpus-wide window occurrence counts by hash-agg (map-side partial
       combine; this is a COUNT, never a pair self-join, so a window
       repeated 10^6 times costs one aggregate row, not 10^12 pairs);
    3. duplicated starts survive a semi join back on the window key
       (duplicated volume, not corpus volume);
    4. per-doc span merge by gaps-and-islands: a new island starts when
       the gap to the previous duplicated start exceeds ``window_tokens``
       (i.e. the windows no longer overlap or touch); two window functions
       over the duplicated starts only.

    Returns (id, span_start, span_end, span_tokens) in token coordinates,
    span_end exclusive."""
    from pyspark.sql.window import Window

    W = window_tokens
    base = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
        .filter(F.size("toks") >= W)
    )
    wins = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - W),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, W)),
            )
        ).alias("start", "wtext"),
    )
    dup_keys = (
        wins.groupBy("wtext")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= min_occurrences)
        .select("wtext")
    )
    dup_starts = wins.join(dup_keys, "wtext", "left_semi").select("id", "start")
    byid = Window.partitionBy("id").orderBy("start")
    islands = (
        dup_starts.withColumn(
            "brk",
            F.when(F.col("start") - F.lag("start").over(byid) > W, F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "grp",
            F.sum("brk").over(byid.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return islands.groupBy("id", "grp").agg(
        F.min("start").cast("long").alias("span_start"),
        (F.max("start") + W).cast("long").alias("span_end"),
        (F.max("start") + W - F.min("start")).cast("long").alias("span_tokens"),
    ).drop("grp")


def connected_components(
    edges: DataFrame,
    id1: str = "id_1",
    id2: str = "id_2",
    max_iter: int = 50,
    broadcast_labels: bool = True,
) -> DataFrame:
    """Connected components over an undirected pair list by min-label
    propagation — the cluster-election step a dedup pipeline needs between
    "near-dup pairs found" and "one canonical document per group".

    Beyond-reference operator.  Shape: each iteration is one equi-join of
    the edge list against the current labels plus a min-aggregation; the
    label frame is lineage-truncated per iteration (``localCheckpoint``,
    the same discipline as the IVF Lloyd loop) so iteration cost stays
    flat; the driver loop stops at the exact fixpoint (no changed labels),
    reached after O(component diameter) iterations — near-dup clusters are
    shallow, so this is a handful of small keyed shuffles, never a
    whole-graph algorithm.  The component id is the minimum member id,
    making the output deterministic and the canonical-doc choice free.

    ``broadcast_labels=True`` (default) hash-broadcasts the node-sized
    label frame into each iteration's joins — after a localCheckpoint
    Catalyst forgets partitioning, so without the hint every iteration
    re-shuffles the edge list to meet a frame that is orders of magnitude
    smaller (dup-cluster participants, not the corpus).  Pass False for
    graphs whose participant set outgrows executor memory; both sides
    then shuffle on the node key.

    Returns (id, component) for every node that appears in ``edges``.
    """
    # both orientations from ONE pass over the (possibly expensive, lazy)
    # edge derivation — the union-of-flip form re-ran the caller's whole
    # pair pipeline once per branch when materializing this checkpoint
    # (profiled as 2 identical verify stages under q_dup_components /
    # q_dedup_decision; the q_pagerank edge-doubling fix, guide §1.2)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(id1).alias("src"), F.col(id2).alias("dst")),
                    F.struct(F.col(id2).alias("src"), F.col(id1).alias("dst")),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        lab_dst = labels.select(
            F.col("id").alias("dst"), F.col("component").alias("n_comp")
        )
        if broadcast_labels:
            lab_dst = F.broadcast(lab_dst)
        nbr = (
            sym.join(lab_dst, "dst")
            .groupBy("src")
            .agg(F.min("n_comp").alias("n_comp"))
            .select(F.col("src").alias("id"), "n_comp")
        )
        # the changed-flag rides ALONG the label update (chg = a strictly
        # smaller neighbor label arrived), so the fixpoint test is a sum
        # over the frame being materialized anyway — one Spark job per
        # iteration, not a checkpoint job plus a compare-join job.  The
        # LAZY checkpoint is materialized by the sum action itself (the
        # single-consumer case where eager=False is safe; concurrent
        # branches of one action would each recompute — see the pruned
        # jaccard path for the eager counter-example).
        new_labels = (
            labels.join(F.broadcast(nbr) if broadcast_labels else nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("n_comp", F.col("component"))
                ).alias("component"),
                (F.coalesce("n_comp", F.col("component")) < F.col("component"))
                .cast("int")
                .alias("chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(
            F.coalesce(F.sum("chg"), F.lit(0)).alias("n")
        ).first()[0]
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    return labels


def incremental_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_frac: float = 0.8,
    n: int = 3,
    max_doc_freq: int = 50,
) -> DataFrame:
    """Dedup an INCOMING BATCH against an EXISTING CORPUS — the incremental-
    ingestion shape (each new crawl snapshot dedups against everything
    already kept, not against itself).

    Here the corpus/batch split is the deterministic md5 draw on the id
    (frac < ``split_frac`` → existing) so the operator is self-contained and
    oracle-checkable; production passes two DataFrames and drops the split.

    Per batch document:
      - ``exact_dup``   — 1 iff its full-text md5 already exists in the
        corpus (left semi-shaped join on the 32-hex key; at 100 TB this is
        the bloom-filterable content-key lookup, shuffling only 32-byte
        keys, never text);
      - ``max_overlap`` — the largest count of distinct word ``n``-gram
        shingles shared with any single existing document, 0 when none.
        Shingles whose EXISTING-corpus document frequency exceeds
        ``max_doc_freq`` are pruned from the index first (same hot-shingle
        cap as :func:`jaccard_pairs` — one boilerplate shingle in 1M docs
        would mint 10¹² candidate rows).

    Plan shape: the batch side is the small side by construction (one
    snapshot vs the whole corpus); both joins key on content hashes, so
    AQE's skew splitting covers residual hot keys.  Nothing is all-pairs.
    """
    from dipper_spark.operators.sampling import hash_fraction

    frac = hash_fraction(F.col(id_col))
    existing = df.filter(frac < split_frac)
    batch = df.filter(frac >= split_frac)

    key = F.md5(F.col(text_col)).alias("k")
    ex_keys = existing.select(key).distinct()
    b = batch.select(F.col(id_col).alias("id"), key)
    exact = (
        b.join(ex_keys.withColumn("_hit", F.lit(1)), "k", "left")
        .select("id", F.coalesce(F.col("_hit"), F.lit(0)).alias("exact_dup"))
    )

    sh_e = shingle_table(existing, id_col, text_col, n).withColumnRenamed(
        "id", "old_id"
    )
    hot = (
        sh_e.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("dfreq"))
        .filter(F.col("dfreq") > max_doc_freq)
        .select("shingle")
    )
    sh_e = sh_e.join(F.broadcast(hot), "shingle", "left_anti")
    sh_b = shingle_table(batch, id_col, text_col, n)
    overlap = (
        sh_b.join(sh_e, "shingle")
        .groupBy("id", "old_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .groupBy("id")
        .agg(F.max("shared").cast("long").alias("max_overlap"))
    )
    return (
        exact.join(overlap, "id", "left")
        .select(
            "id",
            "exact_dup",
            F.coalesce(F.col("max_overlap"), F.lit(0)).alias("max_overlap"),
        )
    )
