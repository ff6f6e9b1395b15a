"""Corpus-curation operators: the C4/Gopher-style cleaning passes a
pre-training data pipeline runs between raw crawl and tokenizer —
boilerplate stripping, repetition filters, PII scrubbing, domain
mixing, epoch shuffling.

All pure column expressions + keyed partial aggregations — no Python
UDFs. Each operator has a DuckDB oracle twin; planted-input tests in
tests/test_llm_ops.py prove the removal/scrub semantics (the synthetic
corpus is mostly clean, so oracle equality alone would not exercise
the positive paths).

Reference scope note: the reference engine (see SURVEY.md §2) has no
corpus-curation surface; these extend the engine for LLM training-data
prep per the build brief, composing with operators/text.py and
operators/dedup.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_fraud_detection_lakehouse_spark.core.catalog import spread_small_input
from real_time_fraud_detection_lakehouse_spark.sources.transactions import dround, dround_sql

Frames = dict[str, DataFrame]
CURATION_OPS: dict[str, tuple[Callable[[Frames], DataFrame], str | None]] = {}


def _register(name: str, sql: str | None):
    def deco(fn):
        CURATION_OPS[name] = (fn, sql)
        return fn

    return deco


_TOKENS = "list_filter(string_split(text, ' '), x -> x <> '')"


def _tokens_col():
    return F.filter(F.split(F.col("text"), " "), lambda x: x != "")


# --- boilerplate segment stripping (C4-style repeated-span removal) ---------
#: tokens per segment; the unit of cross-document boilerplate matching
BOILER_SEG = 8
#: a segment is boilerplate when it appears in >= this many distinct docs
BOILER_MIN_DOCS = 2


@_register(
    "docs_strip_boilerplate",
    f"""
    WITH d AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
    segd AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(len(toks), 1), {BOILER_SEG}),
               i -> array_to_string(list_slice(toks, i, i + {BOILER_SEG} - 1), ' ')
             ) AS segs
      FROM d
    ),
    ex AS (
      SELECT doc_id,
             unnest(segs) AS seg,
             unnest(generate_series(1, len(segs))) AS idx
      FROM segd
    ),
    freq AS (
      SELECT seg FROM ex
      WHERE len(string_split(seg, ' ')) = {BOILER_SEG}
      GROUP BY seg
      HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
    ),
    marked AS (
      SELECT doc_id, seg, idx, seg NOT IN (SELECT seg FROM freq) AS keep
      FROM ex
    )
    SELECT doc_id,
           coalesce(array_to_string(list(seg ORDER BY idx) FILTER (WHERE keep), ' '), '')
             AS clean_text,
           CAST(COUNT(*) AS INTEGER) AS n_segments,
           CAST(COUNT(*) FILTER (WHERE NOT keep) AS INTEGER) AS n_removed
    FROM marked GROUP BY doc_id
    """,
)
def docs_strip_boilerplate(
    t: Frames, join_threshold: int = 4096
) -> DataFrame:
    """C4-style boilerplate removal: split each document's token
    stream into consecutive BOILER_SEG-token segments; any segment
    text that appears in >= BOILER_MIN_DOCS distinct documents is
    shared boilerplate (headers, footers, license banners, nav bars)
    and is stripped from every document. Output per doc: the cleaned
    (space-normalized) text plus segment/removal counts.

    Scale design: the corpus NEVER shuffles — segments are a per-row
    transform; the frequency count explodes segments into a keyed
    countDistinct whose partial aggregation collapses each map
    partition first; the boilerplate set (tiny by construction — it's
    the text shared across documents) comes back as one broadcast
    array and the strip is a per-row array filter. The classic
    driver-killer here would be rebuilding documents via
    explode → anti-join → groupBy(collect_list) — that shuffles the
    whole corpus twice; keeping segments in-row avoids both shuffles.
    (The leading spread_small_input round-robin is the local
    single-row-group guard, not part of the algorithm — a no-op on
    real multi-split inputs.)
    """
    # ADAPTIVE STRIP STRATEGY (measured at the 100x replica): the
    # in-row array filter is O(|fset|) PER SEGMENT — at 142k
    # boilerplate segments that is ~1e11 string compares and the
    # operator effectively hangs. Above ``join_threshold`` distinct
    # boilerplate segments, switch to the explode -> broadcast
    # anti-join -> ordered reassembly path: two corpus-keyed
    # shuffles, but linear. Below it, the in-row filter wins (no
    # corpus shuffle at all). Same output either way — the planted
    # test asserts path equivalence.
    docs = spread_small_input(t["documents"]).select("doc_id", _tokens_col().alias("toks"))
    segd = docs.select(
        "doc_id",
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(BOILER_SEG)
            ),
            lambda i: F.array_join(F.slice(F.col("toks"), i, BOILER_SEG), " "),
        ).alias("segs"),
    )
    # both the frequency count and the final strip consume segd —
    # checkpoint the segment projection once instead of re-tokenizing
    # the corpus on each side (same lever as the hashed-gram tables)
    segd = segd.localCheckpoint(eager=False)
    fset_rel = (
        segd.select("doc_id", F.explode("segs").alias("seg"))
        # only FULL segments can be boilerplate: the aligned tail of a
        # short doc is a sub-segment that would collide spuriously
        # across documents (exact dedup owns whole-short-doc dups)
        .filter(F.size(F.split("seg", " ")) == BOILER_SEG)
        .groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= BOILER_MIN_DOCS)
        .select("seg")
        .localCheckpoint(eager=False)  # feeds the count AND the chosen path
    )
    if fset_rel.count() > join_threshold:
        ex = segd.select("doc_id", F.posexplode("segs").alias("idx", "seg"))
        kept = ex.join(F.broadcast(fset_rel), "seg", "left_anti")
        agg = kept.groupBy("doc_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "seg"))),
                    lambda x: x["seg"],
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
        return (
            segd.select("doc_id", F.size("segs").alias("n_segments"))
            .join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                F.col("n_segments").cast("int").alias("n_segments"),
                (F.col("n_segments") - F.coalesce("n_kept", F.lit(0)))
                .cast("int")
                .alias("n_removed"),
            )
        )
    fset = (
        fset_rel.agg(F.sort_array(F.collect_set("seg")).alias("fset"))
        .select(F.coalesce("fset", F.array().cast("array<string>")).alias("fset"))
    )
    return (
        segd.crossJoin(F.broadcast(fset))
        .select(
            "doc_id",
            F.filter(
                "segs", lambda s: ~F.array_contains(F.col("fset"), s)
            ).alias("kept"),
            F.size("segs").alias("n_segments"),
        )
        .select(
            "doc_id",
            F.array_join("kept", " ").alias("clean_text"),
            F.col("n_segments").cast("int").alias("n_segments"),
            (F.col("n_segments") - F.size("kept")).cast("int").alias("n_removed"),
        )
    )


# --- per-document repetition stats (Gopher repetition filters) --------------
#: a doc whose most common bigram exceeds this share of all its bigrams
#: is flagged repetitive (Gopher §A1.1 uses 0.18 for top-2-grams)
TOP_BIGRAM_MAX_FRAC = 0.18


@_register(
    "docs_repetition_stats",
    f"""
    WITH d AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    bi AS (
      SELECT doc_id,
             unnest(list_zip(list_slice(t, 1, len(t) - 1),
                             list_slice(t, 2, len(t)))) AS z
      FROM d WHERE len(t) >= 2
    ),
    counts AS (
      SELECT doc_id, z[1] || ' ' || z[2] AS bigram, COUNT(*) AS n
      FROM bi GROUP BY 1, 2
    ),
    ranked AS (
      SELECT doc_id, bigram, n,
             SUM(n) OVER (PARTITION BY doc_id) AS total,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, bigram ASC) AS rk
      FROM counts
    )
    SELECT doc_id,
           CAST(total AS INTEGER) AS n_bigrams,
           bigram AS top_bigram,
           CAST(n AS INTEGER) AS top_bigram_n,
           {dround_sql("CAST(n AS DOUBLE) / total")} AS top_bigram_frac,
           CAST(CASE WHEN CAST(n AS DOUBLE) / total > {TOP_BIGRAM_MAX_FRAC}
                THEN 1 ELSE 0 END AS INTEGER) AS repetitive_flag
    FROM ranked WHERE rk = 1
    """,
)
def docs_repetition_stats(t: Frames) -> DataFrame:
    """Gopher-style repetition filter signals: per document, the most
    frequent bigram and its share of all bigrams; documents whose top
    bigram exceeds TOP_BIGRAM_MAX_FRAC are flagged (looping generated
    text, keyword-stuffed spam, and template pages all trip this).
    Ties break on the bigram string so the answer is deterministic
    across engines.

    Scale design: bigrams via zip_with over two array slices (narrow,
    in-row), then explode → (doc_id, bigram) keyed count with map-side
    partial agg; the per-doc argmax is a window over the doc's own
    distinct bigrams (small groups, partitioned by doc — no global
    sort, no skew: a document's distinct-bigram count is bounded by
    its length).
    """
    bigrams = F.expr(
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
        " (x, y) -> concat(x, ' ', y))"
    )
    counts = (
        t["documents"]
        .select("doc_id", _tokens_col().alias("t"))
        .filter(F.size("t") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("doc_id")
    rk = Window.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("bigram"))
    frac = F.col("n").cast("double") / F.col("total")
    return (
        counts.withColumn("total", F.sum("n").over(w))
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("total").cast("int").alias("n_bigrams"),
            F.col("bigram").alias("top_bigram"),
            F.col("n").cast("int").alias("top_bigram_n"),
            dround(frac).alias("top_bigram_frac"),
            F.when(frac > TOP_BIGRAM_MAX_FRAC, 1).otherwise(0).cast("int").alias("repetitive_flag"),
        )
    )


# --- PII scrubbing ----------------------------------------------------------
#: deliberately simple patterns valid in BOTH regex dialects (Java for
#: Spark, RE2 for DuckDB): no lookaround, no backrefs
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"


@_register(
    "docs_pii_scrub",
    f"""
    SELECT doc_id,
      CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INTEGER) AS n_emails,
      CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS INTEGER) AS n_ips,
      CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS INTEGER) AS n_phones,
      regexp_replace(
        regexp_replace(
          regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
          '{PII_IPV4}', '<IP>', 'g'),
        '{PII_PHONE}', '<PHONE>', 'g') AS scrubbed_text
    FROM documents
    """,
)
def docs_pii_scrub(t: Frames) -> DataFrame:
    """PII redaction pass: emails, IPv4 addresses, and phone numbers
    are replaced with typed placeholder tokens; per-doc match counts
    ride along for audit/reporting. Patterns are intentionally
    lookaround-free so Java (Spark) and RE2 (DuckDB oracle) agree
    byte-for-byte. Scrub order: email → IP → phone (counts are taken
    on the ORIGINAL text, so order only affects the rewritten string,
    and the placeholder tokens cannot re-match a later pattern).

    Scale design: pure per-row regexp expressions inside whole-stage
    codegen — no shuffle, no UDF; at 100 TB this is scan-bound, and
    the regex cost is linear in text bytes (both dialects compile to
    DFA-ish matchers for these patterns).
    """
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return t["documents"].select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count("text", F.lit(PII_IPV4)).cast("int").alias("n_ips"),
        F.regexp_count("text", F.lit(PII_PHONE)).cast("int").alias("n_phones"),
        scrubbed.alias("scrubbed_text"),
    )


# --- domain mixing weights --------------------------------------------------
#: temperature exponent for domain upsampling: weight ∝ tokens^ALPHA.
#: ALPHA=1 is proportional sampling; ALPHA→0 is uniform-over-domains.
MIX_ALPHA = 0.5
#: token budget the mixture is planned against
MIX_BUDGET_TOKENS = 1_000_000


@_register(
    "docs_mix_weights",
    f"""
    WITH per_source AS (
      SELECT source,
             COUNT(*) AS n_docs,
             SUM(len({_TOKENS})) AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           {dround_sql("pow(CAST(n_tokens AS DOUBLE), " + str(MIX_ALPHA) + ") / SUM(pow(CAST(n_tokens AS DOUBLE), " + str(MIX_ALPHA) + ")) OVER ()")} AS mix_weight,
           {dround_sql("(pow(CAST(n_tokens AS DOUBLE), " + str(MIX_ALPHA) + ") / SUM(pow(CAST(n_tokens AS DOUBLE), " + str(MIX_ALPHA) + ")) OVER ()) * " + str(MIX_BUDGET_TOKENS) + " / CAST(n_tokens AS DOUBLE)")} AS epochs_at_budget
    FROM per_source
    """,
)
def docs_mix_weights(t: Frames) -> DataFrame:
    """Domain-mixture planning: per source, token counts and a
    temperature-scaled sampling weight (∝ tokens^MIX_ALPHA,
    normalized) plus the implied epoch multiplier at a fixed token
    budget — the table a training run's data loader samples domains
    from (rare domains upsampled, huge domains downsampled, the
    standard mixture-temperature trick).

    Scale design: one keyed partial-agg groupBy collapses the corpus
    to |sources| rows; the normalizing window then runs over that
    tiny aggregate (single partition BY DESIGN — it is |sources|
    rows, not corpus rows; the unpartitioned window never sees the
    raw data).
    """
    per = (
        t["documents"]
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size(_tokens_col())).cast("long").alias("n_tokens"),
        )
    )
    raw = F.pow(F.col("n_tokens").cast("double"), F.lit(MIX_ALPHA))
    total = F.sum(raw).over(Window.partitionBy())
    weight = raw / total
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        dround(weight).alias("mix_weight"),
        dround(
            weight * F.lit(float(MIX_BUDGET_TOKENS)) / F.col("n_tokens").cast("double")
        ).alias("epochs_at_budget"),
    )


# --- deterministic epoch shuffle --------------------------------------------
#: epochs materialized by the shuffle plan (each epoch = an
#: independent deterministic permutation)
SHUFFLE_EPOCHS = 2


# --- deterministic sample-to-token-budget ------------------------------------
#: token budget for the SAMPLED corpus cut — deliberately BELOW the
#: smallest testdata corpus (~27k tokens at sf0.001/0.01, ~270k at
#: sf0.1) so the per-source acceptance rates are non-vacuous (< 1) at
#: every sf; a real run sets this to its training budget
SAMPLE_BUDGET_TOKENS = 10_000
#: second Knuth-family odd constant (xxhash32 PRIME2) — deliberately
#: DIFFERENT from the split hash's 2654435761 so sample membership and
#: train/test assignment are decorrelated hash functions of doc_id;
#: same plain-BIGINT discipline: key reduced mod 2^31-1 first, max
#: product (2^31-2) * 2246822519 ≈ 4.83e18 < 2^63-1, overflow-free
#: under ANSI in both engines at every BIGINT doc_id
_SAMPLE_MIX = 2246822519
_SAMPLE_PRIME = 2147483647  # == dedup._SPLIT_PRIME (Mersenne 2^31-1)
#: resolution of the per-doc uniform draw (1e-6 grid)
_SAMPLE_RES = 1_000_000

_SAMPLE_RATE_EXPR = (
    f"LEAST(1.0, (pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA})"
    f" / SUM(pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA})) OVER ())"
    f" * {SAMPLE_BUDGET_TOKENS} / CAST(n_tokens AS DOUBLE))"
)


@_register(
    "docs_sample_to_budget",
    f"""
    WITH per_source AS (
      SELECT source, SUM(len({_TOKENS})) AS n_tokens
      FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source, {dround_sql(_SAMPLE_RATE_EXPR, 6)} AS p_source
      FROM per_source
    )
    SELECT d.doc_id, d.source,
           CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
           r.p_source
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE CAST(((d.doc_id % {_SAMPLE_PRIME}) * {_SAMPLE_MIX}) % {_SAMPLE_RES}
               AS DOUBLE) / {_SAMPLE_RES} < r.p_source
    """,
)
def docs_sample_to_budget(t: Frames) -> DataFrame:
    """Draw ONE deterministic corpus cut of ~SAMPLE_BUDGET_TOKENS
    tokens mixed per the temperature weights — the materialized form
    of ``docs_mix_weights``: that op plans the mixture (per-source
    weights + epoch multipliers); this op actually EMITS the sampled
    document set. Per source, the acceptance rate is
    min(1, weight_s x budget / tokens_s); a document is in the cut iff
    its doc-keyed uniform draw (plain-BIGINT multiplicative hash on
    the 1e-6 grid — no RNG, no seed state) falls under its source's
    rate. Expected sampled tokens per source = weight_s x budget
    (exactly the loader contract), and the cut is REPRODUCIBLE across
    runs, engines, and partitionings, which is what makes the oracle
    an exact per-document assignment check rather than a proportions
    band.

    Scale design: one keyed partial-agg groupBy collapses the corpus
    to |sources| token totals (the mix_weights plan); the rate table
    is |sources| rows and broadcast-joins back; acceptance is a pure
    codegen row predicate — one corpus scan, one tiny broadcast, no
    corpus-sized shuffle. The sample hash reduces doc_id mod 2^31-1
    BEFORE the Knuth multiply (the docs_split_leakage_safe overflow
    discipline) and uses a DIFFERENT mix constant, so 100 TB doc-id
    spaces neither overflow nor correlate sampling with the
    train/test split."""
    per = (
        t["documents"]
        .groupBy("source")
        .agg(F.sum(F.size(_tokens_col())).cast("long").alias("n_tokens"))
    )
    raw = F.pow(F.col("n_tokens").cast("double"), F.lit(MIX_ALPHA))
    weight = raw / F.sum(raw).over(Window.partitionBy())
    rates = per.select(
        "source",
        dround(
            F.least(
                F.lit(1.0),
                weight
                * F.lit(float(SAMPLE_BUDGET_TOKENS))
                / F.col("n_tokens").cast("double"),
            ),
            6,
        ).alias("p_source"),
    )
    u = (
        ((F.col("doc_id") % F.lit(_SAMPLE_PRIME)) * F.lit(_SAMPLE_MIX))
        % F.lit(_SAMPLE_RES)
    ).cast("double") / F.lit(float(_SAMPLE_RES))
    return (
        t["documents"]
        .select("doc_id", "source", F.size(_tokens_col()).alias("n_tokens"))
        .join(rates, "source")
        .filter(u < F.col("p_source"))
        .select("doc_id", "source", "n_tokens", "p_source")
    )


@_register(
    "docs_epoch_shuffle",
    f"""
    SELECT d.doc_id, e.epoch,
           md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR))
             AS shuffle_key
    FROM documents d
    CROSS JOIN (SELECT unnest(generate_series(0, {SHUFFLE_EPOCHS - 1})) AS epoch) e
    """,
)
def docs_epoch_shuffle(t: Frames) -> DataFrame:
    """Deterministic global training shuffle: each (doc, epoch) gets
    a shuffle key = md5(doc_id ':' epoch); reading epoch e in
    shuffle_key order is an independent pseudo-random permutation of
    the corpus per epoch — reproducible across runs and engines, no
    RNG state to manage. The loader sorts (or range-partitions) by
    the key; nothing about the permutation lives on the driver.

    Scale design: a per-row hash expression plus a 2-element explode —
    no shuffle at all in THIS operator; the downstream ORDER BY
    shuffle_key is Spark's range-partitioned sort (sampled bounds,
    fully parallel), which is exactly the mechanism a 100 TB epoch
    shuffle should use — never coalesce(1), never a driver-side
    permutation array.
    """
    return t["documents"].select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SHUFFLE_EPOCHS - 1))).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.col("epoch").cast("string"))
        ).alias("shuffle_key"),
    )


# --- DSIR importance weights (Xie et al. 2023, arXiv:2302.03169) ------------
#: hashed n-gram feature buckets (the paper uses 10k; 64 keeps the
#: synthetic corpus's per-bucket counts dense enough to be meaningful)
DSIR_B = 64
#: Laplace pseudo-count per bucket for both bag-of-ngrams models
DSIR_ALPHA = 1.0
#: the "target distribution" slice of this corpus: English-labeled docs
DSIR_TARGET_LANG = "en"

_DSIR_BUCKET = f"('0x' || substr(md5(gram.g), 1, 8))::BIGINT % {DSIR_B}"


@_register(
    "docs_dsir_weights",
    f"""
    WITH d AS (SELECT doc_id, lang, {_TOKENS} AS t FROM documents),
    g AS (
      SELECT doc_id, lang,
             list_concat(
               t, list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
             ) AS grams
      FROM d
    ),
    db AS (
      SELECT doc_id, lang, {_DSIR_BUCKET} AS b, COUNT(*) AS n
      FROM g, UNNEST(grams) AS gram(g)
      GROUP BY 1, 2, 3
    ),
    raw AS (SELECT b, SUM(n) AS c_r FROM db GROUP BY b),
    tgt AS (
      SELECT b, SUM(n) AS c_t FROM db
      WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
    ),
    tot AS (
      SELECT (SELECT SUM(n) FROM db) AS r_total,
             (SELECT SUM(n) FROM db WHERE lang = '{DSIR_TARGET_LANG}') AS t_total
    ),
    ratio AS (
      SELECT raw.b,
             ln((COALESCE(tgt.c_t, 0) + {DSIR_ALPHA}) / (tot.t_total + {DSIR_ALPHA} * {DSIR_B}))
           - ln((raw.c_r + {DSIR_ALPHA}) / (tot.r_total + {DSIR_ALPHA} * {DSIR_B})) AS lr
      FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
    )
    SELECT db.doc_id, CAST(SUM(db.n) AS BIGINT) AS n_grams,
           {dround_sql('SUM(db.n * ratio.lr)', 4)} AS log_importance,
           ({dround_sql('SUM(db.n * ratio.lr)', 4)} > 0) AS target_like
    FROM db JOIN ratio USING (b)
    GROUP BY db.doc_id
    """,
)
def docs_dsir_weights(t: Frames) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance
    Resampling, arXiv:2302.03169): score every raw document by how
    much more likely its hashed unigram+bigram bag is under the
    TARGET distribution (here: the 'en'-labeled slice) than under the
    raw-corpus distribution. ``log_importance > 0`` ⇒ more
    target-like than corpus-average; downstream selection resamples
    by this weight (compose with ``q_weighted_sample``'s md5-fraction
    row policy for the deterministic draw).

    Scale design: the gram explode is corpus-linear (same class as
    the dedup gram tables) and computed ONCE (lazy checkpoint feeds
    all three consumers); both bag-of-ngrams models are B-bucket
    groupBys with map-side partials; the log-ratio table is B rows
    BROADCAST back, so the per-doc scoring join never shuffles the
    corpus — the only corpus-keyed shuffle is the final doc_id agg.
    Hash bucket = md5-prefix mod B, bit-identical in both engines."""
    toks = _tokens_col()
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("long")
        % DSIR_B
    )
    doc_b = (
        spread_small_input(t["documents"])
        .select("doc_id", "lang", F.explode(grams).alias("g"))
        .groupBy("doc_id", "lang", bucket.alias("b"))
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    # BOTH bag-of-ngrams models in ONE groupBy over the checkpointed
    # gram table (conditional sum for the target slice), and the two
    # totals derived from the B-row bucket table instead of rescanning
    # doc_b — the checkpoint is read twice total (models + scoring),
    # not four times. Wall time is unchanged at sf0.1 (~4.5 s): the
    # cost is gram CONSTRUCTION (tokenize + per-token bigram concat,
    # profiled 2.96 s explode-only; md5 vs xxhash bucket differ by
    # only 0.1 s), which the checkpoint already pays exactly once —
    # but the fused shape halves the stage count and the shuffle reads.
    bucket_tbl = doc_b.groupBy("b").agg(
        F.sum("n").alias("c_r"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("n"))), F.lit(0)
        ).alias("c_t"),
    )
    totals = bucket_tbl.agg(
        F.sum("c_r").alias("r_total"), F.sum("c_t").alias("t_total")
    )
    ratio = (
        bucket_tbl.crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log(
                    (F.col("c_t") + DSIR_ALPHA)
                    / (F.col("t_total") + DSIR_ALPHA * DSIR_B)
                )
                - F.log(
                    (F.col("c_r") + DSIR_ALPHA)
                    / (F.col("r_total") + DSIR_ALPHA * DSIR_B)
                )
            ).alias("lr"),
        )
    )
    logw = dround(F.sum(F.col("n") * F.col("lr")), 4)
    return (
        doc_b.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_grams"),
            logw.alias("log_importance"),
            (logw > 0).alias("target_like"),
        )
    )


# --- classifier-based data selection (GPT-3 §2.2 / CCNet style) -------------
def docs_classifier_scores(t: Frames) -> DataFrame:
    """The third published data-selection family, after heuristic
    filters (text_quality) and importance weights (docs_dsir_weights):
    a LEARNED classifier scoring every raw document's similarity to
    the target slice (GPT-3 trained LR over tf-idf against WebText;
    CCNet a fastText model against Wikipedia). Here: seeded Spark-ML
    logistic regression over cheap per-doc shape features, target =
    the 'en'-labeled slice, output = per-doc target probability.

    Scale design: feature extraction is pure column math (one scan);
    training data is the whole corpus but the feature vector is tiny
    and LR is a few distributed gradient passes; scoring broadcasts
    the fitted model's coefficient vector — one more scan. No
    all-pairs, no UDFs in the scan path."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    toks = _tokens_col()
    n = F.size(toks)
    feats = spread_small_input(t["documents"]).select(
        "doc_id",
        (F.col("lang") == "en").cast("double").alias("label"),
        n.cast("double").alias("f_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / n).alias("f_diversity"),
        (F.length("text").cast("double") / n).alias("f_avg_token_len"),
        (
            F.size(F.filter(toks, lambda x: F.length(x) <= 3)).cast("double") / n
        ).alias("f_short_ratio"),
    )
    assembled = VectorAssembler(
        inputCols=["f_tokens", "f_diversity", "f_avg_token_len", "f_short_ratio"],
        outputCol="features",
    ).transform(feats.fillna(0.0))
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=50, regParam=0.01
    )
    model = lr.fit(assembled)
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(assembled)
    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(
        "doc_id",
        dround(p1, 4).alias("p_target"),
        (p1 > 0.5).alias("predicted_target"),
        F.col("label").cast("int").alias("actual_target"),
    )


CURATION_OPS["docs_classifier_scores"] = (docs_classifier_scores, None)


# --- composed end-to-end curation (the actual pre-training data path) -------
# capstone integration of the separately-registered passes: exact-dedup
# keeper election ∧ quality gate ∧ language gate ∧ benchmark
# decontamination ∧ PII scrub — one registered entry whose SURVIVING-DOC
# SET is DuckDB-oracled, so the composition (not just each pass) is
# driver-checked. The classifier-scored variant below adds the learned
# GPT-3-style selection gate on top (rows-only: Spark-ML LR).
from real_time_fraud_detection_lakehouse_spark.operators.text import (  # noqa: E402
    _GRAMS5,
    _QUALITY_SQL,
    DECON_EVAL_SOURCE,
    DECON_GRAM,
    EN_STOPWORDS,
    _EN_SET,
    decon_gram_hashes,
)


def curation_columns() -> dict[str, "F.Column"]:
    """The curation gate expressions as named Columns over a `text`
    column — the SHARED FEATURE MODULE for the batch pipeline
    (docs_curate_pipeline) and its streaming filter-at-ingest twin
    (streaming/curation.py), the same batch+stream-parity idiom as
    functions/features.py: one definition, two execution modes, so the
    gates cannot drift. All stateless column math — usable inside a
    streaming micro-batch unchanged."""
    toks = _tokens_col()
    n = F.size(toks)
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    length_ok = F.when(n.between(20, 1000), 1.0).otherwise(0.0)
    en = F.lit(list(EN_STOPWORDS))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return {
        "n_tokens": n,
        "quality_score": dround(F.lit(0.5) * length_ok + F.lit(0.5) * diversity),
        "en_hits": F.size(F.filter(toks, lambda x: F.array_contains(en, x))),
        "n_pii": (
            F.regexp_count("text", F.lit(PII_EMAIL))
            + F.regexp_count("text", F.lit(PII_IPV4))
            + F.regexp_count("text", F.lit(PII_PHONE))
        ).cast("int"),
        "clean_fp": F.md5(scrubbed),
        "fp": F.md5(F.lower(F.trim(F.col("text")))),
    }


@_register(
    "docs_curate_pipeline",
    f"""
    WITH keepers AS (
      SELECT md5(lower(trim(text))) AS fp, MIN(doc_id) AS keeper
      FROM documents GROUP BY 1
    ),
    eval_grams AS (
      SELECT DISTINCT unnest({_GRAMS5}) AS gram FROM documents
      WHERE source = '{DECON_EVAL_SOURCE}' AND len({_TOKENS}) >= {DECON_GRAM}
    ),
    contaminated AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, unnest({_GRAMS5}) AS gram FROM documents
            WHERE source <> '{DECON_EVAL_SOURCE}' AND len({_TOKENS}) >= {DECON_GRAM}) t
      JOIN eval_grams e ON t.gram = e.gram
    ),
    scored AS (
      SELECT doc_id, source,
             CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
             {dround_sql(_QUALITY_SQL)} AS quality_score,
             len(list_filter({_TOKENS}, x -> list_contains({_EN_SET}, x))) AS en_hits,
             CAST(len(regexp_extract_all(text, '{PII_EMAIL}'))
                + len(regexp_extract_all(text, '{PII_IPV4}'))
                + len(regexp_extract_all(text, '{PII_PHONE}')) AS INTEGER) AS n_pii,
             md5(regexp_replace(
                   regexp_replace(
                     regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                     '{PII_IPV4}', '<IP>', 'g'),
                   '{PII_PHONE}', '<PHONE>', 'g')) AS clean_fp
      FROM documents
    )
    SELECT s.doc_id, s.source, s.n_tokens, s.quality_score, s.n_pii, s.clean_fp
    FROM scored s
    JOIN keepers k ON s.doc_id = k.keeper
    WHERE s.quality_score >= 0.5
      AND s.en_hits > 0
      AND s.source <> '{DECON_EVAL_SOURCE}'
      AND s.doc_id NOT IN (SELECT doc_id FROM contaminated)
      -- text IS NOT NULL keeps NOT IN two-valued (a NULL eval text would
      -- make the whole NOT IN return NULL for every row — three-valued
      -- semantics Spark's left_anti join does not share)
      AND k.fp NOT IN (SELECT DISTINCT md5(lower(trim(text))) FROM documents
                       WHERE source = '{DECON_EVAL_SOURCE}' AND text IS NOT NULL)
    """,
)
def docs_curate_pipeline(t: Frames) -> DataFrame:
    """End-to-end curation: exact-dedup keeper election (min doc_id
    per lowercase-trimmed md5 fingerprint) ∧ quality_score ≥ 0.5 ∧ ≥1
    English marker token ∧ not the eval source ∧ shares NO
    {DECON_GRAM}-gram with the eval source ∧ fingerprint NOT held by
    any eval-source doc, with the surviving text PII-scrubbed
    (fingerprint + scrub-count columns prove the rewrite ran). The
    surviving-doc set is the pipeline's contract and is DuckDB-oracled
    end to end.

    The exact-fp eval quarantine (round 9) closes the short-doc
    contamination hole: a doc shorter than {DECON_GRAM} tokens carries
    no grams, so a verbatim train-source copy of a short eval doc used
    to slip past the gram gate whenever the keeper election picked the
    train copy. Quarantining by fingerprint is keeper- and
    order-independent — the streaming ingest twin applies the same
    rule (streaming/curation.py), so a duplicate class spanning
    eval+train sources dies in both modes regardless of which member
    is elected or arrives first.

    Scale design — the composition inherits each pass's plan: all
    scoring/scrubbing is scan-side column math; keeper election is one
    fingerprint-keyed partial agg; decontamination broadcasts the tiny
    eval gram set for the semi-join (the corpus side never shuffles
    there); the keeper and not-contaminated gates are one equi-join
    plus one anti-join. The contaminated-id set is bounded by the
    CORPUS contamination rate, not the eval size, so its anti-join
    carries NO broadcast hint — Catalyst/AQE picks broadcast when it
    fits and falls back to a shuffle join on a heavily contaminated
    corpus instead of blowing the driver. Two corpus scans total
    (score/scrub + gram explode), no UDFs, no all-pairs anywhere."""
    docs = spread_small_input(t["documents"])
    cols = curation_columns()
    scored = docs.select(
        "doc_id",
        "source",
        cols["n_tokens"].alias("n_tokens"),
        cols["quality_score"].alias("quality_score"),
        cols["en_hits"].alias("en_hits"),
        cols["n_pii"].alias("n_pii"),
        cols["clean_fp"].alias("clean_fp"),
    )
    keepers = docs.groupBy(cols["fp"].alias("fp")).agg(
        F.min("doc_id").alias("keeper")
    )
    # token-hash gram chains (the docs_decontaminate round-7 fix):
    # both sides of the semi-join hash identically, and the oracle's
    # string-gram membership is set-identical by hash injectivity
    toks = _tokens_col()
    hashed = docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_toks"),
        F.transform(toks, lambda x: F.xxhash64(x)).alias("th"),
    )
    grams = decon_gram_hashes(F.col("th"))
    long_enough = F.col("n_toks") >= DECON_GRAM
    eval_grams = (
        hashed.filter((F.col("source") == DECON_EVAL_SOURCE) & long_enough)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    contaminated = (
        hashed.filter((F.col("source") != DECON_EVAL_SOURCE) & long_enough)
        .select("doc_id", F.explode(grams).alias("gram"))
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    # exact-fp eval quarantine: benchmark-sized (small by definition)
    # but sf-scaling in the fixture, so UNHINTED — planner/AQE
    # broadcasts it while it fits (module policy in plans/relational.py)
    eval_fps = (
        docs.filter(F.col("source") == DECON_EVAL_SOURCE)
        .select(cols["fp"].alias("fp"))
        .distinct()
    )
    return (
        scored.join(keepers, scored["doc_id"] == keepers["keeper"])
        .filter(
            (F.col("quality_score") >= 0.5)
            & (F.col("en_hits") > 0)
            & (F.col("source") != DECON_EVAL_SOURCE)
        )
        .join(contaminated, "doc_id", "left_anti")
        .join(eval_fps, "fp", "left_anti")
        .select("doc_id", "source", "n_tokens", "quality_score", "n_pii", "clean_fp")
    )


def docs_curate_pipeline_scored(t: Frames) -> DataFrame:
    """The oracled survivor set with the LEARNED selection gate wired
    on top (the verdict-asked integration of docs_classifier_scores
    into the composed path): each surviving doc carries its classifier
    target probability and the final keep decision p_target > 0.5 —
    the full GPT-3-style curate-then-select training-data path.
    Rows-only: the LR fit is iterative Spark-ML (the deterministic
    survivor set is already driver-oracled above; the classifier
    machinery is pinned by its planted separable-class test)."""
    survivors = docs_curate_pipeline(t)
    scores = docs_classifier_scores(t).select("doc_id", "p_target", "predicted_target")
    return (
        survivors.join(scores, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "quality_score",
            "p_target",
            (F.col("p_target") > 0.5).alias("selected"),
        )
    )


CURATION_OPS["docs_curate_pipeline_scored"] = (docs_curate_pipeline_scored, None)


# --- unigram-LM log-probability scoring (CCNet-style perplexity proxy) ------
#: add-one smoothing mass; vocabulary size enters the denominator
UNIGRAM_ALPHA = 1.0

@_register(
    "docs_unigram_logprob",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS}) AS word FROM documents
    ),
    model AS (
      SELECT word, COUNT(*) AS c FROM tok GROUP BY word
    ),
    totals AS (
      SELECT SUM(c) AS n, COUNT(*) AS v FROM model
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           {dround_sql("AVG(ln((m.c + 1.0) / (tt.n + 1.0 * tt.v)))")} AS avg_logprob,
           {dround_sql("AVG(ln((m.c + 1.0) / (tt.n + 1.0 * tt.v)))")} >= -6.0 AS lm_keep
    FROM tok t JOIN model m ON t.word = m.word CROSS JOIN totals tt
    GROUP BY t.doc_id
    """,
)
def docs_unigram_logprob(t: Frames) -> DataFrame:
    """Language-model quality scoring, the third published selection
    family's cheap exact form (CCNet filters on LM perplexity; a
    unigram model is the largest LM whose training AND scoring stay
    fully relational, so the whole operator is DuckDB-oracled): train
    add-one-smoothed unigram probabilities on the corpus itself, score
    each doc by mean token log-probability — gibberish/rare-token docs
    score low, stopword-y natural text scores high. Returns
    (doc_id, n_tokens, avg_logprob, lm_keep) with the keep gate at
    avg_logprob ≥ −6.0 (≈ perplexity ≤ 400 under e-base logs).

    Scale design (the DSIR shape): ONE corpus explode feeds both the
    model groupBy (map-side partials, shuffle keyed on word —
    Heaps-bounded output) and the scoring join; the per-doc mean
    collapses map-side because a doc's tokens are partition-local. The
    corpus shuffles once (doc_id agg); smoothing totals are a broadcast
    1-row aggregate, never collected. The scoring join carries NO
    forced hint and NO eager size probe: the model is localCheckpointed,
    so AQE reads its exact materialized size at runtime and broadcasts
    while it fits ``spark.sql.autoBroadcastJoinThreshold``, falling
    back to a shuffle join on word when a 1e8-row web-corpus vocabulary
    exceeds it — both plans output-identical, and building this
    DataFrame launches zero Spark jobs (lazy-build regression test in
    tests/test_llm_ops.py)."""
    docs = spread_small_input(t["documents"])
    tok = docs.select("doc_id", F.explode(_tokens_col()).alias("word")).localCheckpoint(
        eager=False
    )
    model = tok.groupBy("word").agg(F.count("*").alias("c")).localCheckpoint(eager=False)
    totals = model.agg(
        F.sum("c").alias("n"), F.count("*").cast("long").alias("v")
    )
    scored = (
        tok.join(model, "word")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            dround(
                F.avg(
                    F.log(
                        (F.col("c") + UNIGRAM_ALPHA)
                        / (F.col("n") + UNIGRAM_ALPHA * F.col("v"))
                    )
                )
            ).alias("avg_logprob"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "avg_logprob",
        (F.col("avg_logprob") >= -6.0).alias("lm_keep"),
    )


# --- corpus → training batches (the end-to-end pre-training data path) ------
#: hex chars of the md5 shuffle key used as the per-epoch prefix-sum
#: bucket; fan-out = 16**prefix (2 -> 256 uniform buckets)
_C2B_PREFIX = 2
_C2B_BUCKETS = 16 ** _C2B_PREFIX


def _corpus_to_batches_sql() -> str:
    """Oracle for the composed path, built by nesting the registered
    docs_curate_pipeline oracle as the survivor CTE — the two stay in
    lock-step by construction."""
    from real_time_fraud_detection_lakehouse_spark.operators.text import SEQ_LEN

    curate = CURATION_OPS["docs_curate_pipeline"][1]
    return f"""
    WITH survivors AS (
      SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens FROM ({curate}) c
    ),
    shuf AS (
      SELECT s.doc_id, s.n_tokens, e.epoch,
             md5(CAST(s.doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR))
               AS shuffle_key
      FROM survivors s
      CROSS JOIN (
        SELECT unnest(generate_series(0, {SHUFFLE_EPOCHS - 1})) AS epoch
      ) e
    ),
    cum AS (
      SELECT epoch, doc_id, n_tokens, shuffle_key,
             SUM(n_tokens) OVER (PARTITION BY epoch
               ORDER BY shuffle_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS cum_before
      FROM shuf
    )
    SELECT epoch, doc_id, n_tokens, shuffle_key,
           CAST(cum_before // {SEQ_LEN} AS BIGINT) AS seq_id,
           CAST(cum_before % {SEQ_LEN} AS INTEGER) AS seq_offset
    FROM cum
    """


def corpus_to_batches(t: Frames) -> DataFrame:
    """The artifact a pre-training run actually consumes (the round-7
    verdict's Next #5): curated survivors → deterministic per-epoch
    shuffle → fixed-length sequence packing, composed end to end.
    For every (surviving doc, epoch): the epoch's shuffle key, and the
    packed sequence id/offset where the doc starts when the epoch's
    permutation is concatenated and cut every SEQ_LEN tokens. A loader
    range-partitions epoch e by shuffle_key and streams batches with
    zero padding waste. Fully DuckDB-oracled — the survivor CTE IS the
    docs_curate_pipeline oracle, so curation and packing cannot drift.

    Scale design: the survivor set is computed ONCE (two corpus scans,
    see docs_curate_pipeline); the epoch fan-out is a per-row 2-element
    explode; the per-epoch running offset is the docs_pack_sequences
    DISTRIBUTED PREFIX SUM transplanted onto shuffle-key order — hex
    prefix of the md5 key = 16**_C2B_PREFIX (256) uniform buckets whose string
    order agrees with full-key order, so (1) per-(epoch, bucket) token
    totals via one keyed agg, (2) a running offset over the
    ≤ epochs×256-row totals table (tiny window), (3) a
    within-bucket cumsum window parallel across (epoch, bucket). No
    global single-partition window, no driver state; md5 keys make the
    permutation reproducible across engines and runs."""
    from real_time_fraud_detection_lakehouse_spark.operators.text import SEQ_LEN

    survivors = docs_curate_pipeline(t).select(
        "doc_id", F.col("n_tokens").cast("int").alias("n_tokens")
    )
    shuf = (
        survivors.select(
            "doc_id",
            "n_tokens",
            F.explode(F.sequence(F.lit(0), F.lit(SHUFFLE_EPOCHS - 1))).alias("epoch"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "epoch",
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    F.col("epoch").cast("string"),
                )
            ).alias("shuffle_key"),
        )
        .withColumn("bucket", F.substring("shuffle_key", 1, _C2B_PREFIX))
        # note (r17, measured): pre-partitioning by (epoch, bucket)
        # before this checkpoint does NOT save the downstream
        # exchanges — Spark 4's LogicalRDD scan reports
        # UnknownPartitioning, so the totals agg and cumsum window
        # re-exchange regardless; the extra repartition was tried and
        # reverted (plans/r17/corpus_to_batches_*.txt)
        .localCheckpoint(eager=False)  # feeds totals AND the cumsum side
    )
    totals = shuf.groupBy("epoch", "bucket").agg(F.sum("n_tokens").alias("btotal"))
    w_off = (
        Window.partitionBy("epoch")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "epoch",
        "bucket",
        (F.sum("btotal").over(w_off) - F.col("btotal")).alias("boffset"),
    )
    w_in = (
        Window.partitionBy("epoch", "bucket")
        .orderBy("shuffle_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = shuf.join(F.broadcast(offsets), ["epoch", "bucket"]).select(
        "epoch",
        "doc_id",
        "n_tokens",
        "shuffle_key",
        (
            F.col("boffset") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")
        ).alias("cum_before"),
    )
    return cum.select(
        "epoch",
        "doc_id",
        "n_tokens",
        "shuffle_key",
        F.floor(F.col("cum_before") / SEQ_LEN).cast("long").alias("seq_id"),
        (F.col("cum_before") % SEQ_LEN).cast("int").alias("seq_offset"),
    )


CURATION_OPS["corpus_to_batches"] = (corpus_to_batches, _corpus_to_batches_sql())


def _token_budget_sql() -> str:
    """Oracle for the budget report: one grouped pass nested over the
    corpus_to_batches oracle (which itself nests the curate oracle) —
    three layers of composition, all driver-hash-checked."""
    from real_time_fraud_detection_lakehouse_spark.operators.text import SEQ_LEN

    packed = CURATION_OPS["corpus_to_batches"][1]
    return f"""
    WITH packed AS ({packed}),
    per AS (
      SELECT epoch, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM packed GROUP BY epoch
    )
    SELECT epoch, n_docs, total_tokens,
           CAST((total_tokens + {SEQ_LEN - 1}) // {SEQ_LEN} AS BIGINT)
             AS n_sequences,
           CAST((total_tokens + {SEQ_LEN - 1}) // {SEQ_LEN} * {SEQ_LEN}
                - total_tokens AS INTEGER) AS tail_padding,
           {dround_sql('total_tokens * 1.0 / n_docs')} AS avg_doc_tokens
    FROM per
    """


def docs_token_budget_report(t: Frames) -> DataFrame:
    """The pre-training budget sheet over the packed corpus: per
    epoch — surviving docs, total tokens, full SEQ_LEN sequences the
    loader will emit (ceil), and the padding waste in the final
    partial sequence (the ONLY padding concat-and-cut packing ever
    produces). The number a training run sizes its step count and
    data-parallel sharding from.

    Scale design (r16, guide §1.2 "don't compute things you throw
    away"): the report's per-epoch COUNT/SUM do not depend on the
    packing columns at all — corpus_to_batches emits exactly one row
    per (survivor, epoch) and n_tokens rides through from the survivor
    set unchanged, so grouping its output by epoch is identical to
    aggregating the survivor set once and fanning the single row out
    over the epoch sequence. That drops the two packing windows, the
    offsets join and the epoch-fanned shuffle from this entry's plan
    (the oracle still nests the packing oracle; the aggregation over
    it is equal by the one-row-per-(doc, epoch) invariant above).
    Everything else is per-group arithmetic. Oracle nests the packing
    oracle which nests the curate oracle — the full three-stage
    composition is hash-checked as one artifact."""
    from real_time_fraud_detection_lakehouse_spark.operators.text import SEQ_LEN

    survivors = docs_curate_pipeline(t).select(
        "doc_id", F.col("n_tokens").cast("int").alias("n_tokens")
    )
    base = survivors.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    # n_docs > 0 guard: a grouped agg over an EMPTY packed table emits
    # no rows, while a global agg emits one — filter restores exact
    # empty-corpus equivalence
    per = base.filter(F.col("n_docs") > 0).select(
        F.explode(F.sequence(F.lit(0), F.lit(SHUFFLE_EPOCHS - 1))).alias("epoch"),
        "n_docs",
        "total_tokens",
    )
    n_seq = F.floor((F.col("total_tokens") + (SEQ_LEN - 1)) / SEQ_LEN).cast("long")
    return per.select(
        "epoch",
        "n_docs",
        "total_tokens",
        n_seq.alias("n_sequences"),
        (n_seq * SEQ_LEN - F.col("total_tokens")).cast("int").alias("tail_padding"),
        dround(F.col("total_tokens") * 1.0 / F.col("n_docs")).alias("avg_doc_tokens"),
    )


CURATION_OPS["docs_token_budget_report"] = (docs_token_budget_report, _token_budget_sql())


# --- epoch-expanded mixture materialization (upsampling side) ----------------
#: token budget for the EPOCH-expanded cut — deliberately ABOVE the
#: small-sf corpus (~27k tokens) so rare sources get rate > 1 (real
#: upsampling: whole epochs + a Bernoulli remainder) while at sf0.1
#: (~270k tokens) every rate is < 1 (pure downsampling) — both
#: regimes exercise across the testdata SFs
EPOCH_BUDGET_TOKENS = 60_000

_EPOCH_RATE_EXPR = (
    f"(pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA})"
    f" / SUM(pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA})) OVER ())"
    f" * {EPOCH_BUDGET_TOKENS} / CAST(n_tokens AS DOUBLE)"
)


@_register(
    "docs_sample_epochs",
    f"""
    WITH per_source AS (
      SELECT source, SUM(len({_TOKENS})) AS n_tokens
      FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source, {dround_sql(_EPOCH_RATE_EXPR, 6)} AS rate
      FROM per_source
    ),
    perdoc AS (
      SELECT d.doc_id, d.source,
             CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
             r.rate,
             CAST(FLOOR(r.rate) AS INTEGER)
               + CASE WHEN CAST(((d.doc_id % {_SAMPLE_PRIME}) * {_SAMPLE_MIX})
                            % {_SAMPLE_RES} AS DOUBLE) / {_SAMPLE_RES}
                      < r.rate - FLOOR(r.rate)
                      THEN 1 ELSE 0 END AS copies
      FROM documents d JOIN rates r ON d.source = r.source
    )
    SELECT doc_id, source, n_tokens,
           CAST(unnest(generate_series(0, copies - 1)) AS INTEGER) AS epoch
    FROM perdoc WHERE copies > 0
    """,
)
def docs_sample_epochs(t: Frames) -> DataFrame:
    """The UPSAMPLING half of mixture materialization: per source the
    uncapped rate weight_s x budget / tokens_s may exceed 1 (rare
    domains repeat across epochs — exactly what a mixture loader does
    when ``epochs_at_budget`` > 1); each document expands to
    floor(rate) whole copies plus one more iff its uniform draw falls
    under the fractional remainder — so expected sampled tokens per
    source = weight_s x budget with INTEGER epoch indices a loader
    can consume ((doc_id, epoch) rows, epoch-distinct by
    construction). ``docs_sample_to_budget`` is the rate<=1 special
    case of this op (one copy at probability rate); this one is
    registered separately because its output GRAIN differs (multiset
    vs subset).

    Scale design: the mix_weights plan again — one keyed partial-agg,
    a |sources|-row broadcast, then a pure codegen copies expression
    and an explode whose fan-out is the epoch multiplier (bounded by
    budget/tokens_rarest, a config property, not data-dependent
    blowup). The uniform draw is the sampler hash (reduce mod 2^31-1
    then Knuth multiply — overflow-free at every BIGINT doc_id); the
    rate is dround-6'd BEFORE floor/remainder on BOTH engines so the
    whole-epoch count can't flip on a cross-engine ulp at integer
    boundaries. Spark's ``sequence`` infers a NEGATIVE step when
    start > stop (sequence(0, -1) = [0, -1], not empty!), so
    copies=0 is guarded to an explicit empty array rather than
    relying on the SQL generate_series convention."""
    per = (
        t["documents"]
        .groupBy("source")
        .agg(F.sum(F.size(_tokens_col())).cast("long").alias("n_tokens"))
    )
    raw = F.pow(F.col("n_tokens").cast("double"), F.lit(MIX_ALPHA))
    weight = raw / F.sum(raw).over(Window.partitionBy())
    rates = per.select(
        "source",
        dround(
            weight
            * F.lit(float(EPOCH_BUDGET_TOKENS))
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("rate"),
    )
    u = (
        ((F.col("doc_id") % F.lit(_SAMPLE_PRIME)) * F.lit(_SAMPLE_MIX))
        % F.lit(_SAMPLE_RES)
    ).cast("double") / F.lit(float(_SAMPLE_RES))
    copies = (
        F.floor("rate").cast("int")
        + F.when(u < F.col("rate") - F.floor("rate"), 1).otherwise(0)
    ).alias("copies")
    perdoc = (
        t["documents"]
        .select("doc_id", "source", F.size(_tokens_col()).alias("n_tokens"))
        .join(rates, "source")
        .select("doc_id", "source", "n_tokens", copies)
    )
    epochs = F.when(
        F.col("copies") > 0, F.sequence(F.lit(0), F.col("copies") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return perdoc.select(
        "doc_id",
        "source",
        "n_tokens",
        F.explode(epochs).alias("epoch"),
    ).withColumn("epoch", F.col("epoch").cast("int"))


@_register(
    "docs_quality_report",
    """
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m_row_count,
             CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS m_id_nulls,
             CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS m_id_dups,
             CAST(SUM(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS m_text_empty,
             CAST(SUM(CASE WHEN n_chars IS NULL OR n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS m_len_range,
             CAST(SUM(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END) AS BIGINT) AS m_len_consistent,
             CAST(SUM(CASE WHEN lang IS NULL OR length(lang) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS m_lang_nulls,
             CAST(SUM(CASE WHEN source IS NULL OR length(source) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS m_source_nulls
      FROM documents
    )
    SELECT 'row_count_min' AS rule, m_row_count AS metric, m_row_count >= 1 AS passed FROM m
    UNION ALL SELECT 'doc_id_not_null', m_id_nulls, m_id_nulls = 0 FROM m
    UNION ALL SELECT 'doc_id_unique', m_id_dups, m_id_dups = 0 FROM m
    UNION ALL SELECT 'text_not_empty', m_text_empty, m_text_empty = 0 FROM m
    UNION ALL SELECT 'n_chars_positive', m_len_range, m_len_range = 0 FROM m
    UNION ALL SELECT 'n_chars_matches_text', m_len_consistent, m_len_consistent = 0 FROM m
    UNION ALL SELECT 'lang_not_null', m_lang_nulls, m_lang_nulls = 0 FROM m
    UNION ALL SELECT 'source_not_null', m_source_nulls, m_source_nulls = 0 FROM m
    """,
)
def docs_quality_report(t: Frames) -> DataFrame:
    """The ingestion-validation suite for the CORPUS side — the
    ``q_quality_report`` discipline applied to documents before they
    enter the curation pipeline: completeness (id/lang/source/text),
    key uniqueness, and the metadata-consistency check production
    corpora actually break on (``n_chars == length(text)`` — stale
    counts after a re-clean are how budget reports silently lie).
    Deequ-style: ALL eight constraints ride ONE aggregate pass (a
    per-rule scan is a per-rule 100 TB job); the 1-row metric vector
    explodes into the report driver-side — 8 rows, no shuffle."""
    d = t["documents"]
    viol = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    m = d.agg(
        F.count("*").cast("long").alias("m_row_count"),
        viol(F.col("doc_id").isNull()).alias("m_id_nulls"),
        (F.count("*") - F.countDistinct("doc_id")).cast("long").alias("m_id_dups"),
        viol(
            F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0)
        ).alias("m_text_empty"),
        viol(F.col("n_chars").isNull() | (F.col("n_chars") <= 0)).alias("m_len_range"),
        viol(F.col("n_chars") != F.length("text")).alias("m_len_consistent"),
        viol(
            F.col("lang").isNull() | (F.length("lang") == 0)
        ).alias("m_lang_nulls"),
        viol(
            F.col("source").isNull() | (F.length("source") == 0)
        ).alias("m_source_nulls"),
    )
    rules = [
        ("row_count_min", "m_row_count", F.col("m_row_count") >= 1),
        ("doc_id_not_null", "m_id_nulls", F.col("m_id_nulls") == 0),
        ("doc_id_unique", "m_id_dups", F.col("m_id_dups") == 0),
        ("text_not_empty", "m_text_empty", F.col("m_text_empty") == 0),
        ("n_chars_positive", "m_len_range", F.col("m_len_range") == 0),
        ("n_chars_matches_text", "m_len_consistent", F.col("m_len_consistent") == 0),
        ("lang_not_null", "m_lang_nulls", F.col("m_lang_nulls") == 0),
        ("source_not_null", "m_source_nulls", F.col("m_source_nulls") == 0),
    ]
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(metric).alias("metric"),
                    passed.alias("passed"),
                )
                for name, metric, passed in rules
            ]
        )
    ).alias("r")
    return m.select(report).select("r.rule", "r.metric", "r.passed")
