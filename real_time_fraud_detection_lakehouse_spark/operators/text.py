"""Text-analysis operators over the ``documents`` table: token
counting, quality scoring, language-ID heuristic, fingerprinting.

All pure column expressions (split / lambda higher-order functions /
md5) — no Python UDFs, so they run inside whole-stage codegen and
scale linearly with the scan. Each operator has a DuckDB oracle twin.

At 100 TB these are narrow per-row transforms; the only aggregation
(corpus stats) is a standard partial-agg groupBy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_fraud_detection_lakehouse_spark.core.catalog import spread_small_input
from real_time_fraud_detection_lakehouse_spark.sources.transactions import dround, dround_sql

Frames = dict[str, DataFrame]
TEXT_OPS: dict[str, tuple[Callable[[Frames], DataFrame], str | None]] = {}


def _register(name: str, sql: str | None):
    def deco(fn):
        TEXT_OPS[name] = (fn, sql)
        return fn

    return deco


#: Minimal per-language stopword markers for the heuristic language ID.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

_TOKENS = "list_filter(string_split(text, ' '), x -> x <> '')"
_EN_SET = "['the', 'a', 'and', 'of', 'to', 'in', 'is']"


def _tokens_col():
    return F.filter(F.split(F.col("text"), " "), lambda x: x != "")


# --- token/char statistics --------------------------------------------------
@_register(
    "text_stats",
    f"""
    SELECT
      doc_id,
      CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
      CAST(length(text) AS BIGINT) AS n_chars_computed,
      {dround_sql(f"CAST(len(array_to_string({_TOKENS}, '')) AS DOUBLE) / len({_TOKENS})")} AS avg_token_len,
      CAST(len(list_distinct({_TOKENS})) AS INTEGER) AS n_distinct_tokens,
      {dround_sql(f"CAST(len(list_distinct({_TOKENS})) AS DOUBLE) / len({_TOKENS})")} AS type_token_ratio
    FROM documents
    """,
)
def text_stats(t: Frames) -> DataFrame:
    toks = _tokens_col()
    n = F.size(toks)
    return t["documents"].select(
        "doc_id",
        n.alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
        dround(F.length(F.array_join(toks, "")).cast("double") / n).alias("avg_token_len"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        dround(F.size(F.array_distinct(toks)).cast("double") / n).alias("type_token_ratio"),
    )


# --- quality scoring (length / repetition signals) --------------------------
@_register(
    "text_quality",
    f"""
    SELECT doc_id,
      CAST(CASE WHEN len({_TOKENS}) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END AS INTEGER)
        AS length_ok,
      {dround_sql(f"CAST(len(list_distinct({_TOKENS})) AS DOUBLE) / len({_TOKENS})")}
        AS diversity,
      CAST(CASE WHEN CAST(len(list_distinct({_TOKENS})) AS DOUBLE) / len({_TOKENS}) < 0.2
           THEN 1 ELSE 0 END AS INTEGER) AS repetitive_flag,
      {dround_sql(
        f"0.5::DOUBLE * (CASE WHEN len({_TOKENS}) BETWEEN 20 AND 1000 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + 0.5::DOUBLE * (CAST(len(list_distinct({_TOKENS})) AS DOUBLE) / len({_TOKENS}))"
      )} AS quality_score
    FROM documents
    """,
)
def text_quality(t: Frames) -> DataFrame:
    toks = _tokens_col()
    n = F.size(toks)
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    length_ok = F.when(n.between(20, 1000), 1).otherwise(0)
    return t["documents"].select(
        "doc_id",
        length_ok.cast("int").alias("length_ok"),
        dround(diversity).alias("diversity"),
        F.when(diversity < 0.2, 1).otherwise(0).cast("int").alias("repetitive_flag"),
        dround(
            F.lit(0.5) * length_ok.cast("double") + F.lit(0.5) * diversity
        ).alias("quality_score"),
    )


# --- Gopher-style rule screen (round 14) ------------------------------------
#: Gopher (Rae et al. 2021, "Scaling Language Models") quality-rule
#: bounds, adapted to this corpus's scale: word-count window,
#: mean-word-length band, symbol-to-word ceiling, alphabetic-word
#: floor, stopword floor. Thresholds are the published heuristics
#: except the word floor (30 vs Gopher's 50 — the synthetic docs
#: median 56 words, so 50 would flag half the corpus; documented
#: dial, same machinery).
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 30, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2

_GOPHER_SQL_PARTS = {
    "n": f"len({_TOKENS})",
    "mwl": f"CAST(list_sum(list_transform({_TOKENS}, x -> length(x))) AS DOUBLE) / len({_TOKENS})",
    "sym": (
        "CAST((length(text) - length(replace(text, '#', ''))) + "
        "(length(text) - length(replace(text, '...', ''))) / 3 AS DOUBLE) / "
        f"len({_TOKENS})"
    ),
    "alpha": f"CAST(len(list_filter({_TOKENS}, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len({_TOKENS})",
    "stops": f"len(list_filter({_TOKENS}, x -> list_contains({_EN_SET}, x)))",
}


@_register(
    "docs_gopher_rules",
    f"""
    WITH gr AS (
      SELECT doc_id,
             CAST({_GOPHER_SQL_PARTS["n"]} AS BIGINT) AS n_words,
             {_GOPHER_SQL_PARTS["mwl"]} AS mwl,
             {_GOPHER_SQL_PARTS["sym"]} AS sym,
             {_GOPHER_SQL_PARTS["alpha"]} AS alpha,
             CAST({_GOPHER_SQL_PARTS["stops"]} AS BIGINT) AS n_stopwords
      FROM documents
      WHERE len({_TOKENS}) > 0
    )
    SELECT doc_id, n_words,
           {dround_sql('mwl')} AS mean_word_len,
           {dround_sql('sym')} AS symbol_ratio,
           {dround_sql('alpha')} AS alpha_word_frac,
           n_stopwords,
           (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
             AND (mwl BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL})
             AND (sym < {GOPHER_MAX_SYMBOL_RATIO})
             AND (alpha >= {GOPHER_MIN_ALPHA_FRAC})
             AND (n_stopwords >= {GOPHER_MIN_STOPWORDS}) AS pass_gopher
    FROM gr
    """,
)
def docs_gopher_rules(t: Frames) -> DataFrame:
    """Gopher-style quality-rule screen (Rae et al. 2021 §A1.1.1):
    the published pretraining heuristics — word-count window, mean
    word length 3–10, symbol-to-word ratio, alphabetic-word fraction,
    stopword floor — as one single-scan projection with per-rule
    observables and the conjunction flag. Complements
    ``text_quality``'s diversity score (statistical) and
    ``docs_quality_report``'s constraint suite (corpus-level): this
    is the per-document DROP decision a curation pipeline applies
    before anything expensive touches the text.

    Scale design: pure narrow projection — tokenize once, every rule
    is integer/length arithmetic over the token array (exact in both
    engines; the mean-word-length sum is an integer before the one
    division), zero shuffles, codegen end to end. The thresholds are
    module constants (the documented dials), so retuning them is a
    config change, not a new operator. The rule expressions live in
    ``gopher_rule_cols`` (r15) — ONE definition shared with the
    streaming ingest gate (streaming/curation.py)."""
    c = gopher_rule_cols()
    return (
        t["documents"]
        .filter(F.size(_tokens_col()) > 0)
        .select(
            "doc_id",
            c["n"].cast("long").alias("n_words"),
            dround(c["mwl"]).alias("mean_word_len"),
            dround(c["sym"]).alias("symbol_ratio"),
            dround(c["alpha"]).alias("alpha_word_frac"),
            c["stops"].cast("long").alias("n_stopwords"),
            c["pass_gopher"].alias("pass_gopher"),
        )
    )


def gopher_rule_cols() -> dict[str, F.Column]:
    """The Gopher §A1.1.1 rule expressions over a document row with a
    ``text`` column — the ONE definition behind the batch screen
    (``docs_gopher_rules``) and the streaming ingest gate
    (``curation_stream(gopher_gate=True)``). Keys: ``n`` (word
    count), ``mwl`` (mean word length), ``sym`` (symbol-to-word
    ratio), ``alpha`` (alphabetic-word fraction), ``stops`` (stopword
    hits), ``pass_gopher`` (the conjunction drop flag — null on
    zero-token docs, which both consumers treat as fail). Pure row
    expressions, codegen end to end."""
    toks = _tokens_col()
    n = F.size(toks)
    mwl = (
        F.aggregate(
            F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
        ).cast("double")
        / n
    )
    sym = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"))))
        + (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("...")))
        )
        / 3
    ).cast("double") / n
    alpha = (
        F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]"))).cast("double")
        / n
    )
    en = F.lit(list(EN_STOPWORDS))
    stops = F.size(F.filter(toks, lambda x: F.array_contains(en, x)))
    return {
        "n": n,
        "mwl": mwl,
        "sym": sym,
        "alpha": alpha,
        "stops": stops,
        "pass_gopher": (
            n.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
            & mwl.between(GOPHER_MIN_MWL, GOPHER_MAX_MWL)
            & (sym < GOPHER_MAX_SYMBOL_RATIO)
            & (alpha >= GOPHER_MIN_ALPHA_FRAC)
            & (stops >= GOPHER_MIN_STOPWORDS)
        ),
    }


# --- heuristic language ID --------------------------------------------------
@_register(
    "text_lang_id",
    f"""
    SELECT doc_id, lang AS labeled_lang,
      {dround_sql(f"CAST(len(list_filter({_TOKENS}, x -> list_contains({_EN_SET}, x))) AS DOUBLE) / len({_TOKENS})")}
        AS en_marker_ratio,
      CASE WHEN len(list_filter({_TOKENS}, x -> list_contains({_EN_SET}, x))) > 0
           THEN 'en' ELSE 'unknown' END AS predicted_lang
    FROM documents
    """,
)
def text_lang_id(t: Frames) -> DataFrame:
    """N-gram/stopword-marker language ID. On this synthetic corpus the
    vocabulary is English regardless of the ``lang`` label, so the
    honest heuristic predicts 'en'/'unknown'; the operator's value is
    the machinery (marker-set ratio scoring), which is oracle-checked."""
    toks = _tokens_col()
    en = F.lit(list(EN_STOPWORDS))
    hits = F.size(F.filter(toks, lambda x: F.array_contains(en, x)))
    return t["documents"].select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        dround(hits.cast("double") / F.size(toks)).alias("en_marker_ratio"),
        F.when(hits > 0, "en").otherwise("unknown").alias("predicted_lang"),
    )


# --- document fingerprint ---------------------------------------------------
@_register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(lower(trim(text))) AS fingerprint,
           md5(array_to_string(list_slice(list_filter(string_split(text, ' '), x -> x <> ''), 1, 16), ' '))
             AS prefix_fingerprint
    FROM documents
    """,
)
def text_fingerprint(t: Frames) -> DataFrame:
    toks = _tokens_col()
    return t["documents"].select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
        F.md5(F.array_join(F.slice(toks, 1, 16), " ")).alias("prefix_fingerprint"),
    )


# --- BPE-ish subword/token counting (regex classes, not whitespace) ---------
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@_register(
    "text_token_count_bpe",
    f"""
    SELECT doc_id,
           CAST(len({_TOKENS}) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS INTEGER) AS bpe_tokens,
           {dround_sql(f"CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS DOUBLE) / greatest(len({_TOKENS}), 1)")}
             AS tokens_per_word
    FROM documents
    """,
)
def text_token_count_bpe(t: Frames) -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex
    (letter runs / digit runs / single punctuation — the usual
    pre-tokenizer classes). Pure regexp_extract_all on both engines."""
    toks = _tokens_col()
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{_BPE_PATTERN}', 0)"))
    return t["documents"].select(
        "doc_id",
        F.size(toks).alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        dround(bpe.cast("double") / F.greatest(F.size(toks), F.lit(1))).alias(
            "tokens_per_word"
        ),
    )


# --- TF-IDF top terms per document ------------------------------------------
TFIDF_TOP_K = 3


@_register(
    "text_tfidf_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             {dround_sql("tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df)")} AS tfidf
      FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rank
      FROM scored
    )
    SELECT doc_id, term, CAST(tf AS INTEGER) AS tf, tfidf, rank
    FROM ranked WHERE rank <= {TFIDF_TOP_K}
    """,
)
def text_tfidf_topk(t: Frames) -> DataFrame:
    """Top-K TF-IDF terms per document. Shuffle profile at 100 TB:
    explode → two keyed aggregations (doc_id,term / term) with
    map-side partial agg, a term-keyed join, and one doc-keyed window
    for the top-k — never a corpus-wide sort. The corpus size joins in
    as a broadcast one-row aggregate (no driver collect). Ranking
    sorts on the ROUNDED score (then term) so the order is identical
    across engines."""
    from pyspark.sql import Window

    docs = t["documents"]
    terms = docs.select("doc_id", F.explode(_tokens_col()).alias("term"))
    # tf feeds BOTH dfreq and the scoring join: lazily checkpoint it so
    # the corpus explode+agg runs once instead of once per consumer
    # (r16 — the docs_unigram_logprob tok/model idiom; the before plan
    # in plans/r16/ shows two full explode→agg chains).
    # Robustness trade (r16 advice): localCheckpoint truncates lineage
    # WITHOUT reliable storage — losing an executor that holds these
    # blocks mid-job fails the job instead of recomputing. Right for
    # the single-node bench/driver posture; on preemptible multi-node
    # clusters prefer persist() or a reliable checkpoint dir.
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # tf already holds one row per (doc, term): document frequency is a
    # plain count over it — no second explode, no distinct shuffle
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            dround(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", F.col("tf").cast("int").alias("tf"), "tfidf", "rank")
    )


# --- deterministic hash sampling --------------------------------------------
@_register(
    "corpus_sample_hash",
    """
    SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS sample_key
    FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) < '2'
    """,
)
def corpus_sample_hash(t: Frames) -> DataFrame:
    """Deterministic ~1/8 corpus sample: keep docs whose md5(doc_id)
    hex digest sorts below '2'. Unlike seeded RNG sampling (engine-
    specific, rows-only at best) the hash cut is reproducible across
    engines AND across runs/partitionings — the property a training-
    data pipeline needs for holdout splits that survive re-sharding.
    Pure projection+filter: no shuffle, fully pushed into the scan
    stage."""
    key = F.md5(F.col("doc_id").cast("string"))
    return (
        t["documents"]
        .select("doc_id", "source", key.alias("sample_key"))
        .filter(F.col("sample_key") < "2")
    )


# --- corpus cleaning pipeline (quality ∧ lang ∧ dedup-keeper) ---------------
_QUALITY_SQL = (
    f"0.5::DOUBLE * (CASE WHEN len({_TOKENS}) BETWEEN 20 AND 1000 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)"
    f" + 0.5::DOUBLE * (CAST(len(list_distinct({_TOKENS})) AS DOUBLE) / len({_TOKENS}))"
)


@_register(
    "docs_clean_pipeline",
    f"""
    WITH keepers AS (
      SELECT md5(lower(trim(text))) AS fp, MIN(doc_id) AS keeper
      FROM documents GROUP BY 1
    ),
    scored AS (
      SELECT doc_id,
             CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
             {dround_sql(_QUALITY_SQL)} AS quality_score,
             len(list_filter({_TOKENS}, x -> list_contains({_EN_SET}, x))) AS en_hits
      FROM documents
    )
    SELECT s.doc_id, s.n_tokens, s.quality_score
    FROM scored s JOIN keepers k ON s.doc_id = k.keeper
    WHERE s.quality_score >= 0.5 AND s.en_hits > 0
    """,
)
def docs_clean_pipeline(t: Frames) -> DataFrame:
    """The composed cleaning pass a pre-training pipeline runs end to
    end: keep each exact-dup group's keeper (min doc_id per
    fingerprint), require quality_score ≥ 0.5 and at least one English
    marker token. One fingerprint-keyed aggregation + one equi-join;
    all scoring stays in the scan-side projection."""
    docs = t["documents"]
    toks = _tokens_col()
    n = F.size(toks)
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    length_ok = F.when(n.between(20, 1000), 1.0).otherwise(0.0)
    quality = dround(F.lit(0.5) * length_ok + F.lit(0.5) * diversity)
    en = F.lit(list(EN_STOPWORDS))
    en_hits = F.size(F.filter(toks, lambda x: F.array_contains(en, x)))
    scored = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        quality.alias("quality_score"),
        en_hits.alias("en_hits"),
    )
    keepers = docs.groupBy(
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
    ).agg(F.min("doc_id").alias("keeper"))
    return (
        scored.join(keepers, scored["doc_id"] == keepers["keeper"])
        .filter((F.col("quality_score") >= 0.5) & (F.col("en_hits") > 0))
        .select("doc_id", "n_tokens", "quality_score")
    )


# --- corpus-level stats (grouped agg over computed columns) -----------------
@_register(
    "text_corpus_stats",
    f"""
    SELECT source,
           COUNT(*) AS docs,
           CAST(SUM(len({_TOKENS})) AS BIGINT) AS total_tokens,
           {dround_sql(f"AVG(CAST(len({_TOKENS}) AS DOUBLE))", 4)} AS avg_tokens,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY source
    """,
)
def text_corpus_stats(t: Frames) -> DataFrame:
    toks = _tokens_col()
    return t["documents"].groupBy("source").agg(
        F.count("*").alias("docs"),
        F.sum(F.size(toks)).cast("long").alias("total_tokens"),
        dround(F.avg(F.size(toks).cast("double")), 4).alias("avg_tokens"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


# --- sliding-window document chunking (training-data prep) ------------------
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@_register(
    "text_chunks",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS} AS t, len({_TOKENS}) AS n FROM documents
    ),
    sized AS (
      SELECT doc_id, t, n,
             CASE WHEN n <= {CHUNK_TOKENS} THEN 1
                  ELSE CAST(ceil((n - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) AS INTEGER) + 1
             END AS n_chunks
      FROM toks
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_index,
           CAST(len(list_slice(t, i * {CHUNK_STRIDE} + 1, i * {CHUNK_STRIDE} + {CHUNK_TOKENS})) AS INTEGER)
             AS chunk_tokens,
           array_to_string(list_slice(t, i * {CHUNK_STRIDE} + 1, i * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ')
             AS chunk_text
    FROM sized, unnest(range(0, n_chunks)) AS u(i)
    """,
)
def text_chunks(t: Frames) -> DataFrame:
    """Sliding-window chunking: each document becomes overlapping
    CHUNK_TOKENS-token windows advanced by CHUNK_STRIDE (the standard
    LLM-training prep that keeps context across chunk boundaries).
    Chunk count = 1 for short docs, else ceil((n-chunk)/stride)+1 so
    the final partial window is always emitted.

    Scale design: pure column expressions — tokenize once, posexplode
    over a computed index range; no UDF, no shuffle (narrow transform);
    output row count is sum(n_chunks), controlled by stride. At 100 TB
    chunking is scan-bound, exactly as it should be."""
    toks = _tokens_col()
    n = F.size(toks)
    n_chunks = F.when(n <= CHUNK_TOKENS, F.lit(1)).otherwise(
        F.ceil((n - CHUNK_TOKENS) / F.lit(float(CHUNK_STRIDE))).cast("int") + 1
    )
    sized = t["documents"].select("doc_id", toks.alias("t"), n_chunks.alias("n_chunks"))
    idx = F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("i")
    chunk = F.slice(F.col("t"), F.col("i") * CHUNK_STRIDE + 1, CHUNK_TOKENS)
    return sized.select("doc_id", "t", idx).select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_index"),
        F.size(chunk).cast("int").alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --- stratified deterministic sampling (per-language rebalancing) -----------
#: per-stratum md5-hex-prefix cut: 'en' downsampled to 4/16, the rare
#: languages kept whole ('g' > 'f' ≥ every hex digest ⇒ keep-all)
STRATA_THRESHOLDS = {"en": "4", "_default": "g"}


@_register(
    "docs_stratified_sample",
    f"""
    SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS sample_key
    FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) <
          CASE WHEN lang = 'en' THEN '{STRATA_THRESHOLDS["en"]}'
               ELSE '{STRATA_THRESHOLDS["_default"]}' END
    """,
)
def docs_stratified_sample(t: Frames) -> DataFrame:
    """Stratified deterministic sampling: each language stratum gets
    its own md5-hex-prefix cut — the dominant 'en' stratum is
    downsampled to 4/16 while rare languages are kept whole, the
    class-rebalancing move a multilingual training mix needs. The hex
    cut (not seeded RNG) makes membership a pure function of doc_id:
    reproducible across engines, runs, AND re-partitionings, so
    train/holdout splits survive re-sharding. Rate granularity is
    1/16 per threshold hex char (use longer prefixes for finer
    rates). Pure projection+filter — no shuffle, pushed to the scan."""
    key = F.md5(F.col("doc_id").cast("string"))
    thr = F.when(
        F.col("lang") == "en", F.lit(STRATA_THRESHOLDS["en"])
    ).otherwise(F.lit(STRATA_THRESHOLDS["_default"]))
    return (
        t["documents"]
        .select("doc_id", "lang", key.alias("sample_key"), thr.alias("thr"))
        .filter(F.col("sample_key") < F.col("thr"))
        .drop("thr")
    )


# --- deterministic per-source cap (reservoir-style group sampling) ----------
SOURCE_CAP = 15  # max documents kept per source


@_register(
    "docs_per_source_cap",
    f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= {SOURCE_CAP}
    """,
)
def docs_per_source_cap(t: Frames) -> DataFrame:
    """Deterministic reservoir-style cap: keep at most SOURCE_CAP docs
    per source, chosen by md5(doc_id) rank — an unbiased, reproducible
    'uniform sample without replacement' per group (the per-domain cap
    every pre-training mix applies so no single crawl dominates).

    Scale design: one hash-partitioned window per source with
    WindowGroupLimit — Spark pushes the rn<=K filter to the map side,
    so each partition keeps only K rows before the shuffle; never a
    global sort, never a collect. Skewed sources cost O(K) post-limit.
    """
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        t["documents"]
        .select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= SOURCE_CAP)
        .drop("rn")
    )


# --- corpus-level n-gram frequency (the vocabulary/phrase-mining pass) ------
TOP_NGRAMS_K = 20


#: THE bigram definition — every consumer (exact top-K, the MG twin,
#: the streaming heavy-hitter gate, the LM-perplexity scorer) compiles
#: this one expression over a token-array column ``t``; a second copy
#: WILL drift
_BIGRAM_EXPR = (
    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
    " (x, y) -> concat(x, ' ', y))"
)


def _bigrams_from_tokens(toks: DataFrame, with_doc_id: bool = False) -> DataFrame:
    """Bigram rows from an already-tokenized frame (column ``t``) —
    the half of ``_bigram_stream`` that callers holding a shared
    tokenized block (e.g. the LM scorer, which also needs the
    vocabulary from the same pass) use directly. zip_with over two
    array slices is a narrow per-row transform — no self-join of
    token positions."""
    cols = ["doc_id"] if with_doc_id else []
    return toks.filter(F.size("t") >= 2).select(
        *cols, F.explode(F.expr(_BIGRAM_EXPR)).alias("bigram")
    )


def _bigram_stream(docs: DataFrame, with_doc_id: bool = False) -> DataFrame:
    """One ``bigram`` row per adjacent token pair — the shared input of
    the exact top-K pass, its Misra-Gries twin, and the streaming
    heavy-hitter gate (one definition: the paths CANNOT drift on what
    counts as a bigram)."""
    cols = ["doc_id"] if with_doc_id else []
    return _bigrams_from_tokens(
        docs.select(*cols, _tokens_col().alias("t")), with_doc_id
    )


@_register(
    "text_top_ngrams",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS} AS t FROM documents
    ),
    bi AS (
      SELECT unnest(list_zip(t[1:length(t)-1], t[2:length(t)])) AS z
      FROM toks WHERE length(t) >= 2
    )
    SELECT z[1] || ' ' || z[2] AS bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM bi GROUP BY 1
    ORDER BY n DESC, bigram ASC
    LIMIT {TOP_NGRAMS_K}
    """,
)
def text_top_ngrams(t: Frames) -> DataFrame:
    """Corpus-wide top-K bigram frequencies — the phrase-mining /
    vocabulary-induction pass (BPE merges, stop-phrase lists, boilerplate
    detection all start here).

    Scale design: the shared ``_bigram_stream`` feeds a keyed count
    whose partial aggregation collapses each map partition to its
    distinct-bigram counts before the shuffle. The top-K is
    TakeOrderedAndProject (heap per partition), never a global sort.
    Ties break on the bigram string so the cut is deterministic across
    engines. The shuffle carries one row per DISTINCT bigram per map
    partition — see ``text_top_ngrams_mg`` for the bounded-memory twin
    when the n-gram type space itself explodes."""
    return (
        _bigram_stream(t["documents"])
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(TOP_NGRAMS_K)
    )


#: Misra-Gries counter budget per partition summary — a compile-time
#: constant, so executor memory for the sketch is corpus-independent
MG_CAPACITY = 1024


def _mg_add(counts, incoming, capacity: int = MG_CAPACITY):
    """ONE Misra-Gries merge step (Agarwal et al., "Mergeable
    Summaries", PODS 2012): add an exact batch count (a value_counts
    Series) to the running summary; on overflow the (capacity+1)-th
    largest counter value is subtracted from all and non-positives
    drop — the classic decrement step, vectorized. Shared by the
    batch candidate kernel and the streaming heavy-hitter state
    update (one definition: the two surfaces cannot drift on the
    decrement rule). Guarantee: any key with stream frequency
    > n/(capacity+1) keeps a positive counter, and every surviving
    counter under-counts by at most n/(capacity+1)."""
    counts = counts.add(incoming, fill_value=0)
    if len(counts) > capacity:
        counts = counts.sort_values(ascending=False)
        cut = counts.iloc[capacity]
        counts = (counts.iloc[:capacity] - cut).loc[lambda s: s > 0]
    return counts


def _mg_partial(batches):
    """Per-partition Misra-Gries summary over the bigram stream,
    merged at Arrow-batch granularity via the shared ``_mg_add`` step.
    Emits the surviving (bigram, counter) rows — MG lower bounds whose
    per-partition total error is <= n_p/(MG_CAPACITY+1), so any bigram
    with partition frequency > n_p/(MG_CAPACITY+1) survives with a
    positive counter."""
    import pandas as pd

    counts = pd.Series(dtype="float64")
    for pdf in batches:
        counts = _mg_add(counts, pdf["bigram"].value_counts())
    yield pd.DataFrame(
        {"bigram": counts.index.astype(str), "n": counts.astype("int64").values}
    )


def _mg_candidates(bigrams: DataFrame) -> DataFrame:
    """Global candidate set from the per-partition MG summaries: sum
    the counters (a sketch-sized shuffle — <= MG_CAPACITY x partitions
    rows, never type-space-sized) and keep the top MG_CAPACITY by
    (mg_n desc, bigram asc) — a TakeOrderedAndProject heap, never a
    global sort. Factored out so the truncation regime is testable in
    isolation.

    Guarantee (mergeable summaries, Agarwal et al. PODS 2012): any
    bigram with global frequency > 2N/(MG_CAPACITY+1) has summed
    counter > N/(MG_CAPACITY+1) (per-partition errors add to at most
    N/(capacity+1)), and no capacity+1 keys can all sit above that
    level (their counters would sum past N), so every such bigram
    ranks within the top capacity. Keeping sub-threshold rows up to
    the capacity is deliberate: the recount is exact and the final
    top-K discards them, whereas a strict subtract-the-(capacity+1)-th
    cut can return ZERO candidates on a corpus tying at the cut
    value."""
    return (
        bigrams.mapInPandas(_mg_partial, "bigram string, n long")
        .groupBy("bigram")
        .agg(F.sum("n").alias("mg_n"))
        .orderBy(F.desc("mg_n"), F.asc("bigram"))
        .limit(MG_CAPACITY)
        .select("bigram")
    )


# shares the exact twin's oracle: same output contract, and the driver
# corpora sit in the no-eviction regime where agreement is
# unconditional (see docstring)
@_register("text_top_ngrams_mg", TEXT_OPS["text_top_ngrams"][1])
def text_top_ngrams_mg(t: Frames) -> DataFrame:
    """Bounded-memory twin of ``text_top_ngrams``: Misra-Gries
    candidate generation, a merge of the per-partition summaries down
    to <= MG_CAPACITY global candidates (``_mg_candidates``), then an
    EXACT recount of the candidates only. Same output contract as the
    exact pass.

    Why it exists: the exact pass's shuffle carries one row per
    distinct n-gram per map partition — fine for bigrams over a
    bounded vocabulary, but the n-gram TYPE space explodes
    combinatorially as n grows (5-grams over web text: billions of
    types), and the corpus-wide count shuffle becomes the bottleneck.
    Here each partition reduces to <= MG_CAPACITY counters inside the
    Arrow kernel; the only shuffle before the recount is sketch-sized;
    and the merged candidate frame is bounded by CONFIG alone, hence
    the legitimate ``F.broadcast`` (an earlier draft broadcast the
    un-merged capacity x partitions union, which scales with the
    scan's partition count — data-sized at 100 TB; the merge closes
    that). The only corpus-sized operation left is the broadcast-join
    recount whose aggregate is pre-filtered to candidates.

    Exactness condition (documented, not silent): every bigram with
    global frequency > 2N/(MG_CAPACITY+1) is a candidate (see
    ``_mg_candidates``), and recounting is exact — so the returned
    top-K equals the exact twin's whenever the true K-th count clears
    that threshold. On corpora whose TOTAL distinct type count fits
    the capacity no partition evicts and the merge keeps everything,
    so the twins agree unconditionally (the registered oracle's
    regime; eviction and truncation regimes are pinned by the planted
    adversarial tests)."""
    bigrams = _bigram_stream(t["documents"]).localCheckpoint(eager=False)
    return (
        bigrams.join(F.broadcast(_mg_candidates(bigrams)), "bigram")
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(TOP_NGRAMS_K)
    )


# --- vocabulary coverage (tokenizer-budget planning) ------------------------
#: top-K tokens by corpus frequency that count as "in vocabulary" —
#: small against the 31-type synthetic vocab so the OOV signal is
#: non-trivial at every sf; a real run sets this to the tokenizer's
#: vocab budget
VOCAB_K = 16


@_register(
    "text_vocab_coverage",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKENS}) AS token FROM documents),
    vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS n FROM tok GROUP BY token
        ORDER BY n DESC, token ASC LIMIT {VOCAB_K}
      )
    )
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           {dround_sql(
             "CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)"
             " / COUNT(*)"
           )} AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.doc_id
    """,
)
def text_vocab_coverage(t: Frames) -> DataFrame:
    """Per-document OOV rate against the corpus's own top-{VOCAB_K}
    token vocabulary — the tokenizer-budget planning pass: before
    training a tokenizer of a given vocab size, measure what fraction
    of each document's token OCCURRENCES fall outside the would-be
    vocabulary (documents dominated by OOV mass fragment into long
    byte-level sequences and blow the token budget estimate).

    Scale design: two passes over a (doc_id, token)-pruned scan. Pass
    one is a token-keyed count (map-side partials over a bounded
    vocabulary) cut to the top-K by TakeOrderedAndProject — K is a
    compile-time constant, so the vocab frame is fixed-cardinality
    and the join-back is legitimately ``F.broadcast`` under the
    module broadcast policy (the ``docs_decontaminate`` eval-gram
    precedent). Pass two left-joins each token occurrence against the
    broadcast vocab and folds per-doc counts — one doc-keyed agg, no
    corpus-sized materialization between the passes. Deterministic at
    the LIMIT boundary: ties break on the token string in both
    engines. Token-less docs have no occurrences and no OOV signal;
    absent in both engines."""
    tok = spread_small_input(t["documents"]).select(
        "doc_id", F.explode(_tokens_col()).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(VOCAB_K)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            dround(F.col("n_oov").cast("double") / F.col("n_tokens")).alias(
                "oov_rate"
            ),
        )
    )


# --- Zipf fit (corpus-health diagnostic) ------------------------------------
@_register(
    "text_zipf_fit",
    f"""
    WITH tok AS (SELECT unnest({_TOKENS}) AS token FROM documents),
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    ranked AS (
      SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS DOUBLE))
               AS lx,
             ln(CAST(n AS DOUBLE)) AS ly
      FROM counts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
           {dround_sql("covar_pop(lx, ly) / var_pop(lx)")} AS zipf_slope,
           {dround_sql(
             "AVG(ly) - (covar_pop(lx, ly) / var_pop(lx)) * AVG(lx)"
           )} AS zipf_intercept,
           {dround_sql("corr(lx, ly) * corr(lx, ly)")} AS zipf_r2
    FROM ranked
    """,
)
def text_zipf_fit(t: Frames) -> DataFrame:
    """Least-squares fit of log(frequency) against log(rank) over the
    corpus token distribution — the Zipf-law corpus-health diagnostic:
    natural text sits near slope −1; a slope collapsing toward 0 means
    the corpus is template/boilerplate-heavy, a cliff in r² means a
    mixture of unrelated registers. Curation dashboards track the
    (slope, r²) pair per snapshot to catch a scrape gone wrong before
    it trains.

    Scale design: the corpus-sized work is ONE token-keyed count with
    map-side partials; everything after runs on the VOCABULARY frame
    (distinct types). Global ranks over (n DESC, token ASC) come from
    the module's bucketed prefix-sum — NO vocabulary-sized
    single-partition window anywhere (round-11 verdict #4). The
    bucketing respects the global order at three levels, so
    offset-composition reproduces ROW_NUMBER exactly:

    - level 1: ``mag = floor(log2(n))`` — n DESC orders octaves DESC,
      so per-octave totals (≤64 rows) give each octave's global
      offset. Even that tiny cumsum avoids a window: each octave
      CONTRIBUTES its total to every lower octave via a bounded
      explode (the DAU/WAU inverted-fan-out idiom), so the whole op
      plans ZERO ordered-only windows and the WindowExec
      single-partition warning is gone from this plan entirely;
    - level 2: within an octave, (n DESC, pfx ASC) where ``pfx`` is
      the token's 2-char prefix — a PREFIX of the tie-break key, so
      bucket order extends token order; the per-(n, pfx) totals frame
      gets cumulative offsets via a window PARTITIONED by octave
      (per-partition size = distinct (n, pfx) combos in one octave —
      the n=1 octave has one n and ≤ prefix-space combos, high
      octaves have few types; never vocabulary-sized);
    - level 3: row_number PARTITIONED by (n, pfx) ordered by token —
      the n=1 tie group (≈ half the vocabulary under Zipf) is split
      across the prefix space instead of one task.

    The closed-form slope/intercept/r² come from covar_pop/var_pop/
    corr aggregates (single partial-agg pass, no iteration); ranks
    tie-break on the token string so both engines rank identically."""
    counts = (
        spread_small_input(t["documents"])
        .select(F.explode(_tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    keyed = counts.select(
        "token",
        "n",
        F.floor(F.log2("n")).cast("int").alias("mag"),
        F.substring("token", 1, 2).alias("pfx"),
    )
    grp = keyed.groupBy("mag", "n", "pfx").agg(F.count("*").alias("cnt"))
    mag_tot = grp.groupBy("mag").agg(F.sum("cnt").alias("mcnt"))
    # windowless octave offsets: octave m' contributes its total to
    # every lower octave m < m' (bounded ≤64×64 fan-out; the guard
    # filter avoids Spark's descending sequence(0,-1) surprise at
    # mag=0) — offset(m) = Σ_{m' > m} mcnt(m'), zero for the top octave
    contrib = (
        mag_tot.filter(F.col("mag") >= 1)
        .select(
            F.explode(F.sequence(F.lit(0), F.col("mag") - 1)).alias("mag2"),
            "mcnt",
        )
        .groupBy("mag2")
        .agg(F.sum("mcnt").alias("moff"))
        .withColumnRenamed("mag2", "mag")
    )
    mag_off = mag_tot.join(contrib, "mag", "left").select(
        "mag", F.coalesce("moff", F.lit(0)).alias("moff")
    )
    w_grp = (
        Window.partitionBy("mag")
        .orderBy(F.desc("n"), F.asc("pfx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp_off = grp.join(F.broadcast(mag_off), "mag").select(
        "n",
        "pfx",
        (F.col("moff") + F.sum("cnt").over(w_grp) - F.col("cnt")).alias("goff"),
    )
    w_tok = Window.partitionBy("n", "pfx").orderBy(F.asc("token"))
    ranked = keyed.join(grp_off, ["n", "pfx"]).select(
        F.log((F.col("goff") + F.row_number().over(w_tok)).cast("double")).alias(
            "lx"
        ),
        F.log(F.col("n").cast("double")).alias("ly"),
    )
    slope = F.covar_pop("lx", "ly") / F.var_pop("lx")
    return ranked.agg(
        F.count("*").cast("long").alias("n_types"),
        dround(slope).alias("zipf_slope"),
        dround(F.avg("ly") - slope * F.avg("lx")).alias("zipf_intercept"),
        dround(F.corr("lx", "ly") * F.corr("lx", "ly")).alias("zipf_r2"),
    )


# --- bigram-LM self-perplexity (statistical quality gate) -------------------
@_register(
    "docs_lm_perplexity",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    pairs AS (
      SELECT doc_id,
             t[i+1] AS w1,
             t[i+1] || ' ' || t[i+2] AS bigram
      FROM toks, UNNEST(range(0, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    bc AS (SELECT bigram, COUNT(*) AS cb FROM pairs GROUP BY bigram),
    pc AS (SELECT w1, COUNT(*) AS cw FROM pairs GROUP BY w1),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT token) AS DOUBLE) AS v
      FROM (SELECT unnest(t) AS token FROM toks)
    ),
    scored AS (
      SELECT p.doc_id, ln((bc.cb + 1.0) / (pc.cw + vocab.v)) AS lp
      FROM pairs p JOIN bc USING (bigram) JOIN pc USING (w1), vocab
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           {dround_sql("AVG(lp)")} AS avg_logprob,
           {dround_sql("exp(-AVG(lp))", 4)} AS ppl
    FROM scored GROUP BY doc_id
    """,
)
def docs_lm_perplexity(t: Frames) -> DataFrame:
    """Per-document self-perplexity under an add-1-smoothed bigram LM
    trained on the corpus itself — the classic statistical quality
    gate (CCNet / Wenzek et al. 2020 filter web text by LM perplexity;
    the heuristic ``docs_quality`` scores surface features, this
    scores SEQUENCE likelihood): template/boilerplate text and
    in-register prose sit low, token soup and wrong-register noise sit
    high. ``P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)`` with V the
    corpus unigram vocabulary, score = mean ln-prob over the doc's
    bigrams, ``ppl = exp(-score)``. Add-1 smoothing keeps the model
    deterministic and closed-form in BOTH engines — no RNG, no
    iterative fit — so the oracle is exact under the repo's dround
    discipline (per-doc log sums are short; engine summation-order
    drift is ~1e-14, absorbed by dround 6/4).

    Scale design: documents are tokenized ONCE (the tokenized frame is
    checkpointed; the bigram stream — via the shared one-definition
    ``_bigrams_from_tokens`` — and the vocabulary scalar both derive
    from it); the corpus-sized frames are that stream and its two
    count aggregations — both keyed (bigram / first-token) with
    map-side partials, output bounded by the TYPE space, the same
    honest cost class as ``text_tfidf_topk``'s term counts (an LM
    needs every count; the MG twin's sketch shortcut applies to top-K
    only). The stream is itself checkpointed and read by the counts
    and the scoring join; the join-back is type-keyed (AQE sizes the
    count sides — vocabulary-bounded, broadcast when small, shuffle
    when not); V rides the 1-row broadcast-crossJoin idiom; the final
    agg is one doc-keyed partial-agg pass. No global sort anywhere."""
    toks = (
        spread_small_input(t["documents"])
        .select("doc_id", _tokens_col().alias("t"))
        .localCheckpoint(eager=False)
    )
    pairs = (
        _bigrams_from_tokens(toks, with_doc_id=True)
        .withColumn("w1", F.substring_index("bigram", " ", 1))
        .localCheckpoint(eager=False)
    )
    bc = pairs.groupBy("bigram").agg(F.count("*").alias("cb"))
    pc = pairs.groupBy("w1").agg(F.count("*").alias("cw"))
    vocab = toks.select(F.explode("t").alias("token")).agg(
        F.count_distinct("token").cast("double").alias("v")
    )
    avg_lp = F.avg(
        F.log((F.col("cb") + F.lit(1.0)) / (F.col("cw") + F.col("v")))
    )
    return (
        pairs.join(bc, "bigram")
        .join(pc, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            dround(avg_lp).alias("avg_logprob"),
            dround(F.exp(-avg_lp), 4).alias("ppl"),
        )
    )


# --- sequence packing (training-batch prep: concat-and-cut at SEQ_LEN) ------
SEQ_LEN = 256  # tokens per packed training sequence
_PACK_BUCKETS = 1024  # fixed bucket count for the distributed prefix sum


@_register(
    "docs_pack_sequences",
    f"""
    WITH sized AS (
      SELECT doc_id, CAST(len({_TOKENS}) AS BIGINT) AS n_tokens FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS cum_before
      FROM sized
    )
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(cum_before // {SEQ_LEN} AS BIGINT) AS seq_id,
           CAST(cum_before % {SEQ_LEN} AS INTEGER) AS seq_offset
    FROM cum
    """,
)
def docs_pack_sequences(t: Frames) -> DataFrame:
    """GPT-style sequence packing: documents are concatenated in
    doc_id order and cut every SEQ_LEN tokens; each document learns
    which packed sequence it starts in (seq_id) and at what offset —
    the map a training loader uses to build fixed-length batches with
    zero padding waste.

    Scale design — the global running sum is a DISTRIBUTED PREFIX SUM,
    not a single-partition window (the naive ``ORDER BY doc_id`` frame
    moves the whole corpus through one task; Spark even warns). Three
    steps: (1) per-range-bucket token totals (one keyed agg over a
    fixed {_PACK_BUCKETS}-bucket range partitioning of doc_id), (2) a
    running offset over the ≤{_PACK_BUCKETS}-row bucket table (trivially
    small window), (3) a within-bucket cumsum window that runs in
    parallel across buckets. Identical result to the oracle's global
    window at any scale. Bucket width derives from max(doc_id) via a
    broadcast 1-row aggregate — no driver collect."""
    docs = t["documents"]
    sized = docs.select(
        "doc_id", F.size(_tokens_col()).cast("long").alias("n_tokens")
    )
    mx = sized.agg(F.max("doc_id").alias("max_id"))
    width = F.greatest(
        (F.col("max_id") + 1 + F.lit(_PACK_BUCKETS - 1)) / F.lit(_PACK_BUCKETS),
        F.lit(1),
    ).cast("long")
    bucketed = sized.crossJoin(F.broadcast(mx)).select(
        "doc_id", "n_tokens", F.floor(F.col("doc_id") / width).alias("bucket")
    )
    totals = bucketed.groupBy("bucket").agg(F.sum("n_tokens").alias("btotal"))
    w_off = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "bucket", (F.sum("btotal").over(w_off) - F.col("btotal")).alias("boffset")
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        bucketed.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("boffset") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")
            ).alias("cum_before"),
        )
    )
    return cum.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.floor(F.col("cum_before") / SEQ_LEN).cast("long").alias("seq_id"),
        (F.col("cum_before") % SEQ_LEN).cast("int").alias("seq_offset"),
    )


# --- benchmark decontamination (n-gram overlap vs an eval set) --------------
DECON_GRAM = 5  # n-gram size for contamination matching (GPT-3 used 13)
DECON_EVAL_SOURCE = "src0"  # deterministic stand-in for the benchmark set
def decon_gram_hashes(th_col) -> "F.Column":
    """Distinct DECON_GRAM-token chained-hash grams over a token-hash
    array column — THE gram definition, shared by every
    decontamination consumer: docs_decontaminate's semi-join below,
    docs_curate_pipeline's composed gate (operators/curation.py), and
    the streaming filter-at-ingest gate (streaming/curation.py), so
    all sides hash identically by construction. Returns an EMPTY
    array when the doc is shorter than DECON_GRAM — the unguarded
    F.sequence would run descending into out-of-range element_at
    (an ANSI-mode error)."""
    return F.when(
        F.size(th_col) >= DECON_GRAM,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(th_col) - (DECON_GRAM - 1)),
                lambda i: F.xxhash64(
                    *[F.element_at(th_col, i + j) for j in range(DECON_GRAM)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))


_GRAMS5 = (
    f"list_distinct(list_transform(range(1, len({_TOKENS}) - {DECON_GRAM - 2}),"
    f" i -> array_to_string(list_slice({_TOKENS}, i, i + {DECON_GRAM - 1}), ' ')))"
)


@_register(
    "docs_decontaminate",
    f"""
    WITH train AS (
      SELECT doc_id, {_GRAMS5} AS grams FROM documents
      WHERE source <> '{DECON_EVAL_SOURCE}' AND len({_TOKENS}) >= {DECON_GRAM}
    ),
    eval_grams AS (
      SELECT DISTINCT unnest({_GRAMS5}) AS gram FROM documents
      WHERE source = '{DECON_EVAL_SOURCE}' AND len({_TOKENS}) >= {DECON_GRAM}
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS shared_grams
    FROM (SELECT doc_id, unnest(grams) AS gram FROM train) t
    JOIN eval_grams e ON t.gram = e.gram
    GROUP BY t.doc_id
    """,
)
def docs_decontaminate(t: Frames) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    {DECON_GRAM}-gram with the held-out eval set (the GPT-3-style
    overlap filter every serious pre-training run applies so test sets
    don't leak into training data). Output: contaminated train doc →
    count of distinct shared grams.

    Scale design: the eval side is tiny by definition (benchmarks vs
    a corpus), so its distinct gram set BROADCASTS — the corpus-side
    explode joins against it with a broadcast hash join and never
    hash-shuffles; the per-doc count is a partial-agg groupBy. At
    100 TB the cost is one scan of the training corpus. (The leading
    spread_small_input round-robin is the local single-row-group
    guard, a no-op on real multi-split inputs.) Grams are token-hash
    chains (round 7, the minhash-shingle fix): tokens hash to longs
    once, each window chains {DECON_GRAM} token hashes through one
    xxhash64 — the per-position string join measured ~18 s at a 100×
    corpus vs ~2 s hashed. Both join sides use the same hash, and the
    oracle's string-gram join is count-identical for any hash
    injective on the observed windows."""
    toks = _tokens_col()
    docs = spread_small_input(t["documents"]).select(
        "doc_id",
        "source",
        F.size(toks).alias("n_toks"),
        F.transform(toks, lambda x: F.xxhash64(x)).alias("th"),
    )
    grams = decon_gram_hashes(F.col("th"))
    long_enough = F.col("n_toks") >= DECON_GRAM
    train = (
        docs.filter((F.col("source") != DECON_EVAL_SOURCE) & long_enough)
        .select("doc_id", F.explode(grams).alias("gram"))
    )
    eval_grams = (
        docs.filter((F.col("source") == DECON_EVAL_SOURCE) & long_enough)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("shared_grams"))
    )


def _contamination_report_sql() -> str:
    """Oracle built by nesting the registered docs_decontaminate SQL as
    the per-doc CTE — the two stay in lock-step by construction (the
    corpus_to_batches idiom)."""
    per_doc = TEXT_OPS["docs_decontaminate"][1]
    return f"""
    WITH per_doc AS ({per_doc}),
    train_docs AS (
      SELECT doc_id, source FROM documents
      WHERE source <> '{DECON_EVAL_SOURCE}'
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(p.shared_grams) AS BIGINT) AS n_contaminated,
           {dround_sql("COUNT(p.shared_grams) * 1.0 / COUNT(*)")} AS contamination_rate,
           {dround_sql("COALESCE(AVG(p.shared_grams), 0.0)")} AS avg_shared_grams
    FROM train_docs d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    GROUP BY d.source
    """


def docs_contamination_report(t: Frames) -> DataFrame:
    """Per-source contamination report — the operational dashboard a
    curation platform reads before a training run: for every training
    source, how many docs it contributes, how many share at least one
    {DECON_GRAM}-gram with the eval set, the contamination rate, and
    the mean shared-gram count among contaminated docs (0.0 for clean
    sources). A source whose rate spikes is leaking the benchmark and
    gets quarantined upstream.

    Scale design: rides docs_decontaminate's plan (one corpus scan,
    broadcast eval-gram join, partial-agg per-doc counts) plus one
    column-pruned (doc_id, source) scan for the per-source totals; the
    final agg is keyed on source — tiny output, map-side partials.
    Docs shorter than {DECON_GRAM} tokens count in n_docs but can
    never be gram-contaminated (no grams), matching the oracle's LEFT
    JOIN semantics."""
    per_doc = docs_decontaminate(t)
    train = t["documents"].filter(F.col("source") != DECON_EVAL_SOURCE).select(
        "doc_id", "source"
    )
    return (
        train.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count("shared_grams").cast("long").alias("n_contaminated"),
            dround(F.count("shared_grams") * 1.0 / F.count("*")).alias(
                "contamination_rate"
            ),
            dround(F.coalesce(F.avg("shared_grams"), F.lit(0.0))).alias(
                "avg_shared_grams"
            ),
        )
    )


TEXT_OPS["docs_contamination_report"] = (
    docs_contamination_report,
    _contamination_report_sql(),
)


# --- Bloom-filter decontamination gate (sketch-bounded membership) ----------
#: m — bloom bitmap size in bits. 2^22 bits = 64 Ki longs = 512 KiB —
#: a CONSTANT, scale-invariant broadcast regardless of corpus or eval
#: size (vs the exact gate, whose broadcast grows with the eval gram
#: set). At n = 10^5 eval grams, k = 4: kn/m ≈ 0.095, so the
#: false-positive rate per probed gram, (1 - e^(-kn/m))^k, is ≈ 7e-5
#: (the FP-bound test computes this exactly for the fixture's n).
#: Sizing m for a bigger eval suite scales linearly: keep kn/m ≲ 0.1
#: for an FP rate in the 1e-4 decade.
BLOOM_BITS = 1 << 22
BLOOM_WORDS = BLOOM_BITS // 64
#: k — independent hash functions per gram (xxhash64 chains seeded
#: 0..k-1, the minhash seed-family idiom).
BLOOM_HASHES = 4


def _bloom_pos(gram_col, seed: int):
    """Bit position of hash function ``seed`` for one gram hash."""
    return F.pmod(F.xxhash64(gram_col, F.lit(seed)), F.lit(BLOOM_BITS))


def bloom_member(gram_col, bloom_col):
    """True iff every one of the k bloom bits for this gram is set —
    guaranteed true for every gram that was inserted (no false
    negatives); false positives at the documented rate. THE membership
    definition, shared by the batch gate below and the streaming
    filter-at-ingest twin (streaming/curation.py) so both sides probe
    identically by construction."""
    cond = None
    for seed in range(BLOOM_HASHES):
        pos = _bloom_pos(gram_col, seed)
        word = F.element_at(bloom_col, (pos / F.lit(64)).cast("int") + F.lit(1))
        hit = F.call_function("getbit", word, F.pmod(pos, F.lit(64)).cast("int")) == 1
        cond = hit if cond is None else (cond & hit)
    return cond


def build_bloom_bitmap(eval_grams: DataFrame) -> list[int]:
    """Insert a distinct-gram-hash frame (one ``gram`` bigint column)
    into a fresh bloom bitmap and return it as a BLOOM_WORDS-long
    Python list — THE build definition shared by the batch gate and
    the streaming twin. The groupBy(word) bit_or reduces the k
    positions per gram map-side; the collect is bounded by
    BLOOM_WORDS (2^16 rows), scale-INVARIANT whatever the eval suite
    grows to (the HWM-scalar collect class)."""
    set_words = (
        eval_grams.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("gram"), s) for s in range(BLOOM_HASHES)])
            ).alias("pos")
        )
        .select(
            F.shiftright("pos", 6).alias("w"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()  # bounded: at most BLOOM_WORDS (2^16) rows, scale-invariant
    )
    bitmap = [0] * BLOOM_WORDS
    for row in set_words:
        bitmap[row["w"]] = row["word"]
    return bitmap


@_register("docs_bloom_decontaminate", None)
def docs_bloom_decontaminate(t: Frames) -> DataFrame:
    """Sketch-bounded twin of ``docs_decontaminate``: gate the training
    corpus against the eval set through a Bloom filter over the eval
    gram hashes instead of the exact distinct-gram set. Output:
    (doc_id, bloom_hits) for every train doc with at least one
    bloom-positive gram — a SUPERSET of the exact gate's flagged docs
    (Bloom filters have no false negatives), with false positives at
    the documented (1-e^(-kn/m))^k per-gram rate. The production
    shape: flag cheaply with the constant-size sketch, then (if the
    FP rate matters) confirm only the flagged sliver exactly.

    Scale design — why a sketch when the exact gate already
    broadcasts: the exact eval-gram broadcast is O(distinct eval
    grams) and a real decon suite (every benchmark x 13-gram
    granularity, MMLU+GSM+HumanEval+...) reaches hundreds of millions
    of grams — gigabytes per executor. The bloom bitmap is a CONSTANT
    512 KiB whatever the eval suite grows to; FP rate, not memory, is
    the degradation mode, and m is one config knob. Build side: eval
    grams explode to k=4 bit positions, one groupBy(word) bit_or
    reduces them to at most 2^16 set words — a BOUNDED collect
    (BLOOM_WORDS rows max, scale-invariant, the HWM-scalar class).
    Probe side: pure column expressions (xxhash64 + getbit) inside
    whole-stage codegen against the 1-row broadcast-crossJoin bitmap
    — the corpus is scanned once and never shuffles; the only
    aggregation is the per-doc partial-agg count.

    Correctness: rows-only registry entry (DuckDB lacks xxhash64, and
    FP membership depends on exact hash values). Pinned in pytest
    instead: flagged-doc superset of the exact gate, planted-dup
    recall, empirical per-doc FP rate under the analytic bound, and
    the bitmap's set-bit population matching k x n_grams minus
    collisions (determinism)."""
    toks = _tokens_col()
    docs = spread_small_input(t["documents"]).select(
        "doc_id",
        "source",
        F.size(toks).alias("n_toks"),
        F.transform(toks, lambda x: F.xxhash64(x)).alias("th"),
    )
    grams = decon_gram_hashes(F.col("th"))
    long_enough = F.col("n_toks") >= DECON_GRAM

    eval_grams = (
        docs.filter((F.col("source") == DECON_EVAL_SOURCE) & long_enough)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    bitmap = build_bloom_bitmap(eval_grams)

    spark = t["documents"].sparkSession
    bloom = spark.createDataFrame([(bitmap,)], "bloom array<bigint>")
    train = docs.filter((F.col("source") != DECON_EVAL_SOURCE) & long_enough).select(
        "doc_id", grams.alias("grams")
    )
    return (
        train.crossJoin(F.broadcast(bloom))
        .select(
            "doc_id",
            F.size(
                F.filter("grams", lambda g: bloom_member(g, F.col("bloom")))
            ).cast("long").alias("bloom_hits"),
        )
        .filter(F.col("bloom_hits") > 0)
    )


# --- BPE merge-rule training (Sennrich et al. 2016, arXiv:1508.07909) -------
#: number of merge rules to learn (enough for the planted tests and a
#: meaningful vocab over the synthetic corpus; raise for a real run)
BPE_MERGES = 10
#: end-of-word marker, kept distinct from any corpus character
BPE_EOW = "</w>"
#: per-round cap on accepted merges — bounds the chained-fold expression
#: depth of the one-projection batch application
BPE_BATCH = 16
#: candidate pair rows collected per round (bounded driver collect; the
#: batch accept scans these in sorted order)
BPE_CANDIDATES = 96

#: observability for tests / bench notes: rounds (Spark job cycles) and
#: merges of the most recent bpe_train call
bpe_train_stats: dict[str, int] = {"rounds": 0, "merges": 0}


def _fold_merge(inner, left: str, right: str):
    """One merge rule applied to a symbol array as an ``aggregate``
    fold: join adjacent (left, right) left-to-right non-overlapping —
    exactly the sequential BPE application rule. Interpreted per
    element (higher-order functions never enter whole-stage codegen) —
    kept only as the fallback for corpora whose alphabet contains the
    ``_BPE_SEP`` sentinel; the hot path is :func:`_replace_merge`."""
    merged = left + right
    return F.aggregate(
        inner,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


#: sentinel for the delimited-string symbol encoding (r16): symbol
#: arrays ride as one string, "\x1f\x1f" between symbols and at both
#: ends, so a merge rule becomes ONE codegen'd string ``replace`` —
#: guide §4.1: the interpreted aggregate-fold chain above was the
#: trainer's entire cost (each fold re-builds the accumulator array
#: per element). The unit separator never occurs in the synthetic
#: corpora; every entry point still GUARDS on it and falls back to the
#: exact fold path, so semantics are input-independent.
_BPE_SEP = "\x1f"
_BPE_SEP2 = _BPE_SEP * 2


def _sep_join(syms_col):
    """array<string> symbols -> delimited string ("\\x1f\\x1f" runs
    between symbols and at the ends; symbols must not contain the
    sentinel — callers guard)."""
    return F.concat(
        F.lit(_BPE_SEP2), F.array_join(syms_col, _BPE_SEP2), F.lit(_BPE_SEP2)
    )


def _sep_split(s_col):
    """Delimited string -> array<string> symbols (inverse of
    :func:`_sep_join`)."""
    return F.filter(F.split(s_col, _BPE_SEP2), lambda x: x != "")


def _replace_merge(s_col, left: str, right: str):
    """One merge rule over the delimited-string encoding as a single
    codegen'd ``replace``: the pattern "\\x1f<l>\\x1f\\x1f<r>\\x1f" can
    only match a full adjacent symbol pair (separator runs are exactly
    two sentinels, symbols contain none, and the single flanking
    sentinel forces l/r to be whole symbols), and ``replace`` scans
    left-to-right non-overlapping — exactly the sequential BPE rule
    the aggregate fold implements. The replacement keeps the flanking
    sentinels, so the run-length invariant survives chained rules.
    Equivalence with the fold path is property-pinned against the
    pure-Python reference in tests/test_properties.py."""
    return F.replace(
        s_col,
        F.lit(_BPE_SEP + left + _BPE_SEP2 + right + _BPE_SEP),
        F.lit(_BPE_SEP + left + right + _BPE_SEP),
    )


def _accept_batch(
    cand: list, want: int, vocab: set[str], mode: str
) -> list[tuple[str, str, int]]:
    """Choose this round's merge batch from the sorted candidate rows.

    ``exact`` accepts the maximal symbol-disjoint PREFIX of the sorted
    list (stop at the first pair sharing a symbol — or a merged token —
    with an earlier acceptance), then truncates with two guards that
    make the batch provably identical to one-at-a-time Sennrich:

    - pairs after the first keep only counts STRICTLY above the first
      conflicting pair's count (or the last collected row's count if no
      conflict is in the window). Any pair a merge newly creates is
      bounded by the count of some pair that conflicts with that merge
      — e.g. count(x, ab) <= count(x, a) — and every conflicting pair
      sits at-or-below that cutoff (a higher one would have ended the
      prefix earlier), so nothing recomputation could surface can
      outrank or tie an accepted pair.
    - the batch closes after a merge whose token string collides with
      an EXISTING vocab symbol: post-merge, pairs over that symbol gain
      occurrences, so later stale counts could under-rank them.

    ``fast`` skips conflicting candidates and keeps scanning (the
    standard parallel-trainer trick): a round's merges are mutually
    disjoint so they commute, but the global rule order can deviate
    from strict Sennrich exactly where pairs conflict, and rule counts
    are the counts at the round's start. ~batch× fewer rounds — the
    mode for realistic (32k) vocabularies.
    """
    out: list[tuple[str, str, int]] = []
    used: set[str] = set()
    if mode == "exact":
        prefix: list[tuple[str, str, int]] = []
        c_cutoff = int(cand[-1]["cnt"])
        for row in cand:
            l, r = row["l"], row["r"]
            if l in used or r in used or (l + r) in used:
                c_cutoff = int(row["cnt"])
                break
            prefix.append((l, r, int(row["cnt"])))
            used.update((l, r, l + r))
        for j, (l, r, cnt) in enumerate(prefix):
            if len(out) >= want:
                break
            if j > 0 and cnt <= c_cutoff:
                break
            out.append((l, r, cnt))
            if (l + r) in vocab:
                break
    elif mode == "fast":
        for row in cand:
            if len(out) >= want:
                break
            l, r = row["l"], row["r"]
            if l in used or r in used or (l + r) in used:
                continue
            out.append((l, r, int(row["cnt"])))
            used.update((l, r, l + r))
            if (l + r) in vocab:
                # collision inflates later counts post-merge; close the
                # batch and let the next round recount
                break
    else:
        raise ValueError(f"unknown bpe_train mode {mode!r}")
    return out


def bpe_train(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    batch: int = BPE_BATCH,
    mode: str = "exact",
) -> DataFrame:
    """Learn BPE merge rules over the corpus — the tokenizer-training
    stage of an LLM data pipeline, in its distributed formulation:
    train on the WORD-COUNT table (what HF/SentencePiece trainers do
    too), so per-iteration cost is O(distinct words × word length),
    bounded by Heaps' law, not corpus size.

    Rounds are BATCHED: each round runs ONE pair-count job (explode →
    keyed sum with map-side partials, deterministic tie-break: count
    desc then pair asc), collects the top BPE_CANDIDATES rows (bounded
    — the same collect class as the HWM scalar and k-means centroids),
    accepts up to ``batch`` merges per ``_accept_batch`` (``exact`` is
    provably identical to one-at-a-time Sennrich; ``fast`` trades
    strict rule order where pairs conflict for ~batch× fewer rounds),
    and applies them in one chained-fold projection. The word table is
    checkpointed per ROUND, not per merge (O(1) lineage, the kmeans/CC
    idiom) — so a 32k-vocab fast-mode train is ~32k/batch Spark jobs,
    not 32k.

    Returns the merge table: (rank, left, right, merged, pair_count).
    Rows-only for the driver (iterative); semantics proven on the
    classic low/lower/newest corpus in tests/test_llm_ops.py and
    merge-for-merge vs a pure-Python reference in tests/
    test_properties.py.
    """
    toks = _tokens_col()
    seed_syms = F.concat(
        # seed segmentation: characters + end-of-word marker
        F.expr("filter(split(word, ''), x -> x <> '')"),
        F.array(F.lit(BPE_EOW)),
    )
    word_counts = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
        .localCheckpoint(eager=False)
    )
    # starting vocabulary (distinct single characters + EOW): one
    # alphabet-sized collect, needed for the merged-token collision guard
    vocab = {
        r["s"]
        for r in word_counts.select(F.explode(seed_syms).alias("s"))
        .distinct()
        .collect()
    }
    # hot path (r16): carry the symbols as ONE delimited string so each
    # merge rule is a codegen'd replace instead of an interpreted
    # aggregate fold (measured 11.4 s -> see OPTIMIZATION_r16.md). The
    # sentinel can only collide with a corpus whose alphabet contains
    # "\x1f" — vocab is already collected, so the guard is free; merged
    # tokens are concatenations of seed symbols and cannot introduce it.
    fast = all(_BPE_SEP not in s for s in vocab)
    words = word_counts.select(
        (_sep_join(seed_syms) if fast else seed_syms).alias("s" if fast else "syms"),
        "wc",
    ).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        syms = _sep_split(F.col("s")) if fast else F.col("syms")
        pairs = F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i).alias("l"),
                    F.element_at(syms, i + 1).alias("r"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        cand = (
            words.select(F.explode(pairs).alias("p"), "wc")
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(BPE_CANDIDATES)
            .collect()
        )
        if not cand:
            break
        rounds += 1
        accepted = _accept_batch(
            cand, min(batch, n_merges - len(merges)), vocab, mode
        )
        col = F.col("s") if fast else F.col("syms")
        for left, right, cnt in accepted:
            merges.append((len(merges), left, right, left + right, cnt))
            vocab.add(left + right)
            col = (
                _replace_merge(col, left, right)
                if fast
                else _fold_merge(col, left, right)
            )
        out_name = "s" if fast else "syms"
        words = words.select(col.alias(out_name), "wc").localCheckpoint(
            eager=False
        )
    bpe_train_stats.update(rounds=rounds, merges=len(merges))
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count long"
    )


def bpe_apply(merges: list[tuple[str, str]], word_col):
    """Apply an ordered merge list to a character-seed symbol array —
    the encode side of the trainer, as one nested column expression
    (merge count is small and fixed, so expression depth is bounded).
    ``word_col`` may be a column name or a Column (e.g. a higher-order
    lambda variable — see text_bpe_tokenize).

    r16: the hot path chains codegen'd string replaces over the
    delimited encoding (:func:`_replace_merge`); rows whose word
    contains the sentinel take the exact interpreted fold branch
    (CaseWhen evaluates branches lazily per row, so clean corpora
    never pay for it). A merge LIST containing the sentinel can only
    come from a sentinel-bearing corpus — then the whole expression
    stays on the fold path."""
    col = F.col(word_col) if isinstance(word_col, str) else word_col
    seed = F.concat(
        F.filter(F.split(col, ""), lambda x: x != ""),
        F.array(F.lit(BPE_EOW)),
    )

    # _fold_merge is a closure FACTORY, not default args: a default arg
    # would change the lambda's arity and PySpark binds lambda params
    # positionally (the minhash_signatures seed bug class)
    slow = seed
    for left, right in merges:
        slow = _fold_merge(slow, left, right)
    if any(_BPE_SEP in left or _BPE_SEP in right for left, right in merges):
        return slow
    s = _sep_join(seed)
    for left, right in merges:
        s = _replace_merge(s, left, right)
    return F.when(col.contains(_BPE_SEP), slow).otherwise(_sep_split(s))


@_register("text_bpe_merges", None)
def text_bpe_merges(t: Frames) -> DataFrame:
    return bpe_train(t["documents"])


#: the realistic-vocab entry's merge budget: far past the demo's 10 and
#: deep enough that batching visibly collapses the round count (a full
#: 32k-vocab run is the same loop with a bigger budget)
BPE_MERGES_512 = 512
BPE_BATCH_512 = 32


@_register("text_bpe_merges_512", None)
def text_bpe_merges_512(t: Frames) -> DataFrame:
    """The batched trainer at a REALISTIC merge budget: 512 merges,
    fast mode, batch 32 — the standing driver-checked artifact for the
    scale claim that a vocab-sized train costs ~vocab/batch pair-count
    jobs, not vocab (the round-7 verdict's Next #3; previously the
    claim lived only in a PLANS.md measurement). Training may exhaust
    the corpus's mergeable pairs before 512 — the merge table is
    whatever the corpus supports, and ``bpe_train_stats`` records
    (rounds, merges) for the rounds ≪ merges assertion in
    tests/test_llm_ops.py. Rows-only: iterative, like text_bpe_merges."""
    return bpe_train(
        t["documents"], n_merges=BPE_MERGES_512, batch=BPE_BATCH_512, mode="fast"
    )


@_register("text_bpe_tokenize", None)
def text_bpe_tokenize(t: Frames) -> DataFrame:
    """Trainer → encoder composed at corpus scale: learn BPE_MERGES
    rules from the corpus word-count table, then segment EVERY
    document with them — per doc, whitespace word count, BPE token
    count, and the tokens-per-word expansion ratio a data pipeline
    budgets sequence lengths with.

    Scale design: the learned rules render into ONE nested column
    expression (bounded depth = merge count), but higher-order-function
    folds are interpreted per element — applying them to every corpus
    token cost ~3 s of this entry's 5 s at sf0.1. The fold therefore
    runs only over the DISTINCT-WORD vocabulary (Heaps-bounded, the
    same table the trainer works on); per-word BPE lengths broadcast
    back onto the exploded corpus and re-aggregate per doc (explode
    keeps a doc's tokens partition-local, so the partial agg collapses
    to one row per doc before the doc_id shuffle). Measured at sf0.1
    (min-of-3, trainer included in every sample): 4.97 → 3.11 s —
    encode itself ~3.0 → ~1.2 s — with byte-identical output."""
    from real_time_fraud_detection_lakehouse_spark.core.catalog import (
        spread_small_input,
    )

    docs = t["documents"]
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs).collect()  # BPE_MERGES rows — bounded
    ]
    toks = _tokens_col()
    spread = spread_small_input(docs)
    vlen = (
        spread.select(F.explode(toks).alias("word"))
        .distinct()
        .select("word", F.size(bpe_apply(merges, "word")).alias("bpe_len"))
    )
    per_doc = (
        spread.select("doc_id", F.explode(toks).alias("word"))
        .join(F.broadcast(vlen), "word")
        .groupBy("doc_id")
        .agg(F.sum("bpe_len").cast("int").alias("n_bpe"))
    )
    n_words = F.size(toks)
    n_bpe = F.coalesce(F.col("n_bpe"), F.lit(0))
    return (
        spread.select("doc_id", n_words.alias("n_words"))
        .join(per_doc, "doc_id", "left")  # zero-token docs keep their row
        .select(
            "doc_id",
            "n_words",
            n_bpe.alias("n_bpe_tokens"),
            dround(n_bpe.cast("double") / F.greatest(F.col("n_words"), F.lit(1))).alias(
                "bpe_per_word"
            ),
        )
    )


# --- character-entropy quality signal (gibberish / encoding junk) -----------
@_register(
    "text_char_entropy",
    f"""
    WITH chars AS (
      SELECT doc_id, c.ch
      FROM documents, UNNEST(list_filter(string_split(text, ''), x -> x <> '')) AS c(ch)
    ),
    counts AS (
      SELECT doc_id, ch, COUNT(*) AS n FROM chars GROUP BY 1, 2
    ),
    tot AS (
      SELECT doc_id, SUM(n) AS total, COUNT(*) AS distinct_chars FROM counts GROUP BY 1
    )
    SELECT c.doc_id,
           CAST(t.total AS BIGINT) AS n_chars,
           CAST(t.distinct_chars AS INTEGER) AS distinct_chars,
           {dround_sql('-SUM((CAST(c.n AS DOUBLE) / t.total) * log2(CAST(c.n AS DOUBLE) / t.total))', 4)}
             AS entropy_bits
    FROM counts c JOIN tot t ON c.doc_id = t.doc_id
    GROUP BY c.doc_id, t.total, t.distinct_chars
    """,
)
def text_char_entropy(t: Frames) -> DataFrame:
    """Shannon entropy of each document's character distribution —
    the cheap gibberish/encoding-junk detector (mojibake and binary
    spill show extreme entropy; single-char spam shows ~0; natural
    text sits ~4±1 bits). Scale: char explode is corpus-linear with
    map-side partial counts; per-doc totals and the entropy sum are
    doc-keyed aggs. Oracled (log2 + r4 rounding both engines)."""
    chars = (
        spread_small_input(t["documents"])
        .select(
            "doc_id",
            F.explode(F.filter(F.split(F.col("text"), ""), lambda x: x != "")).alias(
                "ch"
            ),
        )
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("n"))
    tot = counts.groupBy("doc_id").agg(
        F.sum("n").alias("total"), F.count("*").alias("distinct_chars")
    )
    p = F.col("n").cast("double") / F.col("total")
    return (
        counts.join(tot, "doc_id")
        .groupBy("doc_id", "total", "distinct_chars")
        .agg(dround(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"))
        .select(
            "doc_id",
            F.col("total").cast("long").alias("n_chars"),
            F.col("distinct_chars").cast("int").alias("distinct_chars"),
            "entropy_bits",
        )
    )


# --- PMI collocation mining (round 12) ---------------------------------------
#: minimum bigram support before a pair is scored — PMI is unstable on
#: hapax pairs (one co-occurrence of two rare words maxes the score),
#: so every serious collocation pass floors the count first.
PMI_MIN_COUNT = 5


@_register(
    "text_collocations_pmi",
    f"""
    WITH toks AS (SELECT {_TOKENS} AS t FROM documents),
    pairs AS (
      SELECT t[i+1] AS w1, t[i+2] AS w2
      FROM toks, UNNEST(range(0, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    uni AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cu
      FROM (SELECT unnest(t) AS token FROM toks) GROUP BY token
    ),
    tot AS (
      SELECT CAST((SELECT COUNT(*) FROM pairs) AS DOUBLE) AS nb,
             CAST((SELECT SUM(cu) FROM uni) AS DOUBLE) AS nu
    ),
    bi AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM pairs GROUP BY w1, w2 HAVING COUNT(*) >= {PMI_MIN_COUNT}
    )
    SELECT bi.w1, bi.w2, bi.n_pair,
           {dround_sql(
             "ln((bi.n_pair / tot.nb) / ((a.cu / tot.nu) * (b.cu / tot.nu)))"
           )} AS pmi
    FROM bi JOIN uni a ON bi.w1 = a.token JOIN uni b ON bi.w2 = b.token, tot
    """,
)
def text_collocations_pmi(t: Frames) -> DataFrame:
    """Pointwise-mutual-information collocation mining — the classic
    corpus-linguistics pass (Church & Hanks 1990) that surfaces token
    pairs co-occurring far above chance: PMI = ln(p(a,b)/(p(a)p(b)))
    with the pair probability over adjacent-bigram positions and the
    unigram probabilities over all token occurrences. Curation reads
    it two ways: high-PMI pairs are multi-word expressions a tokenizer
    budget should treat as units; a corpus whose top collocations are
    boilerplate fragments ("click here", "all rights") is
    template-heavy. Hapax instability is floored by
    PMI_MIN_COUNT={PMI_MIN_COUNT}.

    Scale design: the corpus-sized frames are the bigram stream (the
    module's ONE ``_BIGRAM_EXPR`` definition) and the token explode —
    each folds through a keyed count with map-side partials, output
    bounded by the type space (the lm_perplexity cost class). The
    support filter prunes the pair tail BEFORE the two unigram
    join-backs (type-keyed; AQE sizes them — vocabulary-bounded,
    broadcast when small), and the two scalar totals ride one
    broadcast 1-row crossJoin. No window, no all-pairs, nothing
    sorted."""
    toks = (
        spread_small_input(t["documents"])
        .select(_tokens_col().alias("t"))
        .localCheckpoint(eager=False)
    )
    pairs = _bigrams_from_tokens(toks).select(
        F.substring_index("bigram", " ", 1).alias("w1"),
        F.substring_index("bigram", " ", -1).alias("w2"),
    )
    uni = (
        toks.select(F.explode("t").alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cu"))
    )
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= PMI_MIN_COUNT)
    )
    totals = pairs.agg(F.count("*").cast("double").alias("nb")).crossJoin(
        uni.agg(F.sum("cu").cast("double").alias("nu"))
    )
    a = uni.select(F.col("token").alias("w1"), F.col("cu").alias("cu_a"))
    b = uni.select(F.col("token").alias("w2"), F.col("cu").alias("cu_b"))
    return (
        bi.join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            dround(
                F.log(
                    (F.col("n_pair") / F.col("nb"))
                    / ((F.col("cu_a") / F.col("nu")) * (F.col("cu_b") / F.col("nu")))
                )
            ).alias("pmi"),
        )
    )
