"""Text analysis operators for training-data curation: language ID
(marker-word heuristic), quality scoring, token counting, fingerprinting.

Everything is pure Column expressions (codegen, no UDFs). A real deployment
would swap the marker tables for fastText-style models via a Pandas UDF; the
Spark-side shape (per-doc scoring, groupBy source rollups) stays identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker word -> language, deterministic priority order for ties
LANG_MARKERS = [
    ("en", "the"),
    ("es", "data"),
    ("de", "table"),
    ("fr", "row"),
    ("zh", "key"),
]

STOPWORDS = ("the", "a")


def _tok(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def _count_token(text_col: str, word: str) -> Column:
    return F.size(F.filter(_tok(text_col), lambda x: x == word))


def predict_lang(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax of marker-word counts with fixed priority tie-break."""
    counts = [_count_token(text_col, w).alias(f"_c_{lang}") for lang, w in LANG_MARKERS]
    df = docs.select("*", *counts)
    pred = None
    for lang, _ in LANG_MARKERS:
        cond = F.lit(True)
        for other, _ in LANG_MARKERS:
            if other != lang:
                # strictly-greater for languages later in priority order,
                # >= for earlier ones => first maximum wins
                later = [x for x, _ in LANG_MARKERS].index(other) > [
                    x for x, _ in LANG_MARKERS
                ].index(lang)
                c = (
                    F.col(f"_c_{lang}") >= F.col(f"_c_{other}")
                    if later
                    else F.col(f"_c_{lang}") > F.col(f"_c_{other}")
                )
                cond = cond & c
        pred = (
            F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
        )
    return df.withColumn("predicted_lang", pred).drop(
        *[f"_c_{lang}" for lang, _ in LANG_MARKERS]
    )


def quality_features(docs: DataFrame, text_col: str = "text",
                     nchars_col: str = "n_chars") -> DataFrame:
    """Length/stopword/word-shape features + a deterministic quality score."""
    n_words = F.size(_tok(text_col))
    n_stop = F.size(F.filter(_tok(text_col), lambda x: x.isin(*STOPWORDS)))
    avg_word_len = (
        (F.col(nchars_col) - (n_words - 1)).cast("double") / n_words.cast("double")
    )
    stop_ratio = n_stop.cast("double") / n_words.cast("double")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stop_ratio"),
        # toy quality score: long-enough docs with moderate stopword rate
        (
            F.when(n_words >= 20, F.lit(1)).otherwise(0)
            + F.when(stop_ratio <= 0.2, F.lit(1)).otherwise(0)
        ).alias("quality_score"),
    )


def boilerplate_lines(docs: DataFrame, *, min_docs: int = 3,
                      min_frac: float = 0.3, min_chars: int = 4,
                      source_col: str = "source",
                      text_col: str = "text") -> DataFrame:
    """Per-source repeated-line detection — the CCNet/trafilatura-style
    boilerplate rule for web corpora: a line that appears in at least
    ``min_frac`` of a source's documents (and at least ``min_docs`` of
    them) is navigation/footer/cookie-banner furniture, not content.
    Lines are trimmed before counting and must clear ``min_chars``; each
    doc contributes a line at most once (DISTINCT before the count), so a
    page repeating its own menu doesn't inflate the vote.

    Output: (source, line, n_docs_with_line, doc_frac). Complements the
    span-dedup family: spans catch arbitrary repeated passages anywhere,
    this catches the structured per-domain furniture a crawl actually
    has, cheaply enough to run per snapshot.

    Scale shape: one explode + distinct, one (source, line)-keyed count
    (the only corpus-sized shuffle), and the per-source doc totals are a
    #sources-row aggregate broadcast back — nothing quadratic, no
    windows."""
    lines = (
        docs.select(source_col, "doc_id",
                    F.explode(F.split(text_col, "\n")).alias("_raw"))
        .select(source_col, "doc_id", F.trim(F.col("_raw")).alias("line"))
        .where(F.length("line") >= min_chars)
        .distinct()
    )
    per_line = lines.groupBy(source_col, "line").agg(
        F.count("*").alias("n_docs_with_line")
    )
    totals = docs.groupBy(source_col).agg(
        F.count_distinct("doc_id").alias("_n")
    )
    return (
        per_line.join(F.broadcast(totals), source_col)
        .withColumn(
            "doc_frac",
            F.round(F.col("n_docs_with_line") / F.col("_n"), 6),
        )
        .where((F.col("n_docs_with_line") >= min_docs)
               & (F.col("doc_frac") >= min_frac))
        .select(source_col, "line", "n_docs_with_line", "doc_frac")
    )


def strip_boilerplate(docs: DataFrame, boilerplate: DataFrame, *,
                      max_lines_per_source: int = 1000,
                      source_col: str = "source",
                      text_col: str = "text") -> DataFrame:
    """Remove detected boilerplate lines IN-ROW: the per-source line set
    (capped at ``max_lines_per_source`` by document frequency, so a
    pathological source can't balloon the broadcast) joins on as one
    array column — #sources × cap rows, broadcast — and each document
    filters its own lines with a JVM higher-order function. The corpus
    is never exploded or re-grouped per line: one broadcast join over
    the doc scan is the whole plan, the 100 TB shape. Docs from sources
    with no boilerplate pass through byte-identical.

    Returns the input columns with ``text`` rewritten (kept lines
    re-joined with newlines, raw bytes preserved — matching is on the
    trimmed line, remembering how detection counted) plus
    ``n_lines_removed``."""
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(
        F.desc("n_docs_with_line"), "line"
    )
    sets = (
        boilerplate.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= max_lines_per_source)
        .groupBy(source_col)
        .agg(F.collect_list("line").alias("_bl"))
    )
    kept = F.when(
        F.col("_bl").isNull(), F.col("_lines")
    ).otherwise(
        F.filter(
            "_lines",
            lambda line: ~F.array_contains(F.col("_bl"), F.trim(line)),
        )
    )
    return (
        docs.join(F.broadcast(sets), source_col, "left")
        .withColumn("_lines", F.split(text_col, "\n"))
        .withColumn("_kept", kept)
        .withColumn("n_lines_removed",
                    F.size("_lines") - F.size("_kept"))
        .withColumn(text_col, F.concat_ws("\n", F.col("_kept")))
        .drop("_lines", "_kept", "_bl")
    )


def gate_decisions(batch_docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """THE per-batch ingest decision, composed from a near-dup pair frame
    and the quality gate: one row per arriving doc with (n_matches,
    max_jaccard, quality_score, keep); keep = no standing near-dup AND
    full quality score. ``pairs`` is (d_new, d_old, jaccard) from either
    incremental_lsh_pairs (on-the-fly corpus) or probe_lsh_index (the
    persisted bucketed index) — the registered ``ingest_gate`` query and
    the streaming deployment (streaming/ingest.py) run THIS body, so the
    gate a firehose applies is bit-identical to the one the batch
    pipeline was calibrated on.

    Pair rows are collapsed per (d_new, d_old) before counting, so an
    index that holds replay-duplicated rows (a crash-replayed
    append_lsh_index batch) can never inflate n_matches — the dedup is
    batch-sized, the robustness is free."""
    hits = (
        pairs.groupBy("d_new", "d_old")
        .agg(F.max("jaccard").alias("_j"))
        .groupBy(F.col("d_new").alias("doc_id"))
        .agg(
            F.count("*").alias("_nm"),
            F.round(F.max("_j"), 6).alias("_mj"),
        )
    )
    return (
        quality_features(batch_docs)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_nm"), F.lit(0)).alias("n_matches"),
            F.coalesce(F.col("_mj"), F.lit(0.0)).alias("max_jaccard"),
            "quality_score",
            (F.col("_nm").isNull() & (F.col("quality_score") == 2))
            .alias("keep"),
        )
    )


# GPT-2-style pre-tokenizer segmentation, restricted to constructs with
# identical semantics in Java regex (Spark), RE2 (DuckDB), and Python:
# space-prefixed letter runs / digit runs / punctuation runs, bare spaces.
BPE_SPLIT = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens, regex word tokens, GPT-style pre-tokenizer
    segments (the unit BPE merges start from), and distinct-token counts."""
    return docs.select(
        "doc_id",
        F.size(_tok(text_col)).alias("ws_tokens"),
        F.expr(f"size(regexp_extract_all({text_col}, '[a-z0-9]+', 0))").alias("re_tokens"),
        F.expr(f"size(regexp_extract_all({text_col}, '{BPE_SPLIT}', 0))").alias("bpe_tokens"),
        F.size(F.array_distinct(_tok(text_col))).alias("distinct_tokens"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized md5 fingerprint: whitespace-collapsed, lowercased, trimmed
    — the canonical near-exact-dup key."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def _word_grams(text_col: str, n: int) -> Column:
    """In-row word n-gram array (empty when the doc is shorter than n).

    The short-doc case needs an explicit branch: sequence(1, 0) yields the
    DESCENDING array [1, 0] — the transform would then call slice(ws, 0, n),
    which throws INVALID_PARAMETER_VALUE.START at runtime."""
    return F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) >= {n} THEN "
        f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n}))) "
        f"ELSE array() END"
    )


def repetition_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals, fully in-row (no shuffle):

    - dup_{2,3}gram_frac: fraction of word n-grams that are repeats of an
      earlier n-gram in the same doc (1 - distinct/total) — the classic
      within-doc repetition quality gate for LLM corpora;
    - top_word_frac: share of the doc taken by its single most frequent word
      — the max multiplicity is the longest run in the SORTED token array,
      found with one O(n log n) sort + one linear fold (a distinct×filter
      nested loop would be O(n²) per doc: one 100k-word doc would stall its
      partition for minutes, exactly the in-row skew these gates exist to
      catch).

    All ratios are exact int/int divisions, so they hash identically on any
    IEEE engine. At 100 TB this is a pure narrow map over the text scan.
    """
    ws = _tok(text_col)

    def dup_frac(n: int) -> Column:
        g = _word_grams(text_col, n)
        total = F.size(g)
        return F.when(
            total > 0,
            (total - F.size(F.array_distinct(g))).cast("double")
            / total.cast("double"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def longest_run_step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_cnt = F.aggregate(
        F.array_sort(ws), init, longest_run_step, lambda acc: acc["best"]
    )
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
        (top_cnt.cast("double") / F.size(ws).cast("double")).alias("top_word_frac"),
    )


def term_stats(docs: DataFrame, text_col: str = "text", top: int = 50) -> DataFrame:
    """Corpus vocabulary statistics: term frequency, document frequency, and
    the Zipf rank of the ``top`` most frequent terms.

    One explode + one groupBy(word): partial (map-side) aggregation does the
    heavy lifting, so the shuffle carries only per-partition (word, count)
    pairs — at 100 TB the reducer-side volume is bounded by |vocabulary| x
    partitions, not corpus size. The final top-k is a TakeOrdered, not a
    full sort."""
    from pyspark.sql import Window

    words = docs.select("doc_id", F.explode(_tok(text_col)).alias("word"))
    agg = words.groupBy("word").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("doc_id").alias("df"),
    )
    # limit-after-sort plans as TakeOrderedAndProject (a distributed top-k,
    # no global sort); the rank window then runs over only `top` rows — an
    # unpartitioned window over the full vocabulary would funnel it through
    # one task at corpus scale
    w = Window.orderBy(F.col("cnt").desc(), F.col("word"))
    return (
        agg.orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(top)
        .withColumn("rnk", F.row_number().over(w))
        .select("word", "cnt", "df", "rnk")
    )


def tfidf_top_terms(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document: tf = in-doc count, idf = ln(N/df),
    score rounded to 6 before ranking so the argmax tie-break (score desc,
    word asc) is engine-independent.

    Shape: explode -> (doc, word) counts -> word df join (broadcastable:
    |vocabulary| << corpus) -> per-doc rank. The per-doc rank partitions by
    doc_id — no global sort."""
    from pyspark.sql import Window

    words = docs.select("doc_id", F.explode(_tok(text_col)).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    # N joins in as a broadcast one-row aggregate so it stays inside the
    # lazy plan — an eager docs.count() here would scan the corpus just to
    # CONSTRUCT the frame, before any action on the result
    n_docs = docs.agg(F.count("*").cast("double").alias("_n"))
    # no broadcast hint on df_: a forced broadcast caps the operator at
    # driver-memory-sized vocabularies; AQE sees the df aggregate's real
    # shuffle size at runtime and converts to broadcast-hash exactly when
    # that's safe (both sides already shuffle on `word` otherwise)
    scored = (
        tf.join(df_, "word")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("doc_id", "word", "tf", "df", "tfidf", "rnk")
    )


# PII patterns restricted to constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): char classes, +, {m,}, alternation-free.
# Order matters: URLs are scrubbed first so an address embedded in a URL
# query string is consumed by the URL token, as a real scrubber would.
PII_PATTERNS = [
    ("url", r"https?://[a-z0-9./_%@-]+", "<URL>"),
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("phone", r"555-[0-9]{4}", "<PHONE>"),
]


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII/URL scrubbing gate: per-doc match counts for each pattern class
    plus the scrubbed text with matches replaced by typed placeholder
    tokens — the standard pre-training redaction pass.

    Patterns are passed as Column literals (never through SQL string
    parsing, where ``\\b`` would become backspace). Pure regexp codegen —
    a narrow map over the text scan, no shuffle, at any corpus size. A
    production deployment swaps the pattern table for a larger vetted set
    (NER-model scrubbing would ride the same shape via a Pandas UDF)."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        clean = F.regexp_replace(clean, F.lit(pat), F.lit(token))
    return docs.select("doc_id", *counts, clean.alias("clean_text"))


def rolling_hash(docs: DataFrame, text_col: str = "text",
                 base: int = 31, mod: int = 1_000_000_007) -> DataFrame:
    """Karp-Rabin polynomial rolling hash over the character stream — a
    higher-order aggregate, order-sensitive (unlike md5 of the whole string,
    prefix-extendable at scale)."""
    h = F.aggregate(
        F.split(F.col(text_col), ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.coalesce(F.ascii(c), F.lit(0))) % mod,
    )
    return docs.select("doc_id", h.alias("rhash"))


def winnow_fingerprints(docs: DataFrame, *, k: int = 5, window: int = 4,
                        text_col: str = "text",
                        positions: bool = True) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every char ``k``-gram, then from each
    sliding window of ``window`` consecutive hashes keep the minimum
    (rightmost on ties), and emit the distinct selected (position, hash)
    pairs.

    The guarantee that makes this THE fingerprint sampler for
    plagiarism/reuse detection: any shared substring of length
    >= ``window + k - 1`` is caught by at least one shared fingerprint,
    while storage drops to ~2/(window+1) of all grams. Docs shorter than
    one window keep their global minimum, so every non-empty doc emits
    >= 1 fingerprint.

    Fully in-row (hash array -> window minima via slice + array_min over
    (hash, -pos) structs -> array_distinct -> explode): a narrow flatMap,
    no shuffle; the md5-derived hash keeps it oracle-portable.

    ``positions=False`` emits (doc_id, fp) only, with the distinct taken
    IN-ROW over the hash values (doc_id is part of the key, so the per-doc
    array_distinct IS the global distinct) — zero shuffle, and the form
    pair-detection consumers want: the (doc_id, pos, fp) output needs a
    cross-partition ``.distinct()`` because one hash can be selected at
    several positions."""
    n = F.length(F.col(text_col)) - F.lit(k - 1)  # number of k-grams
    # (hash, -pos) structs: struct ordering gives min hash, rightmost tie.
    # The hash array MUST materialize as a named column before the window
    # pass: referenced inline inside the per-window lambda, the expression
    # tree re-computes every gram md5 for EVERY window — O(n^2) hashing
    # per doc (measured ~80 s vs ~1 s at sf0.01).
    H = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 0)), "
        f"i -> struct(CAST(conv(substring(md5(substring({text_col}, i, {k})), 1, 8), "
        f"16, 10) AS BIGINT) AS h, -i AS negpos))"
    )
    wsize = F.least(F.lit(window), n)
    m = n - wsize + 1
    mins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.col("_m")),
            lambda j: F.array_min(F.slice(F.col("_H"), j, window)),
        )
    )
    # the text scan is byte-small (often 1 partition) and AQE won't widen
    # byte-small exchanges, so without the explicit spread the whole
    # O(n*w) md5 pipeline runs on ONE core (measured 15s -> ~1s at sf0.1
    # on 32 cores)
    from .dedup import _spread

    hashed = _spread(docs.where(n >= 1)).select(
        "doc_id", H.alias("_H"), m.alias("_m")
    )
    if not positions:
        return hashed.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.transform(mins, lambda s: s["h"]))
            ).alias("fp"),
        )
    return (
        hashed
        .select("doc_id", F.explode(mins).alias("f"))
        .select(
            "doc_id",
            (-F.col("f.negpos")).alias("pos"),
            F.col("f.h").alias("fp"),
        )
        .distinct()
    )


def lexical_topk(docs: DataFrame, query_docs: DataFrame, *, k: int = 5,
                 text_col: str = "text") -> DataFrame:
    """Top-k lexically-similar documents per QUERY DOCUMENT by word-set
    Jaccard — doc-as-query retrieval, the lexical half of a hybrid
    retriever (the embedding half is cosine_topk; rrf_fuse combines
    them). Word-set Jaccard is the right lexical kinship for whole-doc
    queries: term order and repetition drop out, so boilerplate
    repetition can't inflate a match the way raw tf would.

    ``query_docs`` must carry (q_id, q_text). Candidates are docs sharing
    AT LEAST ONE word with the query — a doc with zero lexical overlap is
    not a retrieval result (jaccard 0 carries no evidence), which is what
    makes the INVERTED-INDEX shape below exact, not approximate.

    Scale shape: the classic postings join, not a brute-force pair pass.
    Both sides explode to (id, distinct word) postings; the query
    postings (bounded query set × vocabulary) BROADCAST onto the corpus
    postings equi-join, |∩| falls out of one partial+final count per
    (q, neighbor), and |∪| = |A|+|B|−|∩| joins the per-doc distinct
    sizes back (corpus sizes by equi-join, query sizes broadcast). Cost
    is proportional to MATCHING postings — shared-word occurrences —
    not to queries × corpus; the measured rewrite took the sf0.1 bench
    entry from ~9.5 s (in-row intersect per pair) to shared-postings
    time. Jaccard rounds to 6 before the per-query rank (desc,
    neighbor_id asc) so top-k membership is engine-exact."""
    from pyspark.sql import Window

    from .dedup import _spread

    # a byte-small corpus scan plans ONE partition, serializing the
    # tokenize/array_distinct pass AND the postings-probe stage below
    # (guide §2.5 — the dedup._spread trap, r12); hash-spread first
    base = _spread(docs).select(
        F.col("doc_id").alias("neighbor_id"),
        F.array_distinct(_tok(text_col)).alias("_w"),
    )
    base_sz = base.select(
        "neighbor_id", F.size("_w").alias("_nb")
    )
    # query side tokenizes through the SAME _tok helper as the corpus —
    # any future tokenizer change moves both halves of the Jaccard
    qs = query_docs.select(
        "q_id", F.array_distinct(_tok(F.col("q_text"))).alias("_qw")
    )
    q_sz = qs.select("q_id", F.size("_qw").alias("_nq"))
    corpus_post = base.select(
        "neighbor_id", F.explode("_w").alias("word")
    )
    q_post = qs.select("q_id", F.explode("_qw").alias("word"))
    inter = (
        corpus_post.join(F.broadcast(q_post), "word")
        .where(F.col("q_id") != F.col("neighbor_id"))
        .groupBy("q_id", "neighbor_id")
        .agg(F.count("*").alias("_i"))
    )
    scored = (
        inter.join(base_sz, "neighbor_id")
        .join(F.broadcast(q_sz), "q_id")
        .select(
            "q_id", "neighbor_id",
            F.round(
                F.col("_i").cast("double")
                / (F.col("_nb") + F.col("_nq") - F.col("_i")), 6
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("jaccard"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "neighbor_id", "jaccard", "rnk")
    )


def bm25_topk(docs: DataFrame, terms: tuple[str, ...], *, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text") -> DataFrame:
    """BM25-ranked top-k documents for a bag-of-terms query — the lexical
    retrieval scorer (Robertson/Sparck Jones probabilistic idf + per-doc
    length normalization) a corpus-curation stack uses for targeted
    harvesting and retrieval-augmented filtering.

    Per-term tf is an IN-ROW array filter (no explode/shuffle for the
    term dimension — |terms| is query-sized); corpus statistics (N, avgdl,
    per-term df) are ONE single-row aggregate broadcast back; the final
    top-k is orderBy+limit, which Spark executes as TakeOrdered
    (per-partition heaps + driver merge — no global sort shuffle). Scores
    round to 6 before the rank so the tie-break (score desc, doc_id asc)
    is engine-independent."""
    toks = _tok(text_col)
    base = docs.select("doc_id", toks.alias("_w")).withColumn(
        "dl", F.size("_w")
    )
    def _tf(term: str):
        # nested fn, not a default-arg lambda: a 2-arg lambda would make
        # F.filter pass the element INDEX as the second argument
        return F.size(F.filter(F.col("_w"), lambda w: w == F.lit(term)))

    tf_cols = [_tf(t).alias(f"tf{i}") for i, t in enumerate(terms)]
    d = base.select("doc_id", "dl", *tf_cols)
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).cast("double").alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    j = d.join(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        tf = F.col(f"tf{i}").cast("double")
        part = idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
        score = part if score is None else score + part
    return (
        j.select("doc_id", "dl", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def unigram_surprise(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc mean token surprise under the corpus's own unigram LM:
    -mean(ln p(w)), p(w) = corpus count / corpus tokens — the classic
    perplexity-style quality gate (boilerplate and spam score LOW, rare
    garbage scores HIGH; train-time pipelines threshold both tails).

    One explode -> (word) count aggregate builds the LM (vocab-sized, so
    the score join broadcasts at runtime via AQE — no forced hint, the
    frame is data-derived); the per-doc mean is a partial+final agg keyed
    on doc_id. ln runs on identical doubles in any engine and the mean is
    rounded to 6, the library's float-portability discipline."""
    t = docs.select("doc_id", F.explode(_tok(text_col)).alias("w"))
    lm = t.groupBy("w").agg(F.count("*").alias("c"))
    total = lm.agg(F.sum("c").cast("double").alias("total"))
    scored = t.join(lm, "w").join(F.broadcast(total))
    nll = -F.log(F.col("c").cast("double") / F.col("total"))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum(nll) / F.count("*"), 6).alias("mean_surprise"),
        )
    )


def gate_cutoffs(docs: DataFrame, rates=(0.5, 0.75, 0.9),
                 text_col: str = "text") -> DataFrame:
    """Gate calibration: the surprise-score cutoff that yields each
    target keep-rate — the threshold table a deployment STORES next to
    its quality gate ("keep the best 75%" needs a number, and that
    number drifts with the corpus; recompute per release, apply per
    batch). Cutoff at keep-rate p = the exact interpolated p-quantile of
    per-doc mean unigram surprise, so keeping docs with score <= cutoff
    keeps ~p of the corpus by construction.

    Scale shape: unigram_surprise's two vocab-bounded aggregates, then
    ONE array-form percentile aggregate (single buffer for all rates —
    the source_length_quartiles discipline) collapsing to a
    len(rates)-row table. Quantiles interpolate on round-6 scores and
    emit at round 4, the percentile portability rule."""
    ms = unigram_surprise(docs, text_col)
    arr = ", ".join(repr(float(r)) for r in rates)
    agg = ms.agg(
        F.count("*").alias("n_docs"),
        F.expr(f"percentile(mean_surprise, array({arr}))").alias("_q"),
    )
    rate_arr = F.array(*[F.lit(float(r)) for r in rates])
    return (
        agg.select("n_docs", F.posexplode("_q").alias("i", "_c"))
        .select(
            F.element_at(rate_arr, F.col("i") + 1).alias("keep_rate"),
            "n_docs",
            F.round("_c", 4).alias("surprise_cutoff"),
        )
    )


def gate_cutoffs_binned(docs: DataFrame, rates=(0.5, 0.75, 0.9),
                        n_bins: int = 256,
                        text_col: str = "text") -> DataFrame:
    """The SCALE path for gate calibration: exact interpolated
    percentile (gate_cutoffs) buffers every score in one aggregation
    buffer — fine per-group, wrong for 10^11 docs. This computes the
    same threshold table from a fixed-width histogram: score range from
    one min/max aggregate, then ``n_bins`` bin counts (a partial+final
    aggregate with map-side combine — mergeable, so the identical shape
    maintains cutoffs incrementally under a stream or across corpus
    shards). Only the n_bins-row histogram rides the driver (the
    kmeans/PCA sufficient-statistics discipline; the scored frame is
    persisted across the two passes and released); cutoff(p) = the upper
    edge of the first bin whose cumulative fraction reaches p —
    conservative by at most one bin width ((max-min)/n_bins) — and
    ``achieved_keep_frac`` reports the exact count-based rate at that
    edge, so the calibration error is visible in the output, never
    silent."""
    schema = ("keep_rate double, surprise_cutoff double, "
              "achieved_keep_frac double")
    ms = unigram_surprise(docs, text_col).select("mean_surprise").persist()
    lo, hi = ms.agg(F.min("mean_surprise"), F.max("mean_surprise")).first()
    if lo is None:  # empty corpus: an unattended calibrator must return
        ms.unpersist()  # the empty threshold table, not TypeError on hi-lo
        return docs.sparkSession.createDataFrame([], schema)
    span = (hi - lo) or 1.0
    b = F.least(
        F.floor((F.col("mean_surprise") - F.lit(lo)) / F.lit(span)
                * n_bins).cast("int"),
        F.lit(n_bins - 1),
    )
    hist = dict(
        (r.bin, r.c)
        for r in ms.groupBy(b.alias("bin")).agg(F.count("*").alias("c"))
        .collect()
    )
    ms.unpersist()
    total = sum(hist.values())
    rows, cum = [], 0
    edges = sorted(hist)
    for p in rates:
        cum = 0
        for bin_ in edges:
            cum += hist[bin_]
            frac = cum / total
            if frac >= p:
                rows.append((
                    float(p),
                    round(lo + (bin_ + 1) / n_bins * span, 4),
                    round(frac, 6),
                ))
                break
    return docs.sparkSession.createDataFrame(rows, schema)


def bigram_surprise(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc mean bigram surprise under an interpolated corpus bigram LM
    — the step up from ``unigram_surprise`` that catches word-salad whose
    unigram profile looks normal (every word common, no two of them ever
    adjacent in real text): p(w2|w1) = 0.75·c12/c1 + 0.25·c2/N, nll
    averaged per doc.

    Float discipline: the interpolated probability is the exact integer
    rational (3·c12·N + c2·c1) / (4·c1·N), so the score is
    ln(den) - ln(num) of two exact bigints (< 2^53 — IEEE-exact doubles
    in any engine) and the per-doc mean rounds to 6, the library's ln
    portability rule.

    Scale shape: two vocab-bounded aggregates (unigram + bigram counts,
    partial+final), the corpus total as a broadcast one-row aggregate,
    and score joins that AQE broadcast-converts from the aggregates' real
    shuffle sizes. The bigram stream is an in-row transform (narrow
    flatMap) — the corpus is scanned once for counts, once for
    scoring."""
    ws = F.split(F.col(text_col), " ")
    t = docs.select(F.explode(ws).alias("w"))
    uni = t.groupBy("w").agg(F.count("*").alias("c"))
    total = uni.agg(F.sum("c").alias("n"))
    bg = (
        docs.select("doc_id", ws.alias("ws"))
        .where(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(ws, 1, size(ws) - 1), "
                    "(x, i) -> concat(x, ' ', element_at(ws, i + 2)))"
                )
            ).alias("b"),
        )
    )
    big = bg.groupBy("b").agg(F.count("*").alias("c12"))
    scored = (
        bg.withColumn("w1", F.split("b", " ")[0])
        .withColumn("w2", F.split("b", " ")[1])
        .join(big, "b")
        .join(uni.selectExpr("w AS w1", "c AS c1"), "w1")
        .join(uni.selectExpr("w AS w2", "c AS c2"), "w2")
        .join(F.broadcast(total))
    )
    nll = F.log((4 * F.col("c1") * F.col("n")).cast("double")) - F.log(
        (3 * F.col("c12") * F.col("n") + F.col("c2") * F.col("c1"))
        .cast("double")
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.sum(nll) / F.count("*"), 6).alias("mean_surprise"),
    )


def duplicate_gram_fraction(docs: DataFrame, *, n: int = 3,
                            text_col: str = "text") -> DataFrame:
    """Cross-document duplicated-span measure (the span-level dedup signal
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): for each doc, the fraction of its word ``n``-gram positions
    whose n-gram also occurs in at least one OTHER document. Winnowing
    (winnow_fingerprints) samples fingerprints for pair detection; this is
    the exact per-position measure a span-cutting pass thresholds on —
    docs with high dup_gram_frac are mostly boilerplate recombinations
    even when no single pair-level near-dup exists.

    Cross-document is the point: a gram repeated only WITHIN one doc has
    doc-frequency 1 and does not count (within-doc repetition is
    repetition_features' job).

    Scale shape — no pairwise stage anywhere: one distinct + aggregate
    builds the gram -> doc-frequency frame (vocab-bounded after the
    distinct), and each gram position joins exactly ONE df row, so the
    equi-join on the gram key is linear in corpus positions; a hot
    boilerplate gram skews that key, which AQE skew-join splits (no df^2
    blowup — contrast the pair self-joins that need _WINNOW_MAX_DF).
    Per-doc rollup is a partial+final agg. Fractions are exact integer
    ratios rounded to 6."""
    from .dedup import _spread

    g = _spread(docs).select(
        "doc_id", F.explode(_word_grams(text_col, n)).alias("g")
    )
    # fold positions to per-(doc, gram) multiplicities FIRST: the df join
    # then touches the distinct frame, not every position — the position
    # stream is shuffled once (by (doc_id, g)) instead of twice
    dg = g.groupBy("doc_id", "g").agg(F.count("*").alias("k"))
    df = dg.groupBy("g").agg(F.count("*").alias("df"))
    dup = F.sum(F.when(F.col("df") >= 2, F.col("k")).otherwise(0))
    return (
        dg.join(df, "g")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_grams"),
            dup.alias("dup_grams"),
            F.round(dup.cast("double") / F.sum("k"), 6).alias("dup_gram_frac"),
            F.max("df").alias("max_gram_df"),
        )
    )


def dsir_logweights(docs: DataFrame, target: Column, *, buckets: int = 64,
                    text_col: str = "text") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document
    by how much more likely its tokens are under the TARGET distribution
    (the rows where ``target`` is true — e.g. a trusted high-quality
    subset) than under the raw corpus distribution, using hashed-unigram
    bag-of-words LMs: log w(doc) = sum_tokens ln p_target(b(w)) / p_raw(b(w)),
    with md5-derived hash buckets and add-1 smoothing. Resampling the
    corpus proportional to exp(log w) yields target-resembling data —
    the principled upgrade over hard rule filters.

    Float discipline: with add-1 smoothing each per-bucket term is
    ln((ct+1)·(Nr+B)) − ln((cr+1)·(Nt+B)) where each FACTOR is cast to
    double before the multiply — every count is exactly representable
    (< 2^53) and IEEE double multiplication is correctly rounded, so the
    product (and its ln) is engine-identical at any corpus size, with no
    int64 overflow; the per-doc sum re-aggregates per-bucket integer
    counts times a per-bucket double, and the result rounds to 6.

    Scale shape: token -> bucket is a narrow in-row map; the two LMs are
    ONE partial+final aggregate each over a ``buckets``-sized key space;
    the stats frame is exactly ``buckets`` rows — a literal broadcast, not
    a data-scaled one — so scoring is a broadcast join against the
    per-(doc, bucket) counts followed by a per-doc rollup. Two corpus
    scans total, no wide shuffle beyond the doc_id rollup."""
    from .dedup import _spread

    b = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint")
        % buckets
    )
    # _spread: the md5-per-token map side otherwise runs on however few
    # partitions the (byte-small) text scan produced — measured 4.9x on a
    # 10x corpus from one input file, 1.3x spread
    tb = (
        _spread(docs).select("doc_id", target.alias("_t"),
                             F.explode(_tok(text_col)).alias("w"))
        .select("doc_id", "_t", b.alias("b"))
        .groupBy("doc_id", "_t", "b")
        .agg(F.count("*").alias("k"))
    )
    stats = (
        tb.groupBy("b")
        .agg(
            F.sum("k").alias("cr"),
            F.sum(F.when(F.col("_t"), F.col("k")).otherwise(0)).alias("ct"),
        )
    )
    totals = stats.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    # each factor casts to double BEFORE the multiply: the int64 product
    # would overflow around nr ~ 10^10 x ct ~ 10^9, while a double*double
    # product of two exactly-representable counts is correctly rounded
    # and engine-identical (IEEE multiplication is deterministic)
    term = F.log(
        (F.col("ct") + 1).cast("double") * (F.col("nr") + buckets).cast("double")
    ) - F.log(
        (F.col("cr") + 1).cast("double") * (F.col("nt") + buckets).cast("double")
    )
    # stats is exactly `buckets` rows by construction — a legitimate
    # explicit broadcast (fixed-size, not data-scaled)
    lm = F.broadcast(stats.crossJoin(F.broadcast(totals)).select("b", term.alias("lr")))
    return (
        tb.join(lm, "b")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tokens"),
            F.round(F.sum(F.col("k") * F.col("lr")), 6).alias("dsir_logweight"),
        )
    )


def corpus_card(docs: DataFrame, *, text_col: str = "text",
                nchars_col: str = "n_chars",
                lang_col: str = "lang") -> DataFrame:
    """The corpus datasheet — the one-stop (metric, value) report a data
    owner publishes with a release: document and size totals, exact-dup
    rate, mean quality score, median length, and the per-language doc
    mix. Everything a mixture designer reads before touching per-doc
    operators.

    Scale shape: ONE wide aggregate over the corpus (count, sums, the
    md5-distinct dup rate, the quality-feature means, and the length
    percentile — a single partial+final pass; the exact distinct adds
    the standard Expand doubling, same documented trade as data_profile)
    plus one lang-keyed aggregate, unioned into a fixed-size frame.
    Values round to 6; metrics are strings so the frame stays two
    columns at any corpus size."""
    n_words = F.size(_tok(text_col))
    n_stop = F.size(F.filter(_tok(text_col), lambda x: x.isin(*STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_words.cast("double")
    qscore = (
        F.when(n_words >= 20, F.lit(1)).otherwise(0)
        + F.when(stop_ratio <= 0.2, F.lit(1)).otherwise(0)
    )
    wide = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum(nchars_col).cast("double").alias("total_chars"),
        F.sum(n_words).cast("double").alias("total_ws_tokens"),
        F.countDistinct(F.md5(F.col(text_col))).cast("double")
        .alias("distinct_texts"),
        F.round(F.avg(qscore), 6).alias("avg_quality_score"),
        F.expr(f"percentile({nchars_col}, 0.5)").alias("median_chars"),
    ).select(
        F.expr(
            "stack(6, 'n_docs', n_docs, 'total_chars', total_chars, "
            "'total_ws_tokens', total_ws_tokens, "
            "'exact_dup_rate', round(1.0 - distinct_texts / n_docs, 6), "
            "'avg_quality_score', avg_quality_score, "
            "'median_chars', median_chars) AS (metric, value)"
        )
    )
    langs = docs.groupBy(lang_col).agg(F.count("*").alias("c")).select(
        F.concat(F.lit("docs_lang_"), F.col(lang_col)).alias("metric"),
        F.col("c").cast("double").alias("value"),
    )
    return wide.unionByName(langs)


def dsir_sample(docs: DataFrame, target: Column, k: int, *,
                buckets: int = 64, text_col: str = "text",
                salt: str = "gumbel:") -> DataFrame:
    """The EXECUTION step of DSIR — importance resampling itself, not just
    the weights: draw ``k`` documents without replacement with probability
    proportional to exp(dsir_logweight) via the Gumbel-top-k identity
    (argmax of logweight + Gumbel noise ~ weighted sampling without
    replacement). The noise is DETERMINISTIC — u = (md5-hash(doc_id)+1) /
    (2^32+1) in (0,1), g = -ln(-ln(u)) — so the drawn sample is
    reproducible on any engine and stable across reruns, the same
    hash-not-rng discipline as stratified_sample/train_test_split.

    Float rule: the Gumbel term and the final key both round to 6 (ln is
    portable only under rounding), the rank cut is on the ROUNDED key
    with doc_id tie-break, and the plan is TakeOrdered (top-k heap, no
    global sort) — at 10^9 docs the sample costs the weight scan plus a
    k-sized ordered collect."""
    w = dsir_logweights(docs, target, buckets=buckets, text_col=text_col)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        + 1
    ) / F.lit(float((1 << 32) + 1))
    g = F.round(-F.log(-F.log(u)), 6)
    return (
        w.withColumn("skey", F.round(F.col("dsir_logweight") + g, 6))
        .orderBy(F.desc("skey"), F.asc("doc_id"))
        .limit(k)
    )


def remove_duplicate_spans(docs: DataFrame, *, n: int = 3, min_df: int = 2,
                           text_col: str = "text") -> DataFrame:
    """The span-CUTTING pass that ``duplicate_gram_fraction`` measures for
    (Lee et al.'s ExactSubstr dedup, word-gram granularity): rewrite every
    document with the words covered by any cross-document duplicated
    ``n``-gram removed — a word survives iff no n-gram window containing
    it occurs in ``min_df``-or-more distinct documents. Returns all input
    docs with (n_words, n_removed, clean_text); a fully-duplicated doc
    comes back with clean_text = ''.

    Scale shape: same linear skeleton as duplicate_gram_fraction — gram
    df via distinct+aggregate, duplicated STARTS found by one equi-join
    (each position joins one df row), collect_set folds them to a per-doc
    start list (bounded by doc length, rows stay doc-sized), and the
    cut itself is in-row array math (positions minus covered windows) —
    no shuffle carries text except the final doc-keyed join of start
    lists back onto the corpus. The in-row membership test is
    O(words x dup_starts) per doc; a production variant for
    pathological docs sorts spans and merges intervals, same output."""
    from .dedup import _spread

    base = _spread(docs)
    g = (
        base.select(
            "doc_id", F.posexplode(_word_grams(text_col, n)).alias("s0", "g")
        )
        .select("doc_id", (F.col("s0") + 1).alias("s"), "g")
    )
    df = (
        g.select("doc_id", "g").distinct()
        .groupBy("g").agg(F.count("*").alias("df"))
    )
    dup_starts = (
        g.join(df.where(F.col("df") >= min_df), "g")
        .groupBy("doc_id")
        .agg(F.collect_set("s").alias("_ss"))
    )
    out = (
        base.join(dup_starts, "doc_id", "left")
        .withColumn("_ss", F.coalesce(F.col("_ss"),
                                      F.array().cast("array<int>")))
        .withColumn("_ws", F.split(F.col(text_col), " "))
        .withColumn(
            "_cov",
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.col("_ss"),
                        lambda s: F.sequence(s, s + F.lit(n - 1)),
                    )
                )
            ),
        )
        .withColumn(
            "_keep",
            F.expr("filter(sequence(1, size(_ws)), "
                   "p -> NOT array_contains(_cov, p))"),
        )
    )
    return out.select(
        "doc_id",
        F.size("_ws").alias("n_words"),
        (F.size("_ws") - F.size("_keep")).alias("n_removed"),
        F.concat_ws(
            " ", F.transform(F.col("_keep"),
                             lambda p: F.element_at(F.col("_ws"), p))
        ).alias("clean_text"),
    )


def _bpe_learn(docs: DataFrame, rounds: int, text_col: str,
               *, need_segmentation: bool = True):
    """Shared BPE training loop: returns (merge list, final vocab frame
    (w, freq, syms) segmented under all learned merges, or None).

    Persist discipline (the kmeans_refine class, made uniform in r5):
    every intermediate persist is released before return. With
    ``need_segmentation=False`` (bpe_merge_table: only the merge list is
    read) the LAST round's re-segmentation fold is skipped entirely —
    it's write-only — and everything is unpersisted, so a long-lived
    driver session accumulates nothing. With ``need_segmentation=True``
    (bpe_token_counts) exactly ONE frame — the returned final
    segmentation — remains persisted, because the caller's lazy plan
    reads it; the caller owns its lifetime (clearCache / unpersist after
    materializing)."""
    vocab = (
        docs.select(F.explode(_tok(text_col)).alias("w"))
        .groupBy("w").agg(F.count("*").alias("freq"))
        .withColumn(
            "syms",
            F.concat_ws(
                " ", F.filter(F.split("w", ""), lambda c: c != F.lit(""))
            ),
        )
        .persist()  # every round re-reads it; tiny (vocab-sized)
    )
    merges = []
    cur = vocab
    # cur's predecessor: its cache may only be released once cur has
    # actually MATERIALIZED (the next argmax does that) — unpersisting
    # it earlier makes cur's first computation re-run the whole chain
    parent = None
    for rnd in range(1, rounds + 1):
        sy = F.split("syms", " ")
        pairs = cur.where(F.size(sy) >= 2).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(slice(split(syms, ' '), 1, "
                    "size(split(syms, ' ')) - 1), "
                    "(x, i) -> struct(x AS l, "
                    "element_at(split(syms, ' '), i + 2) AS r))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        # that argmax just materialized cur's cache as a side effect —
        # cur's predecessor is now truly unreferenced
        if parent is not None and parent is not vocab:
            parent.unpersist()
        parent = None
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        m = l + r
        merges.append((rnd, l, r, m, cnt))
        if not need_segmentation and rnd == rounds:
            # the final merge's re-segmentation is never read when the
            # caller only wants the merge table — skip the vocab-wide fold
            break

        # nested factory, NOT default-arg lambdas: F.aggregate inspects
        # the callable's arity, and default args would make it 5-ary
        # (the bm25 round-3 bug class — see ROADMAP gotchas)
        def make_folder(l: str, r: str, m: str):
            def folder(acc, x):
                cond = ((acc == F.lit(l)) | acc.endswith(" " + l)) & (
                    x == F.lit(r)
                )
                return (
                    F.when(cond, F.concat(
                        F.substr(acc, F.lit(1),
                                 F.length(acc) - F.lit(len(l))),
                        F.lit(m)))
                    .when(acc == F.lit(""), x)
                    .otherwise(F.concat(acc, F.lit(" "), x))
                )
            return folder

        # persist each round's re-segmentation LAZILY: the next round's
        # argmax populates the cache while computing its pair counts, so
        # each fold still executes exactly once (O(rounds) total) with
        # ZERO extra jobs. An eager count() barrier here is a measured
        # net loss at small `rounds` (the r9 bench regression: 4
        # blocking jobs + cache writes on a vocab-bounded frame cost
        # more than they saved); the O(rounds^2) recompute it guarded
        # against is instead prevented by DEFERRING the predecessor's
        # unpersist until after this frame materializes (above).
        nxt = cur.withColumn(
            "syms",
            F.aggregate(F.split("syms", " "), F.lit(""), make_folder(l, r, m)),
        ).persist()
        parent = cur
        cur = nxt
    if not need_segmentation:
        if cur is not vocab:
            cur.unpersist()
        vocab.unpersist()
        return merges, None
    if cur is not vocab:
        # one eager materialization TOTAL (not per round) so the
        # caller's lazy reads hit cache, then release everything else —
        # the returned frame is the only persist left behind
        cur.count()
        if parent is not None and parent is not vocab:
            parent.unpersist()
        vocab.unpersist()
    return merges, cur


def bpe_merge_table(docs: DataFrame, *, rounds: int = 4,
                    text_col: str = "text") -> DataFrame:
    """Byte-pair-encoding merge-table training (Sennrich et al. 2016 —
    the tokenizer-training step of an LLM data pipeline) as an iterative
    dataflow: start from characters, then ``rounds`` times (1) count
    adjacent symbol pairs across the corpus weighted by word frequency,
    (2) take the argmax pair (count desc, then lexicographic — a total
    order, so engine-exact), (3) re-segment every word by greedily
    merging that pair left-to-right. Returns the learned merge table
    (round, lhs, rhs, merged, cnt) — the artifact a tokenizer ships.

    Scale shape — the kmeans_refine/logreg iterative discipline: the
    corpus is scanned ONCE to build the (word, freq) vocabulary; every
    round then works on the vocab-bounded frame (pair explode ->
    partial+final count -> a ONE-ROW argmax collect; only that row rides
    the driver and re-enters as literals), and the re-segmentation is an
    in-row string fold (no shuffle). At 10^12 tokens the vocabulary is
    ~10^8 rows — per-round cost is vocab-, not corpus-, proportional.
    The greedy left-to-right fold handles overlapping occurrences
    ('a a a' under merge (a,a) -> ['aa','a']) identically on any engine.

    Leaves NO persisted frames behind (need_segmentation=False: the last
    round's fold is skipped — write-only — and every intermediate is
    unpersisted before return)."""
    merges, _cur = _bpe_learn(docs, rounds, text_col,
                              need_segmentation=False)
    return docs.sparkSession.createDataFrame(
        merges, "round int, lhs string, rhs string, merged string, cnt long"
    )


def bpe_token_counts(docs: DataFrame, *, rounds: int = 4,
                     text_col: str = "text") -> DataFrame:
    """Tokenize the corpus with the tokenizer it just trained: learn the
    ``rounds``-merge BPE table (``bpe_merge_table``'s loop), then count
    each document's BPE tokens under it — the 'how many tokens is my
    corpus REALLY' measurement that budgets training runs (whitespace
    counts mislead by 1.3-2x; this is the number the merge table
    actually yields).

    The application is vocab-bounded, NOT corpus-bounded: the learned
    segmentation already lives on the (word, freq, syms) vocabulary
    frame, so per-word BPE lengths are one in-row size() over the vocab,
    and the corpus just equi-joins word -> length (AQE broadcasts the
    vocab-derived side when it fits) and sums per doc. The expensive
    folds never touch the corpus rows.

    Exactly ONE frame (the final vocab segmentation the returned lazy
    plan joins against) remains persisted; the caller owns its lifetime
    (unpersist / clearCache after materializing the result)."""
    _merges, cur = _bpe_learn(docs, rounds, text_col)
    wlen = cur.select(
        "w", F.size(F.split("syms", " ")).alias("_tl")
    )
    t = docs.select("doc_id", F.explode(_tok(text_col)).alias("w"))
    return (
        t.join(wlen, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("_tl").alias("n_bpe_tokens"),
        )
    )


def quality_drift(docs: DataFrame, *, ts_col: str = "ts",
                  window: str = "1 hour", text_col: str = "text",
                  watermark: str | None = None) -> DataFrame:
    """Windowed curation telemetry: per event-time window, arrival volume
    and the quality gate's aggregate signals — the chart a streaming
    ingest deployment watches to catch a quality regression in the
    firehose (a source turning to boilerplate moves avg_quality /
    low_quality_frac within one window of arrival, long before a batch
    re-audit would).

    The quality score is the SAME expression the gate uses
    (quality_features), so the monitor moves exactly when the gate's
    keep-rate does. Pure column exprs + one windowed aggregate: runs
    identically under readStream (pass ``watermark`` for state eviction;
    append mode emits each closed window exactly once) and in batch,
    where the rollup is oracle-checkable. State is #open-windows-sized —
    arrival-rate independent."""
    n_words = F.size(_tok(text_col))
    n_stop = F.size(F.filter(_tok(text_col), lambda x: x.isin(*STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_words.cast("double")
    score = (
        F.when(n_words >= 20, F.lit(1)).otherwise(0)
        + F.when(stop_ratio <= 0.2, F.lit(1)).otherwise(0)
    )
    src = docs
    if watermark:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.select(F.col(ts_col), score.alias("_q"))
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("_q"), 6).alias("avg_quality"),
            F.round(F.avg((F.col("_q") < 2).cast("double")), 6)
            .alias("low_quality_frac"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_docs", "avg_quality", "low_quality_frac",
        )
    )


def corpus_diff(old: DataFrame, new: DataFrame,
                text_col: str = "text") -> DataFrame:
    """Snapshot diff between two corpus versions — the dataset-versioning
    report a release pipeline prints before shipping v(N+1): per-doc
    status from the normalized content fingerprint (``fingerprint`` —
    whitespace-collapsed, lowercased md5, so cosmetic edits don't count
    as changes), rolled up to (status, n_docs) over {added, removed,
    changed, unchanged}.

    Scale shape: two narrow fingerprint passes + ONE full-outer join on
    doc_id (co-partitioned for free when both snapshots are bucketed on
    doc_id, the persisted-corpus layout) + a 4-row aggregate. Nothing is
    quadratic, nothing carries text past the md5."""
    o = fingerprint(old, text_col).select("doc_id", F.col("fp").alias("_fo"))
    n = fingerprint(new, text_col).select("doc_id", F.col("fp").alias("_fn"))
    status = (
        F.when(F.col("_fo").isNull(), F.lit("added"))
        .when(F.col("_fn").isNull(), F.lit("removed"))
        .when(F.col("_fo") == F.col("_fn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        o.join(n, "doc_id", "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n_docs"))
    )


def source_diversity(docs: DataFrame, *, n: int = 3,
                     text_col: str = "text", by: str = "source") -> DataFrame:
    """Lexical-diversity report per source: type-token ratio over words
    and the duplicated word-``n``-gram ratio — the distinct-n style
    diversity check that catches template farms and boilerplate-heavy
    domains (near-zero TTR / high dup-gram mass) before they flood a
    mixture, complementing the per-document repetition_features (which
    can't see repetition ACROSS documents of one source).

    Scale shape: two narrow explodes (words, in-row n-grams) each into a
    partial+final aggregate keyed by source; the exact distincts carry
    the documented Expand doubling (as in data_profile / corpus_card —
    swap in approx_count_distinct at the 10^12-token scale where a ±2%
    TTR is fine); the final join is #sources rows. Sources whose docs
    are all shorter than ``n`` words report zero grams and a null
    dup-gram ratio."""
    words = docs.select(F.col(by), F.explode(_tok(text_col)).alias("w"))
    grams = docs.select(
        F.col(by), F.explode(_word_grams(text_col, n)).alias("g")
    )
    dagg = docs.groupBy(by).agg(F.count("*").alias("n_docs"))
    wagg = words.groupBy(by).agg(
        F.count("*").alias("n_words"),
        F.countDistinct("w").alias("distinct_words"),
    )
    gagg = grams.groupBy(by).agg(
        F.count("*").alias("n_grams"),
        F.countDistinct("g").alias("distinct_grams"),
    )
    return (
        dagg.join(wagg, by).join(gagg, by, "left")
        .select(
            by, "n_docs", "n_words", "distinct_words",
            F.round(
                F.col("distinct_words").cast("double") / F.col("n_words"), 6
            ).alias("ttr"),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("distinct_grams"), F.lit(0))
            .alias("distinct_grams"),
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    1.0 - F.col("distinct_grams").cast("double")
                    / F.col("n_grams"),
                ), 6,
            ).alias("dup_gram_ratio"),
        )
    )


def bpe_source_fit(docs: DataFrame, *, rounds: int = 4,
                   text_col: str = "text", by: str = "source") -> DataFrame:
    """Per-source tokenizer-fit report under the just-learned merge
    table: fertility (BPE tokens per word) and compression (chars per
    BPE token) for every source — the per-domain suitability check a
    tokenizer ships with (a domain whose fertility is far above the
    corpus mean is being shredded into characters: its text was
    underrepresented when the merges were learned, and its training
    cost per word will be proportionally higher).

    Same vocab-bounded application shape as bpe_token_counts: the
    learned segmentation lives on the (word, freq, syms) vocabulary
    frame, per-word BPE lengths are one in-row size(), and the corpus
    equi-joins word -> length and aggregates per source — a handful of
    output rows however big the corpus. One frame (the final vocab
    segmentation) remains persisted; the caller owns its lifetime."""
    _merges, cur = _bpe_learn(docs, rounds, text_col)
    wlen = cur.select("w", F.size(F.split("syms", " ")).alias("_tl"))
    t = docs.select(by, F.explode(_tok(text_col)).alias("w"))
    return (
        t.join(wlen, "w")
        .groupBy(by)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("_tl").alias("n_bpe_tokens"),
            F.sum(F.length("w")).alias("_nc"),
        )
        .select(
            by, "n_words", "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens").cast("double") / F.col("n_words"), 6
            ).alias("bpe_per_word"),
            F.round(
                F.col("_nc").cast("double") / F.col("n_bpe_tokens"), 6
            ).alias("chars_per_bpe_token"),
        )
    )


def cdc_chunks(docs: DataFrame, *, window: int = 8, divisor: int = 64,
               text_col: str = "text",
               carry: tuple[str, ...] = ()) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/FastCDC family): slide a
    ``window``-char polynomial hash over the text and cut a chunk boundary
    wherever ``hash % divisor == 0``. Unlike fixed-stride chunking, an
    insertion early in a document shifts only the ONE chunk it lands in —
    every later boundary re-synchronizes on content — which is what makes
    chunk-hash dedup robust to edits (expected chunk length = divisor).

    The window hash is the first 8 hex chars of md5 of the window text —
    uniform mod any divisor and portable (a polynomial char hash is NOT:
    e.g. 31^2 = 1 mod 64, so base-31 mod a power of two collapses to a
    2-term character sum that finds no boundaries in ordinary prose).

    Fully in-row after an explicit spread: boundary scan -> starts array ->
    per-chunk explode, a narrow O(n*window) flatMap with no shuffle; output
    is (doc_id, chunk_idx, chunk_start, chunk_len, chunk_md5) where
    chunk_md5 is the dedup key downstream consumers hash-group on.

    ``carry`` names extra input columns to thread through to the output
    unchanged (e.g. the event-time column a STREAMING consumer's
    watermark rides on — the operator itself is stateless narrow
    expressions, so it runs on a stream exactly as written)."""
    wh = (
        f"CAST(conv(substring(md5(substring({text_col}, i, {window})), 1, 8), "
        f"16, 10) AS BIGINT)"
    )
    cuts = (
        f"transform(filter("
        f"CASE WHEN length({text_col}) >= {window} "
        f"THEN sequence(1, length({text_col}) - {window - 1}) "
        f"ELSE array() END, "
        f"i -> {wh} % {divisor} = 0), i -> CAST(i + {window} AS INT))"
    )
    starts = (
        f"array_sort(array_distinct(concat(array(1), "
        f"filter({cuts}, s -> s <= length({text_col})))))"
    )
    # starts MUST materialize as a named column before the per-chunk pass —
    # referenced inline it would re-run the whole boundary scan for every
    # chunk (the same O(n^2) trap as winnow_fingerprints' hash array)
    from .dedup import _spread

    based = _spread(docs.where(F.length(F.col(text_col)) >= 1)).select(
        "doc_id", *carry,
        F.col(text_col).alias("_t"), F.expr(starts).alias("_S"),
    )
    chunk = F.expr(
        "transform(sequence(1, size(_S)), ix -> struct("
        "CAST(ix - 1 AS INT) AS chunk_idx, "
        "element_at(_S, ix) AS chunk_start, "
        "CAST(coalesce(try_element_at(_S, ix + 1), length(_t) + 1) "
        "- element_at(_S, ix) AS INT) AS chunk_len))"
    )
    return (
        based.select("doc_id", *carry, "_t", F.explode(chunk).alias("c"))
        .select(
            "doc_id",
            *carry,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_start").alias("chunk_start"),
            F.col("c.chunk_len").alias("chunk_len"),
            F.md5(
                F.expr("substring(_t, c.chunk_start, c.chunk_len)")
            ).alias("chunk_md5"),
        )
    )


def chunk_text(docs: DataFrame, *, chunk_tokens: int = 64, stride: int = 48,
               text_col: str = "text") -> DataFrame:
    """Split each doc into overlapping token-window chunks (size
    ``chunk_tokens``, step ``stride``) — the context-window chunker that
    turns long documents into trainable/embeddable units, with
    ``chunk_tokens - stride`` tokens of overlap so no boundary context is
    lost.

    Fully declarative: an in-row ``sequence`` of chunk starts, ``slice`` +
    ``concat_ws`` per chunk, one ``explode`` — a narrow flatMap, no
    Python, no shuffle; the expensive part (the explode fan-out) is
    exactly the output size. Emits (doc_id, chunk_idx, chunk_start,
    n_chunk_tokens, chunk_text). Every doc yields >= 1 chunk (a short doc
    is its own chunk); the final chunk is the remainder, never dropped."""
    ws = _tok(text_col)
    n = F.size(ws)
    # chunk starts: 1, 1+stride, ... while start <= n (so the tail tokens
    # always land in a final, possibly short, chunk)
    n_chunks = F.when(
        n <= chunk_tokens, F.lit(1)
    ).otherwise(
        F.ceil((n - chunk_tokens).cast("double") / stride).cast("int") + 1
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride + 1
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            s.alias("chunk_start"),
            F.slice(ws, s, chunk_tokens).alias("_toks"),
        ),
    )
    return (
        docs.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx"),
            F.col("c.chunk_start"),
            F.size("c._toks").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.col("c._toks")).alias("chunk_text"),
        )
    )


def source_token_mix(docs: DataFrame, text_col: str = "text",
                     budget_tokens: int = 1_000_000) -> DataFrame:
    """Per-source corpus mix accounting: docs, whitespace tokens, share of
    the corpus, and the epoch count needed to fill ``budget_tokens`` from
    that source alone — the bookkeeping behind training-data mixture
    weights.

    The corpus total joins back as a broadcast single-row aggregate (NOT a
    global window, which would funnel all sources through one task)."""
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_tok(text_col))).alias("tokens"),
    )
    total = per.agg(F.sum("tokens").alias("_total"))
    return (
        per.join(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.round(F.col("tokens").cast("double") / F.col("_total"), 6).alias("token_share"),
            F.ceil(F.lit(float(budget_tokens)) / F.col("tokens")).cast("int").alias("epochs_for_budget"),
        )
    )


def gopher_quality_flags(docs: DataFrame, *, text_col: str = "text",
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         max_symbol_ratio: float = 0.1,
                         max_bullet_line_frac: float = 0.9,
                         max_ellipsis_line_frac: float = 0.3,
                         min_alpha_word_frac: float = 0.8,
                         min_req_stopwords: int = 2) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021, §A1.1 'quality
    filtering') as one narrow per-document pass — the canonical
    heuristic gate every web-scale text pipeline applies before model
    training, complementing :func:`quality_features`' generic
    length/stopword scores with the published rule set and thresholds:

    - word count within [min_words, max_words];
    - mean word length within [3, 10] chars;
    - '#' and '...' symbol-to-word ratios ≤ 0.1 each;
    - < 90% of lines starting with a bullet, < 30% ending in an
      ellipsis;
    - ≥ 80% of words containing at least one alphabetic character;
    - ≥ 2 distinct words from the required-stopword set (the, be, to,
      of, and, that, have, with).

    Output per doc: the raw metrics (ratios rounded to 6 BEFORE the
    flag comparisons so verdicts are engine-exact), one boolean per
    rule, and ``keep`` = their conjunction. An empty document splits to
    one empty token under the corpus-wide ``_tok`` semantics (n_words
    is never 0 for non-null text), so ratios come out 0 and the
    word-count rule rejects it; the n_words > 0 guards only protect a
    null text column.

    Everything is split/filter/aggregate higher-order functions on two
    in-row arrays (words, lines) — pure codegen, no shuffle, no UDF;
    the scan prunes to (doc_id, text), so gating 10^12 docs is one
    narrow pass whose output filters push into downstream scans."""
    REQ = ("the", "be", "to", "of", "and", "that", "have", "with")
    ws = _tok(text_col)
    n_words = F.size(ws)
    sum_len = F.aggregate(
        ws, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_wl = F.when(
        n_words > 0,
        F.round(sum_len.cast("double") / n_words, 6))
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(
        n_words > 0, F.round(n_alpha.cast("double") / n_words, 6))
    t = F.col(text_col)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = (F.length(t)
             - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    hash_ratio = F.when(
        n_words > 0, F.round(n_hash.cast("double") / n_words, 6))
    ell_ratio = F.when(
        n_words > 0, F.round(n_ell.cast("double") / n_words, 6))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike("^[ \\t]*[-*\u2022]")))
        .cast("double") / n_lines, 6)
    ell_line_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike("\\.\\.\\.[ \\t]*$")))
        .cast("double") / n_lines, 6)
    n_req = F.size(F.array_intersect(
        F.array_distinct(ws), F.array(*[F.lit(w) for w in REQ])))
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        hash_ratio.alias("hash_ratio"),
        ell_ratio.alias("ellipsis_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ell_line_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_req.cast("int").alias("n_req_stopwords"),
    )
    f_words = (F.col("n_words") >= min_words) \
        & (F.col("n_words") <= max_words)
    f_wl = (F.col("mean_word_len") >= min_mean_word_len) \
        & (F.col("mean_word_len") <= max_mean_word_len)
    f_sym = (F.col("hash_ratio") <= max_symbol_ratio) \
        & (F.col("ellipsis_ratio") <= max_symbol_ratio)
    f_bullet = F.col("bullet_line_frac") < max_bullet_line_frac
    f_ell = F.col("ellipsis_line_frac") < max_ellipsis_line_frac
    f_alpha = F.col("alpha_word_frac") >= min_alpha_word_frac
    f_stop = F.col("n_req_stopwords") >= min_req_stopwords
    flags = {
        "word_count_ok": f_words, "mean_word_len_ok": f_wl,
        "symbol_ratio_ok": f_sym, "bullet_lines_ok": f_bullet,
        "ellipsis_lines_ok": f_ell, "alpha_words_ok": f_alpha,
        "stopwords_ok": f_stop,
    }
    keep = None
    cols = [out[c] for c in out.columns]
    for name, expr in flags.items():
        e = F.coalesce(expr, F.lit(False))
        cols.append(e.alias(name))
        keep = e if keep is None else (keep & e)
    cols.append(keep.alias("keep"))
    return out.select(*cols)


def c4_quality_flags(docs: DataFrame, *, text_col: str = "text",
                     min_line_words: int = 5,
                     min_sentences: int = 3) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020, §2.2) — the other
    canonical published filter set beside :func:`gopher_quality_flags`,
    and the LINE-level half the Gopher rules don't do: lines survive
    only if they end in terminal punctuation ([.!?] — the closing-quote
    variant is deliberately out of this regex subset), carry at least
    ``min_line_words`` words, and don't mention javascript
    (case-insensitive); pages drop wholesale when they contain
    'lorem ipsum' (template residue) or '{' (code), or when the CLEANED
    text has fewer than ``min_sentences`` sentences (terminal-
    punctuation count over kept lines).

    Output per doc: ``text_clean`` (kept lines re-joined — the column a
    training pipeline actually consumes), line/sentence counts, one
    boolean per page rule, and ``keep`` = their conjunction. A page
    whose every line is dropped has empty text_clean and fails the
    sentence rule — never an error.

    One in-row filter over the line array + plain contains checks —
    codegen, no shuffle, no UDF; scan pruned to (doc_id, text). The
    3-sentence-span dedup C4 pairs with this is the separately
    registered winnowing/span-dedup family."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike("[.!?]$")
        & (F.size(F.split(l, " ")) >= min_line_words)
        & ~F.lower(l).contains("javascript"),
    )
    tc = F.array_join(kept, "\n")

    def _n(c: Column, ch: str) -> Column:
        return F.length(c) - F.length(F.replace(c, F.lit(ch), F.lit("")))

    n_sent = _n(tc, ".") + _n(tc, "!") + _n(tc, "?")
    out = docs.select(
        "doc_id",
        tc.alias("text_clean"),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_lines_kept"),
        n_sent.cast("int").alias("n_sentences"),
        (~F.lower(t).contains("lorem ipsum")).alias("no_lorem"),
        (~t.contains("{")).alias("no_brace"),
    )
    ok_sent = F.col("n_sentences") >= min_sentences
    keep = (F.col("no_lorem") & F.col("no_brace") & ok_sent)
    return out.select(
        "*",
        ok_sent.alias("min_sentences_ok"),
        keep.alias("keep"),
    )


def code_quality_flags(docs: DataFrame, *, text_col: str = "text",
                       max_line_len: int = 1000,
                       max_mean_line_len: float = 100.0,
                       min_alnum_frac: float = 0.25) -> DataFrame:
    """The Stack / SantaCoder code-file filtering rules (Kocetkov et
    al. 2022 §3; Allal et al. 2023 §2 'filtering') — the third
    canonical published gate beside :func:`gopher_quality_flags`
    (prose) and :func:`c4_quality_flags` (lines), and the one a
    CODE-data pipeline applies: the rules key on line geometry and
    character classes rather than words, because minified bundles,
    base64 blobs, and generated XML defeat word-level heuristics.

    - longest line ≤ ``max_line_len`` chars (minified/one-line files);
    - mean line length ≤ ``max_mean_line_len`` (generated/packed
      files);
    - alphanumeric characters ≥ ``min_alnum_frac`` of all characters
      (binary-ish / symbol-soup content; an EMPTY file has no
      alphanumeric evidence and is dropped by this rule);
    - no ``<?xml version=`` in the first 100 characters (the
      published XML-header proxy for generated data files).

    Output per doc: the raw metrics (mean/frac rounded to 6 BEFORE
    comparison — engine-exact verdicts), one boolean per rule, and
    ``keep`` = their conjunction. The HTML visible-text rule from the
    same papers needs a DOM render and is deliberately out of scope
    here — :func:`html_to_text`'s rule chain is the repo's HTML path.

    One narrow in-row pass over the line array + two character scans —
    split/transform/aggregate HOFs, pure codegen, no shuffle, no UDF;
    the scan prunes to (doc_id, text)."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    lens = F.transform(lines, lambda l: F.length(l))
    n_lines = F.size(lines)
    max_ll = F.array_max(lens)
    mean_ll = F.round(
        F.aggregate(lens, F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).cast("double") / n_lines, 6)
    n_chars = F.length(t)
    n_alnum = F.length(F.regexp_replace(t, "[^A-Za-z0-9]", ""))
    alnum_frac = F.when(
        n_chars > 0, F.round(n_alnum.cast("double") / n_chars, 6))
    xml_header = F.substring(t, 1, 100).contains("<?xml version=")
    out = docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        max_ll.alias("max_line_len"),
        mean_ll.alias("mean_line_len"),
        alnum_frac.alias("alnum_frac"),
        xml_header.alias("xml_header"),
    )
    flags = {
        "line_max_ok": F.col("max_line_len") <= max_line_len,
        "line_mean_ok": F.col("mean_line_len") <= max_mean_line_len,
        "alnum_ok": F.col("alnum_frac") >= min_alnum_frac,
        "not_xml_ok": ~F.col("xml_header"),
    }
    cols = [out[c] for c in out.columns]
    keep = None
    for name, expr in flags.items():
        e = F.coalesce(expr, F.lit(False))
        cols.append(e.alias(name))
        keep = e if keep is None else (keep & e)
    cols.append(keep.alias("keep"))
    return out.select(*cols)


def license_detect(docs: DataFrame, *, text_col: str = "text",
                   head_chars: int = 2000) -> DataFrame:
    """Keyword license detection over a file's HEAD — the other
    published filter dimension of The Stack's code pipeline (Kocetkov
    et al. 2022 §3 keeps permissive-licensed files): classify the
    first ``head_chars`` characters against the canonical license
    header phrases and flag whether the verdict is permissive. This is
    deliberately the keyword SUBSET of a full detector (ScanCode-class
    matching is a corpus of its own): unmatched or ambiguous headers
    read ``unknown``/non-permissive — the safe direction, a file is
    never ADMITTED by a parsing gap.

    Match order is specificity-first and pinned by construction:
    ``lgpl`` before ``gpl`` (the LGPL header CONTAINS 'general public
    license'), phrase matches over bare acronyms. Detected classes:
    mit, apache-2.0, lgpl, gpl, bsd, mpl-2.0; ``permissive`` = mit /
    apache-2.0 / bsd.

    One in-row lower+substring+contains chain — codegen, no shuffle,
    no UDF; the scan prunes to (doc_id, text)."""
    h = F.lower(F.substring(F.col(text_col), 1, int(head_chars)))

    def has(phrase: str) -> Column:
        return h.contains(phrase)

    license_ = (
        F.when(has("gnu lesser general public license"), F.lit("lgpl"))
        .when(has("gnu general public license"), F.lit("gpl"))
        .when(has("apache license"), F.lit("apache-2.0"))
        .when(has("permission is hereby granted, free of charge"),
              F.lit("mit"))
        .when(has("mit license"), F.lit("mit"))
        .when(has("redistribution and use in source and binary forms"),
              F.lit("bsd"))
        .when(has("mozilla public license"), F.lit("mpl-2.0"))
        .otherwise(F.lit("unknown"))
    )
    return docs.select(
        "doc_id",
        license_.alias("license"),
        license_.isin("mit", "apache-2.0", "bsd").alias("permissive"),
    )


def readability_scores(docs: DataFrame, *,
                       text_col: str = "text") -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per document — the
    classic surface readability signals (Kincaid et al. 1975), used by
    training-data pipelines as a quality/difficulty axis orthogonal to
    the Gopher/C4 rule gates: curriculum ordering by grade level, or
    filtering the unreadably-dense tail.

    Counting rules (stated exactly so the DuckDB oracle can repeat
    them): words = space-separated non-empty tokens; sentences =
    terminator runs ``[.!?]+`` plus one trailing sentence when the text
    does not end in a terminator (minimum 1); syllables = maximal vowel
    runs ``[aeiouy]+`` in the lowercased text — the standard cheap
    approximation (true syllabification needs a dictionary; vowel runs
    are deterministic, language-agnostic, and monotone with it).

    Flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words);
    FK grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59.
    Empty documents read as 0 words / 1 sentence (ratios use
    ``greatest(words, 1)``). Band thresholds (>= 60 easy, >= 30
    standard) compare the bit-exact division result, so the label is
    engine-exact.

    Determinism: each score is computed as ONE division of two exact
    integers (the formulas put over the common denominator
    1000·S·Wg / 100·S·Wg) and NOT rounded — these ratios land on exact
    decimal half-ties constantly (W=32,S=2,Y=47 ⇒ FK = exactly
    7.98125) and round() of a tie is engine-dependent (plans/num.py),
    while the single identical-integer division yields the bit-exact
    same double on both engines with nothing left to round.

    Fully in-row (regexp counting + arithmetic, no shuffle, no UDF):
    at 100 TB this runs at scan speed inside whole-stage codegen.
    """
    t = F.col(text_col)
    n_words = F.size(F.filter(F.split(t, " "), lambda x: x != ""))
    term_runs = F.size(F.split(t, r"[.!?]+")) - 1
    ends_term = t.rlike(r"[.!?][ \t]*$")
    n_sent = F.greatest(
        F.lit(1),
        term_runs + F.when(ends_term, F.lit(0)).otherwise(F.lit(1)),
    )
    n_syll = F.size(F.split(F.lower(t), r"[aeiouy]+")) - 1
    w = n_words.cast("long")
    wg = F.greatest(n_words, F.lit(1)).cast("long")
    s = n_sent.cast("long")
    y = n_syll.cast("long")
    flesch = (
        (F.lit(206835) * s * wg - F.lit(1015) * w * wg
         - F.lit(84600) * y * s).cast("double")
        / (F.lit(1000) * s * wg).cast("double")
    )
    fk = (
        (F.lit(39) * w * wg + F.lit(1180) * y * s
         - F.lit(1559) * s * wg).cast("double")
        / (F.lit(100) * s * wg).cast("double")
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        flesch.alias("flesch"),
        fk.alias("fk_grade"),
        F.when(flesch >= 60, F.lit("easy"))
        .when(flesch >= 30, F.lit("standard"))
        .otherwise(F.lit("difficult")).alias("band"),
    )


def hash_features(docs: DataFrame, *, dims: int = 1024,
                  text_col: str = "text") -> DataFrame:
    """The hashing trick (Weinberger et al. 2009, Vowpal Wabbit's
    feature map): token -> feature index ``md5(token) % dims``, so the
    feature space is FIXED-WIDTH with no vocabulary dictionary — the
    property that lets a 100 TB featurization run without a driver-side
    vocab broadcast or an extra pass to build one. Collisions are the
    accepted price; :func:`plans` queries account for them explicitly
    rather than pretending they are rare.

    The hash is the md5-first-8-hex integer idiom (portable to the
    DuckDB oracle, uniform mod any ``dims``). One narrow explode +
    groupBy(doc, idx) sum — feature rows per doc are bounded by its
    distinct-token count, never ``dims``.

    Output: sparse (doc_id, feat_idx, val) with val = token occurrence
    count folded into the bucket (unsigned counts; the signed-hash
    variance trick is a one-line extension documented here rather than
    implemented — the oracle pins the unsigned map).
    """
    tok = F.explode(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    ).alias("w")
    idx = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10)
        .cast("long") % dims
    )
    return (
        docs.select("doc_id", tok)
        .select("doc_id", idx.alias("feat_idx"))
        .groupBy("doc_id", "feat_idx")
        .agg(F.count(F.lit(1)).alias("val"))
    )
