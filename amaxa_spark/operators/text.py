"""Text-analysis operators for training-data pipelines.

Beyond-reference surface over the ``documents`` table: language ID
(stopword-hit heuristic), quality scoring (length / alpha / stopword
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting. Everything is a native Column expression — JVM-side,
codegen-friendly, no Python UDFs — and deliberately restricted to
constructs with identical semantics in ANSI SQL so a DuckDB oracle can
replay each operator exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tiny deterministic stopword lists for the heuristic language model
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "ein", "zu", "nicht"]
FR_STOPWORDS = ["le", "la", "les", "et", "est", "un", "une", "dans"]

# BPE-ish token pattern: letter runs, digit runs, single non-space marks
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _norm(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: count tokens hitting each language's
    stopword list; argmax with ties broken en > de > fr; 'und'
    (undetermined) when nothing hits."""
    base = df.select(F.col(id_col), F.split(_norm(F.col(text_col)), " ").alias("__t"))
    hits = {
        lang: F.expr(f"size(filter(__t, t -> t in ({_sql_list(words)})))")
        for lang, words in (
            ("en", EN_STOPWORDS),
            ("de", DE_STOPWORDS),
            ("fr", FR_STOPWORDS),
        )
    }
    en, de, fr = hits["en"], hits["de"], hits["fr"]
    pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return base.select(
        F.col(id_col),
        en.alias("en_hits"),
        de.alias("de_hits"),
        fr.alias("fr_hits"),
        pred.alias("lang_pred"),
    )


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counting: raw char length, whitespace-token count, and a
    BPE-ish subword count (regex token runs)."""
    norm = _norm(F.col(text_col))
    base = df.select(F.col(id_col), F.col(text_col).alias("__raw"), norm.alias("__n"))
    ws_tokens = F.when(F.length("__n") == 0, F.lit(0)).otherwise(
        F.size(F.split(F.col("__n"), " "))
    )
    subwords = F.size(F.regexp_extract_all(F.col("__n"), F.lit(TOKEN_RE), 0))
    return base.select(
        F.col(id_col),
        F.length("__raw").alias("n_chars_raw"),
        ws_tokens.alias("ws_tokens"),
        subwords.alias("subword_tokens"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Quality signals + composite score in [0, 1]: length band,
    alphabetic-character ratio, stopword ratio (too few = keyword
    soup), mean word length sanity."""
    base = df.select(
        F.col(id_col),
        _norm(F.col(text_col)).alias("__n"),
    ).withColumn("__t", F.split(F.col("__n"), " "))
    n_chars = F.length("__n")
    n_words = F.when(n_chars == 0, F.lit(0)).otherwise(F.size("__t"))
    alpha_chars = F.length(F.regexp_replace(F.col("__n"), "[^a-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    stop_hits = F.expr(f"size(filter(__t, t -> t in ({_sql_list(EN_STOPWORDS)})))")
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    mean_wlen = F.when(n_words > 0, alpha_chars / n_words).otherwise(F.lit(0.0))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 5000), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    wlen_ok = F.when((mean_wlen >= 2) & (mean_wlen <= 12), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    score = F.round(
        (
            len_ok
            + wlen_ok
            + alpha_ratio
            + F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
        )
        / F.lit(4.0),
        6,
    )
    return base.select(
        F.col(id_col),
        n_chars.alias("n_chars_norm"),
        n_words.alias("n_words"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        score.alias("quality"),
    )


# required-word list from the Gopher/MassiveText filter (Rae et al.
# 2021, arXiv:2112.11446 §A.1.1): a document must contain ≥2 of these
GOPHER_REQUIRED = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_required_hits: int = 2,
) -> DataFrame:
    """Gopher/MassiveText document-quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A.1.1) — the published heuristic gate most
    pretraining pipelines start from: word-count band, mean-word-length
    band, symbol-to-word ratio (# and ellipsis), bullet-started and
    ellipsis-ended line ratios, fraction of words with an alphabetic
    character, and a required-stopword floor. Returns every signal
    plus the composite ``keep`` verdict, so downstream curation can
    re-threshold without recomputing.

    Scale shape: ONE projection — every signal is native Column
    algebra (split/filter/aggregate higher-order functions), no
    shuffle, no Python; parquet scans prune to (id, text). Defaults
    follow the paper; ``max_bullet_ratio`` is 0.9 in the paper's
    formulation ("at most 90% of lines start with a bullet").
    """
    norm = _norm(F.col(text_col))
    base = df.select(
        F.col(id_col), F.col(text_col).alias("__raw"), norm.alias("__n")
    ).withColumn(
        "__w",
        F.when(F.length("__n") == 0, F.expr("array()")).otherwise(
            F.split(F.col("__n"), " ")
        ),
    ).withColumn("__lines", F.split(F.col("__raw"), "\n", -1))
    n_words = F.size("__w")
    total_wlen = F.expr("aggregate(__w, 0L, (a, w) -> a + length(w))")
    mean_wlen = F.when(n_words > 0, total_wlen / n_words).otherwise(F.lit(0.0))
    # non-overlapping literal counts, same left-to-right semantics as
    # the oracle's replace-based count
    n_hash = F.length("__raw") - F.length(F.replace(F.col("__raw"), F.lit("#")))
    n_ell = (
        F.length("__raw") - F.length(F.replace(F.col("__raw"), F.lit("...")))
    ) / 3
    symbol_ratio = F.when(n_words > 0, (n_hash + n_ell) / n_words).otherwise(
        F.lit(0.0)
    )
    n_lines = F.size("__lines")
    bullet_lines = F.expr(
        "size(filter(__lines, l -> l like '•%' or l like '-%' or l like '*%'))"
    )
    ell_lines = F.expr("size(filter(__lines, l -> l like '%...'))")
    bullet_ratio = F.when(n_lines > 0, bullet_lines / n_lines).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(n_lines > 0, ell_lines / n_lines).otherwise(F.lit(0.0))
    alpha_words = F.expr("size(filter(__w, w -> w rlike '[a-z]'))")
    alpha_word_ratio = F.when(n_words > 0, alpha_words / n_words).otherwise(
        F.lit(0.0)
    )
    required_hits = F.size(
        F.array_intersect(
            F.col("__w"), F.array(*[F.lit(w) for w in GOPHER_REQUIRED])
        )
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wlen >= min_mean_wlen)
        & (mean_wlen <= max_mean_wlen)
        & (F.round(symbol_ratio, 6) <= max_symbol_ratio)
        & (F.round(bullet_ratio, 6) <= max_bullet_ratio)
        & (F.round(ellipsis_ratio, 6) <= max_ellipsis_ratio)
        & (F.round(alpha_word_ratio, 6) >= min_alpha_word_ratio)
        & (required_hits >= min_required_hits)
    )
    return base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_word_ratio, 6).alias("alpha_word_ratio"),
        required_hits.alias("required_hits"),
        keep.cast("int").alias("keep"),
    )


def repetition_score(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Repetition signals (the Gopher-rules family): per document, the
    fraction of word n-gram occurrences taken by the single most
    frequent n-gram, and the distinct-to-total n-gram ratio. High
    max-fraction / low distinct-ratio marks boilerplate and
    generation loops. One explode + two-level aggregation — map-side
    partial agg keeps the shuffle at (doc, gram) granularity.

    Documents with fewer than ``n`` words produce no rows (no n-grams
    to score)."""
    words = F.split(_norm(F.col(text_col)), " ")
    grams = F.expr(
        f"CASE WHEN size(__w) >= {n} THEN "
        f"transform(sequence(1, size(__w) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__w, i, {n}))) "
        f"ELSE array() END"
    )
    counted = (
        df.select(F.col(id_col), words.alias("__w"))
        .select(id_col, F.explode(grams).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return counted.groupBy(id_col).agg(
        F.sum("__c").alias("total_ngrams"),
        F.round(F.max("__c") / F.sum("__c"), 6).alias("max_ngram_frac"),
        F.round(F.count(F.lit(1)) / F.sum("__c"), 6).alias("distinct_ratio"),
    )


def char_class_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Character-class composition per document — the
    encoding/garbage screen that complements the word-level quality
    signals: alphabetic, digit, and whitespace counts over the RAW
    text (no normalization — casing and layout ARE the signal here),
    with everything else (punctuation, symbols, control bytes) as the
    derived remainder, plus alpha/digit ratios rounded to 6. A page of
    minified JS, a number dump, or mojibake all surface as ratio
    outliers before any tokenizer runs.

    Pure regex projection — JVM-side, zero shuffle, linear at any
    scale. Every character class is EXPLICIT ([a-zA-Z], [0-9],
    [ tab newline return formfeed]) because the shorthand classes
    diverge between engines — Java's ``\\s`` includes vertical tab
    (0x0B), RE2's does not — and this operator's cross-engine parity
    is a gate contract. Vertical tab therefore counts as ``n_other``
    on both sides."""
    t = F.col(text_col)
    n = F.length(t)
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    digit = F.length(F.regexp_replace(t, "[^0-9]", ""))
    space = n - F.length(F.regexp_replace(t, "[ \t\n\r\f]", ""))
    return df.select(
        F.col(id_col),
        n.alias("n_chars"),
        alpha.alias("n_alpha"),
        digit.alias("n_digit"),
        space.alias("n_space"),
        (n - alpha - digit - space).alias("n_other"),
        F.round(
            F.when(n > 0, alpha / n).otherwise(F.lit(0.0)), 6
        ).alias("alpha_ratio"),
        F.round(
            F.when(n > 0, digit / n).otherwise(F.lit(0.0)), 6
        ).alias("digit_ratio"),
    )


# PII patterns chosen for cross-engine regex compatibility (Java
# regex and RE2 agree on these constructs)
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


def pii_redact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII scrubbing: replace email addresses and NNN-NNN-NNNN phone
    numbers with [EMAIL]/[PHONE] placeholders, reporting match counts.
    Pure regex projection — JVM-side, no shuffle, linear at any scale.
    """
    col = F.lower(F.col(text_col))
    n_emails = F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(col, F.lit(PHONE_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    return df.select(
        F.col(id_col),
        redacted.alias("redacted_text"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Document fingerprints: md5 of normalized text (exact-dup key)
    plus the minimum word-bigram md5 (a 1-hash MinHash — cheap
    near-dup prefilter)."""
    base = df.select(
        F.col(id_col), _norm(F.col(text_col)).alias("__n")
    ).withColumn("__w", F.split(F.col("__n"), " "))
    bigrams = F.expr(
        "CASE WHEN size(__w) >= 2 THEN "
        "transform(sequence(1, size(__w) - 1), i -> concat_ws(' ', slice(__w, i, 2))) "
        "ELSE array() END"
    )
    return base.select(
        F.col(id_col),
        F.md5(F.col("__n")).alias("md5_fp"),
        F.array_min(F.transform(bigrams, lambda g: F.md5(g))).alias(
            "min_bigram_hash"
        ),
    )


def vocab_topk(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Corpus vocabulary: whitespace tokens of the normalized text,
    counted corpus-wide, top-``k`` by (count desc, token asc).

    Scale shape: explode → two-level hash aggregation with map-side
    combine (token cardinality ≪ token instances), then a k-row
    TakeOrdered — no global sort of the vocabulary.
    """
    toks = df.select(
        F.explode(F.split(_norm(F.col(text_col)), " ")).alias("token")
    ).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(k)


def inverted_index(
    df: DataFrame, text_col: str, id_col: str, min_df: int = 2
) -> DataFrame:
    """Posting-list build: token → comma-joined sorted distinct doc
    ids, for tokens appearing in ≥ ``min_df`` documents. The posting
    list is stringified *after* sorting so the result is a stable,
    engine-comparable value (and a realistic shard-able index row).

    Scale shape: per-doc distinct tokens first (explode + distinct —
    caps each doc's contribution), then one grouped collect per
    token. Hot tokens ("the") concentrate on single reducers; at
    100 TB apply :func:`group_cap`-style df ceilings or drop
    stop-tokens above a document-frequency threshold before the
    collect — min_df prunes the long uninformative tail instead.
    """
    pairs = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(_norm(F.col(text_col)), " ")).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    return (
        pairs.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.concat_ws(",", F.sort_array(F.collect_set("doc"))).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )


def bm25_search(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """BM25 keyword search: score every document against a bag of
    query terms with the Lucene-style formula
    ``idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``,
    ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``, summed over
    terms, returning the top-``topk`` (score desc, id asc).

    Scale shape: ONE tokenize pass — doc length and per-term tf come
    out of the same per-doc conditional aggregation (map-side
    combined on the doc key; tokenizing the text column is the
    dominant cost at corpus scale, so it happens exactly once). The
    corpus stats (N, total length, per-term document frequencies) are
    a single 1-row aggregate broadcast back in; the score is a pure
    wide projection summing terms in a FIXED order (deterministic
    floating point), and the final top-k is a TakeOrdered, never a
    global sort. |terms| is a handful, so the wide tf columns stay
    narrow.
    """
    nt = len(query_terms)
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(_norm(F.col(text_col)), " ")).alias("token"),
    ).where(F.col("token") != "")

    per_doc = toks.groupBy("doc").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("token") == t).cast("long")).alias(f"__tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    # docs with zero tokens contribute no per_doc row — count N from
    # the source frame
    n_docs = df.select(F.col(id_col)).agg(F.count(F.lit(1)).alias("n"))
    stats = per_doc.agg(
        F.sum("dl").alias("tot"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(nt)
        ],
    ).crossJoin(F.broadcast(n_docs))

    j = per_doc.crossJoin(F.broadcast(stats))
    avgdl = F.col("tot") / F.col("n")
    score = None
    for i in range(nt):
        tf = F.col(f"__tf{i}")
        dft = F.col(f"__df{i}")
        idf = F.log(F.lit(1.0) + (F.col("n") - dft + 0.5) / (dft + 0.5))
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / avgdl)
        term = idf * tf * (k1 + 1.0) / denom  # tf=0 → exactly 0.0
        score = term if score is None else score + term
    return (
        j.select(F.col("doc"), F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(topk)
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Per-document keyword extraction: top-``k`` tokens by
    ``tf · ln(N/df)`` (score desc, token asc), tokens appearing in
    < ``min_df`` documents pruned (they're typos/ids, not keywords).

    Scale shape: one tokenize pass feeds both the (doc, token) tf
    aggregation and the token df aggregation (exchange reuse); the
    df side is vocabulary-sized and joins back on the token key
    (AQE picks broadcast when it fits — not forced, vocabularies can
    be huge). The final top-k is a per-doc window over that doc's
    distinct tokens only — shallow partitions, no global sort.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(_norm(F.col(text_col)), " ")).alias("token"),
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    n_docs = df.select(F.col(id_col)).agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cooccurrence_pmi(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_df: int = 2,
    max_df: int | None = None,
    min_pair: int = 2,
) -> DataFrame:
    """Document-level token co-occurrence with pointwise mutual
    information: for token pairs appearing together in ≥ ``min_pair``
    documents, ``pmi = ln(n12 · N / (n1 · n2))`` over document
    frequencies — the collocation / topic-affinity primitive.

    Scale shape: the pair blow-up of the (doc, token) self-join is
    Σ_d k_d² — bounded from BOTH ends before the join: ``min_df``
    drops the rare tail (can never reach ``min_pair``) and ``max_df``
    drops stop-tokens whose postings lists would dominate the join
    (the same guard as ``dedup.ngram_jaccard_pairs``'s
    ``max_doc_freq``). Token DF is computed once on the pruned
    posting frame and reused for n1/n2 via two broadcast-sized joins
    (vocabulary-sized, not corpus-sized); N is a 1-row scalar.
    """
    pairs_dt = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(_norm(F.col(text_col)), " ")).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    dfreq = pairs_dt.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    keep = dfreq.where(F.col("df") >= min_df)
    if max_df is not None:
        keep = keep.where(F.col("df") <= max_df)
    pruned = pairs_dt.join(keep.select("token"), "token")

    left = pruned.select("doc", F.col("token").alias("t1"))
    right = pruned.select("doc", F.col("token").alias("t2"))
    co = (
        left.join(right, "doc")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n12"))
        .where(F.col("n12") >= min_pair)
    )
    n_docs = df.select(F.col(id_col)).agg(F.count(F.lit(1)).alias("n"))
    d1 = keep.select(F.col("token").alias("t1"), F.col("df").alias("n1"))
    d2 = keep.select(F.col("token").alias("t2"), F.col("df").alias("n2"))
    return (
        co.join(F.broadcast(d1), "t1")
        .join(F.broadcast(d2), "t2")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "t1",
            "t2",
            "n12",
            F.round(
                F.log(F.col("n12") * F.col("n") / (F.col("n1") * F.col("n2"))),
                6,
            ).alias("pmi"),
        )
    )


def unigram_prob_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Corpus-trained unigram language-model score per document — the
    distributional half of a perplexity filter (CCNet/Gopher-style
    quality signals) without shipping a model: train the unigram LM on
    the corpus itself (token → count / total), then score each
    document by the mean and minimum probability of its tokens.
    Common-word documents score high; documents full of corpus-rare
    tokens score low and are filter candidates.

    Output: (id, n_tokens, mean_p, min_p), probabilities as exact
    count/total doubles, mean rounded to 6 decimals (min is
    order-independent, rounded to 9 to keep rare-token resolution).

    Scale shape: the corpus is tokenized ONCE into per-(doc, token)
    counts — that grouped exchange is the materialization point both
    the LM training aggregate and the scoring join read (identical
    subplans → ReusedExchange, the SCALE_NOTES
    shuffle-once-read-many rule), and it is the smallest frame that
    still carries multiplicity. Vocab and the corpus total derive
    from it by further aggregation; scoring joins it back against the
    vocab (AQE broadcasts a small vocab, shuffle-hash-joins on token
    otherwise) and re-aggregates per doc with the token-count weights.
    No Python anywhere.
    """
    doc_tok = (
        df.select(
            F.col(id_col),
            F.explode(F.split(_norm(F.col(text_col)), " ")).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("__k"))
    )
    vocab = doc_tok.groupBy("token").agg(F.sum("__k").alias("__cnt"))
    # corpus total as a 1-row aggregate broadcast-crossed in (the
    # scalar-subquery shape) — no eager driver action, single plan
    total = vocab.agg(F.sum("__cnt").cast("double").alias("__total"))
    scored = (
        doc_tok.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("__k"),
            (F.col("__cnt") / F.col("__total")).alias("__p"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("__k").alias("n_tokens"),
        F.round(F.sum(F.col("__k") * F.col("__p")) / F.sum("__k"), 6).alias(
            "mean_p"
        ),
        F.round(F.min("__p"), 9).alias("min_p"),
    )


def bigram_prob_score(
    df: DataFrame, text_col: str, id_col: str, lam: float = 0.7
) -> DataFrame:
    """Corpus-trained interpolated bigram LM score per document — the
    next rung of the perplexity-filter ladder above
    :func:`unigram_prob_score`: each adjacent token pair (w1, w2) gets
    P = lam·P(w2|w1) + (1-lam)·P(w2), with both distributions trained
    on the corpus itself (c(w1,w2)/c(w1) and c(w2)/total). Documents
    whose transitions are corpus-typical score high; word salad that
    passes a unigram filter (common words, nonsense order) scores low.

    Output: (id, n_bigrams, mean_p, min_p) — mean rounded to 6
    decimals, min to 9 (order-independent), matching the unigram
    operator's contract. Documents with <2 tokens produce no row
    (they have no transitions to judge).

    Scale shape: bigram construction is a pure projection — the token
    array is sliced and zipped JVM-side (no self-join, no window) and
    explodes straight into a (doc, w1, w2) count aggregate, the one
    exchange whose grouped result both the bigram-count trainer and
    the scoring join read (ReusedExchange, as in the unigram op). The
    context/unigram counts are a second tokenize pass aggregated to
    vocab size; total is a 1-row broadcast. Scoring joins on (w1, w2)
    then twice on the (small) vocab — AQE broadcasts the vocab side
    when it fits, shuffle-hash-joins otherwise. No Python anywhere.
    """
    toks = F.filter(
        F.split(_norm(F.col(text_col)), " "), lambda t: t != ""
    )
    base = df.select(F.col(id_col), toks.alias("__toks"))
    pair_len = F.greatest(F.size("__toks") - 1, F.lit(0))
    pairs = (
        base.select(
            F.col(id_col),
            F.slice("__toks", F.lit(1), pair_len).alias("__a"),
            F.slice("__toks", F.lit(2), pair_len).alias("__b"),
        )
        .select(F.col(id_col), F.explode(F.arrays_zip("__a", "__b")).alias("__z"))
        .select(
            F.col(id_col),
            F.col("__z.__a").alias("w1"),
            F.col("__z.__b").alias("w2"),
        )
    )
    doc_bg = pairs.groupBy(id_col, "w1", "w2").agg(F.count("*").alias("__k"))
    bg = doc_bg.groupBy("w1", "w2").agg(F.sum("__k").alias("__cb"))
    uni = (
        base.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("__cnt"))
    )
    total = uni.agg(F.sum("__cnt").cast("double").alias("__total"))
    p = (
        F.lit(float(lam)) * (F.col("__cb") / F.col("__c1"))
        + F.lit(1.0 - float(lam)) * (F.col("__c2") / F.col("__total"))
    )
    scored = (
        doc_bg.join(bg, ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), F.col("__cnt").alias("__c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("__cnt").alias("__c2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), F.col("__k"), p.alias("__p"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("__k").alias("n_bigrams"),
        F.round(F.sum(F.col("__k") * F.col("__p")) / F.sum("__k"), 6).alias(
            "mean_p"
        ),
        F.round(F.min("__p"), 9).alias("min_p"),
    )


def token_entropy(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Shannon entropy of each document's own token distribution —
    the scale-free diversity signal: near-zero for a document that
    repeats one token (generation loops), ln(n) for all-distinct
    tokens. Complements :func:`repetition_score` (which looks at
    n-gram structure) with the canonical information measure; the
    usual filter keeps documents inside an entropy band.

    Output: (id, n_tokens, distinct_tokens, entropy) with
    H = −Σ (k/n)·ln(k/n) rounded to 6 decimals.

    Scale shape: one explode into a (doc, token) count aggregation
    (map-side combined), then a per-doc re-aggregation — the same
    two-level shape as repetition_score; the shuffle carries counts,
    never text. No Python.
    """
    counted = (
        df.select(
            F.col(id_col),
            F.explode(F.split(_norm(F.col(text_col)), " ")).alias("__t"),
        )
        .where(F.col("__t") != "")
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__k"))
    )
    n = F.sum("__k")
    # H = ln(n) − Σ k·ln(k)/n : one pass, no per-row division by the
    # not-yet-known total
    h = F.log(n.cast("double")) - F.sum(
        F.col("__k").cast("double") * F.log(F.col("__k").cast("double"))
    ) / n
    return counted.groupBy(id_col).agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.round(h, 6).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# Byte-pair encoding: the tokenizer-training primitive of every LLM
# data pipeline (Sennrich et al. 2016, the GPT-2/HF training shape).
# The CORPUS-sized work — word frequency extraction — is the
# distributed pass; the merge loop then runs on the driver over the
# VOCABULARY-sized word-frequency table, exactly like practical BPE
# trainers (HuggingFace tokenizers collapse the corpus to word counts
# first for the same reason). Encoding is distributed again: merges
# broadcast as a rank table, applied per word with a per-batch memo
# (Zipf makes the cache hit rate ~99% on natural text).

_BPE_EOW = "</w>"


def _bpe_word_symbols(word: str) -> tuple:
    """A word's initial symbol sequence: characters + a terminal
    end-of-word symbol (its OWN symbol, so merges can distinguish
    word-final contexts — the Sennrich convention)."""
    return tuple(word) + (_BPE_EOW,)


def _bpe_apply_merge(syms: tuple, pair: tuple) -> tuple:
    """Merge every leftmost non-overlapping occurrence of ``pair``."""
    a, b = pair
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn a BPE merge list from the corpus. One distributed pass
    builds the word-frequency table (explode → hash aggregate with
    map-side combine); the top ``max_words`` rows by (count desc,
    word asc) collect to the driver — a bounded, vocabulary-sized
    model artifact (the IVF-codebook contract), NOT a corpus read.
    The greedy loop then repeatedly merges the highest-count adjacent
    symbol pair, ties broken by pair lexicographic order so training
    is deterministic across partitionings and engines. Pair counts
    follow the reference algorithm: every adjacent position counts,
    including overlapping repeats, while application merges leftmost
    non-overlapping — the standard quirk, kept bit-compatible with
    Sennrich's get_stats/merge_vocab.

    ``max_words`` is the scale cap: at 100 TB the raw vocabulary of
    noisy text is unbounded, and the frequency cutoff is what every
    practical trainer applies. The driver loop is
    O(n_merges · total symbol count) — seconds at 50k words; an
    incremental pair-stats update (only words containing the merged
    pair change) is the known optimization if n_merges grows to
    GPT-scale (~50k)."""
    words = (
        df.select(F.explode(F.split(_norm(F.col(text_col)), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple, int] = {}
    for r in words:
        vocab[_bpe_word_symbols(r.w)] = (
            vocab.get(_bpe_word_symbols(r.w), 0) + r.cnt
        )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats: dict[tuple, int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + cnt
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            _bpe_apply_merge(syms, best): cnt for syms, cnt in vocab.items()
        }
    return merges


def bpe_merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned merge list as a (rank, lhs, rhs) frame — the
    persistable/joinable model form (lhs/rhs, not left/right, so the
    frame round-trips through SQL engines without keyword
    quoting)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, lhs string, rhs string",
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize every document with a trained merge list: per word,
    start from characters + end-of-word symbol and repeatedly apply
    the LOWEST-RANK applicable merge (the canonical priority scheme —
    equivalent to replaying the merges in training order). Emits
    (id, n_words, n_tokens, tokens) where ``tokens`` is the
    space-joined token stream — hash-stable, so oracles can replay
    the exact token sequence, not just counts.

    Scale shape: the merge table broadcasts with the closure (it is
    model-sized); one Arrow-batched mapInPandas projection, no
    shuffle; a per-batch word→tokens memo exploits the Zipf
    distribution so each distinct word pays the merge loop once per
    batch."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = _bpe_word_symbols(word)
        while len(syms) > 1:
            best_rank = None
            best_pair = None
            for a, b in zip(syms, syms[1:]):
                r = ranks.get((a, b))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (a, b)
            if best_pair is None:
                break
            syms = _bpe_apply_merge(syms, best_pair)
        out = list(syms)
        memo[word] = out
        return out

    def run(batches):
        import pandas as pd

        for pdf in batches:
            memo: dict = {}
            ids, n_words, n_tokens, toks = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                # text arrives already normalized by the SHARED _norm
                # in the plan below — re-normalizing here with Python
                # re (Unicode \s) would diverge from bpe_train and
                # the SQL oracles (Java/RE2 ASCII \s) on exotic
                # whitespace like U+00A0
                words = [w for w in (text or "").split(" ") if w]
                stream: list[str] = []
                for w in words:
                    stream.extend(encode_word(w, memo))
                ids.append(did)
                n_words.append(len(words))
                n_tokens.append(len(stream))
                toks.append(" ".join(stream))
            yield pd.DataFrame(
                {
                    id_col: ids, "n_words": n_words,
                    "n_tokens": n_tokens, "tokens": toks,
                }
            )

    return df.select(
        id_col, _norm(F.col(text_col)).alias(text_col)
    ).mapInPandas(
        run,
        schema=f"{id_col} long, n_words int, n_tokens int, tokens string",
    )

def dsir_weights(
    df: DataFrame,
    target_pred,
    n_buckets: int = 256,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed unigram features are under a
    TARGET distribution (the docs matching ``target_pred``) than
    under the raw corpus. High-weight documents look like the target
    domain; resampling by these weights is the paper's selection
    rule. The reference engine has no corpus-selection operators
    (amaxa/amaxa.py stops at extraction) — this is a beyond-reference
    training-data-pipeline component.

    Features are tokens hashed into ``n_buckets`` buckets via the
    first 6 hex digits of md5 — unicode-safe and byte-identical in
    Spark (``conv(substring(md5(t),1,6),16,10)``) and DuckDB
    (``cast('0x'||substr(md5(t),1,6) as int)``), verified both return
    414835 for 'héllo中'. Bucket log-ratios use add-``alpha``
    smoothing and are ROUNDED TO MICRO-NATS (×1e6, bigint) before the
    per-doc sum, so the sum is exact integer arithmetic — no
    float-accumulation-order hazard between engines (ln itself is
    within 1 ulp cross-engine; a 1e-16 perturbation cannot move a
    value across a 1e-6 rounding boundary except with ~1e-10
    probability per bucket).

    Output: (id, n_tokens, weight) — weight in nats, exact multiple
    of 1e-6.

    Scale shape: one explode into per-(doc, bucket) counts (map-side
    combined shuffle carrying counts, never text); the bucket
    ratio table is ≤ ``n_buckets`` rows — broadcast — so scoring is a
    map-side join plus one per-doc aggregation. The target/source
    totals are 1-row aggregates crossed in (scalar-subquery shape).
    No Python anywhere.
    """
    if isinstance(target_pred, str):
        target_pred = F.expr(target_pred)
    bucket = (
        F.conv(F.substring(F.md5(F.col("__t")), 1, 6), 16, 10)
        .cast("long") % n_buckets
    ).alias("__b")
    toks = (
        df.select(
            F.col(id_col),
            target_pred.alias("__tgt"),
            F.explode(F.split(_norm(F.col(text_col)), " ")).alias("__t"),
        )
        .where(F.col("__t") != "")
        .select(id_col, "__tgt", bucket)
    )
    doc_b = toks.groupBy(id_col, "__b").agg(
        F.count("*").alias("__k"),
        # a doc is entirely target or not; max is just the carry
        F.max("__tgt").alias("__tgt"),
    )
    src = doc_b.groupBy("__b").agg(F.sum("__k").alias("__sc"))
    tgt = (
        doc_b.where(F.col("__tgt"))
        .groupBy("__b")
        .agg(F.sum("__k").alias("__tc"))
    )
    totals = doc_b.agg(
        F.sum("__k").cast("double").alias("__st"),
        F.sum(F.when(F.col("__tgt"), F.col("__k")).otherwise(0))
        .cast("double")
        .alias("__tt"),
    )
    ratio = (
        src.join(tgt, "__b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "__b",
            F.round(
                F.log(
                    ((F.coalesce(F.col("__tc"), F.lit(0)) + alpha)
                     / (F.col("__tt") + alpha * n_buckets))
                    / ((F.col("__sc") + alpha)
                       / (F.col("__st") + alpha * n_buckets))
                )
                * 1e6
            )
            .cast("long")
            .alias("__lp"),
        )
    )
    return (
        doc_b.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__k").alias("n_tokens"),
            (F.sum(F.col("__k") * F.col("__lp")) / 1e6).alias("weight"),
        )
    )


def _nb_features(text_col, ngram: int):
    """The NB feature array for one document: whitespace unigrams,
    plus adjacent-pair bigrams when ``ngram >= 2`` (joined by a
    single space — tokens are split ON spaces, so the joiner cannot
    collide with any unigram). Empty tokens are filtered before
    pairing so bigrams never span a collapsed gap."""
    toks = F.filter(F.split(_norm(text_col), " "), lambda t: t != "")
    if ngram <= 1:
        return toks
    # zip the array against its own 1-shifted slice: zip_with pads
    # the shorter side with NULL, concat propagates it, the filter
    # drops it — no index arithmetic, no per-element element_at
    # (the sequence/element_at formulation re-walked the array per
    # position: 13x slower on the sf0.1 corpus, same output)
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda x: x.isNotNull(),
    )
    return F.concat(toks, bigrams)


def nb_classify(
    train: DataFrame,
    score: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str,
    alpha: float = 1.0,
    ngram: int = 1,
    weight_norm: bool = False,
) -> DataFrame:
    """Multinomial Naive Bayes text classifier, trained AND applied
    in one declarative plan — the fastText-quality-classifier shape
    (label docs by a trusted source, score the rest) without shipping
    a model: per-(label, token) Laplace-smoothed conditionals
    ``ln((k + α) / (tokens_label + α·V))`` plus document-frequency
    priors, scored as ``prior + Σ k_t · lnP(t|label)`` and argmaxed.

    Cross-engine determinism is the dsir_weights contract: every
    log-probability rounds to integer MICRO-NATS before any sum, so
    per-document totals are exact integer arithmetic and the argmax
    (score desc, label desc on ties — a max over (score, label)
    structs) is reproducible bit-for-bit on any engine. Tokens
    outside the training vocabulary are dropped (standard NB
    practice); documents with zero in-vocabulary tokens drop from the
    output (they have no evidence to score).

    Output: (id, n_tokens, label_pred, score_unats).

    ``ngram=2`` adds adjacent-pair bigram features next to the
    unigrams (the fastText recipe — word order enters the model
    while the plan shape is unchanged: the feature exchange just
    carries ~2x the rows). ``weight_norm=True`` applies per-class
    weight calibration (Rennie et al. 2003 §4.4, "weight
    normalization"): each class's log-conditional vector divides by
    its own L1 mass, correcting the bias toward classes whose
    training text is simply longer. The integer contract survives
    exactly: the L1 mass is an EXACT integer sum of micro-nats, and
    the normalized weight ``round(lp·1e8 / l1)`` is one IEEE754
    division of two exactly-representable integers — bit-identical
    on any engine.

    Scale shape: the training corpus tokenizes ONCE into the
    (label, token) count exchange — and when ``score is train`` (the
    self-classification gate shape) the SAME tokenize pass feeds the
    scoring side too, via a checkpointed (doc, label, token) count
    frame both aggregates re-aggregate from. The model is pivoted to
    ONE ROW PER TOKEN with |labels| weight columns (labels are a
    bounded handful — the collected-codebook contract), so scoring is
    a single token join + one per-doc aggregation: no vocab semi-join,
    no per-(doc, label) explode, no window over documents, no Python
    anywhere."""
    # the BIGRAM feature build is per-row heavy (zip_with + concat
    # over every adjacent pair) and the corpus scan can be one
    # partition — spread the slim projection across idle cores first
    # (adaptive: no-op at scale; measured 1.1 -> 0.65 s on the sf0.1
    # bigram tokenize stage). The UNIGRAM tokenize is too light to
    # repay the exchange (the r11 616fab7 negative result) and stays
    # unspread.
    if ngram >= 2:
        from amaxa_spark.operators.similarity import _scale_out

        _spread = _scale_out
    else:
        def _spread(df):
            return df

    if score is train:
        # one tokenize for BOTH the model and the scoring side: the
        # (doc, label, token) counts are the finest aggregate either
        # needs; each side re-aggregates from the checkpoint (exact
        # integer re-sums) instead of re-exploding the corpus
        tok3 = (
            _spread(train.select(id_col, label_col, text_col))
            .select(
                F.col(id_col),
                F.col(label_col).alias("__lbl"),
                F.explode(_nb_features(F.col(text_col), ngram)).alias(
                    "token"
                ),
            )
            .groupBy(id_col, "__lbl", "token")
            .agg(F.count("*").alias("__k"))
            .localCheckpoint()
        )
        cls_tok = tok3.groupBy("__lbl", "token").agg(
            F.sum("__k").alias("__k")
        )
        doc_tok = tok3.groupBy(id_col, "token").agg(
            F.sum("__k").alias("__k")
        )
    else:
        cls_tok = (
            _spread(train.select(label_col, text_col))
            .select(
                F.col(label_col).alias("__lbl"),
                F.explode(_nb_features(F.col(text_col), ngram)).alias(
                    "token"
                ),
            )
            .groupBy("__lbl", "token")
            .agg(F.count("*").alias("__k"))
            # materialize the MODEL-SIZED aggregate (|vocab|·|labels|
            # sparse rows, not the corpus): the label-stats collect
            # and the pivoted model both read it — without the
            # checkpoint each would re-tokenize the whole training
            # corpus (measured 3x tokenize = 70s at sf1-shape)
            .localCheckpoint()
        )
        doc_tok = (
            _spread(score.select(id_col, text_col))
            .select(
                F.col(id_col),
                F.explode(_nb_features(F.col(text_col), ngram)).alias(
                    "token"
                ),
            )
            .groupBy(id_col, "token")
            .agg(F.count("*").alias("__k"))
        )
    # the label dimension is BOUNDED (a handful of classes) — collect
    # it like a k-means codebook so the model pivots into literal
    # per-label columns. Only the per-label DOC counts are collected
    # (the priors round through Python's round, a contract the gate
    # hashes pinned); per-label token mass and vocabulary size stay
    # IN-PLAN as a 1-row broadcast derived from the pivot itself —
    # they were a second checkpoint-scanning job with a
    # count_distinct exchange chain.
    lab_rows = (
        train.where(F.col(label_col).isNotNull())
        .groupBy(F.col(label_col).alias("__lbl"))
        .agg(F.count("*").alias("__docs"))
        .collect()
    )
    if not lab_rows:
        raise ValueError("nb_classify: no non-null labels in the training frame")
    docs_total = float(sum(r["__docs"] for r in lab_rows))
    import math as _math

    lbl_vals = [r["__lbl"] for r in lab_rows]
    priors = {
        r["__lbl"]: int(round(_math.log(r["__docs"] / docs_total) * 1e6))
        for r in lab_rows
    }
    # PIVOTED sparse model: one row per VOCAB token with |labels|
    # weight columns — the classical NB factoring where every ABSENT
    # (token, label) cell shares the per-label smoothed value
    # lp0 = round(ln(α / (tc + α·V))·1e6). The pivot groups the
    # observed (label, token) counts by token (null-labeled training
    # rows keep their tokens in the vocabulary with all cells absent,
    # exactly like the old vocab ∪ model split), and EVERY cell —
    # present or absent — evaluates through the IDENTICAL Spark
    # expression (java Math.log + HALF_UP round; a Python-libm
    # divergence of 1 ulp would break the exact-integer contract).
    tokp_k = cls_tok.groupBy("token").agg(
        *[
            F.max(
                F.when(F.col("__lbl") == F.lit(lbl), F.col("__k"))
            ).alias(f"__k{i}")
            for i, lbl in enumerate(lbl_vals)
        ]
    )
    # per-label token mass tc_i and vocab size V from ONE 1-row
    # aggregate over the pivot (each (label, token) count occupies
    # exactly one cell, so Σ cells ≡ the old groupBy(label) mass, and
    # count(*) ≡ the old count_distinct(token)); exact integer sums
    # cast to double = the exact float(int) literals they replace
    stats_row = tokp_k.agg(
        F.count(F.lit(1)).cast("double").alias("__V"),
        *[
            F.sum(F.coalesce(F.col(f"__k{i}"), F.lit(0)))
            .cast("double")
            .alias(f"__tc{i}")
            for i in range(len(lbl_vals))
        ],
    )
    w_cols = [
        F.round(
            F.log(
                (F.coalesce(F.col(f"__k{i}"), F.lit(0)) + F.lit(alpha))
                / (F.col(f"__tc{i}") + F.lit(alpha) * F.col("__V"))
            )
            * 1e6
        )
        .cast("long")
        .alias(f"__w{i}")
        for i in range(len(lbl_vals))
    ]
    tokp = tokp_k.crossJoin(F.broadcast(stats_row)).select(
        "token", *w_cols
    )
    if weight_norm:
        # per-class L1 calibration in EXACT integer space: l1 is the
        # integer |micro-nat| sum over the (virtual) dense model —
        # the pivoted frame IS that dense model, one cell per
        # (vocab token, label), so a plain integer sum equals the old
        # Σ_present |lp| + (V − n_present)·|lp0| bit-for-bit. The
        # 1-row aggregate broadcasts back in-plan (no driver collect);
        # the rescale round(lp·1e8 / l1) is one IEEE754 division of
        # exactly-representable integers (lp·1e8 < 2^53) per cell.
        l1row = tokp.agg(
            *[
                F.greatest(
                    F.sum(F.abs(F.col(f"__w{i}"))), F.lit(1).cast("long")
                ).alias(f"__l1_{i}")
                for i in range(len(lbl_vals))
            ]
        )
        tokp = tokp.crossJoin(F.broadcast(l1row)).select(
            "token",
            *[
                F.round(
                    F.col(f"__w{i}").cast("double") * 1e8
                    / F.col(f"__l1_{i}").cast("double")
                )
                .cast("long")
                .alias(f"__w{i}")
                for i in range(len(lbl_vals))
            ],
        )
    # scoring: ONE token join + ONE per-doc aggregation. The inner
    # join keeps exactly the in-vocabulary tokens (so zero-evidence
    # docs drop, as before); Σ k·w_i over a doc's vocab tokens equals
    # the old ps + (N_d − K_present)·lp0 decomposition exactly —
    # order-independent integer arithmetic either way.
    lbl_t = train.schema[label_col].dataType
    scored = (
        doc_tok.join(tokp, "token")
        .groupBy(id_col)
        .agg(
            F.sum("__k").alias("n_tokens"),
            *[
                F.sum(F.col("__k") * F.col(f"__w{i}")).alias(f"__s{i}")
                for i in range(len(lbl_vals))
            ],
        )
    )
    # argmax over the bounded label set: array_max over
    # (score, label) structs — the same lexicographic
    # (score desc, label desc on ties) comparison the old
    # groupBy-max-struct performed across exploded rows
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    (F.col(f"__s{i}") + F.lit(priors[lbl])).alias(
                        "__score"
                    ),
                    F.lit(lbl).cast(lbl_t).alias("__lbl"),
                )
                for i, lbl in enumerate(lbl_vals)
            ]
        )
    )
    return scored.select(
        F.col(id_col),
        F.col("n_tokens"),
        best["__lbl"].alias("label_pred"),
        best["__score"].alias("score_unats"),
    )
