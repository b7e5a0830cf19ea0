"""Text-analysis operators for training-data pipelines.

All hot-path expressions are JVM-side ``pyspark.sql.functions`` —
no Python UDFs — so they stay inside whole-stage codegen and scale
linearly with executors. Each returns Columns (composable) or a
DataFrame transform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.parallelism import AUTO

# Tiny per-language stopword lists for the n-gram/stopword-ratio
# language heuristic (deterministic, dependency-free).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
    "de": ["der", "die", "das", "und", "von", "zu", "ein", "ist"],
}


#: The tokenizer's whitespace class, spelled EXPLICITLY because the
#: two engines' \s disagree: Java regex \s == [ \t\n\x0B\f\r] while
#: RE2 (DuckDB) \s lacks \x0B (vertical tab) — under '\s+' the two
#: engines tokenize "a\x0bb" differently and every downstream hash
#: (fingerprint, feature-hash buckets, stopword ratios) silently
#: diverges (round-12 two-engine hostile parity suite). This spelling
#: is byte-identical semantics in BOTH engines; the DuckDB mirrors
#: (corpus/llm.py TOKS) embed the same class.
WS_CLASS_RE = r"[ \t\n\x0b\f\r]+"


def tokenize(text: str | Column) -> Column:
    """Whitespace tokenization with lowercase normalization; empty
    strings removed (split on runs of whitespace — the portable
    :data:`WS_CLASS_RE` class, see its note)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(F.trim(col)), WS_CLASS_RE), lambda t: F.length(t) > 0
    )


def token_count(text: str | Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.size(tokenize(text))


def bpe_ish_token_count(text: str | Column) -> Column:
    """BPE-ish token estimate: split on word boundaries AND digits/
    punctuation runs (a cheap regex proxy for subword tokenizers)."""
    col = F.col(text) if isinstance(text, str) else text
    pieces = F.split(F.lower(F.trim(col)), r"[^a-z0-9]+|(?<=[a-z])(?=[0-9])")
    return F.size(F.filter(pieces, lambda t: F.length(t) > 0))


def subword_piece_count(text: str | Column) -> Column:
    """RE2-safe subword-piece estimate: maximal alphanumeric runs
    after lowercasing (``[^a-z0-9]+`` split). Unlike
    :func:`bpe_ish_token_count`, whose letter→digit lookbehind is
    Java-regex-only, every step here reproduces in DuckDB — making it
    the piece counter the ORACLE-CHECKED fertility report uses."""
    col = F.col(text) if isinstance(text, str) else text
    pieces = F.split(F.lower(F.trim(col)), r"[^a-z0-9]+")
    return F.size(F.filter(pieces, lambda t: F.length(t) > 0))


def token_fertility_report(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Tokenizer fertility/compression accounting per language: doc
    count, exact char/whitespace-token/subword-piece sums, characters
    per token, and fertility (pieces per whitespace token) — the
    report a tokenizer-selection study runs per corpus slice (fertility
    >> 1 on a language means the tokenizer fragments it, inflating
    training cost per effective token; chars/token is the compression
    ratio that converts a byte budget into a token budget).

    Scale shape: map-only counters → ONE hash aggregation keyed on
    language (output ∝ languages). Integer sums are exact; the two
    ratios are the only float ops."""
    tc = token_count(F.col(text_col))
    return (
        df.select(
            F.col(lang_col).alias("lang"),
            F.length(F.col(text_col)).alias("_chars"),
            tc.alias("_ws"),
            subword_piece_count(F.col(text_col)).alias("_pieces"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_chars").alias("sum_chars"),
            F.sum("_ws").alias("sum_ws_tokens"),
            F.sum("_pieces").alias("sum_pieces"),
        )
        .select(
            "lang",
            "n_docs",
            "sum_chars",
            "sum_ws_tokens",
            "sum_pieces",
            # a language bucket whose docs are all empty/whitespace has
            # no tokens to rate: NULL (matches DuckDB's x/0 → NULL;
            # unguarded, Spark ANSI throws DIVIDE_BY_ZERO)
            F.when(
                F.col("sum_ws_tokens") > 0,
                F.col("sum_chars").cast("double")
                / F.col("sum_ws_tokens").cast("double"),
            ).alias("chars_per_token"),
            F.when(
                F.col("sum_ws_tokens") > 0,
                F.col("sum_pieces").cast("double")
                / F.col("sum_ws_tokens").cast("double"),
            ).alias("fertility"),
        )
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document statistics: chars, tokens, avg token length,
    punctuation/whitespace/digit ratios."""
    t = F.col(text_col)
    toks = tokenize(t)
    n_chars = F.length(t)
    return df.withColumns(
        {
            "n_chars_calc": n_chars,
            "n_tokens": F.size(toks),
            "avg_token_len": (
                F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast(
                    "double"
                )
                / F.greatest(F.size(toks), F.lit(1))
            ),
            "punct_ratio": (
                F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double")
                / F.greatest(n_chars, F.lit(1))
            ),
            "space_ratio": (
                F.length(F.regexp_replace(t, r"[^ ]", "")).cast("double")
                / F.greatest(n_chars, F.lit(1))
            ),
            "digit_ratio": (
                F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
                / F.greatest(n_chars, F.lit(1))
            ),
        }
    )


def stopword_hits(text: str | Column, lang: str) -> Column:
    """Count of tokens that are stopwords of `lang`."""
    toks = tokenize(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def language_id(text: str | Column) -> Column:
    """Stopword-ratio language heuristic: the language whose stopword
    list hits the most tokens; 'und' (undetermined) on zero hits.
    Deterministic tie-break: language name ascending."""
    scored = F.array(
        *[
            F.struct(
                stopword_hits(text, lang).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(scored)  # struct compare: hits first, then lang
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: str | Column) -> Column:
    """Heuristic document quality in [0,1]: length band + token count +
    moderate punctuation + low digit noise. Deterministic, JVM-only."""
    col = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(col)
    n_toks = token_count(col)
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", "")).cast("double") / F.greatest(
        n_chars, F.lit(1)
    )
    digit = F.length(F.regexp_replace(col, r"[^0-9]", "")).cast("double") / F.greatest(
        n_chars, F.lit(1)
    )
    score = (
        F.when(n_chars >= 200, F.lit(0.4)).when(n_chars >= 50, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(n_toks >= 30, F.lit(0.3)).when(n_toks >= 10, F.lit(0.15)).otherwise(F.lit(0.0))
        + F.when(punct <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(digit <= 0.2, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return score.cast("double")


# PII patterns — deliberately restricted to syntax shared by Java
# regex (Spark) and RE2-ish engines (DuckDB): character classes,
# bounded repeats, no lookaround. Conservative by design: a training-
# data scrubber prefers false positives ('<EMAIL>' tokens are harmless
# to a tokenizer) over leaked addresses.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,3} [0-9]{3} [0-9]{3,4}"


def pii_counts(text: str | Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts — JVM-side regexp_count."""
    col = F.col(text) if isinstance(text, str) else text
    return (
        F.regexp_count(col, F.lit(PII_EMAIL_RE)),
        F.regexp_count(col, F.lit(PII_PHONE_RE)),
    )


def redact_pii(text: str | Column) -> Column:
    """Replace email addresses and international-format phone numbers
    with '<EMAIL>' / '<PHONE>' placeholder tokens.

    Pure ``regexp_replace`` chain — codegen-resident, no Python in the
    hot path, linear scan per document. Emails are replaced first so a
    phone-looking digit run inside an address can't be half-redacted.
    """
    col = F.col(text) if isinstance(text, str) else text
    no_email = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PII_PHONE_RE, "<PHONE>")


def salient_terms(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """Top-``top_k`` salient terms per group, ranked by document-
    frequency-normalized term frequency: score = tf / df, where tf is
    the term's total occurrences within the group and df the number of
    corpus documents containing it. High tf alone surfaces stopwords;
    dividing by df surfaces the terms characteristic of the group —
    the standard corpus-analysis step before building language filters.

    Classic TF-IDF weights by ln(N/df); that is deliberately not used
    here because transcendental libm results differ between engines in
    the last ulp and would break the bit-exact oracle. ``score`` is a
    single IEEE division of two integers — portable — and the (tf, df)
    columns let callers apply any idf curve downstream.

    Shape: explode → two hash-aggregations (term frequencies keyed on
    (group, term); document frequencies on term) → broadcastable join
    of the per-group tf frame with the df frame → per-group top-k
    window. All shuffle keys are uniform.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.explode(tokenize(text_col)).alias("t"),
    )
    tf = toks.groupBy("grp", "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.select("id", "t").distinct().groupBy("t").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = tf.join(dfreq, "t").withColumn(
        "score", F.col("tf").cast("double") / F.col("df")
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(
                F.col("score").desc(), F.col("t")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= top_k).select(
        F.col("grp").alias(group_col),
        "rank",
        F.col("t").alias("term"),
        "tf",
        "df",
        "score",
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Per-DOCUMENT top-``top_k`` TF-IDF terms — the materialization
    step before building a sparse retrieval index or keyword summary
    (complements :func:`salient_terms`, which ranks per GROUP).

    score = tf / df where tf is the term's count inside the document
    and df the number of corpus documents containing it. For a fixed
    document this ranks identically to tf·idf for any monotone idf
    curve (idf depends only on df), while staying a single IEEE
    division of two integers — portable across engines, unlike
    ln(N/df) whose last-ulp differs between libms. The (tf, df,
    n_docs) columns let callers apply any idf curve downstream.

    Scale shape (100 TB lens): explode → ONE corpus-sized hash
    aggregation keyed on (doc, term) — uniform keys; document
    frequencies derive from that same frame with a vocab-sized
    second aggregation (no extra distinct pass over the corpus,
    unlike the per-group variant); the tf⋈df join is vocab-sized on
    the build side (AQE broadcasts it at typical vocab sizes); the
    final top-k window partitions by document — uniform. ``n_docs``
    is a 1-row aggregate broadcast via crossJoin (bounded).
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("t")
    )
    tf = toks.groupBy("id", "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(dfreq, "t").withColumn(
        "score", F.col("tf").cast("double") / F.col("df")
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("t"))
        ),
    )
    return (
        ranked.filter(F.col("rank") <= top_k)
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("id").alias(id_col),
            "rank",
            F.col("t").alias("term"),
            "tf",
            "df",
            "n_docs",
            "score",
        )
    )


def bigram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_count: int = 2,
) -> DataFrame:
    """Corpus-conditioned fluency/novelty signal: the fraction of each
    document's word bigrams that are RARE in the whole corpus (total
    occurrences ≤ ``rare_max_count``).

    This is the exact-arithmetic cousin of KenLM-style n-gram-LM
    quality scoring (the classic corpus-conditional filter): instead
    of average log-probability — whose float log/sum would break the
    bit-exact cross-engine oracle — it thresholds each bigram's corpus
    count and reports an integer ratio (one IEEE division). Low
    novelty → boilerplate/templated text; very high novelty → noise
    or OCR garbage; both tails are filter candidates. Complements
    operators.signals.repetition_signals, which is WITHIN-document.

    Scale shape: bigrams are built array-side (zip_with over two
    slices — no posexplode self-join), then ONE corpus-sized
    aggregation keyed on bigram (uniform); the count frame joins back
    on bigram and re-aggregates per document. Docs with <2 tokens
    yield n_bigrams = 0 and novelty 0.0.
    """
    toks = F.col("__toks")
    n = F.size(toks)
    bigrams = F.when(n >= 2, F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )).otherwise(F.array().cast("array<string>"))
    per_doc = df.select(
        F.col(id_col).alias("id"), tokenize(text_col).alias("__toks")
    ).select("id", F.explode_outer(bigrams).alias("bg"))
    corpus = per_doc.where(F.col("bg").isNotNull()).groupBy("bg").agg(
        F.count(F.lit(1)).alias("c")
    )
    joined = per_doc.join(corpus, "bg", "left")
    agg = joined.groupBy("id").agg(
        F.count(F.col("bg")).alias("n_bigrams"),
        F.count(F.when(F.col("c") <= rare_max_count, 1)).alias("n_rare"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        "n_rare",
        (
            F.col("n_rare").cast("double")
            / F.greatest(F.col("n_bigrams"), F.lit(1))
        ).alias("novelty"),
    )


def doc_fingerprint(text: str | Column, n_hex: int = 16) -> Column:
    """Deterministic document fingerprint: md5 of the token-normalized
    text (lowercased, whitespace collapsed), first `n_hex` hex chars.
    Cross-engine reproducible (md5 is standard everywhere)."""
    col = F.col(text) if isinstance(text, str) else text
    normalized = F.concat_ws(" ", tokenize(col))
    return F.substring(F.md5(normalized), 1, n_hex)


def _bind(expr: Column, body) -> Column:
    """Let-binding for expressions consumed by higher-order functions:
    evaluate ``expr`` ONCE per row and hand it to ``body`` as a lambda
    variable. A bare (non-variable) expression referenced inside an
    ``F.transform``/``F.aggregate`` lambda is re-evaluated on EVERY
    element — for an expensive chain (e.g. per-gram md5 hashing) that
    silently turns O(n) row work into O(n²). Wrapping the expression
    in a 1-element array and transforming binds it to a
    NamedLambdaVariable, which Spark evaluates exactly once."""
    return F.element_at(F.transform(F.array(expr), body), 1)


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_parallelism: int | str | None = AUTO,
) -> DataFrame:
    """Winnowing document fingerprinting (Schleimer, Wilkerson & Aiken,
    SIGMOD'03): token k-grams → portable 60-bit md5 hashes → the
    MINIMUM hash of every sliding window of ``w`` consecutive gram
    hashes; the distinct selected hashes form the document's
    fingerprint set. The winnowing guarantee: any token run of length
    ≥ w+k-1 shared between two documents contributes at least one
    common fingerprint, while only ~2/(w+1) of all gram hashes are
    kept — the storage/recall trade the MOSS plagiarism detector runs
    on, and a denser alternative to the single ``doc_fingerprint``.

    Scale shape: ENTIRELY map-side array expressions — k-grams,
    hashes, window minima, and the distinct fold all happen inside
    one projection over the corpus scan (no explode, no shuffle, no
    Python); output is one bounded row per document (count, min/max,
    xor-fold, density — never the unbounded fingerprint array).
    Documents shorter than ``k`` tokens have no grams (empty set);
    documents with fewer than ``w`` grams contribute their single
    global minimum, per the paper's boundary rule.

    Evaluation discipline (the part that makes this O(n), not O(n²)):
    a column expression referenced inside an F.transform lambda is
    RE-EVALUATED for every element, so naively writing
    ``transform(seq, j -> array_min(slice(hashes, j, w)))`` recomputes
    the entire md5 array once per window — quadratic in document
    length (measured 25 s for 500 docs). Every intermediate array is
    therefore let-bound via :func:`_bind` (evaluated exactly once per
    row), and the final scalars are emitted through ``F.inline`` of a
    1-element struct array, so the whole chain runs ONCE per row
    (0.7 s for the same 500 docs)."""
    def report_of(hs: Column) -> Column:
        n_grams = F.size(hs)
        return _bind(
            F.array_distinct(_winnow_mins(hs, w)),
            lambda fs: F.struct(
                n_grams.alias("n_grams"),
                F.size(fs).alias("n_fingerprints"),
                F.array_min(fs).alias("fp_min"),
                F.array_max(fs).alias("fp_max"),
                F.aggregate(
                    fs,
                    F.lit(0).cast("long"),
                    lambda acc, x: acc.bitwiseXOR(x),
                ).alias("fp_xor"),
                F.when(
                    n_grams > 0,
                    F.size(fs).cast("double") / n_grams.cast("double"),
                ).alias("fp_density"),
            ),
        )

    report = _bind(
        tokenize(F.col(text_col)),
        lambda ts: _bind(_winnow_hashes(ts, k), report_of),
    )
    # compute fan-out before the per-row gram-hash/winnow chain: a
    # single-row-group scan runs the whole O(tokens·w) pass on one
    # core (measured 1.06 s → 0.48 s at sf0.1 on local[32]; no-op at
    # real file counts)
    from etl_global_mobility_spark.operators.parallelism import (
        ensure_compute_parallelism,
    )

    df = ensure_compute_parallelism(df, min_parallelism)
    return df.select(F.col(id_col), F.inline(F.array(report)))


def _winnow_hashes(ts: Column, k: int) -> Column:
    """Gram md5 hashes from a BOUND token-array lambda variable."""
    from etl_global_mobility_spark.operators.dedup import _md5_band_hash

    n = F.size(ts)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(ts, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(grams, lambda g: _md5_band_hash(g, 0))


def _winnow_mins(hs: Column, w: int) -> Column:
    """Window minima from a BOUND gram-hash-array lambda variable
    (with the short-document boundary rule)."""
    n_grams = F.size(hs)
    return (
        F.when(
            n_grams >= w,
            F.transform(
                F.sequence(F.lit(1), n_grams - (w - 1)),
                lambda j: F.array_min(F.slice(hs, j, w)),
            ),
        )
        .when(n_grams >= 1, F.array(F.array_min(hs)))
        .otherwise(F.array().cast("array<bigint>"))
    )


def winnowing_fp_array(
    text: str | Column, k: int = 5, w: int = 4
) -> Column:
    """The distinct winnowed fingerprint set as an ``array<bigint>``
    column — the composable form of :func:`winnowing_fingerprints`
    (same let-bound O(n) chain), for consumers that need the actual
    hashes, e.g. the inverted-index near-dup join."""
    col = F.col(text) if isinstance(text, str) else text
    return _bind(
        tokenize(col),
        lambda ts: _bind(
            _winnow_hashes(ts, k),
            lambda hs: F.array_distinct(_winnow_mins(hs, w)),
        ),
    )


#: Static power-of-two sequence-length boundaries for bucketed
#: batching (tensor2tensor / bucket_by_sequence_length style): a
#: document pads to the smallest cap ≥ its token count.
LENGTH_BUCKET_CAPS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def length_bucket_batching(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Length-bucketed batching report: assign every document to a
    FIXED power-of-two token-cap bucket and report, per bucket, the
    document count, token totals, padded cost (cap × docs — the
    static-shape padding a TPU-style loader pays), and padding
    efficiency. Fixed boundaries instead of quantile ntile() on
    purpose: quantiles need a global sort (single-partition window —
    a scale-killer), while cap assignment is a pure map + one bounded
    aggregation, the same plan at 60k docs and at 100 TB. Integer
    token counts keep every sum exact; the efficiency division is the
    only double op.

    Documents LONGER than the largest cap land in an explicit
    OVERFLOW bucket (``bucket_cap`` NULL): a static-shape loader has
    no cap that fits them, so their padded cost is reported as their
    own token sum (dynamic-shape batch, efficiency exactly 1.0) —
    keeping the 'smallest cap ≥ token count' invariant true for every
    non-NULL bucket instead of silently under-reporting the padded
    cost of >max-cap documents."""
    tc = token_count(F.col(text_col))
    cap = F.when(
        tc <= LENGTH_BUCKET_CAPS[-1], F.lit(LENGTH_BUCKET_CAPS[-1])
    )  # else NULL — the overflow bucket
    for c in reversed(LENGTH_BUCKET_CAPS[:-1]):
        cap = F.when(tc <= c, F.lit(c)).otherwise(cap)
    padded = F.coalesce(
        F.col("bucket_cap") * F.col("n_docs"), F.col("sum_tokens")
    )
    return (
        df.select(F.col(id_col), tc.alias("_tokens"), cap.alias("bucket_cap"))
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tokens").alias("sum_tokens"),
            F.max("_tokens").alias("max_tokens"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "sum_tokens",
            "max_tokens",
            padded.alias("padded_tokens"),
            (F.col("sum_tokens").cast("double") / padded.cast("double")).alias(
                "efficiency"
            ),
        )
    )


def build_vocabulary(
    docs: DataFrame, top_k: int = 16, text_col: str = "text"
) -> DataFrame:
    """Top-``top_k`` corpus vocabulary by token frequency (ties break
    lexicographically) — the tokenizer-training prep stage.

    Scale shape: one hash aggregation over exploded tokens (map-side
    combined, output bounded by DISTINCT terms, not corpus size), then
    a distributed TakeOrderedAndProject for the top-k — no
    single-partition window. Real deployments add a min-count threshold
    before the ordering so the agg output stays small; the selection
    logic is unchanged.
    """
    return (
        docs.select(F.explode(tokenize(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(top_k)
    )


def oov_rates(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document out-of-vocabulary token fraction against a bounded
    vocabulary (broadcast join — the corpus side never shuffles until
    the per-doc aggregation). Zero-token documents produce no row."""
    tok = docs.select(F.col(id_col), F.explode(tokenize(text_col)).alias("term"))
    v = vocab.select("term", F.lit(True).alias("_in_vocab"))
    per = (
        tok.join(F.broadcast(v), "term", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )
    return per.select(
        id_col,
        "n_tokens",
        "n_oov",
        (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias(
            "oov_rate"
        ),
    )


def feature_hash_vectors(
    docs: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Hashing-trick text vectorization (HashingVectorizer): each token
    maps to ``md5(token) mod n_buckets``; a document becomes a SPARSE
    L2-normalized term-frequency vector, one row per non-zero bucket —
    the bridge from raw text to a similarity-searchable embedding with
    no vocabulary state to train, ship, or keep consistent.

    All integer/IEEE-exact arithmetic (counts, sqrt of an integer sum
    of squares), so an independent engine reproduces every weight
    bit-for-bit. Scale shape: explode → one hash agg on (doc, bucket)
    → one window per doc for the norm; sparse output keeps shuffle
    volume ∝ non-zeros, never docs × n_buckets.
    """
    from etl_global_mobility_spark.operators.dedup import _md5_band_hash

    tok = docs.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("_term")
    )
    cnt = (
        tok.withColumn("bucket", _md5_band_hash(F.col("_term"), seed) % n_buckets)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = Window.partitionBy(id_col)
    return (
        cnt.withColumn(
            "_norm", F.sqrt(F.sum(F.col("_cnt") * F.col("_cnt")).over(w))
        )
        .select(
            id_col,
            "bucket",
            (F.col("_cnt").cast("double") / F.col("_norm")).alias("weight"),
        )
    )


#: Engine-portable normalization patterns (identical text parses the
#: same under Java regex and RE2): C0 controls minus \t\n\r plus DEL;
#: every Unicode whitespace (tab/newline/CR, space, NBSP, ogham,
#: general-punctuation spaces, line/para separators, narrow-NBSP,
#: math space, ideographic space); space(s) before closing punctuation.
NORM_CTRL_RE = "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}]"
NORM_WS_RE = (
    "[\\t\\n\\r \\x{00A0}\\x{1680}\\x{2000}-\\x{200A}"
    "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+"
)
NORM_PUNCT_RE = " +([.,;:!?])"


def normalize_text(
    df,
    text_col: str = "text",
    out_col: str = "norm_text",
):
    """Pre-dedup text normalization — the cleanup stage C4/CCNet-style
    pipelines run BEFORE hashing so trivially-different bytes (stray
    control characters, runs of exotic whitespace, spaced-out
    punctuation) don't defeat exact/near dedup:

    1. control characters (C0 + DEL) stripped;
    2. every Unicode-whitespace run collapsed to one ASCII space;
    3. space squeezed out before closing punctuation ``.,;:!?``;
    4. leading/trailing whitespace trimmed.

    Pure codegen regexp chain over the scan — zero shuffles at any
    scale. The pattern STRINGS below are module constants written in
    the ``\\x{...}`` escape form that Java regex and RE2-family
    engines parse identically, so an oracle can reuse them VERBATIM —
    the whole point is that two engines produce byte-identical
    normalized text. NULL text stays NULL (unevaluable rows keep
    their sentinel, per the quality-engine contract).
    """
    col = F.col(text_col)
    no_ctrl = F.regexp_replace(col, NORM_CTRL_RE, "")
    one_space = F.regexp_replace(no_ctrl, NORM_WS_RE, " ")
    # replacement backrefs differ by engine ($1 Java, \\1 RE2) — only
    # the PATTERN is shared
    tight = F.regexp_replace(one_space, NORM_PUNCT_RE, "$1")
    return df.withColumn(out_col, F.trim(tight))

def unigram_rarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram-LM corpus-rarity scoring — the CCNet/Wenzek'19
    perplexity-filter shape with rational arithmetic: each token's
    rarity is ``N / count(term)`` (corpus tokens over the term's
    corpus frequency, the reciprocal of its unigram probability), and
    every document reports the mean and max token rarity plus its
    hapax fraction. High mean rarity → noise/OCR garbage; very low →
    boilerplate; hapax_frac isolates the typo/gibberish tail. The
    statistic ranks identically to mean negative log-probability for
    any monotone curve while staying a single IEEE division per
    distinct term — portable across engines, unlike ln() whose
    last-ulp differs between libms (same trade as tfidf_top_terms).

    Scale shape (100 TB lens): everything runs at (doc, term)
    granularity, never token-level — ONE corpus scan feeds a
    (doc, term) tf aggregation whose exchange is shared (Spark
    ReusedExchange: the vocab branch and the join probe consume the
    IDENTICAL subtree, so the scan + explode + partial agg execute
    once); the vocab rollup and its 1-row total are vocab-sized
    follow-ons (the total broadcasts via crossJoin — bounded). The
    tf⋈vocab join on term is Zipf-skewed only up to one row per
    (doc, term) — "the" probes n_docs rows, not n_tokens — which AQE
    skew-split absorbs; the per-document re-aggregation keys on doc
    id (uniform). The mean weights each term's rarity by tf and is
    summed in EXACT integer micro-units (``N·10⁶ div cnt`` — integral
    division, bit-identical on any engine; a double→DECIMAL cast is
    NOT portable: Spark rounds the shortest decimal repr of the
    double while DuckDB rounds its exact binary value, so near-tie
    addends diverge), cast to double only for the final division.
    The micro-unit sum needs ``tf·N·10⁶`` per term to fit a BIGINT —
    at true 100 TB scale widen the sum to DECIMAL(38,0) (still
    exact); the statistic is unchanged."""
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokenize(text_col)).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n_total"))
    rarity = F.col("n_total").cast("double") / F.col("cnt").cast("double")
    return (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            "tf",
            F.col("cnt").alias("c"),
            rarity.alias("r"),
            (
                F.col("tf")
                * F.expr(
                    "(n_total * CAST(1000000 AS BIGINT)) DIV cnt"
                )
            ).alias("micro_wr"),
        )
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum("micro_wr").cast("double")
                / (F.sum("tf").cast("double") * F.lit(1000000.0))
            ).alias("mean_rarity"),
            F.max("r").alias("max_rarity"),
            F.coalesce(
                F.sum(F.when(F.col("c") == 1, F.col("tf"))), F.lit(0)
            ).alias("n_hapax"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "mean_rarity",
            "max_rarity",
            "n_hapax",
            (
                F.col("n_hapax").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("hapax_frac"),
        )
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    mod: int = 16,
) -> DataFrame:
    """Content-defined chunking (the LBFS/FastCDC boundary rule,
    token-level): a chunk boundary falls after token ``i + k - 1``
    whenever the 60-bit md5 hash of the k-gram ending there is
    divisible by ``mod``. Boundaries depend only on LOCAL content —
    expected chunk length ≈ ``mod`` tokens — so inserting or deleting
    a passage re-cuts at most its neighboring chunks while every
    other chunk (and its content hash) survives verbatim. That
    insertion stability is what makes CDC the sub-document dedup
    granularity: fixed-width shingles shift wholesale after one
    inserted word, while CDC chunk hashes keep matching, letting a
    pipeline drop repeated passages (licence blocks, navigation
    chrome) across billions of documents by one hash-groupBy over
    chunk hashes.

    Scale shape: the entire cut computation (k-gram hashes → cut
    positions → boundary pairs) is map-side array expressions inside
    one projection — no shuffle, no Python; ``posexplode`` then
    yields one bounded row per chunk carrying the md5 content hash.
    Every intermediate array is let-bound via :func:`_bind` (a bare
    expression inside an F.transform lambda re-evaluates per element
    — the O(n²) trap), and the token array rides through the explode
    so chunk text slices without re-tokenizing. Documents shorter
    than ``k`` tokens form a single chunk; empty documents yield no
    rows (the DuckDB-unnest convention)."""
    from etl_global_mobility_spark.operators.dedup import _md5_band_hash

    empty_int = F.array().cast("array<int>")

    def pairs_of(ts: Column, hs: Column) -> Column:
        cuts = F.when(
            F.size(hs) >= 1,
            F.filter(
                F.sequence(F.lit(1), F.size(hs)),
                lambda j: F.element_at(hs, j) % mod == 0,
            ),
        ).otherwise(empty_int)
        bounds = F.concat(
            F.array(F.lit(0)),
            F.transform(cuts, lambda j: j + F.lit(k - 1)),
            F.array(F.size(ts)),
        )
        return _bind(
            bounds,
            lambda bs: F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.size(bs) - 1),
                    lambda b: F.struct(
                        F.element_at(bs, b).alias("s"),
                        F.element_at(bs, b + 1).alias("e"),
                    ),
                ),
                lambda p: p["e"] > p["s"],
            ),
        )

    carrier = _bind(
        tokenize(F.col(text_col)),
        lambda ts: _bind(
            _winnow_hashes(ts, k),
            lambda hs: F.struct(
                ts.alias("toks"), pairs_of(ts, hs).alias("pairs")
            ),
        ),
    )
    exploded = df.select(
        F.col(id_col), F.inline(F.array(carrier))
    ).select(
        F.col(id_col),
        F.col("toks"),
        F.posexplode(F.col("pairs")).alias("chunk_idx", "pair"),
    )
    chunk_text = F.concat_ws(
        " ",
        F.slice(
            F.col("toks"),
            F.col("pair.s") + 1,
            F.col("pair.e") - F.col("pair.s"),
        ),
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("pair.s").cast("int").alias("chunk_start"),
        (F.col("pair.e") - F.col("pair.s")).cast("int").alias("n_tokens"),
        F.md5(chunk_text).alias("chunk_hash"),
    )


def keyword_tag_report(
    df: DataFrame,
    keywords: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_min_hits: int = 1,
) -> DataFrame:
    """Keyword tagging — the C4 'badwords' filter shape, generalized to
    any policy/topic list: per document, total keyword occurrences,
    distinct keywords matched, the hit fraction of the token stream,
    and a flag at ``flag_min_hits``. The list rides into the plan as a
    bounded literal array (policy lists are thousands of entries), so
    the whole report is a zero-shuffle map pass — at 100 TB this is
    the cheapest filter a corpus runs, which is exactly why crawls run
    it FIRST, before any aggregation-shaped signal.

    Matching is token-exact after :func:`tokenize` normalization
    (lowercase, whitespace split) — deliberately NOT substring
    matching, which is the documented C4 failure mode (flagging
    'Scunthorpe' for a 4-letter infix)."""
    if not keywords:
        raise ValueError("empty keyword list: the report would tag nothing")
    kws = F.lit([k.lower() for k in keywords]).cast("array<string>")
    return (
        df.select(F.col(id_col), tokenize(text_col).alias("__toks"))
        .select(
            id_col,
            F.size("__toks").alias("n_tokens"),
            F.size(
                F.filter("__toks", lambda t: F.array_contains(kws, t))
            ).alias("n_hits"),
            F.size(F.array_intersect("__toks", kws)).alias("n_distinct_kw"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_hits",
            "n_distinct_kw",
            (
                F.col("n_hits").cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
            ).alias("hit_frac"),
            (F.col("n_hits") >= flag_min_hits).alias("flagged"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
    micro: int = 1_000_000,
) -> DataFrame:
    """Top-``top_k`` collocations by pointwise mutual information —
    the classic 'which word pairs belong together' report a tokenizer/
    phrase-mining pass runs over a corpus. PMI = log p(xy)/(p(x)p(y));
    log is monotone and engine-divergent (correctly-rounded ln is not
    guaranteed identical across engines), so the score is reported as
    the EXACT integer ratio ``(c_xy · N · micro) DIV (c_x · c_y)`` —
    the same ordering, bit-reproducible anywhere (DECIMAL(38,0)
    widening keeps the triple product exact far past BIGINT).

    Scale shape: map-side bigram construction (zip_with over two
    slices — no posexplode self-join), ONE corpus-sized bigram
    aggregation and one unigram aggregation (both uniform hash keys,
    map-side combined, outputs ∝ vocabulary), two equi-joins of the
    bigram table against the unigram counts (AQE broadcasts the
    unigram side when the vocabulary is small), a 1-row total-token
    broadcast, and a distributed TakeOrderedAndProject for the top-k.
    ``min_count`` prunes the hapax tail BEFORE the joins."""
    toks = F.col("__toks")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("x"), b.alias("y")),
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    base = df.select(tokenize(text_col).alias("__toks"))
    uni = (
        base.select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = uni.agg(F.sum("c").alias("n_total"))
    bi = (
        base.select(F.explode(bigrams).alias("bg"))
        .select(F.col("bg.x").alias("x"), F.col("bg.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    scored = (
        bi.join(uni.select(F.col("t").alias("x"), F.col("c").alias("c_x")), "x")
        .join(uni.select(F.col("t").alias("y"), F.col("c").alias("c_y")), "y")
        .crossJoin(F.broadcast(total))  # 1-row corpus token total
        .select(
            "x",
            "y",
            "c_xy",
            "c_x",
            "c_y",
            F.expr(
                f"(cast(c_xy as decimal(38,0)) * n_total * {micro})"
                " div (cast(c_x as decimal(38,0)) * c_y)"
            ).alias("pmi_micro"),
        )
    )
    return scored.orderBy(
        F.col("pmi_micro").desc(), F.col("x"), F.col("y")
    ).limit(top_k)
