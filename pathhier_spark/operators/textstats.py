"""Text analysis operators: quality scoring, language ID, token counting,
document fingerprinting, PII scrubbing, repetition signals, boilerplate
phrase mining.

All per-document operators are pure column expressions (whole-stage
codegen; no UDFs) so they run at scan speed over a 100 TB documents table —
they are the map stage of a training-data pipeline and do not shuffle. The
one exception is the corpus-level `boilerplate_ngrams`, whose single
combiner-friendly groupBy is its whole point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pathhier_spark.functions.text import STOPWORDS, WS_SPLIT_RE

# tiny per-language function-word lists for the n-gram/stopword heuristic
# language-ID (public common knowledge; deterministic)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "que"],
    "es": ["el", "la", "los", "de", "que", "es", "una", "por"],
}


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT_RE), lambda t: t != ""
    )


def with_quality_features(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Quality-scoring features: char/token counts, mean token length,
    punctuation ratio, stopword ratio, distinct-token ratio. The composite
    `quality_score` is a simple deterministic blend for filtering."""
    toks = _tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    stop_lit = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_lit, t)))
    # explicit whitespace class, not \s: Java's \s matches \x0B, RE2's (the
    # DuckDB oracle's) does not — same parity rule as WS_SPLIT_RE
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w \t\n\f\r]", "")
    )
    distinct_ratio = F.when(
        n_tokens > 0, F.size(F.array_distinct(toks)).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    out = (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn(
            "mean_token_len",
            F.when(n_tokens > 0, (F.length(F.concat_ws("", toks))).cast("double") / n_tokens)
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0)),
        )
        .withColumn("distinct_ratio", distinct_ratio)
    )
    return out.withColumn(
        "quality_score",
        F.round(
            0.4 * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
            + 0.3 * F.col("distinct_ratio")
            + 0.3 * (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))),
            6,
        ),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score each language by fraction of its
    marker words present; predict the argmax (ties -> lexicographic lang).
    Emits lang_pred and per-language scores."""
    toks = F.array_distinct(_tokens(text_col))
    out = df
    for lang, markers in sorted(LANG_MARKERS.items()):
        marker_lit = F.array(*[F.lit(w) for w in markers])
        out = out.withColumn(
            f"score_{lang}",
            F.size(F.array_intersect(toks, marker_lit)).cast("double") / len(markers),
        )
    best = None
    for lang in sorted(LANG_MARKERS):
        s = F.col(f"score_{lang}")
        if best is None:
            best = F.struct(s.alias("s"), F.lit(lang).alias("l"))
        else:
            best = F.when(s > best["s"], F.struct(s.alias("s"), F.lit(lang).alias("l"))).otherwise(best)
    return out.withColumn("lang_pred", best["l"])


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish subword
    estimate (word-piece count ~ ceil(len/4) per word — the standard
    chars/4 heuristic, computed exactly per token)."""
    toks = _tokens(text_col)
    return df.withColumn("ws_tokens", F.size(toks).cast("long")).withColumn(
        "bpe_tokens_est",
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
        ),
    )


def with_fingerprint(
    df: DataFrame, text_col: str = "text", window: int = 8
) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum md5 (lexicographic)
    over each sliding window of `window` tokens, collected as a sorted
    distinct set. md5 hex strings are engine-portable (DuckDB computes the
    identical value for the oracle check). Robust to small edits; equality
    of fingerprints => near-identical docs."""
    toks = _tokens(text_col)
    n = F.size(toks)
    grams = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window))),
        ),
    ).otherwise(F.array(F.md5(F.concat_ws(" ", toks))))
    return df.withColumn(
        "fingerprint", F.sort_array(F.array_distinct(F.slice(F.sort_array(grams), 1, 16)))
    )


def winnowing_fingerprints(
    df: DataFrame,
    *,
    k: int = 4,
    w: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TRUE winnowing (Schleimer/Wilkerson/Aiken's MOSS selection): hash
    every k-token gram (md5 hex), then select the MINIMUM hash of each
    sliding window of w consecutive gram positions (lexicographic min —
    the total order md5 hex shares across engines), distinct per
    document. Unlike `with_fingerprint`'s global bottom-16 sketch (q23),
    the per-window selection carries the winnowing GUARANTEE: any token
    run of length >= w + k - 1 shared by two documents covers at least
    one full hash window in each, and the minimum of that window is
    selected in BOTH — local quote/plagiarism overlap cannot be missed,
    which no global bottom-k can promise. Documents with >= k tokens but
    fewer than w grams select the single global-min gram (the whole doc
    is one window); documents with < k tokens emit nothing.

    Scale shape: map-only column expressions — O(grams * w) string
    compares per document, zero shuffle; expected selected density is
    2/(w+1) of gram positions, so the output is a bounded fraction of
    the token stream at any corpus size. Output: (id_col, fp) long
    format, one row per distinct selected fingerprint per document."""
    if k < 1 or w < 1:
        raise ValueError("winnowing needs k >= 1 and w >= 1")
    t = df.select(
        F.col(id_col).alias("_id"), _tokens(text_col).alias("_ts")
    ).filter(F.size("_ts") >= k)
    g = t.select(
        "_id",
        F.transform(
            F.sequence(F.lit(1), F.size("_ts") - (k - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice("_ts", i, k))),
        ).alias("g"),
    )
    m = F.size("g")
    sel = F.when(
        m >= w,
        F.transform(
            F.sequence(F.lit(1), m - (w - 1)),
            lambda j: F.array_min(F.slice("g", j, w)),
        ),
    ).otherwise(F.array(F.array_min("g")))
    return g.select(
        F.col("_id").alias(id_col),
        F.explode(F.array_distinct(sel)).alias("fp"),
    )


def winnowing_matches(
    df: DataFrame,
    *,
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unordered document pairs sharing >= min_shared winnowing
    fingerprints — the guaranteed-detection local-overlap join: any pair
    sharing a token run of length >= w + k - 1 appears with shared >= 1
    (set min_shared=1 for the pure guarantee; higher values trade the
    guarantee for precision against one-off collisions). The fingerprint
    table feeds both sides of the self-join, so it is checkpointed once
    (the q52 shared-subtree discipline) rather than re-winnowed per side.

    Scale shape: one equi-join keyed on the fingerprint hash — posting
    lists per fp are short on clean text but boilerplate grams make hot
    keys, the q85 caveat: strip boilerplate (q40) upstream, or cap
    postings, before joining a web-scale corpus. Output:
    (a, b, shared), a < b."""
    fps = winnowing_fingerprints(
        df, k=k, w=w, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=False)
    a = fps.select(F.col(id_col).alias("a"), "fp")
    b = fps.select(F.col(id_col).alias("b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


# --- PII scrubbing (training-data prep: redact before the corpus ships) ---

# conservative, engine-portable patterns (identical semantics under Java
# regex and RE2): emails, IPv4 literals, NANP-style phone numbers, and
# 13-16-digit card-number candidates (validated by a Luhn checksum before
# redaction — an all-digit run that fails Luhn is NOT a card and stays).
# Broader PII classes (physical addresses, national IDs) need locale-aware
# models, out of scope here.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\(\d{3}\) \d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b"
PII_CC_RE = r"\b\d{13,16}\b"


def luhn_valid(s: Column) -> Column:
    """Luhn checksum over a digit string — pure integer column arithmetic
    (F.aggregate over the digit positions from the right), expressible
    identically in any SQL engine (q42's oracle)."""
    n = F.length(s)

    def term(acc, i):
        d = F.substring(s, n - i + 1, F.lit(1)).cast("int")
        dd = d * 2
        return acc + F.when(i % 2 == 1, d).otherwise(
            dd - F.when(dd > 9, F.lit(9)).otherwise(F.lit(0))
        )

    return F.aggregate(F.sequence(F.lit(1), n), F.lit(0), term) % 10 == 0


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails -> <EMAIL>, IPv4 literals -> <IP>, phone numbers ->
    <PHONE>, and Luhn-valid card numbers -> <CC>, keeping per-document
    match counts (n_emails, n_ipv4, n_phones, n_ccs) for pipeline metrics.
    Pure column expressions — map-only, scan-speed; the Luhn-conditional
    card scrub is a fold (F.aggregate) over the validated candidates, each
    replaced with word boundaries so a card number embedded in a longer
    digit run is never touched.

    Scrub order matters and each count is taken on the PREVIOUS
    intermediate so counts == redactions actually made: the address part of
    user@host can contain dotted digits (email before IPv4), and phone
    separators must be consumed before card-candidate extraction."""
    t = F.col(text_col)
    email_scrubbed = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    ip_scrubbed = F.regexp_replace(email_scrubbed, PII_IPV4_RE, "<IP>")
    phone_scrubbed = F.regexp_replace(ip_scrubbed, PII_PHONE_RE, "<PHONE>")
    cc_valid = F.filter(
        F.regexp_extract_all(phone_scrubbed, F.lit(PII_CC_RE), 0), luhn_valid
    )
    scrubbed = F.aggregate(
        cc_valid,
        phone_scrubbed,
        lambda acc, c: F.regexp_replace(
            acc, F.concat(F.lit(r"\b"), c, F.lit(r"\b")), F.lit("<CC>")
        ),
    )
    return (
        df.withColumn(
            "n_emails",
            # idx=0 = whole match (the default idx=1 expects a capture group)
            F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0)).cast("long"),
        )
        .withColumn(
            # counted on the EMAIL-SCRUBBED intermediate so the count equals
            # the replacements actually made: dotted digits inside an
            # address (a@1.2.3.4.win) are consumed by the email pass and
            # must not also report an IP redaction that never happened
            "n_ipv4",
            F.size(
                F.regexp_extract_all(email_scrubbed, F.lit(PII_IPV4_RE), 0)
            ).cast("long"),
        )
        .withColumn(
            "n_phones",
            F.size(
                F.regexp_extract_all(ip_scrubbed, F.lit(PII_PHONE_RE), 0)
            ).cast("long"),
        )
        .withColumn("n_ccs", F.size(cc_valid).cast("long"))
        .withColumn("text_scrubbed", scrubbed)
    )


# --- n-gram repetition (Gopher-style quality signal) ---


def _word_ngrams(toks: Column, n: int) -> Column:
    size = F.size(toks)
    return F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(0), size - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_ngram_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Duplicate word-n-gram fractions (1 - distinct/total for n=2,3) — the
    Gopher repetition signals used to drop looping/boilerplate documents.
    Map-only column expressions; docs shorter than n grams score 0."""
    toks = _tokens(text_col)

    def frac(n: int) -> Column:
        grams = _word_ngrams(toks, n)
        total = F.size(grams)
        return F.when(
            total > 0,
            1.0 - F.size(F.array_distinct(grams)) / total.cast("double"),
        ).otherwise(F.lit(0.0))

    return df.withColumn("dup_2gram_frac", frac(2)).withColumn(
        "dup_3gram_frac", frac(3)
    )


# --- corpus-level boilerplate phrase mining ---


def boilerplate_ngrams(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_doc_freq: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """Corpus-wide boilerplate n-gram mining: the distinct word-n-grams of
    each document, aggregated to (gram, doc_freq), thresholded, top_k by
    document frequency. The standard first step of boilerplate removal at
    corpus scale (find the hot phrases, then strip them per-document —
    segment_dedup's cousin that targets RECURRING phrases rather than
    first-occurrence keeps).

    Scale shape: per-doc distinct BEFORE the explode bounds a document's
    contribution to 1 per gram; the groupBy count has map-side partial
    aggregation (hot boilerplate grams combine per task, never funneling);
    the final top_k is a global TakeOrdered on the already-aggregated
    (gram, doc_freq) table — no window, no skew. This is the module's one
    deliberately-shuffling operator."""
    toks = _tokens(text_col)
    grams = F.array_distinct(_word_ngrams(toks, n))
    return (
        df.select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
        .orderBy(F.col("doc_freq").desc(), F.col("gram"))
        .limit(top_k)
    )


def strip_boilerplate(
    df: DataFrame,
    phrases: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Remove every occurrence of the mined boilerplate n-grams (the
    `boilerplate_ngrams` output, column `gram`) from each document —
    the strip half of corpus boilerplate removal: mine hot phrases once,
    then clean the whole corpus against them.

    A token is dropped iff it is covered by ANY occurrence of a boilerplate
    n-gram (overlapping occurrences union). Output adds (text_stripped,
    n_stripped_tokens).

    Scale shape: documents explode to (doc_id, pos, gram) rows and
    broadcast-join the phrase table (top-k mined phrases — tiny by
    construction); matched start positions come back via one
    groupBy(doc_id) collect_set, and the per-token coverage test is a pure
    column expression (exists over the starts array). The document side
    shuffles once, keyed by doc_id — uniform."""
    toks = _tokens(text_col)
    with_toks = df.withColumn("_toks", toks)
    grams = with_toks.select(
        F.col(id_col),
        F.posexplode(_word_ngrams(F.col("_toks"), n)).alias("pos", "gram"),
    )
    hits = (
        grams.join(F.broadcast(phrases.select("gram")), "gram")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("_starts"))
    )
    joined = with_toks.join(hits, id_col, "left").withColumn(
        "_starts",
        F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
    )
    # sequence(0, -1) would DESCEND for an empty token list — guard it
    idx = F.when(
        F.size(F.col("_toks")) > 0,
        F.sequence(F.lit(0), F.size(F.col("_toks")) - 1),
    ).otherwise(F.array().cast("array<int>"))
    kept = F.filter(
        idx,
        lambda i: ~F.exists(
            F.col("_starts"), lambda s: (i >= s) & (i < s + n)
        ),
    )
    return (
        joined.withColumn(
            "text_stripped",
            F.concat_ws(
                " ", F.transform(kept, lambda i: F.element_at(F.col("_toks"), i + 1))
            ),
        )
        .withColumn(
            "n_stripped_tokens",
            (F.size(F.col("_toks")) - F.size(kept)).cast("long"),
        )
        .drop("_toks", "_starts")
    )


# --- corpus-level unigram surprisal (language-model-lite quality signal) ---


def unigram_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Mean unigram surprisal per document: avg over the document's tokens
    of -ln(count(token) / N) under the CORPUS's own unigram distribution
    (N = total token occurrences). High values flag documents whose
    vocabulary is rare for the corpus — gibberish, other-language residue,
    encoding damage — the cheap stand-in for LM-perplexity filtering in
    pretraining prep.

    Scale shape: token counts are one combiner-friendly groupBy; the corpus
    total rides a one-row crossJoin (no driver action); the per-token
    frequency lookup is a broadcast join by default (vocabulary ~ millions
    of rows = broadcastable; pass broadcast_vocab=False for truly unbounded
    vocabularies — the join keys on token, where Zipf-hot keys are exactly
    the well-replicated ones, and AQE's skew join splits the probe side).

    Determinism: the per-document sum folds ln(count) over the document's
    tokens IN POSITION ORDER (array_sort by pos, then a sequential
    F.aggregate) — not a float sum across shuffled rows — so the result is
    bit-stable and engine-portable (q44's oracle replays the same
    left-to-right fold). avg = ln(N) - sum(ln c)/n."""
    toks = df.select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "tok")
    )
    freqs = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_count"))
    total = freqs.agg(F.sum("tok_count").alias("n_total"))
    f = F.broadcast(freqs) if broadcast_vocab else freqs
    per_doc = (
        toks.join(f, "tok")
        .select(id_col, "pos", F.log(F.col("tok_count").cast("double")).alias("lnc"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "lnc"))),
                    lambda s: s["lnc"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sum_lnc"),
        )
    )
    return (
        per_doc.crossJoin(F.broadcast(total))
        .select(
            id_col,
            "n_tokens",
            (
                F.log(F.col("n_total").cast("double"))
                - F.col("sum_lnc") / F.col("n_tokens")
            ).alias("avg_surprisal"),
        )
    )


# --- exact corpus percentiles via value histogram (scale-correct) ---


def token_count_percentiles(
    df: DataFrame,
    *,
    text_col: str = "text",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """EXACT corpus percentiles of per-document token counts, computed the
    way exact order statistics stay tractable at 100 TB: a value HISTOGRAM
    (one combiner-friendly groupBy over the small discrete domain of
    token counts), then a cumulative walk over the histogram — never a
    global sort of N rows, never a single-partition window over the corpus
    (the one window here orders the histogram, whose size is the number of
    DISTINCT counts, independent of corpus row count).

    Rank definition (engine-portable, integer-exact): percentile q = the
    element at 0-indexed position floor((n-1)*q) of the sorted values =
    the smallest v whose cumulative count reaches that rank + 1
    (inverted-CDF / 'lower' interpolation — no float interpolation to
    diverge between engines). Output: one row
    (n_docs, p<q*100> per q)."""
    from pyspark.sql import Window

    counts = df.select(F.size(_tokens(text_col)).cast("long").alias("v"))
    hist = counts.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    # n = max cumulative count — a second window over the (tiny) histogram,
    # NOT a separate hist.agg branch: Spark would not share the uncached
    # corpus-scan subtree between two consumers, and this operator's whole
    # point is a single pass over the documents
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.max("cum").over(w_all)
    )
    return cum.agg(
        F.max("n").alias("n_docs"),
        *[
            F.min(
                F.when(
                    F.col("cum")
                    >= F.floor((F.col("n") - 1).cast("double") * F.lit(q)) + 1,
                    F.col("v"),
                )
            ).alias(f"p{int(q * 100)}")
            for q in qs
        ],
    )


# --- KMV (k-minimum-values) distinct-count sketch ---


def kmv_distinct(
    df: DataFrame, col: str, *, k: int = 256
) -> DataFrame:
    """K-minimum-values cardinality sketch — the deterministic sketch:
    hash every value with md5 (engine-portable hex32 -> uniform 32-bit
    integers), keep the k smallest DISTINCT hashes, and estimate
    n_distinct = (k-1) / u_k where u_k is the k-th minimum normalized to
    [0, 1). Unlike HLL, every step is exactly reproducible in any engine
    with md5 (q50 carries a full value oracle), and the sketch is
    mergeable: the union of two KMV min-sets, re-cut to k, is the sketch
    of the union (asserted in tests).

    Scale shape: dedup-then-TakeOrdered — the distinct is a combiner
    groupBy on the hash, and orderBy(h).limit(k) is Spark's distributed
    partial top-k (each partition keeps only k candidates; no global
    sort materializes). Returns one row: (k_used, kth_hash, est_distinct)
    — when the domain has fewer than k distinct values the count is exact
    (k_used = domain size, est = that)."""
    hashes = (
        df.select(
            F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
            .cast("long")
            .alias("h")
        )
        .groupBy("h")
        .agg(F.lit(1).alias("_one"))
        .select("h")
    )
    mins = hashes.orderBy("h").limit(k)
    return mins.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_hash"),
    ).select(
        "k_used",
        "kth_hash",
        F.when(
            F.col("k_used") < k, F.col("k_used").cast("double")
        )
        .otherwise(
            (F.lit(float(k - 1)))
            / (F.col("kth_hash").cast("double") / F.lit(float(1 << 32)))
        )
        .alias("est_distinct"),
    )


def countmin_sketch(
    df: DataFrame, col: str, *, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Count-min sketch of value frequencies — the deterministic,
    mergeable counter sketch next to kmv_distinct's cardinality sketch:
    `depth` independent md5-derived hash rows, each value incrementing
    one of `width` counters per row. Sketch state is depth x width int64
    counters regardless of corpus size; two sketches over disjoint data
    merge by elementwise ADDITION (asserted in tests), which is what makes
    the sketch a per-partition → global two-level aggregate at cluster
    scale. All hashes are engine-portable (md5 hex32), so the full
    counter table — and therefore every estimate — is value-reproducible
    in SQL (q60's oracle).

    Build shape: explode each value into its `depth` (row, bucket) cells
    map-side, then ONE combiner-friendly groupBy sums — identical
    physical shape to minhash_signatures. Returns (row, bucket, cnt),
    only non-zero cells (the sketch's zero cells carry no information)."""
    cells = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(f"cms:{i}:"),
                                        F.col(col).cast("string"),
                                    )
                                ),
                                1, 8,
                            ),
                            16, 10,
                        ).cast("long")
                        % F.lit(width)
                    ).alias("bucket"),
                )
                for i in range(depth)
            ])
        ).alias("c")
    )
    return (
        cells.groupBy("c.row", "c.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, *, width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates from a count-min sketch: for each probe
    value, est = min over rows of counter[row][bucket_row(value)] — an
    OVERESTIMATE bounded by true_count + eps*N with probability
    1 - (1/2)^depth (the classic CMS guarantee). The probe side maps each
    value to its depth cells (same md5 hashing as the build) and joins
    the sketch on (row, bucket) — probe-set-sized work, never a corpus
    scan. Missing cells count as 0 (value never seen in that row)."""
    cells = probes.select(
        F.col(col).alias("_probe"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(f"cms:{i}:"),
                                        F.col(col).cast("string"),
                                    )
                                ),
                                1, 8,
                            ),
                            16, 10,
                        ).cast("long")
                        % F.lit(width)
                    ).alias("bucket"),
                )
                for i in range(depth)
            ])
        ).alias("c"),
    ).select("_probe", "c.row", "c.bucket")
    joined = cells.join(sketch, ["row", "bucket"], "left").select(
        "_probe", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return (
        joined.groupBy("_probe")
        .agg(F.min("cnt").alias("est_count"))
        .withColumnRenamed("_probe", col)
    )


def pmi_pairs(
    df: DataFrame,
    text_col: str = "text",
    *,
    cap: int = 20,
    min_pairs: int = 5,
) -> DataFrame:
    """Document-level PMI collocations: token pairs that co-occur in the
    same document more often than their marginals predict —
    pmi(x, y) = ln(N * c_xy / (c_x * c_y)) over document-level indicator
    counts. The classic collocation / related-term signal for corpus
    exploration and vocabulary mining.

    Per document only the first ``cap`` FIRST-OCCURRENCE distinct tokens
    participate (min-position + row_number, deterministic), which bounds
    the per-document pair fan-out at cap*(cap-1)/2 regardless of document
    length — the property that keeps the self-join linear in corpus size
    at 100 TB. Marginal and pair counts are combiner-friendly groupBys;
    nothing windows over a corpus-sized partition.

    Returns (x, y, c_xy, pmi) with x < y, c_xy >= min_pairs, pmi UNROUNDED
    (callers round for display; ranking happens on the exact value).
    """
    toks = df.select(
        "doc_id", F.posexplode(_tokens(text_col)).alias("pos", "term")
    )
    mp = toks.groupBy("doc_id", "term").agg(F.min("pos").alias("mp"))
    w = Window.partitionBy("doc_id").orderBy("mp", "term")
    capped = (
        mp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select("doc_id", "term")
    )
    n_docs = df.select(F.count(F.lit(1)).cast("long").alias("n"))
    cx = capped.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c"))
    pairs = (
        capped.alias("a")
        .join(capped.alias("b"), "doc_id")
        .filter(F.col("a.term") < F.col("b.term"))
        .select(F.col("a.term").alias("x"), F.col("b.term").alias("y"))
    )
    cxy = (
        pairs.groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
        .filter(F.col("c_xy") >= min_pairs)
    )
    return (
        cxy.join(F.broadcast(cx.withColumnRenamed("term", "x").withColumnRenamed("c", "c_x")), "x")
        .join(F.broadcast(cx.withColumnRenamed("term", "y").withColumnRenamed("c", "c_y")), "y")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "pmi",
            F.log(
                (F.col("c_xy") * F.col("n")).cast("double")
                / (F.col("c_x") * F.col("c_y"))
            ),
        )
        .select("x", "y", "c_xy", "pmi")
    )


def _hll_hash_cols(col: str, m: int, prefix: str):
    """(register index j, leading-zero rank rho) for the md5-derived 32-bit
    hash split — shared by the global and grouped HLL builders; m must be a
    power of two so both the index split and the tail division are exact
    integer ops on any engine."""
    if m & (m - 1) != 0:
        raise ValueError(f"m must be a power of two, got {m}")
    tail_bits = 32 - (m.bit_length() - 1)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(prefix + ":"), F.col(col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = (h / F.lit(m)).cast("long")  # exact: m is a power of two
    rho = F.when(w == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits + 1) - F.length(F.bin(w))
    )
    return (h % m).cast("long"), rho


def hll_registers(
    df: DataFrame, col: str, *, m: int = 64, prefix: str = "hll"
) -> DataFrame:
    """HyperLogLog registers over a column — the last member of the
    deterministic sketch family (KMV order statistics -> distinct count,
    count-min -> frequencies, Bloom -> membership, HLL -> distinct count
    in O(m) memory with ~1.04/sqrt(m) relative error).

    Everything is md5-derived (the engine-portable hex32): the 32-bit hash
    splits into a register index (h % m, m a power of two so the integer
    split is exact on any engine) and a (32 - log2(m))-bit tail w whose
    leading-zero rank rho = maxbits + 1 - bitlength(w) feeds the register
    max. The build is ONE combiner-friendly max-aggregate with at most m
    groups — registers from disjoint partitions (or days, or shards)
    merge by elementwise max, asserted in tests. Returns exactly m rows
    (j, reg), absent registers as 0.
    """
    j, rho = _hll_hash_cols(col, m, prefix)
    built = (
        df.select(j.alias("j"), rho.alias("rho"))
        .groupBy("j")
        .agg(F.max("rho").cast("long").alias("reg"))
    )
    allj = df.sparkSession.range(m).select(F.col("id").alias("j"))
    return F.broadcast(allj).join(built, "j", "left").select(
        "j", F.coalesce("reg", F.lit(0)).cast("long").alias("reg")
    )


def hll_estimate(registers: DataFrame, *, m: int = 64) -> DataFrame:
    """Distinct-count estimate from HLL registers: raw harmonic-mean
    estimate alpha_m * m^2 / sum(2^-reg), with the standard small-range
    correction (linear counting m*ln(m/V) when the raw estimate is under
    2.5m and V registers are still zero). Every 2^-reg term is an exact
    dyadic double (built from an integer power-of-two literal array, not
    libm pow), so the sum — and therefore the estimate — is reproducible
    bit-for-bit regardless of summation order or engine (q68's oracle
    recomputes it in SQL). Returns one row (est, n_zero)."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    pow2 = F.array(*[F.lit(float(1 << k)) for k in range(34)])
    inv = F.lit(1.0) / F.element_at(pow2, (F.col("reg") + 1).cast("int"))
    agg = registers.agg(
        F.sum(inv).alias("s"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).cast("long").alias(
            "n_zero"
        ),
    )
    raw = F.lit(alpha * m * m) / F.col("s")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")),
    ).otherwise(raw)
    return agg.select(corrected.alias("est"), "n_zero")


def strip_repeated_ngrams(
    df: DataFrame, text_col: str = "text", *, n: int = 3
) -> DataFrame:
    """Remove within-document n-gram repetition: a token at position i is
    dropped when the n-gram STARTING at i has already occurred earlier in
    the document (first occurrence kept; the final n-1 positions start no
    full gram and always survive). This is the removal counterpart of
    with_ngram_repetition's Gopher-style detection — detection scores the
    doc, this operator actually cleans it, the way C4/Gopher pipelines
    strip boilerplate-ish loops ("click here click here click here ...").

    Plan shape: posexplode to (row, pos, gram) -> one combiner-friendly
    groupBy(row, gram) min-pos aggregate (first occurrences) -> rebuild
    each doc from its kept positions with a position-ordered collect.
    Two narrow shuffles keyed by the row — the line-dedup (q41) shape.
    An earlier version computed first-occurrence per position with
    array_position inside a nested higher-order lambda, "map-only, no
    shuffle" — but Spark evaluates higher-order functions on the
    interpreted CodegenFallback path and re-derives the gram-array
    subexpression per lambda element, turning O(L^2) logical work into
    O(L^2) gram-ARRAY REBUILDS (~16 ms per 100-token doc, 80x slower
    than DuckDB on the same expression shape). The exploded form does
    strictly more "work" on paper and runs two orders of magnitude
    faster — measured, not assumed. Exact SQL twin unchanged (q69's
    oracle rebuilds the cleaned text and matches its md5). Adds
    `clean_text` and `n_dropped`.
    """
    from pyspark.sql import Window

    rid = F.monotonically_increasing_id()
    # lazy-checkpoint: `base` feeds both the exploded branch and the final
    # join-back, and monotonically_increasing_id is NONDETERMINISTIC across
    # recomputations — without materialization the two branches could
    # assign different ids to the same row and the join would mispair
    base = (
        df.withColumn("_sr_id", rid)
        .withColumn("_sr_toks", _tokens(text_col))
        .localCheckpoint(eager=False)
    )
    L = F.size(F.col("_sr_toks"))
    ex = base.select(
        "_sr_id",
        L.alias("_sr_n"),
        F.posexplode_outer(F.col("_sr_toks")).alias("pos", "tok"),
    )
    # gram starting at pos: needs the n tokens at pos..pos+n-1 — lead()
    # over the in-doc order, NULL past the end (tail positions keep)
    w = Window.partitionBy("_sr_id").orderBy("pos")
    gram_parts = [F.col("tok")] + [
        F.lead("tok", k).over(w) for k in range(1, n)
    ]
    grams = ex.withColumn(
        "gram",
        F.when(
            F.col("pos") <= F.col("_sr_n") - n,
            F.concat_ws(" ", *gram_parts),
        ),
    )
    first = Window.partitionBy("_sr_id", "gram")
    kept = grams.withColumn(
        "keep",
        F.col("gram").isNull() | (F.col("pos") == F.min("pos").over(first)),
    )
    rebuilt = kept.groupBy("_sr_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "tok"))
                    )
                ),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).cast("long").alias(
            "n_dropped"
        ),
    )
    return (
        base.join(rebuilt, "_sr_id", "left")
        .withColumn("clean_text", F.coalesce("clean_text", F.lit("")))
        .withColumn(
            "n_dropped", F.coalesce("n_dropped", F.lit(0)).cast("long")
        )
        .drop("_sr_id", "_sr_toks")
    )


def grouped_value_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    qs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-GROUP percentiles by the value-histogram method — the
    grouped form of token_count_percentiles: build a (group, value)
    histogram (one combiner-friendly groupBy), cumulate within each group
    (the window orders the group's DISTINCT VALUES, not its rows — state
    is domain-sized, corpus-size independent), then pick each quantile by
    the inverted-CDF integer rank floor((n-1)*q)+1 with a conditional min
    — no interpolation, so the result is an actual data value and exact
    on any engine. One output row per group with a p<q> column per
    requested quantile.
    """
    hist = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.partitionBy("g").orderBy("v")
    wall = Window.partitionBy("g")
    cum = hist.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.max(F.sum("c").over(wcum)).over(wall)
    )
    aggs = [
        F.min(
            F.when(
                F.col("cum")
                >= F.floor((F.col("n") - 1) * F.lit(q)) + 1,
                F.col("v"),
            )
        ).alias(f"p{str(q).replace('0.', '').ljust(2, '0')}")
        for q in qs
    ]
    return cum.groupBy("g").agg(*aggs).withColumnRenamed("g", group_col)


# Literal weights for the logistic quality classifier. In production these
# come from a trained model (a fastText/logreg quality classifier à la
# GPT-3/CCNet curation); here they are fixed constants so the op is
# deterministic and oracle-checkable — the INFERENCE plan is the deliverable
# (pure column expressions, map-only), not the training run.
QUALITY_LOGIT_WEIGHTS = {
    "bias": -2.0,
    "len_cap": 3.0,          # min(n_tokens/100, 1)
    "distinct_ratio": 2.0,
    "punct_ratio": -4.0,
    "stopword_ratio": 1.5,
}


def quality_logit(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model-based quality filtering: a logistic classifier over the
    `with_quality_features` signals with literal weights — the pretraining
    curation step that replaces hand-tuned threshold stacks (reference
    analogue: the P7 threshold constants in config.py) with ONE calibrated
    score. Adds `logit`, `quality_prob` = sigmoid(logit), and `keep_doc`
    (sign of the ROUNDED logit, so the decision boundary cannot flip on a
    last-ulp cross-engine difference).

    Scale shape: map-only column expressions end-to-end (no shuffle, no
    UDF) — runs at scan speed over a 100 TB corpus; the weight vector is a
    plan literal, so swapping in a retrained model is a constant change,
    not a join.
    """
    w = QUALITY_LOGIT_WEIGHTS
    feat = with_quality_features(df, text_col)
    len_cap = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    # fixed left-to-right sum, mirrored token-for-token by the SQL oracle
    logit = (
        F.lit(w["bias"])
        + F.lit(w["len_cap"]) * len_cap
        + F.lit(w["distinct_ratio"]) * F.col("distinct_ratio")
        + F.lit(w["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
    )
    return (
        feat.withColumn("logit", F.round(logit, 6) + F.lit(0.0))
        .withColumn(
            "quality_prob",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 6)
            + F.lit(0.0),
        )
        .withColumn("keep_doc", F.col("logit") >= 0)
    )


def dsir_logratio(
    pool: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every pool document
    by the log importance ratio of its unigrams under the TARGET domain's
    distribution vs the pool's own — sum_tokens ln(p_target/p_pool) with
    add-one smoothing over the union vocabulary. High scores = documents
    that look like the target domain; select by score to tilt a raw web
    crawl toward a curated target (the paper's hashed-ngram variant reduces
    to this with unigram features).

    All distribution inputs are INTEGER counts (c_t, c_r, N_t, N_r, V), so
    both engines feed identical values to ln; the per-document sum folds
    the per-token term ln(c_t+1) - ln(c_r+1) in POSITION order (the q44
    fold), and the document-constant part n_tokens*(ln(N_r+V) - ln(N_t+V))
    is applied once at the end — bit-stable and engine-portable.

    Scale shape: two combiner-friendly token-count aggregates (target is
    typically tiny — a curated sample); the vocabulary table is
    broadcastable (millions of rows) for a map-side probe over the pool's
    exploded tokens, then one groupBy(doc) — identical shuffle shape to
    unigram_surprisal. Pass broadcast_vocab=False for unbounded
    vocabularies (Zipf-hot join keys are the well-replicated ones; AQE
    splits the skewed probe side)."""
    # lazy-localCheckpoint the two shared subtrees (the hits/assoc_rules
    # discipline): pool_toks feeds BOTH the frequency aggregate and the
    # per-doc probe, vocab feeds BOTH the scalars aggregate and the probe
    # join — Spark does not dedup common subtrees, so left lazy the
    # pool-scale tokenize+explode (the dominant scan at the 100 TB pool
    # this targets) runs twice
    pool_toks = pool.select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "tok")
    ).localCheckpoint(eager=False)
    tgt_toks = target.select(F.explode(_tokens(text_col)).alias("tok"))
    pool_freqs = pool_toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_r")
    )
    tgt_freqs = tgt_toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_t"))
    vocab = (
        pool_freqs.join(tgt_freqs, "tok", "full_outer")
        .select(
            "tok",
            F.coalesce("c_r", F.lit(0)).alias("c_r"),
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
        )
        .localCheckpoint(eager=False)
    )
    # corpus scalars: one row — totals and union-vocabulary size
    scalars = vocab.agg(
        F.sum("c_r").alias("n_r"),
        F.sum("c_t").alias("n_t"),
        F.count(F.lit(1)).alias("v_sz"),
    )
    v = F.broadcast(vocab) if broadcast_vocab else vocab
    per_doc = (
        pool_toks.join(v, "tok")
        .select(
            id_col,
            "pos",
            (
                F.log(F.col("c_t").cast("double") + F.lit(1.0))
                - F.log(F.col("c_r").cast("double") + F.lit(1.0))
            ).alias("term"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "term"))),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sum_term"),
        )
    )
    return per_doc.crossJoin(F.broadcast(scalars)).select(
        id_col,
        "n_tokens",
        (
            F.col("sum_term")
            + F.col("n_tokens")
            * (
                F.log((F.col("n_r") + F.col("v_sz")).cast("double"))
                - F.log((F.col("n_t") + F.col("v_sz")).cast("double"))
            )
        ).alias("dsir_logratio"),
    )


def hll_registers_grouped(
    df: DataFrame,
    group_col: str,
    col: str,
    *,
    m: int = 64,
    prefix: str = "hll",
) -> DataFrame:
    """Per-GROUP HyperLogLog registers: the grouped form of hll_registers —
    one m-row register frame per group value, dense (absent registers 0) so
    frames are directly comparable and elementwise-max mergeable across
    shards/days. Build is one combiner-friendly (group, j) max-aggregate;
    the dense frame is distinct-groups x range(m), group-cardinality-sized.
    This is the shape a 100 TB pipeline stores per partition key (e.g.
    per-day per-language vocabulary sketches rolled up by max, never
    rescanning history)."""
    j, rho = _hll_hash_cols(col, m, prefix)
    # lazy-localCheckpoint: `built` feeds BOTH the dense frame's group
    # enumeration and the register join — and deriving the group set from
    # the (groups x m)-sized aggregate instead of df.distinct() keeps the
    # corpus from being scanned a second time just to list groups (groupBy
    # keeps NULL-hash rows, so every group in df appears in built)
    built = (
        df.select(F.col(group_col).alias("g"), j.alias("j"), rho.alias("rho"))
        .groupBy("g", "j")
        .agg(F.max("rho").cast("long").alias("reg"))
        .localCheckpoint(eager=False)
    )
    allj = df.sparkSession.range(m).select(F.col("id").alias("j"))
    frame = built.select("g").distinct().crossJoin(F.broadcast(allj))
    return frame.join(built, ["g", "j"], "left").select(
        F.col("g").alias(group_col),
        "j",
        F.coalesce("reg", F.lit(0)).cast("long").alias("reg"),
    )


def hll_estimate_grouped(
    registers: DataFrame, group_col: str, *, m: int = 64
) -> DataFrame:
    """Per-group distinct-count estimates from grouped registers — same
    exact-dyadic harmonic mean + small-range correction as hll_estimate,
    one output row per group."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    pow2 = F.array(*[F.lit(float(1 << k)) for k in range(34)])
    inv = F.lit(1.0) / F.element_at(pow2, (F.col("reg") + 1).cast("int"))
    agg = registers.groupBy(group_col).agg(
        F.sum(inv).alias("s"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).cast("long").alias(
            "n_zero"
        ),
    )
    raw = F.lit(alpha * m * m) / F.col("s")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")),
    ).otherwise(raw)
    return agg.select(group_col, corrected.alias("est"), "n_zero")


def ctfidf_top_terms(
    df: DataFrame,
    group_col: str,
    tokens_col,
    *,
    k: int = 10,
) -> DataFrame:
    """Class-based TF-IDF (the BERTopic labeling statistic): the k most
    DISTINCTIVE terms per group — score = tf(term, group) *
    ln(n_groups / group_df(term)), where group_df counts GROUPS containing
    the term, so vocabulary shared by every group (stopwords, boilerplate)
    scores exactly 0 and never ranks.

    Determinism: the rank key is (round(score, 6) DESC, term ASC) —
    rounding before ranking so both engines order identical values (the
    q06 rounded-ln discipline); tf and group_df are integer aggregates;
    ln's argument n_groups/group_df is one of n_groups distinct rationals.

    Scale shape: one combiner-friendly (group, term) count (the only
    corpus-scale shuffle); group_df is a count over the (group, term)
    distinct — vocabulary-sized; the 1-row group count broadcasts; the
    top-k window partitions by group over the vocabulary-sized scored
    table, never over corpus rows. Output: (group_col, rank, term, tf,
    group_df, score)."""
    gt = df.select(
        F.col(group_col).alias("g"), F.explode(tokens_col).alias("term")
    )
    # lazy checkpoint: tf feeds THREE consumers (scored, gdf, ng) whose
    # differing pruned columns defeat ReusedExchange — without the
    # materialization the corpus-scale explode+count runs three times in
    # one plan (the dbscan_2d lazy pattern); tf itself is only
    # vocabulary x groups sized
    tf = gt.groupBy("g", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    gdf = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("group_df")
    )
    ng = tf.select("g").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_groups")
    )
    scored = (
        tf.join(gdf, "term")
        .crossJoin(F.broadcast(ng))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(
                    F.col("n_groups").cast("double")
                    / F.col("group_df").cast("double")
                ),
                6,
            )
            + F.lit(0.0),
        )
    )
    w = Window.partitionBy("g").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("g").alias(group_col),
            "rank",
            "term",
            "tf",
            "group_df",
            "score",
        )
    )


def bigram_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Mean conditional bigram surprisal per document: avg over the doc's
    adjacent token pairs of -ln p(w2 | w1) under the CORPUS's own bigram
    counts, p(w2|w1) = c(w1,w2) / c1(w1) where c1 counts w1's occurrences
    AS A BIGRAM PREFIX (so the conditional sums to 1 and every observed
    bigram has c >= 1 — no smoothing needed when scoring the corpus
    against itself). The order-2 upgrade of unigram_surprisal (q44): a doc
    whose individual words are common but whose *transitions* are rare
    (shuffled text, keyword stuffing, boilerplate splices) scores high
    here while the unigram signal sleeps — the cheap stand-in for the
    CCNet/KenLM perplexity filter in pretraining prep.

    Scale shape: bigram counts are one combiner-friendly groupBy (bigram
    vocabulary ~ tens of millions at corpus scale — broadcastable for most
    corpora; pass broadcast_vocab=False to shuffle-join, where AQE's skew
    split handles the Zipf-hot pairs). Prefix counts reuse the bigram table
    (one more tiny groupBy) instead of re-scanning the corpus.

    Determinism: per-document sums fold ln-counts in POSITION order
    (array_sort by pos, sequential F.aggregate) exactly like
    unigram_surprisal — never a float sum across shuffled rows — so the
    oracle can replay the identical left-to-right fold. Docs with < 2
    tokens have no bigram: n_bigrams = 0, avg_surprisal NULL.

    avg = sum(ln c1(w1) - ln c(w1,w2)) / n_bigrams."""
    toks = df.select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "w1")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    # materialize the pairs subtree ONCE (lazy localCheckpoint — the hits/
    # assoc_rules discipline): it feeds `big`, `pre` (via big), and the
    # scored probe, and Spark does not dedup common subtrees — left lazy,
    # the tokenize+explode+lead pipeline (the corpus-scale stage) runs 3x
    pairs = (
        toks.withColumn("w2", F.lead("w1").over(w))
        .where(F.col("w2").isNotNull())
        .localCheckpoint(eager=False)
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    pre = big.groupBy("w1").agg(F.sum("c2").alias("c1"))
    b = F.broadcast(big) if broadcast_vocab else big
    p = F.broadcast(pre) if broadcast_vocab else pre
    scored = (
        pairs.join(b, ["w1", "w2"])
        .join(p, "w1")
        .select(
            id_col,
            "pos",
            (
                F.log(F.col("c1").cast("double"))
                - F.log(F.col("c2").cast("double"))
            ).alias("lnp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "lnp"))),
                lambda s: s["lnp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_lnp"),
    )
    ids = df.select(F.col(id_col)).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.when(
            F.col("n_bigrams") > 0, F.col("sum_lnp") / F.col("n_bigrams")
        ).alias("avg_surprisal"),
    )


def psi_drift(
    df: DataFrame,
    *,
    bucket_col: str = "bucket",
    snap_col: str = "snap",
    n_buckets: int,
) -> DataFrame:
    """Population Stability Index between two corpus snapshots — the
    distribution-drift monitor every continuously-ingesting pipeline runs
    (is today's crawl's length/language/quality mix still yesterday's?).

    Input: one row per document with an integer `bucket_col` in
    [0, n_buckets) and `snap_col` in {0, 1} (0 = baseline A, 1 = current
    B). Output: one row per bucket over the DENSE domain (empty buckets
    included) with Laplace-(+1)-smoothed counts `c_a`/`c_b` (exact int64;
    smoothing keeps ln finite and makes every downstream division exact
    integers-to-double) and the PSI contribution
    `(c_a/n_a - c_b/n_b) * ln((c_a/c_b) * (n_b/n_a))` — four exact
    int64→double divisions and one ln, the engine-portable shape (no
    int64 cross-products that overflow at 1e11-doc scale; each count is
    exactly representable as a double up to 2^53). Sum of `psi_term` is
    the corpus PSI (>0.2 = actionable drift by the usual rule of thumb).

    Scale shape: ONE combiner-friendly groupBy over (bucket, snap) — the
    only thing that touches corpus-sized data — then everything else
    (dense-domain left join, totals, divisions) happens on the
    2*n_buckets-row table, broadcast-joined. Reference parity: the
    distribution-stats role of pathway_kb.py's histogram summaries,
    re-expressed as a two-snapshot comparison.
    """
    spark = df.sparkSession
    counts = df.groupBy(bucket_col, snap_col).agg(
        F.count(F.lit(1)).alias("c_raw")
    )
    dom = spark.range(n_buckets).select(F.col("id").alias(bucket_col))
    snaps = spark.range(2).select(F.col("id").alias(snap_col))
    sm = (
        dom.crossJoin(snaps)
        .join(counts, [bucket_col, snap_col], "left")
        .select(
            bucket_col,
            snap_col,
            (F.coalesce(F.col("c_raw"), F.lit(0)) + F.lit(1))
            .cast("long")
            .alias("c"),
        )
    )
    wide = sm.groupBy(bucket_col).agg(
        F.sum(F.when(F.col(snap_col) == 0, F.col("c"))).alias("c_a"),
        F.sum(F.when(F.col(snap_col) == 1, F.col("c"))).alias("c_b"),
    )
    tot = wide.agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    ca, cb = F.col("c_a").cast("double"), F.col("c_b").cast("double")
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    psi = (ca / na - cb / nb) * F.log((ca / cb) * (nb / na))
    return (
        wide.crossJoin(F.broadcast(tot))
        .select(
            F.col(bucket_col),
            F.col("c_a"),
            F.col("c_b"),
            (F.round(psi, 6) + F.lit(0.0)).alias("psi_term"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    permilles: list[int],
    *,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary coverage curve — for each target coverage p (in
    per-mille), the smallest vocabulary (most-frequent-first) whose
    cumulative token mass reaches p, and the coverage it actually
    achieves. THE tokenizer-sizing statistic: "how many types cover 99%
    of the corpus?" decides vocab size / UNK rate before any BPE run
    (q62 trains the merges; this decides their budget).

    Exactness: token counts and the cumulative sum are int64; the
    threshold test is the integer cross-multiply cum*1000 >= p*total
    (no float CDF — total*1000 is int64-safe to ~9e15 tokens);
    coverage_achieved is one exact int64->double division, round-6.
    Rank order is the deterministic total order (count DESC, token ASC).

    Scale shape: one corpus-sized explode + combiner groupBy(token);
    the running sum's unpartitioned window runs over the VOCAB-sized
    count table (the q45 argument: window over the tiny domain, never
    over rows), and the per-target argmin is a broadcast join + min.
    Output: (permille, vocab_size, coverage) — one row per target.
    """
    spark = df.sparkSession
    counts = (
        df.select(F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = counts.select(
        F.row_number().over(
            Window.orderBy(F.desc("n"), F.asc("token"))
        ).alias("rank"),
        F.sum("n").over(w).alias("cum"),
    )
    total = counts.agg(F.sum("n").alias("total"))
    targets = spark.createDataFrame(
        [(int(p),) for p in sorted(permilles)], "permille: bigint"
    )
    hits = (
        ranked.crossJoin(F.broadcast(total))
        .join(
            F.broadcast(targets),
            F.col("cum") * 1000 >= F.col("permille") * F.col("total"),
        )
        .groupBy("permille")
        .agg(
            F.min(F.struct("rank", "cum", "total")).alias("s"),
        )
    )
    return hits.select(
        "permille",
        F.col("s.rank").alias("vocab_size"),
        (
            F.round(
                F.col("s.cum").cast("double") / F.col("s.total").cast("double"), 6
            )
            + F.lit(0.0)
        ).alias("coverage"),
    ).orderBy("permille")


def heaps_curve(
    df: DataFrame,
    n_slices: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: vocabulary size after each
    1/n_slices prefix of the corpus in `id_col` order — the empirical
    V(n) ~ K * n^beta curve that sizes tokenizer vocabularies and
    predicts how much NEW vocabulary the next 10 TB of crawl will add
    (complement of vocab_coverage, which slices by token mass at one
    snapshot). Whitespace tokens on lowered text, empties dropped (the
    q106 convention).

    Exact without any global sort: a document's position is defined by
    its id, slice boundaries are exact id thresholds
    floor((max_id+1) * s / n_slices), and "vocabulary after prefix s" =
    count of tokens whose FIRST-occurrence id (one min-combiner groupBy
    over the token table) falls under the threshold. The thresholds
    table is n_slices rows — it BROADCASTS onto the first-occurrence
    table (vocab-sized) and the per-doc count table (doc-sized), and
    every count is a combiner aggregate. Nothing is ever ordered,
    windowed, or single-partitioned; ids need not be contiguous (slices
    are then uneven in doc count, but n_docs per row reports the real
    prefix size). Output: (slice_idx, id_threshold, n_docs, n_tokens,
    vocab_size), n_slices rows."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                # WS_SPLIT_RE, not r"\s+": Java's \s includes \x0B, RE2's
                # (the oracle's) does not — the repo-wide parity rule
                F.split(F.lower(F.col(text_col)), WS_SPLIT_RE),
                lambda x: x != "",
            )
        ).alias("token"),
    ).localCheckpoint(eager=False)  # feeds BOTH groupBys — scan once
    first = tok.groupBy("token").agg(F.min("id").alias("first_id"))
    per_doc = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n_tok"))
    bounds = (
        df.agg(F.max(F.col(id_col)).alias("max_id"))
        .select(
            F.explode(
                F.sequence(F.lit(1), F.lit(int(n_slices)))
            ).alias("slice_idx"),
            F.col("max_id"),
        )
        .select(
            "slice_idx",
            F.floor(
                (F.col("max_id") + 1) * F.col("slice_idx") / int(n_slices)
            ).alias("id_threshold"),
        )
    )
    b = F.broadcast(bounds)
    vocab = (
        b.join(first, first["first_id"] < bounds["id_threshold"])
        .groupBy("slice_idx")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )
    docs_toks = (
        b.join(per_doc, per_doc["id"] < bounds["id_threshold"])
        .groupBy("slice_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    return (
        bounds.join(docs_toks, "slice_idx", "left")
        .join(vocab, "slice_idx", "left")
        .select(
            "slice_idx",
            "id_threshold",
            F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("vocab_size"), F.lit(0)).alias("vocab_size"),
        )
    )


def quantile_bins_grouped(
    df: DataFrame,
    group_col: str,
    col: str,
    permilles: list[int],
) -> DataFrame:
    """Mergeable quantile sketch via power-of-two histogram bins — the
    quantile member of the deterministic sketch family (KMV/HLL ->
    distinct, count-min -> frequency, Bloom -> membership). A
    non-negative integer value lands in bin = bit_length(value) (0 for
    value 0), so the per-group state is <= 64 integer counters that
    merge across shards/days by plain addition — the property t-digest
    has to work for, obtained here with zero float arithmetic: binning
    is F.bin/length (the HLL rho trick), bounds are exact powers of two,
    and the answer for permille p is the bin holding the ceil(p*n/1000)-th
    ordered value with its [2^(b-1), 2^b - 1] bounds. Relative error is
    bounded by the bin width (a factor of 2); the pytest pins that the
    EXACT percentile always falls inside the reported bounds.

    Plan: one (group, bin) combiner groupBy over the data; everything
    after runs on the histogram (<= 64 rows per group) — the cumulative
    window partitions by group over those tiny frames, and the permille
    probes are a broadcast cross join. Output: (group, permille, bin,
    lo_bound, hi_bound, n) — n is the group row count."""
    v = F.col(col).cast("long")
    bin_ = F.when(v <= 0, F.lit(0)).otherwise(F.length(F.bin(v))).cast("long")
    hist = (
        df.select(F.col(group_col).alias("g"), bin_.alias("bin"))
        .groupBy("g", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "g", "bin", "c",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(
            Window.partitionBy("g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    probes = df.sparkSession.createDataFrame(
        [(int(p),) for p in permilles], "permille long"
    )
    # target rank = ceil(p * n / 1000), all-integer: (p*n + 999) div 1000
    hit = (
        cum.crossJoin(F.broadcast(probes))
        .filter(
            F.col("cum") >= F.floor((F.col("permille") * F.col("n") + 999) / 1000)
        )
        .groupBy("g", "permille")
        .agg(
            F.min("bin").alias("bin"),
            F.min("n").alias("n"),
        )
    )
    # integer shifts, not pow(): 2^62 bounds stay exact int64 (the
    # function API wants a literal shift count, so expr() it). Bin 63
    # (values >= 2^62) caps hi at Long.MAX — shiftleft(1L, 63) - 1 would
    # ARITHMETIC_OVERFLOW under Spark 4's ANSI default
    return hit.select(
        F.col("g").alias(group_col),
        "permille",
        "bin",
        F.when(F.col("bin") <= 0, F.lit(0).cast("long"))
        .otherwise(F.expr("shiftleft(1L, cast(bin - 1 AS int))"))
        .alias("lo_bound"),
        F.when(F.col("bin") <= 0, F.lit(0).cast("long"))
        .when(F.col("bin") >= 63, F.lit((1 << 63) - 1).cast("long"))
        .otherwise(F.expr("shiftleft(1L, cast(bin AS int)) - 1"))
        .alias("hi_bound"),
        "n",
    )


def textrank_keywords(
    docs: DataFrame,
    *,
    text_col: str = "text",
    k: int = 50,
    iterations: int = 5,
) -> DataFrame:
    """Corpus-level TextRank keyword extraction (Mihalcea & Tarau, EMNLP
    2004): PageRank over the undirected adjacent-token co-occurrence graph;
    the highest-ranked tokens are the corpus keywords. Runs on the shared
    integer fixed-point PageRank kernel (operators/graph.pagerank_fixedpoint
    — micro-unit ranks, floor-div contributions), so the iterative float
    algorithm stays deterministic and the oracle replays the identical
    rounds as unrolled CTEs.

    Scale shape: the adjacency derivation is map-only (transform over the
    token-index range, no shuffle before the edge distinct); the graph is
    vocabulary-sized, never corpus-sized — each PageRank round joins the
    distinct-edge table against the node-sized rank table. Top-k is a
    global TakeOrdered over the vocabulary with the deterministic
    (rank_fp DESC, token ASC) tie-break. Output: (token, rank_fp, rank,
    kw_rank 1..k)."""
    from pyspark.sql import Window

    from pathhier_spark.operators.graph import pagerank_fixedpoint

    toks = F.split(F.lower(F.col(text_col)), WS_SPLIT_RE)
    adj = (
        docs.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("s"),
                        F.element_at(toks, i + 1).alias("d"),
                    ),
                )
            ).alias("p")
        )
        .select("p.s", "p.d")
        .filter(F.col("s") != F.col("d"))  # also drops NULL-d 1-token docs
    )
    edges = adj.union(adj.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    pr = pagerank_fixedpoint(edges, src="s", dst="d", iterations=iterations)
    # TakeOrdered top-k FIRST (distributed partial sort, no vocab-sized
    # single-partition exchange); the rank-number window then runs over
    # k rows only.
    top = pr.orderBy(F.desc("rank_fp"), F.asc("node")).limit(k)
    w = Window.orderBy(F.desc("rank_fp"), F.asc("node"))
    return top.select(
        F.col("node").alias("token"),
        "rank_fp",
        (F.round("rank", 6) + F.lit(0.0)).alias("rank"),
        F.row_number().over(w).alias("kw_rank"),
    )


def good_turing_profile(
    df: DataFrame,
    *,
    text_col: str = "text",
    max_r: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Good-Turing frequency-of-frequencies profile: for each observed
    token count r <= max_r, how many vocabulary types occur exactly r
    times (N_r), that frequency band's share of all tokens, and the
    Good-Turing adjusted count r* = (r+1)·N_{r+1}/N_r — the classic
    estimator whose r = 1 row IS the unseen-mass estimate (P_unseen =
    N_1/N, how much probability the corpus has never seen; the number
    that says whether the crawl is big enough for the vocabulary it
    claims). Complements q114 (Heaps growth) and q50 (KMV cardinality):
    those count the vocabulary, this prices its tail.

    Scale shape: two combiner groupBys — (token) counts over the corpus,
    then (count) counts over the vocabulary — and the output domain is
    max_r rows; the r+1 lookup is a self-join on the tiny r domain, not
    a window. All ratios are integer micro-units (DIV), exact int64
    end to end. Output: (r, n_types, mass_fp, rstar_fp, rstar round-6),
    rstar NULL on the last band with no N_{r+1} evidence."""
    from pathhier_spark.operators.textstats import _tokens

    counts = (
        df.select(F.explode(_tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fof = (
        counts.groupBy(F.col("c").alias("r"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_types"))
        .localCheckpoint(eager=True)
    )
    total = fof.agg(
        F.sum(F.col("r") * F.col("n_types")).cast("long").alias("n_tokens")
    )
    nxt = fof.select(
        (F.col("r") - 1).alias("r"), F.col("n_types").alias("n_next")
    )
    rstar_fp = F.expr(
        f"CASE WHEN n_next IS NULL THEN NULL "
        f"ELSE ({int(scale)} * (r + 1) * n_next) DIV n_types END"
    ).cast("long")
    return (
        fof.filter(F.col("r") <= max_r)
        .join(nxt, "r", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("r").cast("long").alias("r"),
            "n_types",
            F.expr(f"({int(scale)} * r * n_types) DIV n_tokens")
            .cast("long")
            .alias("mass_fp"),
            rstar_fp.alias("rstar_fp"),
            (
                F.round(rstar_fp.cast("double") / F.lit(float(scale)), 6)
                + F.lit(0.0)
            ).alias("rstar"),
        )
    )


def token_burstiness(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_cf: int = 50,
    top: int = 30,
    scale: int = 1_000_000,
) -> DataFrame:
    """Church-Gale token burstiness: the variance-to-mean ratio of a
    token's per-document counts over ALL documents. VMR ~1 is the
    Poisson background (function words); VMR >> 1 is bursty — topical
    terms, and at the extreme the spam/template tokens that repeat
    hundreds of times in a handful of pages (the per-token refinement
    of template_concentration's per-source score, and a cheap spam
    lexicon miner).

    Zeros included without materializing them: over N docs with
    per-doc counts c_d, mean = cf/N and E[x²] = Σc²/N, so
    VMR = (N·Σc² − cf²)/(N·cf) — a closed form needing only the
    NONZERO (token, doc) rows. Exact int64 end to end, micro-unit DIV;
    bound: N·Σc² < 2^63 (at 1e9 docs this allows Σc² ~9e9 per token —
    cap pathological tokens upstream or raise to a two-word key).
    Scale shape: one (token, doc) combiner count, one token-level
    combiner agg, broadcast N, and the top-k is a distributed
    TakeOrdered over the (vmr_fp DESC, token) total order — never a
    vocabulary-sized single partition. Output: (tok, df, cf, vmr_fp,
    vmr round-6), top `top` rows with cf >= min_cf."""
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    dc = (
        df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))
        .groupBy("tok", id_col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = dc.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("cf"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sumsq"),
    )
    vmr_fp = F.expr(
        f"({int(scale)} * (n_docs * sumsq - cf * cf)) DIV (n_docs * cf)"
    ).cast("long")
    return (
        per.filter(F.col("cf") >= min_cf)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            "df",
            "cf",
            vmr_fp.alias("vmr_fp"),
            (
                F.round(vmr_fp.cast("double") / F.lit(float(scale)), 6)
                + F.lit(0.0)
            ).alias("vmr"),
        )
        .orderBy(F.desc("vmr_fp"), "tok")
        .limit(top)
    )


def char_entropy_profile(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon character entropy — the gibberish / binary-noise
    / low-diversity detector of the Gopher-family quality stack (encoding
    mojibake, base64 blobs, and key-mash pages sit far from natural-language
    entropy in BOTH directions: repeated-char spam near 0, uniform noise
    near ln(alphabet)). Complements with_quality_features (token-level) and
    ngram_repetition (phrase-level) with the character-level signal.

    Map-only: chars, distinct set, and per-char counts are higher-order
    column expressions over each row (no explode, no shuffle — O(L·D) work
    per row stays inside whole-stage codegen), so it runs at scan speed
    over a 100 TB corpus like every other per-doc operator here.

    Determinism: entropy = ln(L) − (Σ c·ln c)/L where c are integer
    per-char counts; the Σ folds the c·ln(c) terms in SORTED-character
    order from an identical 0.0 seed on both engines (the q44/q92
    ordered-fold discipline — no shuffled float sums), finished with the
    fixed round-6 + 0.0 shape. Empty text → NULL entropy (honest-NULL
    discipline). Output: (id, n_chars, n_distinct, char_entropy), one row
    per input row.
    """
    length = F.length(F.col(text_col))
    chars = F.when(
        length > 0,
        F.transform(
            F.sequence(F.lit(1), length),
            lambda i: F.col(text_col).substr(i, F.lit(1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    step = (
        df.select(F.col(id_col), F.col(text_col))
        .withColumn("_chars", chars)
        .withColumn("_ds", F.array_sort(F.array_distinct("_chars")))
        .withColumn(
            "_cnts",
            F.transform(
                "_ds",
                lambda d: F.size(
                    F.filter("_chars", lambda x: x == d)
                ).cast("double"),
            ),
        )
    )
    s = F.aggregate(
        F.transform("_cnts", lambda c: c * F.log(c)),
        F.lit(0.0),
        lambda a, t: a + t,
    )
    ent = F.when(
        length > 0,
        F.round(F.log(length.cast("double")) - s / length.cast("double"), 6)
        + F.lit(0.0),
    ).otherwise(F.lit(None).cast("double"))
    return step.select(
        F.col(id_col),
        length.cast("long").alias("n_chars"),
        F.size("_ds").alias("n_distinct"),
        ent.alias("char_entropy"),
    )


def rouge_pairs(
    pairs: DataFrame,
    *,
    cand_col: str = "cand",
    ref_col: str = "ref",
    id_col: str = "pair_id",
    ns: tuple = (1, 2),
) -> DataFrame:
    """ROUGE-N (Lin 2004) over (candidate, reference) text pairs — the
    summarization/paraphrase eval counterpart of q126's retrieval metrics,
    and the pairwise n-gram-overlap scorer distillation pipelines use to
    grade generated text against references at corpus scale.

    match_n is the CLIPPED overlap sum_g min(count_cand(g), count_ref(g));
    precision = match/cand_total, recall = match/ref_total, and F1
    collapses algebraically to 2*match/(cand_total+ref_total) — one exact
    integer-ratio IEEE division each (the q89 fixed-shape discipline), so
    no p*r/(p+r) float composition can drift between engines.

    Scale shape: ONE side-and-n-tagged explode feeds one combiner
    groupBy(pair, n, gram) counting both sides at once (partial
    aggregation collapses repeated grams map-side), so the clip is
    least(nc, nr) on the already-co-grouped row — no (pair, gram)
    equi-join, no per-n replay of the tokenize/join subtree — and the
    per-pair rollup re-aggregates the reduced gram rows. Totals come
    from the token-array lengths directly (no explode), which also
    keeps a row per pair per n when both sides are empty. Nothing
    quadratic, nothing driver-side; gram rows are (id, n, gram string,
    two int64 counts).

    Gram identity uses a 0x1f joiner so multi-token grams cannot collide
    across token boundaries ("ab"+"c" vs "a"+"bc").

    Output: (pair_id, n, match_n, cand_total, ref_total, rouge_p,
    rouge_r, rouge_f1) — one row per pair per n; zero-match pairs score
    0.0, sides with no n-grams emit NULL for their ratio honestly
    rather than 0/0."""
    toks_c = _tokens(cand_col)
    toks_r = _tokens(ref_col)
    base = pairs.select(
        F.col(id_col).alias("pair_id"),
        toks_c.alias("tc"),
        toks_r.alias("tr"),
    )
    sep = "\x1f"

    def grams(col, n):
        return F.when(
            F.size(col) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(col) - n),
                lambda i: F.concat_ws(
                    sep,
                    *[F.element_at(col, i + j + 1) for j in range(n)],
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def tagged(col, n, side):
        return F.transform(
            grams(col, n),
            lambda g: F.struct(
                F.lit(n).cast("int").alias("n"),
                g.alias("g"),
                F.lit(side).alias("side"),
            ),
        )

    # one tagged explode covers both sides and every n: the clip needs
    # only the per-(pair, n, gram) counts of each side, so tagging the
    # side into the exploded struct replaces the old per-n cc/rc
    # explodes + (pair, gram) equi-join — one wide shuffle instead of
    # 2|ns| explodes and |ns| joins, and the text join + tokenization
    # subtree is computed twice (grams + totals) instead of 3|ns| times
    ex = base.select(
        "pair_id",
        F.explode(
            F.concat(
                *[tagged(F.col("tc"), n, "c") for n in ns],
                *[tagged(F.col("tr"), n, "r") for n in ns],
            )
        ).alias("e"),
    )
    matched = (
        ex.groupBy(
            "pair_id",
            F.col("e.n").alias("n"),
            F.col("e.g").alias("g"),
        )
        .agg(
            F.count(F.when(F.col("e.side") == "c", 1)).alias("nc"),
            F.count(F.when(F.col("e.side") == "r", 1)).alias("nr"),
        )
        .groupBy("pair_id", "n")
        .agg(F.sum(F.least("nc", "nr")).cast("long").alias("match_n"))
    )

    def n_count(col, n):
        return (
            F.when(F.size(col) >= n, F.size(col) - n + 1)
            .otherwise(0)
            .cast("long")
        )

    # totals come straight from the token-array lengths — no explode,
    # and every pair keeps a row per n even when both sides are empty
    totals = base.select(
        "pair_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).cast("int").alias("n"),
                        n_count(F.col("tc"), n).alias("cand_total"),
                        n_count(F.col("tr"), n).alias("ref_total"),
                    )
                    for n in ns
                ]
            )
        ).alias("t"),
    ).select("pair_id", "t.n", "t.cand_total", "t.ref_total")
    return (
        totals.join(matched, ["pair_id", "n"], "left")
        .select(
            "pair_id",
            "n",
            F.coalesce("match_n", F.lit(0)).cast("long").alias("match_n"),
            "cand_total",
            "ref_total",
        )
        .select(
            "*",
            (
                F.round(
                    F.when(
                        F.col("cand_total") > 0,
                        F.col("match_n") / F.col("cand_total"),
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("rouge_p"),
            (
                F.round(
                    F.when(
                        F.col("ref_total") > 0,
                        F.col("match_n") / F.col("ref_total"),
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("rouge_r"),
            (
                F.round(
                    F.when(
                        F.col("cand_total") + F.col("ref_total") > 0,
                        (2 * F.col("match_n"))
                        / (F.col("cand_total") + F.col("ref_total")),
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("rouge_f1"),
        )
    )


def trigram_backoff_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    train_filter=None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Mean trigram STUPID-BACKOFF surprisal per document (Brants et al.
    2007) — the order-3 upgrade of bigram_surprisal and the closest cheap
    stand-in for the CCNet/KenLM perplexity filter: score each position's
    token under p(w3|w1,w2), backing off to alpha*p(w3|w2) when the
    trigram is unseen and alpha^2*p_uni(w3) when the bigram is too.

    The LM trains on the TRAIN half only (default: even ids — any
    deterministic predicate via train_filter) and scores ALL documents,
    because a same-corpus trigram LM scored against itself never backs
    off (every probe trigram has count >= 1) — held-out scoring is what
    makes the backoff tiers real, and it is the honest eval setup anyway.
    The unigram floor is Laplace-smoothed over the train vocabulary
    (p = alpha^2 * (c_uni+1)/(N+U+1), one OOV class) so unseen words
    score finite, large, and engine-portable.

    Scale shape: the three count tables are combiner-friendly groupBys
    over the train half; prefix counts derive from the n-gram tables
    (tiny re-aggregations, never a corpus re-scan); the probe is one
    window (two leads, single partition-by-doc sort) joined against the
    broadcast count tables (broadcast_vocab=False shuffles instead, AQE
    skew-split for Zipf-hot grams). Per-document sums fold ln-terms in
    POSITION order (array_sort + sequential F.aggregate) so they are
    bit-stable across engines — the q44/q92 discipline.

    Output: (doc_id, n_scored, n_tri, n_bi, n_uni, avg_surprisal) —
    hit counts per backoff tier are exact int64; avg rounds 6 with the
    -0.0 normalization; docs with < 3 tokens emit n_scored = 0 and a
    NULL avg."""
    toks = df.select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "w1")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    tri_rows = (
        toks.withColumn("w2", F.lead("w1", 1).over(w))
        .withColumn("w3", F.lead("w1", 2).over(w))
        .where(F.col("w3").isNotNull())
        .localCheckpoint(eager=False)
    )
    if train_filter is None:
        train_filter = F.col(id_col) % 2 == 0
    train = tri_rows.where(train_filter)

    tri = train.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c3")
    )
    tri_pre = tri.groupBy("w1", "w2").agg(F.sum("c3").alias("c3p"))
    # bigram counts come from the token stream directly (NOT from the
    # trigram rows, which drop each doc's final adjacent pair) so the
    # backoff distribution is the true bigram LM
    pair_rows = (
        toks.where(train_filter)
        .withColumn("wb", F.lead("w1", 1).over(w))
        .where(F.col("wb").isNotNull())
    )
    bi = pair_rows.groupBy(
        F.col("w1").alias("bw1"), F.col("wb").alias("bw2")
    ).agg(F.count(F.lit(1)).alias("c2"))
    bi_pre = bi.groupBy(F.col("bw1").alias("pw")).agg(
        F.sum("c2").alias("c2p")
    )
    uni = (
        toks.where(train_filter)
        .groupBy(F.col("w1").alias("uw"))
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    scal = uni.agg(
        F.sum("c1").alias("n_tok"), F.count(F.lit(1)).alias("n_vocab")
    )

    b = F.broadcast if broadcast_vocab else (lambda x: x)
    probe = (
        tri_rows.join(b(tri), ["w1", "w2", "w3"], "left")
        .join(b(tri_pre), ["w1", "w2"], "left")
        .join(
            b(bi),
            (F.col("w2") == F.col("bw1")) & (F.col("w3") == F.col("bw2")),
            "left",
        )
        .join(b(bi_pre), F.col("w2") == F.col("pw"), "left")
        .join(b(uni), F.col("w3") == F.col("uw"), "left")
        .crossJoin(b(scal))
    )
    ln = lambda c: F.log(c.cast("double"))  # noqa: E731
    # backoff weights as PYTHON-computed double literals, injected
    # identically into the oracle SQL — never ln(0.4) evaluated by two
    # different libms at query time (the one place a last-ulp divergence
    # could enter; counts are integers, safe under ln on both engines)
    import math as _math

    nla = F.lit(-_math.log(float(alpha)))
    nla2 = F.lit(-2.0 * _math.log(float(alpha)))
    lnp = (
        F.when(F.col("c3").isNotNull(), ln(F.col("c3p")) - ln(F.col("c3")))
        .when(
            F.col("c2").isNotNull(),
            nla + ln(F.col("c2p")) - ln(F.col("c2")),
        )
        .otherwise(
            nla2
            + ln(F.col("n_tok") + F.col("n_vocab") + 1)
            - ln(F.coalesce(F.col("c1"), F.lit(0)) + 1)
        )
    )
    scored = probe.select(
        id_col,
        "pos",
        lnp.alias("lnp"),
        F.when(F.col("c3").isNotNull(), 1).otherwise(0).alias("t_tri"),
        F.when(F.col("c3").isNull() & F.col("c2").isNotNull(), 1)
        .otherwise(0)
        .alias("t_bi"),
        F.when(F.col("c3").isNull() & F.col("c2").isNull(), 1)
        .otherwise(0)
        .alias("t_uni"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum("t_tri").cast("long").alias("n_tri"),
        F.sum("t_bi").cast("long").alias("n_bi"),
        F.sum("t_uni").cast("long").alias("n_uni"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "lnp"))),
                lambda s: s["lnp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_lnp"),
    )
    ids = df.select(F.col(id_col)).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_scored", F.lit(0)).cast("long").alias("n_scored"),
        F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
        F.coalesce("n_bi", F.lit(0)).cast("long").alias("n_bi"),
        F.coalesce("n_uni", F.lit(0)).cast("long").alias("n_uni"),
        (
            F.round(
                F.when(
                    F.col("n_scored") > 0,
                    F.col("sum_lnp") / F.col("n_scored"),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("avg_surprisal"),
    )


def text_tiling(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 10,
    boundary_fp: int = 100_000,
) -> DataFrame:
    """TextTiling-lite topic segmentation (Hearst 1997's block-comparison
    core): split each document into fixed blocks of `block_tokens`
    whitespace tokens and score every adjacent-block GAP by the Jaccard
    of the blocks' distinct token sets — a low-cohesion gap is a topic
    boundary. The segmentation signal RAG chunking (q90) lacks: q90
    cuts on a fixed grid, this finds where the vocabulary actually
    shifts, and the two compose (tile first, chunk within tiles).

    Entirely map-only: tokens -> per-gap block slices (one explode over
    the gap index, arrays sliced by position) -> set Jaccard in exact
    micro-units ((1e6*|I|) DIV |U|) -> threshold flag. No shuffle, no
    window, scan-speed at any corpus size; the ragged final block
    participates (a short coda is still a block).

    Output: (doc_id, gap_idx, jacc_fp, is_boundary), one row per
    adjacent-block gap; docs with fewer than two blocks emit nothing."""
    b = int(block_tokens)
    base = df.select(F.col(id_col), _tokens(text_col).alias("toks"))
    s = base.withColumn(
        "nblocks", F.ceil(F.size("toks") / F.lit(b)).cast("int")
    ).filter(F.col("nblocks") >= 2)
    g = s.select(
        id_col,
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("nblocks") - 2)).alias("gap"),
    )
    ba = F.array_distinct(F.slice("toks", F.col("gap") * b + 1, b))
    bb = F.array_distinct(
        F.slice("toks", (F.col("gap") + 1) * b + 1, b)
    )
    jacc = F.expr(
        "(1000000 * size(array_intersect(_ba, _bb))) "
        "DIV size(array_union(_ba, _bb))"
    ).cast("long")
    return (
        g.withColumn("_ba", ba)
        .withColumn("_bb", bb)
        .select(
            id_col,
            F.col("gap").cast("int").alias("gap_idx"),
            jacc.alias("jacc_fp"),
        )
        .withColumn(
            "is_boundary", F.col("jacc_fp") < F.lit(int(boundary_fp))
        )
    )


def kmv_key_overlap(
    dfa: DataFrame,
    dfb: DataFrame,
    *,
    key_a: str,
    key_b: str,
    k: int = 256,
) -> DataFrame:
    """KMV-sketch estimate of JOIN KEY OVERLAP between two tables — the
    query-planner statistic behind "will this join explode": from two
    k-minimum-values sketches (kmv_distinct's md5 hashing, so every
    step is engine-reproducible), the union sketch re-cut to k gives
    |A ∪ B| via (k-1)/u_k, the fraction of the re-cut sketch present in
    BOTH sides estimates Jaccard EXACTLY as n_both/k_used (one integer
    division), and their product estimates |A ∩ B|. The same row
    carries the EXACT distinct-key intersection and the EXACT join row
    count, so the estimate's error is auditable in the output — the
    sketch is what a planner would consult at 100 TB, the exact columns
    are the ground truth the gate verifies.

    Scale shape: per side one hash-distinct combiner groupBy + a
    distributed partial top-k (orderBy.limit(k) — each partition keeps
    k candidates, no global sort); the membership-tagged union is
    2k rows. The exact columns cost one distinct-key equi-join — drop
    them at true scale and keep the sketch half. Output: one row
    (k_used, n_both, est_union, est_jaccard, est_inter, exact_inter,
    exact_join_rows)."""

    def hashes(df: DataFrame, col: str) -> DataFrame:
        return (
            df.select(
                F.conv(
                    F.substring(F.md5(F.col(col).cast("string")), 1, 8),
                    16,
                    10,
                )
                .cast("long")
                .alias("h")
            )
            .groupBy("h")
            .agg(F.lit(1).alias("_one"))
            .select("h")
        )

    mina = hashes(dfa, key_a).orderBy("h").limit(k)
    minb = hashes(dfb, key_b).orderBy("h").limit(k)
    u = (
        mina.select("h", F.lit(1).alias("in_a"))
        .join(minb.select("h", F.lit(1).alias("in_b")), "h", "full")
        .select(
            "h",
            F.coalesce(F.col("in_a"), F.lit(0)).alias("in_a"),
            F.coalesce(F.col("in_b"), F.lit(0)).alias("in_b"),
        )
        .orderBy("h")
        .limit(k)
    )
    ka = dfa.select(F.col(key_a).alias("kk")).distinct()
    kb = dfb.select(F.col(key_b).alias("kk")).distinct()
    exact_inter = ka.join(kb, "kk").agg(
        F.count(F.lit(1)).cast("long").alias("exact_inter")
    )
    exact_rows = (
        dfa.select(F.col(key_a).alias("kk"))
        .join(dfb.select(F.col(key_b).alias("kk")), "kk")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_join_rows"))
    )
    sk = u.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
    )
    est_union = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / (F.col("kth").cast("double") / F.lit(float(1 << 32)))
    )
    return (
        sk.crossJoin(F.broadcast(exact_inter))
        .crossJoin(F.broadcast(exact_rows))
        .select(
            F.col("k_used").cast("long").alias("k_used"),
            "n_both",
            (F.round(est_union, 4) + F.lit(0.0)).alias("est_union"),
            (F.col("n_both") / F.col("k_used")).alias("est_jaccard"),
            (
                F.round(
                    (F.col("n_both") / F.col("k_used")) * est_union, 4
                )
                + F.lit(0.0)
            ).alias("est_inter"),
            "exact_inter",
            "exact_join_rows",
        )
    )


def with_readability(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Flesch-style readability in exact integer micro-units — the
    quality signal the q14 family lacks: length/stopword ratios say
    "is it text", readability says "is it HARD text" (a curation knob
    for difficulty-mixed training data). Counts are exact and
    engine-portable: sentences = non-empty [.!?]+ splits (min 1 so the
    ratio is defined on fragment-only docs), words = whitespace tokens,
    syllables = vowel GROUPS per word ([aeiouy]+ runs, min 1 per word —
    the standard approximation; no dictionary). The score is the
    Flesch formula in micro-units computed from exact int64 counts:
    206835000 - 1015 * (1000 * words DIV sentences)
              - 84600 * (1000 * syllables DIV words),
    every step integer (two inner DIVs, two multiplies, two subtracts)
    so both engines agree bit-for-bit — no clamping, so scores can go
    negative on dense text exactly as Flesch does. Docs with zero
    words emit NULL. Output adds (n_sentences, n_words, n_syllables,
    flesch_fp). Map-only column expressions; no shuffle anywhere."""
    sents = F.size(
        F.filter(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.trim(s) != "",
        )
    )
    toks = _tokens(text_col)
    words = F.size(toks)
    syl = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.size(
                F.filter(
                    F.split(w, r"[^aeiouy]+"), lambda s: s != ""
                )
            ),
            F.lit(1),
        ),
    )
    n_sent = F.greatest(sents, F.lit(1)).cast("long")
    return (
        df.withColumn("n_sentences", n_sent)
        .withColumn("n_words", words.cast("long"))
        .withColumn("n_syllables", syl)
        .withColumn(
            "flesch_fp",
            F.when(
                F.col("n_words") > 0,
                F.lit(206_835_000).cast("long")
                - F.lit(1015)
                * F.expr("(1000 * n_words) DIV n_sentences")
                - F.lit(84_600)
                * F.expr("(1000 * n_syllables) DIV n_words"),
            ),
        )
    )


def kneser_ney_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_filter=None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Mean interpolated KNESER-NEY bigram surprisal per document — the
    smoothing the stupid-backoff family (q92/q159) cannot express: the
    fallback distribution is the CONTINUATION count (in how many distinct
    contexts does w2 appear?), not the raw frequency, so "Francisco"
    (frequent but only ever after "San") stops looking like a plausible
    continuation everywhere. This is the classic fix (Kneser & Ney 1995;
    Chen & Goodman 1999) and the scoring model KenLM-style pretraining
    filters actually use.

        p(w2|w1) = max(c(w1,w2) - D, 0)/c(w1.)
                   + D * N1+(w1.)/c(w1.) * p_cont(w2)
        p_cont(w2) = (N1+(.w2) + 1) / (B + U + 1)      [add-1 over types]

    with discount D = 3/4 — chosen EXACTLY representable so the whole
    probability is a ratio of two exact int64s after scaling by 4:

        num = max(4*c2 - 3, 0)*M + 3*n1f(w1)*(n1b(w2) + 1)
        den = 4*c1p(w1)*M,          M = B + U + 1

    (unseen context w1: num = n1b(w2)+1, den = M — pure continuation).
    Both engines compute lnp = ln(den) - ln(num) from identical integers,
    so the fold is bit-stable without any float-sum discipline beyond the
    POSITION-ordered per-doc aggregate (the q44/q92/q159 fold). Overflow
    bound: 4*c1p*M < 2^63, i.e. hottest-prefix count x smoothed type
    count < 2.3e18 — fine through ~1e9-doc shards; beyond that train the
    LM per shard (the KenLM practice anyway).

    The LM trains on the TRAIN half only (default: even doc ids; any
    deterministic predicate via train_filter) and scores ALL documents —
    same held-out design as q159, which is what makes the discount and
    continuation tiers actually fire. Output tier counts are exact:
    n_seen (bigram in train), n_disc (context seen, bigram not — the
    interpolation-only term), n_oovctx (context unseen).

    Scale shape: identical to bigram_surprisal — the pairs subtree is
    lazily localCheckpoint-ed once; `bi` is ONE combiner-friendly groupBy
    over train pairs; c1p/n1f/n1b/B all derive from `bi` (tiny
    re-aggregations, never a corpus re-scan); U is one distinct-count
    over train tokens; the probe is one broadcast (or AQE-skew shuffle)
    join per count table. Docs with < 2 tokens emit n_scored = 0 and a
    NULL avg."""
    toks = df.select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "w1")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (
        toks.withColumn("w2", F.lead("w1").over(w))
        .where(F.col("w2").isNotNull())
        .localCheckpoint(eager=False)
    )
    if train_filter is None:
        train_filter = F.col(id_col) % 2 == 0
    bi = (
        pairs.where(train_filter)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    pre = bi.groupBy("w1").agg(
        F.sum("c2").alias("c1p"), F.count(F.lit(1)).alias("n1f")
    )
    bwd = bi.groupBy(F.col("w2").alias("bw")).agg(
        F.count(F.lit(1)).alias("n1b")
    )
    scal = (
        bi.agg(F.count(F.lit(1)).alias("bt"))
        .crossJoin(
            toks.where(train_filter).agg(
                F.count_distinct("w1").alias("uv")
            )
        )
        .select((F.col("bt") + F.col("uv") + F.lit(1)).alias("m"))
    )
    b = F.broadcast(bi) if broadcast_vocab else bi
    p = F.broadcast(pre) if broadcast_vocab else pre
    g = F.broadcast(bwd) if broadcast_vocab else bwd
    n1b1 = (F.coalesce(F.col("n1b"), F.lit(0)) + F.lit(1)).cast("long")
    seen_ctx = F.col("c1p").isNotNull()
    num = F.when(
        seen_ctx,
        F.greatest(
            F.lit(4) * F.coalesce(F.col("c2"), F.lit(0)) - F.lit(3),
            F.lit(0),
        ).cast("long")
        * F.col("m")
        + F.lit(3) * F.col("n1f") * n1b1,
    ).otherwise(n1b1)
    den = F.when(
        seen_ctx, F.lit(4) * F.col("c1p") * F.col("m")
    ).otherwise(F.col("m"))
    scored = (
        pairs.join(b, ["w1", "w2"], "left")
        .join(p, "w1", "left")
        .join(g, pairs["w2"] == F.col("bw"), "left")
        .crossJoin(F.broadcast(scal))
        .select(
            id_col,
            "pos",
            (
                F.log(den.cast("double")) - F.log(num.cast("double"))
            ).alias("lnp"),
            F.when(F.col("c2").isNotNull(), 1).otherwise(0).alias("t_seen"),
            F.when(F.col("c2").isNull() & seen_ctx, 1)
            .otherwise(0)
            .alias("t_disc"),
            F.when(seen_ctx, 0).otherwise(1).alias("t_oov"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum("t_seen").alias("n_seen"),
        F.sum("t_disc").alias("n_disc"),
        F.sum("t_oov").alias("n_oovctx"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "lnp"))),
                lambda s: s["lnp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_lnp"),
    )
    ids = df.select(F.col(id_col)).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_scored"), F.lit(0)).cast("long").alias("n_scored"),
        F.coalesce(F.col("n_seen"), F.lit(0)).cast("long").alias("n_seen"),
        F.coalesce(F.col("n_disc"), F.lit(0)).cast("long").alias("n_disc"),
        F.coalesce(F.col("n_oovctx"), F.lit(0)).cast("long").alias("n_oovctx"),
        F.when(
            F.col("n_scored") > 0,
            F.round(F.col("sum_lnp") / F.col("n_scored"), 6) + F.lit(0.0),
        ).alias("avg_surprisal"),
    )


def g2_collocations(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Dunning log-likelihood (G²) collocations over ADJACENT token
    bigrams — the association statistic PMI (q64) is not: PMI rewards
    rare-but-exclusive pairs, G² weights the evidence by frequency
    (2·Σ O·ln(O/E) over the 2×2 bigram contingency), so it surfaces
    high-volume collocations PMI drowns and is robust at low counts
    where PMI explodes. Also a different grain: q64 counts document
    co-occurrence, this counts surface adjacency.

    Contingency per pair (x, y): a = c(x,y), row = c(x,·), col =
    c(·,y), N = total bigrams; b = row−a, c_ = col−a, d = N−row−col+a.
    Each term is o·ln((o·N)/(rowsum·colsum)) with o, N and the margins
    exact int64 — the ln of the same rational on both engines (the q64
    bit-parity argument) — and the four terms fold in one FIXED scalar
    expression per row: no float crosses a shuffle.

    Scale shape: bigram counts are one combiner groupBy; margins are
    two more tiny groupBys off the bigram table (never a corpus
    re-scan); the scoring join is margin-sized. Zipf-hot margins are
    broadcast-or-AQE territory, same as bigram_surprisal.
    Output: (x, y, c_xy, g2) for pairs with c_xy >= min_count."""
    toks = df.select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "w1")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (
        toks.withColumn("w2", F.lead("w1").over(w))
        .where(F.col("w2").isNotNull())
        .localCheckpoint(eager=False)
    )
    big = pairs.groupBy(
        F.col("w1").alias("x"), F.col("w2").alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("a"))
    row = big.groupBy("x").agg(F.sum("a").alias("rs"))
    col = big.groupBy("y").agg(F.sum("a").alias("cs"))
    n = big.agg(F.sum("a")).collect()[0][0] or 0

    def term(o, rsum, csum):
        e_ratio = (o.cast("double") * F.lit(float(n))) / (
            rsum.cast("double") * csum.cast("double")
        )
        return F.when(o > 0, o.cast("double") * F.log(e_ratio)).otherwise(
            F.lit(0.0)
        )

    a = F.col("a")
    rs, cs = F.col("rs"), F.col("cs")
    nn = F.lit(int(n)).cast("long")
    g2 = F.lit(2.0) * (
        term(a, rs, cs)
        + term(rs - a, rs, nn - cs)
        + term(cs - a, nn - rs, cs)
        + term(nn - rs - cs + a, nn - rs, nn - cs)
    )
    return (
        big.where(F.col("a") >= min_count)
        .join(row, "x")
        .join(col, "y")
        .select("x", "y", F.col("a").alias("c_xy"), g2.alias("g2"))
    )


def pairwise_bleu(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    shard_buckets: int | None = None,
) -> DataFrame:
    """BLEU-2 between each document and its successor (next id in the
    same group) — the n-gram PRECISION view of pairwise similarity that
    ROUGE (q158, recall) and Jaccard near-dup are not: clipped modified
    n-gram precision with the brevity penalty, the exact machinery of
    MT/generation eval, here serving as a template-similarity probe
    (high chained BLEU inside a source = boilerplate-stamped docs).

    Per pair: p_n = Σ_g min(c_cand(g), c_ref(g)) / #cand n-grams for
    n = 1, 2; BLEU = BP · sqrt(p1 · p2) — the geometric mean as a
    SQRT, not exp(Σln/2), because sqrt is IEEE-correctly-rounded on
    both engines while exp is merely faithful; exp survives only in
    the brevity penalty exp(1 − r/c) (the q77 precedent: one exp under
    the final round-6). All match counts exact int64; pairs where
    either precision is 0 (or the candidate has < 2 tokens) score 0,
    the standard convention.

    Scale shape: pairing is one lead() window BY GROUP — and a group
    like "lang" has cardinality ~handfuls, so at corpus scale those
    window partitions grow unboundedly: pass `shard_buckets` to
    sub-shard the pairing key with a deterministic id hash (partitions
    become bounded; the one successor pair lost per shard boundary is
    the negligible, documented cost). n-gram counts
    are per-doc combiner groupBys; clipping is two (doc, gram)-keyed
    equi-joins that ship only SHARED grams (inner join). No float
    crosses a shuffle — the one float expression is per-pair scalar.
    Output: (cand_id, ref_id, c_len, r_len, m1, m2, bleu)."""
    gexpr = F.col(group_col).cast("string")
    if shard_buckets:
        gexpr = F.concat(
            gexpr,
            F.lit(":"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(shard_buckets)))
            .cast("string"),
        )
    toks = df.where(F.col(text_col).isNotNull()).select(
        gexpr.alias("g"),
        F.col(id_col).alias("i"),
        _tokens(text_col).alias("ts"),
    )
    w = Window.partitionBy("g").orderBy("i")
    pairs = (
        toks.select(
            "i",
            F.lead("i").over(w).alias("r"),
        )
        .where(F.col("r").isNotNull())
    )
    uni = toks.select("i", F.explode("ts").alias("gram")).groupBy(
        "i", "gram"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    big = (
        toks.select(
            "i",
            F.explode(
                F.when(
                    F.size("ts") >= 2,
                    F.transform(
                        F.slice("ts", 1, F.size("ts") - 1),
                        lambda x, j: F.concat_ws(
                            " ", x, F.element_at(F.col("ts"), j + 2)
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        .groupBy("i", "gram")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    lens = toks.select(
        "i", F.size("ts").cast("long").alias("n")
    )

    def clipped(grams):
        ca = grams.select(
            F.col("i").alias("ci"), "gram", F.col("c").alias("cc")
        )
        ra = grams.select(
            F.col("i").alias("ri"), "gram", F.col("c").alias("rc")
        )
        return (
            pairs.join(ca, pairs["i"] == ca["ci"])
            .join(ra, (pairs["r"] == ra["ri"]) & (ca["gram"] == ra["gram"]))
            .groupBy(F.col("i").alias("pi"))
            .agg(F.sum(F.least("cc", "rc")).cast("long").alias("m"))
        )
    m1 = clipped(uni).withColumnRenamed("m", "m1")
    m2 = clipped(big).withColumnRenamed("m", "m2")
    base = (
        pairs.join(lens.select(F.col("i"), F.col("n").alias("c_len")), "i")
        .join(
            lens.select(F.col("i").alias("r"), F.col("n").alias("r_len")),
            "r",
        )
        .join(m1.withColumnRenamed("pi", "i"), "i", "left")
        .join(m2.withColumnRenamed("pi", "i"), "i", "left")
        .select(
            F.col("i").alias("cand_id"),
            F.col("r").alias("ref_id"),
            "c_len",
            "r_len",
            F.coalesce("m1", F.lit(0)).cast("long").alias("m1"),
            F.coalesce("m2", F.lit(0)).cast("long").alias("m2"),
        )
    )
    c_len = F.col("c_len").cast("double")
    bp = F.when(F.col("c_len") >= F.col("r_len"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - F.col("r_len").cast("double") / c_len)
    )
    bleu = F.when(
        (F.col("m1") > 0) & (F.col("m2") > 0) & (F.col("c_len") >= 2),
        bp
        * F.sqrt(
            (F.col("m1").cast("double") / c_len)
            * (F.col("m2").cast("double") / (c_len - F.lit(1.0)))
        ),
    ).otherwise(F.lit(0.0))
    return base.withColumn("bleu", bleu)


def naive_bayes_lang_confusion(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained and scored
    on the corpus itself (the q27 LR self-consistency protocol) — the
    GENERATIVE counterpart to the discriminative LR quality model:
    argmax_l [ln p(l) + Σ_tok ln p(tok|l)] with Laplace smoothing
    p(tok|l) = (c(tok,l)+1)/(tot_l+V). Its confusion against the stored
    label is the model-vs-metadata disagreement signal (the heuristic
    langid q15 confusion, upgraded to a learned model).

    Determinism is the q44 discipline end-to-end: every term is the ln
    of one rational from exact int64 counts, folded per (doc, lang) in
    POSITION order (array_sort + sequential F.aggregate — never a
    shuffled float sum), prior added once; the argmax orders on the
    bit-identical unrounded score with lang as tie-break. Zero-token
    docs are excluded (no likelihood evidence; documented).

    Scale shape: count tables are combiner groupBys; the lang
    dimension is a tiny broadcast crossJoin (|langs| ~ handfuls); the
    (lang, tok)-keyed smoothing join is vocab-sized — broadcast by
    default, pass broadcast_vocab=False to shuffle-join when
    langs x vocab outgrows the broadcast budget (the bigram_surprisal
    escape hatch). V and N are two scalar collects.
    Output: (true_lang, pred_lang, n_docs)."""
    toks = df.where(
        F.col(text_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(id_col).alias("d"),
        F.col(label_col).alias("truth"),
        F.posexplode(_tokens(text_col)).alias("pos", "tok"),
    ).localCheckpoint(eager=False)
    ctl = toks.groupBy(
        F.col("truth").alias("l"), "tok"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    totl = ctl.groupBy("l").agg(F.sum("c").cast("long").alias("tot"))
    priors = (
        toks.select("d", "truth").distinct()
        .groupBy(F.col("truth").alias("l"))
        .agg(F.count(F.lit(1)).cast("long").alias("nd"))
    )
    v = ctl.select("tok").distinct().count()
    n_docs = toks.select("d").distinct().count()
    lang_dim = F.broadcast(
        priors.join(totl, "l").select("l", "nd", "tot")
    )
    _ctl_sel = ctl.select(
        F.col("l").alias("cl"), F.col("tok").alias("ctok"), "c"
    )
    scored = (
        toks.crossJoin(lang_dim)
        .join(
            (F.broadcast(_ctl_sel) if broadcast_vocab else _ctl_sel),
            (F.col("l") == F.col("cl")) & (F.col("tok") == F.col("ctok")),
            "left",
        )
        .select(
            "d",
            "truth",
            "l",
            "pos",
            "nd",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("tot") + F.lit(int(v))).cast("double")
            ).alias("lnp"),
        )
        .groupBy("d", "truth", "l", "nd")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "lnp"))),
                    lambda s: s["lnp"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sum_lnp"),
        )
        .select(
            "d",
            "truth",
            "l",
            (
                F.log(F.col("nd").cast("double") / F.lit(float(n_docs)))
                + F.col("sum_lnp")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("d").orderBy(F.desc("score"), F.asc("l"))
    pred = scored.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") == 1
    )
    return (
        pred.groupBy(
            F.col("truth").alias("true_lang"), F.col("l").alias("pred_lang")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


ABBR_PATTERN = r"\(([A-Za-z][A-Za-z0-9]{1,9})\)"


def mine_abbreviations(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Abbreviation/long-form mining from '(SF)' parentheticals — the
    SYNONYM-DICTIONARY grower for entity linking: every validated
    (long form, abbreviation) pair is a new alias edge for the
    ontology dictionary the linker broadcasts (the reference's synonym
    lists, mined instead of curated). Simplified Schwartz-Hearst: the
    candidate long form is the |SF| words immediately left of the
    parenthetical, accepted iff their initials spell SF
    case-insensitively (the exact-initialism rule — full S-H allows
    mid-word subsequence matches; divergence documented, rejects are
    REPORTED with valid=false rather than dropped).

    Pure column machinery, deterministic on both engines: one regex
    split by the parenthetical pattern (segment i precedes match i),
    one regexp_extract_all for the SFs, arrays_zip + explode, then
    array slicing/initial-taking per candidate. Map-only — no
    shuffle at all until a consumer aggregates.
    Output: (id, abbr, long_form, valid)."""
    segs = F.split(F.col(text_col), ABBR_PATTERN)
    abbrs = F.regexp_extract_all(F.col(text_col), F.lit(ABBR_PATTERN), 1)
    rows = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(segs, 1, F.size(abbrs)).alias("seg"),
                abbrs.alias("ab"),
            )
        ).alias("z"),
    ).select(id_col, F.col("z.seg").alias("seg"), F.col("z.ab").alias("ab"))
    toks = F.filter(
        F.split(F.trim(F.col("seg")), " +"), lambda x: x != ""
    )
    ln = F.length(F.col("ab"))
    window = F.slice(
        toks, F.greatest(F.size(toks) - ln + 1, F.lit(1)), ln
    )
    initials = F.array_join(
        F.transform(window, lambda w: F.substring(w, 1, 1)), ""
    )
    return rows.select(
        id_col,
        F.col("ab").alias("abbr"),
        F.array_join(window, " ").alias("long_form"),
        (
            (F.size(window) == ln)
            & (F.lower(initials) == F.lower(F.col("ab")))
        ).alias("valid"),
    )


def rake_keyphrases(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 40,
) -> DataFrame:
    """RAKE keyphrase extraction — the degree/frequency heuristic that
    needs NO graph iteration: candidate phrases are maximal stopword-
    free token runs; each word scores deg(w)/freq(w) where deg counts
    word co-occurrence inside candidates (Σ phrase-length over the
    word's occurrences, self included) and a phrase scores the sum of
    its words. Complements TextRank (q140): TextRank converges a graph
    walk for single keywords; RAKE is one aggregation pass and emits
    PHRASES — the cheap first-cut keyphrase miner for corpus triage.

    Determinism: segmentation is a cumulative stopword-boundary window
    per doc (the CDC/q219 shape); word scores are one exact division of
    int64 deg/freq; each phrase's score folds its word scores in
    POSITION order (q44 discipline); identical phrases aggregate and
    the top-k cut orders (score DESC, phrase) on bit-identical doubles.
    Scale: one posexplode, two combiner groupBys, one vocab-keyed join
    — no graph rounds, no corpus-scale window beyond the per-doc
    segmentation. Output: (phrase, n_words, n_occurrences, score)."""
    from pathhier_spark.functions.text import STOPWORDS

    toks = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc"),
        F.posexplode(_tokens(text_col)).alias("pos", "tok"),
    )
    stop = F.col("tok").isin(list(STOPWORDS))
    w = Window.partitionBy("doc").orderBy("pos")
    words = (
        toks.select(
            "doc",
            "pos",
            "tok",
            F.sum(F.when(stop, 1).otherwise(0)).over(w).alias("pid"),
            stop.alias("is_stop"),
        )
        .where(~F.col("is_stop"))
        .localCheckpoint(eager=False)
    )
    plen = words.groupBy("doc", "pid").agg(
        F.count(F.lit(1)).cast("long").alias("n_words")
    )
    occs = words.join(plen, ["doc", "pid"])
    wstats = occs.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("n_words").cast("long").alias("deg"),
    )
    scored_words = occs.join(wstats, "tok").select(
        "doc",
        "pid",
        "pos",
        "tok",
        (F.col("deg").cast("double") / F.col("freq").cast("double")).alias(
            "ws"
        ),
    )
    phrases = scored_words.groupBy("doc", "pid").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "ws"))),
                lambda s: s["ws"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.min("n_words").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("score").alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(top_k)
    )


def symspell_correct(
    vocab: DataFrame,
    queries: DataFrame,
    *,
    term_col: str = "term",
    freq_col: str = "freq",
    query_col: str = "query",
) -> DataFrame:
    """SymSpell-style spelling correction via a DELETES index — the
    scalable alternative to a brute levenshtein join (q66's q-gram
    blocking is the other route): every vocab term is indexed under
    itself plus all single-character deletions; a query probes with ITS
    deletes; any key collision bounds the true edit distance, and the
    exact levenshtein (a JVM builtin — never a Python UDF) verifies
    ≤ 1. Candidates rank (distance ASC, freq DESC, term ASC) — a total
    order — and the top-1 is the correction. Queries with no surviving
    candidate are REPORTED with a NULL correction (no silent drops).

    Scale shape: the deletes index is |vocab|·(avg_len+1) narrow rows
    from one transform+explode — the SymSpell trade (generate deletes
    once, then every lookup is an equi-join) vs re-computing distances
    against the whole vocabulary per query. The join is key-equi;
    verification only touches colliding pairs.
    Output: (query, corrected, distance, freq)."""
    def deletes(col):
        return F.array_union(
            F.array(col),
            F.transform(
                F.sequence(F.lit(1), F.length(col)),
                lambda i: F.concat(
                    F.substring(col, F.lit(1), i - 1),
                    col.substr(i + 1, F.lit(1 << 20)),
                ),
            ),
        )

    v = vocab.select(
        F.col(term_col).alias("_t"), F.col(freq_col).cast("long").alias("f")
    ).where(F.col("_t").isNotNull())
    vkeys = v.select(
        "_t", "f", F.explode(deletes(F.col("_t"))).alias("key")
    ).distinct()
    q = queries.select(F.col(query_col).alias("_q")).where(
        F.col("_q").isNotNull()
    ).distinct()
    qk = q.select(
        "_q", F.explode(deletes(F.col("_q"))).alias("key")
    ).distinct()
    cand = (
        qk.join(vkeys, "key")
        .select("_q", "_t", "f")
        .distinct()
        .withColumn("distance", F.levenshtein(F.col("_q"), F.col("_t")))
        .where(F.col("distance") <= 1)
    )
    w = Window.partitionBy("_q").orderBy(
        F.asc("distance"), F.desc("f"), F.asc("_t")
    )
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("_q").alias(query_col),
            F.col("_t").alias("corrected"),
            F.col("distance").cast("long").alias("distance"),
            F.col("f").alias("freq"),
        )
    )
    return q.select(F.col("_q").alias(query_col)).join(
        best, query_col, "left"
    )


def token_gini(
    df: DataFrame,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Gini coefficient of the token-frequency distribution — the
    canonical inequality statistic applied to vocabulary concentration:
    0 = every token equally common, →1 = a handful of tokens carry the
    corpus. The scalar that summarizes what Zipf/power-law fitting
    (q130) models and Heaps growth (q114) tracks — and the single
    number to watch for template collapse across corpus versions.

    Exact and SinglePartition-free: the textbook formula needs a
    global rank over the vocabulary (a corpus-scale sort); instead the
    computation runs on the FREQUENCY-VALUE histogram (q45/q189
    discipline): for frequency value v held by m tokens with b tokens
    at smaller values, the tied block contributes v·m·(2b + m − n) to
    Σ(2i − n − 1)·x_i exactly — int64 end-to-end — and
    gini = that sum / (n·Σx) is the one final rounded division.
    Distinct frequency VALUES are far fewer than tokens (Zipf), so the
    cumulative window is domain-bounded. Overflow: v·m·(2b+m) ≤
    ~totaltokens·2·vocab must stay < 2^63 — fine past 1e9-token
    corpora; shard past that. Output: one row
    (n_tokens_distinct, total_count, gini)."""
    freqs = df.where(F.col(text_col).isNotNull()).select(
        F.explode(_tokens(text_col)).alias("tok")
    ).groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("f"))
    hist = freqs.groupBy("f").agg(F.count(F.lit(1)).cast("long").alias("m"))
    wc = Window.orderBy("f").rowsBetween(Window.unboundedPreceding, -1)
    tot = hist.agg(
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("f") * F.col("m")).cast("long").alias("s"),
    )
    terms = hist.select(
        "f",
        "m",
        F.coalesce(F.sum("m").over(wc), F.lit(0)).cast("long").alias("b"),
    ).crossJoin(F.broadcast(tot)).select(
        (
            F.col("f")
            * F.col("m")
            * (2 * F.col("b") + F.col("m") - F.col("n"))
        ).alias("t"),
        "n",
        "s",
    )
    return terms.groupBy("n", "s").agg(
        F.sum("t").cast("long").alias("num")
    ).select(
        F.col("n").alias("n_tokens_distinct"),
        F.col("s").alias("total_count"),
        F.when(
            (F.col("n") > 0) & (F.col("s") > 0),
            F.col("num").cast("double")
            / (F.col("n").cast("double") * F.col("s").cast("double")),
        ).alias("gini"),
    )
