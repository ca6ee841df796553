"""String / token / set scalar functions as native Spark column expressions.

Bit-exact re-expressions of the reference scalar layer
(pathhier/utils/string_utils.py:5-58, pathhier/utils/base_utils.py:60-70,
pathhier/candidate_selector.py:31-33,134-146). Everything here is a pure
column-expression builder — JVM-side, whole-stage-codegen'd, no Python UDFs —
so these run at full Tungsten speed on the 100 TB path.

Known, documented divergences from the reference (tested in
tests/test_text_functions.py):
  * jaccard / len_diff_perc on empty inputs return 0.0 where the reference
    raises ZeroDivisionError (it never hits that case on its corpora).
  * the tokenizer regex is ASCII [A-Za-z0-9]+; the reference's
    RegexpTokenizer(r'[A-Za-z\\d]+') would also match non-ASCII digits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Vendored NLTK English stopword list (public corpus; nltk is not a runtime
# dependency). The reference loads this via stopwords.words('english')
# (candidate_selector.py:31, feature_generator.py:21).
NLTK_ENGLISH_STOPWORDS = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom", "this",
    "that", "that'll", "these", "those", "am", "is", "are", "was", "were",
    "be", "been", "being", "have", "has", "had", "having", "do", "does",
    "did", "doing", "a", "an", "the", "and", "but", "if", "or", "because",
    "as", "until", "while", "of", "at", "by", "for", "with", "about",
    "against", "between", "into", "through", "during", "before", "after",
    "above", "below", "to", "from", "up", "down", "in", "out", "on", "off",
    "over", "under", "again", "further", "then", "once", "here", "there",
    "when", "where", "why", "how", "all", "any", "both", "each", "few",
    "more", "most", "other", "some", "such", "no", "nor", "not", "only",
    "own", "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll", "m",
    "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn", "couldn't",
    "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't", "hasn",
    "hasn't", "haven", "haven't", "isn", "isn't", "ma", "mightn",
    "mightn't", "mustn", "mustn't", "needn", "needn't", "shan", "shan't",
    "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't", "won",
    "won't", "wouldn", "wouldn't",
]

# candidate_selector.py:31-33 — keep only stopwords of >=2 letters ("retain
# one letter words"), then add the domain words {pathway, pathways}.
STOPWORDS = sorted(
    {w for w in NLTK_ENGLISH_STOPWORDS if len(w) > 1} | {"pathway", "pathways"}
)

TOKEN_PATTERN = "[A-Za-z0-9]+"

# Whitespace for oracle-gated splits: RE2's \s is [\t\n\f\r ] while Java's
# \s also matches \x0B (vertical tab) — splitting on Java \s+ would diverge
# from the DuckDB oracles' string_split_regex('\s+') on any document
# containing \x0B. Every Spark-side whitespace split that feeds an oracle
# query uses this explicit RE2-equivalent class instead.
WS_SPLIT_RE = r"[ \t\n\f\r]+"


def _stop_lit() -> Column:
    return F.array(*[F.lit(w) for w in STOPWORDS])


def normalize_string(col: Column | str) -> Column:
    """string_utils.py:5-11 — strip, lower, replace -_/: with space.
    Order matters: the reference strips FIRST, so spaces produced by the
    replacement survive at the string edges."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(F.lower(F.trim(c)), "-_/:", "    ")


def tokenize(col: Column | str, keep_duplicates: bool = True) -> Column:
    """string_utils.py:14-24 — regex tokens of the normalized string minus
    stopwords; if ALL tokens are stopwords, fall back to the raw tokens."""
    toks = F.regexp_extract_all(normalize_string(col), F.lit(TOKEN_PATTERN), 0)
    kept = F.array_except(toks, _stop_lit()) if not keep_duplicates else F.filter(
        toks, lambda t: ~F.array_contains(_stop_lit(), t)
    )
    out = F.when(F.size(kept) > 0, kept).otherwise(toks)
    return F.array_distinct(out) if not keep_duplicates else out


def char_ngrams(col: Column | str, n: int, pad: str = "\x00") -> Column:
    """string_utils.py:40-48 — NUL-padded sliding character windows over the
    normalized string. `pad` is configurable only because some SQL oracles
    (DuckDB) reject NUL bytes; jaccard over the set is pad-char invariant
    as long as the pad char cannot occur in the normalized text."""
    s = normalize_string(col)
    padded = F.concat(F.lit(pad * (n - 1)), s, F.lit(pad * (n - 1)))
    # window count = len(normalized) + n - 1
    return F.transform(
        F.sequence(F.lit(1), F.length(s) + F.lit(n - 1)),
        lambda i: F.substring(padded, i, n),
    )


def jaccard(a: Column, b: Column) -> Column:
    """string_utils.py:51-58 — |a∩b| / |a∪b| on array columns treated as
    sets. 0.0 when both sides are empty (reference would raise)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def set_overlap(a: Column, b: Column) -> Column:
    """base_utils.py:60-70 — 2|a∩b| / (|a|+|b|); 0.0 if either is empty."""
    sa, sb = F.array_distinct(a), F.array_distinct(b)
    denom = F.size(sa) + F.size(sb)
    return F.when(
        (F.size(sa) > 0) & (F.size(sb) > 0),
        2.0 * F.size(F.array_intersect(sa, sb)) / denom,
    ).otherwise(F.lit(0.0))


def idf_table(
    entity_tokens: DataFrame,
    id_col: str = "ent_id",
    tokens_col: str = "tokens",
    doc_total: int | None = None,
) -> DataFrame:
    """candidate_selector.py:134-146 — idf(tok) = ln(doc_total / (df+1))
    with doc_total = n_entities + 1 and df = #distinct entities containing
    the token.

    Input: one row per entity with an array-of-tokens column. Output:
    (token STRING, df LONG, idf DOUBLE). One exploded groupBy — Catalyst
    plans it as partial + final hash aggregation (map-side combine), so the
    shuffle carries only (token, partial-count) rows.
    """
    if doc_total is None:
        doc_total = entity_tokens.count() + 1
    exploded = entity_tokens.select(
        F.col(id_col), F.explode(F.array_distinct(F.col(tokens_col))).alias("token")
    )
    return exploded.groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    ).select(
        "token",
        "df",
        F.log(F.lit(float(doc_total)) / (F.col("df") + 1)).alias("idf"),
    )
