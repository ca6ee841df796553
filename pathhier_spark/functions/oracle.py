"""Pure-Python oracle implementations of the reference scalar functions.

These are semantic ports used ONLY by the pytest harness as row-level
oracles (SURVEY.md §5) — they never run inside Spark jobs. Each mirrors the
cited reference function exactly (including the NUL padding and the
stopword-fallback rule) so the Spark column expressions in
pathhier_spark.functions.text can be asserted bit-exact against them.
"""

from __future__ import annotations

import math
import re

from pathhier_spark.functions.text import STOPWORDS

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
_STOP = set(STOPWORDS)


def normalize_string(s: str) -> str:
    # string_utils.py:5-11
    return (
        s.strip()
        .lower()
        .replace("-", " ")
        .replace("_", " ")
        .replace("/", " ")
        .replace(":", " ")
    )


def tokenize_string(s: str) -> tuple[str, ...]:
    # string_utils.py:14-24
    toks = tuple(_TOKEN_RE.findall(normalize_string(s)))
    keep = tuple(t for t in toks if t not in _STOP)
    return keep if keep else toks


def get_character_ngrams(s: str, n: int, pad: str = "\x00") -> list[str]:
    # string_utils.py:40-48 (returns joined strings instead of char tuples;
    # set semantics downstream are identical)
    padded = pad * (n - 1) + normalize_string(s) + pad * (n - 1)
    return ["".join(w) for w in zip(*[padded[i:] for i in range(n)])]


def jaccard(a: set, b: set) -> float:
    # string_utils.py:51-58, with the 0/0 -> 0.0 guard we standardize on
    union = a | b
    if not union:
        return 0.0
    return len(a & b) / len(union)


def set_overlap(a: set, b: set) -> float:
    # base_utils.py:60-70
    if not a or not b:
        return 0.0
    return 2.0 * len(a & b) / (len(a) + len(b))


def idf(doc_total: int, df: int) -> float:
    # candidate_selector.py:134-146
    return math.log(doc_total / (df + 1))


def pair_features(kb_cls: str, pw_cls: str) -> dict[str, float]:
    # feature_generator.py:25-50 — the exact 5-feature vector
    kb_tokens = tokenize_string(kb_cls)
    pw_tokens = tokenize_string(pw_cls)
    feats = {
        "len_diff_perc": (
            abs(len(kb_tokens) - len(pw_tokens)) / len(kb_tokens)
            if kb_tokens
            else 0.0
        ),
        "token_jaccard": jaccard(set(kb_tokens), set(pw_tokens)),
    }
    for n in (3, 4, 5):
        feats[f"{n}gram_jaccard"] = jaccard(
            set(get_character_ngrams(kb_cls, n)), set(get_character_ngrams(pw_cls, n))
        )
    return feats


class UnionFind:
    """Oracle for connected-components canonicalization (intended semantics
    of pathway_utils.py:116-130 + pathway_kb_loader.py:208-234 +
    cluster_model.py:255-327: full transitive closure)."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller label wins
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo

    def components(self) -> dict:
        return {x: self.find(x) for x in list(self.parent)}
