from pathhier_spark.functions.text import (  # noqa: F401
    STOPWORDS,
    char_ngrams,
    idf_table,
    jaccard,
    normalize_string,
    set_overlap,
    tokenize,
)
