"""pathhier_spark — a PySpark-native knowledge-graph construction engine.

Re-implements the query and data-processing capabilities of the reference
pipeline (lucylw/pathhier, a single-machine pathway-ontology alignment and
KG-merging system) as an idiomatic, cluster-scale Spark DataFrame pipeline:

    extract  → triple-mention extraction from web-page text (Arrow UDF)
    link     → entity linking vs a broadcast ontology dictionary
               (token inverted-index candidate join + IDF scoring +
               string-feature fusion; pathhier candidate_selector.py /
               feature_generator.py / pw_aligner.py semantics)
    canon    → xref connected-components canonicalization
               (pathhier pathway_kb_loader.py / cluster_model.py semantics)
    boot     → bootstrap self-training re-scoring loop (pw_aligner.py:485-530)
    material → partitioned node/edge triple tables + lineage/metrics rows,
               idempotently resumable (pathway_aligner.py checkpoint pickles)

Everything is pyspark.sql DataFrame + vectorized pandas/Arrow UDFs; no
per-row Python in any hot path.
"""

__version__ = "0.1.0"
