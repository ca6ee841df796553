"""Extra benchmark / profiling harness for optimization rounds (guide §1).

NOT the driver bench — bench.py stays frozen. This one times an arbitrary
subset of registry queries with the same methodology (noop sink, min-of-N
after the first timed run which doubles as warm-up), and can dump
.explain("formatted") plans to plans/r06/.

Usage:
  python bench_extra.py q226_prf_bm25 q207_dbscan        # time these
  python bench_extra.py --runs 3 q85_containment_join
  python bench_extra.py --explain before q226_prf_bm25   # plans/r06/*_before.txt
  python bench_extra.py --all                            # every bench.py headline query
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary", "q04_revenue_by_nation", "q06_token_idf",
    "q07_candidate_link_parts", "q08_bow_link_part_names", "q09_dedup_exact",
    "q11_neardup_pairs", "q12_cosine_topk", "q16_sessionize",
    "q17_extract_triples", "q18_connected_components", "q41_line_dedup",
    "q44_unigram_surprisal", "q47_asof_enrich", "q51_pagerank",
    "q52_embedding_neardup_bucketed", "q54_decontaminate", "q63_bm25_topk",
    "q72_label_prop", "q79_dsir_select", "q80_semantic_dedup",
    "q81_assoc_rules", "q82_hll_grouped", "q83_pack_sequences", "q84_hits",
    "q85_containment_join", "q86_ctfidf_terms", "q87_curation_funnel",
    "q88_anchor_graph", "q92_bigram_surprisal", "q93_rrf_fusion",
    "q97_sliding_window", "q98_neighbor_agg", "q101_jl_distortion",
    "q158_rouge_eval", "q161_dag_layers", "q164_funnel",
    "q165_hll_intersection", "q166_mad_outliers", "q169_frequent_sequences",
    "q170_text_tiling", "q171_winnowing", "q173_betweenness",
    "q178_cheapest_paths", "q183_quantile_norm", "q186_set_cover",
    "q197_interval_coverage", "q198_katz", "q200_decayed_engagement",
    "q201_kaplan_meier", "q202_g2_collocations", "q207_dbscan",
    "q208_nb_confusion", "q214_markov_attribution", "q216_burrows_delta",
    "q219_cdc_chunks", "q225_v_optimal", "q226_prf_bm25", "q231_symspell",
]


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    explain_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--explain":
            explain_tag = args[i + 1]; i += 2
        elif a == "--all":
            names.extend(HEADLINE); i += 1
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

    from pathhier_spark.session import get_spark

    spark = get_spark("pathhier_spark_bench_extra", cores=cores,
                      shuffle_partitions=max(cores, 8))
    from pathhier_spark import queries as q

    registry = q.queries()

    if explain_tag:
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = registry[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{explain_tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path}")
        spark.stop()
        return

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        best = None
        samples = []
        for _ in range(runs):
            t0 = time.time()
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            samples.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"{name}: min={timings[name]}  samples={samples}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": timings, "sf_dir": sf_dir, "runs": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
