"""Graph utilities: hierarchy extraction (G4), BFS frontier closure (G5),
entity-count stats (A5), BOW overlap features (A6), string-entry builders
(P10), name-pair expansion (J5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pathway_hierarchy(edges: DataFrame, pred: str = "component") -> DataFrame:
    """G4 (pathway.py:769-781): (parent, child) pairs where the edge
    predicate marks containment."""
    return edges.filter(F.col("pred") == pred).select(
        F.col("subj").alias("parent"), F.col("obj").alias("child")
    ).distinct()


def bfs_closure(
    edges: DataFrame,
    roots: DataFrame,
    *,
    src: str = "parent",
    dst: str = "child",
    max_depth: int = 32,
) -> DataFrame:
    """G5 (biocyc_ontology.py:45-79): all nodes reachable from `roots` via
    directed edges — iterative frontier expansion (same loop skeleton as CC:
    localCheckpoint per round, stop when the frontier is empty).
    roots: single-column DataFrame. Output: (node, depth)."""
    root_col = roots.columns[0]
    visited = roots.select(
        F.col(root_col).alias("node"), F.lit(0).alias("depth")
    ).localCheckpoint(eager=True)
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src])
            .select(F.col(dst).alias("node"), F.lit(d).alias("depth"))
            .join(visited.select("node"), "node", "left_anti")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def entity_count_histogram(
    nodes: DataFrame, group_col: str = "pathway_uid"
) -> DataFrame:
    """A5 (pathway_aligner.py:918-951): entity-count distribution per
    pathway/KB: (group, n_entities) plus overall stats in one pass."""
    return nodes.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_entities"))


def bow_overlap_feature(
    pairs: DataFrame, left_tokens: str, right_tokens: str
) -> DataFrame:
    """A6 (pw_aligner.py:104-135): feature = number of tokens present on
    both sides (sparse count-vector intersection)."""
    return pairs.withColumn(
        "bow_overlap",
        F.size(
            F.array_intersect(
                F.array_distinct(F.col(left_tokens)),
                F.array_distinct(F.col(right_tokens)),
            )
        ),
    )


def string_entry(
    df: DataFrame,
    *,
    aliases_col: str = "aliases",
    definition_col: str = "definition",
    parent_names_col: str | None = None,
    out_col: str = "entry",
) -> DataFrame:
    """P10 (pathway_utils.py:133-191): serialize an entity to the long
    'alias1; alias2; definition; subClassOf: parent;' display string."""
    parts = [
        F.array_join(F.array_distinct(F.col(aliases_col)), "; "),
        F.coalesce(F.col(definition_col).cast("string"), F.lit("")),
    ]
    expr = F.concat_ws("; ", *parts)
    if parent_names_col:
        expr = F.when(
            F.size(F.col(parent_names_col)) > 0,
            F.concat(
                expr,
                F.lit("; subClassOf: "),
                F.array_join(F.col(parent_names_col), "; "),
            ),
        ).otherwise(expr)
    return df.withColumn(out_col, expr)


def name_pair_expansion(
    pairs: DataFrame,
    left_aliases: str = "l_aliases",
    right_aliases: str = "r_aliases",
) -> DataFrame:
    """J5 (pathway_utils.py:236-258 form_name_entries): all (left alias x
    right alias) combinations per candidate pair, one scoring row each —
    two explodes, no join."""
    return pairs.withColumn("l_name", F.explode(F.col(left_aliases))).withColumn(
        "r_name", F.explode(F.col(right_aliases))
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """PageRank in integer fixed-point arithmetic — graph analytics over the
    materialized KG beyond connected components, built so the ITERATIVE
    float algorithm becomes deterministic and engine-portable (q51 replays
    the rounds as unrolled SQL CTEs, the same trick as q36's Lloyd rounds):
    ranks live as int64 micro-units (`scale`), each round's contribution is
    floor(rank / out_degree), the damped update is
    floor(damping_pct * sum(contrib) / 100) + floor((100 - damping_pct)
    * scale / 100) — pure integer ops, so no float summation order can
    perturb ranks across engines or partitionings. Simplified variant:
    dangling-node mass leaks (no redistribution) — mirrored exactly in the
    oracle.

    Scale shape: out-degrees are one combiner groupBy; each round is a
    broadcast-free equi-join of ranks onto edges (rank table is
    node-sized) + one combiner-friendly integer sum per dst. The loop
    inputs (`e`, `deg`, `nodes`) are eagerly localCheckpoint-ed ONCE
    before the loop — without that, every round re-executes the edge
    table's full upstream lineage (at q51's scale that's
    orders ⋈ lineitem → distinct, five redundant scans+joins of the
    largest table), the exact discipline connected_components applies
    (canonicalize.py). The lazy plan is still `iterations` rounds deep
    for the rank table — fine at the default 5; for long runs
    localCheckpoint the rank table every ~10 rounds too. Nodes = union
    of srcs and dsts; nodes with no in-edges hold the teleport term.
    Output: (node, rank_fp INT64, rank DOUBLE = rank_fp / scale)."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("s").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=True)
    teleport = (100 - damping_pct) * scale // 100
    ranks = nodes.withColumn("rank_fp", F.lit(int(scale)).cast("long"))
    for _ in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "s"), "s")
            .join(deg, "s")
            .select(
                F.col("d").alias("node"),
                F.floor(F.col("rank_fp") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(int(teleport)).cast("long")
                    + F.floor(
                        F.lit(damping_pct)
                        * F.coalesce(F.col("in_sum"), F.lit(0))
                        / F.lit(100)
                    )
                ).alias("rank_fp"),
            )
        )
    return ranks.select(
        "node",
        F.col("rank_fp").cast("long").alias("rank_fp"),
        (F.col("rank_fp").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def triangle_count(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation — the
    scale-standard exact algorithm (Cohen / Suri-Vassilvitskii MapReduce
    form): orient every undirected edge from its lower-(degree, id)
    endpoint to the higher one, enumerate wedges only at each edge's LOW
    endpoint, and close them with an oriented-edge join. Orientation
    bounds each node's wedge fan-out by its ORIENTED out-degree, which is
    O(sqrt(m)) for any graph — hub nodes never enumerate their quadratic
    neighbor pairs, so the wedge join survives power-law degree skew that
    would melt a naive neighbor self-join at 100 TB.

    Input may contain duplicates, self-loops, or both edge directions;
    they are canonicalized away. All-integer arithmetic end to end (q67's
    oracle recounts the same triangles with an independent id-ordered
    enumeration). Returns (node, n_tri) for nodes in >= 1 triangle.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    tris = _oriented_triangles(und)
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )


def _oriented_triangles(und: DataFrame) -> DataFrame:
    """Each triangle of the canonical simple graph `und` (u < v, distinct)
    exactly once as (x, y, z): the degree-ordered orientation wedge join
    (see triangle_count's docstring for why orientation survives power-law
    skew). x is the triangle's lowest-(degree, id) corner."""
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    keyed = (
        und.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    low_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = keyed.select(
        F.when(low_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(low_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(low_first, F.col("du")).otherwise(F.col("dv")).alias("ka"),
        F.when(low_first, F.col("dv")).otherwise(F.col("du")).alias("kb"),
    )
    e1 = oriented.select("a", F.col("b").alias("w1"), F.col("kb").alias("k1"))
    e2 = oriented.select("a", F.col("b").alias("w2"), F.col("kb").alias("k2"))
    wedges = e1.join(e2, "a").filter(
        F.struct(F.col("k1"), F.col("w1")) < F.struct(F.col("k2"), F.col("w2"))
    )
    closing = oriented.select(
        F.col("a").alias("w1"), F.col("b").alias("w2")
    )
    return wedges.join(closing, ["w1", "w2"]).select(
        F.col("a").alias("x"), F.col("w1").alias("y"), F.col("w2").alias("z")
    )


def local_clustering(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient: lcc(v) =
    2 * triangles(v) / (deg(v) * (deg(v) - 1)) over the canonical
    undirected simple graph — the standard "how clique-like is this
    node's neighborhood" signal (Watts-Strogatz), the per-node
    refinement of q67's triangle counts.

    Scale shape: the canonical edge set is localCheckpoint-ed once so
    the degree count and the triangle kernel share one materialization
    instead of re-deriving the upstream lineage twice (the q51 lesson);
    triangles come from ``triangle_count``'s degree-ordered orientation
    (wedge fan-out O(sqrt(m)) per edge, power-law safe). The join back
    is node-keyed and narrow. lcc is ONE IEEE division of exact
    integers (2 * n_tri exact, d * (d - 1) exact) — bit-reproducible.

    Returns (node, deg, n_tri, lcc) for nodes with deg >= 2 (lcc is
    undefined below); nodes in no triangle report n_tri = 0, lcc = 0.0.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri = triangle_count(und, src="u", dst="v")
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "node", "left")
        .na.fill({"n_tri": 0})
        .select(
            "node",
            "deg",
            "n_tri",
            (
                F.round(
                    (F.lit(2.0) * F.col("n_tri"))
                    / (F.col("deg") * (F.col("deg") - 1)),
                    6,
                )
                + F.lit(0.0)
            ).alias("lcc"),
        )
    )


def deterministic_walks(
    edges: DataFrame,
    *,
    n_seeds: int = 50,
    length: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic "random" walks over a directed graph — the corpus
    generator for DeepWalk/node2vec-style KG embeddings, with the
    random choice derandomized so two engines (and two cluster runs)
    emit IDENTICAL walks: at step s, walk w standing on node u moves to
    the out-neighbor v minimizing (md5(w || ':' || s || ':' || v), v).
    The hash varies per walk and per step, so walks diverge like random
    ones, but the choice is a pure function of (walk, step, candidate)
    — no RNG, no seed plumbing, replayable anywhere.

    Seeds are the ``n_seeds`` highest-out-degree nodes (ties by node id)
    — the hubs real walk corpora start from. A walk reaching a sink
    (no out-edges) simply ends; emitted rows are (walk_id, step, node)
    with step 0 the seed itself.

    Scale shape: the edge set is localCheckpoint-ed once and reused by
    all ``length`` steps (the q51 lineage lesson); each step is one
    equi-join of the |walks|-sized frontier against out-edges followed
    by a combiner-friendly min(struct) per walk — the argmin never
    windows over edges. Each frontier is checkpointed so plan depth
    stays flat in ``length``. Hub fan-out: a frontier node joins to its
    full out-list before the min; at web scale cap out-lists first
    (sample per src) — the argmin semantic is unchanged if the cap
    keeps the hash-minimal candidate, and the hash makes any cap a
    documented approximation, not silent nondeterminism.
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds = (
        e.groupBy("s")
        .agg(F.count(F.lit(1)).alias("od"))
        .orderBy(F.desc("od"), F.asc("s"))
        .limit(n_seeds)
        .select(F.col("s").alias("walk_id"))
    )
    cur = seeds.select(
        "walk_id", F.lit(0).cast("int").alias("step"),
        F.col("walk_id").alias("node"),
    ).localCheckpoint(eager=True)
    frames = [cur]
    for s in range(1, length + 1):
        h = F.md5(
            F.concat_ws(":", F.col("walk_id"), F.lit(str(s)), F.col("d"))
        )
        cur = (
            cur.join(e, cur["node"] == e["s"])
            .select("walk_id", h.alias("h"), "d")
            .groupBy("walk_id")
            .agg(F.min(F.struct("h", "d")).alias("m"))
            .select(
                "walk_id",
                F.lit(s).cast("int").alias("step"),
                F.col("m.d").alias("node"),
            )
            .localCheckpoint(eager=True)
        )
        frames.append(cur)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def label_propagation(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous label propagation (community detection) with a fully
    deterministic update: each round every node adopts the most frequent
    label among its neighbors, ties broken by the SMALLEST label — so the
    fixed iteration count replays identically on any engine or
    partitioning, and q72's oracle can unroll the rounds as SQL CTEs
    (the q36/q51/q62 discipline for iterative algorithms).

    Scale shape: the adjacency (both directions of the canonical edge set)
    is eagerly localCheckpoint-ed ONCE; each round is one node-keyed join
    of the node-sized label table onto it, a combiner-friendly
    (node, label) count, and an integer argmax via min(struct(-cnt,
    label)) — no windows over corpus-sized partitions, and the label
    table is re-checkpointed per round so lineage stays flat
    (connected_components' loop discipline, canonicalize.py).

    Returns (node, label); labels are community representatives drawn
    from node ids. Init: every node its own label.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    adj = (
        und.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionByName(und.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .localCheckpoint(eager=True)
    )
    labels = adj.select("node").distinct().select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        nbr_labels = adj.join(
            labels.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node", "label")
        cnt = nbr_labels.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        labels = (
            cnt.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("label").alias("l"),
                    )
                ).alias("b")
            )
            .select("node", F.col("b.l").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def kcore(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    rounds: int = 3,
) -> DataFrame:
    """Fixed-round k-core peeling: each round computes current degrees and
    drops every node (with its incident edges) whose degree is below k.
    Run to convergence this is exactly the k-core subgraph (the standard
    peeling algorithm); with a FIXED round count it is a deterministic
    over-approximation that both engines replay identically, which is what
    makes q74's oracle an unrolled-CTE chain (the q36/q51/q62/q72
    discipline for iterative algorithms). Tests assert the fixed-round
    result has converged on the gate graph (one more round is a no-op).

    Scale shape: per round one combiner-friendly degree aggregate over the
    current edge set plus two left-semi joins against the surviving-node
    table — the semi joins ship only node ids, never attributes, and the
    edge table shrinks monotonically so later rounds are cheaper. The
    edge set is eagerly localCheckpoint-ed per round (canonicalize.py's
    loop discipline) so round r never re-executes rounds 0..r-1.

    Returns (node, deg): every surviving node with its degree inside the
    surviving subgraph.
    """
    cur = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _deg(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("u").alias("node"))
            .unionByName(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )

    for _ in range(rounds):
        keep = _deg(cur).filter(F.col("deg") >= k).select("node")
        cur = (
            cur.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    return _deg(cur)


def hits_fixedpoint(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """HITS hubs-and-authorities in integer fixed-point arithmetic — the
    same determinism discipline as pagerank_fixedpoint (q51): scores live
    as int64 micro-units, every half-step is an integer sum followed by
    MAX-normalization via exact integer division (`div`), so no float
    summation order can perturb scores across engines or partitionings and
    the oracle replays the rounds as unrolled SQL CTEs.

    Max-normalization (score * scale div max_raw, the Kleinberg power
    iteration normalized by the sup-norm instead of L2) keeps every score
    in [0, scale] with the top hub/authority pinned at exactly `scale`,
    and bounds the intermediate product: raw <= in_deg_max * scale, so
    raw * scale < 2^63 requires in_deg_max < ~9.2e6 — documented headroom,
    far beyond any realistic per-node degree after the standard super-node
    cap. A zero max (no edges) leaves scores 0 instead of dividing.

    Scale shape: edges and the node table are eagerly localCheckpoint-ed
    once before the loop; each half-step is one node-sized equi-join of
    scores onto edges plus one combiner-friendly integer sum; the 1-row
    max broadcasts. The per-half raw-score table is ALSO localCheckpoint-ed
    (LAZILY — eager would run one materialization job per half-step during
    loop construction; lazy truncates the lineage identically and
    materializes once on the first action): it is read by TWO branches
    (the max aggregate and the normalized join-back), and Spark does not
    dedup common subtrees —
    left lazy, the two branches would each re-derive the whole previous
    round, doubling the plan per half-step (observed: 2^6 plan blowup, 566
    SortMergeJoins, 8.5s for a 1600-node graph). Materialized per half,
    the plan stays linear in rounds — the per-round checkpoint discipline
    of connected_components. Output: (node, hub_fp, auth_fp INT64,
    hub/auth DOUBLE = fp / scale)."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.withColumn("h_fp", F.lit(int(scale)).cast("long"))

    def _half(score: DataFrame, col_in: str, key_in: str, key_out: str,
              col_out: str) -> DataFrame:
        # SPARSE half-step (r6): the score table carries only nodes
        # reachable in this direction; an absent node's score is exactly
        # 0, so the inner edge join drops only zero contributions, the
        # max is unchanged (raw >= 0), and the normalized table equals
        # the dense form row-for-row on every present node. The dense
        # nodes-left-join that used to run here per half-step (two
        # re-exchanges of checkpointed RDDs each time) now happens ONCE
        # at the end, where the output contract needs every node.
        raw = (
            e.join(
                score.select(
                    F.col("node").alias(key_in), F.col(col_in).alias("x")
                ),
                key_in,
            )
            .groupBy(F.col(key_out).alias("node"))
            .agg(F.sum("x").alias("raw"))
            .localCheckpoint(eager=False)
        )
        mx = raw.agg(F.max("raw").alias("m"))
        return (
            raw.crossJoin(F.broadcast(mx))
            .select(
                "node",
                F.when(
                    F.col("m") > 0,
                    F.expr(f"(raw * {int(scale)}L) div m"),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias(col_out),
            )
        )

    # initial authority frame so iterations=0 returns the uniform scores
    # instead of crashing on a None join (pagerank's 0-iteration contract)
    auth = nodes.withColumn("a_fp", F.lit(int(scale)).cast("long"))
    for _ in range(iterations):
        auth = _half(hub, "h_fp", "s", "d", "a_fp")
        hub = _half(auth, "a_fp", "d", "s", "h_fp")
    # densify once: nodes absent from a sparse side score exactly 0
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("h_fp"), F.lit(0).cast("long")).alias("h_fp"),
            F.coalesce(F.col("a_fp"), F.lit(0).cast("long")).alias("a_fp"),
        )
        .select(
            "node",
            "h_fp",
            "a_fp",
            (F.col("h_fp").cast("double") / F.lit(float(scale))).alias("hub"),
            (F.col("a_fp").cast("double") / F.lit(float(scale))).alias(
                "auth"
            ),
        )
    )


def neighborhood_aggregate(
    edges: DataFrame,
    features: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    feat_col: str = "feat",
    hops: int = 2,
) -> DataFrame:
    """GNN-style integer message passing over the directed KG: round k
    gives every node the (sum, path-count) of its k-hop out-neighborhood's
    integer feature, counted WITH path multiplicity (exactly what a
    mean-aggregator GNN layer composes before normalizing). Generalizes
    the reference's one-hop neighbor feature gathering
    (pathway.py:769-781 hierarchy walk + pw_aligner.py:104-135 BOW
    overlap) into the k-layer propagation a KG embedding stage needs.

    All arithmetic is int64 (sums of bigint features) so partitioning
    can never perturb results; callers divide sum/count themselves if
    they want the float mean.

    Scale shape: each hop is ONE equi-join of the (node-sized) message
    frame onto edges at `dst` + one combiner-friendly groupBy at `src` —
    the same join the ranks table makes in pagerank_fixedpoint, so the
    same bucketing answer applies at 100 TB (bucket edges by dst; the
    message frame is node-sized and co-partitions for free). The message
    frame is localCheckpoint-ed per hop to keep lineage flat. Path counts
    grow multiplicatively with degree — at hops<=3 on web graphs the
    int64 headroom (9.2e18) holds to ~10^6-degree hubs; beyond that cap
    hub degree upstream.

    Output: (node, feat, then per hop k: h{k}_sum, h{k}_cnt) for every
    node in `features`; nodes with no k-hop out-path get (0, 0)."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).distinct().localCheckpoint(eager=True)
    base = features.select(
        F.col(node_col).alias("node"), F.col(feat_col).cast("long").alias("feat")
    )
    out = base
    # msg carries (node, m_sum, m_cnt): the hop-(k-1) aggregate being
    # pushed one more hop. Hop 1 propagates the raw feature itself.
    msg = base.select(
        "node", F.col("feat").alias("m_sum"), F.lit(1).cast("long").alias("m_cnt")
    )
    for k in range(1, hops + 1):
        hop = (
            e.join(msg.withColumnRenamed("node", "d"), "d")
            .groupBy("s")
            .agg(
                F.sum("m_sum").alias("m_sum"),
                F.sum("m_cnt").alias("m_cnt"),
            )
            .withColumnRenamed("s", "node")
            .localCheckpoint(eager=True)
        )
        out = out.join(hop, "node", "left").select(
            out["*"],
            F.coalesce(F.col("m_sum"), F.lit(0)).cast("long").alias(f"h{k}_sum"),
            F.coalesce(F.col("m_cnt"), F.lit(0)).cast("long").alias(f"h{k}_cnt"),
        )
        msg = hop
    return out


def common_neighbor_links(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
    max_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor / Jaccard link prediction on the undirected KG —
    the classic KG-completion primitive: for every non-adjacent node pair
    that closes an open wedge, count shared neighbors and score
    jaccard = common / (deg(a) + deg(b) - common). This is the candidate
    generator a curation loop runs after canonicalization to propose
    missing edges (the alignment analogue of pw_aligner's token-overlap
    candidate stage, lifted from strings to graph structure).

    Algorithm: canonicalize to undirected (u < v) edges, then enumerate
    wedges by joining the adjacency list with itself on the center node
    (a < b kills mirror duplicates), groupBy-count the pair, anti-join
    existing edges, join degrees. Every step is an equi-join or a
    combiner-friendly count — no crossJoin anywhere.

    Scale shape: wedge count is sum(deg_w^2) — a hub with degree D emits
    D^2/2 candidate pairs, THE skew hazard of this op at web scale.
    `max_degree` drops hub centers before enumeration (the standard
    Vernica/ANN-benchmarks mitigation; at 10^12 docs set it near p99.9
    degree so celebrity hubs don't dominate); capped results are a
    documented under-approximation (hub-mediated wedges vanish).
    Output: (a, b, common, deg_a, deg_b, jaccard DOUBLE), one IEEE
    division of exact int64s per row."""
    und = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    ).filter(F.col("u") < F.col("v")).distinct().localCheckpoint(eager=True)
    adj = und.select(
        F.col("u").alias("w"), F.col("v").alias("n")
    ).union(und.select(F.col("v").alias("w"), F.col("u").alias("n")))
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    if max_degree is not None:
        centers = adj.join(
            deg.filter(F.col("deg") <= max_degree), "w"
        ).select("w", "n")
    else:
        centers = adj
    wedges = (
        centers.alias("x")
        .join(centers.alias("y"), "w")
        .filter(F.col("x.n") < F.col("y.n"))
        .select(F.col("x.n").alias("a"), F.col("y.n").alias("b"))
    )
    common = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("common")
    ).filter(F.col("common") >= min_common)
    cand = common.join(
        und,
        (common["a"] == und["u"]) & (common["b"] == und["v"]),
        "left_anti",
    )
    return (
        cand.join(deg.withColumnRenamed("w", "a").withColumnRenamed("deg", "deg_a"), "a")
        .join(deg.withColumnRenamed("w", "b").withColumnRenamed("deg", "deg_b"), "b")
        .select(
            "a",
            "b",
            F.col("common").cast("long").alias("common"),
            F.col("deg_a").cast("long").alias("deg_a"),
            F.col("deg_b").cast("long").alias("deg_b"),
            (
                F.col("common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def transitive_closure_mindist(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    doublings: int = 3,
) -> DataFrame:
    """All-pairs shortest hop-distance up to 2**doublings via iterative
    min-plus doubling — the ontology subsumption-closure operator (the
    full materialization of what bfs_closure walks from fixed roots;
    reference: biocyc_ontology.py:45-79 ancestor closure). After round r
    the frame holds EXACTLY the pairs whose true distance is <= 2**r,
    each at its true distance: any shortest path of length L <= 2**r
    splits at its midpoint into two shortest halves of length <= 2**(r-1),
    so the min-plus self-join finds it, and every emitted value is the
    length of a real path so it can never undershoot.

    log2(diameter) rounds instead of diameter rounds — the reason to
    prefer doubling over frontier BFS when the closure itself is the
    output (ontology is-a DAGs run 10-20 levels deep; 4-5 doublings
    close them). Scope honestly: the output is the closure, which is
    inherently O(reachable pairs) — right-sized for ontology/hierarchy
    graphs (10^4-10^6 nodes, the reference's regime), NOT for the full
    web graph, where bounded-depth bfs_closure from seed sets is the
    tool. Each round is one self-equi-join (dst==src) + one min-combiner
    groupBy, checkpointed to keep lineage flat. Cycles are benign:
    self-pairs are filtered at the end, and min() absorbs revisits.
    Output: (src, dst, dist INT), src != dst, dist <= 2**doublings."""
    d = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .withColumn("dist", F.lit(1).cast("int"))
        .localCheckpoint(eager=True)
    )
    for _ in range(doublings):
        composed = (
            d.alias("p")
            .join(d.alias("q"), F.col("p.b") == F.col("q.a"))
            .select(
                F.col("p.a").alias("a"),
                F.col("q.b").alias("b"),
                (F.col("p.dist") + F.col("q.dist")).alias("dist"),
            )
        )
        d = (
            d.union(composed)
            .groupBy("a", "b")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return d.filter(F.col("a") != F.col("b")).select(
        F.col("a").alias(src), F.col("b").alias(dst), F.col("dist")
    )


def reciprocity(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Directed-graph reciprocity: the fraction of distinct directed
    edges (u, v), u != v, whose reverse (v, u) is also present — the
    network-metrology scalar separating citation-like graphs
    (reciprocity ~ 0) from social/link-exchange graphs (~ 0.3+), and for
    a web-KG the quick probe for symmetric-predicate extraction leaks.

    Plan: canonical distinct directed edge set is localCheckpoint-ed
    ONCE (the local_clustering discipline) so the total count and the
    reverse-probe share a materialization; the reverse test is a
    LEFT SEMI self-join on the edge key (no fan-out, no row
    duplication); both counts are exact int64 1-row aggregates and the
    division is the only double, round-6. Output: one row
    (n_edges, n_reciprocal, reciprocity)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rev = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    n_all = e.agg(F.count(F.lit(1)).alias("n_edges"))
    n_rec = e.join(rev, ["u", "v"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_reciprocal")
    )
    return n_all.crossJoin(F.broadcast(n_rec)).select(
        "n_edges",
        "n_reciprocal",
        (
            F.round(
                F.col("n_reciprocal").cast("double")
                / F.col("n_edges").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("reciprocity"),
    )


def degree_assortativity(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity (Newman 2002): Pearson correlation of the
    degrees at the two ends of each undirected edge — positive when hubs
    wire to hubs (social graphs), negative when hubs wire to leaves (the
    web, most extracted KGs). With reciprocity and local clustering this
    completes the one-look structural fingerprint of the extracted
    graph.

    Plan: canonicalize undirected distinct edges (u < v), checkpoint
    once, count degrees with one combiner groupBy, join degrees back to
    both endpoints (the rank-joined edge table is edge-sized), then emit
    BOTH orientations of each edge (the standard symmetrization — makes
    the statistic orientation-free) and reduce to the six Pearson sums
    (n, Sx, Sy, Sxy, Sxx, Syy) in ONE exact-int64 aggregate; degrees are
    bounded by max-degree so the int64 sums hold to ~1e12 edges x 1e3
    mean degree. r is then a fixed shape of double products of those
    integers (identical on both engines), round-6. NULL when the
    variance is zero (regular graph). Output: one row
    (n_pairs, assortativity)."""
    e = (
        edges.select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("xu"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("xv"))
    both = (
        e.join(du, "u")
        .join(dv, "v")
        .select(F.col("xu").alias("x"), F.col("xv").alias("y"))
    )
    sym = both.unionAll(both.select(F.col("y").alias("x"), F.col("x").alias("y")))
    sums = sym.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    r = (n * sxy - sx * sy) / F.sqrt(var_x * var_y)
    return sums.select(
        F.col("n").alias("n_pairs"),
        F.when(
            (var_x > 0) & (var_y > 0), F.round(r, 6) + F.lit(0.0)
        ).alias("assortativity"),
    )


def resolve_chains(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Resolve every node of a FUNCTIONAL graph (each src has exactly one
    out-edge; terminals have none) to its chain terminal — the web
    canonicalization workhorse: HTTP redirect chains, alias->canonical
    maps, symlink forests. The naive walk is sequential in chain length;
    this is POINTER DOUBLING: each round joins the pointer table with
    itself so every entry's pointer jumps to the node `2^round` steps
    ahead, converging in ceil(log2(longest chain)) rounds — the classic
    parallel path-compression primitive (distinct from the large/small-star
    CC in canonicalize.py, which contracts undirected components, and from
    pagerank's fixed iteration count: this one detects convergence).

    Per round: one self equi-join of the node-sized pointer table (left,
    so terminal pointers pass through) + an eager localCheckpoint to cut
    the doubling lineage; convergence = a LEFT SEMI probe of pointers
    against the source set (zero rows => every pointer is terminal). Hop
    counts accumulate exactly (hops + matched entry's hops), so the
    output also yields chain-length analytics for free. A cycle never
    converges — after max_rounds (2^30-step chains) raises ValueError
    rather than looping silently. Output: (src, final, hops) — one row
    per non-terminal node.

    Reference parity: pathhier resolves xref alias chains one lookup at a
    time inside Python dict loops (pathhier/utils/pathway_utils.py); here
    the whole forest compresses in O(log L) shuffles regardless of node
    count."""
    p = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("ptr"),
        F.lit(1).cast("long").alias("hops"),
    ).localCheckpoint(eager=True)
    srcs = (
        p.select(F.col("node").alias("srcnode"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # max_rounds doublings (reach = 2^max_rounds steps) + a final
    # convergence check, so max_rounds=8 genuinely covers 200-link
    # chains; the i == max_rounds break skips the last doubling whose
    # result could never be inspected (a whole wasted shuffle+checkpoint
    # on the cycle path otherwise)
    for i in range(max_rounds + 1):
        pending = (
            p.join(srcs, p["ptr"] == srcs["srcnode"], "left_semi").count()
        )
        if pending == 0:
            return p.select(
                F.col("node").alias("src"),
                F.col("ptr").alias("final"),
                F.col("hops"),
            )
        if i == max_rounds:
            break
        p = (
            p.alias("a")
            .join(p.alias("b"), F.col("a.ptr") == F.col("b.node"), "left")
            .select(
                F.col("a.node").alias("node"),
                F.coalesce(F.col("b.ptr"), F.col("a.ptr")).alias("ptr"),
                (
                    F.col("a.hops") + F.coalesce(F.col("b.hops"), F.lit(0))
                ).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    raise ValueError(
        f"resolve_chains did not converge in {max_rounds} rounds — "
        "the pointer graph almost certainly contains a cycle"
    )


def trustrank_fixedpoint(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """TrustRank (Gyongyi et al., VLDB 2004): PageRank with the teleport
    mass restricted to a trusted SEED set, so rank becomes propagated
    trust — the classic web-spam damper, and for an extracted KG the
    "how far is this entity from a curated anchor" score. Same integer
    fixed-point discipline as pagerank_fixedpoint (int64 micro-units,
    floor divisions, dangling mass leaks) so the iterative algorithm
    stays deterministic and engine-portable; the ONLY deltas are r0
    (seeds start at `scale`, everything else at 0) and the per-round
    teleport term (is_seed * teleport instead of uniform). Un-normalized
    variant: each seed injects a full unit of trust (no 1/|seeds|
    split) — mirrored exactly in the oracle.

    Scale shape: identical to pagerank — loop inputs eagerly
    localCheckpoint-ed once, each round one node-sized equi-join onto
    edges + a combiner integer sum. The seed flag rides the node table
    as an int column (seeds join is a broadcast: trust lists are
    human-curated, thousands at most). Output: (node, rank_fp INT64,
    rank DOUBLE)."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint(eager=True)
    sd = seeds.select(F.col(seed_col).alias("node")).distinct()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .join(
            F.broadcast(sd.withColumn("seed_tag", F.lit(1))), "node", "left"
        )
        .select(
            "node",
            F.coalesce(F.col("seed_tag"), F.lit(0)).cast("long").alias("is_seed"),
        )
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("s").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=True)
    teleport = (100 - damping_pct) * scale // 100
    ranks = nodes.select(
        "node", (F.col("is_seed") * int(scale)).cast("long").alias("rank_fp")
    )
    for _ in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "s"), "s")
            .join(deg, "s")
            .select(
                F.col("d").alias("node"),
                F.floor(F.col("rank_fp") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.col("is_seed") * teleport
                    + F.floor(
                        damping_pct
                        * F.coalesce(F.col("in_sum"), F.lit(0))
                        / 100
                    )
                ).cast("long").alias("rank_fp"),
            )
        )
    return ranks.select(
        "node",
        "rank_fp",
        (F.col("rank_fp") / F.lit(float(scale))).alias("rank"),
    )


def cocitation_pairs(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_out_degree: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Co-citation similarity (Small 1973, the web-graph classic): two
    targets are similar when the same sources link to both; the score is
    the number of distinct co-citing sources. The direct computation is
    a per-source pair expansion — quadratic in out-degree, so one
    directory hub with 1e5 out-links would emit 5e9 pairs and dominate
    the whole job. The standard guard: DROP sources above
    `max_out_degree` before expanding (hub pages carry near-zero
    similarity signal anyway — they cite everything), which bounds
    per-source work at max_out_degree^2/2 and makes total cost linear in
    surviving edges. min_count=2 prunes the long tail of
    single-co-citation noise pairs BEFORE the final sort.

    Plan: distinct edges -> out-degree combiner groupBy -> degree filter
    (a broadcast-able source list is NOT needed: the degree joins back
    on the edge's own key) -> per-source self-join generating ordered
    pairs (a < b, so each pair counts once) -> combiner count. Output:
    (dst_a, dst_b, n_cociting)."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).distinct()
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    kept = e.join(deg, "s").filter(F.col("outdeg") <= max_out_degree)
    pairs = (
        kept.alias("l")
        .join(kept.alias("r"), F.col("l.s") == F.col("r.s"))
        .filter(F.col("l.d") < F.col("r.d"))
        .select(
            F.col("l.d").alias("dst_a"), F.col("r.d").alias("dst_b")
        )
    )
    return (
        pairs.groupBy("dst_a", "dst_b")
        .agg(F.count(F.lit(1)).alias("n_cociting"))
        .filter(F.col("n_cociting") >= min_count)
    )


def neighborhood_function(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
) -> DataFrame:
    """EXACT neighborhood function N(h): the number of ordered pairs
    (u, v) with a directed path of length <= h — the curve whose 90%
    point is the graph's effective diameter (Palmer/Faloutsos ANF). This
    is the verification baseline: it materializes the full reachable-pair
    set, which on a well-connected graph grows toward |V|^2 — at web
    scale you run hyperball_neighborhood below (O(|V| * m) state) and
    keep this for sampled/test subgraphs, exactly the brute-vs-bucketed
    split of q32/q52.

    Plan: hop 1 is the distinct edge set; each further hop joins the
    frontier pair table onto edges and unions+distincts, eagerly
    localCheckpoint-ed (the CC/q51 lineage discipline) since each round's
    count() drives the output. Output: (hop, n_pairs), max_hops rows,
    n_pairs monotone nondecreasing."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).distinct().localCheckpoint(eager=True)
    cur = e.select(F.col("s").alias("u"), F.col("d").alias("v"))
    rows = [(1, cur.count())]
    for h in range(2, max_hops + 1):
        cur = (
            cur.join(e, cur["v"] == e["s"])
            .select("u", F.col("d").alias("v"))
            .union(cur)
            .distinct()
            .localCheckpoint(eager=True)
        )
        rows.append((h, cur.count()))
    return edges.sparkSession.createDataFrame(
        rows, "hop long, n_pairs long"
    )


def hyperball_neighborhood(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    m: int = 64,
    prefix: str = "hb",
) -> DataFrame:
    """HyperBall (Boldi/Vigna 2013): the neighborhood function estimated
    with one HyperLogLog counter per node — B_h(u) = N(u) union
    B_{h-1}(w) for out-neighbors w, so each hop is ONE edge join + ONE
    (node, register) max-combine groupBy over O(|V| * m) state, never a
    pair table. This is how effective diameter gets computed on
    billion-node graphs; the md5-derived registers (textstats hll
    machinery) make every estimate deterministic, so tests can pin exact
    relative-error numbers rather than distributions.

    Per hop the shuffle volume is |E| * m register rows — m trades
    accuracy (~1.04/sqrt(m) per node) for shuffle width. Registers are
    eagerly localCheckpoint-ed per hop (each hop's estimate aggregate
    AND the next hop's join both read them). Output: (hop, est_pairs
    DOUBLE round-6) — est_pairs estimates exact neighborhood_function's
    n_pairs; per-node ball sizes are available from the intermediate
    registers via hll_estimate_grouped."""
    from pathhier_spark.operators.textstats import (
        _hll_hash_cols,
        hll_estimate_grouped,
    )

    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).distinct().localCheckpoint(eager=True)
    j, rho = _hll_hash_cols("d", m, prefix)
    # dense per-node frames so hop-0 register joins stay max-mergeable
    base = (
        e.select(F.col("s").alias("node"), j.alias("j"), rho.alias("rho"))
        .groupBy("node", "j")
        .agg(F.max("rho").cast("long").alias("reg"))
        .localCheckpoint(eager=True)
    )

    allj = edges.sparkSession.range(m).select(F.col("id").alias("j"))

    def _total(regs: DataFrame):
        # densify before estimating: the loop state is SPARSE (absent
        # register = 0, which max-merge preserves) but the harmonic-mean
        # estimate must see all m registers per node
        frame = regs.select("node").distinct().crossJoin(F.broadcast(allj))
        dense = frame.join(regs, ["node", "j"], "left").select(
            "node", "j", F.coalesce("reg", F.lit(0)).cast("long").alias("reg")
        )
        est = hll_estimate_grouped(dense, "node", m=m)
        # coalesce: SUM over zero rows is NULL (empty edge set) — the
        # exact counterpart returns 0 there, so must the estimate
        return est.agg(
            F.coalesce(F.sum("est"), F.lit(0.0))
        ).collect()[0][0]

    regs = base
    rows = [(1, float(_total(regs)))]
    for h in range(2, max_hops + 1):
        pulled = (
            e.join(regs.withColumnRenamed("node", "d"), "d")
            .select(F.col("s").alias("node"), "j", "reg")
        )
        regs = (
            pulled.union(base)
            .groupBy("node", "j")
            .agg(F.max("reg").alias("reg"))
            .localCheckpoint(eager=True)
        )
        rows.append((h, float(_total(regs))))
    out = edges.sparkSession.createDataFrame(rows, "hop long, est double")
    return out.select(
        "hop", (F.round(F.col("est"), 6) + F.lit(0.0)).alias("est_pairs")
    )


def metapath_counts(
    triples: DataFrame,
    *,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    max_mid_degree: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Relation-composition discovery (metapath counting): how often does
    pred1 compose with pred2 through a shared middle entity
    (s -p1-> m -p2-> o)? The schema-induction signal of KG construction —
    high-count compositions are rule candidates (born_in . located_in =>
    citizen_of) and the raw material for path-based link prediction.

    The join key is the MIDDLE entity, so fan-out is in_degree(m) *
    out_degree(m) — a celebrity node with 1e5 of each would emit 1e10
    paths. Same cure as co-citation's hub cap: drop middles whose
    in-degree OR out-degree exceeds max_mid_degree before joining
    (ultra-hubs compose with everything and carry no schema signal).
    Counts are then linear in surviving edge pairs.

    Plan: distinct triples -> two degree combiner groupBys -> degree
    filter joined back on the middle key -> one equi-join on the middle
    -> (pred1, pred2) combiner count + distinct endpoint-pair count.
    Output: (pred1, pred2, n_paths, n_pairs), n_paths >= min_count."""
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    ).distinct().localCheckpoint(eager=True)
    ind = t.groupBy(F.col("o").alias("m")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    outd = t.groupBy(F.col("s").alias("m")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    mids = (
        ind.join(outd, "m")
        .filter(
            (F.col("in_deg") <= max_mid_degree)
            & (F.col("out_deg") <= max_mid_degree)
        )
        .select("m")
    )
    left = t.join(mids, t["o"] == mids["m"]).select(
        F.col("s").alias("s1"), F.col("p").alias("p1"), F.col("o").alias("mid")
    )
    right = t.select(
        F.col("s").alias("mid2"), F.col("p").alias("p2"), F.col("o").alias("o2")
    )
    paths = left.join(right, left["mid"] == right["mid2"])
    return (
        paths.groupBy(
            F.col("p1").alias("pred1"), F.col("p2").alias("pred2")
        )
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.countDistinct("s1", "o2").alias("n_pairs"),
        )
        .filter(F.col("n_paths") >= min_count)
    )


def negative_samples(
    triples: DataFrame,
    *,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training: corrupt
    every triple's object with a pseudo-random OTHER entity — without
    RNG, so the training set is reproducible and both engines derive the
    identical corruption. The corrupted object for triple t is the
    entity whose md5-hash is the PREDECESSOR of t's own hash (largest
    entity hash <= hash(t)) — uniform over the entity set because md5
    scatters both sides uniformly.

    The scalable mechanics are the point: a predecessor lookup is
    normally a global sort-merge; here hash space is cut into
    `n_buckets` CONTIGUOUS ranges, entities and triples are unioned and
    ordered WITHIN each bucket (window partitioned by bucket — parallel,
    never SinglePartition), and last(entity, ignorenulls) carries the
    predecessor forward (the q117 LOCF trick applied to a join). A
    triple at the head of its bucket (no preceding entity in-range)
    falls back to the GLOBAL max-hash entity — the deterministic
    wrap-around. Corruptions that happen to equal the true object are
    dropped (both engines drop the same rows). Output: (subj, pred, obj,
    neg_obj)."""
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    ).distinct()
    ents = (
        t.select(F.col("s").alias("ent"))
        .union(t.select(F.col("o").alias("ent")))
        .distinct()
    )

    def _hex32(col):
        return F.conv(
            F.substring(F.md5(col), 1, 8), 16, 10
        ).cast("long")

    width = (1 << 32) // int(n_buckets)
    eh = _hex32(F.concat(F.lit("ent:"), F.col("ent")))
    th = _hex32(
        F.concat(
            F.lit("neg:"), F.col("s"), F.lit(":"), F.col("p"),
            F.lit(":"), F.col("o"),
        )
    )
    e_rows = ents.select(
        eh.alias("h"), F.lit(0).alias("kind"), F.col("ent"),
        F.lit(None).cast("string").alias("s"),
        F.lit(None).cast("string").alias("p"),
        F.lit(None).cast("string").alias("o"),
    )
    t_rows = t.select(
        th.alias("h"), F.lit(1).alias("kind"),
        F.lit(None).cast("string").alias("ent"), "s", "p", "o",
    )
    u = e_rows.union(t_rows).withColumn(
        "bucket", F.floor(F.col("h") / F.lit(int(width)))
    )
    # `ent` as the third order key makes the order total on entity rows:
    # two entities CAN collide in the 32-bit hash (birthday bound), and
    # without the tiebreak the carried predecessor would be
    # engine/partitioning-dependent (the epoch_shuffle id-tiebreak rule).
    # Triple rows have ent NULL, but ties among them don't matter — LOCF
    # only carries entity values, and NULL ordering never mixes kinds.
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "kind", "ent")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pred_ent = u.withColumn(
        "prev_ent", F.last("ent", ignorenulls=True).over(w)
    ).filter(F.col("kind") == 1)
    gmax = ents.select(
        F.max_by("ent", eh).alias("wrap_ent")
    )
    return (
        pred_ent.crossJoin(F.broadcast(gmax))
        .select(
            F.col("s").alias(subj),
            F.col("p").alias(pred),
            F.col("o").alias(obj),
            F.coalesce(F.col("prev_ent"), F.col("wrap_ent")).alias("neg_obj"),
        )
        .filter(F.col("neg_obj") != F.col(obj))
    )


def powerlaw_alpha(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    xmin: int = 2,
) -> DataFrame:
    """Power-law exponent of the degree distribution via the Clauset et
    al. (2009) continuous MLE, alpha = 1 + n / sum(ln(deg / xmin)) over
    degrees >= xmin — the one-number test of whether the extracted KG has
    the heavy-tailed wiring real webs/KGs show (alpha typically 2-3) or
    something degenerate (uniform extraction noise). Fits TOTAL degree
    on the canonical undirected edge set.

    Determinism shape: degrees are exact integers from one combiner
    groupBy; the ln terms are ln(deg/xmin) of small RATIONALS — the same
    value on both engines (the q06-IDF precedent) — but their SUM is
    order-sensitive in doubles, so the fold runs over the DEGREE
    HISTOGRAM (n_k * ln(k/xmin), at most max-degree distinct terms)
    collected into a degree-ordered array and folded left-to-right with
    F.aggregate — one fixed summation order on any partitioning, the q63
    score-fold discipline. The histogram is tiny (distinct degree
    values), so the collect_list is not a data-sized materialization.
    Output: one row (n_tail, max_deg, alpha round-6); alpha NULL when
    the tail is empty or all-xmin (zero denominator)."""
    e = (
        edges.select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    hist = (
        deg.filter(F.col("deg") >= xmin)
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("nk"))
    )
    folded = hist.agg(
        F.sum("nk").alias("n_tail"),
        F.max("deg").alias("max_deg"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("deg", "nk"))),
            F.lit(0.0),
            lambda acc, s: acc
            + s["nk"] * F.log(s["deg"] / F.lit(float(xmin))),
        ).alias("lnsum"),
    )
    return folded.select(
        F.coalesce(F.col("n_tail"), F.lit(0)).cast("long").alias("n_tail"),
        "max_deg",
        F.when(
            F.col("lnsum") > 0,
            F.round(
                F.lit(1.0) + F.col("n_tail") / F.col("lnsum"), 6
            ) + F.lit(0.0),
        ).alias("alpha"),
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Newman modularity Q of a community assignment over the undirected
    edge set — the number that says whether q72's label propagation
    found real structure (Q >> 0) or noise (Q ~ 0): Q = E_in/m −
    Σ_c d_c² / (4m²), with E_in = within-community edges, d_c = total
    degree of community c, m = |edges|.

    The usual formulation sums per-community float terms — summation-
    order-sensitive. This one never does: E_in, Σd_c², and m are three
    EXACT int64 aggregates (within-edge count after a two-sided label
    join; degree sums squared then summed — d_c ≤ 2m, so Σd_c² needs
    m < ~2^31 per community, the documented bound; combiner-friendly
    throughout), and Q is one fixed shape of double products of those
    integers (the q110 Pearson discipline) — bit-identical on any
    engine or partitioning, round-6. Output: one row (n_communities,
    m_edges, e_in, d_sq_sum, modularity); NULL modularity on an empty
    edge set."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    lab = labels.select(
        F.col(node_col).alias("n"), F.col(label_col).alias("lab")
    )
    tagged = (
        und.join(lab.withColumnRenamed("n", "u"), "u")
        .withColumnRenamed("lab", "lab_u")
        .join(lab.withColumnRenamed("n", "v"), "v")
        .withColumnRenamed("lab", "lab_v")
    )
    counts = tagged.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(
            F.when(F.col("lab_u") == F.col("lab_v"), 1).otherwise(0)
        ).alias("e_in"),
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    comm = (
        deg.join(lab, "n")
        .groupBy("lab")
        .agg(F.sum("d").alias("dc"))
    )
    dsq = comm.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum(F.col("dc") * F.col("dc")).alias("d_sq_sum"),
    )
    m, e_in = F.col("m").cast("double"), F.col("e_in").cast("double")
    d2 = F.col("d_sq_sum").cast("double")
    return counts.crossJoin(F.broadcast(dsq)).select(
        "n_communities",
        F.col("m").alias("m_edges"),
        "e_in",
        "d_sq_sum",
        F.when(
            F.col("m") > 0,
            F.round(e_in / m - d2 / (4.0 * m * m), 6) + F.lit(0.0),
        ).alias("modularity"),
    )


def kg_integrity(
    triples: DataFrame,
    dictionary: DataFrame,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    term_col: str = "term",
) -> DataFrame:
    """Referential-integrity profile of an extracted KG against an entity
    dictionary — the materialization-gate readout: per predicate, how many
    edge endpoints resolve to a known entity and how many dangle. A
    predicate whose endpoints rarely resolve is extraction noise; one that
    suddenly drops is an upstream-dictionary regression.

    Scale shape: the dictionary is broadcast (ontology-sized, never
    corpus-sized) and each endpoint resolves via a broadcast left join +
    null flag — map-side, no shuffle; the only shuffle is the final
    combiner groupBy on the small predicate domain. Rates are fixed-shape
    doubles over exact int64 counts, round-6. Output: (pred, n_edges,
    n_subj_linked, n_obj_linked, n_both_linked, subj_rate, obj_rate,
    both_rate)."""
    d = F.broadcast(dictionary.select(F.col(term_col).alias("_term")).distinct())
    t = triples.select(
        F.col(subj_col).alias("s"),
        F.col(pred_col).alias("p"),
        F.col(obj_col).alias("o"),
    )
    flagged = (
        t.join(d.select(F.col("_term").alias("s"), F.lit(1).alias("sf")), "s", "left")
        .join(d.select(F.col("_term").alias("o"), F.lit(1).alias("of")), "o", "left")
        .select(
            "p",
            F.coalesce("sf", F.lit(0)).alias("sf"),
            F.coalesce("of", F.lit(0)).alias("of"),
        )
    )
    agg = flagged.groupBy(F.col("p").alias("pred")).agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("sf").alias("n_subj_linked"),
        F.sum("of").alias("n_obj_linked"),
        F.sum(F.col("sf") * F.col("of")).alias("n_both_linked"),
    )
    rate = lambda c: (  # noqa: E731
        F.round(F.col(c).cast("double") / F.col("n_edges").cast("double"), 6)
        + F.lit(0.0)
    )
    return agg.select(
        "pred",
        "n_edges",
        "n_subj_linked",
        "n_obj_linked",
        "n_both_linked",
        rate("n_subj_linked").alias("subj_rate"),
        rate("n_obj_linked").alias("obj_rate"),
        rate("n_both_linked").alias("both_rate"),
    )


def harmonic_centrality(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Bounded-depth harmonic centrality for a source subset: per source
    node, Σ over nodes reached within max_depth of 1/d(hops) — the
    disconnected-safe closeness variant (Boldi & Vigna 2014). Exact labeled
    multi-source BFS (the HyperBall sketch in hyperball_neighborhood is the
    all-nodes approximation; this is the exact readout for a chosen
    subset).

    Determinism shape: 1/d contributions are integer micro-units
    (scale DIV depth) summed as exact int64 — no float sums, same
    fixed-point discipline as pagerank_fixedpoint. Scale shape: the same
    per-round frontier-join + left_anti-visited loop as bfs_closure with
    the root label carried through (state is Σ per-root ball sizes, the
    honest cost of exact centrality — bound it by choosing the source
    subset and max_depth); every round localCheckpoints eagerly, exactly
    the CC discipline. Output: (node, n_reached, h_fp, harmonic round-6),
    one row per source that reaches at least one node."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    e = e.localCheckpoint(eager=True)
    root_col = sources.columns[0]
    visited = sources.select(
        F.col(root_col).alias("root"),
        F.col(root_col).alias("node"),
        F.lit(0).alias("depth"),
    ).localCheckpoint(eager=True)
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select("root", F.col("v").alias("node"), F.lit(d).alias("depth"))
            .distinct()
            .join(visited.select("root", "node"), ["root", "node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    reach = visited.filter(F.col("depth") > 0)
    return (
        reach.groupBy(F.col("root").alias("node"))
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum(F.expr(f"{int(scale)} DIV depth")).alias("h_fp"),
        )
        .select(
            "node",
            "n_reached",
            F.col("h_fp").cast("long").alias("h_fp"),
            (
                F.round(F.col("h_fp").cast("double") / F.lit(float(scale)), 6)
                + F.lit(0.0)
            ).alias("harmonic"),
        )
    )


def _brandes_levels(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str,
    dst: str,
    max_depth: int,
):
    """Shared Brandes forward phase (betweenness_seeded /
    edge_betweenness_seeded): labeled multi-source BFS carrying exact
    int64 sigma shortest-path counts, summed over depth-(d-1) parents
    BEFORE the visited anti-join. Returns (deduped edge frame, list of
    per-depth level frames), every round eagerly localCheckpointed."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    root_col = sources.columns[0]
    lvl0 = sources.select(
        F.col(root_col).alias("root"),
        F.col(root_col).alias("node"),
        F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint(eager=True)
    levels = [lvl0]
    visited = lvl0.select("root", "node")
    frontier = lvl0
    for _d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select("root", F.col("v").alias("node"), "sigma")
            .groupBy("root", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["root", "node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        levels.append(nxt)
        visited = visited.union(nxt.select("root", "node")).localCheckpoint(
            eager=True
        )
        frontier = nxt
    return e, levels


def betweenness_seeded(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Bounded-depth Brandes betweenness contributions from a seeded
    source subset — the shortest-path centrality member the family
    (pagerank/HITS/TrustRank = flow, harmonic = distance) lacks: which
    nodes do shortest paths ROUTE THROUGH. Forward phase: labeled
    multi-source BFS (harmonic_centrality's frontier loop) additionally
    carrying sigma = exact int64 shortest-path counts, summed over
    depth-(d-1) parents BEFORE the visited anti-join (every shortest-path
    parent of a depth-d node sits at depth d-1, so the frontier sum is
    the whole DAG in-flow). Backward phase: Brandes dependency
    accumulation in integer micro-units — processing levels deepest
    first, delta(u) = sum over DAG successors w of
    (sigma_u * (scale + delta_w)) DIV sigma_w, so on a hand graph the
    exact Brandes values appear in micro-units (path a-b-c gives b
    exactly scale; a diamond's two middles get scale/2 each) and both
    engines floor identically (the q51 fixed-point discipline; per-term
    truncation error < 1 micro-unit). Seeding = Brandes' exact
    per-source decomposition: the output is the exact contribution of
    the chosen sources, the standard sampling estimator of full BC.

    Semantics notes: paths are truncated at max_depth (nodes at the
    horizon accumulate no onward dependency — the same bounded-ball
    reading as harmonic_centrality); sources are never credited as
    interior nodes of their own trees (depth-0 deltas are not computed).
    Overflow bound: sigma_u * (scale + delta_w) must stay < 2^63 —
    delta is at most scale * (ball size), sigma at most degree^depth,
    so keep max_depth small on high-degree graphs (the _sqdist lesson:
    document the domain, Spark wraps silently).

    Scale shape: forward is the CC-disciplined frontier loop (eager
    localCheckpoint per round, state bounded by the seeded balls);
    backward is max_depth-1 level-to-level equi-joins, each
    level-sized, never ball-squared. Output: (node, bc_fp, bc) for
    nodes with positive accumulated dependency."""
    e, levels = _brandes_levels(
        edges, sources, src=src, dst=dst, max_depth=max_depth
    )
    lvl0 = levels[0]
    deepest = len(levels) - 1
    if deepest < 2:
        # no interior nodes exist within the horizon; preserve the
        # caller's node type in the empty result
        return lvl0.select(
            "node",
            F.lit(0).cast("long").alias("bc_fp"),
            F.lit(0.0).alias("bc"),
        ).limit(0)
    prev = levels[deepest].select(
        "root",
        F.col("node").alias("wnode"),
        F.col("sigma").alias("wsigma"),
        F.lit(0).cast("long").alias("wdelta"),
    )
    interior = []
    for d in range(deepest - 1, 0, -1):
        lvl = levels[d]
        dsum = (
            lvl.join(e, lvl["node"] == e["u"])
            .join(
                prev,
                (prev["root"] == lvl["root"]) & (prev["wnode"] == e["v"]),
            )
            .select(
                lvl["root"].alias("root"),
                lvl["node"].alias("node"),
                (
                    F.col("sigma") * (F.lit(int(scale)) + F.col("wdelta"))
                ).alias("num"),
                F.col("wsigma").alias("den"),
            )
            .select("root", "node", F.expr("num DIV den").alias("term"))
            .groupBy("root", "node")
            .agg(F.sum("term").alias("delta"))
        )
        cur = (
            lvl.join(dsum, ["root", "node"], "left")
            .select(
                "root",
                "node",
                "sigma",
                F.coalesce(F.col("delta"), F.lit(0)).cast("long").alias(
                    "delta"
                ),
            )
            .localCheckpoint(eager=True)
        )
        interior.append(cur)
        prev = cur.select(
            "root",
            F.col("node").alias("wnode"),
            F.col("sigma").alias("wsigma"),
            F.col("delta").alias("wdelta"),
        )
    out = interior[0]
    for extra in interior[1:]:
        out = out.union(extra)
    return (
        out.groupBy("node")
        .agg(F.sum("delta").alias("bc_fp"))
        .filter(F.col("bc_fp") > 0)
        .select(
            "node",
            F.col("bc_fp").cast("long").alias("bc_fp"),
            (
                F.round(
                    F.col("bc_fp").cast("double") / F.lit(float(scale)), 6
                )
                + F.lit(0.0)
            ).alias("bc"),
        )
    )


def edge_betweenness_seeded(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """EDGE betweenness from the seeded sources — the Girvan-Newman
    primitive (communities fall out by repeatedly cutting the
    highest-betweenness EDGE): which edges shortest paths route
    through, where betweenness_seeded scores nodes. Same forward
    sigma-BFS (shared _brandes_levels); the backward pass EMITS the
    per-DAG-edge Brandes credit — credit(u→w | root) =
    (sigma_u * (scale + delta_w)) DIV sigma_w for depth(w) =
    depth(u)+1 — instead of only folding it into the node delta, and
    unlike node betweenness the loop runs down to depth 0: edges OUT
    OF a root carry real credit (on a path a→b→c, edge (a,b) lies on
    both the a→b and a→c paths — credit exactly 2·scale). Node deltas
    still accumulate per level to feed the next round, so both
    readouts stay mutually consistent (an edge's credit is a summand
    of its tail's delta by construction).

    Same determinism (integer micro-units, identical floors on both
    engines), same truncation semantics, same overflow bound, and the
    same scale shape as betweenness_seeded — the only extra state is
    the per-level edge-term frames, each DAG-level-sized. Output:
    (src, dst, eb_fp, eb) summed over roots, for DAG edges reached
    within the horizon."""
    e, levels = _brandes_levels(
        edges, sources, src=src, dst=dst, max_depth=max_depth
    )
    lvl0 = levels[0]
    deepest = len(levels) - 1
    if deepest < 1:
        return lvl0.select(
            F.col("node").alias(src),
            F.col("node").alias(dst),
            F.lit(0).cast("long").alias("eb_fp"),
            F.lit(0.0).alias("eb"),
        ).limit(0)
    prev = levels[deepest].select(
        "root",
        F.col("node").alias("wnode"),
        F.col("sigma").alias("wsigma"),
        F.lit(0).cast("long").alias("wdelta"),
    )
    term_frames = []
    for d in range(deepest - 1, -1, -1):
        lvl = levels[d]
        terms = (
            lvl.join(e, lvl["node"] == e["u"])
            .join(
                prev,
                (prev["root"] == lvl["root"]) & (prev["wnode"] == e["v"]),
            )
            .select(
                lvl["root"].alias("root"),
                lvl["node"].alias("un"),
                F.col("wnode").alias("wn"),
                (
                    F.col("sigma") * (F.lit(int(scale)) + F.col("wdelta"))
                ).alias("num"),
                F.col("wsigma").alias("den"),
            )
            .select(
                "root", "un", "wn", F.expr("num DIV den").alias("term")
            )
            .localCheckpoint(eager=True)
        )
        term_frames.append(terms)
        if d == 0:
            break
        dsum = terms.groupBy(
            F.col("root"), F.col("un").alias("node")
        ).agg(F.sum("term").alias("delta"))
        cur = (
            lvl.join(dsum, ["root", "node"], "left")
            .select(
                "root",
                "node",
                "sigma",
                F.coalesce(F.col("delta"), F.lit(0)).cast("long").alias(
                    "delta"
                ),
            )
            .localCheckpoint(eager=True)
        )
        prev = cur.select(
            "root",
            F.col("node").alias("wnode"),
            F.col("sigma").alias("wsigma"),
            F.col("delta").alias("wdelta"),
        )
    out = term_frames[0]
    for extra in term_frames[1:]:
        out = out.union(extra)
    return (
        out.groupBy(F.col("un").alias(src), F.col("wn").alias(dst))
        .agg(F.sum("term").alias("eb_fp"))
        .select(
            src,
            dst,
            F.col("eb_fp").cast("long").alias("eb_fp"),
            (
                F.round(
                    F.col("eb_fp").cast("double") / F.lit(float(scale)), 6
                )
                + F.lit(0.0)
            ).alias("eb"),
        )
    )


def ontology_lca(
    closure: DataFrame,
    pairs: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    dist: str = "dist",
    scale: int = 1_000_000,
) -> DataFrame:
    """Lowest-common-ancestor + path similarity over a subsumption
    closure — the pairwise semantic-similarity readout of the ancestor
    sets bfs_closure / transitive_closure_mindist materialize
    (reference: biocyc_ontology.py:45-79 walks the same ancestor
    relation; pathhier scores ontology classes by shared-ancestor
    overlap during alignment). For each query pair (a, b): the common
    ancestor c minimizing d(a,c) + d(b,c), tie-broken by min d(a,c)
    then lexicographic min c, plus the Leacock-style path similarity
    1 / (1 + dsum) in integer micro-units (scale DIV (1 + dsum)) so
    both engines agree bit-for-bit.

    Inputs: `closure` is (src, dst, dist) min hop-distances
    child -> ancestor (self-distances NOT required — dist-0 self rows
    are added here for exactly the pair members, so "a is b's
    ancestor" resolves to lca = a); `pairs` is (a, b) query pairs.
    Pairs with no common ancestor emit no row (disjoint components).

    Scale shape: ancestor sets are dictionary-sized (ontology classes,
    not corpus rows); the candidate join is two equi-joins on the pair
    members then one on the ancestor id; the argmin is the portable
    two-phase discipline (min-combiner groupBy + join-back, no struct
    arg_max) — three combiner groupBys over pair-count-sized frames,
    nothing corpus-sized shuffles. Output: (a, b, lca, dist_a, dist_b,
    dist_sum, sim_fp, sim round-6), ordered upstream by the caller."""
    members = (
        pairs.select(F.col("a").alias("node"))
        .union(pairs.select(F.col("b").alias("node")))
        .distinct()
    )
    anc = closure.select(
        F.col(src).alias("node"), F.col(dst).alias("anc"), F.col(dist).alias("d")
    ).union(
        members.select(
            "node", F.col("node").alias("anc"), F.lit(0).cast("int").alias("d")
        )
    )
    cand = (
        pairs.join(
            anc.select(
                F.col("node").alias("a"), F.col("anc").alias("c"),
                F.col("d").alias("da"),
            ),
            "a",
        )
        .join(
            anc.select(
                F.col("node").alias("b"), F.col("anc").alias("c"),
                F.col("d").alias("db"),
            ),
            ["b", "c"],
        )
        .withColumn("dsum", (F.col("da") + F.col("db")).cast("int"))
    )
    # portable two-phase argmin: fix dsum, then da, then lexicographic c
    m1 = cand.groupBy("a", "b").agg(F.min("dsum").alias("dsum"))
    c1 = cand.join(m1, ["a", "b", "dsum"])
    m2 = c1.groupBy("a", "b").agg(F.min("da").alias("da"))
    c2 = c1.join(m2, ["a", "b", "da"])
    best = c2.groupBy("a", "b", "dsum", "da").agg(F.min("c").alias("lca"))
    sim_fp = F.expr(f"{int(scale)} DIV (1 + dsum)").cast("long")
    return best.select(
        "a",
        "b",
        "lca",
        F.col("da").cast("int").alias("dist_a"),
        (F.col("dsum") - F.col("da")).cast("int").alias("dist_b"),
        F.col("dsum").cast("int").alias("dist_sum"),
        sim_fp.alias("sim_fp"),
        (F.round(sim_fp.cast("double") / F.lit(float(scale)), 6) + F.lit(0.0)).alias(
            "sim"
        ),
    )


def ktruss(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    k: int = 4,
    rounds: int = 3,
) -> DataFrame:
    """Fixed-round k-truss peeling: each round computes per-edge triangle
    support (triangles the edge participates in within the CURRENT
    subgraph) and drops every edge with support < k - 2 — the edge-level
    sibling of kcore's node peeling, and the standard dense-community
    core extractor (Cohen 2008). Run to convergence this is exactly the
    k-truss; with a FIXED round count it is a deterministic
    over-approximation both engines replay identically (the q74
    discipline — the oracle unrolls the same rounds as CTEs and the
    gate asserts one more round is a no-op on its graph).

    Scale shape: support comes from the degree-ordered orientation wedge
    join (_oriented_triangles — fan-out O(sqrt(m)) per edge, power-law
    safe), then one canonical-edge combiner count; the surviving edge
    set shrinks monotonically and is eagerly localCheckpoint-ed per
    round so round r never re-executes rounds 0..r-1. Requires k >= 3
    (k - 2 >= 1 makes triangle-free edges drop; at k = 2 peeling is a
    no-op and the loop is skipped).

    Returns (u, v, support): surviving canonical edges with triangle
    support inside the FINAL surviving subgraph (0 when the last peel
    removed all of an edge's triangles — the fixed-round honesty)."""
    if k < 3:
        raise ValueError(f"ktruss requires k >= 3, got {k}")
    cur = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _support(e: DataFrame) -> DataFrame:
        pairs = _oriented_triangles(e).select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("x", "y").alias("u"),
                        F.greatest("x", "y").alias("v"),
                    ),
                    F.struct(
                        F.least("x", "z").alias("u"),
                        F.greatest("x", "z").alias("v"),
                    ),
                    F.struct(
                        F.least("y", "z").alias("u"),
                        F.greatest("y", "z").alias("v"),
                    ),
                )
            ).alias("e")
        ).select("e.u", "e.v")
        return pairs.groupBy("u", "v").agg(
            F.count(F.lit(1)).cast("long").alias("support")
        )

    for _ in range(rounds):
        keep = _support(cur).filter(F.col("support") >= k - 2).select("u", "v")
        cur = cur.join(keep, ["u", "v"], "left_semi").localCheckpoint(
            eager=True
        )
    return (
        cur.join(_support(cur), ["u", "v"], "left")
        .na.fill({"support": 0})
        .select("u", "v", F.col("support").cast("long").alias("support"))
    )


def double_sweep_diameter(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 4,
) -> DataFrame:
    """Double-sweep diameter lower bound (Magnien-Latapy-Habib): BFS from
    a deterministic start (the lexicographic min node), hop to the
    farthest node found, BFS again — the second eccentricity is a lower
    bound on the graph diameter that is exact on trees and empirically
    tight on web-ish graphs, at the cost of TWO bfs runs instead of the
    all-pairs closure. Depth-capped honesty: with a finite max_depth the
    reported bound is min(true bound, max_depth) — still a valid lower
    bound whenever any node sits that far out.

    Determinism: the start is min(node); each sweep's farthest node is
    (max depth, then min node name) — both engines pick identical nodes
    with no RNG. The only driver hops are two 1-row collects (the
    farthest-node handoff between sweeps — bounded, the LR-coefficient
    pattern). Per sweep: the bfs_closure frontier loop (per-round
    equi-join + left_anti + eager localCheckpoint). Output: ONE row
    (start_node, far_node, ecc_start, far2_node, diameter_lb)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    e = e.localCheckpoint(eager=True)

    def _sweep(root_value: str):
        roots = e.sparkSession.createDataFrame(
            [(root_value,)], "node string"
        )
        vis = bfs_closure(e, roots, src="u", dst="v", max_depth=max_depth)
        far = vis.orderBy(F.desc("depth"), "node").limit(1).collect()[0]
        return far["node"], far["depth"]

    start = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .agg(F.min("node"))
        .collect()[0][0]
    )
    far1, ecc1 = _sweep(start)
    far2, ecc2 = _sweep(far1)
    return e.sparkSession.createDataFrame(
        [(start, far1, int(ecc1), far2, int(ecc2))],
        "start_node string, far_node string, ecc_start int, "
        "far2_node string, diameter_lb int",
    )


def adamic_adar_links(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
    max_degree: int | None = None,
) -> DataFrame:
    """Adamic-Adar link prediction — common_neighbor_links' rarity-aware
    refinement: score non-adjacent wedge-closing pairs by
    Σ_w 1/ln(deg(w)) over shared neighbors w, so a pair sharing three
    OBSCURE neighbors outranks one sharing three celebrity hubs (the
    signal Jaccard flattens). Same candidate machinery and the same
    hub hazard/`max_degree` mitigation as common_neighbor_links.

    Float discipline: the per-pair sum is an ORDERED fold (the q63/q130
    rule — never sum doubles in shuffle order): shared-neighbor degrees
    are collected, sorted, and folded left-to-right, so both engines add
    identical values in an identical order. The collected list is one
    pair's common-neighbor set — bounded by min(deg a, deg b) and by
    `max_degree` when capped. ln(deg) >= ln 2 (a shared neighbor has
    degree >= 2 by construction), so no zero division. Output:
    (a, b, common, adamic_adar round-6)."""
    und = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    ).filter(F.col("u") < F.col("v")).distinct().localCheckpoint(eager=True)
    adj = und.select(
        F.col("u").alias("w"), F.col("v").alias("n")
    ).union(und.select(F.col("v").alias("w"), F.col("u").alias("n")))
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    centers = adj.join(
        deg.filter(F.col("deg") <= max_degree) if max_degree is not None else deg,
        "w",
    )
    wedges = (
        centers.alias("x")
        .join(centers.alias("y"), "w")
        .filter(F.col("x.n") < F.col("y.n"))
        .select(
            F.col("x.n").alias("a"),
            F.col("y.n").alias("b"),
            F.col("x.deg").alias("dw"),
        )
    )
    pairs = (
        wedges.groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sort_array(F.collect_list(F.col("dw").cast("long"))).alias("ds"),
        )
        .filter(F.col("common") >= min_common)
    )
    cand = pairs.join(
        und,
        (pairs["a"] == und["u"]) & (pairs["b"] == und["v"]),
        "left_anti",
    )
    aa = F.aggregate(
        F.transform(F.col("ds"), lambda d: F.lit(1.0) / F.log(d.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return cand.select(
        "a", "b", "common", (F.round(aa, 6) + F.lit(0.0)).alias("adamic_adar")
    )


def simrank_pairs(
    edges: DataFrame,
    pairs: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    c_num: int = 4,
    c_den: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-iteration SimRank (Jeh-Widom) for a chosen pair set, in exact
    integer arithmetic: "two nodes are similar if their neighbors are
    similar". With s0 = identity the recursion closes in rationals —
      s1(i,j) = C·|N(i)∩N(j)| / (d_i·d_j)
      s2(a,b) = C/(d_a·d_b) · Σ_{i∈N(a), j∈N(b)} s1(i,j)
    so with C = c_num/c_den both levels are integer multiplies + one
    floor DIV (micro-units), and the Σ is an int64 sum — order-free,
    no float ever aggregates (the q51 fixed-point discipline applied to
    a pairwise measure). s_k(x,x) = scale by definition (identity).

    Scale shape: the honest cost is the neighbor-pair expansion —
    Σ over query pairs of d_a·d_b rows — so the PAIR SET is the lever
    (seeded subset, the q142 pattern), not the corpus; common-neighbor
    counts come from the q99 wedge machinery (one combiner groupBy),
    s1 lookups are two equi-joins, and the final Σ is one combiner sum
    per query pair. Undirected semantics (neighbors of the canonical
    simple graph). Output: (a, b, s2_fp, s2 round-6) for pairs whose
    both endpoints have neighbors; s2 of an adjacent-or-not pair alike
    (SimRank does not exclude existing edges)."""
    und = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    ).filter(F.col("u") < F.col("v")).distinct().localCheckpoint(eager=True)
    adj = und.select(
        F.col("u").alias("w"), F.col("v").alias("n")
    ).union(und.select(F.col("v").alias("w"), F.col("u").alias("n")))
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # common-neighbor counts for UNORDERED node pairs (x < y)
    common = (
        adj.alias("p")
        .join(adj.alias("q"), "w")
        .filter(F.col("p.n") < F.col("q.n"))
        .select(F.col("p.n").alias("x"), F.col("q.n").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("cm"))
        .localCheckpoint(eager=True)
    )
    # expand query pairs to neighbor pairs (i from N(a), j from N(b))
    exp = (
        pairs.join(adj.select(F.col("w").alias("a"), F.col("n").alias("i")), "a")
        .join(adj.select(F.col("w").alias("b"), F.col("n").alias("j")), "b")
    )
    keyed = exp.select(
        "a", "b",
        F.least("i", "j").alias("x"), F.greatest("i", "j").alias("y"),
        (F.col("i") == F.col("j")).alias("same"),
    )
    with_s1 = (
        keyed.join(common, ["x", "y"], "left")
        .join(deg.select(F.col("w").alias("x"), F.col("deg").alias("dx")), "x")
        .join(deg.select(F.col("w").alias("y"), F.col("deg").alias("dy")), "y")
        .select(
            "a", "b",
            F.when(F.col("same"), F.lit(int(scale)).cast("long"))
            .otherwise(
                F.expr(
                    f"({c_num} * {int(scale)} * coalesce(cm, 0))"
                    f" DIV ({c_den} * dx * dy)"
                ).cast("long")
            )
            .alias("s1_fp"),
        )
    )
    sums = with_s1.groupBy("a", "b").agg(
        F.sum("s1_fp").cast("long").alias("s1_sum")
    )
    out = (
        sums.join(deg.select(F.col("w").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("w").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a", "b",
            F.expr(f"({c_num} * s1_sum) DIV ({c_den} * da * db)")
            .cast("long")
            .alias("s2_fp"),
        )
    )
    return out.select(
        "a", "b", "s2_fp",
        (
            F.round(F.col("s2_fp").cast("double") / F.lit(float(scale)), 6)
            + F.lit(0.0)
        ).alias("s2"),
    )


def scc_colored(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    fb_rounds: int = 8,
    trim_rounds: int = 6,
    peels: int = 3,
    strict: bool = True,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph — the web-graph
    bow-tie primitive (Broder et al. 2000) the undirected CC kernel
    (canonicalize.py) cannot express: a crawl's link graph decomposes
    into the giant SCC core plus IN/OUT/tendrils, and redirect loops,
    template rings, and mutually-citing host cliques are all SCCs.

    Algorithm: the FW-BW-Trim family (Slota et al. 2014; the multi-pivot
    "coloring" variant of Orzan's SCC) expressed as fixed-round DataFrame
    propagations — no per-row Python anywhere:

      per peel over the unassigned subgraph:
        1. TRIM: nodes with in-degree 0 or out-degree 0 in the live
           subgraph cannot sit on a cycle there, and every un-assigned
           SCC is wholly inside the live subgraph, so such nodes are
           singleton SCCs — assign scc_id = self, drop, repeat. This
           peels the DAG portion (chains/tendrils) in depth rounds of
           one degree-aggregate + one semi-join each, which min-label
           peeling alone would need one FULL peel per chain hop to clear.
        2. FW/BW min-label: F(v) = min node id that reaches v, B(v) =
           min node id v reaches, each by `fb_rounds` rounds of
           min-combiner propagation over the edge set. Reach-in and
           reach-out sets are constant across an SCC, so F and B are
           SCC-constant, and F(v) = B(v) = m certifies v ∈ SCC(m)
           (m reaches v AND v reaches m). All SCCs whose reach-in /
           reach-out contain no smaller external node resolve in this
           peel — the globally smallest live node's SCC always does,
           so every peel retires at least one SCC.

    Scale shape: every step is an equi-join + min/count combiner
    aggregate on (node) — the q18/q51 bucketed-join shape; labels are
    int64 node ids (16-byte shuffle rows); each round eagerly
    localCheckpoints to keep lineage flat (canonicalize.py:120
    discipline). fb_rounds bounds label propagation DISTANCE, so it
    needs only the live subgraph's diameter, not its size; peels is the
    FW-BW recursion depth, log-ish in practice on web graphs.

    strict=True raises if nodes remain unassigned after `peels` peels
    (the q74/q147 convergence-assert discipline); strict=False labels
    the stragglers scc_id = NULL so callers can route them to another
    peel.

    Output: (node, scc_id, scc_size), one row per distinct endpoint.
    """
    e0 = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e0.select(F.col("s").alias("node"))
        .union(e0.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # typed like the caller's node ids (long for the gate graph, but any
    # orderable key works — min-label only needs a total order)
    assigned = nodes.select(
        "node", F.col("node").alias("scc_id")
    ).limit(0).localCheckpoint(eager=True)
    live_n, live_e = nodes, e0

    for _ in range(peels):
        # -- 1. trim: iteratively retire source/sink nodes as singletons
        for _ in range(trim_rounds):
            indeg = live_e.groupBy(F.col("d").alias("node")).agg(
                F.count(F.lit(1)).alias("ind")
            )
            outdeg = live_e.groupBy(F.col("s").alias("node")).agg(
                F.count(F.lit(1)).alias("outd")
            )
            degs = (
                live_n.join(indeg, "node", "left")
                .join(outdeg, "node", "left")
                .select(
                    "node",
                    (
                        F.col("ind").isNull() | F.col("outd").isNull()
                    ).alias("trivial"),
                )
                .localCheckpoint(eager=True)
            )
            triv = degs.filter("trivial").select("node")
            if triv.limit(1).count() == 0:
                break
            assigned = assigned.union(
                triv.select("node", F.col("node").alias("scc_id"))
            ).localCheckpoint(eager=True)
            live_n = degs.filter(~F.col("trivial")).select(
                "node"
            ).localCheckpoint(eager=True)
            live_e = (
                live_e.join(
                    live_n.select(F.col("node").alias("s")), "s", "left_semi"
                )
                .join(
                    live_n.select(F.col("node").alias("d")), "d", "left_semi"
                )
                .localCheckpoint(eager=True)
            )
        if live_n.limit(1).count() == 0:
            break

        # -- 2a. forward min-label coloring of the live subgraph.
        # Correctness of the peel REQUIRES the coloring to be a fixpoint
        # (an unconverged coloring can split one SCC across two colors
        # and emit it as two components), so the loop runs to
        # convergence with fb_rounds as a safety cap and the fixpoint
        # is asserted — the q74/q147 convergence-assert discipline
        # applied to the invariant itself, not just the round budget.
        fwd = live_n.select(
            "node", F.col("node").alias("lbl")
        ).localCheckpoint(eager=True)
        converged = False
        for _ in range(fb_rounds):
            nxt = (
                fwd.union(
                    fwd.join(live_e, fwd.node == live_e.s).select(
                        F.col("d").alias("node"), "lbl"
                    )
                )
                .groupBy("node")
                .agg(F.min("lbl").alias("lbl"))
                .localCheckpoint(eager=True)
            )
            changed = (
                nxt.alias("n")
                .join(fwd.alias("o"), "node")
                .filter(F.col("n.lbl") != F.col("o.lbl"))
                .limit(1)
                .count()
            )
            fwd = nxt
            if changed == 0:
                converged = True
                break
        if not converged:
            # an unconverged coloring can split an SCC across colors, so
            # assigning from it would be WRONG, not merely incomplete —
            # never emit from a non-fixpoint (strict=False stops here and
            # labels the remaining nodes NULL)
            if strict:
                raise ValueError(
                    "scc_colored: forward coloring did not reach a "
                    f"fixpoint within fb_rounds={fb_rounds}; raise "
                    "fb_rounds"
                )
            break

        # -- 2b. backward reach-to-pivot WITHIN each color class: a node
        # is in SCC(pivot) iff its color is pivot's id (pivot reaches it
        # through min-propagation) and it reaches the pivot through
        # same-colored nodes (Orzan's coloring rule). This loop must ALSO
        # reach a fixpoint before assigning: removing a partially-reached
        # SCC would orphan the unreached members into the next peel's
        # subgraph, where trim/coloring would mislabel them as separate
        # components — so under-propagation is NOT safe, and the same
        # assert-the-invariant rule applies as in 2a.
        ce = (
            live_e.join(
                fwd.select(F.col("node").alias("s"), F.col("lbl").alias("sl")),
                "s",
            )
            .join(
                fwd.select(F.col("node").alias("d"), F.col("lbl").alias("dl")),
                "d",
            )
            .filter(F.col("sl") == F.col("dl"))
            .select("s", "d")
            .localCheckpoint(eager=True)
        )
        reach = fwd.filter(F.col("node") == F.col("lbl")).select(
            "node"
        ).localCheckpoint(eager=True)
        r_converged = False
        for _ in range(fb_rounds):
            nxt = (
                reach.union(
                    reach.join(ce, reach.node == ce.d).select(
                        F.col("s").alias("node")
                    )
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
            if nxt.count() == reach.count():
                reach = nxt
                r_converged = True
                break
            reach = nxt
        if not r_converged:
            # one more probe round: the cap landing exactly on the
            # fixpoint is fine; only a still-growing reach is unsafe
            nxt = (
                reach.union(
                    reach.join(ce, reach.node == ce.d).select(
                        F.col("s").alias("node")
                    )
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
            if nxt.count() == reach.count():
                r_converged = True
                reach = nxt
        if not r_converged:
            if strict:
                raise ValueError(
                    "scc_colored: backward reach did not converge "
                    f"within fb_rounds={fb_rounds}; raise fb_rounds"
                )
            break
        done = reach.join(fwd, "node").select(
            "node", F.col("lbl").alias("scc_id")
        )
        assigned = assigned.union(done).localCheckpoint(eager=True)
        live_n = live_n.join(
            reach, "node", "left_anti"
        ).localCheckpoint(eager=True)
        if live_n.limit(1).count() == 0:
            break
        live_e = (
            live_e.join(
                live_n.select(F.col("node").alias("s")), "s", "left_semi"
            )
            .join(live_n.select(F.col("node").alias("d")), "d", "left_semi")
            .localCheckpoint(eager=True)
        )

    n_left = live_n.limit(1).count()
    if n_left and strict:
        raise ValueError(
            "scc_colored: unassigned nodes remain after "
            f"{peels} peels; raise peels/fb_rounds/trim_rounds"
        )
    out = nodes.join(assigned, "node", "left")
    sizes = out.groupBy("scc_id").agg(
        F.count(F.lit(1)).cast("long").alias("scc_size")
    )
    return out.join(sizes, "scc_id", "left").select(
        "node",
        "scc_id",
        F.when(F.col("scc_id").isNotNull(), F.col("scc_size")).alias(
            "scc_size"
        ),
    )


def dag_longest_paths(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    doublings: int = 7,
) -> DataFrame:
    """Longest-path layering of a DAG — ontology leveling: depth(v) =
    length of the longest path ending at v, the level index used to
    stratify an is-a hierarchy for per-level processing (the max-path
    dual of transitive_closure_mindist's shortest-hop closure; reference
    analog: the depth walks over biocyc_ontology.py:45-79's parent
    closure). Also emits n_ancestors per node (reach-in set size), the
    subsumption fan-in used to spot over-general classes.

    Max-plus doubling: after round r every pair holds a TRUE path length
    (in a DAG, concatenating a->k and k->b paths cannot revisit a node —
    a shared w != k would imply w->k and k->w, a cycle), and every pair
    whose longest path is <= 2**r holds it exactly (midpoint split).
    log2(depth) self-joins instead of depth frontier rounds — the same
    reason min-plus doubling wins for the closure.

    Two honest guards, both O(1) aggregates on the closure:
      * cycles: any (v, v) pair in the closure => input is not a DAG =>
        ValueError (max-plus on a cyclic graph silently computes longest
        WALK under the round cap — never emit from that);
      * saturation: max closure dist == 2**doublings means a path of
        exactly the cap length exists and longer ones may be unfound =>
        ValueError (strictly-below-cap proves convergence: a longer path
        would register its 2**doublings-length prefix exactly).

    Scope: the closure is O(reachable pairs) — right for ontology /
    hierarchy graphs (the reference's 10^4-10^6-node regime), NOT the
    full web graph (bounded-depth bfs_closure is the tool there).
    Output: (node, depth, n_ancestors); sources have depth 0."""
    d = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .withColumn("dist", F.lit(1).cast("int"))
        .localCheckpoint(eager=True)
    )
    for _ in range(doublings):
        composed = (
            d.alias("p")
            .join(d.alias("q"), F.col("p.b") == F.col("q.a"))
            .select(
                F.col("p.a").alias("a"),
                F.col("q.b").alias("b"),
                (F.col("p.dist") + F.col("q.dist")).alias("dist"),
            )
        )
        d = (
            d.union(composed)
            .groupBy("a", "b")
            .agg(F.max("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    if d.filter(F.col("a") == F.col("b")).limit(1).count() > 0:
        raise ValueError("dag_longest_paths: input graph has a cycle")
    cap = 2 ** doublings
    row = d.agg(F.max("dist").alias("m")).collect()[0]
    if row["m"] is not None and row["m"] >= cap:
        raise ValueError(
            f"dag_longest_paths: closure saturated the 2**{doublings} "
            "round cap; raise doublings"
        )
    nodes = (
        d.select(F.col("a").alias("node"))
        .union(d.select(F.col("b").alias("node")))
        .distinct()
    )
    per_dst = d.groupBy(F.col("b").alias("node")).agg(
        F.max("dist").cast("long").alias("depth"),
        F.count(F.lit(1)).cast("long").alias("n_ancestors"),
    )
    return nodes.join(per_dst, "node", "left").select(
        "node",
        F.coalesce("depth", F.lit(0)).cast("long").alias("depth"),
        F.coalesce("n_ancestors", F.lit(0)).cast("long").alias(
            "n_ancestors"
        ),
    )


def _kruskal_finish(rows):
    """Union-find Kruskal over driver-collected (w, a, b, u, v) rows —
    (a, b, w) the original edge, (u, v) its current component labels.
    Returns the kept (a, b, w) edges. Bounded input: callers check the
    row count against `driver_finish` BEFORE collecting."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    kept = []
    for w, a, b, u, v in sorted(rows):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            kept.append((a, b, w))
    return kept


def boruvka_msf(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    rounds: int = 8,
    strict: bool = True,
    driver_finish: int = 100_000,
) -> DataFrame:
    """Minimum spanning forest via Borůvka — the single-linkage
    clustering backbone: the MSF of a similarity graph IS the
    single-linkage dendrogram (cutting it at weight t yields exactly the
    t-threshold clusters), so this is the hierarchy-of-near-dup-clusters
    operator that q31's flat CC cannot express. Borůvka is THE
    distributed MST algorithm: every component picks its lightest
    incident edge simultaneously (one argmin combiner aggregate), so
    component count at least halves per round — log2(n) rounds, all
    data-parallel, vs Kruskal's inherently sequential sorted scan.

    REQUIRES globally distinct weights (checked — raises ValueError on
    ties): under distinct weights the MSF is unique, per-component
    argmin selection can never close a cycle, and the result is
    algorithm-independent — callers with tied weights should perturb
    with a deterministic per-edge hash tiebreak first. Uniqueness is
    also what the oracle's cycle-property test relies on.

    Per round: (1) re-label edge endpoints by current component labels
    (two hash joins against the node-sized label table); (2) one
    min-struct combiner aggregate picks each component's lightest
    incident edge; (3) hooking: each component points to its chosen
    partner, mutual pairs root at the smaller label, then pointer
    jumping contracts the hook forest to roots (label-table-sized
    self-joins, the q111 path-compression shape). Nothing touches
    corpus-scale data after step 1's combiner.

    strict=True raises if cross-component edges remain after `rounds`
    (the q74/q147 convergence-assert discipline); since components at
    least halve per round, rounds=8 covers any forest up to 256
    effective components per tree.

    HYBRID FINISH (`driver_finish`, the standard Borůvka/Kruskal
    two-phase MST): a Borůvka round costs a fixed fan of Spark jobs
    (label joins + argmin + hooking + pointer jumping), so once the
    surviving cross-component edge set fits comfortably on the driver
    it is strictly cheaper to collect it and finish with union-find
    Kruskal — O(E log E) locally vs O(log n) more distributed rounds
    of pure job-scheduling overhead. Under globally distinct weights
    the two phases compose exactly: the contracted components are the
    current label partition, and Kruskal over the cross-component
    edges (original endpoints kept) emits precisely the remaining MSF
    edges of the unique forest. The collect is bounded by
    `driver_finish` rows (checked before collecting — never corpus-
    scale); pass driver_finish=0 to force the all-distributed path.
    At 100 TB the big graph still runs distributed rounds — the
    threshold only decides when the log-round tail (which by then is
    tiny by the halving guarantee) stops paying per-round job setup.

    Output: the MSF edge list (a, b, w) with a < b, one row per kept
    edge — n_nodes - n_components rows."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
            F.col(weight).alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    chk = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("w").alias("nw"),
    ).collect()[0]
    if chk["n"] != chk["nw"]:
        raise ValueError(
            "boruvka_msf: edge weights must be globally distinct "
            f"({chk['n']} edges, {chk['nw']} distinct weights) — apply a "
            "deterministic hash tiebreak before calling"
        )
    out_schema = e.select("a", "b", "w").schema
    spark = edges.sparkSession
    if 0 < chk["n"] <= driver_finish:
        kept = _kruskal_finish(
            (r["w"], r["a"], r["b"], r["a"], r["b"]) for r in e.collect()
        )
        return spark.createDataFrame(kept, out_schema)
    labels = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    msf = e.limit(0).localCheckpoint(eager=True)
    converged = False
    for _ in range(rounds):
        lab = (
            e.join(
                labels.select(F.col("node").alias("a"),
                              F.col("lbl").alias("la")), "a"
            )
            .join(
                labels.select(F.col("node").alias("b"),
                              F.col("lbl").alias("lb")), "b"
            )
            .filter(F.col("la") != F.col("lb"))
            .localCheckpoint(eager=True)
        )
        n_cross = lab.count()
        if n_cross == 0:
            converged = True
            break
        if n_cross <= driver_finish:
            # the contracted graph fits on the driver: Kruskal over the
            # surviving cross-component edges finishes the forest in one
            # bounded collect instead of more per-round job fans
            kept = _kruskal_finish(
                (r["w"], r["a"], r["b"], r["la"], r["lb"])
                for r in lab.collect()
            )
            msf = msf.union(spark.createDataFrame(kept, out_schema))
            converged = True
            break
        # each component's lightest incident edge (struct min is total:
        # weights are distinct, so (w, a, b) never ties)
        incident = lab.select(
            F.col("la").alias("comp"),
            F.struct("w", "a", "b", F.col("lb").alias("other")).alias("c"),
        ).union(
            lab.select(
                F.col("lb").alias("comp"),
                F.struct("w", "a", "b", F.col("la").alias("other")).alias(
                    "c"
                ),
            )
        )
        sel = (
            incident.groupBy("comp")
            .agg(F.min("c").alias("c"))
            .select("comp", "c.w", "c.a", "c.b", "c.other")
            .localCheckpoint(eager=True)
        )
        msf = (
            msf.union(sel.select("a", "b", "w"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # hooking: comp -> chosen partner; mutual pairs root at the min
        ptr = sel.select("comp", F.col("other").alias("p"))
        mutual = ptr.alias("x").join(
            ptr.alias("y"),
            (F.col("x.p") == F.col("y.comp"))
            & (F.col("y.p") == F.col("x.comp")),
        ).select(
            F.col("x.comp").alias("comp"),
            F.least("x.comp", "x.p").alias("p2"),
        )
        hooked = (
            ptr.join(mutual, "comp", "left")
            .select("comp", F.coalesce("p2", "p").alias("p"))
            .localCheckpoint(eager=True)
        )
        # pointer jumping to roots (hook forest depth <= components)
        for _ in range(rounds):
            jumped = (
                hooked.alias("x")
                .join(
                    hooked.alias("y"),
                    F.col("x.p") == F.col("y.comp"),
                    "left",
                )
                .select(
                    F.col("x.comp").alias("comp"),
                    F.coalesce("y.p", "x.p").alias("p"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                jumped.alias("n")
                .join(hooked.alias("o"), "comp")
                .filter(F.col("n.p") != F.col("o.p"))
                .limit(1)
                .count()
            )
            hooked = jumped
            if changed == 0:
                break
        labels = (
            labels.join(
                hooked.select(
                    F.col("comp").alias("lbl"), F.col("p").alias("nl")
                ),
                "lbl",
                "left",
            )
            .select("node", F.coalesce("nl", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    if not converged:
        lab = (
            e.join(
                labels.select(F.col("node").alias("a"),
                              F.col("lbl").alias("la")), "a"
            )
            .join(
                labels.select(F.col("node").alias("b"),
                              F.col("lbl").alias("lb")), "b"
            )
            .filter(F.col("la") != F.col("lb"))
        )
        if lab.limit(1).count() == 0:
            converged = True
        elif strict:
            raise ValueError(
                f"boruvka_msf: not converged after rounds={rounds}; "
                "raise rounds"
            )
    return msf.select("a", "b", "w")


def bowtie_decomposition(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    reach_rounds: int = 16,
    **scc_kwargs,
) -> DataFrame:
    """Broder bow-tie decomposition of a directed graph (Broder et al.
    2000) — the standard macro-structure readout of a crawl's link
    graph: the giant CORE (largest SCC), IN (reaches the core), OUT
    (reached from the core), and OTHER (tendrils, tubes, disconnected
    pieces). Composes scc_colored: the core is the largest SCC (ties
    broken by smallest scc_id — total order), then one forward and one
    backward frontier BFS from the core node set classify the rest.

    IN and OUT are provably disjoint: a node both reaching and reached
    by the core would be IN the core SCC. BFS frontiers run until an
    EMPTY frontier (asserted within reach_rounds — the fixed-round
    convergence discipline; each round is one equi-join + one left-anti
    against the visited set, all node-sized after the first hop).

    Output: (node, scc_id, cls) with cls in
    {'core', 'in', 'out', 'other'}."""
    scc = scc_colored(edges, src=src, dst=dst, **scc_kwargs)
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = scc.select("scc_id", "scc_size").distinct()
    top = (
        sizes.agg(F.max("scc_size").alias("mx"))
        .join(sizes, F.col("mx") == F.col("scc_size"))
        .agg(F.min("scc_id").alias("core_id"))
    )
    core = scc.join(
        F.broadcast(top), scc.scc_id == F.col("core_id")
    ).select("node").localCheckpoint(eager=True)

    def _closure(start: DataFrame, forward: bool) -> DataFrame:
        visited = start.localCheckpoint(eager=True)
        frontier = visited
        for _ in range(reach_rounds):
            if forward:
                step = frontier.join(e, frontier.node == e.s).select(
                    F.col("d").alias("node")
                )
            else:
                step = frontier.join(e, frontier.node == e.d).select(
                    F.col("s").alias("node")
                )
            frontier = (
                step.distinct()
                .join(visited, "node", "left_anti")
                .localCheckpoint(eager=True)
            )
            if frontier.limit(1).count() == 0:
                return visited
            visited = visited.union(frontier).localCheckpoint(eager=True)
        raise ValueError(
            "bowtie_decomposition: BFS frontier still growing after "
            f"reach_rounds={reach_rounds}; raise reach_rounds"
        )

    reached = _closure(core, forward=True)    # core ∪ OUT
    reaching = _closure(core, forward=False)  # core ∪ IN
    return scc.join(
        core.select("node", F.lit(1).alias("_c")), "node", "left"
    ).join(
        reached.select("node", F.lit(1).alias("_o")).distinct(),
        "node",
        "left",
    ).join(
        reaching.select("node", F.lit(1).alias("_i")).distinct(),
        "node",
        "left",
    ).select(
        "node",
        "scc_id",
        F.when(F.col("_c").isNotNull(), F.lit("core"))
        .when(F.col("_i").isNotNull(), F.lit("in"))
        .when(F.col("_o").isNotNull(), F.lit("out"))
        .otherwise(F.lit("other"))
        .alias("cls"),
    )


def bellman_bounded(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_hops: int = 3,
) -> DataFrame:
    """Bounded-hop single-source cheapest paths from a seeded source
    subset — weighted Bellman-Ford rounds, the MIN-PLUS member of the
    path-semiring family (bfs_closure counts hops, dag_longest_path is
    max-plus, this is min-cost): after round r the table holds EXACTLY
    the minimum path cost using at most r edges, because each round is
    the FUNCTIONAL relaxation d_r(v) = min(d_{r-1}(v), min over edges
    (u,v) of d_{r-1}(u) + w) — a pure expression over the previous
    round, so any relaxation schedule (here: delta-frontier) and any
    engine produce identical tables, and negative weights would be
    handled correctly within the hop bound (no convergence assumption).
    Weights must be exact integers (quantize upstream — the q49 cents
    discipline); costs then sum as exact int64 with no float path
    dependence. Parallel edges collapse to their min weight up front.

    Scale shape: the delta-frontier optimization relaxes only edges out
    of nodes IMPROVED last round (provably the same d_r: unimproved
    nodes contribute nothing new), so settled regions cost nothing;
    each round is one equi-join + one min-combiner groupBy + a
    min-union merge, all eagerly localCheckpointed (the CC loop
    discipline); state is the seeded balls, the q141 cost argument.
    Output: (root, node, dist) including the root itself at dist 0."""
    e = (
        edges.select(
            F.col(src).alias("u"),
            F.col(dst).alias("v"),
            F.col(weight).cast("long").alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    root_col = sources.columns[0]
    dist = sources.select(
        F.col(root_col).alias("root"),
        F.col(root_col).alias("node"),
        F.lit(0).cast("long").alias("d"),
    ).localCheckpoint(eager=True)
    frontier = dist
    for _r in range(1, max_hops + 1):
        cand = (
            frontier.join(e, frontier["node"] == e["u"])
            .select("root", F.col("v").alias("node"), (F.col("d") + F.col("w")).alias("d"))
            .groupBy("root", "node")
            .agg(F.min("d").alias("d"))
        )
        # lazy checkpoint + full count = ONE job that materializes the
        # improvement frontier AND answers the emptiness test (the eager
        # checkpoint + limit(1).count pair ran two); dist's lazy
        # checkpoint materializes inside the next round's frontier job
        imp = (
            cand.join(
                dist.select("root", "node", F.col("d").alias("old")),
                ["root", "node"],
                "left",
            )
            .filter(F.col("old").isNull() | (F.col("d") < F.col("old")))
            .select("root", "node", "d")
            .localCheckpoint(eager=False)
        )
        if imp.count() == 0:
            break
        dist = (
            dist.unionByName(imp)
            .groupBy("root", "node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=False)
        )
        frontier = imp
    return dist.select("root", "node", F.col("d").alias("dist"))


def wl_fingerprint(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """Weisfeiler-Leman label refinement over the undirected view of an
    edge list — the standard isomorphism-sensitive graph fingerprint
    (Shervashidze et al., JMLR 2011): round 0 labels every node with its
    degree; each round relabels a node with a hash of (own label, sorted
    multiset of neighbor labels). After `rounds` refinements the per-node
    labels separate every structural role a WL kernel can separate; the
    label HISTOGRAM is the graph fingerprint — two KG snapshots whose
    histograms differ are guaranteed non-isomorphic, so diffing the
    fingerprint is the cheap structural drift alarm for the materialized
    node/edge tables (much stronger than node/edge counts, no pairwise
    comparison). Returns per-node final labels (node, wl_label) so callers
    can also join labels to find structurally-identical nodes; q191 folds
    them into the histogram.

    Determinism / portability: the relabel hash is the first 8 hex chars
    of md5('<lbl>:<nl1>,<nl2>,...') read as int64 — the engine-portable
    conv/md5 idiom every sketch here uses — with neighbor labels sorted
    NUMERICALLY (sort_array on long; the oracle replays string_agg ...
    ORDER BY the numeric label). Ties are equal labels, so order among
    equals cannot perturb the string. Self-loops contribute the node's own
    label once; isolated nodes cannot appear in an edge list and are out
    of scope by construction.

    Scale shape: symmetrize+distinct is one shuffle, eagerly
    localCheckpoint-ed ONCE (the q51 lineage discipline — every round
    re-reads it); each round is a node-sized equi-join onto the edge list
    plus one combiner-friendly groupBy(d) collecting the (bounded by
    degree) neighbor-label array. The label table stays node-sized; the
    lazy plan grows one join per round — fine at the default 3, for deep
    refinement localCheckpoint the label table every ~10 rounds as
    pagerank_fixedpoint documents."""
    e0 = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    und = (
        e0.union(e0.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = und.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("lbl")
    ).select(F.col("s").alias("node"), "lbl")
    for _ in range(rounds):
        nbrs = (
            und.join(labels.withColumnRenamed("node", "s"), "s")
            .groupBy("d")
            .agg(F.sort_array(F.collect_list("lbl")).alias("nl"))
            .select(
                F.col("d").alias("node"),
                F.concat_ws(
                    ",", F.transform(F.col("nl"), lambda x: x.cast("string"))
                ).alias("ns"),
            )
        )
        # inner join keeps every node: each labeled node appears as some
        # `s` in the symmetrized edge list, hence as some `d` too
        labels = labels.join(nbrs, "node").select(
            "node",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("lbl").cast("string"), F.lit(":"), F.col("ns")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long").alias("lbl"),
        )
    return labels.select("node", F.col("lbl").alias("wl_label"))


def butterfly_count(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_df: int | None = None,
) -> DataFrame:
    """Exact butterfly (bipartite 4-cycle) and wedge counting over a
    bipartite edge list — the bipartite graph's triangle: a butterfly is
    two src nodes sharing two dst nodes, the smallest unit of bipartite
    clustering (Wang et al., VLDB 2014). For KG/web data this measures
    co-engagement cohesion (two pages citing the same two entities, two
    customers buying the same two parts); the wedge→butterfly ratio is
    the bipartite clustering coefficient that random bipartite graphs
    lack.

    Exact counting via the standard two-level combinatorics, all int64:
    wedges = sum over dst of C(deg_dst, 2) — pairs of src meeting at one
    dst; co-degree of a src pair = number of shared dst; butterflies =
    sum over src pairs of C(codeg, 2). The pair table is generated by
    joining the (deduped) edge list to itself on dst with s1 < s2 — the
    only corpus-scale shuffle, whose fan-out is exactly the wedge count.
    Zipf-hot dst nodes blow that up quadratically: max_df drops dst
    nodes with degree > max_df BEFORE pairing (the degree-cap every
    exact butterfly counter in the literature applies; the dropped-node
    count is reported, not silent — the no-silent-caps rule). Both raw
    counts ship as exact int64; bfly_per_wedge (the density readout —
    how often a wedge's src pair meets at a SECOND dst) is the one
    fixed-shape division, rounded 6.

    Output: one row (n_edges, n_dropped_dst, wedges, butterflies,
    bfly_per_wedge). Overflow: codeg <= capped degree; sums bounded by
    wedges^2 / 2 in the worst case — keep max_df such that
    wedge-pair fan-out fits (documented, default uncapped for
    near-uniform degree graphs like the trade bipartite)."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).distinct()
    degd = e.groupBy("d").agg(F.count(F.lit(1)).alias("dd"))
    if max_df is not None:
        keep = degd.where(F.col("dd") <= max_df)
        dropped = degd.where(F.col("dd") > max_df).agg(
            F.count(F.lit(1)).cast("long").alias("n_dropped_dst")
        )
        e = e.join(F.broadcast(keep.select("d")), "d")
        degd = keep
    else:
        dropped = degd.agg(
            (F.count(F.lit(1)) * 0).cast("long").alias("n_dropped_dst")
        )
    ne = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    wedges = degd.agg(
        F.coalesce(
            F.sum(F.col("dd") * (F.col("dd") - 1) / 2), F.lit(0)
        )
        .cast("long")
        .alias("wedges")
    )
    pairs = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.d") == F.col("b.d"))
        .where(F.col("a.s") < F.col("b.s"))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count(F.lit(1)).alias("codeg"))
    )
    bfly = pairs.agg(
        F.coalesce(
            F.sum(F.col("codeg") * (F.col("codeg") - 1) / 2), F.lit(0)
        )
        .cast("long")
        .alias("butterflies")
    )
    return (
        ne.crossJoin(F.broadcast(dropped))
        .crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(bfly))
        .select(
            "n_edges",
            "n_dropped_dst",
            "wedges",
            "butterflies",
            F.when(
                F.col("wedges") > 0,
                F.round(
                    F.col("butterflies")
                    / F.col("wedges").cast("double"),
                    6,
                )
                + F.lit(0.0),
            ).alias("bfly_per_wedge"),
        )
    )


def katz_fixedpoint(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    alpha_pct: int = 20,
    scale: int = 1_000_000,
) -> DataFrame:
    """Katz centrality in integer fixed-point — the path-counting
    centrality PageRank is NOT: no out-degree normalization, so a node's
    influence is its raw attenuated in-path count (beta * sum over path
    lengths k of alpha^k * #in-paths of length k), which on the typed KG
    rewards hub entities with many distinct provenance chains rather
    than probability mass. Complements pagerank_fixedpoint (q51/q57),
    HITS (q84), harmonic (q141): four centralities, four different
    questions.

    Determinism + convergence in one move: the attenuation is
    alpha_pct / (100 * dmax) where dmax = max in-degree. Since the
    adjacency spectral radius is <= max degree, the effective alpha is
    < 1/lambda_max whenever alpha_pct < 100 — the series converges — and
    each round's per-edge contribution floor(x * alpha_pct /
    (100 * dmax)) keeps every intermediate < 2*scale, so int64 never
    overflows regardless of graph shape (a plain alpha^k recursion
    overflows at hub in-degrees ~100). Pure integer ops -> the oracle
    replays the rounds as unrolled SQL CTEs, the q51 trick.

    Scale shape: inputs localCheckpoint-ed ONCE before the loop
    (pagerank's r4 lesson — never re-derive the edge lineage per round);
    each round is one node-sized equi-join + one combiner-friendly
    integer sum; dmax is a single scalar collect.
    Output: (node, katz_fp INT64, katz DOUBLE = katz_fp / scale)."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    row = (
        e.groupBy("d").agg(F.count(F.lit(1)).alias("indeg"))
        .agg(F.max("indeg").alias("m"))
        .collect()
    )
    dmax = int(row[0]["m"]) if row and row[0]["m"] is not None else 1
    denom = 100 * dmax
    x = nodes.withColumn("katz_fp", F.lit(int(scale)).cast("long"))
    for _ in range(iterations):
        insum = (
            e.join(x.withColumnRenamed("node", "s"), "s")
            .select(
                F.col("d").alias("node"),
                F.floor(
                    F.col("katz_fp") * F.lit(alpha_pct) / F.lit(denom)
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        x = nodes.join(insum, "node", "left").select(
            "node",
            (
                F.lit(int(scale)).cast("long")
                + F.coalesce(F.col("in_sum"), F.lit(0)).cast("long")
            ).alias("katz_fp"),
        )
    return x.select(
        "node",
        "katz_fp",
        (F.col("katz_fp").cast("double") / F.lit(float(scale))).alias("katz"),
    )


def hash_priority_matching(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Deterministic parallel maximal matching — the graph-COARSENING
    primitive (multilevel partitioners contract matched pairs; dedup
    pipelines use it to pick disjoint merge pairs so no entity merges
    twice in one pass). Classic parallel matching randomizes
    (Israeli-Itai); this variant replaces the coin with an md5 edge
    priority, so it is exactly reproducible anywhere: per round, an
    edge is matched iff its priority is the MAXIMUM among all edges
    incident to BOTH its endpoints — node-max computed over a union of
    the two endpoint roles (general graphs, not just bipartite), so
    local-max edges are independent by construction; matched endpoints
    leave, repeat.

    Fixed `rounds` (truncation-as-semantics, the q51/q214 discipline):
    each round matches every local-max edge, so the remainder shrinks
    geometrically; edges still unmatched after the last round are
    REPORTED via n_left (no silent incompleteness — maximality holds
    iff n_left = 0). Inputs localCheckpoint-ed per round exactly like
    connected_components. Output: matched (src, dst, round, n_left),
    n_left constant across rows."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .select(
            "s",
            "d",
            F.md5(
                F.concat(
                    F.lit("m:"),
                    F.col("s").cast("string"),
                    F.lit(":"),
                    F.col("d").cast("string"),
                )
            ).alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    matched = None
    for r in range(1, rounds + 1):
        # node-max over BOTH endpoint roles: a vertex shared between a
        # src slot of one edge and a dst slot of another is the same
        # vertex — general graphs, not just bipartite ones
        incid = e.select(F.col("s").alias("node"), "p").union(
            e.select(F.col("d").alias("node"), "p")
        )
        nmax = incid.groupBy("node").agg(F.max("p").alias("mp"))
        win = (
            e.join(nmax.select(F.col("node").alias("s"), F.col("mp").alias("mp_s")), "s")
            .where(F.col("p") == F.col("mp_s"))
            .join(nmax.select(F.col("node").alias("d"), F.col("mp").alias("mp_d")), "d")
            .where(F.col("p") == F.col("mp_d"))
            .select("s", "d", F.lit(r).alias("round"))
            .localCheckpoint(eager=True)
        )
        matched = win if matched is None else matched.union(win)
        used = win.select(F.col("s").alias("node")).union(
            win.select(F.col("d").alias("node"))
        )
        e = (
            e.join(used.select(F.col("node").alias("s")), "s", "left_anti")
            .join(used.select(F.col("node").alias("d")), "d", "left_anti")
            .localCheckpoint(eager=True)
        )
    n_left = e.count()
    return matched.select(
        F.col("s").alias(src),
        F.col("d").alias(dst),
        "round",
        F.lit(int(n_left)).cast("long").alias("n_left"),
    )


def densest_subgraph_peel(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 12,
) -> DataFrame:
    """Charikar peeling for the densest subgraph — dense-CORE mining
    (spam farms, bot rings, over-represented template clusters appear
    as unusually dense cores long before any community algorithm
    names them): repeatedly peel every minimum-degree vertex; the
    densest prefix of the peel order 2-approximates the true maximum
    average degree |E(S)|/|S|. Peeling ALL min-degree vertices per
    round is the standard parallel variant and is fully deterministic
    (no tie order to break — they all go).

    Exactness: the best round is chosen by CROSS-MULTIPLIED integer
    density comparison (e_i·n_j vs e_j·n_i — never a float argmax),
    with the earliest round winning ties; the reported density double
    is presentation only. Fixed `rounds` with the standard
    truncation-as-semantics contract; a graph that empties earlier
    simply stops emitting rows, and the last emitted round's
    remainder is visible in its own (n_nodes, n_edges).

    Scale shape: per round one union-degree groupBy, one scalar min,
    two semi-joins — the connected-components/matching loop
    discipline (localCheckpoint per round). Output one row per
    surviving round: (round, n_nodes, n_edges, min_deg, density,
    is_best)."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    stats = []
    for r in range(rounds + 1):
        deg = (
            e.select(F.col("s").alias("node"))
            .union(e.select(F.col("d").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
            .localCheckpoint(eager=True)
        )
        n_nodes = deg.count()
        if n_nodes == 0:
            break
        n_edges = e.count()
        mind = deg.agg(F.min("deg")).collect()[0][0]
        stats.append((r, n_nodes, n_edges, int(mind)))
        if r == rounds:
            break
        keep = deg.where(F.col("deg") > mind).select("node")
        e = (
            e.join(keep.select(F.col("node").alias("s")), "s")
            .join(keep.select(F.col("node").alias("d")), "d")
            .select("s", "d")
            .localCheckpoint(eager=True)
        )
    best_i = 0
    for i in range(1, len(stats)):
        # denser iff e_i * n_best > e_best * n_i (exact integers)
        if stats[i][2] * stats[best_i][1] > stats[best_i][2] * stats[i][1]:
            best_i = i
    rows = [
        (
            r,
            n,
            m,
            mind,
            float(m) / float(n),
            i == best_i,
        )
        for i, (r, n, m, mind) in enumerate(stats)
    ]
    return spark.createDataFrame(
        rows,
        "round int, n_nodes long, n_edges long, min_deg long,"
        " density double, is_best boolean",
    ).orderBy("round")
