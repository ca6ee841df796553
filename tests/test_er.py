import pytest


def test_er_merges_typo_and_transitive(spark):
    from pathhier_spark.operators.er import er_resolve

    recs = spark.createDataFrame(
        [
            (1, "cold widget 5"),
            (2, "col widget 5"),      # typo of 1 (lev 1)
            (3, "cold widgets 5"),    # lev 1 from 1 -> transitive with 2
                                      # (lev(2,3) = 2, only linked via 1)
            (10, "azure bolt 7"),
            (11, "crimson bolt 7"),  # same block (bolt:*? no — first char differs)
        ],
        "rec_id long, name string",
    )
    got = {r["rec_id"]: r for r in er_resolve(recs).collect()}
    assert got[1]["entity_id"] == got[2]["entity_id"] == got[3]["entity_id"] == 1
    assert got[1]["cluster_size"] == 3
    assert got[1]["is_canonical"] and not got[2]["is_canonical"]
    assert got[10]["entity_id"] == 10 and got[10]["cluster_size"] == 1
    assert got[11]["entity_id"] == 11


def test_er_blocking_recall_through_first_token_typo(spark):
    from pathhier_spark.operators.er import er_resolve

    # pass 2 key (first:last) differs for the pair; pass 1
    # (last : first char) still blocks them together
    recs = spark.createDataFrame(
        [(1, "gold bolt 9"), (2, "gol bolt 9")],
        "rec_id long, name string",
    )
    got = {r["rec_id"]: r["entity_id"] for r in er_resolve(recs).collect()}
    assert got[1] == got[2] == 1


def test_er_max_block_caps_pathological_keys(spark):
    from pathhier_spark.operators.er import er_resolve

    # 30 identical names: one block of 30; cap at 10 drops the block ->
    # all singletons (recall traded for bounded cost, by contract)
    recs = spark.createDataFrame(
        [(i, "same name 1") for i in range(30)], "rec_id long, name string"
    )
    capped = er_resolve(recs, max_block=10)
    assert all(r["cluster_size"] == 1 for r in capped.collect())
    full = er_resolve(recs)
    assert all(r["cluster_size"] == 30 for r in full.collect())


def test_er_edit_distance_threshold_respected(spark):
    from pathhier_spark.operators.er import er_resolve

    recs = spark.createDataFrame(
        [(1, "cold widget 5"), (2, "cozy widget 5")],  # lev 2
        "rec_id long, name string",
    )
    got = {r["rec_id"]: r["entity_id"] for r in er_resolve(recs).collect()}
    assert got[1] == 1 and got[2] == 2
    got2 = {r["rec_id"]: r["entity_id"]
            for r in er_resolve(recs, max_edit=2).collect()}
    assert got2[1] == got2[2] == 1


def test_er_rejects_negative_and_string_ids(spark):
    from pathhier_spark.operators.er import er_resolve

    neg = spark.createDataFrame(
        [(-2, "cold widget 5"), (-1, "col widget 5")],
        "rec_id long, name string",
    )
    with pytest.raises(ValueError, match="negative"):
        er_resolve(neg)
    strs = spark.createDataFrame(
        [("a", "cold widget 5")], "rec_id string, name string"
    )
    with pytest.raises(ValueError, match="integer type"):
        er_resolve(strs)
