"""Sources/sinks + TypeGroupBy + corruption tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_json_graph_roundtrip(spark, tmp_path):
    from mapping_analysis_spark.sources.json_graph import (
        read_edges,
        read_vertices,
        write_edges,
        write_vertices,
    )

    v = spark.createDataFrame(
        [(1, "alpha", "src1", 10), (2, "beta", "src2", 10)],
        "id long, label string, dataSource string, ccId long",
    )
    e = spark.createDataFrame(
        [(1, 2, 0.75)], "src long, dst long, agg_sim double"
    )
    vp, ep = str(tmp_path / "v"), str(tmp_path / "e")
    write_vertices(v, vp)
    write_edges(e, ep)
    v2 = read_vertices(spark, vp)
    got = {(r.id, r.label, r.dataSource, r.ccId) for r in v2.select(
        "id", "label", "dataSource", "ccId").collect()}
    assert got == {(1, "alpha", "src1", 10), (2, "beta", "src2", 10)}
    e2 = read_edges(spark, ep)
    assert [(r.src, r.dst, r.agg_sim) for r in e2.collect()] == [(1, 2, 0.75)]


def test_music_csv_source(spark, tmp_path):
    from mapping_analysis_spark.sources.music_csv import read_music_vertices

    path = str(tmp_path / "music.csv")
    with open(path, "w") as f:
        f.write("TID,CID,CTID,SourceID,id,number,title,length,artist,album,year,language\n")
        f.write('1,100,1,1,x1,7,"Help!","03:42","The Beatles","Help","\'96",english\n')
        f.write('2,100,2,2,x2,7,"Help","222","Beatles","Help",1996,"Fre."\n')
    df = read_music_vertices(spark, path)
    rows = {r.id: r for r in df.collect()}
    assert rows[1].length == 222 and rows[2].length == 222
    assert rows[1].year == 1996
    assert rows[1].language == "english" and rows[2].language == "french"
    assert rows[1].artist_title_album == "the beatles help help"
    assert rows[1].gold_cid == 100


def test_type_group_by(spark):
    from mapping_analysis_spark.operators.typegroupby import type_group_by

    vertices = spark.createDataFrame(
        [
            (1, "Settlement", 5, 50),
            (2, None, 5, 51),         # untyped → adopts best typed neighbor
            (3, "School", 5, 52),
            (10, None, 6, 60),        # untyped island → min cc fallback
            (11, None, 6, 61),
        ],
        "id long, type string, cc_id long, hash_cc long",
    )
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.95), (10, 11, 0.5)],
        "src long, dst long, agg_sim double",
    )
    got = {r.id: r.hash_cc for r in type_group_by(vertices, edges).collect()}
    assert got[1] == 50 and got[3] == 52       # typed keep their own
    assert got[2] == 52                        # best neighbor is 3 (0.95)
    assert got[10] == 6 and got[11] == 6       # fallback min cc_id


def test_corruption_ops(spark):
    from mapping_analysis_spark.operators.typegroupby import (
        data_corruption_add_edges,
        data_corruption_remove_edges,
    )

    edges = spark.createDataFrame(
        [(i, i + 1000) for i in range(100)], "src long, dst long"
    )
    kept = data_corruption_remove_edges(edges, 10)
    n = kept.count()
    assert 80 <= n < 100
    # deterministic
    assert kept.count() == data_corruption_remove_edges(edges, 10).count()
    v = spark.createDataFrame([(i,) for i in range(100)], "id long")
    fab = data_corruption_add_edges(v, 10)
    assert fab.count() > 0
    assert fab.filter(F.col("src") == F.col("dst")).count() == 0


def test_hash_cc_by_type_overlap(spark):
    from mapping_analysis_spark.operators.typegroupby import (
        hash_cc_by_type_overlap,
    )

    v = spark.createDataFrame(
        [
            (1, 5, ["Settlement"]),
            (2, 5, ["Settlement", "City"]),   # overlaps 1 (Settlement)
            (3, 5, ["School"]),               # disjoint → own group
            (9, 6, ["School"]),               # other cc → other group
        ],
        "id long, cc_id long, types array<string>",
    )
    got = {r.id: r.hash_cc for r in hash_cc_by_type_overlap(v).collect()}
    assert got[1] == got[2]
    assert got[3] != got[1]
    assert got[9] != got[3]  # same min-type but different cc
