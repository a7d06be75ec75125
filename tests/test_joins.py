"""Join operator semantics: as-of, range, banded range."""

from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.joins import (
    as_of_join,
    banded_range_join,
    range_join,
)


def test_as_of_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 25), (3, 100, 5), (4, 200, 50)],
        "lid long, key long, ts long",
    )
    right = spark.createDataFrame(
        [(100, 10, "a"), (100, 20, "b"), (300, 1, "z")],
        "key long, rts long, tag string",
    )
    out = {
        r["lid"]: (r["tag"], r["rts"])
        for r in as_of_join(
            left, right, ["key"], "ts", "rts", ["tag", "rts"]
        ).collect()
    }
    assert out[1] == ("a", 10)   # ts=10 matches same-instant right row
    assert out[2] == ("b", 20)   # ts=25 takes the latest prior (20, not 10)
    assert out[3] == (None, None)  # ts=5: no right row yet
    assert out[4] == (None, None)  # key 200: no right rows at all
    assert len(out) == 4


def test_range_join_vs_banded(spark, sf_dir):
    parts = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_retailprice"
    )
    probes = parts.filter(F.col("p_partkey") <= 10).select(
        F.col("p_partkey").alias("probe_id"),
        F.col("p_retailprice").alias("probe_price"),
    )
    a = set(
        (r["probe_id"], r["p_partkey"])
        for r in range_join(parts, probes, "p_retailprice", "probe_price", 2.0).collect()
    )
    b = set(
        (r["probe_id"], r["p_partkey"])
        for r in banded_range_join(
            parts, probes, "p_retailprice", "probe_price", 2.0
        ).collect()
    )
    assert a == b and len(a) > 0


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_join_matches_brute_force(spark):
    import random

    from local_pubchem_db_spark.operators.joins import edit_distance_join

    rng = random.Random(13)
    alphabet = "abc"
    # small alphabet + varied lengths (incl. 0..2: the short path) makes
    # near pairs common and exercises every branch
    def rand_s():
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 9)))

    lrows = [(i, rand_s()) for i in range(60)]
    rrows = [(1000 + i, rand_s()) for i in range(60)]
    ldf = spark.createDataFrame(lrows, "lid long, name string")
    rdf = spark.createDataFrame(rrows, "rid long, name string")

    for d in (0, 1, 2, 3):
        got = {
            (r["lid"], r["rid"], r["distance"])
            for r in edit_distance_join(
                ldf, rdf, "lid", "name", "rid", "name", max_distance=d
            ).collect()
        }
        want = {
            (li, ri, _lev(a, b))
            for li, a in lrows
            for ri, b in rrows
            if _lev(a, b) <= d
        }
        assert got == want, (d, len(got), len(want))


def test_edit_distance_join_inchikey_shape(spark):
    # the reference workload: fixed-length uppercase keys, d=1 typo match
    from local_pubchem_db_spark.operators.joins import edit_distance_join

    keys = ["JGUZOCJCNMVJHU", "OAOUTNMJEFWJPO", "YBGBJYVHJTVUSL"]
    ldf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(keys)], "lid long, k string"
    )
    typo = keys[0][:5] + "X" + keys[0][6:]  # one substitution
    rdf = spark.createDataFrame(
        [(100, typo), (101, "ZZZZZZZZZZZZZZ")], "rid long, k string"
    )
    got = {
        (r["lid"], r["rid"], r["distance"])
        for r in edit_distance_join(ldf, rdf, "lid", "k", "rid", "k", 1).collect()
    }
    assert got == {(0, 100, 1)}


def test_edit_distance_join_string_ids(spark):
    # The operator's motivating keys are string InChIKeys — the Arrow
    # schema must follow the input id dtype, not assume long.
    from local_pubchem_db_spark.operators.joins import edit_distance_join

    ldf = spark.createDataFrame(
        [("LID-A", "kitten"), ("LID-B", "flaw")], "lid string, w string"
    )
    rdf = spark.createDataFrame(
        [("RID-1", "sitten"), ("RID-2", "lawn"), ("RID-3", "zzz")],
        "rid string, w string",
    )
    got = {
        (r["lid"], r["rid"], r["distance"])
        for r in edit_distance_join(ldf, rdf, "lid", "w", "rid", "w", 2).collect()
    }
    assert got == {("LID-A", "RID-1", 1), ("LID-B", "RID-2", 2)}
