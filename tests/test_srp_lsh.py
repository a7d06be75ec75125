"""SRP-LSH (random hyperplane) embedding near-dup: oracle = brute-force
float64 cosine over all pairs. Precision must be exactly 1.0 (candidates
are exact-verified with the same arithmetic); recall is bounded by the
banding math and pinned loosely here (deterministic under the fixed
seed)."""

import numpy as np
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.similarity import srp_lsh_neardup_pairs


def _true_pairs(rows, threshold):
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    n = np.linalg.norm(V, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    Vn = V / n
    S = Vn @ Vn.T
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = S[iu, ju] >= threshold
    out = set()
    for i, j in zip(ids[iu[keep]], ids[ju[keep]]):
        out.add((min(int(i), int(j)), max(int(i), int(j))))
    return out


def test_srp_lsh_exact_precision_and_high_recall(spark, sf_dir):
    # The testdata blobs top out at cosine ~0.48, so the test runs the
    # low-threshold regime: 2 sign bits per band x 32 bands gives
    # P[miss a 0.4-pair] = (1 - 0.631^2)^32 ~ 1e-7 (0.631 = 1 - theta/pi
    # at theta = arccos 0.4). The 0.8-regime defaults are exercised by the
    # banding math itself — same code path, different constants.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        (r["id1"], r["id2"])
        for r in srp_lsh_neardup_pairs(
            emb, threshold=0.4, n_bits=64, bands=32
        ).collect()
    }
    want = _true_pairs(emb.select("vec_id", "embedding").collect(), 0.4)
    assert len(want) == 66  # pinned from the testdata
    # precision 1.0: every emitted pair is exact-verified
    assert got <= want, f"false positives: {sorted(got - want)[:5]}"
    # recall ~1 in this regime; deterministic under the fixed seed
    assert len(got) >= 0.95 * len(want), f"{len(got)}/{len(want)}"


def test_srp_lsh_rejects_bad_banding(spark):
    import pytest

    df = spark.range(1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="bands must divide n_bits"):
        srp_lsh_neardup_pairs(df, n_bits=100, bands=16)


def test_srp_lsh_cap_boundary_recall(spark):
    """The measured answer to the mixed-bucket recall caveat at r >= 8
    (where "auto" engages the 64-cap): a planted 500-way near-dup flood
    plus planted ordinary pairs in background noise.

    Pins, cap ON vs OFF:
    - ordinary (non-flood) pair recall stays >= the banding-math floor —
      the cap must not cost recall outside oversized buckets;
    - the flood cluster stays ONE connected component with every member
      attached (star+chain inside an all-near-dup bucket verifies), so
      the dedup keep-set is identical to uncapped even though raw pair
      count inside the flood degrades from C(n,2) by design;
    - precision is exactly 1.0 in both modes (every pair re-verified).
    """
    from local_pubchem_db_spark.operators.dedup import connected_components

    rng = np.random.default_rng(11)
    dim = 32
    rows = []
    # 500-way flood: one base direction + tiny jitter (pairwise cos ~1)
    base = rng.standard_normal(dim)
    base /= np.linalg.norm(base)
    for i in range(500):
        v = base + 0.01 * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
    # 40 planted ordinary near-dup pairs, far from the flood and each other
    for p in range(40):
        u = rng.standard_normal(dim)
        u /= np.linalg.norm(u)
        w = u + 0.05 * rng.standard_normal(dim)
        rows.append((1000 + 2 * p, [float(x) for x in u]))
        rows.append((1001 + 2 * p, [float(x) for x in w]))
    # background noise: unrelated directions
    for i in range(400):
        v = rng.standard_normal(dim)
        rows.append((5000 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    want = _true_pairs(
        [{"vec_id": i, "embedding": v} for i, v in rows], 0.8
    )
    flood_ids = set(range(500))
    want_ordinary = {
        (a, b) for a, b in want if a not in flood_ids or b not in flood_ids
    }
    assert len(want_ordinary) >= 35  # the planted pairs survive the noise

    results = {}
    for mode, cap in [("capped", 64), ("uncapped", None)]:
        got = {
            (r["id1"], r["id2"])
            for r in srp_lsh_neardup_pairs(
                emb, threshold=0.8, max_bucket_size=cap
            ).collect()
        }
        assert got <= want, f"{mode}: false positives"  # precision 1.0
        results[mode] = got

    # ordinary-pair recall floor with the cap ON: banding math gives
    # ~94% at the 0.8 defaults; pin a deterministic-seed 85% floor and
    # require parity with the uncapped run (the cap costs nothing here).
    for mode in ("capped", "uncapped"):
        ordinary = {p for p in results[mode] if p in want_ordinary}
        assert len(ordinary) >= 0.85 * len(want_ordinary), (
            mode, len(ordinary), len(want_ordinary))
    assert (results["capped"] & want_ordinary) == (
        results["uncapped"] & want_ordinary
    )

    # flood connectivity: one component containing all 500 members in
    # BOTH modes -> identical keep-set under component-wise dedup.
    for mode in ("capped", "uncapped"):
        flood_pairs = [
            p for p in results[mode] if p[0] in flood_ids and p[1] in flood_ids
        ]
        pairs_df = spark.createDataFrame(flood_pairs, "id1 long, id2 long")
        rows_cc = connected_components(pairs_df).collect()
        comps = {r["rep"] for r in rows_cc}
        members = {r["id"] for r in rows_cc}
        assert len(comps) == 1, (mode, len(comps))
        assert members == flood_ids, (mode, len(members))
    # and the cap genuinely engaged: far fewer flood pairs than C(500,2)
    n_flood_capped = sum(
        1 for p in results["capped"] if p[0] in flood_ids and p[1] in flood_ids
    )
    n_flood_uncapped = sum(
        1 for p in results["uncapped"] if p[0] in flood_ids and p[1] in flood_ids
    )
    assert n_flood_capped < 0.1 * n_flood_uncapped, (
        n_flood_capped, n_flood_uncapped)


def test_incremental_srp_new_ids(spark, tmp_path):
    """Embedding twin of incremental MinHash dedup: batch vs a PERSISTED
    SRP sign index. History collisions drop conservatively; batch-internal
    dups exact-verify and keep the lowest id; novel vectors pass."""
    import pytest

    from local_pubchem_db_spark.operators.similarity import (
        incremental_srp_new_ids,
        srp_sign_index,
    )

    rng = np.random.default_rng(21)
    dim = 32

    def vec(base=None, jitter=0.0):
        v = rng.standard_normal(dim) if base is None else base + jitter * rng.standard_normal(dim)
        return [float(x) for x in v]

    h1, h2 = vec(), vec()
    history = spark.createDataFrame(
        [(1, h1), (2, h2)], "vec_id long, embedding array<double>"
    )
    idx_path = str(tmp_path / "srp_index")
    srp_sign_index(history).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    novel_a = vec()
    batch = spark.createDataFrame(
        [
            (10, vec(np.array(h1), 0.01)),  # near-dup of history -> dropped
            (11, novel_a),                   # novel -> kept
            (12, vec(np.array(novel_a), 0.01)),  # dup of 11 -> dropped
            (13, vec()),                     # novel -> kept
        ],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        r["vec_id"]
        for r in incremental_srp_new_ids(batch, idx).collect()
    )
    assert got == [11, 13]

    # list-of-frames form (compacted + delta) gives the same answer
    got2 = sorted(
        r["vec_id"]
        for r in incremental_srp_new_ids(batch, [idx]).collect()
    )
    assert got2 == [11, 13]

    # mismatched banding parameters vs the index must raise, not
    # silently compare incompatible sign buckets
    with pytest.raises(ValueError, match="bands must divide"):
        incremental_srp_new_ids(batch, idx, n_bits=100, bands=16)
