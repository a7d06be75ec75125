"""Deterministic dataset splitting and sampling for training pipelines.

`randomSplit` is non-deterministic across runs/cluster layouts; training
pipelines need splits that are (a) stable under re-execution and data
re-partitioning, (b) stable as the dataset grows (a document keeps its
split forever), (c) auditable by an external engine. Hashing the record id
gives all three: split membership is a pure function of the id.

Implementation note: bucket = first 4 hex chars of md5(seed:id). Lowercase
fixed-width hex compares lexicographically exactly as it does numerically,
and md5 is identical across engines, so thresholds are plain string
comparisons that any ANSI-SQL oracle reproduces bit-for-bit — no
engine-specific hash (xxhash64, hash()) in the contract. 16 bits = 65536
buckets → split fractions quantized to ~0.002%.

All JVM-side codegen'd expressions; no shuffle for hash_split (a map-only
projection — at 100 TB this is a narrow transformation that fuses into the
scan stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(id_col: Column, seed: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, 4
    )


def _hex4(frac: float) -> str:
    return format(min(int(frac * 65536), 65535), "04x")


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    seed: str = "0",
) -> DataFrame:
    """Assign each row a stable split label from its id hash.

    ``fractions`` maps label -> fraction (must sum to ~1.0); default
    80/10/10 train/val/test. Adds a ``split`` column. Deterministic across
    runs, partitionings, and engines.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = _bucket(F.col(id_col), seed)
    labels = list(fractions)
    cum = 0.0
    expr = None
    for label in labels[:-1]:
        cum += fractions[label]
        cond = bucket < F.lit(_hex4(cum))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = (
        F.lit(labels[-1]) if expr is None else expr.otherwise(F.lit(labels[-1]))
    )
    return df.withColumn("split", expr)


def mix_domains(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    weights: dict[str, float],
    epochs_cap: float = 4.0,
    seed: str = "0",
) -> DataFrame:
    """Deterministic domain mixing: resample each domain so the output
    matches the target mixture ``weights`` (relative), scaled to the
    largest total achievable without repeating any domain more than
    ``epochs_cap`` times — the up/down-sampling step that turns crawled
    domain proportions into a training mixture.

    Per-domain rate r_d = w_d * T / n_d with T = epochs_cap *
    min_d(n_d / w_d): the scarcest (relative to its weight) domain
    repeats exactly ``epochs_cap`` times and every other domain scales to
    proportion. Each row emits floor(r_d) whole copies plus one
    hash-thresholded fractional copy; membership is a pure function of
    (seed, epoch, id) — md5 string math like ``hash_split``, so re-runs,
    re-partitionings, and external engines reproduce the exact row set.
    Domains absent from ``weights`` are dropped. Output adds a 0-based
    ``epoch`` copy index.

    Cost: one tiny metadata aggregate (per-domain counts, collected to
    plan the rates) + a map-only explode — no data shuffle; at 100 TB
    the explode's fan-out equals the intended output size, there is no
    intermediate blow-up.
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    if epochs_cap < 1.0:
        raise ValueError("epochs_cap must be >= 1 (cannot emit less than the fractional pass)")
    wsum = sum(weights.values())
    norm = {d: w / wsum for d, w in weights.items()}
    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    missing = set(norm) - set(counts)
    if missing:
        raise ValueError(f"domains absent from the data: {sorted(missing)}")
    total = epochs_cap * min(counts[d] / norm[d] for d in norm)
    k_expr = None
    f_expr = None
    for d in norm:
        rate = norm[d] * total / counts[d]
        whole = int(rate)
        fhex = _hex4(rate - whole)
        cond = F.col(domain_col) == d
        k_expr = F.when(cond, whole) if k_expr is None else k_expr.when(cond, whole)
        f_expr = F.when(cond, fhex) if f_expr is None else f_expr.when(cond, fhex)
    frac_bucket = F.substring(
        F.md5(
            F.concat(
                F.lit(f"{seed}:"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col(id_col).cast("string"),
            )
        ),
        1,
        4,
    )
    return (
        df.filter(F.col(domain_col).isin(*norm))
        .withColumn("__k", k_expr)
        .withColumn("__f", f_expr)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__k"))))
        .filter((F.col("epoch") < F.col("__k")) | (frac_bucket < F.col("__f")))
        .drop("__k", "__f")
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    frac: float,
    id_col: str,
    seed: str = "0",
) -> DataFrame:
    """Deterministic per-group sample: within each group, rank rows by id
    hash and keep the first ceil(frac * group_size). Unlike
    ``df.sampleBy``, the selected set is a pure function of the data, so
    re-runs and oracles agree exactly. One shuffle on ``group_col`` (the
    window) — same cost class as the groupBy it usually feeds.
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    w = Window.partitionBy(group_col).orderBy(
        _bucket(F.col(id_col), seed), F.col(id_col)
    )
    wc = Window.partitionBy(group_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * frac))
        .drop("__rn", "__n")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "0",
    keep_key: bool = False,
) -> DataFrame:
    """Globally reorder rows into a reproducible pseudo-random order —
    the corpus-shuffle step before training-example serialization.

    The sort key is md5(seed:id): a pure function of the data, so the
    SAME permutation comes back under re-runs, different partition
    counts, different cluster sizes, and external engines (md5 + string
    order are engine-portable, unlike rand(seed), whose draw order
    follows Spark's physical row order). Change ``seed`` per epoch for a
    fresh permutation.

    Scale shape: one range-partitioned total sort (Spark samples key
    ranges, then sorts partitions in parallel — never a single-partition
    funnel). That one shuffle IS the product: the output files read back
    in shuffled order. ``keep_key=True`` retains the ``shuffle_key``
    column so a writer can re-sort after further narrow transforms or an
    auditor can verify the order.
    """
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    out = df.withColumn("shuffle_key", key).orderBy("shuffle_key", id_col)
    return out if keep_key else out.drop("shuffle_key")


def sample_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    seed: str = "sample",
    salt_buckets: int | None = 32,
) -> DataFrame:
    """EXACTLY min(k, group size) rows per key, chosen uniformly and
    deterministically: rank rows within each key by md5(seed:id) and
    keep the first k.

    The per-domain/"per-source cap" primitive of corpus curation (cap
    every crawl domain at k documents before mixing): ``df.sampleBy``
    is probabilistic (can't hit an exact per-key count) and a
    driver-side loop doesn't scale; this is a window over the key —
    deterministic across runs and partitionings, and re-running with a
    larger k EXTENDS each group's sample (the hash order is a fixed
    permutation per key, so top-k nests within top-k', k < k').

    Hot keys (``salt_buckets``): the very domain that motivates a
    per-domain cap — one giant crawl host — would make a single window
    task sort that key's ENTIRE row set. With ``salt_buckets`` = S > 1
    (default 32) a pre-prune window over (key, pmod(xxhash64(id), S))
    keeps each salt slice's local top-k first, so no task ever sorts
    more than its slice and the final per-key window sees at most S*k
    rows per key. The result is IDENTICAL to the unsalted form: the
    global top-k of a key is contained in the union of its slices'
    local top-k (every discarded row ranks below k inside its own
    slice, hence below the global k-th). Set None to skip the extra
    (cheap, well-distributed) shuffle when keys are known to be small.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    rank_key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    if salt_buckets is not None and salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salt_buckets))
        w1 = Window.partitionBy(F.col(key_col), salt).orderBy(
            rank_key, F.col(id_col)
        )
        df = (
            df.withColumn("__rn_salt", F.row_number().over(w1))
            .filter(F.col("__rn_salt") <= k)
            .drop("__rn_salt")
        )
    w = Window.partitionBy(key_col).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
