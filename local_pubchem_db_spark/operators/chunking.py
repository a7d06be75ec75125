"""Document chunking: fixed-size token windows with overlap.

The training-data op that feeds context-window-bounded consumers: split
each document into chunks of ``chunk_size`` whitespace tokens, starting a
new chunk every ``stride`` tokens (overlap = chunk_size - stride).

Spark-first shape: tokenize once (JVM split), explode a stride sequence of
chunk starts, slice the token array per start — all codegen-able built-ins,
no Python in the row path, and the explode distributes chunks across
partitions so downstream per-chunk work (embedding, scoring) parallelizes
beyond the document count. Generalizes the reference's record-splitting
ingest (utils.py:245-269 splits files into molecule records; this splits
documents into token windows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from local_pubchem_db_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """One output row per (document, chunk window).

    Returns ``id_col, chunk_id, n_tokens, chunk_text``. The final chunk of
    a document may be shorter than ``chunk_size``; empty documents produce
    no chunks. Deterministic and exactly SQL-expressible (list slicing +
    range unnest), so it participates in the DuckDB oracle gate.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    w: Column = tokens(F.col(text_col))
    # trim-filter first: split("") yields [""], not [] — an all-whitespace
    # document must produce zero chunks, not one empty chunk.
    toked = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), w.alias("__w"))
    )
    return (
        toked.select(
            id_col,
            "__w",
            F.explode(
                F.sequence(F.lit(0), F.size("__w") - 1, F.lit(stride))
            ).alias("__s"),
        )
        .select(
            id_col,
            (F.col("__s") / stride).cast("int").alias("chunk_id"),
            F.size(F.slice("__w", F.col("__s") + 1, chunk_size))
            .cast("long")
            .alias("n_tokens"),
            F.array_join(F.slice("__w", F.col("__s") + 1, chunk_size), " ").alias(
                "chunk_text"
            ),
        )
    )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Greedy NEXT-FIT sequence packing: assign each document a
    ``pack_id`` so that every pack's token sum stays <= ``max_tokens`` —
    the step between chunking and training-batch assembly (padding waste
    drops from ~50% to a few percent for typical length distributions).
    Next-fit: only the currently open pack is considered; earlier partial
    packs are never revisited — the streaming-friendly discipline (O(1)
    state per task; first-fit would need every open pack in memory).

    Rows with a null ``n_tokens`` fail the job with an explicit error —
    a null length is an upstream bug, and silently packing it as 0 would
    overfill training batches.

    Greedy packing is inherently sequential, so the distributed contract
    is PARTITION-LOCAL packing in id order: rows are range-partitioned and
    sorted by id, each task packs its own run of documents, and pack ids
    are globally unique as (partition_id << 32 | local_pack). Cross-
    partition packing could only merge the (at most one) partial tail
    pack per partition — a bounded, documented waste, the standard
    trade for linear scan + zero shuffles beyond the range partition.

    Documents longer than ``max_tokens`` get a pack of their own (the
    caller chunks them first — see chunk_documents).

    ``order_cols`` packs on a COMPOSITE key (e.g. ``["doc_id",
    "chunk_id"]``): rows are range-partitioned and scanned in that tuple
    order, and all key columns pass through to the output. This is the
    collision-safe path for chunk-level packing — a synthetic scalar uid
    like ``doc_id * 2^20 + chunk_id`` silently wraps (and cross-doc
    aliases) once doc ids are 64-bit hashes.

    Returns ``*key cols, n_tokens_col, pack_id``.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    import pandas as pd  # noqa: F401  (type-hint resolution)

    keys = list(order_cols) if order_cols else [id_col]
    in_types = dict(docs.dtypes)
    out_schema = (
        ", ".join(f"{c} {in_types[c]}" for c in keys) + ", __n long, pack_id long"
    )

    base = (
        docs.select(*keys, F.col(n_tokens_col).cast("long").alias("__n"))
        .repartitionByRange(*[F.col(c) for c in keys])
        .sortWithinPartitions(*keys)
    )

    def pack(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        local_pack = 0
        acc = 0
        started = False
        for pdf in batches:  # greedy state carries across Arrow batches
            if pdf["__n"].isna().any():
                bad = pdf.loc[pdf["__n"].isna(), keys[0]].head(5).tolist()
                raise ValueError(
                    "pack_sequences: null n_tokens for ids %s — token "
                    "counts must be non-null (fix or filter upstream)" % bad
                )
            packs = []
            for n in pdf["__n"]:
                n = int(n)
                if started and acc + n > max_tokens:
                    local_pack += 1
                    acc = 0
                started = True
                acc += n
                packs.append((pid << 32) | local_pack)
            out = pdf.copy()
            out["pack_id"] = packs
            yield out

    return base.mapInPandas(pack, out_schema).withColumnRenamed(
        "__n", n_tokens_col
    )
