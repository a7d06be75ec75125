"""Capture .explain("formatted") before/after plans for the r16-touched
NON-registry compositions (the bench aux rows capture_plans.py cannot
reach): ivf_pq_search, ivf_pq_persisted, hybrid_warm, hybrid_batch,
retrieval_warm, plus a small edit_distance_join shape.

"Before" plans come from the pre-change module sources pulled out of
git (``git show <rev>:<path>``) and imported as standalone modules —
the compositions are rebuilt identically with old vs new operator code,
so the plan diff is exactly the code change.

Usage: python tools/capture_r16_aux_plans.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from local_pubchem_db_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_module_at(rev: str, relpath: str, modname: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{rev}:{relpath}"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = f"/tmp/{modname}.py"
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def dump(out_dir: str, name: str, suffix: str, df) -> None:
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(formatted(df))
    import re

    plan = formatted(df)
    n_ex = len(re.findall(r"\bExchange\b", plan))
    py = sorted(set(re.findall(
        r"\b(ArrowEvalPython|BatchEvalPython|MapInArrow|MapInPandas)\b", plan
    )))
    joins = sorted(set(re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
        r"|BroadcastNestedLoopJoin|CartesianProduct)\b", plan
    )))
    print(f"{name}_{suffix}: exchanges={n_ex} joins={','.join(joins) or '-'} "
          f"py={','.join(py) or '-'}", flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "plans", "r16"
    )
    os.makedirs(out_dir, exist_ok=True)

    # resolve "before" revisions from history: the commit whose message
    # introduced each change, parent-ed
    def parent_of(substr: str) -> str:
        line = subprocess.run(
            ["git", "-C", REPO, "log", "--oneline", "--fixed-strings",
             f"--grep={substr}", "-n", "1"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
        return line[0] + "^"

    pq_rev = parent_of("Score the IVF-PQ exact rerank")
    ret_rev = parent_of("Overlap the LSH literal-dup collect")
    joins_rev = parent_of("Score the IVF-PQ exact rerank")

    pq_old = load_module_at(
        pq_rev, "local_pubchem_db_spark/operators/pq.py", "r16_pq_old"
    )
    ret_old = load_module_at(
        ret_rev, "local_pubchem_db_spark/operators/retrieval.py",
        "r16_ret_old",
    )
    joins_old = load_module_at(
        joins_rev, "local_pubchem_db_spark/operators/joins.py",
        "r16_joins_old",
    )

    from local_pubchem_db_spark.operators import pq as pq_new
    from local_pubchem_db_spark.operators import retrieval as ret_new
    from local_pubchem_db_spark.operators import joins as joins_new
    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )

    spark = get_spark(app_name="r16_plans")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = kmeans_fit(emb, k=8, max_iter=10)
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    codebooks = pq_new.pq_fit(assigned, m=8, k=16, centroids=centroids)
    # localCheckpoint, not persist: the bench persists, but a cached
    # relation PRINTS its stored lineage (the encode stage's own
    # ArrowEvalPython) inside InMemoryRelation, which would mask the
    # rerank-crossing diff these plans exist to show; the executed
    # search subtree is identical either way
    enc = pq_new.pq_encode(
        assigned, codebooks, centroids=centroids
    ).localCheckpoint()
    probes = emb.filter(F.col("vec_id") < 16)

    # --- ivf_pq_search (in-memory row)
    for tag, mod in (("before", pq_old), ("after", pq_new)):
        dump(out_dir, "ivf_pq_search", tag, mod.ivf_pq_search(
            enc, probes, centroids, codebooks,
            k=10, nprobe=4, residual=True, rerank=50,
        ))

    # --- ivf_pq_persisted (catalog-table row; built once with CURRENT
    # save — the save path's writes are not what these plans pin)
    name = "r16_plan_ivfpq"
    pq_new.drop_ivf_pq(spark, name)
    try:
        pq_new.save_ivf_pq(enc, centroids, codebooks, name, residual=True)
        idx = pq_new.load_ivf_pq(spark, name)
        p16 = emb.orderBy("vec_id").limit(16)
        for tag, mod in (("before", pq_old), ("after", pq_new)):
            codes, C_, cb_, rot_, meta = idx
            dump(out_dir, "ivf_pq_persisted", tag, mod.ivf_pq_search(
                codes, p16, C_, cb_,
                id_col=meta["id_col"], code_col=meta["code_col"],
                cluster_col=meta["cluster_col"],
                vec_col=meta.get("vec_col", "embedding"),
                k=10, nprobe=4, residual=bool(meta.get("residual")),
                rerank=50, rotation=rot_,
            ))
    finally:
        pq_new.drop_ivf_pq(spark, name)

    # --- retrieval_warm (ad-hoc bm25: n_docs/avgdl derived in-plan now)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pw, dw = ret_new.build_postings(docs)
    pw, dw = pw.persist(), dw.persist()
    pw.count(), dw.count()
    terms = ["hash", "spark", "stream", "vector"]
    dump(out_dir, "retrieval_warm", "before",
         ret_old.bm25_topk(pw, dw, terms, k=10))
    dump(out_dir, "retrieval_warm", "after",
         ret_new.bm25_topk(pw, dw, terms, k=10))

    # --- hybrid_warm (persisted-scalar bm25 + ivf + rrf; the delta is
    # the ivf rerank subtree)
    iname = "r16_plan_bm25"
    ret_new.drop_index(spark, iname)
    ret_new.save_postings(pw, dw, iname, buckets=8)
    p, ds, (n_docs, avgdl), tdf = ret_new.load_index(spark, iname)
    probe1 = emb.filter(F.col("vec_id") == 0)

    def hybrid(mod_pq, mod_ret):
        lex = mod_ret.with_rank(
            mod_ret.bm25_topk(p, ds, terms, k=20,
                              n_docs=n_docs, avgdl=avgdl, term_df=tdf),
            F.desc("score"), F.asc("doc_id"),
        ).select("doc_id", "rank")
        vec = mod_pq.ivf_pq_search(
            enc, probe1, centroids, codebooks,
            k=20, nprobe=4, residual=True, rerank=50,
        ).select(F.col("neighbor_id").alias("doc_id"), "rank")
        return mod_ret.rrf_fuse([lex, vec], top_n=10)

    dump(out_dir, "hybrid_warm", "before", hybrid(pq_old, ret_old))
    dump(out_dir, "hybrid_warm", "after", hybrid(pq_new, ret_new))

    # --- hybrid_batch
    batch_queries = {
        str(i): t for i, t in enumerate(
            [["hash", "spark"], ["stream", "vector"], ["shuffle", "join"],
             ["data", "batch"], ["hash", "stream", "vector"],
             ["spark", "vector"], ["join", "stream"],
             ["hash", "join", "spark"]]
        )
    }
    probes_b = emb.filter(F.col("vec_id") < 8)
    for tag, (mp, mr) in (("before", (pq_old, ret_old)),
                          ("after", (pq_new, ret_new))):
        # hybrid_topk_batch internally imports pq from the package —
        # swap the module attribute so the old composition truly uses
        # the old ivf search
        import local_pubchem_db_spark.operators.pq as pkg_pq
        orig = pkg_pq.ivf_pq_search
        pkg_pq.ivf_pq_search = mp.ivf_pq_search
        try:
            dump(out_dir, "hybrid_batch", tag, mr.hybrid_topk_batch(
                p, ds, batch_queries, enc, probes_b, centroids, codebooks,
                k_lex=20, k_vec=20, top_n=10,
                n_docs=n_docs, avgdl=avgdl, term_df=tdf,
                nprobe=4, residual=True, rerank=50,
            ))
        finally:
            pkg_pq.ivf_pq_search = orig
    ret_new.drop_index(spark, iname)

    # --- edit_distance_join (CartesianProduct -> BroadcastNestedLoopJoin)
    ldf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(
            ["JGUZOCJCNMVJHU", "OAOUTNMJEFWJPO", "YBGBJYVHJTVUSL"])],
        "lid long, k string",
    )
    rdf = spark.createDataFrame(
        [(100, "JGUZOXJCNMVJHU"), (101, "ZZZ")], "rid long, k string"
    )
    dump(out_dir, "edit_distance_join", "before",
         joins_old.edit_distance_join(ldf, rdf, "lid", "k", "rid", "k", 1))
    dump(out_dir, "edit_distance_join", "after",
         joins_new.edit_distance_join(ldf, rdf, "lid", "k", "rid", "k", 1))

    # enc was localCheckpoint-ed; nothing to unpersist
    pw.unpersist()
    dw.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
