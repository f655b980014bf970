"""One-off r14 probe: cardinalities of the q_set_similarity_join
candidate pipeline at sf0.1, to decide between a positional prefix
filter and a distinct-mask pre-collapse. Read-only; prints counts."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_log_analysis_spark.operators.dedup import (  # noqa: E402
    _jaccard_prefix,
    _rank_mask,
    _ranked_token_sets,
)
from hadoop_log_analysis_spark.session import get_spark  # noqa: E402
from hadoop_log_analysis_spark.sources.catalog import scan  # noqa: E402


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-setsim")
    spark.sparkContext.setLogLevel("ERROR")
    t = 0.5
    docs = scan(spark, sf, "documents")
    ranked = _ranked_token_sets(docs, "text", "doc_id")
    n_docs = ranked.count()
    print(f"n_docs={n_docs}")
    n_vocab = ranked.agg(F.max(F.element_at("ranks", -1))).collect()[0][0]
    print(f"n_vocab={n_vocab}")
    lens = ranked.agg(
        F.min(F.size("ranks")), F.max(F.size("ranks")),
        F.avg(F.size("ranks")),
    ).collect()[0]
    print(f"set len min/max/avg={lens}")
    masked = ranked.select("id", _rank_mask().alias("mask"))
    n_masks = masked.select("mask").distinct().count()
    print(f"n_distinct_masks={n_masks}")
    grp = masked.groupBy("mask").count()
    gs = grp.agg(F.max("count"), F.avg("count")).collect()[0]
    print(f"mask group max/avg={gs}")
    # candidate pair rows pre-dedup (bitmask path shape)
    pref = _jaccard_prefix(
        ranked.select("id", "ranks", _rank_mask().alias("mask")),
        t, keep_cols=["mask"],
    )
    n_pref = pref.count()
    print(f"n_prefix_rows={n_pref}")
    a = pref.select(F.col("id").alias("a_id"), F.col("mask").alias("a_mask"), "ptok")
    b = pref.select(F.col("id").alias("b_id"), F.col("mask").alias("b_mask"), "ptok")
    t0 = time.perf_counter()
    n_cand = a.join(b, "ptok").filter(F.col("a_id") < F.col("b_id")).count()
    print(f"n_candidate_rows={n_cand} ({time.perf_counter()-t0:.1f}s)")
    # distinct-mask candidate shape: explode prefixes of DISTINCT masks
    dm = grp.select("mask", "count").withColumn(
        "ranks", F.expr(
            "filter(transform(sequence(1, 64), r -> "
            "IF(bit_count(mask & shiftleft(cast(1 as bigint), r-1)) = 1, r, "
            "cast(null as int))), x -> x is not null)"
        )
    )
    dpref = dm.select(
        "mask", "count",
        F.explode(
            F.slice(
                "ranks", 1,
                (F.size("ranks") - F.ceil(F.size("ranks") * F.lit(t)) + 1
                 ).cast("int"),
            )
        ).alias("ptok"),
    )
    da = dpref.select(F.col("mask").alias("a_mask"), F.col("count").alias("a_n"), "ptok")
    db = dpref.select(F.col("mask").alias("b_mask"), F.col("count").alias("b_n"), "ptok")
    t0 = time.perf_counter()
    mm = da.join(db, "ptok").filter(F.col("a_mask") <= F.col("b_mask"))
    n_mask_cand = mm.count()
    print(f"n_mask_candidate_rows={n_mask_cand} ({time.perf_counter()-t0:.1f}s)")
    # qualifying mask pairs and the id-pair output size
    jacc = F.expr("bit_count(a_mask & b_mask)").cast("double") / F.expr(
        "bit_count(a_mask | b_mask)").cast("double")
    qual = (
        mm.withColumn("jacc", jacc).filter(F.col("jacc") >= t)
        .select("a_mask", "b_mask", "a_n", "b_n").dropDuplicates(["a_mask", "b_mask"])
    )
    stats = qual.agg(
        F.count("*"),
        F.sum(
            F.when(F.col("a_mask") == F.col("b_mask"),
                   F.col("a_n") * (F.col("b_n") - 1) / 2
                   ).otherwise(F.col("a_n") * F.col("b_n"))
        ),
    ).collect()[0]
    print(f"n_qual_mask_pairs={stats[0]} est_output_pairs={stats[1]}")
    spark.stop()


if __name__ == "__main__":
    main()
