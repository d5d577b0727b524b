"""Dev tool: sub-step timing of the fixed-latency tail stages
(resolve / link_pairs / triples) at one core count — pinpoints which
join/exchange inside each stage carries the input-size-independent cost
that caps N-vs-4N scaling.  Run exclusively on a quiet box."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("PTS_CPUS", "16"))
N = int(os.environ.get("PTS_DOCS", "20000"))


def main():
    from pyspark.sql import functions as F
    from inclusionreferenceskg_spark.session import get_spark
    from inclusionreferenceskg_spark import synth
    from inclusionreferenceskg_spark.operators.parse import parse_pages
    from inclusionreferenceskg_spark.operators.detect import build_qualifiers
    from inclusionreferenceskg_spark.operators import resolve as R
    from inclusionreferenceskg_spark.operators import kg as kg_ops
    from inclusionreferenceskg_spark.plans.pipeline import run_pipeline

    spark = get_spark("pts", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    run_pipeline(synth.synthesize_pages(spark, 64, partitions=16)) \
        .triples.count()

    def t(name, fn):
        t0 = time.perf_counter()
        r = fn()
        print(f"{name:32s} {time.perf_counter() - t0:7.2f}s", flush=True)
        return r

    pages = synth.synthesize_pages(spark, N, partitions=max(CPUS * 2, 16))
    nodes = t("parse", lambda: parse_pages(pages)
              .localCheckpoint(eager=True))
    quals = t("qualify", lambda: build_qualifiers(nodes)
              .localCheckpoint(eager=True))
    print("  nodes rows:", nodes.count(), " quals rows:", quals.count())

    # ---- resolve sub-steps
    resolved = t("resolve (whole)", lambda: R.resolve_targets(quals, nodes)
                 .localCheckpoint(eager=True))
    print("  resolved rows:", resolved.count())

    wide = t("extract", lambda: kg_ops.extract_graph(nodes, resolved)
             .localCheckpoint(eager=True))
    kn = kg_ops.graph_nodes(wide)
    ke = kg_ops.graph_edges(wide).unionByName(kg_ops.contains_edges(nodes))
    l3 = kg_ops.l3_candidates(wide)

    # link sub-steps: fused star vs l3 join vs distinct
    kn_ck = t("kn materialize", lambda: kn.localCheckpoint(eager=True))
    print("  kn rows:", kn_ck.count())
    # re-create the internal pieces of entity_link_pairs
    def key_expr(tag, cols):
        parts = [F.lit(tag)] + [F.coalesce(F.col(c), F.lit("\x00"))
                                for c in cols]
        return F.concat_ws("\x1f", *parts)
    m1 = kn_ck.select("url", "kg_id", key_expr("L1", ["token_key"])
                      .alias("k"))
    m2 = (kn_ck.filter((F.col("kind") == "object")
                       & F.col("para_key").isNotNull())
          .select("url", "kg_id", key_expr("L2", ["para_key",
                  "coref_lemma", "coref_tag"]).alias("k")))
    m4 = (kn_ck.filter(F.col("propn_key").isNotNull())
          .select("url", "kg_id", key_expr("L4", ["url", "propn_key"])
                  .alias("k")))
    members = m1.unionByName(m2).unionByName(m4)
    mins = members.groupBy("k").agg(F.min("kg_id").alias("a"))
    fused = (members.join(mins, "k")
             .filter(F.col("kg_id") != F.col("a"))
             .select("url", "a", F.col("kg_id").alias("b")))
    fused_ck = t("  link: fused star", lambda: fused
                 .localCheckpoint(eager=True))
    print("  fused rows:", fused_ck.count())
    full_pairs = t("link_pairs (whole)",
                   lambda: kg_ops.entity_link_pairs(kn_ck, l3, nodes)
                   .localCheckpoint(eager=True))
    n_pairs = full_pairs.count()
    print("  pairs rows:", n_pairs)

    canon = t("cc", lambda: kg_ops.connected_components(full_pairs))
    fe = kg_ops.apply_merges(kn_ck, ke, canon)
    am = t("  apply_merges only", lambda: fe.localCheckpoint(eager=True))
    print("  final edges:", am.count())
    tr = kg_ops.make_triples(am, kn_ck, canon, nodes)
    t("  make_triples only", lambda: tr.count())
    # unsliced triples stage for comparison with the stage profiler
    fe2 = kg_ops.apply_merges(kn_ck, ke, canon)
    tr2 = kg_ops.make_triples(fe2, kn_ck, canon, nodes)
    t("triples (whole, lazy)", lambda: tr2.count())
    spark.stop()


if __name__ == "__main__":
    main()
