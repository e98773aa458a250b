"""Physical-plan audits over the gate-query surface: the properties
that decide whether a plan survives a 100× scale-up — column pruning
and predicate pushdown reaching the parquet scan, broadcast joins on
slim dimension sides, and no accidental cartesian products — asserted
on the ACTUAL plans Catalyst produces, so a regression (a new column
ref that defeats pruning, a join that silently degrades to
CartesianProduct) fails in CI instead of at the 100 TB tier."""

import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.01"


def plan_str(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


@pytest.fixture(scope="module")
def queries():
    return em.queries()


def test_docs_scan_prunes_to_used_columns(spark, queries):
    """token_count touches (doc_id, text); the documents scan must not
    read lang/source/n_chars."""
    p = plan_str(queries["token_count"](spark, SF))
    scan = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert scan, p
    rs = scan[0]
    assert "doc_id" in rs and "text" in rs
    assert "lang" not in rs and "source" not in rs and "n_chars" not in rs


def test_tpch_q1_pushes_shipdate_filter(spark, queries):
    """The l_shipdate predicate must reach the parquet scan as a
    pushed filter AND the scan must prune to the 7 referenced columns."""
    p = plan_str(queries["tpch_q1"](spark, SF))
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed and "l_shipdate" in pushed[0], p
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_partkey" not in rs and "l_suppkey" not in rs


def test_gate_queries_have_no_cartesian(spark, queries):
    """No gate query may plan a CartesianProduct / unconditioned
    BroadcastNestedLoopJoin at gate scale (the exact crossJoin
    fallbacks are budget-gated OFF at this tier)."""
    names = [
        "exact_dedup_groups", "token_count", "bpe_token_count",
        "text_quality", "lang_id", "doc_fingerprint", "tpch_q1",
        "events_by_type", "frequent_tokens", "kll_caption_len_by_source",
        "bloom_customer_orders", "countmin_tokens", "kmv_distinct_by_source",
        "embedding_topk_ip", "embedding_topk_cosine",
        "simhash_dup_docs", "substring_dup_pairs",
        "embedding_cosine_dup_pairs", "ngram_jaccard_pairs",
    ]
    for n in names:
        p = plan_str(queries[n](spark, SF), mode="simple")
        assert "CartesianProduct" not in p, f"{n} plans a cartesian:\n{p}"


def test_pipeline_boundary_joins_broadcast(spark, smoke_sf_dir):
    """The id-map boundary joins (int64 → image_id) must be broadcast,
    never a shuffled sort-merge over the slim two-column side."""
    from datasketches_java_spark.config import FROZEN
    from datasketches_java_spark.plans.pipeline import run_pipeline
    from datasketches_java_spark.sources import tables

    corpus = tables.load_corpus(spark, smoke_sf_dir)
    res = run_pipeline(spark, corpus, FROZEN)
    p = plan_str(res.clusters, mode="simple")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_ks_pairwise_no_cartesian(spark, queries):
    """ks_caption_len_sources compares all source pairs — must be a
    sketch-side pairwise compare, not a row-level cartesian."""
    p = plan_str(queries["ks_caption_len_sources"](spark, SF), mode="simple")
    assert "CartesianProduct" not in p


def test_sequence_pack_single_shard_exchange(spark, queries):
    """sequence_pack must plan ONE hash exchange on the shard key and a
    window over it — never a global (single-partition) sort, which is
    the scale-killer the sharding exists to prevent."""
    p = plan_str(queries["sequence_pack"](spark, SF))
    assert "Window" in p, p
    assert "SinglePartition" not in p, f"global window:\n{p}"
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "lang" not in rs and "n_chars" not in rs


def test_split_leakage_reuses_hash_partitioning(spark, queries):
    """split_leakage_audit groups and joins on the same md5 key: the
    aggregate side must arrive at the join without a second exchange
    (partitioning reuse), and nothing may plan a cartesian."""
    p = plan_str(queries["split_leakage_audit"](spark, SF))
    assert "CartesianProduct" not in p, p
    # one exchange for the groupBy, one for the probe side; a third
    # exchange would mean the agg output was re-shuffled for the join
    n_exchanges = p.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"{n_exchanges} hash exchanges:\n{p}"


def test_pii_scan_is_map_only(spark, queries):
    """pii_scan is a pure map stage: no exchange of any kind may appear
    (regex count/replace over the scan, straight to output)."""
    p = plan_str(queries["pii_scan"](spark, SF))
    assert "Exchange" not in p, f"pii_scan shuffles:\n{p}"


def test_fdt_face_scan_prunes_and_single_final_exchange(spark, queries):
    """The FDT face must (a) prune the documents scan to its three
    dimension columns and (b) plan exactly one shuffle — the bounded
    partial→final exchange on the constant group (the per-partition
    bottom-k partial runs map-side inside mapInPandas), so the reduce
    input stays O(partitions·k) at any table size."""
    p = plan_str(queries["fdt_groups_lang_source"](spark, SF))
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert rs and "lang" in rs[0] and "source" in rs[0] and "text" in rs[0]
    assert "doc_id" not in rs[0] and "n_chars" not in rs[0]
    # count detail-block headers only ("(N) Exchange"); formatted mode
    # also names each node in the tree line
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", p, re.M))
    assert n_exchanges == 1, p
    assert "CartesianProduct" not in p
