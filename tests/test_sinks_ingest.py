"""Export sinks (§2.1 writers) round-trips + ingest utilities."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_pit import sinks
from spark_pit.operators.ingest import infer_stream_type


def test_csv_tsv_roundtrip(spark, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    for name, writer in (("csv", sinks.write_csv), ("tsv", sinks.write_tsv)):
        out = str(tmp_path / name)
        writer(df, out)
        sep = "\t" if name == "tsv" else ","
        back = spark.read.option("header", True).option("sep", sep).csv(out)
        assert back.count() == df.count()
        assert set(back.columns) == set(df.columns)


def test_libsvm_roundtrip(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = str(tmp_path / "svm")
    sinks.write_libsvm(emb, out, "label", "embedding")
    back = spark.read.format("libsvm").load(out)
    assert back.count() == emb.count()
    assert set(back.columns) == {"label", "features"}


def test_arff_layout(spark, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    ).limit(50)
    out = str(tmp_path / "arff")
    sinks.write_arff(df, out, relation="events")
    header = open(os.path.join(out, "_arff_header")).read()
    assert "@relation events" in header
    assert "@attribute value numeric" in header
    data = spark.read.text(os.path.join(out, "data"))
    assert data.count() == 50


def test_embedding_sink(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = str(tmp_path / "emb")
    sinks.write_embeddings(emb, out, "vec_id", "embedding")
    back = spark.read.parquet(out)
    assert back.count() == emb.count()
    assert back.schema["embedding"].dataType.simpleString() == "array<float>"


def test_infer_stream_type(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    vocabs = {
        "web-events": {"click", "error", "purchase", "signup", "view"},
        "dna": {"A", "C", "G", "T"},
    }
    assert infer_stream_type(ev, "event_type", vocabs) == "web-events"
    dna = spark.createDataFrame([("A",), ("G",)], ["event_type"])
    assert infer_stream_type(dna, "event_type", vocabs) == "dna"
    other = spark.createDataFrame([("Z",)], ["event_type"])
    assert infer_stream_type(other, "event_type", vocabs) == "unknown"


def test_read_fasta_multiline_and_headers(spark, tmp_path):
    """Distributed FASTA parse: multi-line sequences, '|'-field headers with
    defaults, lowercase → upper (reference read_fasta feature.py:75-113)."""
    from spark_pit.operators.ingest import read_fasta

    fa = tmp_path / "toy.fasta"
    fa.write_text(
        ">seq1|1|training\nMKV\nlvag\n"
        ">seq2|0|testing\nACDE\n"
        ">seq3\nggg\nH\n"
    )
    out = read_fasta(spark, str(fa)).toPandas().set_index("name")
    assert out.loc["seq1", "sequence"] == "MKVLVAG"
    assert out.loc["seq1", "label"] == "1" and bool(out.loc["seq1", "training"])
    assert out.loc["seq2", "sequence"] == "ACDE" and not bool(out.loc["seq2", "training"])
    assert out.loc["seq3", "label"] == "0" and bool(out.loc["seq3", "training"])
    assert out.loc["seq3", "sequence"] == "GGGH"
    assert len(out) == 3


def test_write_bucketed_join_without_exchange(spark, sf_dir):
    """Two tables bucketed on the same key join AND aggregate with zero
    Exchange nodes (the persisted co-located layout); results match the
    plain-parquet join."""
    import io
    from contextlib import redirect_stdout

    from spark_pit.sinks import write_bucketed

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "value"
    )
    agg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    try:
        write_bucketed(ev, "t_ev_bkt", "user_id", 8, ["user_id"])
        write_bucketed(agg, "t_agg_bkt", "user_id", 8, ["user_id"])
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("t_ev_bkt").join(spark.table("t_agg_bkt"), "user_id")
            buf = io.StringIO()
            with redirect_stdout(buf):
                j.explain("formatted")
            plan = buf.getvalue()
            assert plan.count("Exchange") == 0 and "SortMergeJoin" in plan
            g = spark.table("t_ev_bkt").groupBy("user_id").agg(F.sum("value"))
            buf2 = io.StringIO()
            with redirect_stdout(buf2):
                g.explain("formatted")
            assert buf2.getvalue().count("Exchange") == 0
            assert j.count() == ev.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ev_bkt")
        spark.sql("DROP TABLE IF EXISTS t_agg_bkt")


def test_deterministic_sample_partition_invariant(spark, sf_dir):
    """Same rows regardless of partition layout (unlike df.sample), salt
    changes draw an independent set, and the complement is disjoint."""
    from spark_pit.operators.ingest import deterministic_sample

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    a = set(r[0] for r in deterministic_sample(ev, "event_id", 0.3).collect())
    b = set(r[0] for r in deterministic_sample(
        ev.repartition(7), "event_id", 0.3).collect())
    assert a == b and 0.2 < len(a) / 1000 < 0.4
    c = set(r[0] for r in deterministic_sample(ev, "event_id", 0.3, salt="s2").collect())
    assert c != a
    # threshold split: 0.3 sample is a subset of the 0.6 sample (same salt)
    d = set(r[0] for r in deterministic_sample(ev, "event_id", 0.6).collect())
    assert a <= d


def test_stratified_sample_per_stratum_rates(spark, sf_dir):
    from spark_pit.operators.ingest import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = stratified_sample(
        docs, "doc_id", "source",
        fractions={"src0": 1.0, "src1": 0.0}, default_fraction=0.2,
    ).groupBy("source").count().toPandas().set_index("source")["count"]
    assert kept.get("src0") == 25          # fraction 1.0 keeps everything
    assert "src1" not in kept.index        # fraction 0.0 keeps nothing
    rest = kept.drop("src0", errors="ignore").sum()
    assert 0.05 < rest / (18 * 25) < 0.4   # default 0.2 on 18 strata
