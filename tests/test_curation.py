"""Curation operator tests beyond the SQL oracle: planted contamination
(the hit path with a disjoint eval set), packing boundary arithmetic,
and PII regex behavior on crafted strings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from palletjack_spark.functions.curation import (
    decontaminate,
    pack_sequences,
    redact_pii,
)


@pytest.fixture(scope="module")
def planted(spark):
    """Train docs 0-3; doc 1 contains eval doc 100's 5-gram verbatim,
    doc 2 shares two overlapping 5-grams, docs 0/3 are clean."""
    eval_text = "alpha beta gamma delta epsilon zeta"
    train = spark.createDataFrame(
        [
            (0, "one two three four five six seven"),
            (1, "prefix words alpha beta gamma delta epsilon suffix"),
            (2, "alpha beta gamma delta epsilon zeta trailing"),
            (3, "eight nine ten eleven twelve thirteen"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, eval_text)], "doc_id long, text string")
    return train, ev


def test_decontaminate_plants(spark, planted):
    train, ev = planted
    out = {
        r["doc_id"]: r["n_shared_grams"]
        for r in decontaminate(train, ev, "text", "doc_id", n=5).collect()
    }
    # eval 5-grams: {alpha..epsilon, beta..zeta}; doc 1 contains the first,
    # doc 2 contains both
    assert out == {1: 1, 2: 2}


def test_decontaminate_short_docs_no_grams(spark):
    train = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    ev = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    # both shorter than n -> no grams on either side -> no flags
    assert decontaminate(train, ev, "text", "doc_id", n=5).count() == 0


def test_pack_sequences_boundaries(spark):
    # 3-token docs, capacity 7: offsets 0,3,6,9,... -> chunks 0,0,0,1,...
    rows = [(i, "w w w", "s") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {
        (r["part"], r["chunk_id"]): (r["n_docs"], r["n_tokens"])
        for r in pack_sequences(df, "text", "doc_id", "src", capacity=7).collect()
    }
    # offsets: 0,3,6,9,12 -> chunk ids 0,0,0,1,1
    assert out == {("s", 0): (3, 9), ("s", 1): (2, 6)}


def test_pack_sequences_independent_shards(spark):
    rows = [(0, "w w w w", "a"), (1, "w w w w", "b"), (2, "w", "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {
        (r["part"], r["chunk_id"]): r["n_tokens"]
        for r in pack_sequences(df, "text", "doc_id", "src", capacity=4).collect()
    }
    # shard a: doc0 at offset 0 (chunk 0), doc2 at offset 4 (chunk 1);
    # shard b restarts at offset 0
    assert out == {("a", 0): 4, ("a", 1): 1, ("b", 0): 4}


def test_redact_pii_crafted(spark):
    df = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@corp.example.org now"),
            (1, "call 555-0199 or 555-12345 tomorrow"),
            (2, "nothing sensitive here"),
            (3, "two mails a@b.io c@d.net and 555-0000"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["clean_text"])
        for r in redact_pii(df, "text").collect()
    }
    assert out[0][0] == 1 and "<EMAIL>" in out[0][2]
    assert "jane" not in out[0][2]
    # 555-12345: \b after {4} digits fails at the 5th digit, so only
    # 555-0199 matches
    assert out[1][1] == 1 and out[1][2].count("<PHONE>") == 1
    assert out[2] == (0, 0, "nothing sensitive here")
    assert out[3][0] == 2 and out[3][1] == 1


def test_token_budget_take_while(spark):
    """The budget is a take-while on the hash-ordered cumsum: once a doc
    overflows, everything after it in that domain is dropped — even
    smaller docs that would individually fit."""
    from palletjack_spark.functions.curation import token_budget_sample

    rows = [(i, "w " * 10, "s") for i in range(6)]  # 11 tokens each (trailing '')
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], "doc_id long, text string, src string"
    )
    out = token_budget_sample(df, "text", "doc_id", "src", budget=25)
    kept = sorted(r["doc_id"] for r in out.collect())
    # 10 tokens per doc -> exactly 2 fit in 25 regardless of hash order
    assert len(kept) == 2
    # determinism: same selection on re-run
    again = sorted(r["doc_id"] for r in out.collect())
    assert kept == again


def test_reserved_internal_names_rejected(spark):
    """Caller column names that collide with an operator's internal working
    columns must raise instead of silently computing over the wrong data."""
    from palletjack_spark.functions.curation import (
        pack_sequences,
        redact_pii,
        token_budget_sample,
    )

    df = spark.createDataFrame(
        [(1, "a b c", "s")], "n_tok long, text string, cum string"
    )
    with pytest.raises(ValueError, match="n_tok"):
        pack_sequences(df, "text", "n_tok", "cum")
    with pytest.raises(ValueError, match="cum"):
        token_budget_sample(df, "text", "text", "cum")
    df2 = df.withColumnRenamed("text", "clean_text")
    with pytest.raises(ValueError, match="clean_text"):
        redact_pii(df2, "clean_text")


def test_paragraph_dedup_first_occurrence(spark):
    """Planted boilerplate: the shared paragraph survives only in the
    lowest-(id, pos) document; unique paragraphs all survive; documents
    reassemble in original order; all-duplicate documents vanish."""
    from palletjack_spark.functions.curation import dedup_paragraphs

    df = spark.createDataFrame(
        [
            (1, "alpha one. SHARED BANNER. alpha two"),
            (2, "beta one. SHARED BANNER. beta two"),
            (3, "SHARED BANNER"),
            (4, "gamma. gamma"),  # intra-doc repeat: second copy drops
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_paragraphs(df, "text", "doc_id").collect()
    }
    assert out[1]["clean_text"] == "alpha one. SHARED BANNER. alpha two"
    assert out[1]["n_paras"] == 3
    assert out[2]["clean_text"] == "beta one. beta two"
    assert out[2]["n_paras"] == 2
    assert 3 not in out  # its only paragraph lost to doc 1
    assert out[4]["clean_text"] == "gamma" and out[4]["n_paras"] == 1


def test_paragraph_dedup_reserved_names(spark):
    from palletjack_spark.functions.curation import dedup_paragraphs

    df = spark.createDataFrame([(1, "x")], "pos long, text string")
    with pytest.raises(ValueError, match="pos"):
        dedup_paragraphs(df, "text", "pos")


def test_cap_domains_caps_and_blocks(spark):
    from palletjack_spark.functions.curation import cap_domains
    from palletjack_spark.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    out = cap_domains(docs, "doc_id", "source", cap=5).toPandas()
    per = out.groupby("source").size()
    assert (per <= 5).all()
    assert not {"src13", "src17"} & set(out["source"])
    # deterministic: same selection twice
    again = cap_domains(docs, "doc_id", "source", cap=5).toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])
    # the pick is a hash draw, not a doc_id prefix
    first_ids = set(docs.orderBy("doc_id").limit(5).toPandas()["doc_id"])
    assert set(out[out["source"] == "src1"]["doc_id"]) != first_ids


def test_importance_weights_prefers_target_like_docs(spark):
    """Docs made of target-distribution tokens must outscore docs made of
    tokens absent from the target."""
    from palletjack_spark.functions.curation import importance_weights

    rows = [
        (0, "alpha beta gamma alpha beta"),
        (1, "delta epsilon zeta delta zeta"),
        (2, "alpha beta alpha beta gamma"),
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = raw.where(F.col("doc_id") == 0)
    out = {
        r["doc_id"]: r
        for r in importance_weights(raw, target, "text", "doc_id").collect()
    }
    assert out[2]["score"] > out[1]["score"]
    assert out[0]["n_toks"] == 5
    # masses are exact integers: doc0/doc2 tokens all in target
    assert out[1]["t_mass"] == out[1]["n_toks"]  # +1 smoothing only
