"""Structural invariants for the event-analytics operators (Q116/Q116b/
Q117/Q120) — properties the SQL oracle can't directly express: interval
partitioning, session coverage, and funnel monotonicity."""

from __future__ import annotations

from pyspark.sql import functions as F

from palletjack_spark.queries import REGISTRY
from palletjack_spark.tables import load_table
from tests.conftest import SF_DIR


def _events_count(spark) -> int:
    return load_table(spark, SF_DIR, "events").count()


def test_scd2_intervals_partition_each_timeline(spark):
    """Q116: per user, versions are contiguous (each valid_to equals the
    next valid_from), non-overlapping, and exactly one is current."""
    pdf = (
        REGISTRY["q116_scd2_dimension"]
        .fn(spark, SF_DIR)
        .orderBy("user_id", "valid_from_us")
        .toPandas()
    )
    for uid, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("valid_from_us").reset_index(drop=True)
        assert grp["is_current"].sum() == 1, uid
        assert grp["is_current"].iloc[-1], f"{uid}: open interval must be last"
        assert grp["valid_to_us"].iloc[-1] is None or (
            grp["valid_to_us"].isna().iloc[-1]
        ), f"{uid}: current version must be open-ended"
        closed = grp["valid_to_us"].iloc[:-1]
        nxt = grp["valid_from_us"].iloc[1:]
        assert (closed.to_numpy() == nxt.to_numpy()).all(), (
            f"{uid}: intervals must tile the timeline with no gap/overlap"
        )


def test_temporal_join_covers_every_fact_exactly_once(spark):
    """Q116b: every purchase event matches exactly one dimension version
    (half-open intervals partition the timeline)."""
    out = REGISTRY["q116b_temporal_join"].fn(spark, SF_DIR)
    n_out = out.count()
    n_facts = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert n_out == n_facts
    assert out.select("event_id").distinct().count() == n_facts


def test_sessions_cover_all_events_and_respect_gaps(spark):
    """Q117: session event counts sum to the table; within a user,
    consecutive sessions are separated by more than the 30-minute gap."""
    pdf = REGISTRY["q117_sessionization"].fn(spark, SF_DIR).toPandas()
    assert int(pdf["n_events"].sum()) == _events_count(spark)
    for uid, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("session_seq").reset_index(drop=True)
        assert (grp["session_end_us"] >= grp["session_start_us"]).all()
        gaps = (
            grp["session_start_us"].iloc[1:].to_numpy()
            - grp["session_end_us"].iloc[:-1].to_numpy()
        )
        assert (gaps > 1_800_000_000).all(), f"{uid}: sessions too close"


def test_funnel_stage_monotone(spark):
    """Q120: stage timestamps are ordered (signup <= click <= purchase
    where present) and stage_reached matches which are present; every
    user with any event appears."""
    pdf = REGISTRY["q120_funnel"].fn(spark, SF_DIR).toPandas()
    users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(pdf) == users
    has_c = pdf["click_us"].notna()
    has_p = pdf["purchase_us"].notna()
    assert (pdf.loc[has_c, "signup_us"] <= pdf.loc[has_c, "click_us"]).all()
    assert (pdf.loc[has_p, "click_us"] <= pdf.loc[has_p, "purchase_us"]).all()
    expect = (
        pdf["signup_us"].notna().astype(int)
        + has_c.astype(int)
        + has_p.astype(int)
    )
    assert (pdf["stage_reached"] == expect).all()
