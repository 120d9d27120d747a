"""Property-based invariants (hypothesis): for ANY event set, the
engine's final state equals the pure per-key max-lsn-non-delete oracle,
regardless of batching — the bit-for-bit replay property the north rule
demands, checked over adversarial tiny inputs (duplicate lsns across
keys, interleaved deletes, re-deliveries, singleton/hot keys)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from horizon_etl_spark.cdc.apply import CdcPipeline, apply_batch
from horizon_etl_spark.cdc.schema import CHANGE_FEED_SCHEMA, SOURCE_WHITELIST

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),        # key id (few keys → collisions)
        st.sampled_from(["update", "delete"]),
        st.lists(st.integers(0, 100), min_size=1, max_size=4),  # tokens
    ),
    min_size=1,
    max_size=12,
)


def _rows(events):
    rows = []
    for lsn, (k, op, toks) in enumerate(events):
        is_del = op == "delete"
        rows.append(
            (
                op,
                f"k{k}",
                lsn,
                None if is_del else toks,
                None if is_del else len(toks),
                SOURCE_WHITELIST[lsn % len(SOURCE_WHITELIST)],
                None,
            )
        )
    return rows


def _oracle(events):
    last = {}
    for lsn, (k, op, toks) in enumerate(events):
        last[k] = (op, toks, lsn)
    return sorted(
        (f"k{k}", tuple(toks), len(toks))
        for k, (op, toks, _l) in last.items()
        if op != "delete"
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, split=st.integers(min_value=0, max_value=12))
def test_final_state_equals_oracle_any_batching(spark, tmp_path_factory, events, split):
    root = str(tmp_path_factory.mktemp("prop"))
    pipe = CdcPipeline.create(root, bucket_count=4)
    rows = _rows(events)
    split = min(split, len(rows))
    b0, b1 = rows[:split], rows[split:]
    for i, b in enumerate([b0, b1]):
        if b:
            apply_batch(
                pipe,
                spark.createDataFrame(b, CHANGE_FEED_SCHEMA),
                batch_id=i,
                collect_metrics=False,
                with_change_log=False,
            )
    # re-deliver batch 0 (duplicate delivery must be a no-op)
    if b0:
        apply_batch(
            pipe,
            spark.createDataFrame(b0, CHANGE_FEED_SCHEMA),
            batch_id=0,
            collect_metrics=False,
            with_change_log=False,
        )
    got = sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"])
        for r in pipe.target.read(spark).collect()
    )
    assert got == _oracle(events)
