"""CEP matcher semantics: combinators, skip strategies, streaming parity."""

from __future__ import annotations

from flink_ci_flink_spark.cep import NO_SKIP, SKIP_PAST_LAST, Pattern, find_matches


def ev(t, typ):
    return {"__ts": float(t), "type": typ}


def seq(*types):
    return [ev(i, x) for i, x in enumerate(types)]


def typed(name):
    return lambda e, n=name: e["type"] == n


def test_strict_next():
    p = Pattern.begin("a", typed("A")).next("b", typed("B"))
    ms = find_matches(p, seq("A", "B", "A", "C", "A", "B"), "__ts")
    assert [(m.start_idx, m.end_idx) for m in ms] == [(0, 1), (4, 5)]


def test_followed_by_relaxed():
    p = Pattern.begin("a", typed("A")).followed_by("b", typed("B"))
    ms = find_matches(p, seq("A", "C", "C", "B"), "__ts")
    assert [(m.start_idx, m.end_idx) for m in ms] == [(0, 3)]


def test_times_quantifier():
    p = Pattern.begin("a", typed("A")).times(2, 3).next("b", typed("B"))
    # greedy: takes 3 A's from anchor 0; NO_SKIP also matches anchor 1 ([1,2])
    ms = find_matches(p, seq("A", "A", "A", "B"), "__ts")
    assert len(ms) == 2
    assert ms[0].groups["a"] == [0, 1, 2]
    assert ms[1].groups["a"] == [1, 2]
    # SKIP_PAST_LAST consumes the matched events → single match
    p_skip = (
        Pattern.begin("a", typed("A")).times(2, 3).next("b", typed("B"))
        .after_match_skip(SKIP_PAST_LAST)
    )
    assert len(find_matches(p_skip, seq("A", "A", "A", "B"), "__ts")) == 1
    # min 2 still matches
    ms = find_matches(p, seq("A", "A", "B"), "__ts")
    assert len(ms) == 1 and ms[0].groups["a"] == [0, 1]
    # 1 A does not
    assert find_matches(p, seq("A", "B"), "__ts") == []


def test_optional_stage():
    p = Pattern.begin("a", typed("A")).next("b", typed("B")).optional_().next(
        "c", typed("C")
    )
    ms = find_matches(p, seq("A", "C"), "__ts")
    assert len(ms) == 1 and "b" not in ms[0].groups
    ms = find_matches(p, seq("A", "B", "C"), "__ts")
    assert len(ms) == 1 and ms[0].groups["b"] == [1]


def test_within_window():
    p = Pattern.begin("a", typed("A")).followed_by("b", typed("B")).within(2)
    events = [ev(0, "A"), ev(5, "B")]
    assert find_matches(p, events, "__ts") == []
    events = [ev(0, "A"), ev(1.5, "B")]
    assert len(find_matches(p, events, "__ts")) == 1


def test_skip_strategies():
    p = Pattern.begin("a", typed("A")).next("b", typed("A"))
    # A A A: NO_SKIP → (0,1),(1,2); SKIP_PAST_LAST → (0,1) only
    assert len(find_matches(p, seq("A", "A", "A"), "__ts")) == 2
    p2 = Pattern.begin("a", typed("A")).next("b", typed("A")).after_match_skip(
        SKIP_PAST_LAST
    )
    assert len(find_matches(p2, seq("A", "A", "A"), "__ts")) == 1


def test_or_predicate():
    p = Pattern.begin("a", typed("A")).or_(typed("B")).next("c", typed("C"))
    ms = find_matches(p, seq("B", "C", "A", "C"), "__ts")
    assert [(m.start_idx, m.end_idx) for m in ms] == [(0, 1), (2, 3)]


def test_streaming_cep_matches_batch(spark, sf_dir):
    """cep_stream over micro-batch replay == batch cep (delay=0, data ordered)."""
    import uuid

    from pyspark.sql import functions as F

    from flink_ci_flink_spark.catalog import load_tables
    from flink_ci_flink_spark.cep import cep, cep_stream
    from flink_ci_flink_spark.streaming import file_stream, run_to_completion
    import shutil
    import tempfile

    t = load_tables(spark, sf_dir)
    ev_df = t.events.select("user_id", "event_id", "ts", "event_type").orderBy("ts")
    tmp = tempfile.mkdtemp(prefix="cep_stream_")
    try:
        rows = ev_df.collect()
        third = len(rows) // 3
        for i, chunk in enumerate(
            [rows[:third], rows[third : 2 * third], rows[2 * third :]]
        ):
            spark.createDataFrame(chunk, ev_df.schema).coalesce(1).write.parquet(
                f"{tmp}/f{i}"
            )
        import glob
        import os

        for i in range(3):
            (part,) = glob.glob(f"{tmp}/f{i}/part-*.parquet")
            os.rename(part, f"{tmp}/{i:03d}.parquet")
            shutil.rmtree(f"{tmp}/f{i}")

        pat = (
            Pattern.begin("a", where=lambda e: e["event_type"] == "click")
            .next("b", where=lambda e: e["event_type"] == "purchase")
            .within(259200)
            .after_match_skip(NO_SKIP)
        )

        def select(key, m, events):
            return {
                "user_id": int(key[0]),
                "start_id": int(events[m.groups["a"][0]]["event_id"]),
                "end_id": int(events[m.groups["b"][0]]["event_id"]),
            }

        schema_out = "user_id long, start_id long, end_id long"
        batch = {
            (r.user_id, r.start_id, r.end_id)
            for r in cep(ev_df, pat, ["user_id"], "ts", select, schema_out).collect()
        }

        stream = file_stream(spark, tmp, ev_df.schema, max_files_per_trigger=1)
        out = cep_stream(stream, pat, ["user_id"], "ts", select, schema_out)
        name = f"cep_{uuid.uuid4().hex[:8]}"
        run_to_completion(out, name, "append")
        streamed = {
            (r.user_id, r.start_id, r.end_id) for r in spark.table(name).collect()
        }
        # delay=0: every match whose last event is <= the key's max seen ts
        # emits; the final batch flushes everything
        assert streamed == batch
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
