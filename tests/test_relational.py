"""Unit tests for plans/relational.py kernels that want hand-built
fixtures beyond the parquet testdata (the differential suite covers
oracle parity; these pin semantics against Python references)."""


def test_markov_transitions_matches_python_reference(spark, tmp_path):
    """d43 on a hand-built event stream: transition counts equal the naive
    per-user bigram count (with the (ts, event_id) tie-break), rows
    normalize to 1 per prev_type, and cross-user boundaries contribute
    nothing."""
    import datetime as dt
    from collections import Counter

    from aws_kinesis_spark import registry

    t0 = dt.datetime(2026, 3, 1)
    streams = {1: ["a", "b", "a", "c"], 2: ["b", "b"], 3: ["c"]}
    rows, eid = [], 0
    for u, seq in streams.items():
        for i, et in enumerate(seq):
            rows.append((eid, t0 + dt.timedelta(seconds=i), u, et, 1.0, "{}"))
            eid += 1
    sf = str(tmp_path / "mk")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(sf + "/events.parquet")
    expect = Counter()
    for seq in streams.values():
        for p, n in zip(seq, seq[1:]):
            expect[(p, n)] += 1
    got = {(r.prev_type, r.next_type): r for r in
           registry.queries()["d43_markov_transitions"](spark, sf).collect()}
    assert {k: v.n for k, v in got.items()} == dict(expect)
    # rows normalize: probabilities per prev_type sum to 1
    from collections import defaultdict
    sums = defaultdict(float)
    for (p, _), r in got.items():
        sums[p] += r.p
    for p, s in sums.items():
        assert abs(s - 1.0) < 1e-6, (p, s)
    # user 3's lone event and each user's first event produce no transition
    assert ("c", "b") not in got
