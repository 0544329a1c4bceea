"""ParquetLakeTarget + apply_batch semantics: idempotence, LWW under
out-of-order/duplicate delivery, delete tombstones, schema evolution,
dead-letter split. Mirrors the reference's parameterized semantics tables
(JenaGroupMergeStepTest.java:55-830) for the CDC analogues in FIXTURES.md §3.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kettle_jena_plugins_spark.model import CHANGE_EVENT_SCHEMA, CHANGE_EVENT_SCHEMA_V2
from kettle_jena_plugins_spark.operators.lww import lww_state
from kettle_jena_plugins_spark.streaming.apply import CDCConfig, apply_batch
from kettle_jena_plugins_spark.targets.parquet_lake import ParquetLakeTarget

T0 = dt.datetime(2026, 1, 1)


def ev(op, lsn, ts_off, conv, turn, role="user", text=None, tool=None):
    return (op, lsn, T0 + dt.timedelta(seconds=ts_off), conv, turn, role, text, tool)


def make_events(spark, rows, schema=CHANGE_EVENT_SCHEMA):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(params=["cow", "mor"])
def target(spark, tmp_path, request):
    t = ParquetLakeTarget(
        spark, str(tmp_path / "tbl"), n_buckets=4, mode=request.param,
        compact_threshold=3,
    )
    t.create()
    yield t
    t.drop()


def state(t):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in t.read().collect()
    }


def test_insert_update_delete(spark, target):
    b0 = make_events(spark, [
        ev("I", 1, 1, "a", 0, text="hello"),
        ev("I", 2, 2, "a", 1, text="world"),
        ev("I", 3, 3, "b", 0, text="x"),
    ])
    apply_batch(target, b0, 0)
    b1 = make_events(spark, [
        ev("U", 4, 4, "a", 0, text="hello2"),
        ev("D", 5, 5, "b", 0),
    ])
    apply_batch(target, b1, 1)
    s = state(target)
    assert s[("a", 0)][1] == "hello2"
    assert ("b", 0) not in s
    assert s[("a", 1)][1] == "world"


def test_idempotent_replay(spark, target):
    b0 = make_events(spark, [ev("I", 1, 1, "a", 0, text="v1")])
    r0 = apply_batch(target, b0, 0)
    assert r0.applied
    # replay the same batch id with different (corrupt) content → no-op
    b0_corrupt = make_events(spark, [ev("U", 9, 9, "a", 0, text="corrupt")])
    r1 = apply_batch(target, b0_corrupt, 0)
    assert not r1.applied
    assert state(target)[("a", 0)][1] == "v1"


def test_out_of_order_and_duplicates_converge(spark, target):
    # newer event applied first; older + duplicate arrive in later batches
    apply_batch(target, make_events(spark, [ev("U", 10, 100, "a", 0, text="new")]), 0)
    r = apply_batch(
        target,
        make_events(spark, [
            ev("U", 5, 50, "a", 0, text="old"),      # late: loses LWW
            ev("U", 10, 100, "a", 0, text="new"),    # duplicate delivery
        ]),
        1,
    )
    assert state(target)[("a", 0)][1] == "new"
    assert r.late_events == 2  # both at-or-below the bucket watermark


def test_late_update_cannot_resurrect_delete(spark, target):
    apply_batch(target, make_events(spark, [ev("I", 1, 1, "a", 0, text="v")]), 0)
    apply_batch(target, make_events(spark, [ev("D", 9, 90, "a", 0)]), 1)
    # update older than the delete arrives afterwards
    apply_batch(target, make_events(spark, [ev("U", 5, 50, "a", 0, text="zombie")]), 2)
    assert ("a", 0) not in state(target)


def test_delete_then_reinsert_single_batch(spark, target):
    # I,U,D,I for one key within one batch → final op wins (I at lsn 4)
    apply_batch(
        target,
        make_events(spark, [
            ev("I", 1, 1, "a", 0, text="v1"),
            ev("U", 2, 2, "a", 0, text="v2"),
            ev("D", 3, 3, "a", 0),
            ev("I", 4, 4, "a", 0, text="v3"),
        ]),
        0,
    )
    assert state(target)[("a", 0)][1] == "v3"


def test_lww_tie_on_ts_broken_by_lsn(spark, target):
    apply_batch(
        target,
        make_events(spark, [
            ev("U", 7, 100, "a", 0, text="lsn7"),
            ev("U", 8, 100, "a", 0, text="lsn8"),
        ]),
        0,
    )
    assert state(target)[("a", 0)][1] == "lsn8"


def test_dead_letter_split(spark, target, tmp_path):
    dl = str(tmp_path / "dead")
    cfg = CDCConfig(dead_letter_dir=dl, normalize=False)
    r = apply_batch(
        target,
        make_events(spark, [
            ev("I", 1, 1, "a", 0, text="ok"),
            ("X", 2, T0, "a", 1, "user", "badop", None),
            ("I", 3, T0, None, 2, "user", "nullkey", None),
        ]),
        0,
        cfg,
    )
    assert r.extra["dead_letter_rows"] == 2
    assert set(state(target)) == {("a", 0)}
    dead = spark.read.parquet(dl)
    assert dead.count() == 2
    msgs = {r["error_msg"] for r in dead.collect()}
    assert msgs == {"bad_op", "null_key:conv_id"}


def test_schema_evolution_add_column_and_widen(spark, target):
    apply_batch(target, make_events(spark, [ev("I", 1, 1, "a", 0, text="v1")]), 0)
    v2 = spark.createDataFrame(
        [("U", 2, T0 + dt.timedelta(seconds=2), "a", 2**40, "user", "v2", None,
          '{"m":1}')],
        CHANGE_EVENT_SCHEMA_V2,
    )
    apply_batch(target, v2, 1)
    tschema = {f.name: f.dataType.simpleString() for f in target.schema().fields}
    assert tschema["tool_meta"] == "string"
    assert tschema["turn_idx"] == "bigint"
    rows = {(r["conv_id"], r["turn_idx"]): r for r in target.read().collect()}
    assert rows[("a", 2**40)]["tool_meta"] == '{"m":1}'
    assert rows[("a", 0)]["tool_meta"] is None  # old rows aligned with null


def test_normalization_applied(spark, target):
    apply_batch(
        target,
        make_events(spark, [ev("I", 1, 1, "a", 0, text="  héllo\t\tworld ")]),
        0,
    )
    assert state(target)[("a", 0)][1] == "héllo world"  # NFC + ws collapse


def test_mor_compaction_preserves_state(spark, tmp_path):
    """MOR: layer stacks grow per batch, compact inline past the threshold,
    and state is identical before/after compaction (tombstones retained)."""
    t = ParquetLakeTarget(
        spark, str(tmp_path / "mor"), n_buckets=2, mode="mor", compact_threshold=3
    )
    t.create()
    for i in range(5):
        t_events = [ev("U", 10 * i + j, 10 * i + j, "a", j, text=f"v{i}")
                    for j in range(3)]
        t_events.append(ev("D", 10 * i + 9, 10 * i + 9, "b", i))
        apply_batch(t, make_events(spark, t_events), i, CDCConfig(normalize=False))
    layer_counts = [len(e["layers"]) for e in t.manifest()["buckets"].values()]
    assert max(layer_counts) <= 4  # inline compaction bounded the stacks
    before = sorted(tuple(r) for r in t.read().collect())
    assert t.compact() >= 0
    after = sorted(tuple(r) for r in t.read().collect())
    assert before == after
    assert {r[0] for r in after} == {"a"}  # b's keys all deleted
    assert [r for r in after if r[1] == 0][0][3] == "v4"  # last writer won
    t.drop()


def test_multibatch_equals_oneshot_lww(spark, target):
    """Convergence golden test: incremental apply over batches == one-shot
    lww_state over the concatenated log (SURVEY.md §7 minimum slice)."""
    from kettle_jena_plugins_spark.sources.changes import change_events

    ch = change_events(spark, "/root/testdata/sf0.001").cache()
    batches = [ch.filter((F.col("lsn") % 3) == i) for i in range(3)]
    for i, b in enumerate(batches):
        apply_batch(target, b, i, CDCConfig(normalize=False))
    got = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in target.read().collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in lww_state(ch).collect()
    }
    ch.unpersist()
    assert got == want


def test_normalize_post_reduce_applies_to_winners(spark, target):
    """normalize=True: final table text is normalized (collapsed whitespace,
    trimmed) on both the pre-reduce (COW union) and raw-event (MOR) sink
    paths, and LWW winner selection is unaffected by messy payloads."""
    rows = [
        ev("I", 1, 0, "c1", 0, text="  hello \t world "),
        ev("U", 2, 10, "c1", 0, text=" final   text "),  # winner
        ev("I", 3, 0, "c2", 1, text="already clean"),
    ]
    apply_batch(target, make_events(spark, rows), 0, CDCConfig(normalize=True))
    state = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in target.read().collect()
    }
    assert state[("c1", 0)] == "final text"  # LWW winner, ws-collapsed
    assert state[("c2", 1)] == "already clean"

    # a later batch replacing the winner also lands normalized
    apply_batch(
        target,
        make_events(spark, [ev("U", 4, 20, "c1", 0, text="  newer   value ")]),
        1,
        CDCConfig(normalize=True),
    )
    state = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in target.read().collect()
    }
    assert state[("c1", 0)] == "newer value"


def test_redact_on_ingest(spark, tmp_path):
    # cfg.redact scrubs PII post-reduce on LWW winners — both merge paths
    t = ParquetLakeTarget(spark, str(tmp_path / "rtbl"), n_buckets=2, mode="mor")
    t.create()
    try:
        b = make_events(spark, [
            ev("I", 1, 1, "a", 0, text="mail me at bob@example.com ok"),
            ev("I", 2, 2, "a", 1, text="from 10.0.0.7 with love"),
            ev("U", 3, 3, "a", 0, text="final bob@example.com text"),
        ])
        apply_batch(t, b, 0, CDCConfig(redact=True, normalize=False))
        s = state(t)
        assert s[("a", 0)][1] == "final <EMAIL> text"  # LWW winner, redacted
        assert s[("a", 1)][1] == "from <IP> with love"
        raw = " ".join(v[1] for v in s.values())
        assert "bob@example.com" not in raw and "10.0.0.7" not in raw
    finally:
        t.drop()


def test_lww_combiner_runs_before_exchange(spark):
    """Pin the load-bearing scale property of the apply plan (BENCH.md's
    projection rests on it): the LWW reduce must run a PARTIAL max_by
    aggregate BELOW the key Exchange (map-side combine), so shuffle volume
    is ~#distinct keys per batch, never #events. executedPlan prints
    top-down, so the partial aggregate must appear AFTER the Exchange in
    the string and a partial_max must exist at all."""
    events = make_events(
        spark,
        [
            ev("I", i, i, f"c{i % 3}", i % 2, text=f"t{i}")
            for i in range(1, 60)
        ],
    )
    plan = (
        lww_state(events)._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_max" in plan, plan[:2000]
    i_exchange = plan.index("Exchange hashpartitioning")
    i_partial = plan.index("partial_max")
    assert i_partial > i_exchange, (
        "map-side combine missing: partial aggregate not below the "
        "shuffle exchange"
    )


def test_lww_state_matches_python_reference_on_random_streams(spark):
    """Randomized operator-level oracle: seeded random streams (update-
    heavy, deliberate ts collisions, injected exact-duplicate rows, fully
    shuffled delivery order) must reduce to exactly what a pure-Python
    LWW reducer computes — winner per (conv_id, turn_idx) by max (ts,
    lsn), deletes dropping the key. Independent of both the DuckDB oracle
    formulation and the window/salted variants."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        events = []
        for lsn in range(400):
            conv = f"c{rng.randrange(6)}"
            turn = rng.randrange(4)
            op = rng.choice("IUUD")
            # coarse ts grid → frequent ts ties, so the lsn tiebreak is
            # genuinely exercised
            ts = T0 + dt.timedelta(seconds=rng.randrange(60))
            text = None if op == "D" else f"x{lsn}"
            events.append((op, lsn, ts, conv, turn, "user", text, None))
        dups = [events[rng.randrange(len(events))] for _ in range(50)]
        stream = events + dups
        rng.shuffle(stream)

        expected = {}
        for op, lsn, ts, conv, turn, role, text, tool in events:
            k = (conv, turn)
            cur = expected.get(k)
            if cur is None or (ts, lsn) > (cur[0], cur[1]):
                expected[k] = (ts, lsn, op, text)
        expected = {
            k: (lsn, text)
            for k, (ts, lsn, op, text) in expected.items()
            if op != "D"
        }

        got = {
            (r["conv_id"], r["turn_idx"]): (r["lsn"], r["text"])
            for r in lww_state(make_events(spark, stream)).collect()
        }
        assert got == expected, f"seed {seed}"
