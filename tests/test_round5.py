"""Round-5 additions: ADVICE regression pins (QSTR operator-position parse
failure, top-level paren-balance diagnostics, FORK cache tracking) and the
BPE merge-loop lineage guard."""

from __future__ import annotations

import pytest


# ------------------------------------------------------------ ADVICE items


def test_qstr_operator_in_term_position_raises(spark):
    from sparksearch.esql import EsqlError, compile_esql

    df = spark.createDataFrame([(1, "alpha beta")], "id long, text string")

    for bad in ('AND foo', 'foo OR OR bar', 'NOT', 'foo AND (OR bar)'):
        with pytest.raises(EsqlError, match="operator .* in term position|unexpected end"):
            compile_esql(
                f'FROM t | WHERE QSTR(text, "{bad}") | KEEP id',
                tables={"t": df},
            )
    # the valid forms still parse (NOT prefix, parens, mixed case terms)
    got = sorted(
        r.id
        for r in compile_esql(
            'FROM t | WHERE QSTR(text, "alpha AND NOT (gamma OR delta)") | KEEP id',
            tables={"t": df},
        ).collect()
    )
    assert got == [1]


def test_split_stages_rejects_unbalanced_parens(spark):
    from sparksearch.esql import EsqlError, compile_esql

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(EsqlError, match="unbalanced '\\)'"):
        compile_esql("FROM t | STATS n = COUNT(*)) | LIMIT 1", tables={"t": df})
    with pytest.raises(EsqlError, match="unclosed"):
        compile_esql("FROM t | FORK (STATS n = COUNT(*)", tables={"t": df})


def test_fork_persist_is_tracked_capped_and_releasable(spark):
    from sparksearch import esql as E

    df = spark.createDataFrame([("a", 1.0), ("b", 20.0)], "g string, v double")
    E.release_cached_frames()
    q = (
        'FROM t | FORK (WHERE v > 5.0 | STATS hi = COUNT(*) BY g)'
        " (STATS n = COUNT(*))"
    )
    out = E.compile_esql(q, tables={"t": df})
    assert len(E._FORK_PERSISTED) == 1
    assert out.count() == 2  # 1 fork1 group row (only 'b' passes) + 1 fork2 row
    # compiling past the cap unpersists the oldest, never grows unbounded
    for _ in range(E._FORK_PERSIST_CAP + 3):
        E.compile_esql(q, tables={"t": df})
    assert len(E._FORK_PERSISTED) == E._FORK_PERSIST_CAP
    released = E.release_cached_frames()
    assert released == E._FORK_PERSIST_CAP
    assert not E._FORK_PERSISTED
    # released frames still compute correctly (cache loss only)
    assert out.count() == 2


# ---------------------------------------------------- BPE lineage guard


def test_bpe_merge_loop_flat_plans_at_64(spark, docs_sf0001):
    """Round-4 verdict item #5: the merge loop must survive a
    production-sized merge count — localCheckpoint every 16 rounds keeps
    the per-round analyzed plan O(1) (the chained-replace plan would
    otherwise nest once per round; persist() does NOT truncate lineage)."""
    from sparksearch.catalog_s11 import bpe_train_merges

    stats: dict = {}
    out = bpe_train_merges(spark, docs_sf0001, n_merges=64, stats_out=stats)
    rows = out.collect()
    assert len(rows) >= 32, len(rows)  # the corpus supports deep merging
    assert [r.merge_rank for r in rows] == list(range(1, len(rows) + 1))
    pc = stats["plan_chars"]
    # flat plans: no round's plan exceeds the first (pre-checkpoint) window's
    # peak by more than slack — unbounded nesting would grow without limit
    assert len(pc) == len(rows)
    assert max(pc) <= 1.5 * max(pc[:16]) + 500, (max(pc), max(pc[:16]))


def test_bpe_checkpoint_does_not_change_merges(spark, docs_sf0001):
    """The guard is an execution detail: merges with an aggressive
    checkpoint cadence equal the unguarded chain."""
    from sparksearch.catalog_s11 import bpe_train_merges

    a = bpe_train_merges(spark, docs_sf0001, n_merges=12,
                         checkpoint_every=5).collect()
    b = bpe_train_merges(spark, docs_sf0001, n_merges=12,
                         checkpoint_every=0).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ------------------------------------------------- ES|QL ENRICH (range)


def test_enrich_range_matches_python_mirror(spark):
    from sparksearch.esql import compile_esql
    from sparksearch.catalog_s12 import VALUE_TIERS, _tiers_df

    rows = [(i, round(v, 2)) for i, v in enumerate(
        [0.01, 0.05, 9.99, 10.0, 49.99, 50.0, 149.5, 150.0, 399.99, 400.0, 560.21]
    )]
    df = spark.createDataFrame(rows, "id long, value double")
    got = {
        r.id: (r.tier, r.tier_boost)
        for r in compile_esql(
            "FROM t | ENRICH value_tiers ON value WITH tier, tier_boost"
            " | KEEP id, tier, tier_boost",
            tables={"t": df, "value_tiers": _tiers_df(spark)},
        ).collect()
    }

    def mirror(v):
        for lo, hi, t, b in VALUE_TIERS:
            if lo <= v < hi:
                return (t, b)
        return (None, None)

    assert got == {i: mirror(v) for i, v in rows}
    # boundary semantics pinned: lo inclusive, hi exclusive
    assert got[1] == ("micro", 1) and got[3] == ("small", 2)
    assert got[0] == (None, None)  # below every range -> NULL enrichment


def test_enrich_range_plan_broadcasts_policy(spark):
    """The policy side must broadcast (BuildRight) — a shuffle or a
    cartesian of the big frame would not survive 100x scale."""
    from sparksearch.catalog_s12 import q_esql_events_enrich_range
    from conftest import SF_SMOKE

    df = q_esql_events_enrich_range(spark, str(SF_SMOKE))
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" in plan and "BuildRight" in plan
    assert "CartesianProduct" not in plan


def test_enrich_range_contract_errors(spark):
    import pytest as _pt

    from sparksearch.esql import EsqlError, compile_esql
    from sparksearch.catalog_s12 import _tiers_df

    df = spark.createDataFrame([(1, 5.0)], "id long, value double")
    tiers = _tiers_df(spark)
    with _pt.raises(EsqlError, match="unknown enrich policy"):
        compile_esql("FROM t | ENRICH nope ON value WITH tier", tables={"t": df})
    with _pt.raises(EsqlError, match="lacks range_lo"):
        compile_esql(
            "FROM t | ENRICH p ON value WITH tier",
            tables={"t": df, "p": tiers.drop("range_lo")},
        )
    with _pt.raises(EsqlError, match="absent from p"):
        compile_esql(
            "FROM t | ENRICH p ON value WITH nope",
            tables={"t": df, "p": tiers},
        )
    with _pt.raises(EsqlError, match="already in frame"):
        compile_esql(
            "FROM t | EVAL tier = 1 | ENRICH p ON value WITH tier",
            tables={"t": df, "p": tiers},
        )
    with _pt.raises(EsqlError, match="enrich field .* absent"):
        compile_esql(
            "FROM t | ENRICH p ON nope WITH tier",
            tables={"t": df, "p": tiers},
        )
