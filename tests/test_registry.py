"""Registry-contract guards: the driver hash-verifies only the FIRST
50 entries of queries(), so _GATE_ORDER's size and resolvability are
part of the correctness gate, not a style choice."""

from magmapandas_spark.relational import suite


def test_gate_order_is_exactly_fifty():
    assert len(suite._GATE_ORDER) == 50


def test_gate_order_all_resolve_and_lead():
    q = suite.queries()
    missing = [g for g in suite._GATE_ORDER if g not in q]
    assert not missing, f"gate names with no queries() entry: {missing}"
    assert list(q)[:50] == suite._GATE_ORDER


def test_every_query_has_oracle_or_is_known_probe():
    """Only the two engine-specific production probes may lack an
    exact DuckDB twin; anything else without one is a regression."""
    q = suite.queries()
    o = suite.oracle_sql()
    rows_only = sorted(k for k in q if k not in o)
    assert rows_only == ["ivfpq_topk", "minhash_lsh_xxhash"]


def test_oracles_have_no_orphans():
    q = suite.queries()
    orphans = sorted(k for k in suite.oracle_sql() if k not in q)
    assert not orphans
