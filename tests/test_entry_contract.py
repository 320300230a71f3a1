"""Driver-contract invariants for __spark_entry__ (no Spark needed).

The driver grades each queries() entry against its oracle_sql() SQL; a
query without an oracle silently downgrades to a rows-only check. This
test makes that downgrade impossible to ship by accident.
"""

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(q) <= set(o), f"oracle-less queries: {set(q) - set(o)}"


def test_queries_are_callables_with_driver_signature():
    import inspect

    for name, fn in entry.queries().items():
        assert callable(fn), name
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, (name, params)  # (spark, sf_dir)


def test_oracles_are_nonempty_sql_strings():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_alias_oracles_point_at_existing_sources():
    # alternative-engine-path entries share their source's literals; a
    # typo'd source name would silently produce a KeyError at driver time
    for alias, src in entry._ORACLE_ALIASES.items():
        assert alias in entry.queries(), alias
        assert src in entry.queries(), (alias, src)
