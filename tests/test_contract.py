"""Driver-contract guard: __spark_entry__ must expose entry/queries/
oracle_sql with matching keys, and entry must run on a BARE
SparkSession (the driver builds its own, without session.py's configs
— the TIMESTAMP(NANOS) regression hid exactly there)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_contract_shape():
    qs = entrymod.queries()
    orc = entrymod.oracle_sql()
    assert len(qs) >= 40
    assert set(orc) <= set(qs)
    # every query is oracle-checked except the deliberately rows-only
    # entries: sketches (engine-specific estimates; tests/test_sketches.py)
    # and the IVF pair (iterative k-means; tests/test_ivf.py pins recall
    # and served-vs-trained parity)
    assert set(qs) - set(orc) == {
        "sketch_cardinalities",
        "embed_ivf_topk",
        "embed_ivf_search",
        "embed_pq_search",  # k-means codebooks; tests/test_pq.py pins recall
        "embed_ivfpq_search",  # composed tiers; tests/test_ivfpq.py
    }
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in orc.values())


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 3
