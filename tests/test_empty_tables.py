"""Graceful degradation: every registry entry must run (returning zero
or more rows, never raising) against structurally-valid EMPTY tables —
the 0-doc corpus a fresh deployment or an aggressive upstream filter
produces.  Caught in round 3: None+1 on max() scalars, float(None)
avgdl, and a schema-less postings table from an empty partitioned
write."""

import os

import pytest


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_empty"))
    src = "/root/testdata/sf0.001"
    for tname in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        spark.read.parquet(os.path.join(src, tname + ".parquet")).limit(
            0
        ).write.mode("overwrite").parquet(os.path.join(d, tname + ".parquet"))
    return d


def test_every_registry_entry_survives_empty_tables(spark, empty_dir):
    from codegraph_rust_spark.functions import registry

    fails = []
    for name, fn in registry.queries().items():
        try:
            fn(spark, empty_dir).count()
        except Exception as e:  # noqa: BLE001 — collecting all failures
            fails.append(f"{name}: {type(e).__name__}: {str(e).splitlines()[0][:90]}")
    assert not fails, "\n".join(fails)
