"""Catalog-wide partition-invariance sweep (round-9 verdict item #5).

Every catalog query must produce IDENTICAL values (order-insensitive hash,
the gate's own hasher) at spark.sql.shuffle.partitions ∈ {1, 7, 32} — the
property that proves no operator silently depends on partitioning: no
first()-per-partition, no spark_partition_id in a result column, no
accumulation order leaking through un-rounded floats, no window missing a
total order.

Runs at sf0.001 for cheapness; the per-query property is partition-count
invariance, not oracle parity (the gate covers that).  Queries whose
CONTRACT is partition-shaped are excluded with the reason stated — an
exclusion here without a comment is a bug.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_correctness import value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
PARTITION_SETTINGS = ("1", "7", "32")

# contract-level exclusions (each with its reason; keep this list SHORT —
# an entry here is a documented design decision, not an escape hatch)
EXCLUDED: dict[str, str] = {}


def _all_query_names():
    import __spark_entry__ as e

    return sorted(e.queries())


@pytest.fixture(scope="module")
def catalog():
    import __spark_entry__ as e

    return e.queries()


@pytest.mark.parametrize("name", _all_query_names())
def test_partition_invariant(spark, catalog, name):
    if name in EXCLUDED:
        pytest.skip(EXCLUDED[name])
    old = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = {}
    try:
        for n in PARTITION_SETTINGS:
            spark.conf.set("spark.sql.shuffle.partitions", n)
            df = catalog[name](spark, SF_DIR)
            rows = [tuple(r) for r in df.collect()]
            hashes[n] = (len(rows), value_hash(list(df.columns), rows))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert hashes["1"] == hashes["7"] == hashes["32"], (
        f"{name} changes with shuffle.partitions: "
        + ", ".join(f"{k}->{v}" for k, v in hashes.items())
    )
