"""The bench's HEADLINE set must cover the catalog with zero silent
exclusions (round-10 verdict nit b) — this pins it so a new catalog
entry that forgets the bench list fails CI instead of silently dropping
out of the per-round performance record (exactly what happened to
q_guarded_join between rounds 10 and 11)."""

import importlib.util
import os


def _headline():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.HEADLINE


def test_headline_covers_every_catalog_query():
    import __spark_entry__ as entry

    headline = _headline()
    catalog = set(entry.queries())
    missing = catalog - set(headline)
    stale = set(headline) - catalog
    assert not missing, f"catalog queries absent from bench HEADLINE: {sorted(missing)}"
    assert not stale, f"bench HEADLINE names unknown queries: {sorted(stale)}"
    assert len(headline) == len(set(headline)), "duplicate HEADLINE entries"
