"""Driver-contract guards for __spark_entry__.py: shape invariants the
round harness depends on (no Spark session needed — pure structure)."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_queries_fit_the_driver_budget():
    """The round driver's CORRECTNESS file caps at 50 rows (r03 and r04
    both truncated at exactly 50, silently dropping the tail) — the query
    dict must never exceed it again."""
    qs = entry_mod.queries()
    assert len(qs) <= 50, f"{len(qs)} queries > 50-row driver budget"
    assert all(callable(fn) for fn in qs.values())


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without a queries() entry: {sorted(missing)}"
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())


def test_core_queries_run_first():
    """Defense in depth if the driver cap is ever time-based: the engine's
    identity (BCA co-occurrence, GloVe training) must precede the
    rows-only curation tail in dict order."""
    names = list(entry_mod.queries())
    assert names.index("bca_cooc") < 5
    assert names.index("glove_train_smoke") < 5
    assert names.index("dedup_minhash_lsh") > names.index("bca_cooc")
