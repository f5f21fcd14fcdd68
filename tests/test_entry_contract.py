"""Driver-contract smoke tests: entry() returns rows with a stable
schema; every oracle key has a matching query; a sample of queries runs
at sf0.001."""

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs = entry.queries()
    missing = set(entry.oracle_sql()) - set(qs)
    assert not missing


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert set(df.columns) == {"url", "text", "n_spans", "error"}
    rows = df.collect()
    assert len(rows) >= 100
    kant = [r for r in rows if r.url.endswith("kant-0020")]
    assert kant and kant[0].n_spans == 4


def test_sample_queries_run(spark):
    qs = entry.queries()
    for name in ("dedup_exact", "token_stats", "ann_topk_brute", "events_window"):
        df = qs[name](spark, SF_DIR)
        assert df.count() > 0, name


def test_goldens_fresh():
    """Committed golden parquet must match a fresh pure-Python
    regeneration — catches stale goldens after datagen/kernel changes."""
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, "tools")
    import gen_goldens

    for name, fresh in gen_goldens.build_tables(gen_goldens.N_DOCS_SF001).items():
        committed = pq.read_table(gen_goldens.golden_path(name))
        assert committed.equals(fresh), f"stale golden: {name} — rerun tools/gen_goldens.py"
    for name, fresh in gen_goldens.build_operator_tables().items():
        committed = pq.read_table(gen_goldens.ops_golden_path(name))
        assert committed.equals(fresh), f"stale golden: {name} — rerun tools/gen_goldens.py"


def test_oracle_sql_is_valid_duckdb():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    for name, sql in entry.oracle_sql().items():
        n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        assert n >= 0, name
