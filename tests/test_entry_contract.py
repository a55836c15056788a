"""Driver-contract guard: entry() runs, queries()/oracle_sql() agree on a
fast subset vs DuckDB at sf0.001 (the full sweep lives in
tools/check_oracles.py and is run against sf0.01 out of band)."""

import os

import duckdb
import pytest

import __spark_entry__ as E
from tools.check_oracles import TABLES, canon

SF_DIR = "/root/testdata/sf0.001"

# cheap, high-signal subset — one per operator family
FAST_QUERIES = [
    "count_by_kind",
    "sessionize_part_index",
    "forward_fill",
    "asof_fallback_join",
    "bit_test_result",
    "dedup_by_hash",
    "tpch_q1_agg",
    "graph_edges",
    "graph_degrees",
    "token_stats",
    "quality_score",
    "doc_fingerprint",
    "ann_cosine_topk",
    # round-3 families, one cheap representative each
    "chunk_plan",
    "temperature_mix_sample",
    "weighted_sample_docs",
    "sq8_codes",
    "directed_triads",
    "csr_gap_histogram",
    "hard_negatives",
    # round-4 additions
    "linkpred_auc",
]


def test_linkpred_auc_invariants(spark):
    """Mann-Whitney identities: U2 in [0, 2*n_pos*n_neg] (so AUC in [0,1])
    and both classes non-empty at the gate scale."""
    row = E.queries()["linkpred_auc"](spark, SF_DIR).collect()[0]
    assert row.n_pos > 0 and row.n_neg > 0
    assert 0 <= row.u2 <= 2 * row.n_pos * row.n_neg
    assert 0.0 <= row.auc <= 1.0


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) == 20
    assert [f.name for f in df.schema.fields] == ["id", "rank", "rn"]


# round 2 closed the rows-only set: the LSH hyperplanes are reproduced in
# SQL from the same md5 derivation, and the media decode recipe has a
# closed-form ground truth — every query now has a full oracle twin
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle_or_is_declared(spark):
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles).issubset(set(qs))
    assert set(qs) - set(oracles) == ROWS_ONLY


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    got = canon(E.queries()[name](spark, SF_DIR).toPandas())
    exp = canon(duck.sql(E.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    assert got.equals(exp)
