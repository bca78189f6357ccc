"""Driver-canonicalization contract test (VERDICT r4 "Next round" #2).

The per-round driver compares Spark results to the DuckDB oracle through
*pandas*: DuckDB ``fetchdf()`` on the oracle side, a pandas frame on the
Spark side, then a canonicalizer that sorts columns by name, sorts rows
with ``DataFrame.sort_values`` over all columns, and hashes the stringified
values. ``tools/check_correctness.py`` compares through ``fetchall()``
(native Python values), which is blind to two pandas-only failure classes
that cost driver rounds r4:

* DuckDB integer ``sum()`` / window-sum returns HUGEINT, which ``fetchdf``
  downcasts to float64 — so the driver hashes ``"1234.0"`` against Spark's
  ``"1234"`` (the ``sequence_packing`` r4 red row);
* a list-typed column cannot be factorized by ``sort_values`` at all —
  the driver errors out before comparing (the ``order_items_array`` r4
  red row).

This test reproduces the driver's pandas path exactly — ``fetchdf()`` +
column-name sort + ``sort_values`` over every column + ``str()`` value
hash — over every oracle-checkable catalog query at sf0.001, so both
classes fail in pytest instead of a judge round.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _fmt(v) -> str:
    # Deliberately dtype-sensitive: str(1234) != str(1234.0). The driver's
    # canon hashes pandas values as-is, so an int-on-Spark / float-on-oracle
    # column MUST be a mismatch here, not silently normalized away.
    #
    # One observed exception: the driver DOES normalize date-vs-timestamp —
    # ``orders_by_month`` (Spark DateType → pandas object of datetime.date;
    # DuckDB DATE → fetchdf datetime64[us]) was driver hash-green r1–r4. So
    # a midnight-time timestamp canonicalizes to its date here too.
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0) and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def driver_canon_hash(pdf) -> str:
    """Mimic the driver's pandas canonicalizer.

    Sort columns by name, sort rows by every column (this is where a
    list-typed column raises ``TypeError: unhashable type: 'list'`` — the
    same failure the driver hit on ``order_items_array`` in r4), then hash
    stringified values. Any exception propagates: a frame the driver cannot
    canonicalize is a failure by definition.
    """
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    h = hashlib.sha256()
    for row in pdf.itertuples(index=False, name=None):
        h.update(("\x1f".join(_fmt(v) for v in row) + "\x1e").encode())
    return h.hexdigest()[:16]


@pytest.fixture(scope="module")
def oracle_con():
    from fastembed_rs_spark.queries import TABLES

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _oracle_query_names():
    from fastembed_rs_spark.queries import all_queries

    return [n for n, spec in all_queries().items() if spec.oracle is not None]


@pytest.mark.parametrize("name", _oracle_query_names())
def test_driver_canon_hash_match(name, spark, oracle_con):
    from fastembed_rs_spark.queries import all_queries

    spec = all_queries()[name]
    sdf = spec.spark(spark, SF_DIR).toPandas()
    odf = oracle_con.execute(spec.oracle).fetchdf()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} "
        f"oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{name}: rowcount spark={len(sdf)} oracle={len(odf)}"
    )

    hs = driver_canon_hash(sdf)
    ho = driver_canon_hash(odf)
    if hs != ho:
        # surface the first differing canonical row + per-column dtypes so
        # a HUGEINT/float64-style typing drift is diagnosable from the
        # pytest output alone
        dtypes = {
            c: (str(sdf[c].dtype), str(odf[c].dtype))
            for c in sorted(sdf.columns)
            if str(sdf[c].dtype) != str(odf[c].dtype)
        }
        pytest.fail(
            f"{name}: driver-canon hash {hs} != {ho}; "
            f"dtype drift (spark, oracle): {dtypes or 'none — value-level diff'}"
        )
