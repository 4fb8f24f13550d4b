from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
FIXTURES = str(REPO / "tests" / "fixtures")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from templatedb_spark.session import EngineConfig, build_session

    warehouse = tmp_path_factory.mktemp("warehouse")
    s = build_session(
        EngineConfig(
            master="local[8]",
            shuffle_partitions=8,
            extra={"spark.sql.warehouse.dir": str(warehouse)},
        )
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from templatedb_spark.catalog import SF_TABLES

    for t in SF_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return con


@pytest.fixture
def engine(spark):
    # function-scoped: the slt runner (test_slt_runner.py) clears the temp-view
    # namespace per file, so each consumer re-registers the fixture views
    # (createOrReplaceTempView — cheap, lazy).
    from templatedb_spark.engine import Engine

    eng = Engine(spark)
    eng.register_csv_dir(FIXTURES)
    return eng


def normalize_pdf(pdf) -> list[tuple]:
    """Shared order-insensitive normalization (same rules as tools/check_oracle)."""
    import math

    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for row in pdf.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{v:.10g}")
            elif hasattr(v, "isoformat"):
                vals.append(str(v)[:19])
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    rows.sort()
    return rows
