from __future__ import annotations

import pytest

from text_extraction_system_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_df(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def docs_rows(docs_df):
    return [(str(r["doc_id"]), r["text"]) for r in docs_df.select("doc_id", "text").collect()]
