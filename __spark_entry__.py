"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      -> flagship query: the full 4-stage KG pipeline over the
                     sf0.001 documents corpus, returning the triples DataFrame.
queries()         -> one callable per implemented operator (SURVEY.md §2).
oracle_sql()      -> matching DuckDB SQL for every SQL-expressible operator.

All logic lives in ht_ner_spark.contract; this file is the stable driver
interface.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ht_ner_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline (mentions -> linking -> CC -> triples) on
    /root/testdata/sf0.001 documents, adapted to the Iceberg corpus shape."""
    from ht_ner_spark.corpus import load_documents
    from ht_ner_spark.pipeline import PipelineConfig, run

    corpus = load_documents(spark, "/root/testdata/sf0.001")
    wh = tempfile.mkdtemp(prefix="htner_entry_")
    cfg = PipelineConfig(warehouse=wh, run_id="entry", gazetteer=contract.GAZ_Q)
    return run(spark, corpus, cfg)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
