"""Shared staged-directory stream reader.

Every streaming front door in this package reads a staged directory of
parquet files with an explicit schema and an optional
``maxFilesPerTrigger`` bound (which, with availableNow, splits a
backlog into several micro-batches — how the stream==batch tests force
multi-batch delivery). The per-table readers (events/documents/
embeddings) are thin wrappers over this one."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_staged_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
