"""Structured Streaming over incoming WARC/page shards.

The reference has no streaming runtime (SURVEY.md §2.14) — its batch
CLI polls sources. Here the same extraction kernel runs unchanged under
Structured Streaming: new parquet files landing in a directory are one
micro-batch each; checkpointing gives exactly-once file-sink semantics,
which subsumes the north rule's resume-from-checkpoint requirement in
streaming form (the batch path uses the bucket manifest in pipeline.py).

Scale notes: maxFilesPerTrigger bounds micro-batch size so executor
memory stays flat; the kernel stage parallelism follows the source file
partitioning (no shuffle needed in-stream — extraction is row-local).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from .kernel import OUTPUT_SCHEMA, KernelOptions, make_kernel

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def read_page_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream of page shards (new parquet files under path)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(stream_df: DataFrame, options: dict | None = None) -> DataFrame:
    """Apply the extraction kernel to a streaming DataFrame. mapInPandas
    is stateless row-local work, so it is fully streaming-compatible."""
    kernel = make_kernel(KernelOptions(options or {}))
    cols = [c for c in ("url", "warc_ts", "html", "lang") if c in stream_df.columns]
    return stream_df.select(*cols).mapInPandas(kernel, OUTPUT_SCHEMA)


def start_extraction_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    options: dict | None = None,
    max_files_per_trigger: int = 4,
):
    """readStream → kernel → parquet writeStream with checkpointing.
    Returns the StreamingQuery; call .processAllAvailable() in tests or
    .awaitTermination() in production."""
    stream = read_page_stream(spark, input_path, max_files_per_trigger)
    extracted = extract_stream(stream, options)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )


def start_quality_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
):
    """Windowed per-language throughput/quality aggregation with a
    watermark for late shards — demonstrates stateful streaming over the
    extraction output. Returns (query, memory sink name)."""
    stream = read_page_stream(spark, input_path)
    agg = (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("lang"))
        .agg(
            F.count("*").alias("n_pages"),
            F.avg(F.length("text")).alias("avg_text_len"),
        )
    )
    name = "quality_stream"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    return query, name
