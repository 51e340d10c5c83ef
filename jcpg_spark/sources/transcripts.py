"""Transcript sources (S1 analog — FileUtils.java:23-57 file-set scan).

Two readers:

- ``read_transcripts``: the production path — a parquet/Iceberg table already
  in the input_hint shape ``(conv_id, turn_idx, role, text, tool, ts)``.
  Plain ``spark.read.parquet``; Catalyst handles partition pruning and
  column pruning. (Iceberg runtime jars are not in this sandbox image;
  the reader seam is the place they plug in — see SURVEY §7.)

- ``transcripts_from_events``: deterministic adapter from the driver's
  ``events`` table (event_id, ts, user_id, event_type, value, props) to the
  transcript shape, used by the driver-facing correctness queries so the
  same operators can be checked against a DuckDB oracle over shared data.
  Users ≈ conversations; (ts, event_id) ordering ≈ turn order; event types
  map onto roles; the synthesized text embeds the event type as an entity
  surface so mention/linking/reference stages have real work to do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jcpg_spark import schema as S

# role mapping: 'signup'/'purchase' are agent actions, 'error' is a tool
# response, the rest are user activity.
ROLE_MAP = {"signup": "assistant", "purchase": "assistant", "error": "tool"}
TOOL_MAP = {"signup": "search", "purchase": "db"}

# Gazetteer over event vocabulary: event types are the entity surfaces;
# 'signup' and 'error' are state-defining (defs_state analog).
EVENTS_GAZETTEER = [
    # surface, canonical, namespace, kind, prior, defs_state — namespaces
    # partition the event vocabulary so the IMPORTS layer
    # (linking.import_triples) has real per-conversation variance
    ("signup", "ev_signup", "identity", "artifact", 0.9, True),
    ("purchase", "ev_purchase", "commerce", "artifact", 0.9, False),
    ("view", "ev_view", "web", "artifact", 0.9, False),
    ("click", "ev_click", "web", "artifact", 0.9, False),
    ("error", "ev_error", "sys", "system", 0.9, True),
]


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(S.TRANSCRIPT_SCHEMA).parquet(path)


def read_transcripts_jsonl(
    spark: SparkSession, path: str, nested: bool = False
) -> DataFrame:
    """JSONL transcript source: one JSON object per line, in either the
    flat per-turn shape ``{"conv_id", "turn_idx", "role", "text",
    "tool", "ts"}`` or — with ``nested=True`` — the shape agent logs
    actually ship in, one CONVERSATION per line with a ``turns`` array,
    exploded to the canonical schema.

    The schema is passed EXPLICITLY to the reader: JSON schema inference
    is a full extra pass over the input (a second 100-TB scan before the
    first real one), so a source reader at this scale must never rely on
    it. Timestamps parse from ISO-8601 strings via the schema's
    TimestampType; missing optional fields (tool, ts) are null per the
    canonical contract; malformed lines surface as all-null rows under
    Spark's default PERMISSIVE mode rather than killing a 10^12-turn
    ingest (tighten with .option("mode", "FAILFAST") upstream when the
    feed is trusted)."""
    from pyspark.sql import types as T

    if not nested:
        return spark.read.schema(S.TRANSCRIPT_SCHEMA).json(path)
    turn = T.StructType(
        [
            T.StructField("turn_idx", T.IntegerType(), True),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    sch = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), True),
            T.StructField("turns", T.ArrayType(turn), True),
        ]
    )
    df = spark.read.schema(sch).json(path)
    return df.select("conv_id", F.explode("turns").alias("t")).select(
        F.col("conv_id").cast("string"),
        F.col("t.turn_idx").cast("int").alias("turn_idx"),
        F.col("t.role").cast("string").alias("role"),
        F.col("t.text").cast("string").alias("text"),
        F.col("t.tool").cast("string").alias("tool"),
        F.col("t.ts").alias("ts"),
    )


def read_dictionary(spark: SparkSession, path: str) -> DataFrame:
    """Production dictionary source (S3): a parquet/CSV entity table in the
    DICTIONARY_SCHEMA shape. Reference analog: dictionary enrichment from
    an external source archive (``JavacpgDDGBuilder.java:163-256``,
    scanning jdk7-src.zip into methodDEFs). Missing optional columns are
    filled with defaults; defs_state nulls become False; duplicate
    (surface, canonical) rows are collapsed keeping the max prior —
    dictionary-sized data, so the dedup agg is trivial."""
    reader = spark.read
    if path.endswith(".csv"):
        df = reader.option("header", True).csv(path)
    else:
        df = reader.parquet(path)
    defaults = {
        "namespace": F.lit(None).cast("string"),
        "kind": F.lit(None).cast("string"),
        "prior": F.lit(0.5),
        "defs_state": F.lit(False),
    }
    for c, d in defaults.items():
        if c not in df.columns:
            df = df.withColumn(c, d)
    df = df.select(
        F.col("surface").cast("string"),
        F.col("canonical").cast("string"),
        F.col("namespace").cast("string"),
        F.col("kind").cast("string"),
        F.col("prior").cast("double"),
        F.coalesce(F.col("defs_state").cast("boolean"), F.lit(False)).alias("defs_state"),
    )
    return (
        df.groupBy("surface", "canonical")
        .agg(
            F.max("namespace").alias("namespace"),
            F.max("kind").alias("kind"),
            F.max("prior").alias("prior"),
            F.max("defs_state").alias("defs_state"),
        )
    )


def events_gazetteer(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(EVENTS_GAZETTEER, schema=S.DICTIONARY_SCHEMA)


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # Window by conv_id, not user_id (r6): conv_id = printf('u%06d',
    # user_id) is injective on non-negative ids, so the row_number is
    # identical — but every downstream layer (flow/calls/segment windows,
    # the fused emitter) partitions by conv_id, and keying THIS exchange
    # the same way lets Catalyst reuse it: the adapter's shuffle is the
    # only data-scale exchange in the whole flow/call/branch family
    # instead of user_id-keyed + conv_id-keyed back-to-back.
    ev = ev.withColumn("conv_id", F.format_string("u%06d", F.col("user_id")))
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    role = F.coalesce(
        *[F.when(F.col("event_type") == k, F.lit(v)) for k, v in ROLE_MAP.items()],
        F.lit("user"),
    )
    tool = F.coalesce(
        *[F.when(F.col("event_type") == k, F.lit(v)) for k, v in TOOL_MAP.items()],
        F.lit(None).cast("string"),
    )
    return ev.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.lit("event "), F.col("event_type"), F.lit(" observed value "),
            F.round(F.col("value")).cast("long").cast("string"),
        ).alias("text"),
        tool.alias("tool"),
        F.col("ts"),
    )
