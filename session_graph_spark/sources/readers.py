"""Platform source readers (SURVEY.md §2.1 S1-S5): each normalizes one
platform's export format into the canonical turns shape
(conv_id, turn_idx, role, text, tool, ts, platform, source_file).

Reference parsers being re-expressed (behavior, not code):
- Claude Code JSONL: pipeline/jsonl_to_rdf.py:58-142 — line-per-message,
  content is a tagged union (plain string | list of text/tool_use/
  tool_result/thinking blocks; thinking dropped).
- DeepSeek export: pipeline/deepseek_to_rdf.py:89-162 — conversation
  `mapping` tree; we order by timestamp instead of re-walking the DFS
  (equivalent for linear chats, documented deviation for forks).
- Grok export: pipeline/grok_to_rdf.py:83-180 — Mongo-export JSON with
  $date/$numberLong timestamps, sender 'human' -> user.

All parsing is JVM-side (spark.read.text + from_json / get_json_object);
malformed lines are dropped like the reference's try/except-continue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, StringType, StructField, StructType)

TURNS_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts",
                 "platform", "source_file"]

_BLOCK = StructType([
    StructField("type", StringType()),
    StructField("text", StringType()),
    StructField("name", StringType()),
    StructField("id", StringType()),
    StructField("tool_use_id", StringType()),
])

_CLAUDE_SCHEMA = StructType([
    StructField("type", StringType()),
    StructField("uuid", StringType()),
    StructField("parentUuid", StringType()),
    StructField("timestamp", StringType()),
    StructField("sessionId", StringType()),
    StructField("message", StructType([
        StructField("content", ArrayType(_BLOCK)),
        StructField("model", StringType()),
    ])),
])


def read_claude_code_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S1+P1+W1: Claude Code JSONL -> turns."""
    raw = spark.read.text(path).withColumn("source_file", F.input_file_name())
    j = raw.withColumn("rec", F.from_json("value", _CLAUDE_SCHEMA))
    j = j.where(F.col("rec.type").isin("user", "assistant"))
    blocks = F.col("rec.message.content")
    # bracket access, not attribute access: Column.name is a method and
    # shadows struct-field resolution inside higher-order lambdas
    text_from_blocks = F.array_join(
        F.transform(F.filter(blocks, lambda b: b["type"] == "text"), lambda b: b["text"]),
        "\n",
    )
    # content union: when blocks failed to parse, the content was a plain
    # JSON string -> pull it straight out of the raw line
    text_plain = F.get_json_object("value", "$.message.content")
    # try_element_at: ANSI mode makes element_at throw on empty arrays
    tool_col = F.try_element_at(
        F.transform(F.filter(blocks, lambda b: b["type"] == "tool_use"), lambda b: b["name"]),
        F.lit(1),
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "uuid")
    return (
        j.select(
            F.col("rec.sessionId").alias("conv_id"),
            F.col("rec.type").alias("role"),
            F.coalesce(
                F.when(blocks.isNotNull(), text_from_blocks), text_plain, F.lit("")
            ).alias("text"),
            tool_col.alias("tool"),
            F.to_timestamp("rec.timestamp").alias("ts"),
            F.col("rec.uuid").alias("uuid"),
            "source_file",
        )
        .where(F.col("conv_id").isNotNull())
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumn("platform", F.lit("claude-code"))
        .select(*TURNS_COLUMNS)
    )


_DEEPSEEK_SCHEMA = ArrayType(StructType([
    StructField("id", StringType()),
    StructField("title", StringType()),
    StructField("mapping", StringType()),  # nested map parsed in 2nd pass
]))

_DS_NODE = StructType([
    StructField("message", StructType([
        StructField("fragments", ArrayType(StructType([
            StructField("type", StringType()),
            StructField("content", StringType()),
        ]))),
        StructField("inserted_at", StringType()),
    ])),
    StructField("parent", StringType()),
    StructField("children", ArrayType(StringType())),
])


def read_deepseek_json(spark: SparkSession, path: str) -> DataFrame:
    """S2+S5: DeepSeek conversations.json -> turns. Fragments typed
    REQUEST (user) / RESPONSE (assistant); THINK dropped (reference
    deepseek_to_rdf.py:111-121). Turn order: message timestamp (stable
    tiebreak on node id)."""
    raw = spark.read.option("multiLine", "true").text(path)
    convs = raw.select(F.explode(F.from_json("value", _DEEPSEEK_SCHEMA)).alias("c"))
    nodes = convs.select(
        F.col("c.id").alias("conv_id"),
        F.explode(
            F.from_json(F.col("c.mapping"), f"map<string,{_DS_NODE.simpleString()}>")
        ).alias("node_id", "node"),
    )
    frags = nodes.select(
        "conv_id", "node_id",
        F.to_timestamp(F.col("node.message.inserted_at")).alias("ts"),
        F.explode(F.col("node.message.fragments")).alias("f"),
    ).where(F.col("f.type").isin("REQUEST", "RESPONSE"))
    w = Window.partitionBy("conv_id").orderBy("ts", "node_id")
    return (
        frags.select(
            "conv_id",
            F.when(F.col("f.type") == "REQUEST", "user").otherwise("assistant").alias("role"),
            F.col("f.content").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            "ts", "node_id",
        )
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumn("platform", F.lit("deepseek"))
        .withColumn("source_file", F.lit(path))
        .select(*TURNS_COLUMNS)
    )


_GROK_SCHEMA = StructType([
    StructField("conversations", ArrayType(StructType([
        StructField("conversation", StructType([
            StructField("_id", StructType([StructField("$oid", StringType())])),
        ])),
        StructField("responses", ArrayType(StructType([
            StructField("response", StructType([
                StructField("sender", StringType()),
                StructField("message", StringType()),
                StructField("create_time", StructType([
                    StructField("$date", StructType([
                        StructField("$numberLong", StringType()),
                    ])),
                ])),
            ])),
        ]))),
    ]))),
])


def read_grok_json(spark: SparkSession, path: str) -> DataFrame:
    """S3: Grok Mongo-export JSON -> turns ('human' -> user, epoch-millis
    timestamps; reference grok_to_rdf.py:50-80,172-180)."""
    raw = spark.read.option("multiLine", "true").text(path)
    j = raw.select(F.from_json("value", _GROK_SCHEMA).alias("r"))
    conv = j.select(F.explode("r.conversations").alias("c"))
    resp = conv.select(
        F.col("c.conversation._id.$oid").alias("conv_id"),
        F.explode("c.responses").alias("resp"),
    )
    w = Window.partitionBy("conv_id").orderBy("ts")
    return (
        resp.select(
            "conv_id",
            F.when(F.col("resp.response.sender") == "human", "user")
            .otherwise("assistant").alias("role"),
            F.col("resp.response.message").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_millis(
                F.col("resp.response.create_time.$date.$numberLong").cast("long")
            ).alias("ts"),
        )
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumn("platform", F.lit("grok"))
        .withColumn("source_file", F.lit(path))
        .select(*TURNS_COLUMNS)
    )


def warp_turns(queries_df: DataFrame, min_exchanges: int = 5,
               min_text_chars: int = 30) -> DataFrame:
    """S4+P2+P10: Warp ai_queries rows (exported from SQLite to a
    DataFrame: conversation_id, exchange_id, start_ts, input, output,
    working_directory, model_id) -> turns. Keeps only conversations with
    >= min_exchanges substantive exchanges (reference warp_to_rdf.py:
    264-314); 'input' is a JSON array whose Query.text items are joined."""
    q = queries_df.withColumn(
        "user_text",
        F.array_join(
            F.transform(
                F.filter(
                    F.from_json("input", "array<struct<Query:struct<text:string>>>"),
                    lambda x: x.Query.isNotNull(),
                ),
                lambda x: x.Query.text,
            ),
            "\n",
        ),
    )
    substantive = (
        q.groupBy("conversation_id")
        .agg(F.sum(F.when(F.length("user_text") > min_text_chars, 1).otherwise(0))
             .alias("n_sub"))
        .where(F.col("n_sub") >= min_exchanges)
        .select("conversation_id")
    )
    q = q.join(F.broadcast(substantive), "conversation_id", "left_semi")
    user = q.select(
        F.col("conversation_id").alias("conv_id"),
        F.lit("user").alias("role"),
        F.col("user_text").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp("start_ts").alias("ts"),
        F.lit(0).alias("sub_order"),
    )
    asst = q.where(F.col("output").isNotNull()).select(
        F.col("conversation_id").alias("conv_id"),
        F.lit("assistant").alias("role"),
        F.col("output").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp("start_ts").alias("ts"),
        F.lit(1).alias("sub_order"),
    )
    both = user.unionByName(asst)
    w = Window.partitionBy("conv_id").orderBy("ts", "sub_order")
    return (
        both.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumn("platform", F.lit("warp"))
        .withColumn("source_file", F.lit("warp.sqlite"))
        .select(*TURNS_COLUMNS)
    )


def union_platforms(*turns: DataFrame) -> DataFrame:
    """U-op: union normalized platform outputs into the single turns table."""
    out = turns[0]
    for t in turns[1:]:
        out = out.unionByName(t)
    return out
