"""Scalar functions F1-F14 (SURVEY.md §2.8) — all JVM-side built-ins,
inside whole-stage codegen; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query


def artifact_key(
    prefix_id: Column, entity_id: Column, ts: Column, suffix: str
) -> Column:
    """K3/F1/F2: deterministic artifact key
    ``{prefix}/{entity}_{yyyyMMddHHmmss}{suffix}``.

    The reference's format string (main.py:142) is buggy — strftime
    ``%Y%M%d%H%m%S`` swaps month/minute (%M is minute, %m is month).
    We implement the *intended* semantics (year month day hour minute
    second); divergence documented here and in tests.
    """
    return F.concat(
        prefix_id.cast("string"),
        F.lit("/"),
        entity_id.cast("string"),
        F.lit("_"),
        F.date_format(ts, "yyyyMMddHHmmss"),
        F.lit(suffix),
    )


@query(
    "scalar_event_composite",
    oracle="""
    -- one-pass event-row scalar profile: key generation (F1/F2/K3),
    -- epoch round-trip (F3), JSON decode/encode (F9/F10), map
    -- introspection and regex (EXT) over a single scan.
    SELECT event_id,
           user_id::VARCHAR || '/' || event_id::VARCHAR || '_'
             || strftime(ts, '%Y%m%d%H%M%S') || '.tif' AS filename,
           user_id::VARCHAR || '/' || event_id::VARCHAR || '_'
             || strftime(ts, '%Y%m%d%H%M%S') || '_thumbnail.png'
             AS thumbnail_filename,
           epoch_ms(ts) AS ts_millis,
           epoch_ms(epoch_ms(ts)) AS ts_roundtrip,
           json_extract(props, '$.k')::INT AS k_value,
           to_json(struct_pack(event_type := event_type,
                               user_id := user_id)) AS encoded,
           len(json_keys(props))::INT AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_joined,
           regexp_extract(event_type, '([a-z]+)', 1) AS type_word
    FROM events WHERE event_type = 'view'
    """,
)
def scalar_event_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate composite for the event-row scalar families — the
    same expressions as scalar_string_keys / scalar_epoch_roundtrip /
    scalar_json_props / scalar_map_regex (which keep the granular API),
    computed in ONE narrow select over one scan. All JVM built-ins
    inside whole-stage codegen."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    props_map = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        artifact_key(F.col("user_id"), F.col("event_id"), F.col("ts"), ".tif").alias(
            "filename"
        ),
        artifact_key(
            F.col("user_id"), F.col("event_id"), F.col("ts"), "_thumbnail.png"
        ).alias("thumbnail_filename"),
        F.unix_millis("ts").alias("ts_millis"),
        F.timestamp_millis(F.unix_millis("ts")).alias("ts_roundtrip"),
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.to_json(F.struct("event_type", "user_id")).alias("encoded"),
        F.size(props_map).alias("n_keys"),
        F.concat_ws(",", F.array_sort(F.map_keys(props_map))).alias("keys_joined"),
        F.regexp_extract("event_type", "([a-z]+)", 1).alias("type_word"),
    )


@query(
    "scalar_part_composite",
    oracle="""
    -- one-pass part-row scalar profile: math extents / truncated
    -- thumbnail dims / thresholds (F6-F8) + URL building (F14).
    SELECT p_partkey,
           abs(p_retailprice - p_size) AS extent,
           (p_size // 7)::BIGINT AS thumb_w,
           (p_size * 20 // 7)::BIGINT AS thumb_h,
           (0.6 * 255)::INT AS white_threshold,
           round(p_retailprice / 7, 4) AS scaled,
           'https://example.com/api/part?id=' || p_partkey::VARCHAR
             || '&brand=' || replace(replace(p_brand, '#', '%23'), ' ', '+')
             || '&name=' || replace(replace(p_name, '#', '%23'), ' ', '+')
             AS download_url
    FROM part WHERE p_partkey % 25 = 0
    """,
)
def scalar_part_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate composite for the part-row scalar families — the
    same expressions as scalar_math_extents / scalar_url_build (which
    keep the granular API and the encoding notes), one scan."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 25 == 0)
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - F.col("p_size")).alias("extent"),
        F.floor(F.col("p_size") / 7).alias("thumb_w"),
        F.floor(F.col("p_size") * 20 / 7).alias("thumb_h"),
        F.lit(int(0.6 * 255)).alias("white_threshold"),
        F.round(F.col("p_retailprice") / 7, 4).alias("scaled"),
        F.concat(
            F.lit("https://example.com/api/part?id="),
            F.col("p_partkey").cast("string"),
            F.lit("&brand="),
            F.url_encode("p_brand"),
            F.lit("&name="),
            F.url_encode("p_name"),
        ).alias("download_url"),
    )


@query(
    "scalar_string_keys",
    oracle="""
    SELECT event_id,
           user_id::VARCHAR || '/' || event_id::VARCHAR || '_'
             || strftime(ts, '%Y%m%d%H%M%S') || '.tif' AS filename,
           user_id::VARCHAR || '/' || event_id::VARCHAR || '_'
             || strftime(ts, '%Y%m%d%H%M%S') || '_thumbnail.png'
             AS thumbnail_filename
    FROM events WHERE event_type = 'view'
    """,
)
def scalar_string_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2+K3: filename/key generation (main.py:141-148,313-317)."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    return ev.select(
        "event_id",
        artifact_key(F.col("user_id"), F.col("event_id"), F.col("ts"), ".tif").alias(
            "filename"
        ),
        artifact_key(
            F.col("user_id"), F.col("event_id"), F.col("ts"), "_thumbnail.png"
        ).alias("thumbnail_filename"),
    )


@query(
    "scalar_epoch_roundtrip",
    oracle="""
    SELECT event_id,
           epoch_ms(ts) AS ts_millis,
           epoch_ms(epoch_ms(ts)) AS ts_roundtrip
    FROM events WHERE event_type = 'signup'
    """,
)
def scalar_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: epoch-millis → timestamp decode (main.py:416-424 reads
    properties['system:time_start'] ms and divides by 1000)."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    return ev.select(
        "event_id",
        F.unix_millis("ts").alias("ts_millis"),
        F.timestamp_millis(F.unix_millis("ts")).alias("ts_roundtrip"),
    )


@query(
    "scalar_dates",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
           o_orderdate - INTERVAL 30 DAY AS lookback_start,
           date_part('year', o_orderdate)::INT AS order_year,
           date_part('month', o_orderdate)::INT AS order_month
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4+F5: ISO date strings (main.py:398,471) and the 30-day
    lookback arithmetic (main.py:45-46)."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 30 DAYS")).alias("lookback_start"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
    )


@query(
    "scalar_math_extents",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - p_size) AS extent,
           (p_size // 7)::BIGINT AS thumb_w,
           (p_size * 20 // 7)::BIGINT AS thumb_h,
           (0.6 * 255)::INT AS white_threshold,
           round(p_retailprice / 7, 4) AS scaled
    FROM part WHERE p_size >= 7
    """,
)
def scalar_math_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6+F7+F8: abs-extent (main.py:379-380), integer-truncated
    thumbnail dims ÷7 (main.py:290-292, main.py:40), int() thresholds
    (main.py:277)."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_size") >= 7)
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - F.col("p_size")).alias("extent"),
        F.floor(F.col("p_size") / 7).alias("thumb_w"),
        F.floor(F.col("p_size") * 20 / 7).alias("thumb_h"),
        F.lit(int(0.6 * 255)).alias("white_threshold"),
        F.round(F.col("p_retailprice") / 7, 4).alias("scaled"),
    )


@query(
    "scalar_json_props",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::INT AS k_value,
           to_json(struct_pack(event_type := event_type,
                               user_id := user_id)) AS encoded
    FROM events WHERE event_type = 'error'
    """,
)
def scalar_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9+F10: JSON-string properties — decode one field
    (properties['system:time_start'] analog, main.py:416) and encode a
    struct back to a JSON string (json.dumps analog, main.py:335)."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.to_json(F.struct("event_type", "user_id")).alias("encoded"),
    )


@query(
    "scalar_map_regex",
    oracle="""
    SELECT event_id,
           len(json_keys(props))::INT AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_joined,
           json_extract_string(props, '$.k') AS k_value,
           regexp_extract(event_type, '([a-z]+)', 1) AS type_word
    FROM events WHERE event_type = 'purchase' AND event_id % 10 = 0
    """,
)
def scalar_map_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT map + regex scalars (SURVEY §2.8): JSON-string properties
    parsed to MapType (the engine view of the reference's properties
    dict, main.py:134,335), map introspection (keys/size), and
    regexp_extract. The map itself never reaches the gate output —
    map cells are unhashable for the driver — only scalar derivations.
    """
    ev = read_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 10 == 0)
    )
    props_map = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.size(props_map).alias("n_keys"),
        F.concat_ws(",", F.array_sort(F.map_keys(props_map))).alias(
            "keys_joined"
        ),
        F.element_at(props_map, "k").alias("k_value"),
        F.regexp_extract("event_type", "([a-z]+)", 1).alias("type_word"),
    )


@query(
    "scalar_url_build",
    oracle="""
    -- DuckDB has no url_encode; the fixture values only contain
    -- spaces and '#', so form-encoding is mirrored by replacement
    -- (space -> '+', '#' -> '%23' — Spark's url_encode output).
    SELECT p_partkey,
           'https://example.com/api/part?id=' || p_partkey::VARCHAR
             || '&brand=' || replace(replace(p_brand, '#', '%23'), ' ', '+')
             || '&name=' || replace(replace(p_name, '#', '%23'), ' ', '+')
             AS download_url
    FROM part WHERE p_partkey % 25 = 0
    """,
)
def scalar_url_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: URL building (main.py:6 urlencode import, main.py:173
    getDownloadURL) — base + form-encoded query string, all native
    ``concat``/``url_encode`` expressions."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 25 == 0)
    return p.select(
        "p_partkey",
        F.concat(
            F.lit("https://example.com/api/part?id="),
            F.col("p_partkey").cast("string"),
            F.lit("&brand="),
            F.url_encode("p_brand"),
            F.lit("&name="),
            F.url_encode("p_name"),
        ).alias("download_url"),
    )


@query(
    "scalar_nested_arrays",
    oracle="""
    -- polygon = ring of [x, y, z] points built from order lines;
    -- drop the z coordinate (main.py:374-377 analog), then flatten to
    -- one scalar row per 2-D point for the hashable gate output.
    WITH geom AS (
        SELECT l_orderkey AS body_id,
               array_agg([l_quantity, l_discount * 100, l_tax * 100]
                         ORDER BY l_linenumber, l_quantity,
                                  l_discount * 100, l_tax * 100) AS ring
        FROM lineitem
        WHERE l_orderkey % 50 = 0
        GROUP BY l_orderkey
    ),
    flat AS (
        SELECT body_id, len(ring) AS n_points,
               unnest(list_transform(ring, p -> list_slice(p, 1, 2))) AS pt
        FROM geom
    )
    SELECT body_id, round(pt[1], 6) AS x, round(pt[2], 6) AS y, n_points
    FROM flat
    """,
)
def scalar_nested_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12+F13: nested-array geometry manipulation — build
    ring-of-points arrays, drop the z coordinate with a nested
    ``transform``+``slice`` (exact shape of main.py:374-377), all
    JVM-side array HOFs. The gate output is exploded to one scalar row
    per 2-D point (driver hasher can't factorize nested lists); the
    ring-building stays the internal API."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    geom = li.groupBy(F.col("l_orderkey").alias("body_id")).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "l_linenumber",
                        F.array(
                            F.col("l_quantity"),
                            F.col("l_discount") * 100,
                            F.col("l_tax") * 100,
                        ).alias("p"),
                    )
                )
            ),
            lambda s: s["p"],
        ).alias("ring")
    )
    return (
        geom.select(
            "body_id",
            F.size("ring").alias("n_points"),
            F.explode(
                F.transform("ring", lambda p: F.slice(p, 1, 2))
            ).alias("pt"),
        )
        .select(
            "body_id",
            F.round(F.col("pt")[0], 6).alias("x"),
            F.round(F.col("pt")[1], 6).alias("y"),
            "n_points",
        )
    )


@query(
    "scalar_stable_ids",
    oracle="""
    -- deterministic surrogate-key minting for a dimension load: a
    -- UUID-formatted stable id from the namespaced md5 of the natural
    -- key, a 16-bucket partition assignment from the hash tail, and
    -- an IBAN-style mod-97 check digit — all pure hash/string ops any
    -- engine reproduces, so re-runs and backfills mint IDENTICAL keys
    -- (the property sequence-based surrogate keys lack).
    WITH h AS (
        SELECT c_custkey, c_name,
               md5('customer:' || c_custkey::VARCHAR) AS hx
        FROM customer
    )
    SELECT c_custkey, c_name,
           substring(hx, 1, 8) || '-' || substring(hx, 9, 4) || '-'
             || substring(hx, 13, 4) || '-' || substring(hx, 17, 4)
             || '-' || substring(hx, 21, 12) AS stable_uuid,
           (('0x' || substring(hx, 1, 15))::BIGINT % 16)::INT AS bucket,
           (97 - (('0x' || substring(hx, 1, 15))::BIGINT % 97))::INT
               AS check_digits
    FROM h
    """,
)
def scalar_stable_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate-key minting — the idempotent
    alternative to sequence/identity columns for dimension loads at
    scale: UUID-formatted id from the namespaced content hash (re-runs
    and parallel backfills mint the same key, no coordination), a
    hash-tail partition bucket, and an IBAN-style mod-97 check so
    downstream systems can validate keys without a lookup.

    Plan: pure narrow hash/string expressions — scan speed, no
    shuffle, whole-stage codegen."""
    c = read_table(spark, sf_dir, "customer")
    hx = F.md5(F.concat(F.lit("customer:"), F.col("c_custkey").cast("string")))
    h60 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    uuid_fmt = F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.substring(hx, 13, 4),
        F.substring(hx, 17, 4),
        F.substring(hx, 21, 12),
    )
    return c.select(
        "c_custkey",
        "c_name",
        uuid_fmt.alias("stable_uuid"),
        (h60 % 16).cast("int").alias("bucket"),
        (97 - (h60 % 97)).cast("int").alias("check_digits"),
    )
