"""Deferred PG type families (SURVEY.md §1.3 "defer" rows), closed out:
geometric, inet/cidr, money, bit strings, uuid, and XMLTABLE.

The reference implements these as first-class types with dedicated C
operator files; analytically they are all *representable* types whose
operators are scalar expressions, so the Spark-first mapping is plain
columns (double pairs, uint32-as-bigint, DECIMAL(18,2), bigint bit
fields, formatted strings) with Catalyst builtin expressions — no UDFs,
whole-stage codegen throughout.

Reference parity targets:
- geometric point/box ops:  src/backend/utils/adt/geo_ops.c
- inet/cidr/network ops:    src/backend/utils/adt/network.c
- money (cash) type:        src/backend/utils/adt/cash.c
- bit strings:              src/backend/utils/adt/varbit.c
- uuid:                     src/backend/utils/adt/uuid.c
- XMLTABLE / xpath:         src/backend/executor/nodeTableFuncscan.c,
                            src/backend/utils/adt/xml.c
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.registry import register, register_sql

# ---------------------------------------------------------------------------
# Geometric: point <->, box @> / && / area (geo_ops.c)
# ---------------------------------------------------------------------------
# Points are (x, y) double pairs derived deterministically from customer
# columns; the PG operators map to closed-form arithmetic:
#   point <-> point  = euclidean distance
#   box @> point     = range containment
#   box && box       = interval overlap on both axes
#   area(box)        = width * height (clipped intersection here)

register_sql(
    "scalar_geometric_ops",
    """
    WITH pts AS (
        SELECT c_custkey,
               CAST(c_acctbal AS DOUBLE) / 100.0          AS x,
               CAST(c_custkey % 97 AS DOUBLE)             AS y
        FROM customer
        WHERE c_custkey <= 300
    )
    SELECT c_custkey,
           round(sqrt(x * x + y * y), 6)                          AS dist_origin,
           round(abs(x - 50.0) + abs(y - 50.0), 6)                AS dist_manhattan,
           CAST(x BETWEEN 10 AND 60 AND y BETWEEN 20 AND 80
                AS INT)                                           AS in_box,
           CAST(x <= 60 AND x + 5 >= 10 AND
                y <= 80 AND y + 5 >= 20 AS INT)                   AS box_overlap,
           round(greatest(least(x + 5, 60.0) - greatest(x, 10.0), 0) *
                 greatest(least(y + 5, 80.0) - greatest(y, 20.0), 0),
                 6)                                               AS clip_area
    FROM pts
    ORDER BY c_custkey
    """,
    doc="Geometric point/box operators (geo_ops.c: point_distance, "
    "box_contain_pt, box_overlap, box_intersect area) as closed-form "
    "arithmetic over (x,y) double pairs.",
    tags=("pgtype", "scalar", "geometric"),
)

# ---------------------------------------------------------------------------
# inet / cidr (network.c)
# ---------------------------------------------------------------------------
# IPv4 as uint32-in-bigint. masklen/network/broadcast/containment are
# integer band arithmetic; `&` and `|` are portable Spark/DuckDB.  The
# dotted-quad parse is split_part + cast (1-based in both engines).

register_sql(
    "scalar_inet_ops",
    """
    WITH ips AS (
        SELECT c_custkey,
               concat('10.', CAST(c_custkey % 4 AS STRING), '.',
                      CAST((c_custkey * 7) % 256 AS STRING), '.',
                      CAST((c_custkey * 13) % 256 AS STRING))     AS ip,
               CAST(CASE c_custkey % 3 WHEN 0 THEN 8
                                       WHEN 1 THEN 16
                                       ELSE 24 END AS INT)        AS masklen
        FROM customer
        WHERE c_custkey <= 300
    ),
    parsed AS (
        SELECT c_custkey, ip, masklen,
               CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216 +
               CAST(split_part(ip, '.', 2) AS BIGINT) * 65536 +
               CAST(split_part(ip, '.', 3) AS BIGINT) * 256 +
               CAST(split_part(ip, '.', 4) AS BIGINT)             AS ipnum,
               4294967296 - CAST(power(2, 32 - masklen) AS BIGINT) AS mask
        FROM ips
    )
    SELECT c_custkey, ip, masklen,
           ipnum,
           ipnum & mask                                           AS network_num,
           (ipnum & mask) + CAST(power(2, 32 - masklen) AS BIGINT) - 1
                                                                  AS broadcast_num,
           concat(CAST(CAST(floor((ipnum & mask) / 16777216) AS BIGINT) AS STRING), '.',
                  CAST(CAST(floor((ipnum & mask) / 65536) AS BIGINT) % 256 AS STRING), '.',
                  CAST(CAST(floor((ipnum & mask) / 256) AS BIGINT) % 256 AS STRING), '.',
                  CAST((ipnum & mask) % 256 AS STRING))           AS network_addr,
           CAST((ipnum & 4294901760) = 167837696 AS INT)          AS in_10_1_0_0_16
    FROM parsed
    ORDER BY c_custkey
    """,
    doc="inet/cidr operators (network.c: inet_in, masklen, network, "
    "broadcast, `<<` containment) as uint32 band arithmetic; the dotted "
    "parse/format round-trips through split_part.",
    tags=("pgtype", "scalar", "inet"),
)

# ---------------------------------------------------------------------------
# money (cash.c)
# ---------------------------------------------------------------------------
# PG money = fixed-point cents. Mapping: DECIMAL(18,2) + exact decimal
# aggregation (same policy as the TPC-H monetary columns). cash_in's
# '$1,234.56' parse = strip '$' and ',', cast.

register_sql(
    "scalar_money_cash",
    """
    WITH raw AS (
        SELECT * FROM (VALUES
            ('$1,234.56'), ('$0.07'), ('$99,999.99'), ('$12.30'), ('$8,000.01')
        ) AS t(m)
    ),
    cash AS (
        SELECT m,
               CAST(replace(replace(m, '$', ''), ',', '') AS DECIMAL(18,2)) AS amt
        FROM raw
    )
    SELECT m, CAST(amt AS DOUBLE) AS amt,
           CAST(CAST(amt * 2 AS DECIMAL(18,2)) AS DOUBLE)      AS doubled,
           CAST(CAST(round(amt * 0.0825, 2) AS DECIMAL(18,2))
                AS DOUBLE)                                     AS tax,
           CAST(CAST(SUM(amt) OVER () AS DECIMAL(18,2))
                AS DOUBLE)                                     AS total
    FROM cash
    ORDER BY amt
    """,
    doc="money/cash type (cash.c: cash_in '$1,234.56' parse, cash_mul, "
    "rounding to cents) as exact DECIMAL(18,2) arithmetic.",
    tags=("pgtype", "scalar", "money"),
)

# ---------------------------------------------------------------------------
# bit strings (varbit.c)
# ---------------------------------------------------------------------------
# bit(16) fields as bigint values < 2^16: AND/OR/XOR/shift/bit_count and
# the bit-string text form via lpad(bin()). Spark uses shiftleft/
# shiftright/^; the oracle spells the same values with DuckDB's <</>>/
# xor() — the differential IS the semantics check.

register_sql(
    "scalar_bitstring_ops",
    """
    SELECT p_partkey,
           p_partkey % 65536                                 AS v,
           lpad(bin(p_partkey % 65536), 16, '0')             AS bits,
           CAST(bit_count(p_partkey % 65536) AS BIGINT)      AS n_ones,
           (p_partkey % 65536) & 43690                       AS band,
           (p_partkey % 65536) | 21845                       AS bor,
           (p_partkey % 65536) ^ 65535                       AS bxor,
           shiftleft(p_partkey % 65536, 2) % 65536           AS shl2,
           shiftright(p_partkey % 65536, 3)                  AS shr3,
           CAST(getbit(p_partkey % 65536, 3) AS BIGINT)      AS bit3
    FROM part
    WHERE p_partkey <= 300
    ORDER BY p_partkey
    """,
    oracle="""
    SELECT p_partkey,
           p_partkey % 65536                                 AS v,
           lpad(bin(p_partkey % 65536), 16, '0')             AS bits,
           CAST(bit_count(p_partkey % 65536) AS BIGINT)      AS n_ones,
           (p_partkey % 65536) & 43690                       AS band,
           (p_partkey % 65536) | 21845                       AS bor,
           xor(p_partkey % 65536, 65535)                     AS bxor,
           ((p_partkey % 65536) << 2) % 65536                AS shl2,
           (p_partkey % 65536) >> 3                          AS shr3,
           CAST(((p_partkey % 65536) >> 3) & 1 AS BIGINT)    AS bit3
    FROM part
    WHERE p_partkey <= 300
    ORDER BY p_partkey
    """,
    doc="bit-string operators (varbit.c: bit_and/or/xor, shifts, "
    "bit_count, text form) over bigint bit fields; Spark shiftleft/^/"
    "getbit vs DuckDB <</xor()/arithmetic differential.",
    tags=("pgtype", "scalar", "bitstring"),
)

# ---------------------------------------------------------------------------
# uuid (uuid.c)
# ---------------------------------------------------------------------------
# Deterministic name-based UUIDs (v5-shaped): md5 of the name with
# version/variant nibbles forced, formatted 8-4-4-4-12. gen_random_uuid
# maps to Spark's uuid() (nondeterministic — demonstrated in
# misc_row_ids); this query covers the formatting/ordering semantics.

register_sql(
    "scalar_uuid_format",
    """
    WITH h AS (
        SELECT n_nationkey, n_name, md5(concat('ns:', n_name)) AS hx
        FROM nation
    )
    SELECT n_nationkey, n_name,
           concat(substr(hx, 1, 8), '-', substr(hx, 9, 4), '-4',
                  substr(hx, 14, 3), '-8', substr(hx, 18, 3), '-',
                  substr(hx, 21, 12))                            AS uuid5,
           CAST(length(concat(substr(hx, 1, 8), '-', substr(hx, 9, 4),
                  '-4', substr(hx, 14, 3), '-8', substr(hx, 18, 3), '-',
                  substr(hx, 21, 12))) AS BIGINT)               AS uuid_len
    FROM h
    ORDER BY uuid5
    """,
    doc="uuid type (uuid.c): deterministic name-derived v5-shaped UUIDs "
    "with forced version/variant nibbles; ORDER BY uuid checks the "
    "lexicographic-sort parity both engines share for the text form.",
    tags=("pgtype", "scalar", "uuid"),
)

# ---------------------------------------------------------------------------
# XMLTABLE / xpath (nodeTableFuncscan.c, xml.c)
# ---------------------------------------------------------------------------
# Spark ships Hive's xpath functions (JVM-side, codegen'd). The XML is
# constructed deterministically from nation/region columns, so the
# DuckDB oracle (no XML support) recomputes the extracted values from
# the base columns — the differential checks that xpath really
# extracted what was encoded.


@register(
    "xml_xpath_table",
    oracle="""
    SELECT n.n_nationkey,
           n.n_name                          AS name,
           CAST(n.n_regionkey AS INT)        AS region_id,
           r.r_name                          AS region_name,
           CAST(2 AS INT)                    AS n_fields,
           lower(n.n_name)                   AS name_lower
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    ORDER BY n.n_nationkey
    """,
    doc="XMLTABLE (nodeTableFuncscan.c / xml.c xpath): shred XML built "
    "from nation rows via Hive xpath_string/xpath_int/xpath; oracle "
    "recomputes from the encoded base columns.",
    tags=("pgtype", "scalar", "xml"),
)
def xml_xpath_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        WITH x AS (
            SELECT n_nationkey,
                   concat('<nation><name>', n_name, '</name><region id="',
                          CAST(n_regionkey AS STRING), '">',
                          (SELECT r_name FROM region r
                            WHERE r.r_regionkey = n.n_regionkey),
                          '</region></nation>')                   AS xml
            FROM nation n
        )
        SELECT n_nationkey,
               xpath_string(xml, '/nation/name')                  AS name,
               CAST(xpath_int(xml, '/nation/region/@id') AS INT)  AS region_id,
               xpath_string(xml, '/nation/region')                AS region_name,
               CAST(size(xpath(xml, '/nation/*')) AS INT)         AS n_fields,
               lower(xpath_string(xml, '/nation/name'))           AS name_lower
        FROM x
        ORDER BY n_nationkey
        """
    )


# ---------------------------------------------------------------------------
# Spatial grid join (scale path for geometric containment)
# ---------------------------------------------------------------------------
# The naive point-in-box join is a nested-loop theta join — quadratic.
# The scale shape mirrors join_range_binned in 2-D: snap points to grid
# cells (map-only), explode each box into the cells it covers (tiny),
# equi-join on the cell, then verify exact containment. The oracle IS
# the naive theta join, proving the grid decomposition lossless.


@register(
    "join_spatial_grid",
    oracle="""
    WITH pts AS (
        SELECT c_custkey, CAST(c_acctbal AS DOUBLE) / 100.0 AS x,
               CAST(c_custkey % 97 AS DOUBLE) AS y
        FROM customer
    ),
    boxes AS (
        SELECT n_nationkey AS box_id,
               CAST((n_nationkey * 37) % 80 AS DOUBLE)      AS x0,
               CAST((n_nationkey * 53) % 80 AS DOUBLE)      AS y0,
               CAST((n_nationkey * 37) % 80 + 15 AS DOUBLE) AS x1,
               CAST((n_nationkey * 53) % 80 + 15 AS DOUBLE) AS y1
        FROM nation
    )
    SELECT b.box_id, count(*) AS n_points,
           min(p.c_custkey) AS min_cust, max(p.c_custkey) AS max_cust
    FROM boxes b JOIN pts p
      ON p.x >= b.x0 AND p.x <= b.x1 AND p.y >= b.y0 AND p.y <= b.y1
    GROUP BY b.box_id
    ORDER BY b.box_id
    """,
    doc="Spatial point-in-box join via grid binning (geo_ops.c "
    "box_contain_pt at scale): points snap to one 16x16 cell map-side, "
    "boxes explode into covered cells (bounded fan-out), cell equi-join "
    "+ exact containment verify. Replaces the quadratic nested-loop "
    "theta join with a broadcast/hash equi-join — the 2-D analog of "
    "join_range_binned. Oracle = the naive theta join (losslessness).",
    tags=("pgtype", "join", "geometric"),
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        WITH pts AS (
            SELECT c_custkey, CAST(c_acctbal AS DOUBLE) / 100.0 AS x,
                   CAST(c_custkey % 97 AS DOUBLE) AS y
            FROM customer
        ),
        boxes AS (
            SELECT n_nationkey AS box_id,
                   CAST((n_nationkey * 37) % 80 AS DOUBLE)      AS x0,
                   CAST((n_nationkey * 53) % 80 AS DOUBLE)      AS y0,
                   CAST((n_nationkey * 37) % 80 + 15 AS DOUBLE) AS x1,
                   CAST((n_nationkey * 53) % 80 + 15 AS DOUBLE) AS y1
            FROM nation
        ),
        box_cells AS (
            SELECT box_id, x0, y0, x1, y1, cx, cy
            FROM boxes
            LATERAL VIEW explode(sequence(CAST(floor(x0 / 16) AS INT),
                                          CAST(floor(x1 / 16) AS INT))) t1 AS cx
            LATERAL VIEW explode(sequence(CAST(floor(y0 / 16) AS INT),
                                          CAST(floor(y1 / 16) AS INT))) t2 AS cy
        ),
        pt_cells AS (
            SELECT c_custkey, x, y,
                   CAST(floor(x / 16) AS INT) AS cx,
                   CAST(floor(y / 16) AS INT) AS cy
            FROM pts
        )
        SELECT b.box_id, count(*) AS n_points,
               min(p.c_custkey) AS min_cust, max(p.c_custkey) AS max_cust
        FROM box_cells b JOIN pt_cells p ON b.cx = p.cx AND b.cy = p.cy
        WHERE p.x >= b.x0 AND p.x <= b.x1 AND p.y >= b.y0 AND p.y <= b.y1
        GROUP BY b.box_id
        ORDER BY b.box_id
        """
    )


# ---------------------------------------------------------------------------
# Longest-prefix-match inet routing join (network.c >>= at scale)
# ---------------------------------------------------------------------------
# PG users route IPs against CIDR tables with `ip << cidr` + a pick of
# the most specific match. The scale shape: expand each IP into its
# (masklen, network-prefix) candidates — one row per masklen present in
# the rule table, a bounded fan-out — then EQUI-join on
# (masklen, prefix) and keep the longest match per IP. No theta join,
# no per-rule scan; the rule side stays broadcastable.

register_sql(
    "join_inet_lpm",
    """
    WITH ips AS (
        SELECT c_custkey,
               (c_custkey % 4) * 65536 +
               ((c_custkey * 7) % 256) * 256 +
               ((c_custkey * 13) % 256) + 167772160 AS ipnum
        FROM customer
    ),
    rules AS (
        SELECT * FROM (VALUES
            (167772160, 8,  'corp-any'),
            (167837696, 16, 'dc1'),
            (167903232, 16, 'dc2'),
            (167839488, 24, 'dc1-rack7')
        ) AS r(prefix_num, masklen, label)
    ),
    cand_pre AS (
        SELECT c_custkey, 8  AS masklen, ipnum & 4278190080 AS prefix_num FROM ips
        UNION ALL
        SELECT c_custkey, 16, ipnum & 4294901760 FROM ips
        UNION ALL
        SELECT c_custkey, 24, ipnum & 4294967040 FROM ips
    ),
    best AS (
        SELECT c.c_custkey, max_by(r.label, r.masklen) AS label
        FROM cand_pre c
        JOIN rules r ON c.masklen = r.masklen AND c.prefix_num = r.prefix_num
        GROUP BY c.c_custkey
    )
    SELECT coalesce(b.label, 'unrouted') AS route,
           count(*) AS n_ips,
           min(i.c_custkey) AS sample_cust
    FROM ips i LEFT JOIN best b ON i.c_custkey = b.c_custkey
    GROUP BY coalesce(b.label, 'unrouted')
    ORDER BY route
    """,
    doc="Longest-prefix-match CIDR routing join (network.c `<<=` + most-"
    "specific pick): IPs expand to per-masklen prefix candidates "
    "(bounded fan-out = distinct masklens in the rule table), "
    "EQUI-joined on (masklen, prefix), max_by(label, masklen) keeps the "
    "most specific route — the GeoIP/firewall-table join as a "
    "broadcast hash join instead of a per-rule theta scan.",
    tags=("pgtype", "join", "inet"),
)


@register(
    "scalar_time_of_day",
    oracle="""
        WITH t AS (
            SELECT CAST(date_trunc('second', ts) AS TIME) AS tod
            FROM events
        )
        SELECT CAST(extract(hour FROM tod) AS BIGINT) AS hh,
               count(*) AS n,
               CAST(min(tod) AS VARCHAR) AS earliest,
               CAST(min(tod + INTERVAL 150 MINUTE) AS VARCHAR)
                   AS min_shifted,
               CAST(extract(epoch FROM max(tod))
                    - extract(epoch FROM min(tod)) AS BIGINT) AS span_s
        FROM t GROUP BY hh ORDER BY hh
    """,
    doc="time / time-of-day type (SURVEY §1.3 last deferred type; "
    "reference src/backend/utils/adt/date.c time_in/time_pl_interval): "
    "Spark has no TIME, so time-of-day is seconds-since-midnight BIGINT "
    "with interval addition as modular arithmetic — PG wraps time "
    "around midnight ('23:00' + 2h30m = '01:30'), reproduced by "
    "(tod + shift) % 86400; rendering through timestamp_seconds + "
    "date_format('HH:mm:ss') under the pinned-UTC session. DuckDB runs "
    "its native TIME type (also wrapping) as the oracle.",
    tags=("pgtype", "time", "scalar"),
)
def scalar_time_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from cloudberry_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    day = 86400
    tod = (
        F.floor(F.unix_micros(F.date_trunc("second", F.col("ts"))) / 1_000_000)
        % day
    ).alias("tod_s")
    base = ev.select(tod)
    shifted = (F.col("tod_s") + 150 * 60) % day

    def hms(col):
        return F.date_format(F.timestamp_seconds(col), "HH:mm:ss")

    return (
        base.select("tod_s", shifted.alias("shift_s"))
        .groupBy(F.floor(F.col("tod_s") / 3600).alias("hh"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            hms(F.min("tod_s")).alias("earliest"),
            hms(F.min("shift_s")).alias("min_shifted"),
            (F.max("tod_s") - F.min("tod_s")).alias("span_s"),
        )
        .orderBy("hh")
    )
