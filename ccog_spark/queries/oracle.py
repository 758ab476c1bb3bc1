"""DuckDB oracle SQL for every corpus query (SURVEY.md §2.3).

Dialect notes (vs the Spark implementations):
- DuckDB SUM(INTEGER) is HUGEINT and FLOOR/LENGTH/YEAR return
  DOUBLE/BIGINT — explicit CASTs align types with Spark.
- ``ts`` columns are TIMESTAMP_NS in DuckDB; CAST→TIMESTAMP (µs) is
  lossless on these fixtures and matches Spark's parquet read.
- Array math uses list_dot_product over DOUBLE[] casts, matching the
  engine's cast-before-multiply policy (functions.vectors).
- ``pixels``/``parts`` fixtures are generated inline by CTEs that are
  integer-arithmetic-identical to ccog_spark.raster.fixtures.
"""

from __future__ import annotations

from ccog_spark.raster.fixtures import PARTS_SQL_CTE, PIXELS_SQL_CTE

ORACLE: dict[str, str] = {}

ORACLE["q01"] = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05
ORDER BY l_orderkey, l_linenumber
"""

ORACLE["q02"] = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                              AS sum_base,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc,
       ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
       COUNT(*)                                                    AS cnt
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLE["q03"] = """
SELECT c.c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o.o_totalprice), 2) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

ORACLE["q04"] = """
SELECT r.r_name, n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey   = c.c_custkey
JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name
"""

ORACLE["q05"] = """
SELECT c.c_custkey, COUNT(o.o_orderkey) AS n,
       ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS spend
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
ORDER BY c.c_custkey
"""

ORACLE["q06"] = """
SELECT
  (SELECT COUNT(*) FROM customer c WHERE EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))      AS with_orders,
  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))      AS without_orders
"""

ORACLE["q07"] = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, ROUND(SUM(l_quantity), 2) AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""

ORACLE["q08"] = """
SELECT COUNT(DISTINCT l_suppkey) AS suppliers,
       COUNT(DISTINCT l_partkey) AS parts,
       ROUND(SUM(DISTINCT l_quantity), 2) AS distinct_qty_sum
FROM lineitem
"""

ORACLE["q09"] = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
ORDER BY o_custkey, rn
"""

ORACLE["q10"] = """
SELECT l_orderkey, l_linenumber,
       ROUND(SUM(l_extendedprice) OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
       LAG(l_linenumber) OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_extendedprice) AS prev_line
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""

ORACLE["q11"] = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""

ORACLE["q12"] = """
SELECT x, grp FROM (
  SELECT c_nationkey AS x, 'both'  AS grp FROM customer
  INTERSECT SELECT s_nationkey, 'both' FROM supplier
  UNION ALL
  SELECT c_nationkey, 'cust_only' FROM customer
  EXCEPT SELECT s_nationkey, 'cust_only' FROM supplier) t
ORDER BY grp, x
"""

ORACLE["q13"] = """
SELECT c_custkey,
       UPPER(c_name) AS u, LOWER(c_mktsegment) AS l,
       SUBSTR(c_name, 1, 8) AS pre, CAST(LENGTH(c_name) AS INT) AS len,
       REPLACE(c_name, '#', '-') AS repl,
       c_name || '/' || c_mktsegment AS joined
FROM customer WHERE c_name LIKE '%1%'
ORDER BY c_custkey
"""

ORACLE["q14"] = """
SELECT CAST(YEAR(l_shipdate) AS INT) AS y, CAST(MONTH(l_shipdate) AS INT) AS m,
       COUNT(*) AS cnt, ROUND(SUM(l_extendedprice), 2) AS rev
FROM lineitem
GROUP BY 1, 2
ORDER BY y, m
"""

ORACLE["q15"] = """
SELECT p_partkey,
       ROUND(SQRT(p_retailprice), 4) AS rt,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
       CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
       ABS(p_size - 25) AS dist, MOD(p_partkey, 7) AS bucket,
       ROUND(POWER(p_size, 2), 1) AS sq
FROM part ORDER BY p_partkey
"""

ORACLE["q16"] = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 50000  THEN 'mid'
            ELSE 'small' END AS bucket,
       NULLIF(o_orderstatus, 'O') AS status_or_null
FROM orders ORDER BY o_orderkey
"""

ORACLE["q17"] = """
SELECT vec_id, CAST(LEN(embedding) AS INT) AS dim,
       ROUND(list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[])), 4) AS sqnorm
FROM embeddings ORDER BY vec_id
"""

ORACLE["q18"] = """
SELECT event_id, json_extract_string(props, '$.page') AS page
FROM events ORDER BY event_id
"""

ORACLE["q19"] = """
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS bucket, event_type,
       COUNT(*) AS cnt, ROUND(SUM(value), 2) AS total
FROM events
GROUP BY 1, 2
ORDER BY bucket, event_type
"""

ORACLE["q20"] = """
SELECT user_id, session_id, COUNT(*) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start
FROM (
  SELECT user_id, ts,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          + INTERVAL 30 MINUTE THEN 1
                WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                ELSE 0 END AS new_s
    FROM events) a) b
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""

ORACLE["q21"] = """
SELECT MD5(text) AS h, COUNT(*) AS copies, MIN(doc_id) AS keeper
FROM documents GROUP BY MD5(text) HAVING COUNT(*) > 1
ORDER BY h
"""

ORACLE["q21b"] = """
SELECT lang, source, COUNT(*) AS docs,
       ROUND(AVG(n_chars), 2) AS avg_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY lang, source ORDER BY lang, source
"""

ORACLE["q22"] = """
WITH nv AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cos_raw
  FROM nv a JOIN nv b
    ON a.label = b.label AND a.vec_id < b.vec_id
), ranked AS (
  SELECT vec_id, nbr_id, ROUND(cos_raw, 4) AS cos,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cos_raw DESC, nbr_id) AS rn
  FROM pairs)
SELECT vec_id, nbr_id, cos, rn FROM ranked WHERE rn <= 3
ORDER BY vec_id, rn
"""

ORACLE["q23"] = """
SELECT o.o_orderkey, CAST(MAX(e.ts) AS TIMESTAMP) AS last_event_ts
FROM orders o JOIN events e
  ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
"""

ORACLE["q24"] = """
SELECT * FROM (
  SELECT l_partkey, l_orderkey, l_linenumber, l_quantity,
         DENSE_RANK() OVER (PARTITION BY l_partkey
                            ORDER BY l_quantity DESC) AS dr
  FROM lineitem) t
WHERE dr = 1
ORDER BY l_partkey, l_orderkey, l_linenumber
"""

ORACLE["qr1"] = f"""
WITH {PIXELS_SQL_CTE}
SELECT band, CAST(FLOOR(y / 2.0) AS INT) AS oy, CAST(FLOOR(x / 2.0) AS INT) AS ox,
       ROUND(AVG(value), 4) AS v
FROM pixels WHERE valid
GROUP BY 1, 2, 3
ORDER BY band, oy, ox
"""

ORACLE["qr2"] = f"""
WITH {PIXELS_SQL_CTE}
SELECT band,
       MAX(CASE WHEN valid THEN value END)                    AS stat_max,
       ROUND(AVG(CASE WHEN valid THEN value END), 4)          AS stat_mean,
       MIN(CASE WHEN valid THEN value END)                    AS stat_min,
       ROUND(STDDEV_POP(CASE WHEN valid THEN value END), 4)   AS stat_std,
       ROUND(100.0 * AVG(CASE WHEN valid THEN 1.0 ELSE 0.0 END), 4) AS valid_pct
FROM pixels GROUP BY band ORDER BY band
"""

ORACLE["qr3"] = f"""
WITH {PARTS_SQL_CTE}
SELECT level, part_seq, nbytes,
       CAST(CASE WHEN nbytes = 0 THEN 0
            ELSE hdr + COALESCE(SUM(nbytes) OVER (ORDER BY level DESC, part_seq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) END AS BIGINT)
         AS "offset"
FROM (SELECT level, part_seq, nbytes, 4096 AS hdr FROM parts) t
ORDER BY level DESC, part_seq
"""


def _corner_step(src: str, vexpr: str, final_value: str) -> str:
    """One fixed-order 2×2-block aggregation step (average/rms core),
    mirroring raster.pyramid.decimate's conditional-corner sums."""
    return f"""
  SELECT band, y, x,
         CASE WHEN cnt > 0 THEN {final_value} END AS value,
         cnt > 0 AS valid
  FROM (
    SELECT *, (CASE WHEN tl IS NOT NULL THEN 1 ELSE 0 END
             + CASE WHEN tr IS NOT NULL THEN 1 ELSE 0 END
             + CASE WHEN bl IS NOT NULL THEN 1 ELSE 0 END
             + CASE WHEN br IS NOT NULL THEN 1 ELSE 0 END) AS cnt
    FROM (
      SELECT band, CAST(FLOOR(y / 2.0) AS INT) AS y, CAST(FLOOR(x / 2.0) AS INT) AS x,
             MAX(CASE WHEN y % 2 = 0 AND x % 2 = 0 AND valid THEN {vexpr} END) AS tl,
             MAX(CASE WHEN y % 2 = 0 AND x % 2 = 1 AND valid THEN {vexpr} END) AS tr,
             MAX(CASE WHEN y % 2 = 1 AND x % 2 = 0 AND valid THEN {vexpr} END) AS bl,
             MAX(CASE WHEN y % 2 = 1 AND x % 2 = 1 AND valid THEN {vexpr} END) AS br
      FROM {src} GROUP BY 1, 2, 3
    )
  )"""


_AVG_TOTAL = (
    "((COALESCE(tl, 0.0) + COALESCE(tr, 0.0)) + (COALESCE(bl, 0.0) + COALESCE(br, 0.0)))"
    " / CAST(cnt AS DOUBLE)"
)

# COG writer round-trip: base level = the valid pixels themselves;
# overview 1 = one fixed-order corner-sum average decimation (same
# construction pyramid_avg is checked against).
ORACLE["cog_roundtrip"] = f"""
WITH {PIXELS_SQL_CTE},
lvl1 AS ({_corner_step('pixels', 'value', _AVG_TOTAL)})
SELECT * FROM (
  SELECT 0 AS level, band, y, x, ROUND(value, 4) AS v FROM pixels WHERE valid
  UNION ALL
  SELECT 1 AS level, band, y, x, ROUND(value, 4) AS v FROM lvl1 WHERE valid
)
ORDER BY level, band, y, x
"""

# Color-JPEG COG row: pixels are lossy (not SQL-recomputable), but the
# STRUCTURE is exact — per-level dims via the same ceil-halving rule
# (overview_count(160, 96, 32) = 3 overviews), tile counts via ceil
# division by the blocksize, the PlanarConfig=1/YCbCr tags, one shared
# JPEGTables copy, multi-part. The verdict flags are true by contract;
# the Spark side computes them for real and a regression flips the hash.
ORACLE["cog_color"] = """
WITH RECURSIVE lv(ifd, w, h) AS (
  SELECT 0, 160, 96
  UNION ALL SELECT ifd + 1, (w + 1) // 2, (h + 1) // 2 FROM lv WHERE ifd < 3
), subs(sub, ych, ycv) AS (
  SELECT '444', 1, 1 UNION ALL SELECT '420', 2, 2
)
SELECT sub,
       CAST(ifd AS INT) AS ifd,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(3 AS INT) AS bands,
       CAST(1 AS INT) AS planar,
       CAST(ych AS INT) AS ych,
       CAST(ycv AS INT) AS ycv,
       CAST(((w + 31) // 32) * ((h + 31) // 32) AS INT) AS data_tiles,
       CAST(0 AS INT) AS sparse_tiles,
       true AS multi_part,
       true AS tables_shared,
       true AS within_tol
FROM lv CROSS JOIN subs
ORDER BY sub, ifd
"""

# Distributed reader round-trip: the float64/deflate write is lossless,
# so the read-back equals the fixture pixels exactly (identity oracle).
ORACLE["cog_read"] = f"""
WITH {PIXELS_SQL_CTE}
SELECT band, y, x, ROUND(value, 4) AS v FROM pixels WHERE valid
ORDER BY band, y, x
"""

# Windowed read: identity oracle filtered to the same half-open bbox —
# exactly the pixels the spatially-pruned reader must emit, no more.
ORACLE["cog_window"] = f"""
WITH {PIXELS_SQL_CTE}
SELECT band, y, x, ROUND(value, 4) AS v FROM pixels
WHERE valid AND x >= 40 AND x < 120 AND y >= 16 AND y < 80
ORDER BY band, y, x
"""

ORACLE["pyramid_avg"] = f"""
WITH {PIXELS_SQL_CTE},
lvl1 AS ({_corner_step('pixels', 'value', _AVG_TOTAL)}),
lvl2 AS ({_corner_step('lvl1', 'value', _AVG_TOTAL)}),
lvl3 AS ({_corner_step('lvl2', 'value', _AVG_TOTAL)})
SELECT level, band, y, x, ROUND(value, 4) AS v, valid FROM (
  SELECT 1 AS level, * FROM lvl1
  UNION ALL SELECT 2 AS level, * FROM lvl2
  UNION ALL SELECT 3 AS level, * FROM lvl3
)
ORDER BY level, band, y, x
"""

ORACLE["decim_rms"] = f"""
WITH {PIXELS_SQL_CTE},
lvl1 AS ({_corner_step('pixels', 'value * value', f'SQRT({_AVG_TOTAL})')})
SELECT band, y, x, ROUND(value, 4) AS v, valid FROM lvl1
ORDER BY band, y, x
"""

ORACLE["decim_nearest"] = f"""
WITH {PIXELS_SQL_CTE}
SELECT band, CAST(FLOOR(y / 2.0) AS INT) AS y, CAST(FLOOR(x / 2.0) AS INT) AS x,
       MAX(CASE WHEN y % 2 = 0 AND x % 2 = 0 THEN value END) AS value,
       COALESCE(MAX(CASE WHEN y % 2 = 0 AND x % 2 = 0 THEN CAST(valid AS INT) END), 0) = 1 AS valid
FROM pixels GROUP BY 1, 2, 3
ORDER BY band, y, x
"""

ORACLE["decim_mode"] = f"""
WITH {PIXELS_SQL_CTE},
counts AS (
  SELECT band, CAST(FLOOR(y / 2.0) AS INT) AS y, CAST(FLOOR(x / 2.0) AS INT) AS x,
         value, COUNT(*) AS cnt
  FROM pixels WHERE valid GROUP BY 1, 2, 3, 4
), picked AS (
  SELECT band, y, x, value FROM counts
  QUALIFY ROW_NUMBER() OVER (PARTITION BY band, y, x ORDER BY cnt DESC, value ASC) = 1
), blocks AS (
  SELECT DISTINCT band, CAST(FLOOR(y / 2.0) AS INT) AS y, CAST(FLOOR(x / 2.0) AS INT) AS x
  FROM pixels
)
SELECT b.band, b.y, b.x, p.value, p.value IS NOT NULL AS valid
FROM blocks b LEFT JOIN picked p USING (band, y, x)
ORDER BY band, y, x
"""


# Streaming corpus: streamed results must equal their batch analogues.
ORACLE["stream_tumbling"] = ORACLE["q19"]

# Sliding windows (1 h wide, 30 min slide): every event belongs to
# exactly 2 epoch-aligned windows — the 30-min bucket containing it
# and the one starting 30 min earlier — so the batch twin expands each
# event to both window starts and counts.
ORACLE["stream_sliding"] = """
SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k.k * INTERVAL 30 MINUTE AS w_start,
       COUNT(*) AS cnt
FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
GROUP BY 1 ORDER BY 1
"""

ORACLE["stream_session"] = """
SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start, COUNT(*) AS n_events
FROM (
  SELECT user_id, ts,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          + INTERVAL 30 MINUTE THEN 1
                WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                ELSE 0 END AS new_s
    FROM events) a) b
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""

ORACLE["stream_dedup"] = """
SELECT COUNT(*) AS cnt, COUNT(DISTINCT event_id) AS distinct_ids FROM events
"""

# Stream-stream interval join: batch spelling of the watermarked
# two-stream join (same-user purchase within 30 min after a click).
ORACLE["stream_join"] = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
ORDER BY click_id, purchase_id
"""


ORACLE["q07b"] = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, ROUND(SUM(l_quantity), 2) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""

ORACLE["pivot_q"] = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE["unpivot_q"] = """
SELECT p_partkey, metric, val FROM (
  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT p_partkey, 'retail' AS metric, p_retailprice AS val FROM part
) t ORDER BY p_partkey, metric
"""


def _conv_pass(grid_sql: str, src: str, src_row: str, src_col: str,
               out_idx: str, val_col: str, ok_expr: str,
               taps=None, offs=None) -> str:
    """One separable k-tap half-phase pass as fixed-association SQL:
    pivot the taps into columns (one source cell each), then
    (…((w0·v0 + w1·v1) + w2·v2)…) — the same left-assoc order as the
    numpy kernel, so doubles are bit-identical. Works for any of the
    INTERP_KERNELS tap tables (bilinear 2-tap … lanczos 6-tap);
    out-of-range taps contribute 0.0 and falsify rok, matching the
    kernel's nodata-halo padding at image edges."""
    from ccog_spark.raster.halo import CUBIC_TAPS

    if taps is None:
        taps = CUBIC_TAPS
    if offs is None:
        offs = (-1, 0, 1, 2)
    piv_v = ", ".join(
        f"MAX(CASE WHEN s.{src_row} - 2 * g.{out_idx} = {o} THEN "
        f"CASE WHEN {ok_expr} THEN s.{val_col} ELSE 0.0 END END) AS v{i}"
        for i, o in enumerate(offs)
    )
    piv_k = ", ".join(
        f"COALESCE(MAX(CASE WHEN s.{src_row} - 2 * g.{out_idx} = {o} "
        f"THEN CAST({ok_expr} AS INT) END), 0) = 1 AS k{i}"
        for i, o in enumerate(offs)
    )
    w = taps
    acc = f"{w[0]!r} * COALESCE(v0, 0.0)"
    for i in range(1, len(w)):
        acc = f"({acc} + {w[i]!r} * COALESCE(v{i}, 0.0))"
    rok = " AND ".join(f"k{i}" for i in range(len(w)))
    return f"""
  SELECT band, {out_idx}, {src_col}, {acc} AS rv,
         {rok} AS rok
  FROM (
    SELECT g.band, g.{out_idx}, g.{src_col}, {piv_v}, {piv_k}
    FROM {grid_sql} g
    LEFT JOIN {src} s
      ON s.band = g.band AND s.{src_col} = g.{src_col}
     AND s.{src_row} BETWEEN 2 * g.{out_idx} + {min(offs)} AND 2 * g.{out_idx} + {max(offs)}
    GROUP BY g.band, g.{out_idx}, g.{src_col}
  )"""


_ROW_GRID = """(SELECT CAST(b.range + 1 AS INT) AS band, CAST(r.range AS INT) AS oj,
        CAST(c.range AS INT) AS x
 FROM range(3) b, range(48) r, range(160) c)"""
_COL_GRID = """(SELECT CAST(b.range + 1 AS INT) AS band, CAST(r.range AS INT) AS oj,
        CAST(c.range AS INT) AS ox
 FROM range(3) b, range(48) r, range(80) c)"""

ORACLE["cubic_decimate"] = f"""
WITH {PIXELS_SQL_CTE},
rowp AS ({_conv_pass(_ROW_GRID, 'pixels', 'y', 'x', 'oj', 'value', 's.valid')}),
rsrc AS (SELECT band, oj, x, rv, rok FROM rowp),
colp AS ({_conv_pass(_COL_GRID, 'rsrc', 'x', 'oj', 'ox', 'rv', 's.rok')})
SELECT band, oj AS y, ox AS x,
       CASE WHEN rok THEN FLOOR(rv * 10000 + 0.5) / 10000.0 END AS v,
       rok AS valid
FROM colp
ORDER BY band, y, x
"""

# Interpolating-overview COG write round-trip (round 12, closes R7):
# base level = the valid pixels themselves (float64/deflate is
# lossless); overview 1 = the SAME fixed-association separable
# Catmull-Rom convolution the cubic_decimate row pins, recomputed
# directly from the pixels CTE with no knowledge of the file. Invalid
# outputs (any tap invalid / past the image edge) are stored as nodata
# by the writer and filtered by the read-back, matching WHERE rok.
ORACLE["cog_cubic"] = f"""
WITH {PIXELS_SQL_CTE},
rowp AS ({_conv_pass(_ROW_GRID, 'pixels', 'y', 'x', 'oj', 'value', 's.valid')}),
rsrc AS (SELECT band, oj, x, rv, rok FROM rowp),
colp AS ({_conv_pass(_COL_GRID, 'rsrc', 'x', 'oj', 'ox', 'rv', 's.rok')})
SELECT * FROM (
  SELECT 0 AS level, band, y, x,
         FLOOR(value * 10000 + 0.5) / 10000.0 AS v
  FROM pixels WHERE valid
  UNION ALL
  SELECT 1 AS level, band, oj AS y, ox AS x,
         FLOOR(rv * 10000 + 0.5) / 10000.0 AS v
  FROM colp WHERE rok
)
ORDER BY level, band, y, x
"""

# Same separable machinery, cubic-B-spline taps (GDAL 'cubicspline';
# ccog kernel table ccog/ccog.py:41-53). Taps embed as exact doubles.
from ccog_spark.raster.halo import CUBICSPLINE_TAPS as _BSPL  # noqa: E402

ORACLE["cubicspline_decimate"] = f"""
WITH {PIXELS_SQL_CTE},
rowp AS ({_conv_pass(_ROW_GRID, 'pixels', 'y', 'x', 'oj', 'value', 's.valid',
                     _BSPL)}),
rsrc AS (SELECT band, oj, x, rv, rok FROM rowp),
colp AS ({_conv_pass(_COL_GRID, 'rsrc', 'x', 'oj', 'ox', 'rv', 's.rok',
                     _BSPL)})
SELECT band, oj AS y, ox AS x,
       CASE WHEN rok THEN FLOOR(rv * 10000 + 0.5) / 10000.0 END AS v,
       rok AS valid
FROM colp
ORDER BY band, y, x
"""

# Remaining interpolating kernels, same separable machinery with each
# kernel's own tap table/offsets (INTERP_KERNELS): bilinear 2-tap,
# gauss 3-tap, lanczos(a=3) 6-tap — every E21 kernel is now
# oracle-checked, not just tiling-invariance-tested.
from ccog_spark.raster.halo import INTERP_KERNELS as _IK  # noqa: E402

for _kname in ("bilinear", "gauss", "lanczos"):
    _offs, _taps, _ = _IK[_kname]
    ORACLE[f"{_kname}_decimate"] = f"""
WITH {PIXELS_SQL_CTE},
rowp AS ({_conv_pass(_ROW_GRID, 'pixels', 'y', 'x', 'oj', 'value', 's.valid',
                     _taps, _offs)}),
rsrc AS (SELECT band, oj, x, rv, rok FROM rowp),
colp AS ({_conv_pass(_COL_GRID, 'rsrc', 'x', 'oj', 'ox', 'rv', 's.rok',
                     _taps, _offs)})
SELECT band, oj AS y, ox AS x,
       CASE WHEN rok THEN FLOOR(rv * 10000 + 0.5) / 10000.0 END AS v,
       rok AS valid
FROM colp
ORDER BY band, y, x
"""


# Palette COG row (round 10, R4-complete evidence): indices, the
# nearest decimation, and the palette RGB arithmetic are all exact
# integer formulas — recomputed here with no knowledge of the file.
# The Spark side reads r/g/b from the file's parsed ColorMap, so a
# palette write/read defect anywhere (tag bytes, ×257 scaling,
# per-page sharing) breaks the value hash.
ORACLE["cog_palette"] = """
WITH ids AS (
  SELECT UNNEST(range(0, 15360)) AS id
), px AS (
  SELECT CAST(id // 160 AS INT) AS y, CAST(id % 160 AS INT) AS x,
         CAST((id // 160 + 2 * (id % 160)) % 7 AS INT) AS idx
  FROM ids
), lvl1 AS (
  SELECT CAST(y // 2 AS INT) AS y, CAST(x // 2 AS INT) AS x, idx
  FROM px WHERE y % 2 = 0 AND x % 2 = 0
), allpx AS (
  SELECT 0 AS level, y, x, idx FROM px
  UNION ALL
  SELECT 1 AS level, y, x, idx FROM lvl1
)
SELECT CAST(level AS INT) AS level, y, x, idx,
       CAST(30 * idx AS INT) AS r,
       CAST(25 * idx + 5 AS INT) AS g,
       CAST(40 * idx + 10 AS INT) AS b,
       'Palette' AS ci
FROM allpx
ORDER BY level, y, x
"""
