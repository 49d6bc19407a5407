"""Mergeable approximate-aggregation sketches, deterministic across
engines.

At 100 TB the only sane way to answer "how many distinct users per
day, and overall?" or "how often does each template occur?" is a
MERGEABLE sketch: build small fixed-size summaries per partition /
group / day with one linear pass, then combine summaries instead of
re-scanning data. Spark's built-in approx_count_distinct gives no
portable register representation, so these sketches are built from
the same engine-portable md5 hashing the dedup family uses
(functions.hash60) — every intermediate is reproducible bit-for-bit
in DuckDB, which is what lets the driver's oracle validate an
*approximate* structure exactly.

- **HyperLogLog** (Flajolet et al. 2007, the HLL practical variant of
  Heule et al. "HyperLogLog in Practice"): p-bit register index, the
  remaining 60-p hash bits feed the leading-zero rank. Ranks use
  ``length(bin(w))`` — integer-exact in both engines — never
  ``floor(log2(w))``, whose 1-ulp libm differences would break
  cross-engine determinism. The estimator's register sum is kept as
  an exact BIGINT (sum of 2^(RANK_MAX - r), every term an integer),
  so the only floating-point steps are one multiply and one divide —
  both IEEE-correctly-rounded from identical integers — plus the
  small-range ln() correction, which callers round (the registered
  queries round to 4 decimals; 1 ulp at that magnitude is ~1e-12).

- **Count-min** (Cormode & Muthukrishnan 2005): d independent
  md5-derived row hashes into w counters; point frequency estimate =
  min over rows. All-integer, trivially mergeable by elementwise sum
  (counter layout is (row, col, count) rows — a groupBy-sum merges
  sketches of any number of partitions).

Scale shape: both sketches are ONE map-side-combinable aggregation
over (group, register/cell) — the shuffle carries at most
``groups x m`` tiny rows regardless of input size, and merging a
thousand per-day sketches is a groupBy over thousands of rows, not a
re-scan of a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_plugins_spark.functions import hash60
from python_plugins_spark.functions import oracle_fragments as O

HLL_P = 10                      # 2^10 = 1024 registers
HLL_M = 1 << HLL_P
HLL_RANK_MAX = 60 - HLL_P + 1   # rank when all 50 suffix bits are 0
# alpha_m for m >= 128 (Flajolet et al., Fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hll_pieces(col: Column) -> tuple[Column, Column]:
    """(register index, rank) of one value's 60-bit md5 hash."""
    h = hash60(col)
    idx = h.bitwiseAND(F.lit(HLL_M - 1))
    w = F.shiftright(h, HLL_P)
    # leading zeros in the (60-p)-bit suffix + 1; bin() drops leading
    # zeros so its length IS the msb position (integer-exact, portable)
    rank = F.when(w == 0, F.lit(HLL_RANK_MAX)).otherwise(
        F.lit(HLL_RANK_MAX) - F.length(F.bin(w))
    )
    return idx, rank


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Sketch rows ``(group..., reg, rank)`` — max rank per register.
    One map-side-combined aggregate; at most ``groups x 1024`` output
    rows. Sketches for different groups/days/partitions merge by
    ``groupBy(reg).agg(max(rank))`` — see :func:`hll_merge`."""
    group_cols = group_cols or []
    idx, rank = _hll_pieces(F.col(value_col).cast("string"))
    return (
        df.select(*group_cols, idx.alias("reg"), rank.alias("rank"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("rank"))
    )


def hll_merge(sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge sketch rows (possibly spanning many original groups) into
    one sketch per ``group_cols`` key — elementwise register max."""
    group_cols = group_cols or []
    return sketches.groupBy(*group_cols, "reg").agg(F.max("rank").alias("rank"))


def hll_estimate(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate per group from sketch rows.

    The register sum is exact integer arithmetic: each register
    contributes 2^(RANK_MAX - rank); absent registers (rank 0, never
    touched) contribute 2^RANK_MAX. ``est`` is the raw HLL estimator
    with the small-range linear-counting correction (E <= 2.5m and
    empty registers present -> m * ln(m / V))."""
    group_cols = group_cols or []
    agg = sketches.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RANK_MAX} - rank)")).alias(
            "_present_sum"
        ),
        F.count("*").alias("_nregs"),
    )
    # registers never touched: rank 0 -> term 2^RANK_MAX each
    zeros = F.lit(HLL_M) - F.col("_nregs")
    int_sum = F.col("_present_sum") + zeros * F.lit(1 << HLL_RANK_MAX)
    # sum(2^-rank) = int_sum / 2^RANK_MAX; fold the 2^RANK_MAX into the
    # numerator so the float path is one multiply + one divide
    raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RANK_MAX))
        / int_sum.cast("double")
    )
    corrected = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, corrected.alias("est"))


def hll_oracle_sql(
    table: str, value_expr: str, group_cols: list[str] | None = None
) -> str:
    """DuckDB SQL computing the identical estimate (same md5 hash,
    same bin()-based rank, same integer register sum)."""
    group_cols = group_cols or []
    gsel = "".join(f"{g}, " for g in group_cols)
    gby = ("GROUP BY " + ", ".join(group_cols)) if group_cols else ""
    m, rmax, alpha = HLL_M, HLL_RANK_MAX, HLL_ALPHA
    num = alpha * m * m * float(1 << rmax)
    return f"""
      WITH hashed AS (
        SELECT {gsel}
               {O.sql_hash60(f"CAST({value_expr} AS VARCHAR)")} AS h
        FROM {table}
      ), pieces AS (
        SELECT {gsel} h & {m - 1} AS reg,
               CASE WHEN h >> {HLL_P} = 0 THEN {rmax}
                    ELSE {rmax} - length(bin(h >> {HLL_P})) END AS rank
        FROM hashed
      ), regs AS (
        SELECT {gsel} reg, max(rank) AS rank FROM pieces GROUP BY {gsel} reg
      ), summed AS (
        SELECT {gsel}
               sum((CAST(1 AS BIGINT) << ({rmax} - rank))) AS present_sum,
               count(*) AS nregs
        FROM regs {gby}
      )
      SELECT {gsel}
             CASE WHEN ({num!r} / CAST(present_sum + ({m} - nregs) * (CAST(1 AS BIGINT) << {rmax}) AS DOUBLE)) <= {2.5 * m}
                       AND ({m} - nregs) > 0
                  THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - nregs AS DOUBLE))
                  ELSE {num!r} / CAST(present_sum + ({m} - nregs) * (CAST(1 AS BIGINT) << {rmax}) AS DOUBLE)
             END AS est
      FROM summed
    """


# ------------------------------------------------------------ count-min

CM_DEPTH = 4
CM_WIDTH = 256


def cm_cell(col: Column, row: int) -> Column:
    """Column index of ``col`` in count-min row ``row`` (md5-derived,
    engine-portable)."""
    return hash60(
        F.concat(F.lit(f"cm{row}|"), col.cast("string"))
    ).bitwiseAND(F.lit(CM_WIDTH - 1))


def cm_sketch(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Count-min sketch rows ``(group..., row, col, cnt)``. One
    explode of DEPTH cells per input row, then a map-side-combined
    sum — at most ``groups x DEPTH x WIDTH`` output rows. Sketches
    merge by summing cnt over (row, col)."""
    group_cols = group_cols or []
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                cm_cell(F.col(value_col), r).alias("col"),
            )
            for r in range(CM_DEPTH)
        ]
    )
    return (
        df.select(*group_cols, F.explode(cells).alias("c"))
        .select(*group_cols, "c.row", "c.col")
        .groupBy(*group_cols, "row", "col")
        .agg(F.count("*").alias("cnt"))
    )


def cm_point_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str
) -> DataFrame:
    """Frequency estimate for each item: min over the DEPTH rows of
    the item's counter. The join is an equi-join on (row, col) against
    the tiny sketch (broadcastable: DEPTH x WIDTH rows)."""
    probes = items.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cm_cell(F.col(item_col), r).alias("col"),
                    )
                    for r in range(CM_DEPTH)
                ]
            )
        ).alias("c"),
    ).select(item_col, "c.row", "c.col")
    return (
        probes.join(F.broadcast(sketch), on=["row", "col"], how="left")
        .fillna(0, subset=["cnt"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("est"))
    )


def cm_oracle_sql(table: str, value_expr: str, probe_sql: str, item_col: str) -> str:
    """DuckDB SQL for sketch + point estimates of ``probe_sql`` items
    (identical md5 row hashes)."""
    rows_cells = " UNION ALL ".join(
        f"""SELECT {r} AS row,
            {O.sql_hash60(f"'cm{r}|' || CAST({value_expr} AS VARCHAR)")} & {CM_WIDTH - 1} AS col
            FROM {table}"""
        for r in range(CM_DEPTH)
    )
    probe_cells = " UNION ALL ".join(
        f"""SELECT {item_col}, {r} AS row,
            {O.sql_hash60(f"'cm{r}|' || CAST({item_col} AS VARCHAR)")} & {CM_WIDTH - 1} AS col
            FROM probes"""
        for r in range(CM_DEPTH)
    )
    return f"""
      WITH cells AS ({rows_cells}),
      sketch AS (
        SELECT row, col, count(*) AS cnt FROM cells GROUP BY row, col
      ),
      probes AS ({probe_sql}),
      probe_cells AS ({probe_cells})
      SELECT p.{item_col}, min(coalesce(s.cnt, 0)) AS est
      FROM probe_cells p LEFT JOIN sketch s ON p.row = s.row AND p.col = s.col
      GROUP BY p.{item_col}
    """


# ------------------------------------------------- histogram quantiles

def hist_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Equi-width histogram sketch over a KNOWN value range — the third
    mergeable summary (with HLL and count-min): (group, bin, cnt) rows,
    one map-side-combinable aggregation, shuffle bounded by
    ``groups x bins`` regardless of input size. Values outside
    [lo, hi) clamp into the edge bins (the convention monitoring
    systems use), so the sketch never drops rows.

    Deterministic across engines: the bin index is
    floor((v - lo) * bins / (hi - lo)) — multiply and divide are
    IEEE-correctly-rounded from identical doubles, so DuckDB computes
    the identical integer."""
    F_ = F
    v = F_.col(value_col).cast("double")
    raw = F_.floor((v - F_.lit(float(lo))) * bins / F_.lit(float(hi - lo)))
    b = F_.least(F_.greatest(raw, F_.lit(0)), F_.lit(bins - 1)).cast("int")
    return (
        df.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F_.count("*").alias("cnt"))
    )


def hist_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge histogram sketches (e.g. per-day partials) by elementwise
    sum — a groupBy over tiny rows, never a data re-scan."""
    return sketches.groupBy(*group_cols, "bin").agg(
        F.sum("cnt").alias("cnt")
    )


def hist_quantile(
    sketch: DataFrame,
    group_cols: list[str],
    q: float,
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Per-group quantile estimate from the sketch: locate the bin
    whose cumulative count crosses q*N and interpolate linearly inside
    it. Error is bounded by the bin width — the estimate a 100 TB
    latency dashboard runs on merged per-hour sketches. Returns
    ``group_cols + [est]`` (callers alias/round)."""
    from pyspark.sql import Window

    width = (hi - lo) / bins
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = sketch.withColumns(
        {
            "cum": F.sum("cnt").over(w),
            "total": F.sum("cnt").over(Window.partitionBy(*group_cols)),
        }
    )
    target = F.col("total") * F.lit(float(q))
    hit = cum.filter(F.col("cum") >= target).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(*group_cols).orderBy("bin")
        ),
    ).filter(F.col("rn") == 1)
    frac = (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    return hit.select(
        *group_cols,
        (
            F.lit(float(lo))
            + (F.col("bin").cast("double") + frac) * F.lit(float(width))
        ).alias("est"),
    )


def hist_quantile_oracle_sql(
    table: str,
    value_expr: str,
    group_expr: str,
    q: float,
    lo: float,
    hi: float,
    bins: int = 256,
) -> str:
    """DuckDB mirror of sketch -> quantile, step for step."""
    width = (hi - lo) / bins
    return f"""
    WITH sk AS (
      SELECT {group_expr} AS g,
             CAST(least(greatest(floor((CAST({value_expr} AS DOUBLE) - CAST({lo} AS DOUBLE)) * {bins} / CAST({hi - lo} AS DOUBLE)), 0), {bins - 1}) AS INT) AS bin,
             count(*) AS cnt
      FROM {table} GROUP BY 1, 2
    ),
    cum AS (
      SELECT g, bin, cnt,
             sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY g) AS total
      FROM sk
    ),
    -- every literal CASTs to DOUBLE: DuckDB parses bare decimals as
    -- DECIMAL and its exact arithmetic diverges from the IEEE doubles
    -- Spark computes by the final ulp
    hit AS (
      SELECT g, bin, cnt, cum, total,
             row_number() OVER (PARTITION BY g ORDER BY bin) AS rn
      FROM cum WHERE cum >= total * CAST({q} AS DOUBLE)
    )
    SELECT g, (CAST({lo} AS DOUBLE) + (bin::DOUBLE + (total * CAST({q} AS DOUBLE) - (cum - cnt)) / cnt) * CAST({width} AS DOUBLE)) AS est
    FROM hit WHERE rn = 1
    """


def hist_range(df: DataFrame, value_col: str) -> tuple[float, float]:
    """Two-pass convenience for unknown value ranges: one min/max
    aggregate (metadata-cheap; parquet footers usually answer it) for
    the [lo, hi) the equi-width sketch needs. hi is nudged one ulp up
    so the true max lands inside the last bin rather than clamping."""
    import math

    row = df.agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
    ).collect()[0]
    lo, hi = float(row["lo"]), float(row["hi"])
    return lo, math.nextafter(hi, math.inf) if hi > lo else lo + 1.0


# ------------------------------------------------------------- bloom
# Bloom-filter prefilter (Bloom 1970; the Kafka/BigTable/Parquet
# row-group membership pattern): fold a huge corpus key set into a
# fixed-size bit set once, then screen incoming batches against the
# broadcast bit set map-side, so only the tiny "maybe present" slice
# ever reaches the exact (shuffling) membership check. No false
# negatives ever — a present key's positions are all set by
# construction — so downstream results verified against the corpus
# are EXACT regardless of the hash functions; false positives only
# cost extra verification work (~(1 - e^{-kn/m})^k of the batch).
#
# The bit set is kept in RELATIONAL form: the DISTINCT set-bit
# positions, a table bounded by num_bits rows no matter how large the
# corpus — Spark's partial-aggregate distinct collapses each
# partition's positions to <= num_bits before the shuffle, and the
# table broadcasts like any dimension. (A packed bitmap is the same
# information; the relational form keeps the whole path in Catalyst
# expressions with zero UDFs and makes the filter trivially
# persistable/mergeable: union-distinct = bitwise OR.)

BLOOM_BITS = 1 << 17            # 131072 positions ~ 16 KiB packed
BLOOM_HASHES = 5


def bloom_positions_expr(
    col: Column, num_bits: int = BLOOM_BITS, num_hashes: int = BLOOM_HASHES
) -> Column:
    """The key's ``num_hashes`` bit positions as an array<long> —
    xxhash64 with distinct seeds, all JVM-side."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Build the filter from a key column: one corpus pass, returns
    the distinct set-bit positions (<= ``num_bits`` rows). Null keys
    set no bits (they can never equi-match anyway). Mergeable:
    union + distinct of two builds is the filter of the union."""
    return (
        df.select(
            F.explode(
                bloom_positions_expr(F.col(key_col), num_bits, num_hashes)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_maybe_contains(
    keys: DataFrame,
    positions: DataFrame,
    key_col: str,
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Screen a key frame against a built filter: keeps the rows whose
    ``num_hashes`` positions are ALL set (the "maybe present" slice —
    superset of the truly-present keys). The positions table
    broadcasts; the only shuffle is the per-key hit count."""
    hits = (
        keys.select(
            F.col(key_col),
            F.explode(
                bloom_positions_expr(F.col(key_col), num_bits, num_hashes)
            ).alias("pos"),
        )
        .join(F.broadcast(positions), on="pos")
        .groupBy(key_col)
        # duplicate positions within one key's array either all match
        # or all miss, so a plain count hits num_hashes iff every
        # position is set
        .agg(F.count("*").alias("_hits"))
        .filter(F.col("_hits") >= num_hashes)
        .select(key_col)
    )
    return hits


def bloom_semi_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    key_col: str,
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """EXACT "batch rows whose key already exists in the corpus",
    computed the way a 100 TB ingest should: the corpus folds once
    into the bloom positions (bounded, broadcastable, persistable for
    reuse across batches); the batch's distinct keys screen against
    it map-side; only the surviving "maybe" keys — true dups plus the
    controlled false-positive slice — are verified with an exact
    semi-join against the corpus, with the maybe set broadcast so the
    corpus is never shuffled. Without the prefilter this check is a
    corpus-by-batch shuffle join on every batch."""
    positions = bloom_build(corpus, key_col, num_bits, num_hashes)
    batch_keys = batch.select(key_col).filter(
        F.col(key_col).isNotNull()
    ).distinct()
    maybe = bloom_maybe_contains(
        batch_keys, positions, key_col, num_bits, num_hashes
    )
    confirmed = (
        corpus.join(F.broadcast(maybe), on=key_col, how="leftsemi")
        .select(key_col)
        .distinct()
    )
    return batch.join(F.broadcast(confirmed), on=key_col, how="leftsemi")
