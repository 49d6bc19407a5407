"""Graph extensions (BFS, structural similarity, label propagation, k-core), corpus reporting, containment dedup, imputation, communities, mergeable sketches (HLL, count-min).

Split from the former queries.py; see _core for the registry and conventions."""
from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves postponed type hints in pandas UDFs

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from python_plugins_spark.functions import oracle_fragments as OF  # noqa: F401
from python_plugins_spark.operators import dedup as D  # noqa: F401
from python_plugins_spark.operators import multimodal as MM  # noqa: F401
from python_plugins_spark.operators import relational as R  # noqa: F401
from python_plugins_spark.operators import similarity as S  # noqa: F401
from python_plugins_spark.operators import text as TX  # noqa: F401
from python_plugins_spark.operators.asof import asof_join  # noqa: F401
from python_plugins_spark.operators.transform import python_transform  # noqa: F401
from python_plugins_spark.sources.io import load_table  # noqa: F401

from python_plugins_spark.queries._core import (  # noqa: F401
    ORACLES, QUERIES, register, _global_index_part, _ts, _STRF,
)
from python_plugins_spark.session import (
    stage_checkpoint,
    stage_checkpoint_iterative,
)


# Graph extensions: bounded BFS reachability, structural similarity
# =====================================================================

_GRAPH_EDGE_EXPR = "(json_extract_string(props, '$.k')::BIGINT * 7) % 150"


@register(
    "bfs_reachable_hops",
    oracle=f"""
    WITH RECURSIVE edges AS (
        SELECT DISTINCT user_id AS src, {_GRAPH_EDGE_EXPR} AS dst
        FROM events WHERE user_id <> {_GRAPH_EDGE_EXPR}
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    walk(node, d) AS (
        SELECT node, 0 FROM nodes WHERE node % 50 = 0
        UNION
        SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.d < 4
    )
    SELECT node, min(d) AS hops FROM walk GROUP BY node
    """,
)
def bfs_reachable_hops(spark, sf_dir):
    """Bounded breadth-first reachability: minimum hop count (<= 4)
    from a deterministic seed set (node % 50 == 0) over the event
    graph. Spark runs the textbook frontier loop — each hop is one
    src-keyed join + union; the final min-groupBy collapses duplicate
    discoveries. Same co-location story as PageRank: the edge list is
    materialized once, partitioned by src, so each hop's heavy side
    never re-shuffles; each hop's frontier is checkpointed so the
    plan stays one hop deep. The oracle is a depth-bounded recursive
    CTE with set (UNION) semantics so the walk stays polynomial."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    dst = (k * 7) % 150
    edges = (
        ev.select(F.col("user_id").alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # Materialize the invariant edge list ONCE, partitioned on the join
    # key (each hop joins frontier.node == edges.src, so the heavy side
    # never re-shuffles and the event scan happens exactly once instead
    # of once per unrolled hop); the seed set derives from the
    # materialized edges too. The frontier itself stays lazy: at a
    # bounded depth its duplicated subtree is joins over the already-
    # materialized edges, which is cheaper than a per-hop checkpoint;
    # a DEEP traversal should checkpoint the frontier every few hops.
    edges = edges.repartition("src").transform(stage_checkpoint)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    frontier = nodes.filter(F.col("node") % 50 == 0).select(
        "node", F.lit(0).alias("d")
    )
    reached = frontier
    for hop in range(1, 5):
        frontier = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), F.lit(hop).alias("d"))
            .distinct()
        )
        reached = reached.union(frontier)
    return reached.groupBy("node").agg(F.min("d").cast("long").alias("hops"))


@register(
    "node_jaccard_neighbors",
    oracle=f"""
    WITH e0 AS (
        SELECT DISTINCT user_id AS a, {_GRAPH_EDGE_EXPR} AS b
        FROM events WHERE user_id <> {_GRAPH_EDGE_EXPR}
    ),
    und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM e0),
    adj AS (SELECT u AS node, v AS nbr FROM und UNION SELECT v, u FROM und),
    deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
    inter AS (
        SELECT x.node AS a, y.node AS b, count(*) AS n_common
        FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
        GROUP BY x.node, y.node
    )
    SELECT i.a, i.b, i.n_common,
           round(i.n_common * 1.0 / (da.d + db.d - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN deg da ON da.node = i.a
    JOIN deg db ON db.node = i.b
    WHERE i.n_common * 1.0 / (da.d + db.d - i.n_common) >= 0.2
    """,
)
def node_jaccard_neighbors(spark, sf_dir):
    """Structural (neighbor-set Jaccard) node similarity over the
    undirected event graph — the link-prediction / entity-resolution
    primitive. The candidate generation is the wedge join (adjacency
    self-joined on the shared neighbor), which enumerates exactly the
    pairs with n_common >= 1 instead of all O(V^2) pairs — the same
    blocking idea as MinHash-LSH banding, here exact. Skew warning at
    scale: a celebrity node of degree D contributes D^2 wedges;
    cap/salt hub neighbors (or drop top-0.01% degree nodes) before the
    self-join, exactly as the LSH path caps bucket width."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    dst = (k * 7) % 150
    e0 = (
        ev.select(F.col("user_id").alias("a"), dst.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = e0.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    adj = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).union(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("d"))
    x = adj.alias("x")
    y = adj.alias("y")
    inter = (
        x.join(y, (F.col("x.nbr") == F.col("y.nbr")) & (F.col("x.node") < F.col("y.node")))
        .groupBy(F.col("x.node").alias("a"), F.col("y.node").alias("b"))
        .agg(F.count("*").alias("n_common"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    j = F.col("n_common") / (F.col("da") + F.col("db") - F.col("n_common"))
    return (
        inter.join(da, "a")
        .join(db, "b")
        .filter(j >= 0.2)
        .select("a", "b", "n_common", F.round(j, 6).alias("jaccard"))
    )


# =====================================================================
# Corpus reporting & containment dedup & imputation & communities
# =====================================================================

@register(
    "dataset_card_by_source",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           sum(len({OF.sql_tokens("text")})) AS total_tokens,
           round(avg(n_chars), 4) AS avg_chars,
           round(1.0 - count(DISTINCT {D.sql_fingerprint("text")}) * 1.0 / count(*), 6) AS dup_rate
    FROM documents GROUP BY source
    """,
)
def dataset_card_by_source(spark, sf_dir):
    """The per-source "dataset card" rollup a training-data pipeline
    publishes with every corpus release: document count, language
    spread, total whitespace-token volume, mean length, and the
    exact-duplicate rate (1 - distinct normalized-fingerprints /
    docs). One hash aggregate over the corpus; the two count-DISTINCTs
    expand into a single multi-distinct plan. At 100 TB, swap the
    distincts for approx_count_distinct (HLL) and this becomes a
    single map-side-combinable pass — the exact version here is the
    audit-grade variant."""
    from python_plugins_spark.functions import tokens

    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(
            "source",
            "lang",
            "n_chars",
            F.size(tokens(F.col("text"))).alias("n_tok"),
            D.fingerprint_col(F.col("text")).alias("fp"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(
                1.0 - F.countDistinct("fp") * F.lit(1.0) / F.count("*"), 6
            ).alias("dup_rate"),
        )
    )


@register(
    "ngram_containment_pairs",
    # exact all-pairs containment via inverted-index join (a zero-
    # overlap pair can never reach a positive threshold — value-
    # identical to the CROSS JOIN form, tractable oracle)
    oracle=f"""
    WITH _tok AS (SELECT doc_id, {OF.sql_tokens("text")} AS t FROM documents),
    _sh AS (SELECT doc_id, list_distinct({OF.sql_word_shingles("t", 3)}) AS s FROM _tok),
    _nz AS (SELECT * FROM _sh WHERE len(s) > 0),
    _ex AS (SELECT doc_id AS id, unnest(s) AS g FROM _nz),
    _int AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
      FROM _ex a JOIN _ex b ON a.g = b.g AND a.id <> b.id
      GROUP BY 1, 2
    ),
    _n AS (SELECT doc_id AS id, len(s) AS n FROM _nz)
    SELECT i.id_a, i.id_b,
           round(i.inter::DOUBLE / la.n::DOUBLE, 6) AS containment
    FROM _int i JOIN _n la ON la.id = i.id_a
    WHERE round(i.inter::DOUBLE / la.n::DOUBLE, 6) >= 0.6
    """,
)
def ngram_containment_pairs(spark, sf_dir):
    """Candidate-fed directional containment: EXACT prefix-filter
    candidate generation (PPJoin-style rarest-first prefixes — no
    crossJoin, no recall loss) + containment verification restricted
    to candidate pairs. The brute-force all-pairs form lives only in
    the oracle SQL; the hash match proves the prefix filter's
    exactness on real data."""
    docs = load_table(spark, "documents", sf_dir)
    return D.ngram_containment_pairs(docs, "text", "doc_id", 0.6, shingle=3)


@register(
    "locf_carry_forward",
    oracle=f"""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL 1 hour, min(ts)) AS lo,
             time_bucket(INTERVAL 1 hour, max(ts)) AS hi
      FROM events
    ),
    slots AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 hour)) AS slot FROM bounds),
    agg AS (
      SELECT time_bucket(INTERVAL 1 hour, ts) AS slot,
             round(sum(value), 4) AS total_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    joined AS (
      SELECT s.slot, a.total_value FROM slots s LEFT JOIN agg a ON s.slot = a.slot
    )
    SELECT strftime(slot, '{_STRF}') AS slot,
           coalesce(last_value(total_value IGNORE NULLS) OVER (
               ORDER BY slot ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0.0) AS filled_value,
           (total_value IS NULL) AS was_imputed
    FROM joined
    """,
)
def locf_carry_forward(spark, sf_dir):
    """Last-observation-carried-forward imputation over the hourly
    spine — the other half of gap_fill_timeseries (zero-fill vs
    carry-forward), i.e. TimescaleDB's `locf()` gapfill mode. The
    carry is `last(value, ignorenulls=True)` over an ordered running
    frame; on the one-row-per-hour spine the global order is cheap at
    any corpus scale (partition by series key when there are many
    series). `was_imputed` keeps the imputation auditable."""
    ev = load_table(spark, "events", sf_dir)
    agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("slot"))
        .agg(F.round(F.sum("value"), 4).alias("total_value"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("slot")
    )
    w = Window.orderBy("slot").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(agg, on="slot", how="left")
        .select(
            _ts(F.col("slot")).alias("slot"),
            F.coalesce(
                F.last("total_value", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("filled_value"),
            F.col("total_value").isNull().alias("was_imputed"),
        )
    )


def _label_prop_oracle_sql(iters: int = 4) -> str:
    """Loop-unrolled min-label propagation as chained CTEs (same
    pattern as the PageRank and k-means oracles): DuckDB runs the
    identical integer recurrence, so labels match exactly."""
    parts = [
        f"""WITH e0 AS (
        SELECT DISTINCT user_id AS a, {_GRAPH_EDGE_EXPR} AS b
        FROM events WHERE user_id <> {_GRAPH_EDGE_EXPR}
    )""",
        "und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM e0)",
        "adj AS (SELECT u AS node, v AS nbr FROM und UNION SELECT v, u FROM und)",
        "nodes AS (SELECT DISTINCT node FROM adj)",
        "l0 AS (SELECT node, node AS lbl FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"l{i + 1} AS (SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl "
            f"FROM l{i} n LEFT JOIN ("
            f"SELECT a.node, min(l.lbl) AS mn FROM adj a "
            f"JOIN l{i} l ON l.node = a.nbr GROUP BY a.node) m USING (node))"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, lbl AS community FROM l{iters}"
    )


@register("label_propagation_communities", oracle=_label_prop_oracle_sql())
def label_propagation_communities(spark, sf_dir):
    """Min-label propagation (4 synchronous rounds) over the
    undirected event graph — the cheap community/connected-component
    sketch: every node takes the minimum label among itself and its
    neighbors each round, so labels flood k hops in k rounds. Each
    round is one adjacency join + min-aggregate, the same src-keyed
    co-location story as PageRank/BFS; rounds to convergence ≈ graph
    diameter, and the fixed 4-round cut is what makes an exact
    unrolled oracle possible (the unbounded-correct variant is
    dedup.connected_components)."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    dst = (k * 7) % 150
    e0 = (
        ev.select(F.col("user_id").alias("a"), dst.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = e0.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    # The adjacency list is the loop invariant: materialize it ONCE
    # (pre-partitioned on the join key so every round's join reuses the
    # layout) instead of re-deriving it from the event scan in all four
    # rounds; localCheckpoint each round's labels so the lineage stays
    # one-round deep (unrolled, the label frame appears twice per round
    # and the plan grows geometrically). At a real 100 TB scale use
    # checkpoint() to a reliable store so executor loss can't drop a
    # round's blocks.
    adj = (
        und.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .union(und.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .repartition("nbr")
        .transform(stage_checkpoint)
    )
    labels = adj.select("node").distinct().select("node", F.col("node").alias("lbl"))
    for _ in range(4):
        nbr_min = (
            adj.join(labels.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node")
            .agg(F.min("lbl").alias("mn"))
        )
        labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("mn"), F.col("lbl"))
                ).alias("lbl"),
            )
            # in-loop: truncation is load-bearing (plan depth must
            # stay one round) — the iterative variant keeps it under
            # every stageMaterialize mode
            .transform(stage_checkpoint_iterative)
        )
    return labels.select("node", F.col("lbl").alias("community"))


@register(
    "observed_metrics_audit",
    oracle="""
    SELECT count(*) AS n_kept,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS kept_revenue,
           sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS n_urgent,
           round(max(o_totalprice), 4) AS max_price
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def observed_metrics_audit(spark, sf_dir):
    """Inline data-quality gate via Spark's Observation API: the
    metrics (row count, kept revenue, urgent-order count, max price)
    are accumulated ON the already-running pipeline pass — zero extra
    scans, unlike a separate audit query that re-reads the source. At
    100 TB that second scan is the entire cost of auditing; `observe`
    makes the audit free and the write-audit-publish gate (see
    write_audit_publish) can consume these metrics directly. The
    observed row is returned as a one-row DataFrame for the gate."""
    from pyspark.sql import Observation

    o = load_table(spark, "orders", sf_dir)
    obs = Observation("audit")
    kept = o.filter(F.col("o_orderstatus") == "O").observe(
        obs,
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("kept_revenue"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("n_urgent"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )
    # one action drives the pipeline; metrics ride along with it
    kept.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_kept"], m["kept_revenue"], m["n_urgent"], m["max_price"])],
        "n_kept long, kept_revenue double, n_urgent long, max_price double",
    )


@register(
    "readability_flesch_docs",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               len(str_split_regex(lower(trim(text)), '\\s+')) AS n_words,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
        FROM documents
    )
    SELECT doc_id,
           round(206.835
                 - 1.015 * (n_words::DOUBLE / ceil(n_words / 8.0))
                 - 84.6 * (n_syll::DOUBLE / n_words), 4) AS flesch
    FROM t WHERE n_words > 0
    """,
)
def readability_flesch_docs(spark, sf_dir):
    """Flesch reading-ease per document — the classic quality filter
    knob alongside quality_score. Syllables are approximated by
    vowel-group runs ([aeiouy]+), the standard cheap heuristic; the
    synthetic corpus carries no terminal punctuation (see
    sentence_split_docs), so sentences are deterministic 8-token
    pseudo-sentences (ceil(words/8)) — identical arithmetic in both
    engines. Pure narrow projection: no shuffle at all, perfectly
    scan-parallel at any corpus size."""
    t = F.lower(F.col("text"))
    n_words = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    n_syll = F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), 0))
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "doc_id", n_words.alias("n_words"), n_syll.alias("n_syll")
    ).filter(F.col("n_words") > 0)
    flesch = (
        F.lit(206.835)
        - 1.015 * (F.col("n_words").cast("double") / F.ceil(F.col("n_words") / 8.0))
        - 84.6 * (F.col("n_syll").cast("double") / F.col("n_words"))
    )
    return base.select("doc_id", F.round(flesch, 4).alias("flesch"))


@register(
    "quality_tier_binning",
    oracle="""
    WITH q AS (
        WITH _t AS (SELECT doc_id, text AS txt, str_split_regex(lower(trim(text)), '\\s+') AS t FROM documents)
        SELECT doc_id,
               round(0.4 * least(len(t)::DOUBLE / 100.0, 1.0)
                   + 0.3 * (1.0 - length(regexp_replace(txt, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / length(txt))
                   + 0.3 * least((len(list_filter(t, t -> list_contains(['the', 'a', 'and', 'of', 'to', 'in', 'is', 'it', 'that', 'for'], t)))::DOUBLE / len(t)::DOUBLE) * 5.0, 1.0), 6) AS quality
        FROM _t),
    toks AS (
        SELECT doc_id, len(str_split_regex(lower(trim(text)), '\\s+')) AS n_tok
        FROM documents
    ),
    tiered AS (
        SELECT q.doc_id, q.quality, t.n_tok,
               ntile(4) OVER (ORDER BY q.quality, q.doc_id) AS tier
        FROM q JOIN toks t ON q.doc_id = t.doc_id
    )
    SELECT tier, count(*) AS n_docs, sum(n_tok) AS total_tokens,
           round(avg(quality), 6) AS avg_quality
    FROM tiered GROUP BY tier
    """,
)
def quality_tier_binning(spark, sf_dir):
    """Quality-tier curriculum binning: quartile tiers over the total
    order (quality, doc_id), then token mass per tier — the "how much
    training data at each quality level" report that decides mixing
    weights.

    Scale formulation (no single-partition WindowExec): the ntile(4)
    the oracle runs is computed DISTRIBUTED — range-partition on the
    sort key, number rows locally per partition, shift by broadcast
    per-partition offsets (the global_sequence_orders pattern), then
    apply ntile's exact bucket arithmetic (first n%k tiles get one
    extra row) to the global rank. The fact data shuffles once; the
    only windows run on the 16-row per-partition count table."""
    from python_plugins_spark.operators.text import quality_score

    docs = load_table(spark, "documents", sf_dir)
    q = quality_score(docs, "text", "doc_id")
    toks = docs.select(
        "doc_id", F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n_tok")
    )
    part = _global_index_part(
        q.join(toks, "doc_id"), "quality", "doc_id"
    ).transform(stage_checkpoint)
    counts = part.groupBy("pid").agg(F.count("*").alias("cnt"))
    # cumulative offsets via a triangular join on the 16-row count
    # table (broadcast both ways) — not even a reduced-input window,
    # so the plan carries zero single-partition WindowExec nodes
    c2 = counts.select(F.col("pid").alias("pid2"), F.col("cnt").alias("cnt2"))
    offsets = (
        counts.join(F.broadcast(c2), F.col("pid2") <= F.col("pid"))
        .groupBy("pid", "cnt")
        .agg(F.sum("cnt2").alias("cum"))
        .select("pid", (F.col("cum") - F.col("cnt")).alias("offset"))
        .crossJoin(F.broadcast(part.groupBy().agg(F.count("*").alias("n_total"))))
    )
    r = F.col("offset") + F.col("local_rn") + 1  # 1-based global rank
    n = F.col("n_total")
    base = F.floor(n / 4)
    rem = n % 4
    cut = rem * (base + 1)
    tier = (
        F.when(base == 0, r)
        .when(r <= cut, F.floor((r - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((r - 1 - cut) / base) + 1)
        .cast("int")
    )
    tiered = part.join(F.broadcast(offsets), "pid").select(
        "quality", "n_tok", tier.alias("tier")
    )
    return tiered.groupBy("tier").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


@register(
    "winnowing_fingerprints",
    oracle=f"""
    WITH _tok AS (SELECT doc_id, {OF.sql_tokens("text")} AS t FROM documents),
    _sh AS (SELECT doc_id, {OF.sql_word_shingles("t", 3)} AS s FROM _tok),
    _h AS (SELECT doc_id,
                  list_transform(s, x -> (('0x' || substr(md5(x), 1, 8))::UBIGINT)::BIGINT) AS hl
           FROM _sh WHERE len(s) >= 4),
    _w AS (
      SELECT doc_id, i AS pos, list_min(hl[i : i + 3]) AS fp
      FROM _h, LATERAL (SELECT unnest(generate_series(1, len(hl) - 3)) AS i)
    )
    SELECT doc_id, fp, min(pos)::BIGINT AS first_window
    FROM _w GROUP BY doc_id, fp
    """,
)
def winnowing_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS plagiarism-detection algorithm): hash every positional 3-gram,
    slide a window of 4 hashes, keep each window's minimum — guarantees
    any shared substring of >= (w + k - 1) tokens yields at least one
    shared fingerprint, at ~1/w the storage of full k-gram sets. The
    entire derivation is per-row array expressions (codegen, zero
    shuffles before the per-doc dedup aggregate) — the scale-relevant
    contrast with MinHash, which needs global permutation state."""
    from python_plugins_spark.functions import tokens, word_shingles

    K, W = 3, 4
    docs = load_table(spark, "documents", sf_dir)
    sh = word_shingles(tokens(F.col("text")), K)
    hashes = F.transform(
        sh, lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")
    )
    # materialize the hash array as a column BEFORE the sliding-window
    # pass: expression trees have no CSE across higher-order lambdas,
    # so slicing the raw `hashes` expression per window would re-run
    # the md5 array per window — O(n^2) hashing per document
    withh = docs.select("doc_id", hashes.alias("hl"))
    fps = F.when(
        F.size("hl") >= W,
        F.transform(
            F.sequence(F.lit(1), F.size("hl") - (W - 1)),
            lambda i: F.array_min(F.slice(F.col("hl"), i, W)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    exploded = withh.select("doc_id", F.posexplode(fps).alias("pos", "fp"))
    return exploded.groupBy("doc_id", "fp").agg(
        (F.min("pos") + 1).cast("long").alias("first_window")
    )


@register(
    "oov_rate_docs",
    oracle=f"""
    WITH _tok AS (SELECT doc_id, unnest({OF.sql_tokens("text")}) AS t FROM documents),
    _c AS (SELECT t, count(*) AS c FROM _tok GROUP BY t),
    _v AS (SELECT t FROM _c ORDER BY c DESC, t ASC LIMIT 500)
    SELECT doc_id, count(*) AS n_tok,
           round(1.0 - sum(CASE WHEN t IN (SELECT t FROM _v) THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE, 6) AS oov_rate
    FROM _tok GROUP BY doc_id
    """,
)
def oov_rate_docs(spark, sf_dir):
    """Tokenizer-vocabulary coverage gate: fraction of each document's
    tokens outside the corpus top-500 vocabulary (count desc, token asc
    tie-break — a total order, so both engines cut the same vocab).
    High OOV flags encoding damage, boilerplate markup, or
    out-of-domain text before it poisons tokenizer training. Scale
    shape: the vocabulary is a TakeOrderedAndProject top-k (heaps +
    driver merge of 500 rows) broadcast back to the exploded token
    stream — the corpus shuffles once for the per-doc aggregate."""
    from python_plugins_spark.functions import tokens

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("t").asc())
        .limit(500)
        .select("t", F.lit(1).alias("in_v"))
    )
    joined = tok.join(F.broadcast(vocab), on="t", how="left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.round(
            1.0 - F.sum(F.coalesce(F.col("in_v"), F.lit(0))) / F.count("*"), 6
        ).alias("oov_rate"),
    )


@register(
    "pack_token_budget_bins",
    oracle=f"""
    WITH _n AS (
      SELECT source, doc_id, len({OF.sql_tokens("text")}) AS n_tok FROM documents
    ),
    _b AS (
      SELECT source, n_tok,
             floor(coalesce(sum(n_tok) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 8192)::BIGINT AS bin
      FROM _n
    )
    SELECT source, bin, count(*) AS n_docs, sum(n_tok) AS total_tokens
    FROM _b GROUP BY source, bin
    """,
)
def pack_token_budget_bins(spark, sf_dir):
    """Sequence packing for training: assign documents (in deterministic
    doc_id order within each source) to consecutive ~8192-token bins by
    cumulative token count — the batch-construction step that turns a
    ragged corpus into fixed-budget training sequences. The running sum
    is a window PARTITIONED by source (each source packs independently,
    so at 100 TB no single-partition sort exists); the bin report is
    one more aggregate on the same partitioning."""
    from python_plugins_spark.functions import tokens

    docs = load_table(spark, "documents", sf_dir)
    n = docs.select("source", "doc_id", F.size(tokens(F.col("text"))).alias("n_tok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = n.select(
        "source",
        "n_tok",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / 8192)
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens")
    )


# --------------------------------------------------------------------------
# mergeable sketches (operators/sketch.py): HLL + count-min, deterministic
# across engines so the oracle validates the approximate structure exactly
# --------------------------------------------------------------------------

def _sketch_mod():
    from python_plugins_spark.operators import sketch

    return sketch


@register(
    "hll_distinct_customers",
    oracle=None,  # set below (needs the module-level helper)
)
def hll_distinct_customers(spark, sf_dir):
    """Per-orderstatus distinct-customer estimate via the deterministic
    HyperLogLog sketch (operators/sketch.py): md5-hash registers,
    bin()-length ranks, exact-integer register sum. One map-side-
    combined aggregate; the shuffle carries <= groups x 1024 register
    rows no matter how large orders is — the sketch shape that makes
    distinct-counting a 100 TB corpus a metadata-sized problem."""
    SK = _sketch_mod()
    o = load_table(spark, "orders", sf_dir)
    regs = SK.hll_registers(o, "o_custkey", ["o_orderstatus"])
    return SK.hll_estimate(regs, ["o_orderstatus"]).select(
        "o_orderstatus", F.round("est", 4).alias("est_distinct")
    )


@register(
    "hll_merge_rollup",
    oracle=None,  # set below
)
def hll_merge_rollup(spark, sf_dir):
    """Mergeability proof, cross-engine: Spark builds ONE SKETCH PER
    ORDERPRIORITY and merges them (elementwise register max) into a
    global sketch; the DuckDB oracle computes the GLOBAL sketch
    directly. The value-hash match proves sketch merging is lossless —
    the property that lets a 100 TB pipeline keep per-day sketches and
    answer any date-range distinct query without rescanning."""
    SK = _sketch_mod()
    o = load_table(spark, "orders", sf_dir)
    per_group = SK.hll_registers(o, "o_custkey", ["o_orderpriority"])
    merged = SK.hll_merge(per_group)  # drop the group -> one global sketch
    return SK.hll_estimate(merged).select(F.round("est", 4).alias("est_distinct"))


@register(
    "countmin_priority_freq",
    oracle=None,  # set below
)
def countmin_priority_freq(spark, sf_dir):
    """Count-min frequency sketch (4 x 256 md5-derived counters) built
    over orders, probed for every priority value. All-integer and
    mergeable by counter sum; the probe join broadcasts the KB-sized
    sketch. Estimates upper-bound true counts (collisions only ever
    inflate), which the sanity pytest asserts."""
    SK = _sketch_mod()
    o = load_table(spark, "orders", sf_dir)
    sk = SK.cm_sketch(o, "o_orderpriority")
    items = o.select("o_orderpriority").distinct()
    return SK.cm_point_estimate(sk, items, "o_orderpriority").select(
        "o_orderpriority", F.col("est").alias("est_freq")
    )


def _install_sketch_oracles():
    from python_plugins_spark.operators import sketch as SK

    ORACLES["hll_distinct_customers"] = f"""
        SELECT o_orderstatus, round(est, 4) AS est_distinct
        FROM ({SK.hll_oracle_sql("orders", "o_custkey", ["o_orderstatus"])})
    """
    ORACLES["hll_merge_rollup"] = f"""
        SELECT round(est, 4) AS est_distinct
        FROM ({SK.hll_oracle_sql("orders", "o_custkey")})
    """
    ORACLES["countmin_priority_freq"] = f"""
        SELECT o_orderpriority, est AS est_freq
        FROM ({SK.cm_oracle_sql("orders", "o_orderpriority",
                                "SELECT DISTINCT o_orderpriority FROM orders",
                                "o_orderpriority")})
    """


_install_sketch_oracles()


# =====================================================================
