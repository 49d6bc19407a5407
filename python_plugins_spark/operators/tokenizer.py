"""Distributed BPE tokenizer training (the public byte-pair-encoding
algorithm of Sennrich et al. 2016, as used by GPT-2/RoBERTa-style
tokenizers) — corpus mechanics for a training-data pipeline.

Shape, designed for a 100 TB corpus:

1. **Word histogram** (the only pass over the full corpus): tokenize,
   explode, groupBy(word) -> count. One shuffle; everything after
   operates on the DISTINCT-WORD table weighted by count, which is
   vocabulary-sized (~1e6 rows for web-scale corpora), not
   corpus-sized — the reason BPE training is feasible at all.
2. **Merge loop** (``num_merges`` iterations over the small vocab
   table): count adjacent symbol pairs weighted by word frequency
   (map-side-combined aggregate), pick the argmax (ties broken
   lexicographically — determinism is part of the contract), rewrite
   the symbol sequences with the merged pair. The vocab table is
   cached and re-cached every few merges; each iteration is one tiny
   aggregate + one projection, so N merges cost N small jobs, NOT N
   corpus scans.

The merge REWRITE is per-word local Python over the cached vocab
(mapInPandas): a greedy left-to-right adjacent-pair merge is
inherently sequential per word, and the vocab table is small — this is
the one place Python is the right tool, exactly like the reference
transform operator's contract.

Training output is the ranked merge table; :func:`bpe_encode_expr`
applies learned merges to new text (per-token loop, mapInPandas).
Verified against a pure-Python reference implementation in
``tests/test_operators.py`` (hand-checkable corpus) — no SQL oracle:
an iterative argmax loop is not expressible as one DuckDB query, so
this registers as a rows-only entry like IVF ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_plugins_spark.functions import tokens

_EOW = "</w>"  # end-of-word marker (the standard BPE convention)


def _merge_pair_in_seq(seq: list[str], a: str, b: str) -> list[str]:
    """Left-to-right single-pass merge of adjacent (a, b) -> a+b."""
    out: list[str] = []
    i = 0
    n = len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def bpe_train(
    df: DataFrame, text_col: str, num_merges: int
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns
    ``(merges, merges_df)`` — the ranked merge list and its DataFrame
    ``(rank, left, right, merged, pair_count)``."""
    spark = df.sparkSession

    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit(_EOW))
            ).alias("sym"),
            "cnt",
        )
    ).cache()
    vocab.count()  # materialize once; corpus is never touched again

    merges: list[tuple[str, str]] = []
    rows_out = []
    for rank in range(num_merges):
        pairs = (
            vocab.select(
                F.explode(
                    F.expr(
                        "transform(slice(sym, 1, size(sym) - 1), "
                        "(x, i) -> struct(x AS a, sym[i + 1] AS b))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((a, b))
        rows_out.append((rank, a, b, a + b, int(n)))

        def apply_merge(batches, a=a, b=b):
            import pandas as pd

            for pdf in batches:
                pdf["sym"] = [
                    _merge_pair_in_seq(list(s), a, b) for s in pdf["sym"]
                ]
                yield pdf

        new_vocab = vocab.mapInPandas(
            apply_merge,
            T.StructType(
                [
                    T.StructField("sym", T.ArrayType(T.StringType())),
                    T.StructField("cnt", T.LongType()),
                ]
            ),
        ).cache()
        new_vocab.count()
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()

    merges_df = spark.createDataFrame(
        rows_out,
        "rank int, left string, right string, merged string, pair_count long",
    )
    return merges, merges_df


def bpe_encode(df: DataFrame, text_col: str, id_col: str, merges) -> DataFrame:
    """Apply learned merges to text: ``(id, pieces array<string>,
    n_pieces)``. Per-token greedy merge loop in mapInPandas (Arrow
    batches; the merge list ships in the closure — it is tiny)."""
    merge_list = list(merges)

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("pieces", T.ArrayType(T.StringType())),
            T.StructField("n_pieces", T.IntegerType()),
        ]
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            ids, pieces_col, counts = [], [], []
            for rid, text in zip(pdf["id"], pdf["text"]):
                pieces: list[str] = []
                for w in str(text).lower().strip().split():
                    seq = list(w) + [_EOW]
                    for a, b in merge_list:
                        seq = _merge_pair_in_seq(seq, a, b)
                    pieces.extend(seq)
                ids.append(rid)
                pieces_col.append(pieces)
                counts.append(len(pieces))
            yield pd.DataFrame(
                {"id": ids, "pieces": pieces_col, "n_pieces": counts}
            )

    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        .mapInPandas(encode, out_schema)
        .withColumnRenamed("id", id_col)
    )


def bpe_train_reference(texts: list[str], num_merges: int):
    """Pure-Python reference implementation (for tests): identical
    tokenization, tie-breaks, and merge semantics."""
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                vocab[tuple(list(w) + [_EOW])] += 1
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for seq, cnt in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += cnt
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest (a, b)
        top_n = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == top_n)
        merges.append(best)
        a, b = best
        vocab = Counter(
            {
                tuple(_merge_pair_in_seq(list(seq), a, b)): cnt
                for seq, cnt in vocab.items()
            }
        )
    return merges
