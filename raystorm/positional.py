"""Positional posting lists — the AnchorTextIndexer path.

The reference's anchor indexer emits (word, targetUrl, position) triples
(``/root/reference/src/cis5550/jobs/AnchorTextIndexer.java:41-70``),
then per (term, url) merges positions into a sorted set and orders the
posting's docs by position-count (tf) descending
(``AnchorTextIndexer.java:73-76, 123-168`` ``valueProcessing``).

Here the same semantics over the transcripts corpus: body tokens with
their 0-based position among kept tokens, grouped per (term, doc) with
sorted space-joined positions, docs ranked tf-desc (tie: conv_id,
turn_idx asc) within each term — exactly the reference's posting order,
but as real columns instead of ``url:p1 p2,url2:p1`` strings.

Shape: tokenize+explode in ``map_batches`` (the ``flatMapToPair``
analog), one coarse-bucket ``groupby(hash(term) % N_BUCKETS)`` shuffle
(one group per TERM would pay per-group dispatch that dwarfs compute —
the dedup.py lesson); per-term posting assembly happens vectorized
inside each bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import corpus, normalize
from .analysis import md5int60_np
from .dedup import N_BUCKETS


def positional_postings(sf_dir: str):
    """(term, doc_rank, conv_id, turn_idx, tf, positions) per body term."""

    def explode(batch: pa.Table) -> pa.Table:
        toks, rows, pos = normalize.tokenize_with_positions(batch["text"], "body")
        r = pa.array(rows)
        bucket = (md5int60_np(toks) % N_BUCKETS).astype(np.int32) if len(toks) else np.empty(0, np.int32)
        return pa.table(
            {
                "term": pa.array(toks, pa.string()),
                "conv_id": batch["conv_id"].take(r),
                "turn_idx": batch["turn_idx"].take(r),
                "pos": pa.array(pos, pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    def build(group: pd.DataFrame) -> pd.DataFrame:
        agg = (
            group.sort_values("pos")
            .groupby(["term", "conv_id", "turn_idx"], sort=True)["pos"]
            .agg([("tf", "size"), ("positions", lambda p: " ".join(map(str, p)))])
            .reset_index()
        )
        order = np.lexsort(
            (
                agg["turn_idx"].to_numpy(),
                agg["conv_id"].to_numpy(),
                -agg["tf"].to_numpy(),
                agg["term"].to_numpy(),
            )
        )
        agg = agg.iloc[order].reset_index(drop=True)
        agg["doc_rank"] = (
            agg.groupby("term", sort=False).cumcount().to_numpy().astype(np.int32) + 1
        )
        agg["turn_idx"] = agg["turn_idx"].astype(np.int32)
        agg["tf"] = agg["tf"].astype(np.int64)
        return agg[["term", "doc_rank", "conv_id", "turn_idx", "tf", "positions"]]

    ds = corpus.transcripts_from_documents(sf_dir)
    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(build, batch_format="pandas")
    )
    return (
        out.to_pandas().sort_values(["term", "doc_rank"]).reset_index(drop=True)
    )


def positional_postings_sql() -> str:
    replaces, keep = normalize._MODE_RULES["body"]
    expr = "lower(text)"
    for pat, rep in replaces:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    keep_cond = normalize.tokens_keep_sql("term", "body")
    return f"""
WITH transcripts AS ({corpus.transcripts_sql()}),
toks AS (
  SELECT conv_id, turn_idx, u.term, u.ord
  FROM (SELECT conv_id, turn_idx, string_split(trim({expr}), ' ') AS parts
        FROM transcripts) t,
       LATERAL (SELECT unnest(t.parts) AS term,
                       unnest(generate_series(1, len(t.parts))) AS ord) u
),
kept AS (
  SELECT conv_id, turn_idx, term,
         row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ord) - 1 AS pos
  FROM toks WHERE {keep_cond}
),
posting AS (
  SELECT term, conv_id, turn_idx, CAST(count(*) AS BIGINT) AS tf,
         string_agg(CAST(pos AS VARCHAR), ' ' ORDER BY pos) AS positions
  FROM kept GROUP BY term, conv_id, turn_idx
)
SELECT term,
       CAST(row_number() OVER (PARTITION BY term
            ORDER BY tf DESC, conv_id, turn_idx) AS INTEGER) AS doc_rank,
       conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, tf, positions
FROM posting
ORDER BY term, doc_rank
"""
