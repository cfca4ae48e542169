"""Deduplication operators over the ``documents`` table.

Exact, MinHash+LSH, SimHash and n-gram-Jaccard dedup — the training-
data-pipeline near-dup family the task brief adds beyond the reference's
own exact-only dedup (``/root/reference/src/cis5550/flame/
FlameRDDImpl.java:48-52`` ``distinct()``; ``Crawler.java:279-298``
crawl-dedup anti-join; SURVEY.md §2.2 "No near-dup (simhash etc.)
exists").

Every stage is Ray-Data-shaped for scale:

- shingling / hashing: stateless Arrow ``map_batches`` (hash work is
  per *unique* token, not per row — ``analysis.md5int60_np``);
- candidate generation: coarse-bucket ``groupby`` shuffle (``N_BUCKETS``
  keys per band, not one group per distinct signature — per-group
  dispatch overhead dominates tiny groups); exact signature/band-key
  matching and pair explosion happen vectorized inside ``map_groups``;
- verification (MinHash): exact Jaccard over *candidate docs only* — one
  filtered shingle pass; under ``MAX_BROADCAST_PAIRS`` the candidate
  shingles broadcast as a CSR (numpy buffers) and each LSH-pair batch
  intersects vectorized; past the cap everything switches to pure
  hash-shuffle joins with zero driver state.  n-gram Jaccard's union
  sizes always arrive by joins (no corpus-sized driver map anywhere).

Exact DuckDB mirrors are emitted for the driver oracle; all hashes are
the shared 60-bit md5 (``analysis.md5int60``) so both sides agree.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import (
    md5int60,
    md5int60_np,
    md5int60_sql,
    round_half_up,
    split_words_arrow,
)

ROUND = 6

#: n-gram Jaccard / MinHash verification threshold
JACCARD_T = 0.1
#: MinHash permutations / LSH banding (8 bands x 2 rows)
N_PERMS = 16
N_BANDS = 8
#: SimHash: 48-bit (fits BIGINT for the SQL mirror), near-dup at
#: hamming <= 4; 4 blocking bands of 12 bits.  Wider than 32 bits so
#: near-uniform word-bag documents don't all collide into a few bands,
#: and tight enough that the hamming ball stays near-dup-sized on them.
SIMHASH_BITS = 48
HAMMING_T = 4
#: embedding near-dup threshold
COSINE_T = 0.4

#: coarse shuffle buckets for candidate/dedup groupbys — group keys are
#: (hash % N_BUCKETS), NOT the full hash/signature: huge numbers of
#: tiny one-doc groups would pay per-group dispatch overhead, while 64
#: buckets keep groups block-sized; the exact hash/signature match
#: happens vectorized (run detection over a lexsort) inside each bucket.
N_BUCKETS = 64

#: Carter-Wegman permutation family for MinHash: sig[p] = min over
#: shingles of (A[p] * (md5int60(sh) % P) + B[p]) % P with the Mersenne
#: prime P = 2^31-1.  One md5 per unique shingle (not one per
#: perm x shingle — 16x less hash work); the affine maps stay inside
#: int64 on both numpy and DuckDB BIGINT (a*(h%P) < 2^62, no overflow).
#: Constants derive from the shared md5 so both engines can inline the
#: same literals.
MERSENNE31 = (1 << 31) - 1
PERM_A = tuple(
    1 + md5int60(f"minhash-a|{p}") % (MERSENNE31 - 1) for p in range(N_PERMS)
)
PERM_B = tuple(md5int60(f"minhash-b|{p}") % MERSENNE31 for p in range(N_PERMS))

_BROADCAST_CACHE: dict = {}


def _get_ref(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


# ---------------------------------------------------------------------------
# shingling (shared by ngram-Jaccard and MinHash; pinned vs SQL)
# ---------------------------------------------------------------------------


def shingle_row(text: str) -> list[str]:
    """Distinct 3-word shingles; whole text if shorter than 3 words.
    (Reference implementation — tests pin `_shingle_hashes` against it.)"""
    words = (text or "").lower().split(" ")
    n = max(1, len(words) - 2)
    return sorted({" ".join(words[i : i + 3]) for i in range(n)})


def _shingle_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """String column -> (row_idx, sh_hash) for every 3-word shingle
    occurrence (NOT deduped) — fully vectorized.

    Trigram strings are built with one Arrow ``binary_join_element_wise``
    over three shifted views of the flattened word array; rows shorter
    than 3 words emit their whole text as the single shingle (matching
    ``shingle_row``); hashing is per *unique* shingle (``md5int60_np``).
    """
    words, row = split_words_arrow(texts)
    nw = len(row)
    parts_s, parts_r = [], []
    if nw >= 3:
        valid = row[:-2] == row[2:]
        if valid.any():
            tri = pc.binary_join_element_wise(
                words.slice(0, nw - 2),
                words.slice(1, nw - 2),
                words.slice(2, nw - 2),
                " ",
            ).filter(pa.array(valid))
            parts_s.append(tri.to_numpy(zero_copy_only=False))
            parts_r.append(row[:-2][valid])
    # short rows: L==1 -> the word; L==2 -> the 2-word join
    n_rows = int(row[-1]) + 1 if nw else 0
    counts = np.bincount(row, minlength=n_rows) if nw else np.empty(0, np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1] if nw else counts
    one = np.flatnonzero(counts == 1)
    if len(one):
        parts_s.append(
            words.take(pa.array(starts[one])).to_numpy(zero_copy_only=False)
        )
        parts_r.append(one)
    two = np.flatnonzero(counts == 2)
    if len(two):
        bi = pc.binary_join_element_wise(
            words.take(pa.array(starts[two])),
            words.take(pa.array(starts[two] + 1)),
            " ",
        )
        parts_s.append(bi.to_numpy(zero_copy_only=False))
        parts_r.append(two)
    if not parts_s:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    sh = np.concatenate(parts_s)
    r = np.concatenate(parts_r).astype(np.int64)
    return r, md5int60_np(sh)


def _shingle_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, sh_hash) distinct shingle rows."""
    rows, h = _shingle_hashes(batch["text"])
    if len(rows) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "sh_hash": pa.array([], pa.int64()),
            }
        )
    # per-(row, hash) dedup via integer keys (vocab-bounded unique)
    uniq_h, codes = np.unique(h, return_inverse=True)
    ukey = np.unique(rows * len(uniq_h) + codes)
    r = ukey // len(uniq_h)
    hh = uniq_h[ukey % len(uniq_h)]
    did = batch["doc_id"].to_numpy(zero_copy_only=False)[r]
    return pa.table(
        {
            "doc_id": pa.array(did, pa.int64()),
            "sh_hash": pa.array(hh, pa.int64()),
        }
    )


SHINGLES_SQL = f"""
shingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(d.parts, s.i, s.i + 2), ' ') AS sh
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS parts FROM documents) d,
       LATERAL (SELECT unnest(generate_series(1, greatest(1, len(d.parts) - 2))) AS i) s
),
shingle_hashes AS (
  SELECT doc_id, {md5int60_sql('sh')} AS sh_hash FROM shingles
)"""


# ---------------------------------------------------------------------------
# exact dedup  (hash-partition + per-group first — SURVEY.md §2.2 distinct)
# ---------------------------------------------------------------------------


def dedup_exact(sf_dir: str):
    """Assign each document to its exact-duplicate group.

    Output: (doc_id, rep_doc_id, group_size) — rep = min doc_id of the
    group of identical texts.  ONE hash-bucket shuffle (coarse
    ``h % N_BUCKETS`` keys so groups stay block-sized, not
    one-per-distinct-text), then a vectorized pandas groupby inside each
    bucket — same-hash rows are co-located, so no join back.  The 100 TB
    shape: the hash is 60-bit uniform, so buckets spread evenly and no
    driver-side state exists.
    """

    def hash_batch(batch: pa.Table) -> pa.Table:
        h = np.array([md5int60(t or "") for t in batch["text"].to_pylist()], np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": pa.array(h, pa.int64()),
                "bucket": pa.array((h % N_BUCKETS).astype(np.int32)),
            }
        )

    def rep_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("h")["doc_id"]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "rep_doc_id": gb.transform("min").to_numpy(np.int64),
                "group_size": gb.transform("size").to_numpy(np.int64),
            }
        )

    grouped = (
        _docs(sf_dir)
        .map_batches(hash_batch, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rep_in_bucket, batch_format="pandas")
    )
    pdf = grouped.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pdf[["doc_id", "rep_doc_id", "group_size"]]


#: prior-snapshot membership predicate for the novelty filter: docs
#: with doc_id % 3 == 0 play the already-ingested corpus, the rest are
#: the incoming batch (deterministic, SQL-mirrorable split)
NOVEL_PRIOR_MOD = 3

#: canonical-key width for the novelty filter: docs are "the same" when
#: their first N single-space words agree (same-lead dedup — the
#: canonicalized-URL/headline idiom; exact-text hashing is the
#: degenerate case and matches nothing on this corpus, where no two
#: docs are byte-identical but leads do repeat)
NOVEL_PREFIX_WORDS = 8


def dedup_novel(sf_dir: str):
    """Incremental (novelty) dedup: filter an INCOMING batch against a
    PRIOR snapshot — the shape every continuously-ingesting training
    pipeline runs ("drop what we already have") that a whole-corpus
    dedup can't express.  Incoming docs are novel iff no prior doc
    shares their canonical key (hash of the first
    ``NOVEL_PREFIX_WORDS`` words); duplicates report the smallest
    matching prior doc_id.

    Same scale shape as :func:`dedup_exact`: ONE coarse hash-bucket
    shuffle co-locates prior and incoming rows with equal hashes, so
    novelty resolves vectorized inside each bucket with NO join and no
    driver-side prior-set state — at 100 TB the prior snapshot streams
    exactly like the incoming batch.  Output: (doc_id, novel 0/1,
    dup_of prior id or -1), incoming rows only.  Gate ``dedup_novel``;
    oracle :data:`DEDUP_NOVEL_SQL`.
    """

    def hash_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        h = np.array(
            [
                md5int60(" ".join((t or "").split(" ")[:NOVEL_PREFIX_WORDS]))
                for t in batch["text"].to_pylist()
            ],
            np.int64,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": pa.array(h, pa.int64()),
                "bucket": pa.array((h % N_BUCKETS).astype(np.int32)),
                "prior": pa.array((ids % NOVEL_PRIOR_MOD == 0).astype(np.int8)),
            }
        )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        pri = g[g["prior"] == 1].groupby("h")["doc_id"].min()
        inc = g[g["prior"] == 0]
        dup_of = inc["h"].map(pri)
        return pd.DataFrame(
            {
                "doc_id": inc["doc_id"].to_numpy(np.int64),
                "novel": dup_of.isna().to_numpy().astype(np.int64),
                "dup_of": dup_of.fillna(-1).to_numpy(np.int64),
            }
        )

    pdf = (
        _docs(sf_dir)
        .map_batches(hash_batch, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")  # gate-only determinism sort
        .reset_index(drop=True)
    )
    return pdf[["doc_id", "novel", "dup_of"]]


_NOVEL_KEY_SQL = (
    f"array_to_string(list_slice(string_split(text, ' '), 1, {NOVEL_PREFIX_WORDS}), ' ')"
)

DEDUP_NOVEL_SQL = f"""
WITH prior AS (
  SELECT {md5int60_sql(_NOVEL_KEY_SQL)} AS h, min(doc_id) AS dup_of
  FROM documents WHERE doc_id % {NOVEL_PRIOR_MOD} = 0 GROUP BY h
),
incoming AS (
  SELECT doc_id, {md5int60_sql(_NOVEL_KEY_SQL)} AS h
  FROM documents WHERE doc_id % {NOVEL_PRIOR_MOD} <> 0
)
SELECT i.doc_id,
       CAST(CASE WHEN p.h IS NULL THEN 1 ELSE 0 END AS BIGINT) AS novel,
       CAST(coalesce(p.dup_of, -1) AS BIGINT) AS dup_of
FROM incoming i LEFT JOIN prior p ON p.h = i.h
ORDER BY i.doc_id
"""


DEDUP_EXACT_SQL = f"""
WITH hashed AS (
  SELECT doc_id, {md5int60_sql('text')} AS h FROM documents
),
groups AS (
  SELECT h, min(doc_id) AS rep_doc_id, CAST(count(*) AS BIGINT) AS group_size
  FROM hashed GROUP BY h
)
SELECT a.doc_id, g.rep_doc_id, g.group_size
FROM hashed a JOIN groups g USING (h)
ORDER BY a.doc_id
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard  (exact pairwise over shared-shingle candidates)
# ---------------------------------------------------------------------------


def _join_parts() -> int:
    """Shuffle-join fan-out for the verify joins — the shared
    cluster-width rule (:func:`analysis.join_fanout`): cpus//2 scaled
    with the cluster, floored at 2 so low-CPU test sessions keep the
    producers fed (the aggregator-deadlock guard)."""
    from .analysis import join_fanout

    return join_fanout()


def _add_bucket(batch: pa.Table) -> pa.Table:
    h = batch["sh_hash"].to_numpy(zero_copy_only=False)
    return batch.append_column("bucket", pa.array((h % N_BUCKETS).astype(np.int32)))


def _doc_counts(shingles):
    """shingle Dataset -> (doc_id, n) per-doc shingle counts (combiner
    partials inside map_batches, then one group-cardinality shuffle)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by("doc_id").aggregate([("doc_id", "count")])

    return (
        shingles.map_batches(partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("doc_id_count", alias_name="n"))
    )


def _verify_common(common, counts):
    """(doc_a, doc_b, common) ⋈ per-doc counts -> Jaccard-filtered pairs.

    Dual path on the shared ``MAX_BROADCAST_PAIRS`` contract: under the
    cap the pair table collects (candidate-bounded by construction) and
    the count table is probed DISTRIBUTED against the broadcast
    candidate-doc set — only the candidate docs' (doc_id, n) rows reach
    the driver, where one vectorized searchsorted finishes the verify
    (two join-actor pools saved; measured 2.4 s of the 5.9 s gate).
    Past the cap union sizes arrive by two hash-shuffle
    ``Dataset.join``s against the (doc_id, n) count Dataset — NO
    corpus-sized driver structure anywhere in that path (the round-1
    all-docs broadcast map dies at billions of docs).  Both paths are
    output-identical (pytest-pinned via a forced cap=0 run).
    """
    import ray

    common = common.materialize()
    n_pairs = common.count()
    if n_pairs == 0:
        return pd.DataFrame(
            {
                "doc_a": np.empty(0, np.int64),
                "doc_b": np.empty(0, np.int64),
                "jaccard": np.empty(0),
            }
        )
    if n_pairs <= MAX_BROADCAST_PAIRS:
        pair_pdf = common.to_pandas()
        a = pair_pdf["doc_a"].to_numpy(np.int64)
        b = pair_pdf["doc_b"].to_numpy(np.int64)
        c = pair_pdf["common"].to_numpy(np.int64).astype(np.float64)
        cand = np.unique(np.concatenate([a, b]))
        cref = ray.put(cand)

        def keep_cand(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            cset = _get_ref(cref) if not isinstance(cref, np.ndarray) else cref
            return batch.filter(pa.array(np.isin(ids, cset)))

        cnt = counts.map_batches(keep_cand, batch_format="pyarrow").to_pandas()
        d = cnt["doc_id"].to_numpy(np.int64)
        n = cnt["n"].to_numpy(np.int64).astype(np.float64)
        order = np.argsort(d)
        d, n = d[order], n[order]
        # found-mask discipline (the DocValues.lookup lesson): a
        # candidate missing from the counts table must fail loudly, not
        # silently read a neighboring doc's n
        pa_pos = np.searchsorted(d, a).clip(0, max(len(d) - 1, 0))
        pb_pos = np.searchsorted(d, b).clip(0, max(len(d) - 1, 0))
        if not len(d) or not (np.array_equal(d[pa_pos], a) and np.array_equal(d[pb_pos], b)):
            missing = np.setdiff1d(np.concatenate([a, b]), d)
            raise RuntimeError(
                f"verify: {len(missing)} candidate doc_ids missing from "
                f"shingle counts (e.g. {missing[:5].tolist()})"
            )
        na = n[pa_pos]
        nb = n[pb_pos]
        j = round_half_up(c / (na + nb - c), ROUND)
        keep = j >= JACCARD_T
        out = pd.DataFrame(
            {"doc_a": a[keep], "doc_b": b[keep], "jaccard": j[keep]}
        )
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    def rename(old, new):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns([new if c == old else c for c in b.column_names])

        return fn

    counts_a = counts.map_batches(rename("n", "na"), batch_format="pyarrow")
    counts_b = counts.map_batches(rename("n", "nb"), batch_format="pyarrow")
    j1 = common.join(
        counts_a,
        join_type="inner",
        num_partitions=_join_parts(),
        on=("doc_a",),
        right_on=("doc_id",),
    )
    j2 = j1.join(
        counts_b,
        join_type="inner",
        num_partitions=_join_parts(),
        on=("doc_b",),
        right_on=("doc_id",),
    )

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        c = batch["common"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = round_half_up(c / (na + nb - c), ROUND)
        keep = j >= JACCARD_T
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(j[keep]),
            }
        )

    out = j2.map_batches(verify, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "doc_a": np.empty(0, np.int64),
                "doc_b": np.empty(0, np.int64),
                "jaccard": np.empty(0),
            }
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


#: hot-shingle df-cap for the exact n-gram Jaccard path: a shingle in
#: more docs than this is boilerplate, not duplication evidence, and
#: its pair explosion is quadratic — runs past the cap drop with a
#: logged forgone-pair count (never silently).  Capped shingles still
#: count in the union sizes, so affected pairs see a CONSERVATIVE
#: (under-estimated) Jaccard — see _SigRunPairs for the exact bias.
SHINGLE_DF_CAP = 10_000


def dedup_ngram_jaccard(sf_dir: str):
    """All document pairs with 3-gram-shingle Jaccard >= 0.1 (exact).

    Candidates from the shingle inverted list — a coarse-bucket
    ``groupby(sh_hash % N_BUCKETS)`` shuffle (millions of one-doc
    shingle groups would pay per-group dispatch overhead), with pair
    explosion per exact-sh_hash run vectorized inside each bucket.
    Intersection counts via a pair groupby; union sizes join in from a
    distributed (doc_id, n) count table — the whole verify is Dataset
    end-to-end with no driver-side corpus state.  Ultra-hot shingles
    (df > :data:`SHINGLE_DF_CAP`) drop from the intersection counts
    with a logged forgone-pair count — the quadratic-explosion guard;
    affected pairs get a conservative under-estimate (capped shingles
    stay in the union sizes — bias documented at _SigRunPairs).  The
    oracle SQL mirrors the cap (``_verify_sql_tail(SHINGLE_DF_CAP)``)
    so the gate stays exact even on a corpus whose shingle df crosses
    it; the MinHash path below is the scale route for boilerplate-heavy
    corpora anyway.
    """
    from ray.data.aggregate import Count

    shingles = _docs(sf_dir).map_batches(_shingle_batch, batch_format="pyarrow")
    common = (
        shingles.map_batches(_add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            _SigRunPairs(["sh_hash"], df_cap=SHINGLE_DF_CAP), batch_format="pandas"
        )
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="common"))
    )
    return _verify_common(common, _doc_counts(shingles))


def _verify_sql_tail(df_cap: int | None = None) -> str:
    """pair_common + sh_counts CTEs.  ``df_cap`` mirrors the engine's
    SHINGLE_DF_CAP in SQL (shingles over the cap leave the INTERSECTION
    counts but stay in the union sizes — the exact _SigRunPairs bias),
    so a corpus whose shingle df crosses the cap diverges in NEITHER
    engine instead of failing the gate with an opaque VALUES diff.
    The MinHash verify path is uncapped and uses the bare tail."""
    cap = (
        f"""
  WHERE a.sh_hash IN (SELECT sh_hash FROM shingle_hashes
                      GROUP BY sh_hash HAVING count(*) <= {df_cap})"""
        if df_cap is not None
        else ""
    )
    return f"""
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM shingle_hashes a JOIN shingle_hashes b
    ON a.sh_hash = b.sh_hash AND a.doc_id < b.doc_id{cap}
  GROUP BY 1, 2
),
sh_counts AS (SELECT doc_id, count(*) AS n FROM shingle_hashes GROUP BY doc_id)
"""


_VERIFY_SQL_TAIL = _verify_sql_tail()


def dedup_ngram_jaccard_sql() -> str:
    return f"""
WITH {SHINGLES_SQL},
{_verify_sql_tail(SHINGLE_DF_CAP)}
SELECT p.doc_a, p.doc_b,
       round(p.common * 1.0 / (ca.n + cb.n - p.common), {ROUND}) AS jaccard
FROM pair_common p
JOIN sh_counts ca ON ca.doc_id = p.doc_a
JOIN sh_counts cb ON cb.doc_id = p.doc_b
WHERE round(p.common * 1.0 / (ca.n + cb.n - p.common), {ROUND}) >= {JACCARD_T}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# MinHash + LSH  (shingle -> minhash -> band -> bucket groupby -> verify)
# ---------------------------------------------------------------------------


def _minhash_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> one (doc_id, band, bucket, sig0, sig1) row per band.

    sig[p] = min over shingles of the PERM_A/PERM_B affine map of
    md5int60(shingle) mod 2^31-1; bands of N_PERMS/N_BANDS rows; docs
    sharing every sig value of a band are LSH candidates.
    """
    rows_per_band = N_PERMS // N_BANDS
    n = len(batch)
    dids = batch["doc_id"].to_numpy(zero_copy_only=False)
    r, h = _shingle_hashes(batch["text"])  # occurrences; min over dups == min
    sigs = np.full((n, N_PERMS), np.iinfo(np.int64).max, np.int64)
    if len(h):
        # one md5 per unique shingle; N_PERMS perms via affine mod-prime maps
        h = h % MERSENNE31
        for p in range(N_PERMS):
            hp = (PERM_A[p] * h + PERM_B[p]) % MERSENNE31
            np.minimum.at(sigs[:, p], r, hp)
    cols = {
        "doc_id": np.repeat(dids.astype(np.int64), N_BANDS),
        "band": np.tile(np.arange(N_BANDS, dtype=np.int32), n),
    }
    for j in range(rows_per_band):
        cols[f"sig{j}"] = sigs[:, [b * rows_per_band + j for b in range(N_BANDS)]].reshape(-1)
    cols["bucket"] = (cols["sig0"] % N_BUCKETS).astype(np.int32)
    return pa.table(cols)


class _SigRunPairs:
    """map_groups fn over a (band, bucket) coarse group: emit candidate
    pairs for each run of rows with identical full signatures.

    ``df_cap`` (the hot-shingle guard): a run longer than the cap is a
    stop-shingle — boilerplate living in thousands of docs, whose
    quadratic pair explosion is exactly the 100 TB failure mode — so it
    is DROPPED, and the drop is logged with run length and forgone pair
    count (the no-silent-caps rule).  Exact bias of the cap: a capped
    shingle leaves the INTERSECTION counts but stays in the per-doc
    UNION sizes, so every pair sharing one computes a strictly SMALLER
    Jaccard than the uncapped truth — a conservative (never inflated)
    estimate; pairs that needed the capped shingle to cross JACCARD_T
    are missed, and pairs sharing ONLY capped shingles vanish entirely
    (MinHash is the stated scale route for such corpora)."""

    def __init__(self, sig_cols, df_cap: int | None = None):
        self.__name__ = "SigRunPairs"
        self.sig_cols = sig_cols
        self.df_cap = df_cap

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        d = group["doc_id"].to_numpy(np.int64)
        sigs = [group[c].to_numpy(np.int64) for c in self.sig_cols]
        order = np.lexsort((d, *reversed(sigs)))
        d = d[order]
        sigs = [s[order] for s in sigs]
        new = np.zeros(len(d), bool)
        new[:1] = True
        for s in sigs:
            new[1:] |= s[1:] != s[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(d))
        out_a, out_b = [], []
        dropped_runs = dropped_pairs = 0
        for st, en in zip(starts, ends):
            k = en - st
            if k < 2:
                continue
            if self.df_cap is not None and k > self.df_cap:
                dropped_runs += 1
                dropped_pairs += k * (k - 1) // 2
                continue
            a, b = np.triu_indices(k, k=1)
            out_a.append(d[st:en][a])
            out_b.append(d[st:en][b])
        if dropped_runs:
            import logging

            logging.getLogger("raystorm.dedup").warning(
                "df-cap dropped %d hot signature run(s) (> %d docs): "
                "%d candidate pairs forgone",
                dropped_runs,
                self.df_cap,
                dropped_pairs,
            )
        if not out_a:
            return pd.DataFrame(
                {"doc_a": np.empty(0, np.int64), "doc_b": np.empty(0, np.int64)}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        )


class CandShingles:
    """documents batch -> shingle rows for candidate docs only (the
    candidate doc-id array broadcasts once via ``ray.put``)."""

    def __init__(self, dref):
        self.__name__ = "CandShingles"
        self.dref = dref
        self._docs = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._docs is None:
            obj = self.dref
            self._docs = obj if isinstance(obj, np.ndarray) else _get_ref(obj)
        keep = np.isin(batch["doc_id"].to_numpy(zero_copy_only=False), self._docs)
        return _shingle_batch(batch.filter(pa.array(keep)))


#: above this many LSH candidate pairs the broadcast verify switches to
#: the shuffle-join verify (`_verify_common`) — the bounded-collect
#: contract made explicit: ~2M pairs ≈ 32 MB of int64s on the driver
MAX_BROADCAST_PAIRS = 2_000_000


def dedup_minhash(sf_dir: str):
    """MinHash(16)+LSH(8x2) near-dup pairs, verified at Jaccard >= 0.1.

    The scale path for near-dup: candidate volume is bucket-bounded, no
    shingle-join blowup.  Output is the *verified* (exact-Jaccard)
    subset of LSH candidates — deterministic, and mirrored exactly by
    the SQL oracle (same permutation hashes, same banding).

    Verify: LSH pairs are deduped by a pair groupby (a Dataset — no
    unconditional driver collect); the exact-Jaccard pass recomputes
    shingles for *candidate docs only* (one filtered pass) and derives
    pair intersections by the same bucketed run-pair explosion.  While
    the pair count is under ``MAX_BROADCAST_PAIRS`` the (pair, na, nb)
    table is assembled driver-side and broadcast into a vectorized
    merge-verify (the fast path — all structures candidate-bounded);
    past the cap the flow switches to pure shuffle joins
    (``_verify_common``) with no driver pair state at all.
    """
    import ray
    from ray.data.aggregate import Count

    import ray.data as rd

    rows_per_band = N_PERMS // N_BANDS
    sigs = _docs(sf_dir).map_batches(_minhash_batch, batch_format="pyarrow")
    raw_pairs = (
        sigs.groupby(["band", "bucket"])
        .map_groups(
            _SigRunPairs([f"sig{j}" for j in range(rows_per_band)]),
            batch_format="pandas",
        )
        .materialize()
    )
    n_raw = raw_pairs.count()
    if n_raw == 0:
        return pd.DataFrame(
            {
                "doc_a": np.empty(0, np.int64),
                "doc_b": np.empty(0, np.int64),
                "jaccard": np.empty(0),
            }
        )
    broadcast_ok = n_raw <= MAX_BROADCAST_PAIRS
    if broadcast_ok:
        # bounded collect: multi-band duplicate pairs dedup driver-side
        # (cheaper than a pair-groupby shuffle at this volume)
        pair_pdf = (
            raw_pairs.to_pandas()
            .drop_duplicates(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        pairs = rd.from_pandas(pair_pdf)
        doc_ids = np.unique(
            np.concatenate(
                [
                    pair_pdf["doc_a"].to_numpy(np.int64),
                    pair_pdf["doc_b"].to_numpy(np.int64),
                ]
            )
        )
    else:
        # past the cap the dedup is a pair groupby (stays a Dataset)
        pairs = (
            raw_pairs.groupby(["doc_a", "doc_b"])
            .count()
            .drop_columns(["count()"])
            .materialize()
        )
        # ids-only collect (strictly smaller than the pair set)
        def _docs_of(col):
            def fn(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return pa.table({"doc_id": pc.unique(b[col])})

            return fn

        doc_ids = np.unique(
            np.concatenate(
                [
                    pairs.map_batches(_docs_of(c), batch_format="pyarrow")
                    .to_pandas()["doc_id"]
                    .to_numpy(np.int64)
                    for c in ("doc_a", "doc_b")
                ]
            )
        )
    dref = ray.put(doc_ids)
    cand_shingles = _docs(sf_dir).map_batches(
        CandShingles(dref), batch_format="pyarrow"
    )
    if not broadcast_ok:
        # shuffle path: pair intersections over candidate docs via the
        # same coarse-bucket run explosion as the ngram path, then keep
        # only true LSH pairs and join in per-doc counts — no driver
        # pair/shingle state at all
        sh_common = (
            cand_shingles.map_batches(_add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_SigRunPairs(["sh_hash"]), batch_format="pandas")
            .groupby(["doc_a", "doc_b"])
            .aggregate(Count(alias_name="common"))
        )
        common_lsh = sh_common.join(
            pairs,
            join_type="inner",
            num_partitions=_join_parts(),
            on=("doc_a", "doc_b"),
        )
        return _verify_common(common_lsh, _doc_counts(cand_shingles))

    # fast path: ONE collected candidate-shingle pass broadcast as a
    # CSR (sorted doc ids -> extents into a sorted hash array — numpy
    # buffers, no Python objects), verified per LSH-pair batch.  The
    # all-shared-shingle pair explosion the shuffle path uses is far
    # larger than the LSH pair set on near-dup-heavy corpora (measured
    # 5x wall time at sf0.1) — pair-batch intersection touches exactly
    # the pairs that need verifying.
    sh_pdf = cand_shingles.to_pandas()
    d = sh_pdf["doc_id"].to_numpy(np.int64)
    h = sh_pdf["sh_hash"].to_numpy(np.int64)
    order = np.lexsort((h, d))
    d, h = d[order], h[order]
    doc_u, starts = np.unique(d, return_index=True)
    ends = np.append(starts[1:], len(d))
    csr_ref = ray.put((doc_u, starts, ends, h))

    class VerifyCSR:
        def __init__(self, ref):
            self.__name__ = "VerifyCSR"
            self.ref = ref
            self._m = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._m is None:
                obj = self.ref
                self._m = obj if isinstance(obj, tuple) else _get_ref(obj)
            doc_u, starts, ends, h = self._m
            a = batch["doc_a"].to_numpy(zero_copy_only=False)
            b = batch["doc_b"].to_numpy(zero_copy_only=False)
            ia = np.searchsorted(doc_u, a)
            ib = np.searchsorted(doc_u, b)
            na = (ends[ia] - starts[ia]).astype(np.float64)
            nb = (ends[ib] - starts[ib]).astype(np.float64)
            common = np.fromiter(
                (
                    np.intersect1d(
                        h[starts[x] : ends[x]], h[starts[y] : ends[y]],
                        assume_unique=True,
                    ).size
                    for x, y in zip(ia, ib)
                ),
                np.float64,
                len(a),
            )
            j = round_half_up(common / (na + nb - common), ROUND)
            keep = j >= JACCARD_T
            return pa.table(
                {
                    "doc_a": pa.array(a[keep], pa.int64()),
                    "doc_b": pa.array(b[keep], pa.int64()),
                    "jaccard": pa.array(j[keep]),
                }
            )

    out = pairs.map_batches(VerifyCSR(csr_ref), batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "doc_a": np.empty(0, np.int64),
                "doc_b": np.empty(0, np.int64),
                "jaccard": np.empty(0),
            }
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def dedup_minhash_sql() -> str:
    rows_per_band = N_PERMS // N_BANDS
    perm_rows = ", ".join(
        f"({p}, {PERM_A[p]}, {PERM_B[p]})" for p in range(N_PERMS)
    )
    return f"""
WITH {SHINGLES_SQL},
perms(p, a, b) AS (VALUES {perm_rows}),
sigs AS (
  SELECT s.doc_id, pr.p,
         min((pr.a * (s.sh_hash % {MERSENNE31}) + pr.b) % {MERSENNE31}) AS mh
  FROM shingle_hashes s CROSS JOIN perms pr
  GROUP BY s.doc_id, pr.p
),
bands AS (
  SELECT doc_id, CAST(p // {rows_per_band} AS INTEGER) AS band,
         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY p) AS band_sig
  FROM sigs GROUP BY doc_id, CAST(p // {rows_per_band} AS INTEGER)
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
{_VERIFY_SQL_TAIL}
SELECT p.doc_a, p.doc_b,
       round(p.common * 1.0 / (ca.n + cb.n - p.common), {ROUND}) AS jaccard
FROM pair_common p
JOIN candidates c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
JOIN sh_counts ca ON ca.doc_id = p.doc_a
JOIN sh_counts cb ON cb.doc_id = p.doc_b
WHERE round(p.common * 1.0 / (ca.n + cb.n - p.common), {ROUND}) >= {JACCARD_T}
ORDER BY p.doc_a, p.doc_b
"""


# ---------------------------------------------------------------------------
# SimHash  (48-bit tf-weighted; hamming-ball near-dup)
# ---------------------------------------------------------------------------


def _simhash_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, simhash) — 48-bit, vectorized bit accumulation."""
    n = len(batch)
    out = np.zeros(n, np.int64)
    # vectorized single-space split, '' tokens kept — matches the SQL
    # mirror's string_split(lower(text), ' ') word multiset exactly
    warrow, r = split_words_arrow(batch["text"])
    if len(r):
        h = md5int60_np(warrow.to_numpy(zero_copy_only=False)) & (
            (1 << SIMHASH_BITS) - 1
        )
        bits = ((h[:, None] >> np.arange(SIMHASH_BITS)) & 1) * 2 - 1  # ±1
        acc = np.zeros((n, SIMHASH_BITS), np.int64)
        np.add.at(acc, r, bits)
        out = ((acc > 0).astype(np.int64) << np.arange(SIMHASH_BITS)).sum(axis=1)
    return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.int64())})


def simhash_docs(sf_dir: str, sort: bool = True):
    """Per-document 48-bit tf-weighted SimHash."""
    out = _docs(sf_dir).map_batches(_simhash_batch, batch_format="pyarrow")
    # gate-only determinism sort; sort=False for production streams
    return out.sort("doc_id") if sort else out


def simhash_docs_sql() -> str:
    return f"""
WITH words AS (
  SELECT doc_id, w, count(*) AS tf FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) GROUP BY doc_id, w
),
wh AS (
  SELECT doc_id, tf, {md5int60_sql('w')} & {(1 << SIMHASH_BITS) - 1} AS h FROM words
),
v AS (
  SELECT doc_id, b.j,
         sum(CASE WHEN (h >> b.j) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM wh CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS j) b
  GROUP BY doc_id, b.j
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS simhash
FROM v GROUP BY doc_id ORDER BY doc_id
"""


def dedup_simhash(sf_dir: str):
    """Document pairs within hamming distance <= HAMMING_T (4) of each
    other's 48-bit SimHash.

    Candidates via 4 bit-bands of 12 bits (any shared band -> candidate;
    standard SimHash blocking), verified by exact hamming distance.
    Scale shape: band groupby, no full cross join.
    """
    n_bands, band_bits = 4, SIMHASH_BITS // 4
    sims = _docs(sf_dir).map_batches(_simhash_batch, batch_format="pyarrow")

    def explode_bands(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        s = batch["simhash"].to_numpy(zero_copy_only=False)
        mask = (1 << band_bits) - 1
        ds_, bands_, keys_, sh_ = [], [], [], []
        for b in range(n_bands):
            ds_.append(d)
            bands_.append(np.full(len(d), b, np.int32))
            keys_.append((s >> (b * band_bits)) & mask)
            sh_.append(s)
        keys = np.concatenate(keys_)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(ds_), pa.int64()),
                "band": pa.array(np.concatenate(bands_), pa.int32()),
                # coarse shuffle key (see N_BUCKETS): exact band_key match
                # is re-established inside the group, vectorized
                "bucket": pa.array((keys % N_BUCKETS).astype(np.int32)),
                "band_key": pa.array(keys, pa.int64()),
                "simhash": pa.array(np.concatenate(sh_), pa.int64()),
            }
        )

    class BandPairs:
        """(band, bucket) coarse group -> hamming-verified pairs from each
        run of rows sharing the exact band_key."""

        def __init__(self):
            self.__name__ = "BandPairs"

        def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
            d = group["doc_id"].to_numpy(np.int64)
            key = group["band_key"].to_numpy(np.int64)
            s = group["simhash"].to_numpy(np.int64)
            order = np.lexsort((d, key))
            d, key, s = d[order], key[order], s[order]
            new = np.zeros(len(d), bool)
            new[:1] = True
            new[1:] = key[1:] != key[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(d))
            ia, ib = [], []
            for st, en in zip(starts, ends):
                k = en - st
                if k < 2:
                    continue
                a, b = np.triu_indices(k, k=1)
                ia.append(a + st)
                ib.append(b + st)
            if not ia:
                return pd.DataFrame(
                    {"doc_a": np.empty(0, np.int64), "doc_b": np.empty(0, np.int64), "hamming": np.empty(0, np.int64)}
                )
            a = np.concatenate(ia)
            b = np.concatenate(ib)
            x = np.bitwise_xor(s[a], s[b]).astype(np.uint64)
            # vectorized popcount (hot: buckets can hold thousands of docs)
            ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(
                axis=1
            ).astype(np.int64)
            keep = ham <= HAMMING_T
            return pd.DataFrame(
                {"doc_a": d[a][keep], "doc_b": d[b][keep], "hamming": ham[keep]}
            )

    pairs = (
        sims.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(BandPairs(), batch_format="pandas")
    )
    # a pair can match in several bands -> keep its min hamming; pair
    # volume is hamming-ball-bounded, so this dedup is driver-small
    pdf = pairs.to_pandas()
    pdf = (
        pdf.groupby(["doc_a", "doc_b"], as_index=False)["hamming"].min()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    return pdf


def dedup_simhash_sql() -> str:
    band_bits = SIMHASH_BITS // 4
    sim_cte = simhash_docs_sql().replace("ORDER BY doc_id", "")
    return f"""
WITH sims AS ({sim_cte}),
bands AS (
  SELECT doc_id, simhash, b.band,
         (simhash >> (b.band * {band_bits})) & {(1 << band_bits) - 1} AS band_key
  FROM sims CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sa::UBIGINT, sb::UBIGINT)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(sa::UBIGINT, sb::UBIGINT)) <= {HAMMING_T}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup  (block matmul vs broadcast matrix)
# ---------------------------------------------------------------------------


def dedup_embedding(sf_dir: str):
    """Vector pairs with cosine similarity >= 0.4 over ``embeddings``.

    Each batch computes a (batch x all) cosine block against the
    broadcast normalized matrix (one ``ray.put``, read once per worker)
    — vectorized matmul, upper-triangle only via vec_id ordering.  At
    100 TB the broadcast side becomes the IVF/LSH-bucketed variant in
    similarity.py; this operator is the exact baseline.
    """
    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    import pyarrow.parquet as pq

    # streamed matrix build: batch-at-a-time read + normalize — the
    # driver never holds the raw Arrow table and the float64 copy at
    # once.  float64 BEFORE normalizing — float32 normalization injects
    # ~1e-7 error that flips 6-decimal rounding vs the DOUBLE-cast SQL
    # mirror.
    ids_l, mats = [], []
    for b in pq.ParquetFile(path).iter_batches(
        columns=["vec_id", "embedding"], batch_size=8192
    ):
        ids_l.append(b.column(0).to_numpy())
        m = np.vstack(b.column(1).to_numpy(zero_copy_only=False)).astype(np.float64)
        mats.append(m / np.linalg.norm(m, axis=1, keepdims=True))
    ids = np.concatenate(ids_l)
    mat = np.vstack(mats)
    ref = ray.put((ids, mat))

    class Block:
        def __init__(self, ref):
            self.ref = ref
            self._m = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._m is None:
                obj = self.ref
                self._m = _get_ref(obj) if not isinstance(obj, tuple) else obj
            all_ids, all_mat = self._m
            bid = batch["vec_id"].to_numpy(zero_copy_only=False)
            bm = np.vstack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
            sims = round_half_up(bm @ all_mat.T, ROUND)
            # threshold AFTER rounding — the SQL mirror filters on
            # round(cosine, 6) >= T, so a true cosine in
            # [T - 5e-7, T) must be kept here too
            keep = (sims >= COSINE_T) & (bid[:, None] < all_ids[None, :])
            r, c = np.nonzero(keep)
            return pa.table(
                {
                    "vec_a": pa.array(bid[r], pa.int64()),
                    "vec_b": pa.array(all_ids[c], pa.int64()),
                    "cosine": pa.array(sims[r, c]),
                }
            )

    out = (
        rd.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(Block(ref), batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


DEDUP_EMBEDDING_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), {ROUND}) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), {ROUND}) >= {COSINE_T}
ORDER BY vec_a, vec_b
"""


#: multi-probe width for IVF near-dup: each vector lands in its
#: IVF_ASSIGN closest cells, so pairs straddling one cell boundary are
#: still caught (recall 0.35 -> ~0.6 on the sf data vs single-probe)
IVF_ASSIGN = 2


def dedup_embedding_ivf(sf_dir: str):
    """IVF-bucketed embedding near-dup — the 100 TB path.

    ``dedup_embedding`` above is all-pairs by construction (broadcast
    matrix x every batch) and stays the exact sf-scale oracle; this
    variant reuses the IVF machinery from similarity.py: every vector
    is assigned to its IVF_ASSIGN nearest coarse centroids (broadcast
    codebook, one matmul per batch), pairs form ONLY within a shared
    cell (a cell-keyed ``groupby`` — no cross join, no corpus
    broadcast), and each pair is verified by exact rounded cosine
    >= COSINE_T.  Recall < 1 by design (near-dups sharing no probed
    cell are missed) — pytest pins the measured recall vs the exact
    baseline and the subset property.
    """
    import ray
    import ray.data as rd

    from . import similarity

    # scale-guarded codebook: stride-derived under MAX_CODEBOOK (the
    # SQL-mirrored sf shape), fixed-k k-means-trained past it
    cids, cmat = similarity._codebook(sf_dir)
    ref = ray.put((cids, cmat))

    class AssignCell:
        def __init__(self, ref):
            self.ref = ref
            self._m = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._m is None:
                obj = self.ref
                self._m = obj if isinstance(obj, tuple) else _get_ref(obj)
            cids, cmat = self._m
            m = np.vstack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
            norm = m / np.linalg.norm(m, axis=1, keepdims=True)
            # top-IVF_ASSIGN cells per vector (rounded-cosine order,
            # centroid id asc on ties — mirrors the SQL row_number)
            sims = round_half_up(norm @ cmat.T, ROUND)
            order = np.lexsort(
                (np.broadcast_to(cids, sims.shape), -sims), axis=1
            )[:, :IVF_ASSIGN]
            n = len(m)
            rep = pa.array(np.repeat(np.arange(n), IVF_ASSIGN))
            out = batch.take(rep)
            return out.append_column(
                "cell", pa.array(cids[order].reshape(-1), pa.int64())
            )

    def cell_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy(np.int64)
        m = np.vstack(g["embedding"].to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = round_half_up(m @ m.T, ROUND)
        a, b = np.triu_indices(len(ids), k=1)
        keep = sims[a, b] >= COSINE_T
        return pd.DataFrame(
            {
                "vec_a": ids[a][keep],
                "vec_b": ids[b][keep],
                "cosine": sims[a, b][keep],
            }
        )

    out = (
        rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        .map_batches(AssignCell(ref), batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_pairs, batch_format="pandas")
        .to_pandas()
        # a pair sharing 2 probed cells appears twice with the same
        # cosine — output-sized dedup
        .drop_duplicates(["vec_a", "vec_b"])
    )
    if out.empty:
        return pd.DataFrame(
            {
                "vec_a": np.empty(0, np.int64),
                "vec_b": np.empty(0, np.int64),
                "cosine": np.empty(0),
            }
        )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def dedup_embedding_ivf_sql() -> str:
    from . import similarity

    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding FROM embeddings
  WHERE vec_id % {similarity.IVF_STRIDE} = 0
),
assign AS (
  SELECT e.vec_id, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), {ROUND}) DESC, c.cid) AS rn
  FROM embeddings e CROSS JOIN cents c
),
cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn <= {IVF_ASSIGN}),
cand AS (
  SELECT DISTINCT ca.vec_id AS vec_a, cb.vec_id AS vec_b
  FROM cells ca JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
)
SELECT p.vec_a, p.vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), {ROUND}) AS cosine
FROM cand p
JOIN embeddings a ON a.vec_id = p.vec_a
JOIN embeddings b ON b.vec_id = p.vec_b
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), {ROUND}) >= {COSINE_T}
ORDER BY vec_a, vec_b
"""


# ---------------------------------------------------------------------------
# near-dup clustering: connected components over verified pair sets
# (the "keep one document per duplicate cluster" step a dedup pipeline
# ends with — pairs alone don't say which docs to drop)
# ---------------------------------------------------------------------------

#: label-propagation pass cap — a backstop, not the expected count:
#: with per-pass driver pointer-jumping the pass count is
#: O(log(longest chain)), and the loop exits on the first no-change pass
CC_MAX_ITERS = 50


def connected_components(edges, node_ids: np.ndarray) -> np.ndarray:
    """Min-label connected components over an undirected edge Dataset.

    ``edges`` is a Dataset with int64 ``doc_a``/``doc_b`` columns whose
    values all appear in the sorted unique ``node_ids``; returns the
    component label (= min node id in the component) per node, aligned
    with ``node_ids``.

    Scale shape — the textrank broadcast-vector pattern: driver state
    is one int64 vector per *node* (nodes = docs that occur in a
    near-dup pair, orders of magnitude fewer than corpus docs; for a
    node table too big to broadcast the textrank_joined per-iteration
    ``Dataset.join`` layout applies verbatim).  Each pass streams the
    edge blocks once; every block emits only the (node index, proposed
    label) pairs that *improve* on the broadcast labels, so the driver
    pull shrinks every pass.  Between passes the driver pointer-jumps
    (``L = L[L]`` until fixpoint), which makes long chains converge in
    O(log n) passes instead of O(n).
    """
    import ray

    node_ref = ray.put(node_ids)
    labels = node_ids.copy()

    def jump(lab: np.ndarray) -> np.ndarray:
        while True:
            nxt = lab[np.searchsorted(node_ids, lab)]
            if np.array_equal(nxt, lab):
                return lab
            lab = nxt

    for _ in range(CC_MAX_ITERS):
        lab_ref = ray.put(labels)

        def relax(batch: pa.Table) -> pa.Table:
            nodes = _get_ref(node_ref)
            lab = _get_ref(lab_ref)
            ia = np.searchsorted(nodes, batch["doc_a"].to_numpy(zero_copy_only=False))
            ib = np.searchsorted(nodes, batch["doc_b"].to_numpy(zero_copy_only=False))
            prop = np.minimum(lab[ia], lab[ib])
            # local fixpoint inside the block: chain hops cost nothing here
            new = lab.copy()
            for _ in range(len(prop)):
                np.minimum.at(new, ia, prop)
                np.minimum.at(new, ib, prop)
                nxt = np.minimum(new[ia], new[ib])
                if np.array_equal(nxt, prop):
                    break
                prop = nxt
            changed = np.flatnonzero(new < lab)
            return pa.table(
                {
                    "idx": pa.array(changed, pa.int64()),
                    "lab": pa.array(new[changed], pa.int64()),
                }
            )

        parts = edges.map_batches(relax, batch_format="pyarrow").to_pandas()
        if parts.empty:
            break
        new = labels.copy()
        np.minimum.at(new, parts["idx"].to_numpy(np.int64), parts["lab"].to_numpy(np.int64))
        new = jump(new)
        if np.array_equal(new, labels):
            break
        labels = new
    # broadcast-cache hygiene: iteration refs are one-shot
    _BROADCAST_CACHE.clear()
    return labels


#: broadcast budget for connected_components driver label vectors —
#: one int64 per node; past this the joined (all-Dataset) path runs.
#: 5e7 nodes = 400 MB of labels per task via ray.put; a dup-heavy
#: corpus where nodes ≈ docs blows that long before the algorithm does.
CC_BROADCAST_MAX_NODES = 50_000_000


def connected_components_joined(edges, max_iters: int = CC_MAX_ITERS):
    """Min-label connected components with NO driver label vector — the
    escape hatch for node sets too big to broadcast (the
    ``textrank_joined`` layout applied to label propagation).

    ``edges`` is a Dataset with int64 ``doc_a``/``doc_b`` columns;
    returns a Dataset ``(node, lab)`` with one row per distinct node,
    ``lab`` = min node id in its component.  Per iteration: symmetric
    edges ⋈ labels deliver each node's label to its neighbors
    (per-block min-combined before the groupby), a left-outer join
    folds the proposals in, and one label⋈label self-join pointer-jumps
    (``lab <- lab[lab]``) so chains converge in O(log n) passes like
    the broadcast path.  Stops when no proposal improves any label —
    at that fixpoint every edge joins equal labels, so each component
    carries exactly its min id.  Identity with
    :func:`connected_components` is pytest-pinned.
    """
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from .analysis import join_fanout

    nf = join_fanout()

    def sym(b: pa.Table) -> pa.Table:
        a = b["doc_a"].combine_chunks()
        bb = b["doc_b"].combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([a, bb]),
                "dst": pa.concat_arrays([bb, a]),
            }
        )

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def node_partial(b: pa.Table) -> pa.Table:
        return pa.table({"node": pc.unique(b["src"])})

    labels = (
        sym_edges.map_batches(node_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("node", alias_name="lab"))
        .materialize()
    )

    def prop_partial(b: pa.Table) -> pa.Table:
        # per-block min per dst before the wide groupby (combiner)
        return b.select(["dst", "lab"]).group_by("dst").aggregate([("lab", "min")])

    def fold(b: pa.Table) -> pa.Table:
        lab = b["lab"].to_numpy(zero_copy_only=False)
        plab_raw = b["plab"].to_numpy(zero_copy_only=False).astype(np.float64)
        plab = np.where(np.isnan(plab_raw), np.iinfo(np.int64).max, plab_raw).astype(
            np.int64
        )
        new = np.minimum(lab, plab)
        return pa.table(
            {
                "node": b["node"],
                "lab": pa.array(new, pa.int64()),
                "chg": pa.array((new < lab).astype(np.int64)),
            }
        )

    for _ in range(max_iters):
        prop = (
            sym_edges.join(
                labels, join_type="inner", num_partitions=nf,
                on=("src",), right_on=("node",),
            )
            .map_batches(prop_partial, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Min("lab_min", alias_name="plab"))
        )
        upd = (
            labels.join(
                prop, join_type="left_outer", num_partitions=nf,
                on=("node",), right_on=("dst",),
            )
            .map_batches(fold, batch_format="pyarrow")
            .materialize()
        )
        changed = int(upd.sum("chg") or 0)
        labels = upd.drop_columns(["chg"])
        if changed == 0:
            break
        # pointer jump: lab <- lab[lab] (labels contain every node, and
        # every lab value is a node id, so the inner join is total)
        jtable = labels.map_batches(
            lambda b: b.rename_columns(["jnode", "jlab"]), batch_format="pyarrow"
        )
        labels = (
            labels.join(
                jtable, join_type="inner", num_partitions=nf,
                on=("lab",), right_on=("jnode",),
            )
            .map_batches(
                lambda b: pa.table({"node": b["node"], "lab": b["jlab"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return labels


def dup_clusters(sf_dir: str):
    """Near-dup clusters over the verified MinHash pair set.

    One row per document that participates in at least one verified
    near-dup pair: ``(doc_id, cluster_id, cluster_size, keep)`` where
    ``cluster_id`` is the smallest doc_id in the connected component of
    the pair graph and ``keep`` marks the canonical (minimum) doc —
    filtering the corpus on ``keep OR doc_id not in this table`` is the
    actual dedup materialization.
    """
    import ray.data as rd

    pairs = dedup_minhash(sf_dir)
    if pairs.empty:
        return pd.DataFrame(
            {
                "doc_id": np.empty(0, np.int64),
                "cluster_id": np.empty(0, np.int64),
                "cluster_size": np.empty(0, np.int64),
                "keep": np.empty(0, bool),
            }
        )
    a = pairs["doc_a"].to_numpy(np.int64)
    b = pairs["doc_b"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    edges = rd.from_pandas(pairs[["doc_a", "doc_b"]])
    if len(nodes) <= CC_BROADCAST_MAX_NODES:
        labels = connected_components(edges, nodes)
    else:
        # dup-heavy corpus: nodes ≈ docs — all-Dataset label propagation,
        # no node-count-sized driver vector (identity pytest-pinned)
        lpdf = (
            connected_components_joined(edges)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        labels = lpdf["lab"].to_numpy(np.int64)
    uniq, inv, counts = np.unique(labels, return_inverse=True, return_counts=True)
    return pd.DataFrame(
        {
            "doc_id": nodes,
            "cluster_id": labels,
            "cluster_size": counts[inv].astype(np.int64),
            "keep": nodes == labels,
        }
    )


def dup_clusters_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ({dedup_minhash_sql()}) q
),
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk (node, lab) AS (
  SELECT a, a FROM edges GROUP BY a
  UNION
  SELECT e.a, w.lab FROM edges e JOIN walk w ON w.node = e.b
),
labs AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM walk GROUP BY node),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labs GROUP BY cluster_id)
SELECT l.doc_id, l.cluster_id, CAST(s.cluster_size AS BIGINT) AS cluster_size,
       l.doc_id = l.cluster_id AS keep
FROM labs l JOIN sizes s USING (cluster_id)
ORDER BY l.doc_id
"""


# ---------------------------------------------------------------------------
# exact-substring duplicate spans (the Lee et al. 2022 "Deduplicating
# Training Data Makes Language Models Better" exact-substring family
# member: find every >=DUP_L-word run shared across documents)
# ---------------------------------------------------------------------------

#: words per exact-duplicate gram — a shared run of >= DUP_L words
#: across two documents produces at least one shared gram, and maximal
#: shared runs come out as merged spans
DUP_L = 8


def _lgram_positions(texts, L: int):
    """String column -> (row_idx, pos_1based, hash) for every L-word
    gram occurrence.  Vectorized: one ``binary_join_element_wise`` over
    L shifted views of the flattened word array; rows shorter than L
    words emit their whole text as one gram at pos 1 (the SQL mirror's
    ``greatest(1, len - L + 1)`` convention)."""
    words, row = split_words_arrow(texts)
    nw = len(row)
    n_rows = int(row[-1]) + 1 if nw else 0
    counts = np.bincount(row, minlength=n_rows) if nw else np.empty(0, np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1] if nw else counts
    parts_s: list[np.ndarray] = []
    parts_r: list[np.ndarray] = []
    parts_p: list[np.ndarray] = []
    if nw >= L:
        valid = row[: -(L - 1)] == row[L - 1 :]
        if valid.any():
            gram = pc.binary_join_element_wise(
                *[words.slice(k, nw - (L - 1)) for k in range(L)], " "
            ).filter(pa.array(valid))
            r = row[: -(L - 1)][valid]
            gidx = np.flatnonzero(valid)
            parts_s.append(gram.to_numpy(zero_copy_only=False))
            parts_r.append(r)
            parts_p.append(gidx - starts[r] + 1)
    short = np.flatnonzero((counts > 0) & (counts < L))
    if len(short):
        # whole-row join per short row (bounded by the short-doc count)
        wnp = words.to_numpy(zero_copy_only=False)
        joins = np.array(
            [" ".join(wnp[starts[i] : starts[i] + counts[i]]) for i in short],
            object,
        )
        parts_s.append(joins)
        parts_r.append(short.astype(np.int64))
        parts_p.append(np.ones(len(short), np.int64))
    if not parts_s:
        z = np.empty(0, np.int64)
        return z, z, z
    sh = np.concatenate(parts_s)
    return (
        np.concatenate(parts_r).astype(np.int64),
        np.concatenate(parts_p).astype(np.int64),
        md5int60_np(sh),
    )


def _dupgram_batch(batch: pa.Table) -> pa.Table:
    r, p, h = _lgram_positions(batch["text"], DUP_L)
    did = batch["doc_id"].to_numpy(zero_copy_only=False)[r]
    return pa.table(
        {
            "doc_id": pa.array(did, pa.int64()),
            "pos": pa.array(p),
            "h": pa.array(h),
            "bucket": pa.array((h % N_BUCKETS).astype(np.int32)),
        }
    )


def _dup_hits(group: pa.Table) -> pa.Table:
    """One coarse bucket: keep (doc_id, pos) of grams whose hash occurs
    in >= 2 DISTINCT documents (cross-document exact duplicates only).
    Exact hash equality re-established vectorized inside the group
    (lexsort + run detection — the N_BUCKETS pattern)."""
    h = group["h"].to_numpy()
    doc = group["doc_id"].to_numpy()
    pos = group["pos"].to_numpy()
    order = np.lexsort((doc, h))
    hs, ds, ps = h[order], doc[order], pos[order]
    new_run = np.ones(len(hs), bool)
    new_run[1:] = hs[1:] != hs[:-1]
    run_id = np.cumsum(new_run) - 1
    new_doc = np.ones(len(hs), bool)
    new_doc[1:] = new_run[1:] | (ds[1:] != ds[:-1])
    ndocs = np.bincount(run_id, weights=new_doc).astype(np.int64)
    keep = ndocs[run_id] >= 2
    return pa.table(
        {
            "doc_id": pa.array(ds[keep]),
            "pos": pa.array(ps[keep]),
            "dbucket": pa.array((ds[keep] % N_BUCKETS).astype(np.int32)),
        }
    )


def _merge_spans(group: pa.Table) -> pa.Table:
    """One doc bucket: merge each document's overlapping [pos, pos+L-1]
    gram intervals into maximal spans.  Because L is constant, interval
    ends are monotone in pos, so the gaps-and-islands pass is one
    vectorized comparison against the previous end — no accumulate."""
    doc = group["doc_id"].to_numpy()
    pos = group["pos"].to_numpy()
    order = np.lexsort((pos, doc))
    d, p = doc[order], pos[order]
    e = p + DUP_L - 1
    new = np.ones(len(d), bool)
    if len(d) > 1:
        new[1:] = (d[1:] != d[:-1]) | (p[1:] > e[:-1])
    starts = np.flatnonzero(new)
    ends = np.concatenate([starts[1:] - 1, [len(d) - 1]]) if len(d) else starts
    return pa.table(
        {
            "doc_id": pa.array(d[starts]),
            "span_start": pa.array(p[starts]),
            "span_end": pa.array(e[ends]),
        }
    )


def _dup_spans_ds(sf_dir: str):
    """The :func:`dup_spans` pipeline as a (doc_id, span_start,
    span_end) Dataset — shared by the gate (to_pandas) and the
    :func:`scrub_dup_spans` fallback (which must keep spans
    distributed)."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    hits = (
        ds.map_batches(_dupgram_batch, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_dup_hits, batch_format="pyarrow")
    )
    return hits.groupby("dbucket").map_groups(_merge_spans, batch_format="pyarrow")


def dup_spans(sf_dir: str) -> pd.DataFrame:
    """Cross-document exact-duplicate spans: every maximal word range
    covered by >= DUP_L-word grams that appear verbatim in at least two
    documents (1-based inclusive word positions).

    Dataflow: one corpus-sized (doc, pos, hash) explode -> coarse
    hash-bucket shuffle -> vectorized >=2-distinct-docs run filter ->
    doc-bucket shuffle -> vectorized interval merge.  This is the
    n-gram formulation of exact-substring dedup (Lee et al. 2022 use a
    suffix array; the gram explode trades memory locality for plain
    shuffles, the right shape for Ray Data at 100 TB — cost is one
    token-scale shuffle, same class as the index build itself).
    """
    return (
        _dup_spans_ds(sf_dir)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )


DUP_SPANS_SQL = f"""
WITH grams AS (
  SELECT doc_id, s.i AS pos,
         {md5int60_sql("array_to_string(list_slice(d.parts, s.i, s.i + " + str(DUP_L - 1) + "), ' ')")} AS h
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS parts FROM documents) d,
       LATERAL (SELECT unnest(generate_series(1, greatest(1, len(d.parts) - {DUP_L - 1}))) AS i) s
),
dupg AS (SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dupg USING (h)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos > max(pos + {DUP_L - 1}) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              OR row_number() OVER (PARTITION BY doc_id ORDER BY pos) = 1
         THEN 1 ELSE 0 END AS new_island
  FROM hits
),
islands AS (
  SELECT doc_id, pos,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM flagged
)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {DUP_L - 1} AS BIGINT) AS span_end
FROM islands GROUP BY doc_id, isl ORDER BY doc_id, span_start
"""


def _scrub_one(text_lower: str, spans) -> str | None:
    """Remove 1-based-inclusive word spans from a lowercased word
    stream; None when nothing survives (doc drops out).  The ONE scrub
    kernel both :func:`scrub_dup_spans` paths share — path identity is
    by construction."""
    words = text_lower.split(" ")
    keep = np.ones(len(words), bool)
    for s, e in spans:
        keep[s - 1 : e] = False
    if not keep.any():
        return None
    return " ".join(np.array(words, object)[keep])


def _scrub_group(tbl: pa.Table) -> pa.Table:
    """One doc-bucket of the shuffle-join fallback: span rows (text
    null) + text rows (span_start < 0) for the same ``doc_id % N_BUCKETS``
    slice; spans index in-group, texts scrub through :func:`_scrub_one`."""
    d = tbl["doc_id"].to_numpy(zero_copy_only=False)
    ss = tbl["span_start"].to_numpy(zero_copy_only=False)
    se = tbl["span_end"].to_numpy(zero_copy_only=False)
    txt = tbl["text"].to_numpy(zero_copy_only=False)
    is_text = ss < 0
    spans_by_doc: dict[int, list] = {}
    for i in np.flatnonzero(~is_text):
        spans_by_doc.setdefault(int(d[i]), []).append((int(ss[i]), int(se[i])))
    out_d, out_t = [], []
    for i in np.flatnonzero(is_text):
        did = int(d[i])
        sp = spans_by_doc.get(did)
        clean = txt[i] if not sp else _scrub_one(txt[i], sp)
        if clean is not None:
            out_d.append(did)
            out_t.append(clean)
    return pa.table(
        {
            "doc_id": pa.array(out_d, pa.int64()),
            "clean_text": pa.array(out_t, pa.string()),
        }
    )


def scrub_dup_spans(sf_dir: str) -> pd.DataFrame:
    """The cleaning transform ``dup_spans`` feeds: the corpus with every
    cross-document duplicated span removed (lowercased word stream minus
    span positions; documents scrubbed to nothing drop out).

    The span table is duplicate-volume-sized, broadcast once
    (``ray.put``) and probed per batch; past ``MAX_BROADCAST_PAIRS``
    spans the same result comes from a doc-bucket shuffle join of spans
    with texts (tagged union -> ``groupby(doc_id % N_BUCKETS)`` ->
    in-group scrub, the dedup-verify fallback pattern) — corpus text
    never moves to the driver either way, and past the cap the span
    table never does either.  Output-identical on both paths
    (pytest-pinned via a forced MAX_BROADCAST_PAIRS=0 run).
    """
    import ray
    import ray.data as rd

    spans_ds = _dup_spans_ds(sf_dir).materialize()
    n_spans = spans_ds.count()
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    if n_spans > MAX_BROADCAST_PAIRS:
        # shuffle-join fallback: spans stay distributed; both sides tag
        # into one schema and meet in a doc-bucket groupby
        def tag_spans(b: pa.Table) -> pa.Table:
            d = b["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "doc_id": pa.array(d.astype(np.int64), pa.int64()),
                    "dbucket": pa.array((d % N_BUCKETS).astype(np.int32)),
                    "span_start": b["span_start"].cast(pa.int64()),
                    "span_end": b["span_end"].cast(pa.int64()),
                    "text": pa.nulls(len(b), pa.string()),
                }
            )

        def tag_text(b: pa.Table) -> pa.Table:
            d = b["doc_id"].to_numpy(zero_copy_only=False)
            neg = np.full(len(b), -1, np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(d.astype(np.int64), pa.int64()),
                    "dbucket": pa.array((d % N_BUCKETS).astype(np.int32)),
                    "span_start": pa.array(neg, pa.int64()),
                    "span_end": pa.array(neg, pa.int64()),
                    "text": pc.utf8_lower(b["text"]),
                }
            )

        merged = (
            spans_ds.map_batches(tag_spans, batch_format="pyarrow")
            .union(ds.map_batches(tag_text, batch_format="pyarrow"))
            .groupby("dbucket")
            .map_groups(_scrub_group, batch_format="pyarrow")
        )
        return (
            merged.to_pandas().sort_values("doc_id").reset_index(drop=True)
        )

    spans = spans_ds.to_pandas()
    by_doc: dict[int, list] = {}
    for r in spans.itertuples():
        by_doc.setdefault(int(r.doc_id), []).append(
            (int(r.span_start), int(r.span_end))
        )
    ref = ray.put(by_doc)

    def scrub(batch: pa.Table) -> pa.Table:
        m = _get_ref(ref) if not isinstance(ref, dict) else ref
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        low_np = pc.utf8_lower(batch["text"]).to_numpy(zero_copy_only=False)
        out_d, out_t = [], []
        for i, d in enumerate(dids):
            sp = m.get(int(d))
            clean = low_np[i] if not sp else _scrub_one(low_np[i], sp)
            if clean is not None:
                out_d.append(int(d))
                out_t.append(clean)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "clean_text": pa.array(out_t, pa.string()),
            }
        )

    return (
        ds.map_batches(scrub, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SCRUB_DUP_SPANS_SQL = f"""
WITH spans AS ({DUP_SPANS_SQL.replace('ORDER BY doc_id, span_start', '')}),
wordpos AS (
  SELECT doc_id, s.i AS pos, d.parts[s.i] AS w
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS parts FROM documents) d,
       LATERAL (SELECT unnest(generate_series(1, len(d.parts))) AS i) s
),
kept AS (
  SELECT w.doc_id, w.pos, w.w
  FROM wordpos w
  WHERE NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = w.doc_id AND w.pos BETWEEN sp.span_start AND sp.span_end
  )
)
SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text
FROM kept GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication"): k-means the embedding
# space, find semantic-duplicate groups WITHIN each cell, keep one
# representative per group — the member least similar to its centroid
# (the paper's keep rule: prototypical members drop, the informative
# outlier stays).
# ---------------------------------------------------------------------------

#: within-cell semantic-duplicate cosine threshold (shares the
#: embedding near-dup threshold so the sf corpora exercise real groups)
SEMDEDUP_T = COSINE_T


def semdedup(sf_dir: str) -> pd.DataFrame:
    """Semantic dedup over ``embeddings``: one row per vector that has
    at least one within-cell semantic duplicate — ``(vec_id, cell,
    group_id, group_size, centroid_cosine, keep)`` where ``group_id``
    is the smallest vec_id in the within-cell duplicate component and
    ``keep`` marks the member with the LOWEST rounded
    cosine-to-centroid (ties -> lowest vec_id), per the paper.

    Ray shape: trained centroids broadcast once
    (:func:`similarity._trained_centroids` — the kmeans_cells recipe);
    one embeddings pass assigns cells; the pairwise step is a
    cell-keyed ``groupby`` whose per-group work is one m×m matmul —
    cell size is the k-means granularity knob (the paper's own cost
    model), so the quadratic never sees the corpus, only a cell.
    Components resolve vectorized in-group (min-label propagation on
    the dense adjacency — cells are small by construction).
    Gate ``semdedup``; oracle :func:`semdedup_sql` (kmeans oracle as a
    CTE body + recursive min-label closure per cell).
    """
    import ray
    import ray.data as rd

    from . import similarity

    cells, cent = similarity._trained_centroids(sf_dir)
    ref = ray.put((cells, cent))

    def assign(batch: pa.Table) -> pa.Table:
        obj = ref
        cells_, cent_ = obj if isinstance(obj, tuple) else _get_ref(obj)
        # the ONE shared assignment stage (similarity._cell_assign_batch)
        # — byte-identical to kmeans_cells' FinalAssign and SQL mirror;
        # the embedding rides along for the within-cell pairwise step
        return similarity._cell_assign_batch(
            batch, cells_, cent_, carry=("embedding",)
        )

    def within_cell(group: pd.DataFrame) -> pd.DataFrame:
        v = group["vec_id"].to_numpy(np.int64)
        cc = group["centroid_cosine"].to_numpy(np.float64)
        cell = int(group["cell"].iloc[0])
        m = np.vstack(group["embedding"].to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        order = np.argsort(v)
        v, cc, m = v[order], cc[order], m[order]
        sims = round_half_up(m @ m.T, ROUND)
        adj = sims >= SEMDEDUP_T
        np.fill_diagonal(adj, True)
        # min-label propagation on the dense adjacency (cells are small)
        lab = v.copy()
        while True:
            nxt = np.where(adj, lab[None, :], np.iinfo(np.int64).max).min(axis=1)
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        uniq, inv, counts = np.unique(lab, return_inverse=True, return_counts=True)
        dup = counts[inv] >= 2
        if not dup.any():
            return pd.DataFrame(
                {
                    "vec_id": np.empty(0, np.int64),
                    "cell": np.empty(0, np.int64),
                    "group_id": np.empty(0, np.int64),
                    "group_size": np.empty(0, np.int64),
                    "centroid_cosine": np.empty(0, np.float64),
                    "keep": np.empty(0, bool),
                }
            )
        # keep = per group the (centroid_cosine, vec_id)-lexicographic min
        order2 = np.lexsort((v, cc, inv))
        first = np.zeros(len(v), bool)
        srt_inv = inv[order2]
        first[order2[np.concatenate([[True], srt_inv[1:] != srt_inv[:-1]])]] = True
        return pd.DataFrame(
            {
                "vec_id": v[dup],
                "cell": np.full(dup.sum(), cell, np.int64),
                "group_id": lab[dup],
                "group_size": counts[inv][dup].astype(np.int64),
                "centroid_cosine": cc[dup],
                "keep": first[dup],
            }
        )

    out = (
        rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        .map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(within_cell, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    return out


def semdedup_sql() -> str:
    """Oracle for :func:`semdedup`: the kmeans_cells oracle embeds as a
    CTE body (assignment + rounded centroid cosine), within-cell pair
    edges at SEMDEDUP_T, recursive min-label closure, and the
    (cosine, vec_id) window for the keep rule."""
    from .similarity import kmeans_cells_sql

    return f"""
WITH RECURSIVE assign AS MATERIALIZED ({kmeans_cells_sql()}),
p AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM assign a
  JOIN assign b ON b.cell = a.cell AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), {ROUND}) >= {SEMDEDUP_T}
),
edges AS MATERIALIZED (
  SELECT va AS a, vb AS b FROM p UNION SELECT vb AS a, va AS b FROM p
),
walk (node, lab) AS (
  SELECT a, a FROM edges GROUP BY a
  UNION
  SELECT e.a, w.lab FROM edges e JOIN walk w ON w.node = e.b
),
labs AS (SELECT node AS vec_id, min(lab) AS group_id FROM walk GROUP BY node),
sizes AS (SELECT group_id, count(*) AS group_size FROM labs GROUP BY group_id),
ranked AS (
  SELECT l.vec_id, a.cell, l.group_id,
         CAST(s.group_size AS BIGINT) AS group_size,
         a.cosine AS centroid_cosine,
         row_number() OVER (
           PARTITION BY l.group_id ORDER BY a.cosine, l.vec_id) AS rn
  FROM labs l
  JOIN assign a ON a.vec_id = l.vec_id
  JOIN sizes s USING (group_id)
)
SELECT vec_id, cell, group_id, group_size, centroid_cosine, rn = 1 AS keep
FROM ranked ORDER BY vec_id
"""


#: fraction of each cell pruned as "too prototypical" (Sorscher et al.
#: 2022, "Beyond neural scaling laws": easy/prototypical examples are
#: the ones a data-constrained run can afford to drop)
PROTO_PRUNE_FRAC = 0.2


def prototype_prune(sf_dir: str) -> pd.DataFrame:
    """Prototypicality pruning over ``embeddings`` — the SemDeDup
    sibling from the same infra: assign every vector to its trained
    k-means cell, rank within the cell by rounded cosine-to-centroid
    DESC (most prototypical first, ties -> vec_id asc), and mark the
    top ``PROTO_PRUNE_FRAC`` of each cell pruned (``floor(frac * m)``
    vectors — never the whole cell).

    One embeddings pass + a cell-keyed groupby whose per-group work is
    a sort of the cell — no pairwise anything, so this is the CHEAP
    member of the semantic-curation family (SemDeDup's quadratic
    within-cell step only pays off when you need duplicate groups, not
    just a prune).  Output: (vec_id, cell, centroid_cosine, pruned).
    Gate ``prototype_prune``; oracle :func:`prototype_prune_sql`.
    """
    import ray
    import ray.data as rd

    from . import similarity

    cells, cent = similarity._trained_centroids(sf_dir)
    ref = ray.put((cells, cent))

    def assign(batch: pa.Table) -> pa.Table:
        obj = ref
        cells_, cent_ = obj if isinstance(obj, tuple) else _get_ref(obj)
        return similarity._cell_assign_batch(batch, cells_, cent_)

    def prune_cell(group: pd.DataFrame) -> pd.DataFrame:
        v = group["vec_id"].to_numpy(np.int64)
        cc = group["centroid_cosine"].to_numpy(np.float64)
        order = np.lexsort((v, -cc))  # cosine desc, vec_id asc
        k = int(PROTO_PRUNE_FRAC * len(v))
        pruned = np.zeros(len(v), bool)
        pruned[order[:k]] = True
        out = group[["vec_id", "cell", "centroid_cosine"]].copy()
        out["pruned"] = pruned
        return out

    return (
        rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        .map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(prune_cell, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def prototype_prune_sql() -> str:
    """Oracle for :func:`prototype_prune`: the kmeans assignment CTE +
    a per-cell (cosine desc, vec_id) window against the floor'd cut."""
    from .similarity import kmeans_cells_sql

    return f"""
WITH assign AS MATERIALIZED ({kmeans_cells_sql()}),
ranked AS (
  SELECT vec_id, cell, cosine AS centroid_cosine,
         row_number() OVER (
           PARTITION BY cell ORDER BY cosine DESC, vec_id) AS rn,
         count(*) OVER (PARTITION BY cell) AS m
  FROM assign
)
SELECT vec_id, cell, centroid_cosine,
       rn <= CAST(floor({PROTO_PRUNE_FRAC} * m) AS BIGINT) AS pruned
FROM ranked ORDER BY vec_id
"""
