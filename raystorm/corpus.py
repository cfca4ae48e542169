"""Transcript corpus: deterministic derivation + synthetic generator.

The engine's input table is a Parquet table of multi-turn conversation /
agent transcripts with columns ``(conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp[us])`` — each turn,
keyed by ``(conv_id, turn_idx)``, plays the docID role that URLs play in
the reference (rowkey of ``pt-crawl``, kvs/Worker.java storage model;
see SURVEY.md §1.3).

Two corpora:

1. ``transcripts_from_documents(sf_dir)`` — a deterministic, *SQL-
   expressible* derivation from the driver's ``documents`` table: each
   document becomes one conversation, its text split into turns of
   ``TURN_WORDS`` words.  ``transcripts_sql()`` emits the equivalent
   DuckDB CTE so every downstream pipeline can be verified by the
   driver's DuckDB oracle end to end.
2. ``synth_transcripts(...)`` — a seeded standalone generator (Zipf
   vocabulary, planted needles, tokenizer edge cases) used by pytest and
   the large-scale bench, per FIXTURES.md §1.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# --- derivation constants (shared by the Ray path and the SQL oracle) ---
TURN_WORDS = 12
ROLES = ("user", "assistant", "tool", "assistant")  # by turn_idx % 4
TOOLS = ("search", "browser", "calculator", "python", "bash", "editor", "lookup")
TS_EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds


def _derive_turns(batch: pa.Table) -> pa.Table:
    """documents rows -> transcript turns (vectorized per batch).

    Deterministic: conv_id = 'conv-%08d' % doc_id; text split on single
    spaces into chunks of TURN_WORDS words; role cycles through ROLES;
    tool = TOOLS[(doc_id + turn_idx) % 7] on tool turns else ''; ts =
    2025-01-01 + doc_id*3600s + turn_idx*60s.  Must stay in lockstep
    with transcripts_sql().
    """
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    turn_texts: list[str] = []
    for doc_id, text in zip(doc_ids, texts):
        words = text.split(" ")
        n_turns = max(1, -(-len(words) // TURN_WORDS))
        cid = f"conv-{doc_id:08d}"
        for t in range(n_turns):
            conv_ids.append(cid)
            turn_idxs.append(t)
            turn_texts.append(" ".join(words[t * TURN_WORDS : (t + 1) * TURN_WORDS]))

    conv_num = np.array(
        [int(c[5:]) for c in conv_ids], dtype=np.int64
    )  # doc_id back out, for role/tool/ts arithmetic
    tix = np.asarray(turn_idxs, dtype=np.int32)
    roles = np.array(ROLES, dtype=object)[tix % len(ROLES)]
    tool_names = np.array(TOOLS, dtype=object)[(conv_num + tix) % len(TOOLS)]
    tools = np.where(roles == "tool", tool_names, "")
    ts = TS_EPOCH_US + (conv_num * 3600 + tix.astype(np.int64) * 60) * 1_000_000

    return pa.Table.from_arrays(
        [
            pa.array(conv_ids, pa.string()),
            pa.array(tix, pa.int32()),
            pa.array(roles, pa.string()),
            pa.array(turn_texts, pa.string()),
            pa.array(tools, pa.string()),
            pa.array(ts, pa.timestamp("us")),
        ],
        schema=TRANSCRIPTS_SCHEMA,
    )


def transcripts_from_documents(
    sf_dir: str, min_doc: int | None = None, max_doc: int | None = None
):
    """Ray Dataset of transcript turns derived from ``documents.parquet``.

    ``min_doc``/``max_doc`` (inclusive/exclusive) push a doc_id range
    filter into the parquet scan (row-group pruning) — used by the
    incremental-update split (update.py) so the base/delta passes never
    read the other half's rows.
    """
    import pyarrow.dataset as pads
    import ray.data as rd

    expr = None
    if min_doc is not None:
        expr = pads.field("doc_id") >= min_doc
    if max_doc is not None:
        e2 = pads.field("doc_id") < max_doc
        expr = e2 if expr is None else expr & e2
    kwargs = {"columns": ["doc_id", "text"]}
    if expr is not None:
        kwargs["filter"] = expr
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), **kwargs)
    return ds.map_batches(_derive_turns, batch_format="pyarrow")


def transcripts_sql() -> str:
    """DuckDB CTE body equivalent to ``transcripts_from_documents``.

    Usage: ``WITH transcripts AS ({transcripts_sql()}) SELECT ...``.
    """
    role_case = " ".join(
        f"WHEN {i} THEN '{r}'" for i, r in enumerate(ROLES[:-1])
    )
    tools_list = ", ".join(f"'{t}'" for t in TOOLS)
    return f"""
    SELECT
      'conv-' || lpad(CAST(d.doc_id AS VARCHAR), 8, '0') AS conv_id,
      CAST(s.i - 1 AS INTEGER) AS turn_idx,
      CASE (s.i - 1) % {len(ROLES)} {role_case} ELSE '{ROLES[-1]}' END AS role,
      array_to_string(
        list_slice(d.parts, (s.i - 1) * {TURN_WORDS} + 1,
                   least(s.i * {TURN_WORDS}, len(d.parts))), ' ') AS text,
      CASE WHEN (s.i - 1) % {len(ROLES)} = 2
           THEN (list_value({tools_list}))[CAST((d.doc_id + s.i - 1) % {len(TOOLS)} AS INTEGER) + 1]
           ELSE '' END AS tool,
      TIMESTAMP '2025-01-01 00:00:00'
        + (d.doc_id * 3600 + (s.i - 1) * 60) * INTERVAL 1 SECOND AS ts
    FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents) d,
         LATERAL (SELECT unnest(generate_series(1, greatest(1, CAST(ceil(len(d.parts) / {TURN_WORDS}.0) AS BIGINT)))) AS i) s
    """


# ---------------------------------------------------------------------------
# Synthetic corpus (FIXTURES.md §1): Zipf vocabulary, planted needles,
# tokenizer edge cases.  Seeded + content-addressed so repeated calls reuse
# the parquet on disk.
# ---------------------------------------------------------------------------

#: needles planted in known turns -> golden query answers are stable
NEEDLES = (
    ("xylophone quartz zeppelin", 17),
    ("aardvark bumblebee chrysalis", 271),
    ("quixotic zephyr labyrinth", 911),
)

EDGE_TEXTS = (
    "",  # empty turn
    "   ",  # whitespace only
    "UPPER Case MiXeD",  # casing
    "abc123 42 9000",  # digit-bearing tokens are dropped by body mode
    "supercalifragilisticexpialidociousandthensomemorechars tiny",  # >30 chars dropped
    "punct!!!,,,;;;:::...---___===+++ wow",  # punctuation runs
    "see http://example.com/path?q=1 and https://x.org/a#b links",  # URLs stripped
    "dup dup dup dup unique",  # binary-tf vs tf divergence
)


def synth_word(i: int) -> str:
    """The i-th synthetic-corpus vocabulary word: 4-char base-26 (must
    survive the pure-alpha body tokenizer).  ONE definition shared by
    :func:`synth_transcripts` and the serve-bench query workload — a
    re-derived copy would silently query terms absent from the corpus
    if the scheme ever changed."""
    return "".join(chr(97 + (i // 26**k) % 26) for k in reversed(range(4)))


def synth_vocab(vocab_size: int) -> np.ndarray:
    """Vocabulary array for the synthetic corpus (see :func:`synth_word`)."""
    return np.array([synth_word(i) for i in range(vocab_size)], dtype=object)


def synth_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    vocab_size: int = 5000,
    zipf_s: float = 1.1,
    out_dir: str | None = None,
    files: int = 8,
) -> str:
    """Write a deterministic synthetic transcript corpus; return its dir.

    Zipf-distributed vocabulary (head terms appear in a large fraction of
    turns — exercises the salted skew split), planted NEEDLES at known
    (conv, turn) slots, EDGE_TEXTS sprinkled deterministically.

    Fully vectorized (single rng.choice over all words) so corpora in
    the millions of turns generate in seconds for the scaling bench.
    """
    key = hashlib.sha256(
        f"{n_convs}|{seed}|{vocab_size}|{zipf_s}|{files}|v3".encode()
    ).hexdigest()[:16]
    root = out_dir or os.path.join("/tmp", "raystorm_corpus", key)
    done = os.path.join(root, "_SUCCESS")
    if os.path.exists(done):
        return root
    os.makedirs(root, exist_ok=True)

    rng = np.random.default_rng(seed)
    vocab = synth_vocab(vocab_size)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks ** (-zipf_s)
    probs /= probs.sum()

    n_turns = rng.integers(8, 64, size=n_convs)
    total_turns = int(n_turns.sum())
    conv_of_turn = np.repeat(np.arange(n_convs, dtype=np.int64), n_turns)
    conv_starts = np.concatenate(([0], np.cumsum(n_turns)[:-1]))
    tix = (np.arange(total_turns, dtype=np.int64) - conv_starts[conv_of_turn]).astype(np.int32)

    n_words = rng.integers(5, 40, size=total_turns)
    total_words = int(n_words.sum())
    word_codes = rng.choice(vocab_size, size=total_words, p=probs)
    offsets = np.concatenate(([0], np.cumsum(n_words)))
    words = vocab[word_codes]
    texts = [
        " ".join(words[offsets[i] : offsets[i + 1]]) for i in range(total_turns)
    ]
    # plant edge cases deterministically
    for tc in range(13, total_turns, 97):
        texts[tc] = EDGE_TEXTS[(tc // 97) % len(EDGE_TEXTS)]
    # plant needles at fixed global turn offsets
    for needle, slot in NEEDLES:
        if slot < total_turns:
            texts[slot] = texts[slot] + " " + needle

    conv_ids = np.array(
        [f"sconv-{c:07d}" for c in range(n_convs)], dtype=object
    )[conv_of_turn]
    roles = np.array(ROLES, dtype=object)[tix % len(ROLES)]
    tools = np.where(
        roles == "tool",
        np.array(TOOLS, dtype=object)[(conv_of_turn + tix) % len(TOOLS)],
        "",
    )
    ts = TS_EPOCH_US + (conv_of_turn * 86_400 + tix.astype(np.int64) * 60) * 1_000_000

    import pyarrow.parquet as pq

    per_file = -(-total_turns // files)
    for f in range(files):
        sl = slice(f * per_file, (f + 1) * per_file)
        if sl.start >= total_turns:
            continue
        tbl = pa.Table.from_arrays(
            [
                pa.array(conv_ids[sl], pa.string()),
                pa.array(tix[sl], pa.int32()),
                pa.array(roles[sl], pa.string()),
                pa.array(texts[sl.start : min(sl.stop, total_turns)], pa.string()),
                pa.array(tools[sl], pa.string()),
                pa.array(ts[sl], pa.timestamp("us")),
            ],
            schema=TRANSCRIPTS_SCHEMA,
        )
        pq.write_table(tbl, os.path.join(root, f"part-{f:04d}.parquet"))
    with open(done, "w") as fh:
        fh.write(f"{total_turns}\n")
    return root
