"""Vectorized tokenizers — exact ports of the reference's token rules.

Three field modes, semantics lifted rule-for-rule from the reference
(cited file:line, relative to /root/reference):

- ``body``  — ``Indexer.java:113-140`` (``returnCleanedupPage`` steps
  4+6; the HTML steps 1-3 don't apply to transcript text): lowercase,
  strip ``https?://\\S+`` URLs, collapse ``[^a-z0-9]+`` to spaces, split
  on whitespace, keep only pure-alpha tokens of length 1..30.
- ``title`` — ``TitleIndexer.java:80-103`` (``cleanupTitle``): lowercase,
  strip ``&entity;``, collapse ``[^a-z0-9]+``, keep ``[a-z][a-z0-9]*``
  (implicitly non-numeric) of length <=30.
- ``tool``  — ``URLIndexer.java:78-107`` (``extractTokensFromUrl``):
  lowercase, collapse ``[^a-z]+``, keep pure-alpha length 2..30, minus
  the ~50-entry stoplist (``URLIndexer.java:12-27``).

Everything is Arrow-vectorized (pyarrow.compute RE2 kernels + numpy);
no per-row Python in the hot path.  ``tokens_sql`` emits the equivalent
DuckDB expression chain so the driver's oracle stays in lockstep.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: URLIndexer.java:12-27 — tokens considered "useless" in the URL/tool field
TOOL_STOPLIST = (
    "cgi", "action", "id", "page", "view", "list", "item", "detail",
    "login", "logout", "register", "signup", "signin",
    "search", "query", "q", "ref", "utm", "src", "sid", "session", "sessionid",
    "token", "auth", "verify", "confirm",
    "rss", "feed", "sitemap",
    "xml", "json", "txt", "pdf", "csv",
    "img", "image", "images",
    "jpg", "jpeg", "png", "gif", "svg", "ico",
    "css", "js",
    "mobile", "m", "amp", "api",
    "static", "assets", "content",
    "temp", "tmp", "backup", "old", "new",
    "error", "debug", "404", "500",
)

#: ImageAltSelfIndexer.java:12-17 — alt strings/tokens considered useless
USELESS_ALTS = (
    "logo", "icon", "image", "img", "photo", "picture",
    "banner", "thumbnail", "thumb", "avatar", "spacer",
    "header", "footer", "advertisement", "ad", "promo",
    "loading", "placeholder", "default", "profile", "user",
)

MODES = ("body", "title", "tool", "alt")

# (pre-split replace chain [(pattern, replacement)...], keep-token regex)
_MODE_RULES = {
    "body": (
        [(r"https?://\S+", " "), (r"[^a-z0-9]+", " ")],
        r"^[a-z]{1,30}$",
    ),
    "title": (
        [(r"&[a-zA-Z]+;", " "), (r"[^a-z0-9]+", " ")],
        r"^[a-z][a-z0-9]{0,29}$",
    ),
    "tool": (
        [(r"[^a-z]+", " ")],
        r"^[a-z]{2,30}$",
    ),
    # ImageAltSelfIndexer.java:107-125 cleanupMeaningfulAlt: strip tags,
    # collapse non-letters, keep pure-alpha <=30 minus USELESS_ALTS
    # (tokenize_column lowercases first, so [^a-zA-Z ]+ == [^a-z ]+ here)
    "alt": (
        [(r"(?s)<[^>]*>", " "), (r"[^a-z ]+", " ")],
        r"^[a-z]{1,30}$",
    ),
}

#: per-mode token stoplists (applied after the keep regex)
_MODE_STOPLIST = {"tool": TOOL_STOPLIST, "alt": USELESS_ALTS}


def tokenize_column(texts, mode: str = "body"):
    """Tokenize a string Array/ChunkedArray -> (tokens, row_idx).

    Returns ``tokens`` (numpy object array of kept tokens, in document
    order) and ``row_idx`` (int64 array mapping each token back to its
    input row).  Fully vectorized: RE2 replace -> split -> flatten via
    list offsets -> anchored-regex keep mask (-> stoplist for tool mode).
    """
    replaces, keep = _MODE_RULES[mode]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not pa.types.is_string(texts.type) and not pa.types.is_large_string(texts.type):
        texts = texts.cast(pa.string())  # e.g. an all-null block types as null
    s = pc.utf8_lower(texts)
    for pat, rep in replaces:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    lists = pc.split_pattern(s, " ")
    # flatten: values + per-row repeat counts from offsets
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts, nan=0).astype(np.int64)
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    values = lists.flatten()
    mask = pc.match_substring_regex(values, keep)
    stoplist = _MODE_STOPLIST.get(mode)
    if stoplist is not None:
        mask = pc.and_(
            mask, pc.invert(pc.is_in(values, value_set=pa.array(stoplist)))
        )
    mask_np = mask.to_numpy(zero_copy_only=False)
    mask_np = np.nan_to_num(mask_np, nan=False).astype(bool)
    tokens = values.to_numpy(zero_copy_only=False)[mask_np]
    return tokens, row_idx[mask_np]


def tokenize_with_positions(texts, mode: str = "body"):
    """Like ``tokenize_column`` but also returns each kept token's
    0-based position among its row's kept tokens (the positional-postings
    path — ``AnchorTextIndexer.java:62-65`` records position-in-anchor).
    """
    tokens, row_idx = tokenize_column(texts, mode)
    if len(row_idx) == 0:
        return tokens, row_idx, np.empty(0, np.int64)
    first = np.searchsorted(row_idx, row_idx, side="left")
    pos = np.arange(len(row_idx), dtype=np.int64) - first
    return tokens, row_idx, pos


def doc_term_stats(tokens: np.ndarray, row_idx: np.ndarray, n_rows: int):
    """Per-(row, term) tf + per-row token counts, vectorized.

    Returns ``(rows, terms, tfs, dl)`` where ``rows/terms/tfs`` are the
    exploded (row, term) -> term-frequency triples and ``dl[r]`` is row
    r's kept-token count (the BM25 document length).  Mirrors the
    per-doc ``HashSet`` dedup of ``Indexer.java:44-49`` when callers use
    the pairs with binary tf (tf clamped to 1).
    """
    dl = np.bincount(row_idx, minlength=n_rows).astype(np.int32)
    if len(tokens) == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, object),
            np.empty(0, np.int32),
            dl,
        )
    uniq, codes = np.unique(tokens, return_inverse=True)
    key = row_idx * len(uniq) + codes
    ukey, counts = np.unique(key, return_counts=True)
    rows = ukey // len(uniq)
    terms = uniq[ukey % len(uniq)]
    return rows, terms, counts.astype(np.int32), dl


def doc_term_stats_coded(tokens: np.ndarray, row_idx: np.ndarray, n_rows: int):
    """Like ``doc_term_stats`` but returns integer term codes + the
    unique-term vocabulary instead of materializing a per-pair string
    array — the hot-path variant (string work stays vocabulary-sized).

    Returns ``(rows, term_codes, uniq_terms, tfs, dl)``.
    """
    dl = np.bincount(row_idx, minlength=n_rows).astype(np.int32)
    if len(tokens) == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, object),
            np.empty(0, np.int32),
            dl,
        )
    uniq, codes = np.unique(tokens, return_inverse=True)
    key = row_idx * len(uniq) + codes
    ukey, counts = np.unique(key, return_counts=True)
    rows = ukey // len(uniq)
    term_codes = ukey % len(uniq)
    return rows, term_codes, uniq, counts.astype(np.int32), dl


def norm_expr_sql(col: str, mode: str = "body") -> str:
    """The normalization (lower + replace chain) as a bare SQL string
    expression — shared by :func:`tokens_sql` and list-typed consumers
    (e.g. snippets' ``list_filter`` over ``string_split``)."""
    replaces, _ = _MODE_RULES[mode]
    expr = f"lower({col})"
    for pat, rep in replaces:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return expr


def tokens_sql(col: str, mode: str = "body") -> str:
    """DuckDB expression chain equivalent to ``tokenize_column``.

    Emits a ``LATERAL``-unnest fragment; embed as
    ``FROM <tbl>, {tokens_sql('text')}`` and filter with
    ``WHERE {tokens_keep_sql('term', mode)}``.
    """
    expr = norm_expr_sql(col, mode)
    return (
        f"LATERAL (SELECT unnest(string_split(trim({expr}), ' ')) AS term) tok"
    )


def tokens_keep_sql(term_col: str, mode: str = "body") -> str:
    """WHERE-clause fragment matching the keep mask of ``tokenize_column``."""
    _, keep = _MODE_RULES[mode]
    cond = f"regexp_full_match({term_col}, '{keep.strip('^$')}')"
    stoplist = _MODE_STOPLIST.get(mode)
    if stoplist is not None:
        stop = ", ".join(f"'{t}'" for t in stoplist)
        cond += f" AND {term_col} NOT IN ({stop})"
    return cond


#: analyzer-probe fixture (the ES ``_analyze`` API shape): edge-case
#: inputs per mode — casing, URLs, digit tokens, html entities, tags,
#: stoplisted tokens, empty/whitespace-only strings (no rows emitted)
ANALYZE_TEXTS = (
    ("t01", "Sort-Merge JOIN beats hash join", "body"),
    ("t02", "  UPPER Case   MiXeD  ", "body"),
    ("t03", "see https://example.com/x?q=1 now abc123 42", "body"),
    ("t04", "", "body"),
    ("t05", "Stream &amp; Window Aggregation 2.0", "title"),
    ("t06", "https://api.example.com/search?q=merge&utm=x", "tool"),
    ("t07", "<b>diagram</b> of a spacer merge tree logo", "alt"),
)


def analyze_texts(texts=ANALYZE_TEXTS) -> "pd.DataFrame":
    """Run the analyzer chain over arbitrary strings and return each
    kept token with its 0-based kept-stream position — the ES
    ``_analyze`` debug API, driving ``tokenize_with_positions`` (the
    exact function every indexing path uses) so what this reports IS
    what the index would store.  Oracle: :func:`analyze_sql` (gate
    ``analyze_text``)."""
    import pandas as pd

    out = []
    for tid, text, mode in texts:
        toks, _rows, pos = tokenize_with_positions(pa.array([text]), mode)
        out.append(
            pd.DataFrame(
                {
                    "text_id": tid,
                    "mode": mode,
                    "pos": pos.astype(np.int32),
                    "token": toks,
                }
            )
        )
    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["text_id", "pos"])
        .reset_index(drop=True)
    )


def analyze_sql(texts=ANALYZE_TEXTS) -> str:
    """Mirror of :func:`analyze_texts`: per mode, the shared
    ``norm_expr_sql`` + ordered unnest + ``tokens_keep_sql`` chain over
    a VALUES table — one UNION ALL branch per mode present."""
    branches = []
    for mode in MODES:
        rows = [f"('{tid}', '{t}')" for tid, t, m in texts if m == mode]
        if not rows:
            continue
        expr = norm_expr_sql("text", mode)
        keep = tokens_keep_sql("term", mode)
        branches.append(f"""
SELECT text_id, '{mode}' AS mode,
       CAST(row_number() OVER (PARTITION BY text_id ORDER BY u.ord) - 1 AS INTEGER) AS pos,
       u.term AS token
FROM (SELECT text_id, string_split(trim({expr}), ' ') AS parts
      FROM (VALUES {', '.join(rows)}) v(text_id, text)) t,
     LATERAL (SELECT unnest(t.parts) AS term,
              unnest(generate_series(1, len(t.parts))) AS ord) u
WHERE {keep}""")
    return " UNION ALL ".join(branches) + "\nORDER BY text_id, pos"
