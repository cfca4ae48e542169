"""Long-lived query serving — the SearchServer analog as plain Ray actors.

The reference serves queries over a persistent HTTP process
(``/root/reference/src/cis5550/jobs/SearchServer.java:103-266``: load
state once, then answer ``/search?q=...`` forever).  The Ray-native
analog (SURVEY.md §3.3) is a pool of **named actors**, each holding a
``SegmentIndex`` loaded once in ``__init__``; clients resolve them by
name (``ray.get_actor``) and round-robin requests.  On a cluster the
actors are created ``lifetime="detached"`` so they outlive the driver
that started them — the same always-on property the HTTP server has —
and each replica mmaps the shared index store independently.

No HTTP layer is reimplemented: the wire protocol is Ray's task
protocol, which is what a Ray-native deployment would use (an HTTP
front would be one thin FastAPI handler calling ``handle.topk`` — out
of scope for a data-processing engine, as SURVEY.md §2.2 notes).
"""

from __future__ import annotations

import pandas as pd

import ray


@ray.remote
class IndexServer:
    """One serving replica: index (+ optional title map) loaded once."""

    def __init__(self, index_dir: str, sf_dir: str | None = None):
        import os

        from .query import LazyTitles, SegmentIndex, conv_titles

        self.index = SegmentIndex(index_dir)
        if os.path.isdir(os.path.join(index_dir, "docstore")):
            # self-contained serving: titles resolved per candidate from
            # the index-local doc-store (<=CAND_K point lookups per
            # query) — no conversation-count-sized map in the replica
            self.titles = LazyTitles(index_dir)
        elif sf_dir:
            self.titles = conv_titles(sf_dir)
        else:
            self.titles = None

    def topk(self, query_text: str, k: int = 10, mode: str = "bm25") -> pd.DataFrame:
        if mode == "faithful_boosted":
            if self.titles is None:
                raise ValueError("faithful_boosted requires sf_dir at start()")
            from .query import _topk_boosted

            return _topk_boosted(self.index, query_text, k, self.titles)
        return self.index.topk(query_text, k, mode)

    def info(self) -> dict:
        return {
            "n_terms": self.index.manifest["n_terms"],
            "global_stats": self.index.global_stats,
            "partitions": self.index.manifest["num_partitions"],
        }


class ServeHandle:
    """Round-robin client over the replica pool."""

    def __init__(self, actors):
        self.actors = list(actors)
        self._i = 0

    def topk(self, query_text: str, k: int = 10, mode: str = "bm25") -> pd.DataFrame:
        a = self.actors[self._i % len(self.actors)]
        self._i += 1
        return ray.get(a.topk.remote(query_text, k, mode))

    def info(self) -> dict:
        return ray.get(self.actors[0].info.remote())


def start(
    index_dir: str,
    replicas: int = 2,
    name: str = "raystorm-server",
    sf_dir: str | None = None,
    detached: bool = False,
) -> ServeHandle:
    """Start (or reconnect to) the named replica pool.

    ``get_if_exists=True`` makes this idempotent: a second driver calling
    ``start`` with the same name attaches to the running replicas instead
    of double-loading the index.  ``detached=True`` (cluster deployments)
    keeps replicas alive after this driver exits.
    """
    opts: dict = {"get_if_exists": True}
    if detached:
        opts["lifetime"] = "detached"
    actors = [
        IndexServer.options(name=f"{name}-{i}", **opts).remote(index_dir, sf_dir)
        for i in range(replicas)
    ]
    return ServeHandle(actors)


def stop(replicas: int = 2, name: str = "raystorm-server") -> int:
    """Kill the named replicas; returns how many were found."""
    n = 0
    for i in range(replicas):
        try:
            ray.kill(ray.get_actor(f"{name}-{i}"))
            n += 1
        except ValueError:
            pass
    return n
