"""Full local gate sweep: every ``queries()`` entry vs its
``oracle_sql()`` twin at sf0.01, with per-gate ray/SQL wall times.

Mirrors the driver's comparison (sort columns by name, sort rows,
value-compare) and writes ``GATESWEEP_r{N}.json`` at the repo root.

Usage: python tools/gatesweep.py [round_number] [--only name1,name2]
"""

import glob
import json
import os
import sys
import time

import duckdb
import pandas as pd


def main() -> int:
    import ray

    rnd = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "04"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf, "*.parquet")):
        name = os.path.splitext(os.path.basename(p))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    # warm the Ray session before timing anything (worker startup adds
    # ~2 s to whichever dataset runs first — the bench.py lesson)
    import ray.data as rd

    rd.range(1000).map_batches(lambda b: b, batch_format="pyarrow").count()

    qs, oracles = E.queries(), E.oracle_sql()
    out, n_exact, n_rowsonly, n_fail = {}, 0, 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = fn(sf)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            ray_s = round(time.perf_counter() - t0, 2)
            if name not in oracles:
                out[name] = {"ray_s": ray_s, "sql_s": None, "status": f"rows_only({len(got)})"}
                n_rowsonly += 1
                print(f"{name}: rows_only({len(got)}) {ray_s}s", flush=True)
                continue
            t1 = time.perf_counter()
            want = con.execute(oracles[name]).fetchdf()
            sql_s = round(time.perf_counter() - t1, 2)
            g = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
            w = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
            status = None
            if len(g) != len(w):
                status = f"ROWS {len(g)}!={len(w)}"
            elif list(g.columns) != list(w.columns):
                status = f"SCHEMA {list(g.columns)}!={list(w.columns)}"
            else:
                gs = g.sort_values(list(g.columns)).reset_index(drop=True)
                ws = w.sort_values(list(w.columns)).reset_index(drop=True)
                # check_exact mirrors the driver's value-hash contract
                # (values are pre-rounded on both sides); sub-1e-5
                # drift is reported as match(~1e-5), NOT exact, so the
                # artifact never overstates parity vs the driver
                try:
                    pd.testing.assert_frame_equal(gs, ws, check_dtype=False, check_exact=True)
                    status = f"exact({len(g)})"
                    n_exact += 1
                except AssertionError as e:
                    try:
                        pd.testing.assert_frame_equal(gs, ws, check_dtype=False)
                        status = f"match(~1e-5)({len(g)})"
                    except AssertionError:
                        status = "VALUES " + str(e).splitlines()[0][:120]
            if not status.startswith(("exact", "match")):
                n_fail += 1
            out[name] = {"ray_s": ray_s, "sql_s": sql_s, "status": status}
            print(f"{name}: {status} ray={ray_s}s sql={sql_s}s", flush=True)
        except Exception as e:  # noqa: BLE001 - sweep must record, not die
            n_fail += 1
            out[name] = {
                "ray_s": round(time.perf_counter() - t0, 2),
                "sql_s": None,
                "status": f"ERROR {type(e).__name__}: {str(e)[:160]}",
            }
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:160]}", flush=True)

    if not only:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), f"GATESWEEP_r{rnd}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"\nwrote {path}")
    n_approx = sum(1 for v in out.values() if v["status"].startswith("match"))
    print(
        f"gates={len(out)} exact={n_exact} approx={n_approx} "
        f"rows_only={n_rowsonly} fail={n_fail}"
    )
    if n_approx:
        print("APPROX-ONLY (would fail the driver's hash-compare):",
              [k for k, v in out.items() if v["status"].startswith("match")])
    slow = sorted(out.items(), key=lambda kv: -(kv[1]["sql_s"] or 0))[:8]
    print("slowest oracles:", [(k, v["sql_s"]) for k, v in slow])
    slow_ray = sorted(out.items(), key=lambda kv: -(kv[1]["ray_s"] or 0))[:8]
    print("slowest ray:", [(k, v["ray_s"]) for k, v in slow_ray])
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
