"""JobOutput accumulator — FlameContext.output parity.

Reference semantics (FlameContextImpl.java:18-25): newline-joined
appends, nulls ignored, default message when a job never emits.
"""

import ray
import ray.data as rd

from raystorm.context import NO_OUTPUT, JobOutput


def test_empty_default(ray_session):
    out = JobOutput()
    assert out.value() == NO_OUTPUT


def test_driver_appends_ordered(ray_session):
    out = JobOutput()
    out.output("CRAWL QUALITY ANALYSIS")
    out.output(None)  # ignored, like the reference's null guard
    out.output("Total pages crawled: 42")
    out.output(7)  # non-strings stringified
    assert out.value() == "CRAWL QUALITY ANALYSIS\nTotal pages crawled: 42\n7"


def test_worker_appends_from_map_batches(ray_session):
    out = JobOutput()

    def stage(batch, out=out):
        out.output(f"rows={batch.num_rows}")
        return batch

    n = (
        rd.range(40, override_num_blocks=4)
        .map_batches(stage, batch_format="pyarrow")
        .count()
    )
    assert n == 40
    lines = out.lines()
    assert lines and all(l.startswith("rows=") for l in lines)
    assert sum(int(l.split("=")[1]) for l in lines) == 40


def test_handle_serializes_through_ray_put(ray_session):
    out = JobOutput()
    ref = ray.put(out)
    restored = ray.get(ref)
    restored.output("from restored handle")
    assert out.value() == "from restored handle"
