"""Multimodal plumbing tests: the fake-backend feature pipeline, the
resize arithmetic, the df-capped hot-shingle guard's neighbor (frame
explode), and — env-gated — a REAL PNG decode through the actor pool
(runs only if the container ever gains PIL; documents the seam's
readiness, VERDICT r3 item 5)."""

import importlib.util

import numpy as np
import pyarrow as pa
import pytest

from raystorm import multimodal

HAS_PIL = importlib.util.find_spec("PIL") is not None


def test_media_features_fake_backend(ray_session):
    """Fake decode is deterministic and schema-stable: dimensions are
    size/hash-derived, hash matches a driver-side md5 recompute."""
    import hashlib

    sf = "/root/testdata/sf0.001"
    df = multimodal.media_features(sf).to_pandas()
    assert list(df.columns) == [
        "media_id",
        "media_type",
        "n_bytes",
        "width",
        "height",
        "channels",
        "content_hash",
    ]
    assert (df["channels"] == 3).all()
    assert (df["width"] == df["n_bytes"] % 640 + 1).all()
    assert (df["height"] == df["content_hash"] % 480 + 1).all()
    import pandas as pd

    docs = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text"]]
    row = df.iloc[0]
    text = docs.set_index("doc_id").loc[row["media_id"], "text"] or ""
    assert row["content_hash"] == int(
        hashlib.md5(text.encode()).hexdigest()[:15], 16
    )


def test_media_resize_arithmetic():
    """Aspect-preserving integer fit: max side clamps to RESIZE_MAX,
    never upscales, never emits 0."""
    batch = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "width": pa.array([640, 100, 1], pa.int32()),
            "height": pa.array([480, 50, 1000], pa.int32()),
        }
    )
    out = multimodal.MediaResizeStage()(batch)
    w = out["resized_w"].to_pylist()
    h = out["resized_h"].to_pylist()
    assert (w[0], h[0]) == (224, 168)  # downscale, aspect kept
    assert (w[1], h[1]) == (100, 50)  # no upscaling
    assert (w[2], h[2]) == (1, 224)  # floor clamps to >= 1
    assert max(w[0], h[0]) == multimodal.RESIZE_MAX


@pytest.mark.skipif(not HAS_PIL, reason="container has no PIL/codecs")
def test_pil_decode_real_png(ray_session):  # pragma: no cover - env-gated
    """A real PNG decodes through the actor-pool stage: true pixel
    dimensions and band count come back, not the fake derivation."""
    import io

    import ray.data as rd
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    payload = buf.getvalue()
    media = pa.Table.from_arrays(
        [
            pa.array([7], pa.int64()),
            pa.array(["image/png"], pa.string()),
            pa.array([payload], pa.binary()),
            pa.array([len(payload)], pa.int64()),
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    out = (
        rd.from_arrow(media)
        .map_batches(
            multimodal.MediaDecodeStage,
            fn_constructor_kwargs={"decode_backend": "pil"},
            concurrency=1,
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    assert out.loc[0, "width"] == 17
    assert out.loc[0, "height"] == 9
    assert out.loc[0, "channels"] == 3


def test_pil_backend_raises_without_pil():
    if HAS_PIL:  # pragma: no cover - env-gated
        pytest.skip("PIL present; covered by the real-decode test")
    with pytest.raises(NotImplementedError):
        multimodal.MediaDecodeStage(decode_backend="pil")


def test_sigrunpairs_df_cap_drops_hot_shingle(caplog):
    """A synthetic hot shingle (one sh_hash shared by many docs) is
    dropped by the df-cap with a logged forgone-pair count; cold runs
    pass through untouched."""
    import logging

    import pandas as pd

    from raystorm import dedup

    hot = pd.DataFrame(
        {
            "doc_id": np.arange(50, dtype=np.int64),
            "sh_hash": np.full(50, 123, np.int64),
        }
    )
    cold = pd.DataFrame(
        {"doc_id": np.array([100, 101], np.int64), "sh_hash": np.array([9, 9], np.int64)}
    )
    group = pd.concat([hot, cold], ignore_index=True)
    with caplog.at_level(logging.WARNING, logger="raystorm.dedup"):
        out = dedup._SigRunPairs(["sh_hash"], df_cap=10)(group)
    # hot run dropped; the cold pair survives
    assert out.doc_a.tolist() == [100] and out.doc_b.tolist() == [101]
    assert any("df-cap" in r.message and "1225" in r.message for r in caplog.records)
    # uncapped control: the hot run explodes quadratically
    full = dedup._SigRunPairs(["sh_hash"])(group)
    assert len(full) == 50 * 49 // 2 + 1


def test_df_cap_bias_is_conservative():
    """A pair sharing a capped shingle plus uncapped ones loses the
    capped one from the INTERSECTION only (unions keep it), so its
    Jaccard is strictly under-estimated — the documented bias, never an
    inflated score."""
    import pandas as pd

    from raystorm import dedup

    # docs 1,2 share: one hot shingle (hash 7, df=40 via docs 1..40)
    # and two cold shingles (hashes 8, 9)
    hot = pd.DataFrame(
        {
            "doc_id": np.arange(1, 41, dtype=np.int64),
            "sh_hash": np.full(40, 7, np.int64),
        }
    )
    cold = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 1, 2], np.int64),
            "sh_hash": np.array([8, 8, 9, 9], np.int64),
        }
    )
    group = pd.concat([hot, cold], ignore_index=True)
    capped = dedup._SigRunPairs(["sh_hash"], df_cap=10)(group)
    uncapped = dedup._SigRunPairs(["sh_hash"])(group)
    n_capped = len(capped[(capped.doc_a == 1) & (capped.doc_b == 2)])
    n_full = len(uncapped[(uncapped.doc_a == 1) & (uncapped.doc_b == 2)])
    assert n_capped == 2 and n_full == 3  # intersection loses ONLY the hot one
    # union sizes (doc counts) are cap-blind: jaccard under-estimates
    na = nb = 3.0
    assert n_capped / (na + nb - n_capped) < n_full / (na + nb - n_full)


def test_read_partitioned_ignores_orphan_tmp_dirs(ray_session, tmp_path):
    """A writer killed between write and os.replace leaves a
    shard-*.tmp-* directory; the manifest-gated reader must not read it
    (double-count) or crash on a torn file."""
    import json
    import os

    import pyarrow as pa
    import ray.data as rd

    from raystorm import sinks

    out = str(tmp_path / "shards")
    ds = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()), "v": pa.array(list("abcd"))})
    )
    sinks.write_partitioned(ds, out, "k", num_shards=2, fingerprint="fp1")
    clean = sinks.read_partitioned(out).to_pandas()
    # simulate the crash: a leftover tmp dir with a duplicate payload
    orphan = os.path.join(out, "shard-00000.tmp-dead")
    os.makedirs(orphan)
    import shutil

    shutil.copy(
        os.path.join(out, "shard-00000", "data.parquet"),
        os.path.join(orphan, "data.parquet"),
    )
    with open(os.path.join(orphan, "_manifest.json"), "w") as f:
        json.dump({"status": "incomplete"}, f)
    again = sinks.read_partitioned(out).to_pandas()
    assert len(again) == len(clean) == 4
    # and a shard dir with a torn manifest is skipped, not fatal
    torn = os.path.join(out, "shard-00009")
    os.makedirs(torn)
    open(os.path.join(torn, "data.parquet"), "wb").close()
    open(os.path.join(torn, "_manifest.json"), "w").write("{not json")
    assert len(sinks.read_partitioned(out).to_pandas()) == 4
