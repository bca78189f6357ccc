"""Sources/sinks, Qwen3-VL patch extraction, and the stateful streaming
operator — each driven through its real surface."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastembed_rs_spark.operators.preprocessing import (
    normalize,
    qwen_vl_patches,
    rescale,
    resize_hwc,
    smart_resize,
    to_chw_float,
)
from fastembed_rs_spark.sources import read_documents, read_images, write_embeddings


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="srcsink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# smart_resize / patches
# ---------------------------------------------------------------------------

def test_smart_resize_alignment_and_bounds():
    f = 32
    h, w = smart_resize(100, 200, f, 0, 2**31)
    assert h % f == 0 and w % f == 0
    # ties-to-even: 48/32 = 1.5 → rounds to 2 (even), so 64
    assert smart_resize(48, 48, 32, 0, 2**31) == (64, 64)
    # 112/32 = 3.5 → rounds to 4 → 128
    assert smart_resize(112, 112, 32, 0, 2**31) == (128, 128)
    # max_pixels forces shrink, still aligned
    h, w = smart_resize(1000, 1000, 32, 0, 128 * 128)
    assert h % 32 == 0 and w % 32 == 0 and h * w <= 128 * 128
    # min_pixels forces growth
    h, w = smart_resize(40, 40, 32, 256 * 256, 2**31)
    assert h * w >= 256 * 256
    with pytest.raises(ValueError):
        smart_resize(1, 300, 32, 0, 2**31)  # aspect > 200


def test_qwen_vl_patches_match_naive_loop():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 96, 3), dtype=np.uint8)
    ps, tps, ms = 16, 2, 2
    patches, (gt, gh, gw) = qwen_vl_patches(img, ps, tps, ms)
    assert (gt, gh, gw) == (1, 4, 6)
    assert patches.shape == (gh * gw, 3 * tps * ps * ps)

    # naive loop oracle over the same resized/normalized tensor
    rh, rw = smart_resize(64, 96, ps * ms, 0, 2**31)
    chw = normalize(rescale(to_chw_float(resize_hwc(img, rh, rw))), (0.5,) * 3, (0.5,) * 3)
    rows = []
    for ghb in range(gh // ms):
        for gwb in range(gw // ms):
            for mh in range(ms):
                for mw in range(ms):
                    g_h, g_w = ghb * ms + mh, gwb * ms + mw
                    vals = []
                    for c in range(3):
                        block = chw[c, g_h * ps:(g_h + 1) * ps, g_w * ps:(g_w + 1) * ps]
                        for _ in range(tps):
                            vals.extend(block.flatten().tolist())
                    rows.append(vals)
    naive = np.asarray(rows, dtype=np.float32)
    assert np.array_equal(patches, naive)


# ---------------------------------------------------------------------------
# sources / sinks
# ---------------------------------------------------------------------------

def test_read_documents_text_and_csv(spark, tmpdir):
    txt_dir = os.path.join(tmpdir, "txt")
    os.makedirs(txt_dir)
    with open(os.path.join(txt_dir, "a.txt"), "w") as f:
        f.write("line one\nline two\n")
    df = read_documents(spark, txt_dir, fmt="text")
    rows = df.collect()
    assert sorted(r["text"] for r in rows) == ["line one", "line two"]
    assert len({r["doc_id"] for r in rows}) == 2

    with pytest.raises(ValueError, match="unsupported"):
        read_documents(spark, txt_dir, fmt="orcish")


def test_read_documents_orc_roundtrip(spark, tmpdir):
    """ORC is a first-class columnar source (built into Spark): write a
    corpus as ORC, read it back through read_documents, and check that a
    filter reaches the ORC scan as a pushed predicate."""
    orc_dir = os.path.join(tmpdir, "orc")
    src = spark.createDataFrame(
        [(i, f"doc number {i}", "en") for i in range(20)],
        ["doc_id", "text", "lang"],
    )
    src.write.format("orc").save(orc_dir)
    df = read_documents(spark, orc_dir, fmt="orc")
    assert df.count() == 20
    assert {r["doc_id"] for r in df.filter("doc_id < 3").collect()} == {0, 1, 2}
    plan = (
        df.filter("doc_id < 3").select("doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "orc" in plan.lower()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,3)]" in plan


def test_zorder_prunes_on_both_columns(spark, tmpdir):
    """Z-order clustering: every output file covers a FRACTIONAL range of
    BOTH clustering columns, so parquet min/max statistics prune scans
    filtered on either one — where a 1-D sort leaves the second column
    spanning ~the full range in every file."""
    import duckdb

    from fastembed_rs_spark.sources.io import compact_parquet, zorder_parquet

    src = os.path.join(tmpdir, "zsrc")
    # two independent uniform dimensions — worst case for 1-D sorting
    n = 20000
    spark.range(n).selectExpr(
        "cast(pmod(id * 2654435761, 4096) as double) as a",
        "cast(pmod(id * 40503 + 7, 4096) as double) as b",
    ).coalesce(1).write.parquet(src)

    def avg_spans(path: str) -> tuple[float, float]:
        q = duckdb.sql(
            f"""SELECT avg(sa), avg(sb) FROM (
                  SELECT (max(a)-min(a))/4095.0 AS sa,
                         (max(b)-min(b))/4095.0 AS sb
                  FROM read_parquet('{path}/*.parquet', filename=true)
                  GROUP BY filename)"""
        ).fetchone()
        return float(q[0]), float(q[1])

    zdst = os.path.join(tmpdir, "zdst")
    assert zorder_parquet(spark, src, zdst, ["a", "b"], n_files=16) == 16
    za, zb = avg_spans(zdst)
    # 16 files over 2 interleaved dims → each file ≈ 1/4 of each dim
    assert za < 0.5 and zb < 0.5, (za, zb)

    sdst = os.path.join(tmpdir, "sdst")
    compact_parquet(spark, src, sdst, target_file_mb=1, sort_col="a")
    # 1-D comparison point: b spans ~everything per file
    _, sb = avg_spans(sdst)
    assert sb > 0.9, sb
    # row counts preserved
    assert spark.read.parquet(zdst).count() == n


def test_read_images_binary_glob(spark, tmpdir):
    img_dir = os.path.join(tmpdir, "imgs")
    os.makedirs(img_dir)
    for name, content in [("a.png", b"\x89PNGxxxx"), ("b.jpg", b"\xff\xd8\xffyy"),
                          ("skip.txt", b"not an image")]:
        with open(os.path.join(img_dir, name), "wb") as f:
            f.write(content)
    df = read_images(spark, img_dir)
    rows = {r["image_id"]: bytes(r["content"]) for r in df.collect()}
    assert set(rows) == {"a.png", "b.jpg"}  # glob pruned skip.txt at listing
    assert rows["a.png"].startswith(b"\x89PNG")

    # end-to-end: binaryFile source → embed_image
    from fastembed_rs_spark.operators.embed import embed_image

    out = embed_image(df, "content", model="stub-image").collect()
    assert len(out) == 2 and all(len(r["embedding"]) == 32 for r in out)


def test_write_embeddings_roundtrip(spark, tmpdir):
    from fastembed_rs_spark.operators.embed import embed_text

    docs = spark.createDataFrame(
        [(i, f"document number {i}", "en" if i % 2 else "fr") for i in range(20)],
        ["doc_id", "text", "lang"],
    )
    emb = embed_text(docs, "text")
    path = os.path.join(tmpdir, "emb")
    write_embeddings(emb, path, partition_by="lang", target_file_rows=10)
    back = spark.read.parquet(path)
    assert back.count() == 20
    assert set(back.columns) == {"doc_id", "text", "lang", "embedding"}
    # hive partitioning materialized → partition pruning possible
    assert os.path.isdir(os.path.join(path, "lang=en"))


def test_partitioned_sink_prunes_on_read_back(spark, tmpdir):
    """A filter on the partition column must become a PartitionFilter on
    the scan (directory-level pruning — at 100 TB the difference between
    reading one partition and reading the lake)."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}", ["en", "fr", "de"][i % 3]) for i in range(30)],
        ["doc_id", "text", "lang"],
    )
    path = os.path.join(tmpdir, "pruned")
    write_embeddings(docs, path, partition_by="lang")
    back = spark.read.parquet(path).filter(F.col("lang") == "fr")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters: [", 1)[1][:120]
    assert "lang" in seg  # the predicate landed in the partition filter...
    pushed = plan.split("PushedFilters: [", 1)[1][:80]
    assert "lang" not in pushed  # ...not in the row-group data filter
    assert back.count() == 10


# ---------------------------------------------------------------------------
# applyInPandasWithState
# ---------------------------------------------------------------------------

def test_running_user_stats_stateful(spark, tmpdir):
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType
    from fastembed_rs_spark.streaming.stateful import running_user_stats

    rows = [
        (1, "2024-01-01 00:00:00", 10),
        (1, "2024-01-01 00:01:00", 5),
        (2, "2024-01-01 00:02:00", 7),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_s", "value"]).select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), F.col("value").cast("double")
    )
    src_dir = os.path.join(tmpdir, "events")
    df.coalesce(1).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    src = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        running_user_stats(src)
        .writeStream.format("memory").queryName("user_stats")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in spark.sql("SELECT * FROM user_stats").collect()}
    q.stop()
    assert got == {1: (2, 15.0), 2: (1, 7.0)}


def test_compact_parquet_reduces_file_count(spark, tmpdir):
    from fastembed_rs_spark.sources import compact_parquet

    src = os.path.join(tmpdir, "many")
    dst = os.path.join(tmpdir, "compacted")
    df = spark.range(10_000).selectExpr("id", "id * 2 AS v")
    df.repartition(40).write.parquet(src)
    n_small = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_small == 40

    n_out = compact_parquet(spark, src, dst, target_file_mb=128)
    assert n_out == 1  # 10k tiny rows ≪ 128 MB -> one file
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) == 1
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    assert back.selectExpr("sum(v)").first()[0] == df.selectExpr("sum(v)").first()[0]


def test_compact_parquet_sorted_ranges_are_disjoint(spark, tmpdir):
    """With sort_col, output files carry disjoint ranges -> row-group
    stats prune point/range reads on that column."""
    from fastembed_rs_spark.sources import compact_parquet

    src = os.path.join(tmpdir, "many2")
    dst = os.path.join(tmpdir, "sorted")
    # md5 strings don't compress — enough bytes to span several 1 MB files
    spark.range(300_000).selectExpr("id", "md5(cast(id as string)) AS s") \
        .repartition(20).write.parquet(src)
    # pick a target that yields several files for this byte size
    compact_parquet(spark, src, dst, target_file_mb=1, sort_col="id")
    files = sorted(
        os.path.join(dst, f) for f in os.listdir(dst) if f.endswith(".parquet")
    )
    assert len(files) >= 2
    ranges = []
    for f in files:
        mm = spark.read.parquet(f).selectExpr("min(id)", "max(id)").first()
        ranges.append((mm[0], mm[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint, ordered ranges


def test_upsert_embeddings_rewrites_only_affected_buckets(spark, tmpdir):
    """MERGE semantics on a hash-bucketed parquet store: updated keys
    replaced, new keys added, all other rows intact — and bucket
    directories with no touched key keep their exact files."""
    from fastembed_rs_spark.sources import upsert_embeddings

    store = os.path.join(tmpdir, "store")
    base = spark.createDataFrame(
        [(i, f"v1-{i}") for i in range(100)], ["doc_id", "payload"]
    )
    upsert_embeddings(spark, store, base, "doc_id", n_buckets=8)

    def bucket_files():
        out = {}
        for d in os.listdir(store):
            if d.startswith("__bucket="):
                out[d] = sorted(
                    f for f in os.listdir(os.path.join(store, d))
                    if f.endswith(".parquet")
                )
        return out

    before = bucket_files()
    assert len(before) == 8

    delta = spark.createDataFrame(
        [(5, "v2-5"), (200, "v2-200")], ["doc_id", "payload"]
    )
    upsert_embeddings(spark, store, delta, "doc_id", n_buckets=8)

    back = {r["doc_id"]: r["payload"] for r in spark.read.parquet(store).collect()}
    assert len(back) == 101
    assert back[5] == "v2-5" and back[200] == "v2-200"
    assert back[6] == "v1-6"

    # the buckets of keys 5 and 200 changed; every other bucket kept its files
    after = bucket_files()
    touched = {
        r["b"]
        for r in delta.selectExpr("cast(pmod(xxhash64(doc_id), 8) as int) AS b")
        .distinct().collect()
    }
    for d, files in before.items():
        b = int(d.split("=")[1])
        if b not in touched:
            assert after[d] == files, f"untouched bucket {d} was rewritten"


def test_rewrite_rejects_in_place(spark, tmpdir):
    """ADVICE r4: dst == src would delete the source mid-scan (lazy read +
    mode overwrite). Both rewrite ops refuse, including via path aliases."""
    import pytest

    from fastembed_rs_spark.sources.io import compact_parquet, zorder_parquet

    src = os.path.join(tmpdir, "ds")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.parquet(src)
    with pytest.raises(ValueError, match="same location"):
        compact_parquet(spark, src, src)
    with pytest.raises(ValueError, match="same location"):
        zorder_parquet(spark, src, "file://" + src + "/", ["id", "v"])
    # ADVICE r5: the Hadoop single-slash URI spelling and a symlink alias
    # of the source dir must not bypass the guard.
    with pytest.raises(ValueError, match="same location"):
        compact_parquet(spark, src, "file:" + src)
    alias = os.path.join(tmpdir, "ds_link")
    os.symlink(src, alias)
    with pytest.raises(ValueError, match="same location"):
        compact_parquet(spark, src, alias)
    # distinct dst still works
    assert compact_parquet(spark, src, os.path.join(tmpdir, "out")) >= 1


def test_write_training_shards_packs_and_prunes(spark, tmpdir):
    """Shards respect the token budget (+ at most one boundary-spanning
    doc), cover every non-empty doc exactly once, and reading one shard
    prunes partitions at the scan."""
    from fastembed_rs_spark.functions.text import tokens as tok_fn
    from fastembed_rs_spark.sources.io import write_training_shards

    docs = spark.createDataFrame(
        [(i, "w " * (5 + (i * 13) % 40)) for i in range(200)]
        + [(999, "")],  # zero-token doc must be dropped
        "doc_id long, text string",
    )
    out = os.path.join(tmpdir, "shards")
    ids = write_training_shards(
        docs, out, tokens_per_shard=100, pack_shards=4
    )
    assert ids == sorted(ids) and len(ids) >= 4

    back = spark.read.parquet(out)
    assert back.count() == 200  # empty doc dropped, everything else once
    assert back.select("doc_id").distinct().count() == 200
    per = (
        back.withColumn("nt", F.size(tok_fn("text")))
        .groupBy("shard_id").agg(F.sum("nt").alias("tot"), F.max("nt").alias("mx"))
        .collect()
    )
    for r in per:
        assert r.tot <= 100 + r.mx  # budget + one spanning doc

    one = back.filter(F.col("shard_id") == ids[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard_id" in plan.split(
        "PartitionFilters", 1
    )[1][:200]


def test_write_training_shards_id_overflow_raises(spark, tmpdir):
    """ADVICE r5: shard ids are stream * buckets_per_stream + bucket; a
    stream exceeding its bucket bound must fail loudly at write time, not
    silently collide into the next stream's id range."""
    import pytest

    from fastembed_rs_spark.sources.io import write_training_shards

    docs = spark.createDataFrame(
        [(i, "w " * 50) for i in range(40)], "doc_id long, text string"
    )
    # 40 docs x ~50 tokens over 4 streams at 10 tokens/shard -> bucket > 2
    with pytest.raises(Exception, match="buckets_per_stream"):
        write_training_shards(
            docs,
            os.path.join(tmpdir, "bad"),
            tokens_per_shard=10,
            pack_shards=4,
            buckets_per_stream=2,
        )
    # id-space precondition is validated up front
    with pytest.raises(ValueError, match="64-bit"):
        write_training_shards(
            docs,
            os.path.join(tmpdir, "bad2"),
            pack_shards=1 << 30,
            buckets_per_stream=1 << 40,
        )
