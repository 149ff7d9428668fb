"""Sinks (derived key, partitioned write, merge upsert, CSV/JSON
round-trip, model registry) and multimodal plumbing tests."""

from __future__ import annotations


from pyspark.sql import functions as F

from multi_crm_cross_sell_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    resize_metadata,
    synth_media,
)
from multi_crm_cross_sell_spark.sources import fixtures
from multi_crm_cross_sell_spark.sources.sinks import (
    derived_key,
    export_csv,
    export_json,
    merge_upsert,
    model_registry_append,
    read_csv_export,
    save_table,
)


def test_derived_key_and_partitioned_write(spark, tmp_path):
    acc = fixtures.accounts(spark, n_per_org=40)
    keyed = derived_key(acc)
    assert keyed.where(F.col("record_id") == "org1_ACC1_0000").count() == 1
    out = str(tmp_path / "accounts")
    save_table(keyed, out, partition_by=["_org_id"])
    back = spark.read.parquet(out)
    assert back.count() == keyed.count()
    # partition pruning: reading one org must scan only its directory
    one = spark.read.parquet(out).where(F.col("_org_id") == "org1")
    assert one.count() == 40


def test_merge_upsert(spark, tmp_path):
    path = str(tmp_path / "recs")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    merge_upsert(spark, path, base, ["id"])
    upd = spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"])
    merge_upsert(spark, path, upd, ["id"])
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x", 1.5), (2, "y", 2.5)], ["id", "s", "v"])
    cpath, jpath = str(tmp_path / "c"), str(tmp_path / "j")
    export_csv(df, cpath)
    export_json(df, jpath)
    back_c = read_csv_export(spark, cpath, schema="id INT, s STRING, v DOUBLE")
    back_j = spark.read.json(jpath)
    assert back_c.count() == 2 and back_j.count() == 2
    assert {r["s"] for r in back_c.collect()} == {"x", "y"}


def test_model_registry(spark, tmp_path):
    path = str(tmp_path / "registry")
    model_registry_append(spark, path, "ensemble", "v1", "production", {"auc": 0.9}, "/models/v1")
    model_registry_append(spark, path, "ensemble", "v2", "staging", {"auc": 0.92}, "/models/v2")
    reg = spark.read.parquet(path)
    assert reg.count() == 2
    assert reg.where(F.col("stage") == "production").count() == 1


class TestCodecs:
    """Round-trip the real stdlib codecs on known bytes — decode is
    genuine parsing, not a deterministic fake."""

    def test_bmp_round_trip_exact(self):
        import numpy as np

        from multi_crm_cross_sell_spark.operators.multimodal import (
            decode_bmp,
            encode_bmp,
        )

        rgb = np.arange(5 * 3 * 3, dtype=np.uint8).tobytes()  # 5x3, padded rows
        payload = encode_bmp(5, 3, rgb)
        assert payload[:2] == b"BM"
        w, h, back = decode_bmp(payload)
        assert (w, h) == (5, 3)
        assert back == rgb

    def test_wav_round_trip_exact(self):
        import numpy as np

        from multi_crm_cross_sell_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        samples = np.array([0, 100, -32768, 32767, -1], dtype=np.int16)
        rate, back = decode_wav(encode_wav(samples, 16000))
        assert rate == 16000
        assert (back == samples).all()

    def test_y4m_round_trip_exact(self):
        from multi_crm_cross_sell_spark.operators.multimodal import (
            decode_y4m,
            encode_y4m,
        )

        frames = [bytes(range(48)), bytes(reversed(range(48)))]  # 4x4 C444
        w, h, fps, back = decode_y4m(encode_y4m(4, 4, frames, fps=30))
        assert (w, h, fps) == (4, 4, 30)
        assert back == frames

    def test_resize_images_real_pixels(self, spark):
        import numpy as np

        from multi_crm_cross_sell_spark.operators.multimodal import (
            decode_bmp,
            resize_images,
            synth_media,
        )

        media = synth_media(spark, n=3)  # ids 0..2 -> one image (id 0)
        out = {r["media_id"]: r for r in resize_images(media, max_side=16).collect()}
        assert set(out) == {0}
        w, h, rgb = decode_bmp(bytes(out[0]["payload"]))
        assert (w, h) == (16, 16)
        assert len(rgb) == 16 * 16 * 3
        # nearest-neighbor: every resized pixel exists in the source
        src = np.random.RandomState(0).randint(0, 256, 64 * 64 * 3, dtype=np.uint8)
        src_px = {bytes(p) for p in src.reshape(-1, 3)}
        assert all(bytes(p) in src_px
                   for p in np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3))

    def test_sample_frames_luma(self, spark):
        from multi_crm_cross_sell_spark.operators.multimodal import (
            sample_frames,
            synth_media,
        )

        media = synth_media(spark, n=30)
        rows = sample_frames(media, every_ms=250).collect()
        per_video = {}
        for r in rows:
            per_video.setdefault(r["media_id"], []).append(r)
        assert all(len(v) == 4 for v in per_video.values())  # 1000ms / 250ms
        assert all(0.0 <= r["frame_mean_y"] <= 1.0 for r in rows)


def test_multimodal_features(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media, dim=8)
    pdf = feats.toPandas()
    assert len(pdf) == 30
    assert all(len(v) == 8 for v in pdf["features"])
    # deterministic: same payload -> same hash/features on re-run
    pdf2 = extract_features(media, dim=8).toPandas()
    assert (pdf.sort_values("media_id")["content_hash"].values
            == pdf2.sort_values("media_id")["content_hash"].values).all()


def test_frame_sample_and_resize(spark):
    media = synth_media(spark, n=30)
    frames = frame_sample(media, every_ms=250)
    per_video = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per_video)  # 1000ms / 250ms
    rs = resize_metadata(media, max_side=32).collect()
    assert all(r["target_width"] == 32 for r in rs)  # 64x64 -> 32x32


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, sf_dir, tmp_path):
        from multi_crm_cross_sell_spark.sources.sinks import save_bucketed_table

        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
            "o_custkey", "c_custkey"
        )
        save_bucketed_table(c, "b_customer", ["c_custkey"], 8)
        save_bucketed_table(o, "b_orders", ["c_custkey"], 8)
        bc, bo = spark.table("b_customer"), spark.table("b_orders")
        # disable broadcast so the join strategy depends on bucketing
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bo.join(bc, "c_custkey").groupBy("c_mktsegment").count()
            plan = joined._jdf.queryExecution().executedPlan().toString()
            n_exchanges = plan.count("Exchange")
            # bucketed sides: the JOIN itself needs no exchange; only
            # the final 1-column aggregation may shuffle
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            assert n_exchanges <= 1, plan
            # and the result matches the unbucketed join
            plain = (
                spark.read.parquet(f"{sf_dir}/orders.parquet")
                .withColumnRenamed("o_custkey", "c_custkey")
                .join(c, "c_custkey")
                .groupBy("c_mktsegment")
                .count()
            )
            assert sorted(joined.collect()) == sorted(plain.collect())
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.sql("DROP TABLE IF EXISTS b_customer")
            spark.sql("DROP TABLE IF EXISTS b_orders")


def test_export_excel_writes_real_xlsx(spark, sf_dir, tmp_path):
    """The encode must produce a real OOXML zip whose sheet XML
    round-trips the cell values (api/main.py:794-858)."""
    import zipfile
    import xml.etree.ElementTree as ET

    from multi_crm_cross_sell_spark.sources.sinks import export_excel

    df = spark.read.parquet(f"{sf_dir}/nation.parquet").orderBy("n_nationkey")
    path = str(tmp_path / "out.xlsx")
    export_excel(df, path)
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml", "xl/worksheets/sheet1.xml"} <= names
        sheet = zf.read("xl/worksheets/sheet1.xml").decode()
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    rows = ET.fromstring(sheet).find(f"{ns}sheetData").findall(f"{ns}row")
    assert len(rows) == 26  # header + 25 nations
    header = [c.find(f"{ns}is/{ns}t").text for c in rows[0]]
    assert header == df.columns
    first = rows[1]
    vals = {}
    for c in first:
        v = c.find(f"{ns}v")
        vals[c.attrib["r"]] = (
            v.text if v is not None else c.find(f"{ns}is/{ns}t").text
        )
    first_row = df.first()
    assert float(vals["A2"]) == float(first_row["n_nationkey"])
    assert vals["B2"] == first_row["n_name"]


def test_export_excel_escapes_and_caps(spark, tmp_path):
    import zipfile

    from multi_crm_cross_sell_spark.sources.sinks import export_excel

    df = spark.createDataFrame(
        [(i, f'<&"{i}>') for i in range(10)], ["id", "s"]
    )
    path = str(tmp_path / "cap.xlsx")
    export_excel(df, path, max_rows=3)
    with zipfile.ZipFile(path) as zf:
        sheet = zf.read("xl/worksheets/sheet1.xml").decode()
    assert sheet.count("<row ") == 4  # header + 3 capped rows
    assert "&lt;&amp;&quot;" in sheet and "<&" not in sheet.replace("<&amp;", "")


def test_merge_upsert_failure_keeps_target_and_cleans_staging(spark, tmp_path):
    """A failing merge (bad updates plan) must leave the existing
    target intact and no staging/backup dirs behind."""
    import os

    import pytest

    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    merge_upsert(spark, path, base, ["id"])

    def boom(x):
        raise ValueError("injected failure")

    bad = spark.createDataFrame([(3, "c")], ["id", "v"]).withColumn(
        "v", F.udf(boom)("v")
    )
    with pytest.raises(Exception):
        merge_upsert(spark, path, bad, ["id"])
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "b")}
    siblings = os.listdir(str(tmp_path))
    assert not any(s.endswith("__staging__") or s.endswith("__old__") for s in siblings)
