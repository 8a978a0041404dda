"""Multimodal plumbing tests: the fake decode kernel computes real
byte statistics, so outputs are exactly checkable."""

from __future__ import annotations

from pyspark.sql import Row

from airflow_jira_etl_spark.operators.multimodal import (
    attach_media,
    decode_features,
    resize_media,
    sample_frames,
)


def _media(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t)) for i, t in enumerate(texts)]
    )
    return attach_media(df)


def test_decode_features_byte_stats(spark):
    media = _media(spark, ["abc", "hello world"])
    rows = {r.doc_id: r for r in decode_features(media).collect()}
    assert rows[0].n_bytes == 3
    assert rows[0].byte_sum == ord("a") + ord("b") + ord("c")
    assert rows[0].first_byte == ord("a")
    assert rows[1].n_bytes == 11
    assert rows[0].fake_width == 3 % 640


def test_sample_frames_shape_and_coverage(spark):
    media = _media(spark, ["0123456789abcdef"])  # 16 bytes -> 4 frames of 4
    frames = sorted(sample_frames(media, n_frames=4).collect(), key=lambda r: r.frame_idx)
    assert [f.frame_idx for f in frames] == [0, 1, 2, 3]
    assert bytes(frames[0].frame_bytes) == b"0123"
    assert bytes(frames[3].frame_bytes) == b"cdef"


def test_sample_frames_short_payload(spark):
    media = _media(spark, ["ab"])  # shorter than frame count
    frames = sample_frames(media, n_frames=4).collect()
    assert 1 <= len(frames) <= 2  # step=1: frames at offsets 0,1
    assert bytes(frames[0].frame_bytes) == b"a"


def test_decode_features_empty_text_matches_oracle(spark, tmp_path):
    """Empty-payload differential: DuckDB's string_split_regex('','')
    is [''] (unicode -1), so the oracle needs an explicit empty guard
    to match the kernel's byte_sum=0 — pin the parity on a synthetic
    fixture containing an empty document."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from airflow_jira_etl_spark import registry
    from tests.oracle_check import compare

    registry.load_all_queries()
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["", "ab"]),
                "lang": pa.array(["en", "en"]),
                "source": pa.array(["s", "s"]),
                "n_chars": pa.array([0, 2], pa.int64()),
            }
        ),
        os.path.join(sf, "documents.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    df = registry.QUERIES["mm_decode_features"](spark, sf)
    rep = compare(df, con, registry.ORACLES["mm_decode_features"])
    assert not rep["errors"], rep


def test_resize_media_stride_and_sums(spark):
    media = attach_media(
        spark.createDataFrame(
            [
                Row(doc_id=1, text="abcd" * 200, source="s"),  # 800 bytes
                Row(doc_id=2, text="xy", source="s"),  # under budget
                Row(doc_id=3, text="", source="s"),  # empty payload
            ]
        )
    )
    got = {r.doc_id: r for r in resize_media(media, target_bytes=256).collect()}
    # 800 bytes -> stride ceil(800/256)=4 -> bytes at 0,4,8,... = all 'a'
    assert got[1].stride == 4 and got[1].out_bytes == 200
    assert got[1].out_sum == 200 * ord("a")
    # under budget: stride 1, payload kept whole
    assert got[2].stride == 1 and got[2].out_bytes == 2
    assert got[2].out_sum == ord("x") + ord("y")
    # empty payload: zero bytes out, zero sum, stride floor of 1
    assert got[3].stride == 1 and got[3].out_bytes == 0 and got[3].out_sum == 0


def test_kernels_survive_null_payloads(spark):
    """A NULL payload row must not kill the task: it reads as
    zero-length media (n_bytes 0, no frames, empty resize) — one
    undecodable row cannot be allowed to fail a 100 TB job."""
    from airflow_jira_etl_spark.operators.multimodal import (
        decode_features,
        resize_media,
        sample_frames,
    )

    media = spark.createDataFrame(
        [(1, "image/fake", b"abc", ("s", 3)), (2, "image/fake", None, ("s", 0))],
        "doc_id long, media_type string, payload binary, "
        "meta struct<source:string, declared_len:long>",
    )
    feats = {r.doc_id: r.n_bytes for r in decode_features(media).collect()}
    assert feats == {1: 3, 2: 0}
    frames = sample_frames(media, n_frames=2).collect()
    assert {r.doc_id for r in frames} == {1}  # no frames from empty media
    rs = {r.doc_id: r.out_bytes for r in resize_media(media).collect()}
    assert rs == {1: 3, 2: 0}


def test_kernel_params_validated_at_api_boundary(spark):
    """Degenerate parameters raise an immediate ValueError on the
    driver, not a ZeroDivisionError buried in an executor traceback."""
    import pytest

    from airflow_jira_etl_spark.operators.multimodal import (
        resize_media,
        sample_frames,
    )

    media = spark.createDataFrame(
        [(1, "x", b"a", ("s", 1))],
        "doc_id long, media_type string, payload binary, "
        "meta struct<source:string, declared_len:long>",
    )
    with pytest.raises(ValueError, match="n_frames"):
        sample_frames(media, n_frames=0)
    with pytest.raises(ValueError, match="target_bytes"):
        resize_media(media, target_bytes=0)


def test_declared_len_counts_payload_bytes_not_chars(spark):
    """meta.declared_len describes the PAYLOAD, so it must equal the
    encoded byte length — char count disagrees for any multi-byte text
    ('café' is 4 chars, 5 bytes), and a consumer validating payload
    integrity against declared_len would flag every non-ASCII document
    as corrupt."""
    from airflow_jira_etl_spark.operators.multimodal import attach_media

    docs = spark.createDataFrame(
        [(1, "café", "s"), (2, "emoji 🚀", "s"), (3, "ascii", "s")],
        "doc_id long, text string, source string",
    )
    for r in attach_media(docs).collect():
        assert r.meta.declared_len == len(r.payload)
