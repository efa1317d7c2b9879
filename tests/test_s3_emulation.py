"""In-process S3 emulation (moto) — the S7 integration the reference
gets from LocalStack (/root/reference/tests/tests/scan.rs:73-138,
fixtures/mod.rs:88-214).

What runs live here: a real S3 HTTP API (moto_server) on localhost, a
bucket + parquet object created through boto3, and the engine reading
that object end-to-end via its remote-input path (presigned S3 GET →
localize_remote → parquet scan).

What cannot run: an actual ``s3a://`` scan — this pyspark ships without
hadoop-aws/aws-sdk bundles and the sandbox has no network to fetch
them.  The probe below still applies the per-bucket ``fs.s3a.*`` confs
(endpoint → moto, path-style, credentials) and asserts the read fails
with EXACTLY the missing-S3AFileSystem signature — proving the conf
plumbing reaches Hadoop and only the connector jar is absent.  If the
jars ever appear, the same test flips to asserting real rows.
"""

from __future__ import annotations

import io
import socket
import subprocess
import sys
import time

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from pg_analytics_spark.sources import load_source  # noqa: E402

BUCKET = "test-bucket"
KEY = "lake/data.parquet"
ACCESS, SECRET = "testing", "testing"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def moto_s3():
    """Launch moto_server, create a bucket with one parquet object."""
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "moto.server", "-p", str(port), "-H", "127.0.0.1"],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    endpoint = f"http://127.0.0.1:{port}"
    try:
        for _ in range(100):
            try:
                with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                    break
            except OSError:
                time.sleep(0.1)
        else:
            pytest.skip("moto_server did not start")
        s3 = boto3.client(
            "s3",
            endpoint_url=endpoint,
            aws_access_key_id=ACCESS,
            aws_secret_access_key=SECRET,
            region_name="us-east-1",
        )
        s3.create_bucket(Bucket=BUCKET)

        import pyarrow as pa
        import pyarrow.parquet as pq

        buf = io.BytesIO()
        pq.write_table(
            pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                      "name": pa.array(["a", "b", "c"])}),
            buf,
        )
        s3.put_object(Bucket=BUCKET, Key=KEY, Body=buf.getvalue())
        yield {"endpoint": endpoint, "client": s3}
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_read_parquet_from_emulated_bucket_via_http(spark, moto_s3):
    """End-to-end: live S3 GET (presigned, like any short-lived-token
    lake read) through the engine's remote-input path → parquet scan."""
    url = moto_s3["client"].generate_presigned_url(
        "get_object", Params={"Bucket": BUCKET, "Key": KEY}, ExpiresIn=300
    )
    df = load_source(spark, url, "parquet")
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}


def test_s3a_confs_reach_hadoop_probe(spark, moto_s3):
    """attach-style path: per-bucket fs.s3a confs target the emulator;
    the scan either works (hadoop-aws present) or fails with the
    missing-S3AFileSystem signature (documented-impossible here)."""
    from pg_analytics_spark.engine import Engine

    eng = Engine(spark=spark)
    conf = eng.add_secret(
        "s3",
        {
            "key_id": ACCESS,
            "secret": SECRET,
            "endpoint": moto_s3["endpoint"],
            "url_style": "path",
            "use_ssl": False,
        },
        bucket=BUCKET,
    )
    assert conf[f"fs.s3a.bucket.{BUCKET}.endpoint"] == moto_s3["endpoint"]
    assert conf[f"fs.s3a.bucket.{BUCKET}.path.style.access"] == "true"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get(f"fs.s3a.bucket.{BUCKET}.endpoint") == moto_s3["endpoint"]
    try:
        got = eng.attach("s3_probe", f"s3a://{BUCKET}/{KEY}", "parquet")
        assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]
    except Exception as e:
        msg = str(e)
        assert "S3AFileSystem" in msg or "ClassNotFoundException" in msg or (
            "No FileSystem for scheme" in msg
        ), f"unexpected s3a failure (not the missing-jar signature): {msg}"