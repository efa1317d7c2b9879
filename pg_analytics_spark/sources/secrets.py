"""Object-store credentials — reference src/duckdb/secret.rs:24-217.

The reference turns Postgres USER MAPPING options into DuckDB
``CREATE SECRET`` statements (one per server, 22 credential option
kinds: S3/GCS/R2/Azure key pairs, session tokens, endpoints, URL
styles).  The Spark analog is Hadoop filesystem configuration; we use
**per-bucket** keys (``fs.s3a.bucket.<name>.*``) so multiple attaches
with different credentials coexist in one session — the same
one-secret-per-server scoping the reference provides
(src/fdw/base.rs:223-225).

No cloud connectivity exists in this environment; the translation layer
is real and unit-tested against expected Hadoop conf keys, the network
path is not exercised (the reference likewise tests against LocalStack,
tests/tests/fixtures/mod.rs:88-214).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pg_analytics_spark.errors import UnsupportedFormat

#: reference secret option → hadoop conf suffix (S3-family)
_S3_KEYS = {
    "key_id": "access.key",
    "secret": "secret.key",
    "session_token": "session.token",
    "endpoint": "endpoint",
    "region": "endpoint.region",
}


def secret_to_hadoop_conf(
    secret_type: str, options: dict, bucket: str | None = None
) -> dict[str, str]:
    """Translate a reference user-mapping secret to Hadoop conf pairs.

    Pure function (unit-testable without a cluster).  ``bucket`` scopes
    S3 keys per-bucket; without it the keys are global.
    """
    st = secret_type.lower()
    conf: dict[str, str] = {}
    if st in ("s3", "r2"):
        prefix = f"fs.s3a.bucket.{bucket}." if bucket else "fs.s3a."
        for ref_key, suffix in _S3_KEYS.items():
            if ref_key in options:
                conf[prefix + suffix] = str(options[ref_key])
        if "use_ssl" in options:
            conf[prefix + "connection.ssl.enabled"] = str(options["use_ssl"]).lower()
        if str(options.get("url_style", "")).lower() == "path":
            conf[prefix + "path.style.access"] = "true"
        if st == "r2" and "account_id" in options:
            conf[prefix + "endpoint"] = (
                f"https://{options['account_id']}.r2.cloudflarestorage.com"
            )
    elif st == "gcs":
        if "key_id" in options:
            conf["fs.gs.auth.access.key"] = str(options["key_id"])
        if "secret" in options:
            conf["fs.gs.auth.secret.key"] = str(options["secret"])
    elif st == "azure":
        account = options.get("account_name", "")
        if "connection_string" in options:
            conf[f"fs.azure.account.connection.string.{account}"] = str(
                options["connection_string"]
            )
        if "account_key" in options:
            conf[
                f"fs.azure.account.key.{account}.dfs.core.windows.net"
            ] = str(options["account_key"])
    else:
        raise UnsupportedFormat(f"secret type {secret_type!r}")
    return conf


def apply_secret(
    spark: SparkSession, secret_type: str, options: dict, bucket: str | None = None
) -> dict[str, str]:
    """Apply the translated conf to the live Hadoop configuration."""
    conf = secret_to_hadoop_conf(secret_type, options, bucket)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)
    return conf
