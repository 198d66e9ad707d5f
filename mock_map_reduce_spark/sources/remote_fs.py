"""Remote-filesystem seam: every byte this engine reads or writes goes
through the Hadoop ``FileSystem`` interface, so the storage backend is
a CONFIGURATION, not code.

The reference scans live HDFS (master.cc:763 ``hdfsConnect`` +
readfile dispatch). Spark reaches HDFS — and S3, ABFS, GCS, and the
local disk the tests use — through one pluggable seam: the URI scheme
selects an implementation class via ``fs.<scheme>.impl`` on the Hadoop
configuration. ``file://`` in this sandbox and ``hdfs://`` on a
cluster take the byte-identical code path above that seam (splits,
parquet footers, column pruning, pushdown); only the class behind the
interface changes. ``tests/test_remote_fs.py`` proves the seam is real
by swapping the implementation UNDER the same scheme with a conf
override and observing the documented behavior change.

Production conf matrix (public Hadoop/Spark connector surface; set via
``spark.hadoop.<key>`` at submit time or ``hadoopConfiguration()`` at
runtime). Only the scheme-selection key is REQUIRED — each impl below
ships as the scheme's default in its connector jar; the rest is
deployment-specific:

hdfs:// (Hadoop HDFS, HA pair shown)
    fs.hdfs.impl                  org.apache.hadoop.hdfs.DistributedFileSystem
    dfs.nameservices              <nameservice id>
    dfs.ha.namenodes.<ns>         nn1,nn2
    dfs.namenode.rpc-address.<ns>.nn1   host1:8020
    dfs.client.failover.proxy.provider.<ns>
        org.apache.hadoop.hdfs.server.namenode.ha.ConfiguredFailoverProxyProvider

s3a:// (AWS S3 / any S3-compatible store)
    fs.s3a.impl                   org.apache.hadoop.fs.s3a.S3AFileSystem
    fs.s3a.endpoint               s3.<region>.amazonaws.com (or MinIO host)
    fs.s3a.aws.credentials.provider
        org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider (prod)
        / SimpleAWSCredentialsProvider + fs.s3a.access.key/secret.key (dev)
    fs.s3a.connection.maximum     ~= executor cores x 2 (100 TB scans fan out)
    fs.s3a.committer.name         magic   (correct, rename-free commits)
    spark.sql.sources.commitProtocolClass / parquet committer ->
        PathOutputCommitProtocol (route Spark's commit through the
        S3A committer; object stores have no atomic rename)

abfs:// (Azure Data Lake Gen2)
    fs.abfs.impl                  org.apache.hadoop.fs.azurebfs.AzureBlobFileSystem
    fs.azure.account.auth.type    OAuth
    fs.azure.account.oauth.provider.type
        org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider
    fs.azure.account.oauth2.client.id / .secret / .endpoint   <sp creds>

gs:// (Google Cloud Storage)
    fs.gs.impl                    com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem
    fs.AbstractFileSystem.gs.impl com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS
    google.cloud.auth.service.account.enable   true

The sandbox has no HDFS daemon / object store, so the matrix above is
documentation; what IS testable here — and tested — is the seam
itself: that an ``fs.<scheme>.impl`` override changes which class
serves a scheme for everything the engine does through ``spark.read``/
``df.write``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# The two stock local implementations differ observably: the default
# LocalFileSystem is checksummed (writes .crc sidecars and verifies on
# read); RawLocalFileSystem is the bare OS filesystem (no sidecars).
# Swapping one for the other under the SAME file:// scheme is the
# minimal honest proof that scheme -> implementation is runtime
# configuration, exactly how file:// becomes hdfs:// or s3a:// on a
# real deployment.
CHECKSUMMED_LOCAL_IMPL = "org.apache.hadoop.fs.LocalFileSystem"
RAW_LOCAL_IMPL = "org.apache.hadoop.fs.RawLocalFileSystem"


def set_scheme_impl(spark: SparkSession, scheme: str, impl_class: str) -> str | None:
    """Point ``<scheme>://`` URIs at ``impl_class`` for this session's
    Hadoop configuration; returns the previous value (None if unset).

    Also disables the FileSystem instance cache for the scheme —
    Hadoop caches by (scheme, authority, ugi), so without this an
    already-instantiated implementation would keep serving the scheme
    regardless of the new conf.
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = hconf.get(f"fs.{scheme}.impl")
    hconf.set(f"fs.{scheme}.impl", impl_class)
    hconf.set(f"fs.{scheme}.impl.disable.cache", "true")
    return prev


def scheme_impl_in_use(spark: SparkSession, uri: str) -> str:
    """Fully-qualified class name actually serving ``uri`` right now —
    resolved through the same Path.getFileSystem call every read and
    write in the engine goes through."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    return path.getFileSystem(hconf).getClass().getName()
