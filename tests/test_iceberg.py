"""Iceberg catalog round-trip (north_rule names Iceberg tables).

The iceberg-spark-runtime jar is a public Maven artifact that is NOT
present in this offline sandbox, so the test skips cleanly here and
runs automatically wherever the jar exists (set
SPARK_GRAFT_ICEBERG_JAR or drop it in ~/.ivy2/jars). It runs in a
subprocess because spark.jars cannot be added to an already-running
JVM (the suite shares one session)."""

import subprocess
import sys
import textwrap

import pytest

from recipys_spark.sources.io import find_iceberg_jar

_SCRIPT = textwrap.dedent(
    """
    import sys
    from recipys_spark.sources.io import (
        get_spark_iceberg, read_table, write_table, synthetic_transcripts,
    )

    warehouse = sys.argv[1]
    spark = get_spark_iceberg(warehouse, parallelism=4)
    df = synthetic_transcripts(spark, n_convs=20, skew=False)
    write_table(df, "local.db.transcripts", partition_by=["conv_id"])
    back = read_table(spark, "local.db.transcripts")
    assert back.count() == df.count(), (back.count(), df.count())
    assert set(back.columns) == set(df.columns)
    # verify actual Iceberg metadata exists (not a parquet fallback)
    rows = spark.sql("SELECT count(*) FROM local.db.transcripts.snapshots").first()
    assert rows[0] >= 1
    print("ICEBERG_ROUNDTRIP_OK")
    spark.stop()
    """
)


@pytest.mark.skipif(
    find_iceberg_jar() is None,
    reason="iceberg-spark-runtime jar not available (offline sandbox)",
)
def test_iceberg_roundtrip(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(tmp_path / "warehouse")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ICEBERG_ROUNDTRIP_OK" in proc.stdout
