"""The drop-in CLI: same arg contract as the reference's driver
(ClickThru.java:28-42), byte-compatible intermediate + output files."""

from __future__ import annotations

import subprocess
import sys


def _fixture(tmp_path):
    imp = tmp_path / "impressions"
    clk = tmp_path / "clicks"
    imp.mkdir()
    clk.mkdir()
    (imp / "part-0000").write_text(
        '{"impressionId": "i1", "referrer": "u1", "adId": "a1"}\n'
        '{"impressionId": "i2", "referrer": "u1", "adId": "a1"}\n'
        '{"impressionId": "i3", "referrer": "u2", "adId": "a2"}\n'
    )
    (clk / "part-0000").write_text('{"impressionId": "i1"}\n')
    return imp, clk


def test_cli_usage_error():
    proc = subprocess.run(
        [sys.executable, "-m", "hadoopmapreduce_spark", "one", "two"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert proc.returncode == 1
    assert "usage:" in proc.stderr


def test_java_float_rendering_golden():
    """Pin Java Float.toString parity, incl. the <1e-3 scientific switch
    the old str(np.float32(x)) path got wrong ('1e-04' vs Java '1.0E-4')."""
    from hadoopmapreduce_spark.functions.javafmt import java_float32_repr as r

    assert r(0.5) == "0.5"
    assert r(1.0) == "1.0"
    assert r(0.0) == "0.0"
    assert r(1 / 3) == "0.33333334"  # shortest float32 round-trip digits
    assert r(0.001) == "0.001"  # decimal form down to exactly 1e-3
    assert r(0.0001) == "1.0E-4"  # below 1e-3: Java scientific, uppercase E
    assert r(1 / 4096) == "2.4414062E-4"  # a CTR < 0.001 (1 click / 4096)
    assert r(1e7) == "1.0E7"  # >= 1e7: scientific, no '+' on exponent
    assert r(9999999.0) == "9999999.0"
    assert r(float("nan")) == "NaN"
    assert r(float("inf")) == "Infinity"
    assert r(-0.5) == "-0.5"


def test_java_float_rendering_column(spark):
    from pyspark.sql import functions as F

    from hadoopmapreduce_spark.functions.javafmt import java_f32_str

    df = spark.createDataFrame(
        [(0.5,), (0.0001,), (1 / 4096,), (0.0,)], ["ctr"]
    ).select(java_f32_str(F.col("ctr")).alias("s"))
    assert [row.s for row in df.orderBy("s").collect()] == [
        "0.0", "0.5", "1.0E-4", "2.4414062E-4"
    ]


def test_cli_end_to_end(tmp_path):
    imp, clk = _fixture(tmp_path)
    combined = tmp_path / "combined"
    output = tmp_path / "out"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "hadoopmapreduce_spark",
            str(imp),
            str(clk),
            str(combined),
            str(output),
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    out_lines = sorted(
        line
        for f in output.glob("part-*")
        for line in f.read_text().splitlines()
    )
    assert out_lines == ["[u1, a1]\t0.5", "[u2, a2]\t0.0"]

    combined_lines = sorted(
        line
        for f in combined.glob("part-*")
        for line in f.read_text().splitlines()
    )
    # the reference's job-1 byte format: 0\t{url/x1fadId/x1e<flag>
    assert combined_lines == [
        "0\t{u1/x1fa1/x1e0",
        "0\t{u1/x1fa1/x1e1",
        "0\t{u2/x1fa2/x1e0",
    ]


def test_cli_list_subcommand():
    """`list` prints every registered query id with its check kind, without
    starting a SparkSession."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "hadoopmapreduce_spark", "list"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) >= 180
    kinds = {l.split("\t")[1] for l in lines}
    assert kinds == {"oracle", "rows-only"}
    assert any(l.startswith("ctr_flagship\t") for l in lines)


def test_cli_unknown_query_errors():
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "hadoopmapreduce_spark", "run", "nope", "/tmp"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 1
    assert "unknown query id" in proc.stderr
