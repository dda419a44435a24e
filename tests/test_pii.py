"""PII scan/redaction (operators/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spark_spark.operators.pii import pii_counts, redact_pii


def test_counts_and_redaction(spark):
    rows = [
        (1, "mail a.b-c_d@ex-ample.org and 192.168.0.1 then +44 123 456 7890 done"),
        (2, "no pii here at all"),
        (3, "two mails x@y.io z@w.co one ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    counts = pii_counts("text")
    got = {
        r["id"]: (r["n_emails"], r["n_ipv4"], r["n_phones"])
        for r in df.select("id", *[c.alias(n) for n, c in counts.items()]).collect()
    }
    assert got == {1: (1, 1, 1), 2: (0, 0, 0), 3: (2, 1, 0)}

    red = {r["id"]: r["clean"] for r in df.select("id", redact_pii("text").alias("clean")).collect()}
    assert red[1] == "mail [EMAIL] and [IP] then [PHONE] done"
    assert red[2] == "no pii here at all"
    assert red[3] == "two mails [EMAIL] [EMAIL] one ip [IP]"


def test_redaction_idempotent(spark):
    df = spark.createDataFrame([(1, "a@b.co 1.2.3.4")], ["id", "text"])
    once = df.select("id", redact_pii("text").alias("text"))
    twice = once.select("id", redact_pii("text").alias("text"))
    assert once.collect() == twice.collect()
