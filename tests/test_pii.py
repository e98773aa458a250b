"""PII detection + redaction (functions/pii.py): hand-computed hit
counts and redacted strings over crafted rows."""

from pyspark.sql import functions as F

from datasketches_java_spark.functions.pii import pii_columns, redact_pii


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    cols = pii_columns(F.col("text"))
    out = df.select(
        "doc_id",
        *[c.alias(n) for n, c in cols.items()],
        redact_pii(F.col("text")).alias("redacted"),
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_pii_counts_and_redaction(spark):
    rows = [
        ("email", "mail me at jo.doe+x@sub.example.org today"),
        ("phone", "call 555-867-5309 now"),
        ("ip", "ping 192.168.0.1 and 10.0.255.7"),
        ("ssn", "id 123-45-6789"),
        ("mixed", "a@b.co or 555-000-1111 via 1.2.3.4 ssn 987-65-4321"),
        ("clean", "nothing sensitive here 12345"),
        ("empty", ""),
    ]
    out = _run(spark, rows)

    e = out["email"]
    assert e["n_email"] == 1 and e["n_pii"] == 1
    assert e["redacted"] == "mail me at <EMAIL> today"

    p = out["phone"]
    assert p["n_phone"] == 1 and p["n_ssn"] == 0
    assert p["redacted"] == "call <PHONE> now"

    i = out["ip"]
    assert i["n_ipv4"] == 2 and i["n_pii"] == 2
    assert i["redacted"] == "ping <IP> and <IP>"

    s = out["ssn"]
    assert s["n_ssn"] == 1 and s["n_phone"] == 0
    assert s["redacted"] == "id <SSN>"

    m = out["mixed"]
    assert (m["n_email"], m["n_phone"], m["n_ipv4"], m["n_ssn"]) == (1, 1, 1, 1)
    assert m["n_pii"] == 4
    assert m["redacted"] == "<EMAIL> or <PHONE> via <IP> ssn <SSN>"

    assert out["clean"]["n_pii"] == 0
    assert out["clean"]["redacted"] == "nothing sensitive here 12345"
    assert out["empty"]["n_pii"] == 0 and out["empty"]["redacted"] == ""


def test_pii_disjoint_shapes(spark):
    # phone (3-3-4) and ssn (3-2-4) never double-count the same span;
    # an ipv4 never fires inside a redacted email host
    rows = [
        ("a", "555-123-4567"),          # phone only
        ("b", "555-12-4567"),           # ssn only
        ("c", "n4me.100@digits.email"),  # email; no ipv4 inside
    ]
    out = _run(spark, rows)
    assert out["a"]["n_phone"] == 1 and out["a"]["n_ssn"] == 0
    assert out["b"]["n_ssn"] == 1 and out["b"]["n_phone"] == 0
    assert out["c"]["n_email"] == 1 and out["c"]["n_ipv4"] == 0
    assert out["c"]["redacted"] == "<EMAIL>"
