"""Columnar parsing-model layer: compile AMiner-style model DAGs to one
anchored regex + typed extraction (SURVEY.md §2.2 mapping)."""

from __future__ import annotations

from logdata_anomaly_miner_spark import parsing as P


def _syslog_model():
    # "<ts> host sshd[<pid>]: Failed password for <user> from <ip> port <port>"
    return P.seq(
        P.datetime_el("ts", "yyyy-MM-dd'T'HH:mm:ss", r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"),
        P.fixed(" "),
        P.whitespace_limited("host"),
        P.fixed(" sshd["),
        P.decimal_integer("pid", allow_sign=False),
        P.fixed("]: "),
        P.wordlist("outcome", ["Failed", "Accepted"]),
        P.fixed(" password for "),
        P.variable_bytes("user", "abcdefghijklmnopqrstuvwxyz"),
        P.fixed(" from "),
        P.ip_address("ip"),
        P.fixed(" port "),
        P.decimal_integer("port", allow_sign=False),
    )


def test_parse_syslog_line(spark):
    lines = [
        ("2024-01-05T10:11:12 web1 sshd[4242]: Failed password for root from 10.0.0.5 port 2222",),
        ("2024-01-05T10:11:13 web1 sshd[4243]: Accepted password for alice from 192.168.1.9 port 22",),
        ("totally unparseable line",),
    ]
    df = spark.createDataFrame(lines, "raw string")
    out = P.parse(df, "raw", _syslog_model()).collect()
    r0, r1, r2 = out
    assert r0["_parse_ok"] and r1["_parse_ok"] and not r2["_parse_ok"]
    assert r0["outcome"] == "Failed" and r1["outcome"] == "Accepted"
    assert r0["pid"] == 4242 and isinstance(r0["pid"], int)
    assert r0["user"] == "root" and r1["user"] == "alice"
    # IP packed to long (IpAddressDataModelElement parity: 10.0.0.5)
    assert r0["ip"] == (10 << 24) + 5
    assert r1["ip"] == (192 << 24) + (168 << 16) + (1 << 8) + 9
    assert r0["port"] == 2222
    assert str(r0["ts"]).startswith("2024-01-05 10:11:12")
    assert r2["user"] is None and r2["ip"] is None


def test_first_match_and_optional(spark):
    model = P.seq(
        P.first_match(
            P.seq(P.fixed("GET "), P.delimited("path", " ", consume_delimiter=False)),
            P.seq(P.fixed("POST "), P.delimited("body", " ", consume_delimiter=False)),
        ),
        P.optional(P.seq(P.fixed(" v="), P.decimal_float("version"))),
    )
    rows = [("GET /index.html",), ("POST data v=1.5",), ("PUT x",)]
    df = spark.createDataFrame(rows, "raw string")
    out = P.parse(df, "raw", model).collect()
    assert out[0]["_parse_ok"] and out[0]["path"] == "/index.html" and out[0]["version"] is None
    assert out[1]["_parse_ok"] and out[1]["body"] == "data" and out[1]["version"] == 1.5
    assert not out[2]["_parse_ok"]


def test_base64_and_hex(spark):
    model = P.seq(P.hex_string("h"), P.fixed(":"), P.base64_string("b64"))
    df = spark.createDataFrame([("deadbeef:aGVsbG8=",)], "raw string")
    r = P.parse(df, "raw", model).collect()[0]
    assert r["h"] == "deadbeef"
    assert bytes(r["b64"]) == b"hello"


def test_repeated_span(spark):
    model = P.seq(P.fixed("ids="), P.repeated(P.seq(P.decimal_integer("first"), P.fixed(";")), 1, None, name="span"))
    df = spark.createDataFrame([("ids=1;2;3;",)], "raw string")
    r = P.parse(df, "raw", model).collect()[0]
    assert r["_parse_ok"] and r["span"] == "1;2;3;"
    # per-item recovery downstream (regexp_extract_all over the span)
    import pyspark.sql.functions as F
    items = (
        P.parse(df, "raw", model)
        .select(F.regexp_extract_all("span", F.lit(r"\d+"), 0).alias("xs"))
        .collect()[0]["xs"]
    )
    assert items == ["1", "2", "3"]
