from __future__ import annotations

"""CSV source semantics: quoting round-trips and malformed-row policy.

Schema-pinned reads only (inference over 100 TB of CSV is an extra full
pass); PERMISSIVE captures bad rows into a corrupt-record column for
routing to a quarantine sink, DROPMALFORMED silently sheds them —
both policies pinned here so ingestion behavior is a choice, not a
surprise."""


def test_csv_quoted_roundtrip_preserves_awkward_text(spark, tmp_path):
    rows = [
        (1, 'he said "hi, there"\nsecond line', "en"),
        (2, "plain", "de"),
        (3, "comma, semicolon; pipe|", "en"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    p = str(tmp_path / "csv")
    (
        df.coalesce(1).write.option("header", "true")
        .option("quoteAll", "true").option("escape", '"').csv(p)
    )
    back = (
        spark.read.schema("id long, text string, lang string")
        .option("header", "true").option("multiLine", "true")
        .option("escape", '"').csv(p)
    )
    got = {r.id: r.text for r in back.collect()}
    assert got == {i: t for i, t, _l in rows}


def test_csv_malformed_row_policies(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,n\n1,10\nnot_an_int,20\n3,30\n")
    schema = "id long, n long"
    permissive = (
        spark.read.schema(schema + ", _corrupt string")
        .option("header", "true")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
    )
    rows = permissive.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt is not None]
    assert len(bad) == 1 and bad[0].id is None  # quarantined, not dropped
    dropped = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 3]
