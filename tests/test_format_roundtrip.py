"""Hostile-content round-trips for the fmt1 sink/source surface.

The fmt1 registry query proves lossless ORC/JSON/CSV round-trips on
the driver corpus via checksums; these tests prove the same property
on content checksums can miss — NULL text (concat-hash skips it
identically on both engines, so only a row-level compare catches
corruption), embedded newlines and quotes (the JSON-escaping and ORC
string paths), and non-BMP unicode."""

from __future__ import annotations

import os

import pytest

HOSTILE_DOCS = [
    (0, None, "en", "web", 0),
    (1, "", "en", "web", 0),
    (2, "line one\nline two\r\nline three", "en", "web", 29),
    (3, 'quote " and \'single\' and ,comma', "en", "web", 31),
    (4, "tab\there and backslash \\ done", "en", "books", 29),
    (5, "naïve café 日本語 🙂  sep", "xx", "web", 24),
    (6, "   leading and trailing   ", "en", "web", 26),
    (7, "control \x01\x02 chars", "en", "web", 16),
]

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


@pytest.fixture(scope="module")
def hostile_df(spark):
    return spark.createDataFrame(HOSTILE_DOCS, SCHEMA)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["orc", "json", "parquet"])
def test_hostile_text_roundtrip(spark, hostile_df, fmt, tmp_path):
    path = os.path.join(str(tmp_path), f"docs_{fmt}")
    hostile_df.write.mode("overwrite").format(fmt).save(path)
    back = spark.read.schema(SCHEMA).format(fmt).load(path)
    assert _rows(back) == _rows(hostile_df)


def test_hostile_text_csv_roundtrip(spark, hostile_df, tmp_path):
    """CSV needs explicit quote/escape/multiLine handling for embedded
    newlines — the exact options a production CSV sink must pin (the
    fmt1 registry query sidesteps this by routing text through
    JSON/ORC; this test documents what the CSV path additionally
    requires)."""
    path = os.path.join(str(tmp_path), "docs_csv")
    (
        hostile_df.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        # the CSV WRITER trims unquoted leading/trailing whitespace by
        # default (ignore*WhiteSpace default TRUE on write, false on
        # read) — a silent content change; pin both off
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )
    back = (
        spark.read.schema(SCHEMA)
        .option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )
    got = {r[0]: r for r in back.collect()}
    want = {r[0]: r for r in hostile_df.collect()}
    assert set(got) == set(want)
    for k in want:
        w, g = want[k], got[k]
        # CSV cannot distinguish NULL from empty string without a
        # nullValue sentinel — the one documented lossy corner; all
        # other hostile content must survive bit-for-bit
        if w[1] in (None, ""):
            assert g[1] in (None, "")
        else:
            assert g == w
